"""Binning-internals breakdown at bench scale (N=1M, mult=2, 1080p/32px tiles).

Times each stage of ops/binning.bin_splats (kernel path) separately, with
DCE-proof full-result reduction chaining. Run on the real chip.

Usage: python tools/microbench_bin3.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _t(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def timed(name, fn, *args, k=8):
    import jax
    import jax.numpy as jnp

    def k_steps(k_iters, *a):
        def body(_, c):
            return fn(c, *a)

        return jax.lax.fori_loop(0, k_iters, body, jnp.float32(0.0))

    r = jax.jit(k_steps)
    float(r(np.int32(1), *args))
    t1 = min(_t(lambda: float(r(np.int32(1), *args))) for _ in range(2))
    tk = min(_t(lambda: float(r(np.int32(k), *args))) for _ in range(2))
    dt = max((tk - t1) / (k - 1), 1e-9)
    print(f"{name:28s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from bench import make_scene
    from splatapult_tpu.core import transforms as T
    from splatapult_tpu.ops.binning import (
        TileGrid, _bincount_by_sort, _expand_fill_pallas, _EXPAND_C, bin_splats,
    )
    from splatapult_tpu.render import Camera, RenderConfig, prepare_splats

    n = 1_000_000
    scene = make_scene(n)
    cam = Camera.from_fov(
        T.look_at(eye=[0.0, 0.8, 4.5], target=[0, 0, 0], up=[0, 1, 0]),
        fovy=np.pi / 4, width=1920, height=1080,
    )
    config = RenderConfig(width=1920, height=1080, pipeline="tiled",
                          max_instance_mult=2, early_stop_eps=1e-4)
    grid = TileGrid.create(width=1920, height=1080, num_splats=n,
                           tile_size=32, block=128, max_instance_mult=2,
                           early_stop_eps=1e-4)
    d = jax.jit(lambda s: prepare_splats(s, cam, config, sort=False))(scene)
    mean2d = np.asarray(d["mean2d"])
    extent = np.asarray(d["extent"])
    depth = np.asarray(d["depth"])

    # ---- reproduce the kernel-path intermediates host-side shapes ----
    ts, tx_n, ty_n = grid.tile_size, grid.tiles_x, grid.tiles_y
    num_tiles, b, emax, mcap = grid.num_tiles, grid.block, grid.emax, grid.mcap
    h = grid.height
    mx, my = mean2d[:, 0], mean2d[:, 1]
    rx, ry = extent[:, 0], extent[:, 1]
    valid = (rx > 0.0) & (ry > 0.0)
    x0 = np.clip(np.floor((mx - rx) / ts), 0, tx_n).astype(np.int32)
    x1 = np.clip(np.ceil((mx + rx) / ts), 0, tx_n).astype(np.int32)
    r0 = np.clip(np.floor((h - my - ry) / ts), 0, ty_n).astype(np.int32)
    r1 = np.clip(np.ceil((h - my + ry) / ts), 0, ty_n).astype(np.int32)
    nx = np.maximum(x1 - x0, 0)
    ny = np.maximum(r1 - r0, 0)
    cnt = np.where(valid, nx * ny, 0).astype(np.int32)
    offs = np.cumsum(cnt, dtype=np.int64).astype(np.int32) - cnt
    total = int(offs[-1] + cnt[-1])
    print(f"total instances {total} ({total / n:.2f}/splat), emax {emax}, mcap {mcap}")
    kept = (cnt > 0) & (offs + cnt <= emax)

    fbt = max(int(num_tiles).bit_length(), 1)
    fbn = max(int(tx_n).bit_length(), 1)
    ob = max(emax.bit_length(), max(n, 1).bit_length(), 1)
    dbits = np.ascontiguousarray(
        np.maximum(depth, 0.0).astype(np.float32)
    ).view(np.int32)

    nk = jnp.asarray((~kept).astype(np.int32))
    offs_j = jnp.asarray(np.where(kept, offs, (1 << ob) - 1).astype(np.int32))
    tnx_j = jnp.asarray(((r0 * tx_n + x0) << fbn | np.maximum(nx, 1)).astype(np.int32))
    dhi_j = jnp.asarray((dbits >> 16).astype(np.int32))
    dlo_j = jnp.asarray((dbits & 0xFFFF).astype(np.int32))
    sid_j = jnp.arange(n, dtype=jnp.int32)

    # 1. compaction sort (6 operands, stable, 1-key) over N
    def f_compact(c):
        outs = lax.sort((nk + (c * 0).astype(jnp.int32), offs_j, tnx_j, dhi_j,
                         dlo_j, sid_j), num_keys=1, is_stable=True)
        return c + sum(o.sum().astype(jnp.float32) for o in outs) * 1e-30

    timed("compact sort (N, 6 ops)", f_compact)

    # prepare compacted arrays (host) for the expand kernel
    order = np.lexsort((np.arange(n), ~kept * -1))  # kept first, stable
    order = np.argsort((~kept).astype(np.int32), kind="stable")
    C = _EXPAND_C
    n_pad = (-(-n // C) + 2) * C
    sent = (1 << ob) - 1
    offs_c = np.full(n_pad, sent, np.int32)
    offs_c[:n] = np.where(kept, offs, sent)[order]
    tnx_c = np.zeros(n_pad, np.int32)
    tnx_c[:n] = ((r0 * tx_n + x0) << fbn | np.maximum(nx, 1))[order]
    dhi_c = np.zeros(n_pad, np.int32)
    dhi_c[:n] = (dbits >> 16)[order]
    dlo_c = np.zeros(n_pad, np.int32)
    dlo_c[:n] = (dbits & 0xFFFF)[order]
    sid_c = np.zeros(n_pad, np.int32)
    sid_c[:n] = np.arange(n, dtype=np.int32)[order]
    chunk_starts = np.arange(emax // C, dtype=np.int32) * C
    lo = np.clip(np.searchsorted(offs_c, chunk_starts, side="right") - 1, 0, n_pad - 1)
    lo_blk = np.clip(lo // C, 0, n_pad // C - 2).astype(np.int32)

    offs_cj, tnx_cj = jnp.asarray(offs_c), jnp.asarray(tnx_c)
    dhi_cj, dlo_cj = jnp.asarray(dhi_c), jnp.asarray(dlo_c)
    sid_cj, lo_j = jnp.asarray(sid_c), jnp.asarray(lo_blk)

    # 2. the expand kernel over emax slots
    def f_expand(c):
        out3 = _expand_fill_pallas(
            offs_cj + (c * 0).astype(jnp.int32), tnx_cj, dhi_cj, dlo_cj,
            sid_cj, lo_j, grid, fbt, fbn, ob,
        )
        return c + out3.sum().astype(jnp.float32) * 1e-30

    timed("expand kernel (emax slots)", f_expand)

    # realistic per-slot arrays for the sorts
    out3 = _expand_fill_pallas(offs_cj, tnx_cj, dhi_cj, dlo_cj, sid_cj, lo_j,
                               grid, fbt, fbn, ob)
    m = np.arange(emax, dtype=np.int32)
    valid_m = m < min(total, emax)
    tile = jnp.asarray(np.where(valid_m, np.asarray(out3[0]), num_tiles))
    s_ids = jnp.asarray(np.where(valid_m, np.asarray(out3[1]), n))
    dep = jnp.asarray(np.where(valid_m, np.asarray(out3[2]), 2**31 - 1))

    # 3. bincount-by-sort over emax tile ids
    def f_bincount(c):
        cnt_t = _bincount_by_sort(tile + (c * 0).astype(jnp.int32), num_tiles)
        return c + cnt_t.sum().astype(jnp.float32) * 1e-30

    timed("bincount sort (emax)", f_bincount)

    # 4. the main 3-key sort over mcap rows
    pad_cap = num_tiles * b
    tile_all = jnp.concatenate([tile, jnp.asarray(
        np.random.randint(0, num_tiles, pad_cap).astype(np.int32))])
    dep_all = jnp.concatenate([dep, jnp.full((pad_cap,), 2**31 - 1, jnp.int32)])
    s_all = jnp.concatenate([s_ids, jnp.full((pad_cap,), n, jnp.int32)])
    m_all = jnp.concatenate([jnp.asarray(m), jnp.full((pad_cap,), emax, jnp.int32)])

    def f_mainsort(c):
        outs = lax.sort((tile_all + (c * 0).astype(jnp.int32), dep_all, -s_all,
                         m_all), num_keys=3, is_stable=False)
        return c + sum(o.sum().astype(jnp.float32) for o in outs) * 1e-30

    timed("main sort (mcap, 3 keys+1)", f_mainsort)

    # 4b. variant: single fused 32-bit key? tile fits 11 bits труд; instead
    # try 2-key (tile, depth) no tie-break
    def f_mainsort2(c):
        outs = lax.sort((tile_all + (c * 0).astype(jnp.int32), dep_all, m_all),
                        num_keys=2, is_stable=False)
        return c + sum(o.sum().astype(jnp.float32) for o in outs) * 1e-30

    timed("main sort (2 keys+1)", f_mainsort2)

    # 4c. variant: fused int64 key (tile << 32 | depth-bits) + payload
    key64 = (tile_all.astype(jnp.int64) << 32) | dep_all.astype(jnp.uint32).astype(jnp.int64)

    def f_mainsort64(c):
        outs = lax.sort((key64 + (c * 0).astype(jnp.int64), m_all), num_keys=1,
                        is_stable=False)
        return c + sum(o.sum().astype(jnp.float32) for o in outs) * 1e-30

    timed("main sort (int64 key+1)", f_mainsort64)

    # 5. whole bin_splats for reference
    m2j, exj, dpj = jnp.asarray(mean2d), jnp.asarray(extent), jnp.asarray(depth)

    def f_whole(c):
        bins = bin_splats(m2j + (c * 0).astype(jnp.float32), exj, grid, depth=dpj)
        return c + (bins["inst_splat"].sum() + bins["m_pos"].sum()).astype(jnp.float32) * 1e-30

    timed("bin_splats total", f_whole)


if __name__ == "__main__":
    main()
