"""Binning-internals breakdown at bench scale (N=1M, mult=2, 1080p/32px tiles).

Times each stage of ops/binning.bin_splats (kernel path) separately, with
DCE-proof full-result reduction chaining. Everything stays on-device: this
environment's tunnel makes large device->host transfers pathologically slow,
so all intermediates are produced by jitted device programs and only scalars
are read back.

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
    t0 = time.perf_counter()
    float(r(np.int32(1), *args))
    compile_s = time.perf_counter() - t0
    t1 = min(_t(lambda: float(r(np.int32(1), *args))) for _ in range(2))
    tk = min(_t(lambda: float(r(np.int32(k), *args))) for _ in range(2))
    dt = max((tk - t1) / (k - 1), 1e-9)
    print(f"{name:28s} {dt * 1e3:8.2f} ms   (compile {compile_s:.0f}s)", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from bench import make_scene
    from splatapult_tpu.core import transforms as T
    from splatapult_tpu.ops.binning import (
        TileGrid, _EXPAND_C, _EXPAND_CTAB, _EXPAND_WBLK, _bincount_by_sort,
        _expand_fill_pallas, bin_splats,
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
    tx_n = grid.tiles_x
    num_tiles, b, emax, mcap = grid.num_tiles, grid.block, grid.emax, grid.mcap
    fbt = max(int(num_tiles).bit_length(), 1)
    fbn = max(int(tx_n).bit_length(), 1)
    ob = max(emax.bit_length(), max(n, 1).bit_length(), 1)
    C, ctab, wblk = _EXPAND_C, _EXPAND_CTAB, _EXPAND_WBLK
    n_pad = (-(-n // ctab) + wblk) * ctab
    sent = jnp.int32((1 << ob) - 1)

    @jax.jit
    def build(scene):
        """All binning intermediates, on-device (mirrors bin_splats' kernel
        path; NOTE: input-order prefix truncation stands in for production's
        depth-aware overflow drop — probe scenes must fit emax, asserted
        below)."""
        from splatapult_tpu.ops.binning import _tile_rects

        d = prepare_splats(scene, cam, config, sort=False)
        mean2d, extent, depth = d["mean2d"], d["extent"], d["depth"]
        x0, r0, nx, ny, cnt = _tile_rects(mean2d, extent, grid)
        offs = jnp.cumsum(cnt) - cnt
        total = offs[-1] + cnt[-1]
        kept = (cnt > 0) & (offs + cnt <= emax)
        dbits = lax.bitcast_convert_type(jnp.maximum(depth, 0.0), jnp.int32)
        nk = (~kept).astype(jnp.int32)
        offs_k = jnp.where(kept, offs, sent)
        tnx = (r0 * tx_n + x0) << fbn | jnp.maximum(nx, 1)
        sid = jnp.arange(n, dtype=jnp.int32)
        _, offs_c, tnx_c, dhi_c, dlo_c, sid_c = lax.sort(
            (nk, offs_k, tnx, dbits >> 16, dbits & 0xFFFF, sid),
            num_keys=1, is_stable=True,
        )
        pad_rows = n_pad - n
        offs_c = jnp.concatenate([offs_c, jnp.full((pad_rows,), sent, jnp.int32)])
        z = jnp.zeros((pad_rows,), jnp.int32)
        tnx_c = jnp.concatenate([tnx_c, z])
        dhi_c = jnp.concatenate([dhi_c, z])
        dlo_c = jnp.concatenate([dlo_c, z])
        sid_c = jnp.concatenate([sid_c, z])
        chunk_starts = jnp.arange(emax // C, dtype=jnp.int32) * C
        lo = jnp.clip(
            jnp.searchsorted(offs_c, chunk_starts, side="right").astype(jnp.int32) - 1,
            0, n_pad - 1)
        lo_blk = jnp.clip(lo // ctab, 0, n_pad // ctab - wblk)
        out3 = _expand_fill_pallas(offs_c, tnx_c, dhi_c, dlo_c, sid_c, lo_blk,
                                   grid, fbt, fbn, ob)
        m = jnp.arange(emax, dtype=jnp.int32)
        valid_m = m < total
        imax = jnp.int32(2**31 - 1)
        tile = jnp.where(valid_m, out3[0], num_tiles)
        s_ids = jnp.where(valid_m, out3[1], n)
        dep = jnp.where(valid_m, out3[2], imax)
        pad_cap = num_tiles * b
        # representative pads (uniform tiles; exact pad pattern doesn't matter
        # for sort timing)
        pad_tile = (jnp.arange(pad_cap, dtype=jnp.int32) % num_tiles)
        tile_all = jnp.concatenate([tile, pad_tile])
        dep_all = jnp.concatenate([dep, jnp.full((pad_cap,), imax, jnp.int32)])
        s_all = jnp.concatenate([s_ids, jnp.full((pad_cap,), n, jnp.int32)])
        m_all = jnp.concatenate([m, jnp.full((pad_cap,), emax, jnp.int32)])
        return dict(
            nk=nk, offs_k=offs_k, tnx=tnx, dhi=dbits >> 16, dlo=dbits & 0xFFFF,
            sid=sid, offs_c=offs_c, tnx_c=tnx_c, dhi_c=dhi_c, dlo_c=dlo_c,
            sid_c=sid_c, lo_blk=lo_blk, tile=tile, tile_all=tile_all,
            dep_all=dep_all, s_all=s_all, m_all=m_all, total=total,
            mean2d=mean2d, extent=extent, depth=depth,
        )

    iv = build(scene)
    iv = {k: v for k, v in iv.items()}
    print(f"total instances {int(iv['total'])} ({int(iv['total']) / n:.2f}/splat), "
          f"emax {emax}, mcap {mcap}", flush=True)
    assert int(iv['total']) <= emax, "probe scene overflows emax; timings would diverge from production"

    # 1. compaction sort (6 operands, stable, 1-key) over N
    def f_compact(c, nk, offs_k, tnx, dhi, dlo, sid):
        outs = lax.sort((nk + (c * 0).astype(jnp.int32), offs_k, tnx, dhi, dlo,
                         sid), num_keys=1, is_stable=True)
        return c + sum(o.sum().astype(jnp.float32) for o in outs) * 1e-30

    timed("compact sort (N, 6 ops)", f_compact, iv["nk"], iv["offs_k"],
          iv["tnx"], iv["dhi"], iv["dlo"], iv["sid"])

    # 2. the expand kernel over emax slots
    def f_expand(c, offs_c, tnx_c, dhi_c, dlo_c, sid_c, lo_blk):
        out3 = _expand_fill_pallas(
            offs_c + (c * 0).astype(jnp.int32), tnx_c, dhi_c, dlo_c,
            sid_c, lo_blk, grid, fbt, fbn, ob)
        return c + out3.sum().astype(jnp.float32) * 1e-30

    timed("expand kernel (emax slots)", f_expand, iv["offs_c"], iv["tnx_c"],
          iv["dhi_c"], iv["dlo_c"], iv["sid_c"], iv["lo_blk"])

    # 3. bincount-by-sort over emax tile ids
    def f_bincount(c, tile):
        cnt_t = _bincount_by_sort(tile + (c * 0).astype(jnp.int32), num_tiles)
        return c + cnt_t.sum().astype(jnp.float32) * 1e-30

    timed("bincount sort (emax)", f_bincount, iv["tile"])

    # 4. the main 3-key sort over mcap rows
    def f_mainsort(c, tile_all, dep_all, s_all, m_all):
        outs = lax.sort((tile_all + (c * 0).astype(jnp.int32), dep_all, -s_all,
                         m_all), num_keys=3, is_stable=False)
        return c + sum(o.sum().astype(jnp.float32) for o in outs) * 1e-30

    timed("main sort (3 keys + 1)", f_mainsort, iv["tile_all"], iv["dep_all"],
          iv["s_all"], iv["m_all"])

    # 4b. 2-key variant (no tie-break key)
    def f_mainsort2(c, tile_all, dep_all, m_all):
        outs = lax.sort((tile_all + (c * 0).astype(jnp.int32), dep_all, m_all),
                        num_keys=2, is_stable=False)
        return c + sum(o.sum().astype(jnp.float32) for o in outs) * 1e-30

    timed("main sort (2 keys + 1)", f_mainsort2, iv["tile_all"], iv["dep_all"],
          iv["m_all"])

    # 4c. fused int64 key variant
    def f_mainsort64(c, tile_all, dep_all, m_all):
        key64 = (tile_all.astype(jnp.int64) << 32) | dep_all.astype(
            jnp.uint32).astype(jnp.int64)
        outs = lax.sort((key64 + (c * 0).astype(jnp.int64), m_all), num_keys=1,
                        is_stable=False)
        return c + sum(o.sum().astype(jnp.float32) for o in outs) * 1e-30

    timed("main sort (int64 key + 1)", f_mainsort64, iv["tile_all"],
          iv["dep_all"], iv["m_all"])

    # 5. whole bin_splats for reference
    def f_whole(c, mean2d, extent, depth):
        bins = bin_splats(mean2d + (c * 0).astype(jnp.float32), extent, grid,
                          depth=depth)
        return c + bins["inst_splat"].sum().astype(jnp.float32) * 1e-30

    timed("bin_splats total", f_whole, iv["mean2d"], iv["extent"], iv["depth"])


if __name__ == "__main__":
    main()
