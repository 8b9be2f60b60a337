"""DCE-proof decomposition of ops/binning.bin_splats at bench scale.

Every timed body sum-reduces all of its outputs (x[0]-chaining lets XLA
dead-code-eliminate whole sub-graphs, e.g. the histogram inside a bin phase
that only reads the sorted outputs).

Usage: python tools/profile_bin.py --splats 1000000 --instance-mult 2
"""

import argparse
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
    dt = (tk - t1) / (k - 1)
    print(f"{name:46s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--splats", type=int, default=1_000_000)
    parser.add_argument("--width", type=int, default=1920)
    parser.add_argument("--height", type=int, default=1080)
    parser.add_argument("--instance-mult", type=int, default=2)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/splatapult_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from bench import make_scene
    from splatapult_tpu.core import transforms as T
    from splatapult_tpu.ops.binning import TileGrid, bin_splats
    from splatapult_tpu.render import Camera, RenderConfig, prepare_splats

    scene = make_scene(args.splats)
    cam = Camera.from_fov(
        T.look_at(eye=[0.0, 0.8, 4.5], target=[0, 0, 0], up=[0, 1, 0]),
        fovy=np.pi / 4, width=args.width, height=args.height,
    )
    config = RenderConfig(
        width=args.width, height=args.height, pipeline="tiled",
        max_instance_mult=args.instance_mult,
    )
    grid = TileGrid.create(
        width=args.width, height=args.height, num_splats=args.splats,
        tile_size=config.tile_size, block=config.tile_block,
        max_instance_mult=args.instance_mult,
    )

    @jax.jit
    def setup(s):
        d = prepare_splats(s, cam, config, sort=False)
        return (jax.lax.stop_gradient(d["mean2d"]),
                jax.lax.stop_gradient(d["extent"]),
                jax.lax.stop_gradient(d["depth"]))

    mean2d, extent, depth = jax.block_until_ready(setup(scene))

    def chain(c, *xs):
        tot = c * 1e-30
        for x in xs:
            tot = tot + jnp.sum(x.astype(jnp.float32)) * 1e-30
        return tot.astype(jnp.float32)

    def tree_chain(c, tree):
        return chain(c, *jax.tree_util.tree_leaves(tree))

    # full production binning, everything live (depth key as in the tiled path)
    timed("bin_splats TOTAL (all outputs live)",
          lambda c, m, e, dp: tree_chain(c, bin_splats(m + c, e, grid, depth=dp)),
          mean2d, extent, depth)
    timed("bin_splats TOTAL (legacy, no depth key)",
          lambda c, m, e: tree_chain(c, bin_splats(m + c, e, grid)),
          mean2d, extent)

    # pieces, replicating the body
    n = mean2d.shape[0]
    ts, tx_n, ty_n = grid.tile_size, grid.tiles_x, grid.tiles_y
    num_tiles, b, emax, mcap = grid.num_tiles, grid.block, grid.emax, grid.mcap
    h = grid.height
    pad_cap = num_tiles * b

    def rects(m2, ext):
        mx, my = m2[:, 0], m2[:, 1]
        rx, ry = ext[:, 0], ext[:, 1]
        valid = (rx > 0.0) & (ry > 0.0)
        x0 = jnp.clip(jnp.floor((mx - rx) / ts), 0, tx_n).astype(jnp.int32)
        x1 = jnp.clip(jnp.ceil((mx + rx) / ts), 0, tx_n).astype(jnp.int32)
        r0 = jnp.clip(jnp.floor((h - my - ry) / ts), 0, ty_n).astype(jnp.int32)
        r1 = jnp.clip(jnp.ceil((h - my + ry) / ts), 0, ty_n).astype(jnp.int32)
        nx = jnp.maximum(x1 - x0, 0)
        ny = jnp.maximum(r1 - r0, 0)
        cnt_raw = jnp.where(valid, nx * ny, 0).astype(jnp.int32)
        offs_raw = jnp.cumsum(cnt_raw) - cnt_raw
        keep = offs_raw + cnt_raw <= emax
        cnt = jnp.where(keep, cnt_raw, 0)
        offs = jnp.cumsum(cnt) - cnt
        kept = keep & (cnt > 0)
        return x0, x1, r0, r1, nx, cnt, offs, kept

    timed("  rects+counts",
          lambda c, m, e: chain(c, *rects(m + c, e)), mean2d, extent)

    def enum_part(c, m, e):
        x0, x1, r0, r1, nx, cnt, offs, kept = rects(m + c, e)
        mm = jnp.arange(emax, dtype=jnp.int32)
        first_slot = jnp.where(kept, offs, emax)
        fbt = max(int(num_tiles).bit_length(), 1)
        fbn = max(int(tx_n).bit_length(), 1)
        tile0 = r0 * tx_n + x0
        col_a = (first_slot.astype(jnp.uint32) << fbt) | tile0.astype(jnp.uint32)
        col_b = (jnp.arange(n, dtype=jnp.int32) << fbn) | jnp.maximum(nx, 1)
        fill_a = lax.cummax(jnp.zeros((emax,), jnp.uint32).at[first_slot].set(
            col_a, mode="drop", unique_indices=True), axis=0)
        fill_b = lax.cummax(jnp.zeros((emax,), jnp.int32).at[first_slot].set(
            col_b, mode="drop", unique_indices=True), axis=0)
        g_offs = (fill_a >> fbt).astype(jnp.int32)
        g_tile0 = (fill_a & ((1 << fbt) - 1)).astype(jnp.int32)
        s = fill_b >> fbn
        g_nx = jnp.maximum(fill_b & ((1 << fbn) - 1), 1)
        j = mm - g_offs
        total = offs[-1] + cnt[-1]
        valid_m = mm < total
        tile = g_tile0 + (j // g_nx) * tx_n + j % g_nx
        tile = jnp.where(valid_m, tile, num_tiles)
        s = jnp.where(valid_m, s, n)
        return tile, s, mm

    timed("  + enumeration fill (packed)",
          lambda c, m, e: chain(c, *enum_part(c, m, e)), mean2d, extent)

    from splatapult_tpu.ops.binning import _bincount_by_sort

    def hist_part(c, m, e):
        tile, s, mm = enum_part(c, m, e)
        return chain(c, _bincount_by_sort(tile, num_tiles))

    timed("  + bincount hist", hist_part, mean2d, extent)

    def sort_part(c, m, e):
        tile, s, mm = enum_part(c, m, e)
        tile_count = _bincount_by_sort(tile, num_tiles)
        pad_t = (-tile_count) % b
        pad_col = lax.broadcasted_iota(jnp.int32, (num_tiles, b), 1)
        pad_tile_grid = lax.broadcasted_iota(jnp.int32, (num_tiles, b), 0)
        pad_tile = jnp.where(pad_col < pad_t[:, None], pad_tile_grid, num_tiles).reshape(-1)
        tile_all = jnp.concatenate([tile, pad_tile])
        s_all = jnp.concatenate([s, jnp.full((pad_cap,), n, jnp.int32)])
        m_all = jnp.concatenate([mm, jnp.full((pad_cap,), emax, jnp.int32)])
        return lax.sort((tile_all, s_all, m_all), num_keys=1, is_stable=True)

    timed("  + main sort (everything)",
          lambda c, m, e: chain(c, *sort_part(c, m, e)), mean2d, extent)


if __name__ == "__main__":
    main()
