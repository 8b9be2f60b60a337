"""Time the two expand-kernel impls (onehot vs packed) + the fallback, on-chip.

Runs ops/binning.bin_splats end to end at the 1M-splat/1080p bench geometry —
the largest config where BOTH impls are feasible (packed's 31-bit budget dies
at ~2M instances) — with _EXPAND_IMPL forced to each. DCE-proof: every output
of bin_splats is reduced into the chained carry.

Usage: python tools/microbench_expand.py [n_splats]
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
    t1 = min(_t(lambda: float(r(np.int32(1), *args))) for _ in range(3))
    tk = min(_t(lambda: float(r(np.int32(k), *args))) for _ in range(3))
    dt = (tk - t1) / (k - 1) if tk > t1 else tk / k
    print(f"{name:28s} {dt * 1e3:8.2f} ms   (compile {compile_s:.0f}s)", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    import splatapult_tpu.ops.binning as B
    from bench import make_scene
    from splatapult_tpu.core import transforms as T
    from splatapult_tpu.render import Camera, RenderConfig, prepare_splats

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    w, h = 1920, 1080
    scene = make_scene(n)
    cam = Camera.from_fov(
        T.look_at(eye=[0.0, 0.8, 4.5], target=[0, 0, 0], up=[0, 1, 0]),
        fovy=np.pi / 4, width=w, height=h,
    )
    cfg = RenderConfig(width=w, height=h, pipeline="tiled")
    d = jax.jit(lambda s, c: prepare_splats(s, c, cfg, sort=False))(scene, cam)
    mean2d, extent, depth = d["mean2d"], d["extent"], d["depth"]

    grid = B.TileGrid.create(width=w, height=h, num_splats=n, tile_size=32,
                             block=128, max_instance_mult=2)
    demand = int(jax.jit(
        lambda m, e: B.instance_demand(m, e, grid))(mean2d, extent))
    print(f"n={n} demand={demand} ({demand / n:.2f}/splat) emax={grid.emax}")

    def run_binning(c, m2, ext, dep):
        bins = B.bin_splats(m2 + c * 0.0, ext, grid, depth=dep)
        tot = jnp.float32(0.0)
        for v in bins.values():
            tot = tot + jnp.sum(v.astype(jnp.float32))
        return tot * 1e-30

    # try/finally: an exception mid-bench must not leave binning forced to a
    # non-default impl/chunk size for any later in-process use
    old_impl, old_c, old_wblk = B._EXPAND_IMPL, B._EXPAND_C, B._EXPAND_WBLK
    old_ctab = B._EXPAND_CTAB
    try:
        for impl in ("onehot", "onehotb", "onehot2", "packed"):
            ok = B._expand_impl_ok(
                impl, grid.emax, n, grid.num_tiles,
                max(int(grid.num_tiles).bit_length(), 1),
                max(int(grid.tiles_x).bit_length(), 1),
                max(grid.emax.bit_length(), max(n, 1).bit_length(), 1))
            if not ok:
                print(f"{impl:28s} infeasible at this size")
                continue
            B._EXPAND_IMPL = impl
            timed(f"bin_splats[{impl}]", run_binning, mean2d, extent, depth)
        # chunk-size sweep: halving/doubling the grid-step count probes
        # whether the expand cost is per-step/DMA-overhead-bound
        for c_try in (256, 1024):
            if grid.emax % c_try:
                print(f"onehot C={c_try}: emax not divisible, skipped")
                continue
            B._EXPAND_IMPL = "onehot"
            B._EXPAND_C = c_try
            B._EXPAND_WBLK = c_try // B._EXPAND_CTAB + 1
            timed(f"bin_splats[onehot C={c_try}]", run_binning,
                  mean2d, extent, depth)
        # CTAB=256: window widens 640 -> 768 rows (+20% compare work) but the
        # per-step block mappings drop 10 -> 6 — probes whether the expand is
        # bound by per-mapping DMA overhead
        B._EXPAND_IMPL = "onehot"
        B._EXPAND_C = old_c
        B._EXPAND_CTAB = 256
        B._EXPAND_WBLK = old_c // 256 + 1
        timed("bin_splats[onehot CTAB=256]", run_binning, mean2d, extent, depth)
        B._EXPAND_CTAB = old_ctab
        B._EXPAND_WBLK = old_wblk
        B._EXPAND_IMPL = old_impl
        B._EXPAND_C = grid.emax + 1  # force non-kernel path
        timed("bin_splats[fallback]", run_binning, mean2d, extent, depth)
    finally:
        B._EXPAND_IMPL, B._EXPAND_C = old_impl, old_c
        B._EXPAND_WBLK, B._EXPAND_CTAB = old_wblk, old_ctab


if __name__ == "__main__":
    main()
