"""A/B the binning compaction branch: partition sort vs in-place fast path.

Times the FULL bin_splats (DCE-proof chained) at the 1M bench view under
_COMPACT_MODE in {"always", "auto"} — "auto" takes the in-place path on this
view (the span check passes; tools run confirms max span 445 of 640).

Run on the real chip: python tools/microbench_compact.py [--splats N]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--splats", type=int, default=1_000_000)
    parser.add_argument("--iters", type=int, default=8)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from splatapult_tpu.ops import binning
    from splatapult_tpu.ops.tiled import _grid_from_config
    from splatapult_tpu.render import RenderConfig, calibrate_config, prepare_splats

    scene = jax.tree.map(jnp.asarray, bench.make_scene(args.splats))
    ns = argparse.Namespace(views=1, width=1920, height=1080)
    cam = bench._make_cameras(ns, "ball")
    cfg = RenderConfig(width=1920, height=1080, pipeline="tiled",
                       forward_only=True, depth_bits=16, packed_colors=True,
                       early_stop_eps=1e-4)
    cfg = calibrate_config(scene, cam, cfg)
    grid = _grid_from_config(cfg, args.splats)

    d = jax.jit(lambda s, c: prepare_splats(s, c, cfg, sort=False))(scene, cam)
    d = {k: jnp.asarray(v) for k, v in d.items()}

    for mode in ("always", "auto", "never"):
        binning._COMPACT_MODE = mode

        def f(eps):
            bins = binning.bin_splats(
                d["mean2d"] + eps, d["extent"], grid, depth=d["depth"])
            return (bins["inst_splat"].sum() + bins["block_meta"].sum()
                    + bins["tile_count"].sum()).astype(jnp.float32) * 1e-30

        def k_steps(k):
            return jax.lax.fori_loop(
                0, k, lambda _, c: f(c), jnp.float32(0.0))

        run = jax.jit(k_steps)
        float(run(jnp.int32(1)))
        t1 = min(_t(run, 1) for _ in range(3))
        tk = min(_t(run, args.iters) for _ in range(3))
        dt = (tk - t1) / (args.iters - 1)
        print(f"bin_splats [{mode:6s}]: {dt * 1e3:8.2f} ms", flush=True)
    binning._COMPACT_MODE = "auto"


def _t(run, k):
    import jax.numpy as jnp

    t0 = time.perf_counter()
    float(run(jnp.int32(k)))
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
