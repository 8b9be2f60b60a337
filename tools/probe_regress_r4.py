"""In-context A/B of the round-4 binning changes on the 1M fwd+bwd step.

Times the FULL train step (render + L2 + grads, bench methodology) under the
four combinations of {tail key: m_pos | inst_splat} x {compaction: always |
auto}, isolating which change moved the round-3 baseline (103.3 ms).
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
    parser.add_argument("--mult", type=float, default=0.0,
                        help="0 = bucketed auto-calibration")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from splatapult_tpu.io.gaussians import GaussianScene
    from splatapult_tpu.ops import binning
    from splatapult_tpu.render import RenderConfig, calibrate_config, render

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/splatapult_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    scene = jax.tree.map(jnp.asarray, bench.make_scene(args.splats))
    ns = argparse.Namespace(views=1, width=1920, height=1080)
    cam = bench._make_cameras(ns, "ball")
    cfg = RenderConfig(width=1920, height=1080, pipeline="tiled",
                       depth_bits=16, packed_colors=True,
                       grad_sort_dtype="bfloat16", early_stop_eps=1e-4)
    if args.mult > 0:
        import dataclasses

        cfg = dataclasses.replace(cfg, max_instance_mult=args.mult)
    else:
        cfg = calibrate_config(scene, cam, cfg)
    print(f"# mult {cfg.max_instance_mult:.3f}", flush=True)

    def measure():
        def loss(s, c):
            return jnp.mean(render(s, c, cfg) ** 2)

        gl = jax.value_and_grad(loss)

        def one(s, c, eps):
            val, g = gl(GaussianScene(
                means=s.means + eps, sh=s.sh, opacities=s.opacities,
                log_scales=s.log_scales, quats=s.quats), c)
            return (val + g.means[0, 0]) * 1e-30

        def k_steps(s, c, k):
            return jax.lax.fori_loop(0, k, lambda _, e: one(s, c, e),
                                     jnp.float32(0.0))

        run = jax.jit(k_steps)
        float(run(scene, cam, jnp.int32(1)))

        def t(k):
            t0 = time.perf_counter()
            float(run(scene, cam, jnp.int32(k)))
            return time.perf_counter() - t0

        t1 = min(t(1) for _ in range(3))
        tk = min(t(args.iters) for _ in range(3))
        return (tk - t1) / (args.iters - 1)

    for emit_mpos in (True, False):
        for cmode in ("always", "auto"):
            binning._EMIT_M_POS = emit_mpos
            binning._COMPACT_MODE = cmode
            jax.clear_caches()
            dt = measure()
            key = "m_pos     " if emit_mpos else "inst_splat"
            print(f"tail={key} compact={cmode:6s}: {dt * 1e3:8.2f} ms",
                  flush=True)
    binning._EMIT_M_POS = False
    binning._COMPACT_MODE = "auto"


if __name__ == "__main__":
    main()
