"""Early-stop ablation on the garden bench scene (real TPU).

1. Renders one forward frame and reports per-pixel / per-tile transmittance
   saturation stats (how much skippable work exists at all).
2. Times fwd+bwd at early_stop_eps in {0, 1e-4, 1e-3} with the K-step
   chained methodology.

Usage: python tools/probe_earlystop.py [--splats 1500000]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--splats", type=int, default=1_500_000)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--eps", type=str, default="0,1e-4,1e-3")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import make_bench_scene
    from splatapult_tpu.io.gaussians import GaussianScene
    from splatapult_tpu.io.synth import garden_cameras
    from splatapult_tpu.render import RenderConfig, calibrate_config, render

    w, h, ts = 1920, 1080, 32
    scene = jax.tree.map(jnp.asarray, make_bench_scene("garden", args.splats))
    cam = garden_cameras(1, width=w, height_px=h)
    base = RenderConfig(width=w, height=h, pipeline="tiled", tile_size=ts,
                        grad_sort_dtype="bfloat16", packed_colors=True)
    base = calibrate_config(scene, cam, base)

    # ---- saturation stats from one forward frame ----
    img = np.asarray(render(scene, cam, base))
    alpha = img[..., 3]
    t_pix = 1.0 - alpha
    ty, tx = h // ts + (h % ts > 0), w // ts
    pad_rows = ty * ts - h
    t_padded = np.pad(t_pix, ((0, pad_rows), (0, 0)), constant_values=1.0)
    tmax = t_padded.reshape(ty, ts, tx, ts).max(axis=(1, 3))
    for eps in (1e-3, 1e-4):
        print(f"pixels with T<{eps:g}: {100.0 * (t_pix < eps).mean():.1f}%   "
              f"tiles fully saturated (max T<{eps:g}): "
              f"{100.0 * (tmax < eps).mean():.1f}%")
    print(f"tile max-T percentiles: p10={np.percentile(tmax, 10):.2e} "
          f"p50={np.percentile(tmax, 50):.2e} p90={np.percentile(tmax, 90):.2e}")

    # ---- fwd+bwd timing per eps ----
    import dataclasses

    for eps_s in args.eps.split(","):
        eps = float(eps_s)
        cfg = dataclasses.replace(base, early_stop_eps=eps)

        def loss(s, c):
            return jnp.mean(render(s, c, cfg) ** 2)

        gl = jax.value_and_grad(loss)

        def k_steps(s, c, k_iters):
            def body(_, e):
                v, g = gl(GaussianScene(
                    means=s.means + e, sh=s.sh, opacities=s.opacities,
                    log_scales=s.log_scales, quats=s.quats), c)
                return (v + g.means[0, 0]) * 1e-30

            return jax.lax.fori_loop(0, k_iters, body, jnp.float32(0.0))

        r = jax.jit(k_steps)
        t0 = time.time()
        float(r(scene, cam, jnp.int32(1)))
        compile_s = time.time() - t0
        k = args.iters
        t1 = min(_t(lambda: float(r(scene, cam, jnp.int32(1)))) for _ in range(3))
        tk = min(_t(lambda: float(r(scene, cam, jnp.int32(k)))) for _ in range(3))
        dt = (tk - t1) / (k - 1) if tk > t1 else tk / k
        print(f"eps={eps_s:>6s}  fwd+bwd {dt * 1e3:7.2f} ms/step  "
              f"(compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
