"""Measure cluster shared binning on the config-4 workload (VERDICT r3 item 4).

Times a 4-view camera-path batch at 1M splats / 1080p fwd+bwd three ways:
  per-view lax.map (render_batch — the round-1..3 path),
  shared-binning clusters of 2 (render_cluster),
  shared-binning cluster of 4.
Plus image deltas of the shared paths vs per-view (the bounded-error check
at production scale).

Run: python tools/probe_cluster.py [--fwd-only]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--splats", type=int, default=1_000_000)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from splatapult_tpu.cluster import (
        calibrate_config_cluster, cluster_shareable, render_cluster,
        _slice_cameras)
    from splatapult_tpu.io.gaussians import GaussianScene
    from splatapult_tpu.render import (
        RenderConfig, calibrate_config, render_batch)

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/splatapult_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    scene = jax.tree.map(jnp.asarray, bench.make_scene(args.splats))
    # a TIGHT camera path (consecutive views ~1.1 deg apart — the config-4
    # workload where clusters overlap; bench --views spreads its cameras
    # uniformly around the full circle, which is NOT a path)
    from splatapult_tpu.core import transforms as T
    from splatapult_tpu.render import Camera

    cs = [
        Camera.from_fov(
            T.look_at(eye=[np.cos(a) * 4.5, 0.8, np.sin(a) * 4.5],
                      target=[0, 0, 0], up=[0, 1, 0]),
            fovy=np.pi / 4, width=1920, height=1080)
        for a in (0.3 + 0.02 * i for i in range(args.views))
    ]
    cams = Camera(cam_to_world=jnp.stack([c.cam_to_world for c in cs]),
                  proj=jnp.stack([c.proj for c in cs]))
    cfg = RenderConfig(width=1920, height=1080, pipeline="tiled",
                       depth_bits=16, packed_colors=True,
                       grad_sort_dtype="bfloat16", early_stop_eps=1e-4,
                       forward_only=args.fwd_only)
    print(f"# shareable(4) gate at 0.05 scene units: "
          f"{cluster_shareable(cams, 0.05)}", flush=True)

    def timed(label, fn, *a):
        def k_steps(k, *a2):
            def body(_, c):
                return fn(c, *a2)

            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

        run = jax.jit(k_steps)
        float(run(jnp.int32(1), *a))

        def t(k):
            t0 = time.perf_counter()
            float(run(jnp.int32(k), *a))
            return time.perf_counter() - t0

        t1 = min(t(1) for _ in range(3))
        tk = min(t(args.iters) for _ in range(3))
        dt = (tk - t1) / (args.iters - 1)
        print(f"{label:28s} {dt * 1e3:8.2f} ms total, "
              f"{dt * 1e3 / args.views:7.2f} ms/view", flush=True)
        return dt

    def step_of(render_fn, cfg_):
        if args.fwd_only:
            def f(c):
                img = render_fn(
                    GaussianScene(means=scene.means + c, sh=scene.sh,
                                  opacities=scene.opacities,
                                  log_scales=scene.log_scales,
                                  quats=scene.quats))
                # DCE-proof: touch EVERY view (python-stacked views are
                # separate pallas calls XLA happily drops if unconsumed)
                return jnp.sum(img[:, ::293, ::293, 0]) * 1e-30
            return f

        def loss(s):
            return jnp.mean(render_fn(s) ** 2)

        gl = jax.value_and_grad(loss)

        def f(c):
            v, g = gl(GaussianScene(means=scene.means + c, sh=scene.sh,
                                    opacities=scene.opacities,
                                    log_scales=scene.log_scales,
                                    quats=scene.quats))
            return (v + g.means[0, 0]) * 1e-30
        return f

    # per-view baseline
    cfg_pv = calibrate_config(scene, cams, cfg, bucket=1.0)
    print(f"# per-view mult {cfg_pv.max_instance_mult:.3f}", flush=True)
    timed("render_batch (per-view)",
          step_of(lambda s: render_batch(s, cams, cfg_pv), cfg_pv))

    for k in (2, 4):
        if args.views % k:
            continue
        cfg_cl = calibrate_config_cluster(scene, cams, cfg, cluster_size=k,
                                          bucket=1.0)
        print(f"# cluster{k} mult {cfg_cl.max_instance_mult:.3f}", flush=True)

        def rc(s, k=k, cfg_cl=cfg_cl):
            outs = [render_cluster(s, _slice_cameras(cams, i, i + k), cfg_cl)
                    for i in range(0, args.views, k)]
            return jnp.concatenate(outs, axis=0)

        timed(f"render_cluster (k={k})", step_of(rc, cfg_cl))

        # image delta vs per-view at production scale (forward images)
        a = np.asarray(jax.jit(
            lambda s: render_batch(s, cams, cfg_pv))(scene))
        b = np.asarray(jax.jit(rc)(scene))
        d = np.abs(a - b)
        print(f"# cluster{k} vs per-view: max {d.max():.3e} "
              f"mean {d.mean():.3e}", flush=True)


if __name__ == "__main__":
    main()
