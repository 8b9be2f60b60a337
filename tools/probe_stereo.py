"""Time shared-bin stereo vs two independent per-eye renders, on-chip.

VERDICT r2 item 5 "Done" criterion: stereo pair <= ~1.6x single-view cost at
1M splats (vs 2.0x for per-eye rendering), image allclose vs per-eye binning.

Usage: python tools/probe_stereo.py [n_splats]
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


def timed(name, fn, *args, k=6):
    import jax
    import jax.numpy as jnp

    def k_steps(k_iters, *a):
        def body(_, c):
            return fn(c, *a)

        return jax.lax.fori_loop(0, k_iters, body, jnp.float32(0.0))

    r = jax.jit(k_steps)
    t0 = time.perf_counter()
    float(r(np.int32(1), *args))
    print(f"  [{name}: compiled in {time.perf_counter() - t0:.0f}s]", flush=True)
    t1 = min(_t(lambda: float(r(np.int32(1), *args))) for _ in range(3))
    tk = min(_t(lambda: float(r(np.int32(k), *args))) for _ in range(3))
    dt = (tk - t1) / (k - 1) if tk > t1 else tk / k
    print(f"{name:40s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/splatapult_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from bench import make_scene
    from splatapult_tpu.core import transforms as T
    from splatapult_tpu.render import Camera, RenderConfig, render, calibrate_config
    from splatapult_tpu.stereo import _eye_cameras, render_stereo, stereo_instance_demand

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    w, h = 1920, 1080
    scene = make_scene(n)
    cam = Camera.from_fov(
        T.look_at(eye=[0.0, 0.8, 4.5], target=[0, 0, 0], up=[0, 1, 0]),
        fovy=np.pi / 4, width=w, height=h,
    )
    cfg = RenderConfig(width=w, height=h, pipeline="tiled",
                       early_stop_eps=1e-4, packed_colors=True,
                       forward_only=True, depth_bits=16)
    # capacity: the shared binning needs the union demand
    import dataclasses

    demand = int(jax.jit(
        lambda s, c: stereo_instance_demand(s, c, cfg, 0.064))(scene, cam))
    cfg = dataclasses.replace(cfg, max_instance_mult=1.06 * demand / n)
    print(f"n={n} stereo union demand={demand} ({demand / n:.2f}/splat)")

    left, right = _eye_cameras(cam, 0.064)

    def single(c, s):
        img = render(type(s)(means=s.means + c * 0.0, sh=s.sh,
                             opacities=s.opacities, log_scales=s.log_scales,
                             quats=s.quats), cam, cfg)
        return jnp.sum(img[::293, ::293, 0]) * 1e-30

    def per_eye(c, s):
        s2 = type(s)(means=s.means + c * 0.0, sh=s.sh, opacities=s.opacities,
                     log_scales=s.log_scales, quats=s.quats)
        a = render(s2, left, cfg)
        b = render(s2, right, cfg)
        return (jnp.sum(a[::293, ::293, 0]) + jnp.sum(b[::293, ::293, 0])) * 1e-30

    def shared(c, s):
        s2 = type(s)(means=s.means + c * 0.0, sh=s.sh, opacities=s.opacities,
                     log_scales=s.log_scales, quats=s.quats)
        p = render_stereo(s2, cam, cfg, 0.064)
        # DCE-proof: touch BOTH eyes — the eyes are separate pallas calls
        # and reading only p[0...] lets XLA drop the second eye entirely
        # (this exact bug inflated the round-3 "1.09x" headline)
        return jnp.sum(p[:, ::293, ::293, 0]) * 1e-30

    t1 = timed("single view (fwd-only)", single, scene)
    t2 = timed("stereo per-eye (2x render)", per_eye, scene)
    t3 = timed("stereo shared bins", shared, scene)
    print(f"\nper-eye = {t2 / t1:.2f}x single; shared = {t3 / t1:.2f}x single "
          f"(target <= 1.6x)")

    # correctness on-chip at this scale
    pa = np.asarray(render_stereo(scene, cam, cfg, 0.064))
    wa = np.stack([np.asarray(render(scene, left, cfg)),
                   np.asarray(render(scene, right, cfg))])
    d = np.abs(pa - wa)
    print(f"stereo vs per-eye: max abs diff {d.max():.2e} mean {d.mean():.2e}")


if __name__ == "__main__":
    main()
