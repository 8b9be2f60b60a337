"""Microbench the prepare front end (bake / project / SH) on the real chip.

Each candidate is timed as K data-chained iterations inside ONE jitted
fori_loop ending in a single scalar readback (see bench.py for why).

Usage: python tools/microbench_prepare.py --splats 1000000 --iters 8
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timeit(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--splats", type=int, default=1_000_000)
    parser.add_argument("--iters", type=int, default=8)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import make_scene
    from splatapult_tpu.core import transforms as T
    from splatapult_tpu.core.project import project_gaussians
    from splatapult_tpu.core.sh import eval_sh_radiance, sh_basis
    from splatapult_tpu.render import Camera

    scene = make_scene(args.splats)
    cam = Camera.from_fov(
        T.look_at(eye=[0.0, 0.8, 4.5], target=[0, 0, 0], up=[0, 1, 0]),
        fovy=np.pi / 4, width=1920, height=1080,
    )
    view = T.invert_rigid(cam.cam_to_world)

    def ph_bake(s, eps):
        cov3 = T.bake_covariance(s.quats + eps, s.log_scales)
        return cov3[0, 0, 0] * 1e-30

    def ph_project(s, eps):
        cov3 = jnp.zeros((args.splats, 3, 3), jnp.float32) + eps
        p = project_gaussians(s.means, cov3, view, cam.proj, (1920, 1080))
        return p.mean2d[0, 0] * 1e-30

    def ph_bake_project(s, eps):
        cov3 = T.bake_covariance(s.quats + eps, s.log_scales)
        p = project_gaussians(s.means, cov3, view, cam.proj, (1920, 1080))
        return p.mean2d[0, 0] * 1e-30

    def ph_sh(s, eps):
        from splatapult_tpu.core.project import view_dirs

        rgb = eval_sh_radiance(s.sh + eps, view_dirs(s.means, cam.eye))
        return rgb[0, 0] * 1e-30

    def ph_basis(s, eps):
        from splatapult_tpu.core.project import view_dirs

        b = sh_basis(view_dirs(s.means + eps, cam.eye), 3)
        return b[0, 0] * 1e-30

    def ph_sigmoid(s, eps):
        return jax.nn.sigmoid(s.opacities + eps)[0] * 1e-30

    bodies = {
        "bake": ph_bake,
        "project": ph_project,
        "bake_project": ph_bake_project,
        "sh": ph_sh,
        "sh_basis": ph_basis,
        "sigmoid": ph_sigmoid,
    }

    k = args.iters
    for name, body in bodies.items():
        def k_steps(s, k_iters, body=body):
            return jax.lax.fori_loop(
                0, k_iters, lambda _, e: body(s, e), jnp.float32(0.0)
            )

        runner = jax.jit(k_steps)
        float(runner(scene, jnp.int32(1)))
        t1 = min(_timeit(lambda: float(runner(scene, jnp.int32(1)))) for _ in range(3))
        tk = min(_timeit(lambda: float(runner(scene, jnp.int32(k)))) for _ in range(3))
        dt = max((tk - t1) / (k - 1), 1e-9)
        print(f"{name:14s} {dt * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
