"""Measure grad-allreduce / backward-compute overlap (north-star check).

Three measurements of the SPMD train step (parallel/mesh.py), each as K
data-chained iterations inside one jitted program (the only honest timing on
this environment, see bench.py):

  A. full step: backward + cross-chip grad psums
  B. step WITHOUT the psums (per-shard grads only)
  C. the psums ALONE on precomputed gradient buffers

  overlap = (B + C - A) / C     (1.0 = collectives fully hidden, 0 = serial)

Also dumps scheduling evidence from the compiled HLO: async collective pairs
(`all-reduce-start` / `all-reduce-done`) with instructions between start and
done mean XLA scheduled compute under the collective.

On this 1-chip environment the harness runs on the virtual CPU mesh
(--platform cpu, default here): the CPU backend runs collectives
synchronously, so the numbers are a mechanism check only — run on a real
slice (>= 2 chips) for the north-star measurement; everything is turnkey.

Usage: python tools/profile_overlap.py [--devices 8] [--splats 20000]
       [--sh-chunks 1] [--platform cpu|default]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--splats", type=int, default=20000)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--sh-chunks", type=int, default=1)
    ap.add_argument("--allreduce", default="psum", choices=("psum", "ring"),
                    help="ring = the manual ppermute ring (parallel/mesh."
                         "ring_all_reduce) whose AOT schedule shows async "
                         "pairs; time both on a real slice")
    ap.add_argument("--platform", default="cpu", choices=("cpu", "default"))
    args = ap.parse_args()

    if args.platform == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.devices}"
            ).strip()
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax

    from bench import make_bench_scene
    from splatapult_tpu.io.gaussians import GaussianScene
    from splatapult_tpu.io.synth import garden_cameras
    from splatapult_tpu.parallel import mesh as M
    from splatapult_tpu.render import Camera, RenderConfig

    n_dev = min(args.devices, len(jax.devices()))
    mesh = M.make_render_mesh(num_tile_shards=n_dev, num_view_shards=1,
                              devices=jax.devices()[:n_dev])
    print(f"mesh: {dict(mesh.shape)} on {jax.devices()[0].platform}", flush=True)

    scene = make_bench_scene("garden", args.splats)
    cam1 = garden_cameras(1, width=args.width, height_px=args.height)
    cams = Camera(cam_to_world=cam1.cam_to_world[None], proj=cam1.proj[None])
    config = RenderConfig(width=args.width, height=args.height,
                          pipeline="tiled", max_instance_mult=6.0,
                          early_stop_eps=1e-4)
    targets = M.shard_targets(
        jnp.zeros((1, args.height, args.width, 4), jnp.float32), config, mesh)

    def chain(grads, loss):
        parts = [loss] + [jnp.ravel(g)[0] for g in jax.tree.leaves(grads)]
        return sum(parts) * 1e-30

    def step_full(s, c, t):
        loss, grads = M._sharded_value_and_grad(
            s, c, t, config, mesh, sh_psum_chunks=args.sh_chunks,
            grad_allreduce=args.allreduce)
        return chain(grads, loss)

    def step_nopsum(s, c, t):
        # identical per-shard backward, no collectives
        num_shards = mesh.shape["tiles"]
        band_h = M._shard_config(config, num_shards).height

        def shard_step(scene, cameras, targets):
            def loss_fn(scene, cameras, targets):
                d = lax.axis_index("tiles")

                def one_view(cam, tgt):
                    splats = M.prepare_splats(scene, cam, config, sort=False)
                    band = M._composite_band(splats, d, num_shards, config)
                    row0 = d * band_h
                    rows = row0 + jnp.arange(band_h)
                    valid = (rows < config.height)[:, None, None]
                    return jnp.sum(jnp.where(valid, (band - tgt) ** 2, 0.0))

                return jnp.sum(jax.vmap(one_view)(cameras, targets))

            return jax.value_and_grad(loss_fn)(scene, cameras, targets)

        loss, grads = jax.shard_map(
            shard_step, mesh=mesh,
            in_specs=(M.P(), M.P("views"), M.P("views", "tiles", None, None)),
            out_specs=(M.P(), M.P()), check_vma=False,
        )(s, c, t)
        return chain(grads, loss)

    def step_psum_only(s):
        def shard_step(scene):
            grads = jax.tree.map(
                lambda g: lax.psum(g * 1e-3, ("views", "tiles")), scene)
            return grads

        grads = jax.shard_map(
            shard_step, mesh=mesh, in_specs=(M.P(),), out_specs=M.P(),
            check_vma=False,
        )(s)
        return chain(grads, jnp.float32(0.0))

    def timed(name, fn, *a, k=None):
        k = k or args.iters

        def k_steps(s, *rest):
            def body(_, eps):
                return fn(GaussianScene(
                    means=s.means + eps, sh=s.sh, opacities=s.opacities,
                    log_scales=s.log_scales, quats=s.quats), *rest)

            return jax.lax.fori_loop(0, k, lambda i, c: body(i, c), jnp.float32(0.0))

        t0 = time.time()
        compiled = jax.jit(k_steps).lower(*a).compile()
        compile_s = time.time() - t0
        float(compiled(*a))  # warm + enter sync mode
        t1 = time.perf_counter(); float(compiled(*a)); t1 = time.perf_counter() - t1
        print(f"{name:14s} {t1 * 1e3 / k:8.2f} ms/step (compile {compile_s:.0f}s)",
              flush=True)
        # HLO scheduling evidence: async collective pairs in the compiled module
        txt = compiled.as_text()
        starts = txt.count("all-reduce-start")
        dones = txt.count("all-reduce-done")
        if starts:
            print(f"{'':14s} compiled HLO: {starts} all-reduce-start / "
                  f"{dones} all-reduce-done (async pairs -> schedulable "
                  f"under compute)", flush=True)
        return t1 / k

    ta = timed("full step", step_full, scene, cams, targets)
    tb = timed("no psum", step_nopsum, scene, cams, targets)
    tc = timed("psum only", step_psum_only, scene)
    overlap = (tb + tc - ta) / max(tc, 1e-12)
    print(f"collective time: {tc * 1e3:.2f} ms; exposed in full step: "
          f"{(ta - tb) * 1e3:.2f} ms; overlap = {overlap * 100:.0f}%"
          + ("  [CPU backend: synchronous collectives — mechanism check only]"
             if jax.devices()[0].platform == "cpu" else ""),
          flush=True)


if __name__ == "__main__":
    main()
