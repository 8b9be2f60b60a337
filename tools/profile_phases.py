"""Phase-level TPU profiling: where does a fwd+bwd step actually go?

Each phase is timed as K data-chained iterations inside ONE jitted fori_loop
ending in a single scalar readback (see bench.py for why: this environment's
tunnel makes naive block_until_ready timing wrong in both its regimes).

Usage: python tools/profile_phases.py --splats 1000000 --iters 5
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--scene", default="ball", choices=("ball", "garden"))
    parser.add_argument("--splats", type=int, default=1_000_000)
    parser.add_argument("--width", type=int, default=1920)
    parser.add_argument("--height", type=int, default=1080)
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--instance-mult", type=float, default=0.0,
                        help="0 = auto-calibrate from measured demand (like bench.py)")
    parser.add_argument("--tile-size", type=int, default=32)
    parser.add_argument("--tile-block", type=int, default=128)
    parser.add_argument("--early-stop", type=float, default=1e-4)
    parser.add_argument("--fwd-only", action="store_true",
                        help="profile the viewer configuration")
    parser.add_argument("--depth-bits", type=int, default=0, choices=(0, 16, 20, 32))
    parser.add_argument(
        "--phases", type=str,
        default="prepare,bin,fwd,fwd_bwd",
        help="comma list from: prepare,bin,bin_enum,bin_sort,gather,composite,fwd,fwd_bwd",
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/splatapult_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from bench import make_bench_scene
    from splatapult_tpu.core import transforms as T
    from splatapult_tpu.io.gaussians import GaussianScene
    from splatapult_tpu.ops.binning import TileGrid, bin_splats
    from splatapult_tpu.ops.composite import composite_from_feats
    from splatapult_tpu.ops.tiled import pack_features
    from splatapult_tpu.render import Camera, RenderConfig, prepare_splats, render

    scene = make_bench_scene(args.scene, args.splats)
    scene = jax.tree.map(jnp.asarray, scene)  # garden returns host numpy
    if args.scene == "garden":
        from splatapult_tpu.io.synth import garden_cameras

        cam = garden_cameras(1, width=args.width, height_px=args.height)
    else:
        cam = Camera.from_fov(
            T.look_at(eye=[0.0, 0.8, 4.5], target=[0, 0, 0], up=[0, 1, 0]),
            fovy=np.pi / 4, width=args.width, height=args.height,
        )
    config = RenderConfig(
        width=args.width, height=args.height, pipeline="tiled",
        tile_size=args.tile_size, tile_block=args.tile_block,
        max_instance_mult=args.instance_mult, early_stop_eps=args.early_stop,
        grad_sort_dtype="bfloat16", packed_colors=True,
        forward_only=args.fwd_only,
        depth_bits=args.depth_bits or 20,  # matches bench.py: 20 is the production default
    )
    if args.instance_mult <= 0.0:
        from splatapult_tpu.render import calibrate_config

        config = calibrate_config(scene, cam, config)
        print(f"# auto capacity: mult {config.max_instance_mult:.3f}")
    grid = TileGrid.create(
        width=args.width, height=args.height, num_splats=args.splats,
        tile_size=args.tile_size, block=args.tile_block,
        max_instance_mult=config.max_instance_mult,
        early_stop_eps=args.early_stop,
        grad_sort_dtype=config.grad_sort_dtype,
        packed_colors=config.packed_colors,
        forward_only=config.forward_only, depth_bits=config.depth_bits,
    )

    def perturb(s, eps):
        return GaussianScene(
            means=s.means + eps, sh=s.sh, opacities=s.opacities,
            log_scales=s.log_scales, quats=s.quats,
        )

    # ---- phase bodies: (scene, eps) -> scalar with data dependency ----
    # Each mirrors the PRODUCTION tiled path (ops/tiled.composite_tiled):
    # unsorted prepare, depth riding the binning sort.
    def ph_prepare(s, eps):
        d = prepare_splats(perturb(s, eps), cam, config, sort=False)
        return d["mean2d"][0, 0] * 1e-30

    def _bins(s, eps):
        d = prepare_splats(perturb(s, eps), cam, config, sort=False)
        return d, bin_splats(
            jax.lax.stop_gradient(d["mean2d"]),
            jax.lax.stop_gradient(d["extent"]), grid,
            depth=jax.lax.stop_gradient(d["depth"]),
        )

    def ph_bin(s, eps):
        _, bins = _bins(s, eps)
        mp = bins["m_pos"][0] if "m_pos" in bins else 0
        return (bins["inst_splat"][0] + mp).astype(jnp.float32) * 1e-30

    def ph_gather(s, eps):
        d, bins = _bins(s, eps)
        feats = pack_features(d["mean2d"], d["conic"], d["rgb"], d["alpha"])
        inst = jnp.take(feats, bins["inst_splat"], axis=0)
        return inst[0, 0] * 1e-30

    def ph_composite(s, eps):
        d, bins = _bins(s, eps)
        feats = pack_features(d["mean2d"], d["conic"], d["rgb"], d["alpha"])
        out = composite_from_feats(feats, bins, grid)
        return out[0, 0, 0] * 1e-30

    def ph_fwd(s, eps):
        return render(perturb(s, eps), cam, config)[0, 0, 0] * 1e-30

    def loss(s):
        return jnp.mean(render(s, cam, config) ** 2)

    gl = jax.value_and_grad(loss)

    def ph_fwd_bwd(s, eps):
        v, g = gl(perturb(s, eps))
        return (v + g.means[0, 0]) * 1e-30

    bodies = {
        "prepare": ph_prepare,
        "bin": ph_bin,
        "gather": ph_gather,
        "composite": ph_composite,
        "fwd": ph_fwd,
        "fwd_bwd": ph_fwd_bwd,
    }

    k = args.iters
    results = {}
    for name in args.phases.split(","):
        body = bodies[name.strip()]

        def k_steps(s, k_iters, body=body):
            return jax.lax.fori_loop(
                0, k_iters, lambda _, e: body(s, e), jnp.float32(0.0)
            )

        runner = jax.jit(k_steps, static_argnames=())
        t0 = time.time()
        float(runner(scene, jnp.int32(1)))
        compile_s = time.time() - t0
        t_single = min(
            _timeit(lambda: float(runner(scene, jnp.int32(1)))) for _ in range(3)
        )
        t_k = min(
            _timeit(lambda: float(runner(scene, jnp.int32(k)))) for _ in range(3)
        )
        dt = (t_k - t_single) / (k - 1) if (k > 1 and t_k > t_single) else t_k / k
        results[name] = dt
        print(f"{name:12s} {dt * 1e3:9.2f} ms/step   (compile {compile_s:.1f}s)", flush=True)

    if "fwd" in results and "composite" in results:
        print(f"{'fwd-composite':12s} {(results['fwd'] - results['composite']) * 1e3:9.2f} ms (assembly)")
    if "fwd_bwd" in results and "fwd" in results:
        print(f"{'bwd only':12s} {(results['fwd_bwd'] - results['fwd']) * 1e3:9.2f} ms")


def _timeit(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
