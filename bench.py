"""Benchmark: fwd+bwd tiled splat rendering throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric (BASELINE.json): rays/s (= pixels/s) per chip, forward+backward, 1080p.
The reference publishes no numbers (BASELINE.md); ``vs_baseline`` is therefore
normalized against the interactive rate its design implies on desktop GPU —
60 FPS at its default 1024x768 window (src/sdl_main.cpp:72-73, fps counter
sdl_main.cpp:157-164) = 47.2 Mpixel/s, *forward only*. We report forward+
backward pixels/s against that bar.
"""

import argparse
import json
import os
import time

import numpy as np

REFERENCE_PIXELS_PER_S = 60.0 * 1024 * 768  # implied interactive rate, fwd-only


def make_scene(num_splats: int, seed: int = 0):
    """Round-1 synthetic: uniform random ball (kept for series continuity as
    --scene ball; the default bench scene is now the garden stand-in)."""
    import jax.numpy as jnp

    from splatapult_tpu.io.gaussians import GaussianScene

    rng = np.random.default_rng(seed)
    quats = rng.standard_normal((num_splats, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    means = rng.standard_normal((num_splats, 3)).astype(np.float32)
    means *= (rng.uniform(0, 1, (num_splats, 1)) ** (1 / 3)) / np.maximum(
        np.linalg.norm(means, axis=1, keepdims=True), 1e-6
    )
    return GaussianScene(
        means=jnp.asarray(means * 2.0),
        sh=jnp.asarray(rng.standard_normal((num_splats, 3, 16)) * 0.3, jnp.float32),
        opacities=jnp.asarray(rng.uniform(-2.0, 3.0, (num_splats,)), jnp.float32),
        log_scales=jnp.asarray(rng.uniform(-6.5, -4.5, (num_splats, 3)), jnp.float32),
        quats=jnp.asarray(quats),
    )


def make_bench_scene(kind: str, num_splats: int, seed: int = 0):
    if kind == "ball":
        return make_scene(num_splats, seed)
    from splatapult_tpu.io.synth import make_garden_scene

    # BASELINE config 3: Mip-NeRF-360-garden-class capture stand-in
    # (trained-scene statistics; io/synth.py documents how)
    return make_garden_scene(num_splats, seed)


_BENCH_OPT = None  # one optax object per process: make_zero_fit_steps caches by identity


def bench_mesh(args, scene, config):
    """Scaling-efficiency harness (BASELINE configs 4-5, BASELINE.md: >=85%
    rays/s efficiency 1 -> N). Times the full SPMD train step (render + loss
    + backward + cross-chip grad psum, parallel/mesh.py) on a 1-chip mesh and
    an N-chip tile mesh with the same total work, and reports
    efficiency = (rate_N / N) / rate_1.

    Wall-clock is only meaningful on N real chips; on the virtual CPU mesh
    (--mesh-platform cpu) the harness still runs end to end so a real slice
    run is turnkey."""
    import json
    import time

    import jax
    import jax.numpy as jnp

    from splatapult_tpu.io.gaussians import GaussianScene
    from splatapult_tpu.io.synth import garden_cameras
    from splatapult_tpu.parallel.mesh import (
        _sharded_value_and_grad, make_render_mesh, shard_targets,
    )

    n_dev = len(jax.devices())
    n = args.mesh
    if n_dev < n:
        raise SystemExit(
            f"--mesh {n} needs {n} devices, found {n_dev}. For a mechanism "
            f"check without hardware: --mesh-platform cpu (virtual devices)."
        )
    views = max(args.views, 1)
    cam = garden_cameras(views, width=args.width, height_px=args.height)
    if views == 1:
        from splatapult_tpu.render import Camera

        cam = Camera(cam_to_world=cam.cam_to_world[None], proj=cam.proj[None])

    rates = {}
    mults = {}
    for shards in (1, n):
        mesh = make_render_mesh(num_tile_shards=shards, num_view_shards=1,
                                devices=jax.devices()[:shards])
        cfg = config
        if shards > 1 and getattr(args, "instance_mult", 1.0) <= 0.0:
            # band-aware capacity for the sharded arm (VERDICT r4 item 1):
            # each chip's instance sort runs at ~1/D of the full-view rows
            # instead of full-view capacity. The 1-chip arm keeps the
            # full-view calibration — each arm at its own best config is
            # the honest efficiency comparison.
            from splatapult_tpu.parallel.mesh import calibrate_config_sharded

            cfg = calibrate_config_sharded(scene, cam, config, mesh)
            if args.verbose:
                import sys

                print(f"# mesh={shards}: band-calibrated mult "
                      f"{cfg.max_instance_mult:.3f} (full-view was "
                      f"{config.max_instance_mult:.3f})", file=sys.stderr)
        mults[shards] = cfg.max_instance_mult
        targets = shard_targets(
            jnp.zeros((views, args.height, args.width, 4), jnp.float32),
            cfg, mesh)

        allreduce = getattr(args, "allreduce", "psum")
        shard_prepare = getattr(args, "shard_prepare", True)
        param_shard = getattr(args, "param_shard", False)

        if param_shard:
            # ZeRO arm: the FULL config-5 step (fwd + bwd + sharded optax
            # update, no grad all-reduce) as make_zero_fit_steps compiles
            # it. K data-chained steps = the scan itself; per-step =
            # (T_K - T_1)/(K - 1), same discipline as the value_and_grad
            # arm. Both shard counts run the same program shape, so the
            # efficiency ratio stays like-for-like.
            import optax

            from splatapult_tpu.parallel.mesh import (
                make_zero_fit_steps, pad_scene_to_mesh,
            )

            opt = _BENCH_OPT if _BENCH_OPT is not None else optax.adam(1e-3)
            globals()["_BENCH_OPT"] = opt
            padded, true_n = pad_scene_to_mesh(scene, mesh)
            opt_state = opt.init(padded)
            sh_k = int(scene.sh.shape[-1])

            def timed_steps(k):
                fit = make_zero_fit_steps(cfg, mesh, opt, k, true_n, sh_k)

                def run(s, c, t, o):
                    s2, o2, losses = fit(s, c, t, o)
                    # chain EVERY updated leaf: at k=1 the losses only read
                    # the pre-update scene, so an unchained leaf's optax
                    # update would be DCE'd and deflate the T_1 baseline
                    chain = sum(jnp.sum(l) for l in jax.tree.leaves(s2))
                    return jnp.sum(losses) + chain * 1e-30

                runner = jax.jit(run)
                float(runner(padded, cam, targets, opt_state))  # compile
                t0 = time.perf_counter()
                float(runner(padded, cam, targets, opt_state))
                return time.perf_counter() - t0

            t1 = timed_steps(1)
            tk = timed_steps(args.iters)
            dt = max((tk - t1) / max(args.iters - 1, 1), 1e-9)
            rates[shards] = args.width * args.height * views / dt
            if args.verbose:
                import sys

                print(f"# mesh={shards} (zero): {dt * 1e3:.2f} ms/step, "
                      f"{rates[shards] / 1e6:.2f} Mpx/s", file=sys.stderr)
            continue

        def k_steps(s, c, t, k_iters, cfg=cfg, mesh=mesh):
            def body(_, eps):
                loss, grads = _sharded_value_and_grad(
                    GaussianScene(
                        means=s.means + eps, sh=s.sh, opacities=s.opacities,
                        log_scales=s.log_scales, quats=s.quats),
                    c, t, cfg, mesh, grad_allreduce=allreduce,
                    shard_prepare=shard_prepare)
                return (loss + grads.means[0, 0]) * 1e-30

            return jax.lax.fori_loop(0, k_iters, body, jnp.float32(0.0))

        runner = jax.jit(k_steps)
        float(runner(scene, cam, targets, jnp.int32(1)))  # compile
        t1 = time.perf_counter()
        float(runner(scene, cam, targets, jnp.int32(1)))
        t1 = time.perf_counter() - t1
        tk = time.perf_counter()
        float(runner(scene, cam, targets, jnp.int32(args.iters)))
        tk = time.perf_counter() - tk
        dt = max((tk - t1) / max(args.iters - 1, 1), 1e-9)
        rates[shards] = args.width * args.height * views / dt
        if args.verbose:
            import sys

            print(f"# mesh={shards}: {dt * 1e3:.2f} ms/step, "
                  f"{rates[shards] / 1e6:.2f} Mpx/s", file=sys.stderr)

    eff = (rates[n] / n) / rates[1]
    print(json.dumps({
        "metric": f"rays/s scaling efficiency 1->{n} chips fwd+bwd",
        "value": eff,
        "unit": "ratio",
        "vs_baseline": eff / 0.85,  # BASELINE.md: >=85% efficiency bar
        "rate_1chip_px_s": rates[1],
        f"rate_{n}chip_px_s": rates[n],
        "allreduce": allreduce,
        "shard_prepare": shard_prepare,
        "param_shard": getattr(args, "param_shard", False),
        "instance_mult_1chip": mults[1],
        f"instance_mult_{n}chip": mults[n],
    }))


def _enable_compile_cache():
    """Persistent compilation cache: the 1M-splat fwd+bwd program takes several
    minutes to compile; cache it across processes."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/splatapult_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


def main():
    _enable_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--scene", default="both", choices=("garden", "ball", "both"),
        help="garden = BASELINE config 3's trained-capture stand-in "
             "(io/synth.py); ball = round-1's uniform random ball; both "
             "(default) = measure both and print ONE JSON line: the garden "
             "headline carrying the ball-1M series record as a nested field "
             "(round-over-round artifact continuity)",
    )
    parser.add_argument("--splats", type=int, default=1_500_000,
                        help="config 3 names ~1.5M splats")
    parser.add_argument("--width", type=int, default=1920)
    parser.add_argument("--height", type=int, default=1080)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--warmup", type=int, default=1)
    parser.add_argument("--fwd-only", action="store_true")
    parser.add_argument(
        "--mesh", type=int, default=0,
        help="scaling-efficiency harness (BASELINE configs 4-5): run the "
             "SPMD train step over an N-way tile mesh AND over 1 chip, "
             "report per-chip pixels/s and efficiency. Meaningful numbers "
             "need N real chips; the mechanism runs anywhere (the driver "
             "dry-runs it on a virtual CPU mesh).",
    )
    parser.add_argument(
        "--shard-prepare", action=argparse.BooleanOptionalAction, default=True,
        help="for --mesh: shard the O(N) projection/SH over the tile axis "
             "(each chip prepares N/D splats + one 56 B/splat all-gather "
             "over ICI) instead of replicating it; --no-shard-prepare for "
             "the replicated A/B arm",
    )
    parser.add_argument(
        "--param-shard", action="store_true",
        help="for --mesh: time the ZeRO parameter-sharded full train step "
             "(make_zero_fit_steps: sharded params + optax, NO grad "
             "all-reduce) instead of the replicated value_and_grad step",
    )
    parser.add_argument(
        "--allreduce", default="psum", choices=("psum", "ring"),
        help="gradient all-reduce flavor for --mesh: monolithic in-backward "
             "psum, or the explicit ppermute ring whose 2(D-1) independent "
             "collectives the latency-hiding scheduler CAN overlap with "
             "backward compute (AOT schedule evidence, PERF.md round 3) — "
             "A/B both on the first real slice",
    )
    parser.add_argument(
        "--views", type=int, default=1,
        help="camera-batch size (BASELINE config 4 analog): vmap over a "
             "circular camera path; throughput counts all views' pixels",
    )
    parser.add_argument(
        "--instance-mult", type=float, default=0.0,
        help="instance-buffer capacity as a multiple of N; 0 (default) "
             "auto-calibrates from the measured instance demand of the bench "
             "view(s) + 6%% headroom (the TPU analog of the reference's "
             "radix-workgroup auto-tuner, src/app.cpp:843-874); overflow is "
             "reported, not silent",
    )
    parser.add_argument("--tile-size", type=int, default=32)
    parser.add_argument("--tile-block", type=int, default=128)
    parser.add_argument(
        "--sort-bands", type=int, default=1,
        help="split the pipeline into K interleaved tile-row bands, each "
             "binning/sorting/compositing at ~1/K capacity (exact; "
             "RenderConfig.sort_bands). MEASURED NEGATIVE single-chip at "
             "5M (644 vs 491 ms: per-band compaction sorts ~54 ms + "
             "duplicated O(N) plumbing swamp the ~2^23-cliff saving — "
             "PERF.md r5, tools/probe_sort_bands.py), so the default is 1 "
             "(never). 0 = auto-engage past the cliff, kept for A/B",
    )
    parser.add_argument(
        "--depth-bits", type=int, default=0, choices=(0, 16, 20, 32),
        help="depth precision in the instance sort key (0 = auto: the 20-bit "
             "packed key — one sort operand fewer at ~2.4e-4 relative depth "
             "precision; 32 = exact f32 ordering; 16 = the bf16 key, demoted "
             "after scene-scale image diffs, kept for A/B — PERF.md r4)",
    )
    # The bench's default profile is the production-training configuration:
    # two documented, test-covered precision knobs are ON (the library's
    # RenderConfig defaults keep both OFF, i.e. exact f32). Ablations and
    # measured error bounds in PERF.md; disable to measure the exact path.
    parser.add_argument(
        "--grad-sort-dtype", default="bfloat16", choices=("float32", "bfloat16"),
        help="dtype per-instance grads ride through the backward transpose "
             "sort (bf16 halves that sort's bytes; per-splat sums stay f32; "
             "grads within ~0.4%% of peak — float32 for the exact path)",
    )
    parser.add_argument(
        "--packed-colors", action=argparse.BooleanOptionalAction, default=True,
        help="pack splat RGB as 16-bit fixed point (max color error 1.2e-4) "
             "so feature rows hit the fast 32 B row-gather path "
             "(--no-packed-colors for exact f32 colors)",
    )
    parser.add_argument(
        "--packed-feats16", default="auto", choices=("auto", "on", "off"),
        help="quantize whole instance feature rows to 16 B so giant tables "
             "stay in the fast gather regime (~15 ns/idx above ~85-120 MB "
             "vs 3.5-4.7 below, PERF.md). auto = on when the packed_colors "
             "table would exceed 100 MB (N > ~3.1M splats); committed error "
             "bounds in tests/test_tiled.py",
    )
    parser.add_argument(
        "--early-stop", type=float, default=1e-4,
        help="skip blocks once a tile's max transmittance falls below this "
             "(0 = exact; 1e-4 is the standard 3DGS termination threshold)",
    )
    parser.add_argument(
        "--mesh-platform", default="default", choices=("default", "cpu"),
        help="cpu: force the CPU host platform with --mesh virtual devices "
             "(mechanism check for the scaling harness without a pod slice)",
    )
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args()

    import jax

    if args.mesh and args.mesh_platform == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.mesh}"
            ).strip()
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    if args.scene == "both" and not args.mesh:
        # series continuity (VERDICT r2): the round-1 artifact timed the 1M
        # ball, round 2 the garden stand-in. Measure BOTH and print ONE JSON
        # line — the garden headline (comparable to BENCH_r02) carrying the
        # ball-1M record (comparable to BENCH_r01) as a nested field.
        ball = _bench_scene_run(args, "ball", 1_000_000)
        garden = _bench_scene_run(args, "garden", args.splats)
        garden["series_ball_1m"] = ball
        print(json.dumps(garden))
        return
    kind = "garden" if args.scene == "both" else args.scene

    scene = make_bench_scene(kind, args.splats)
    # the garden generator returns HOST numpy arrays; without an explicit
    # device_put every timed call re-transfers the ~350 MB scene through the
    # tunnel (~12 s/call measured). One transfer up front instead.
    scene = jax.tree.map(jnp.asarray, scene)
    config = _make_config(args)
    cam = _make_cameras(args, kind)
    if args.instance_mult <= 0.0:
        config = _calibrated(args, scene, cam, config)

    if args.mesh:
        bench_mesh(args, scene, config)
        return
    print(json.dumps(_timed_run(args, kind, scene, cam, config)))


def _make_cameras(args, kind):
    import jax.numpy as jnp
    import numpy as np

    from splatapult_tpu.core import transforms as T
    from splatapult_tpu.render import Camera

    if kind == "garden":
        from splatapult_tpu.io.synth import garden_cameras

        cam = garden_cameras(args.views, width=args.width, height_px=args.height)
    elif args.views > 1:
        cams = [
            Camera.from_fov(
                T.look_at(eye=[np.cos(a) * 4.5, 0.8, np.sin(a) * 4.5],
                          target=[0, 0, 0], up=[0, 1, 0]),
                fovy=np.pi / 4, width=args.width, height=args.height,
            )
            for a in np.linspace(0, 2 * np.pi, args.views, endpoint=False)
        ]
        cam = Camera(
            cam_to_world=jnp.stack([c.cam_to_world for c in cams]),
            proj=jnp.stack([c.proj for c in cams]),
        )
    else:
        cam = Camera.from_fov(
            T.look_at(eye=[0.0, 0.8, 4.5], target=[0, 0, 0], up=[0, 1, 0]),
            fovy=np.pi / 4, width=args.width, height=args.height,
        )
    return cam


def _make_config(args):
    from splatapult_tpu.render import RenderConfig

    # production profile: the 20-bit packed depth key (one sort operand +
    # one comparison key fewer at ~2.4e-4 relative depth precision — finer
    # than the reference's shipped 32-bit linear key for near content,
    # shader/presort_compute.glsl:52-53). Exact f32 ordering is one flag
    # away (--depth-bits 32). The round-3 bf16 (16-bit) key was demoted
    # after scene-scale image evidence (tools/probe_depth16_image.py,
    # PERF.md round 4).
    depth_bits = args.depth_bits or 20
    pf16 = getattr(args, "packed_feats16", "off")
    packed16 = (pf16 == "on"
                or (pf16 == "auto" and args.splats * 32 > 100_000_000))
    if pf16 == "auto" and packed16:
        import sys

        print(f"# packed-feats16 auto gate ENGAGED at {args.splats} splats "
              f"(packed_colors table would exceed 100 MB); 16 B rows with "
              f"the committed error bounds (tests/test_tiled.py)",
              file=sys.stderr)
    return RenderConfig(
        width=args.width, height=args.height, pipeline="tiled",
        tile_size=args.tile_size, tile_block=args.tile_block,
        max_instance_mult=args.instance_mult,
        early_stop_eps=args.early_stop,
        grad_sort_dtype=args.grad_sort_dtype,
        packed_colors=args.packed_colors,
        packed_feats16=packed16,
        forward_only=args.fwd_only,
        depth_bits=depth_bits,
    )


def _calibrated(args, scene, cam, config):
    # auto-calibrate capacity from the measured demand of the bench
    # view(s): one tiny extra compile, then every per-step
    # sort/gather/kernel runs at right-sized rather than worst-case
    # capacity (render.calibrate_config)
    import dataclasses
    import math

    from splatapult_tpu.render import calibrate_config

    # bucket=1.0: the bench measures ONE fixed view per scene, so the exact
    # demand-fit capacity is the right measurement (the geometric bucketing
    # exists to share compiles across a camera SWEEP and costs up to 8%
    # capacity overshoot); the power-of-two sort-cliff clamp still applies
    n = scene.means.shape[0]
    tiles = ((-(-args.width // args.tile_size))
             * (-(-args.height // args.tile_size)))
    k = getattr(args, "sort_bands", 1)
    auto = k == 0
    if auto:
        k = 1
    while True:
        cfg_k = dataclasses.replace(config, sort_bands=k)
        cfg_k = calibrate_config(scene, cam, cfg_k, bucket=1.0)
        emax = max(4096, -(-int(cfg_k.max_instance_mult * n) // 4096) * 4096)
        mcap = emax + tiles * args.tile_block // k
        # auto banding: past the lax.sort 2^23 row cliff every per-band
        # sort pays ~35% more per row; split into interleaved tile-row
        # bands until each band's mcap fits under the boundary
        # (RenderConfig.sort_bands; exactness-tested)
        if not auto or mcap < (1 << 23) or k >= 8:
            break
        k += 1
    if k > 1 and args.verbose:
        print(f"# sort-bands {k}: per-band mcap {mcap} under the 2^23 "
              f"sort cliff", file=__import__('sys').stderr)
    config = cfg_k
    if args.verbose:
        print(f"# auto capacity: mult {config.max_instance_mult:.3f} "
              f"(exact fit + cliff clamp; includes 6% headroom)")
    return config


def _bench_scene_run(args, kind, splats):
    """Build + time one scene; returns the tagged result dict."""
    import jax
    import jax.numpy as jnp

    a = argparse.Namespace(**vars(args))
    a.splats = splats
    scene = make_bench_scene(kind, splats)
    scene = jax.tree.map(jnp.asarray, scene)  # garden returns host numpy
    config = _make_config(a)
    cam = _make_cameras(a, kind)
    if a.instance_mult <= 0.0:
        config = _calibrated(a, scene, cam, config)
    return _timed_run(a, kind, scene, cam, config)


def _timed_run(args, kind, scene, cam, config):
    import jax
    import jax.numpy as jnp

    from splatapult_tpu.render import render, render_batch

    # Timing methodology: this environment's TPU tunnel makes
    # jax.block_until_ready a no-op until the first device->host readback, and
    # synchronous-per-dispatch (+~25 ms protocol) afterwards. The only honest
    # measurement is K data-chained steps inside ONE jitted program, ended by
    # one scalar readback; per-step = (total - one protocol round trip) / K.
    k = args.iters

    render_fn = render if args.views == 1 else render_batch

    if args.fwd_only:
        def one_step(s, c, eps):
            img = render_fn(
                GaussianScene(
                    means=s.means + eps, sh=s.sh, opacities=s.opacities,
                    log_scales=s.log_scales, quats=s.quats,
                ),
                c, config,
            )
            return jnp.ravel(img)[0] * 1e-30  # data dependency for the next step
    elif args.views > 1:
        # the production multi-view fwd+bwd structure (train._train_step_impl):
        # a lax.scan of per-view value_and_grad into carried gradient sums —
        # same math as differentiating through the view batch, measured
        # 98.6 ms/view at 1M/1080p vs 106.3 through lax.map (+5.1 ms/view of
        # scan residual-stacking) and ~220 vmapped (PERF.md r5, config 4)
        from splatapult_tpu.render import Camera, render

        def view_loss(s, cam_mat, proj):
            img = render(s, Camera(cam_to_world=cam_mat, proj=proj), config)
            return jnp.mean(img ** 2)

        vg = jax.value_and_grad(view_loss)

        def one_step(s, c, eps):
            sp = GaussianScene(
                means=s.means + eps, sh=s.sh, opacities=s.opacities,
                log_scales=s.log_scales, quats=s.quats,
            )

            def body(carry, xs):
                al, ag = carry
                cm, pj = xs
                l, g = vg(sp, cm, pj)
                return (al + l, jax.tree.map(jnp.add, ag, g)), None

            zero = jax.tree.map(jnp.zeros_like, sp)
            (ls, gs), _ = jax.lax.scan(
                body, (jnp.float32(0.0), zero), (c.cam_to_world, c.proj))
            return (ls + gs.means[0, 0]) * 1e-30
    else:
        def loss(s, c):
            return jnp.mean(render_fn(s, c, config) ** 2)

        grad_loss = jax.value_and_grad(loss)

        def one_step(s, c, eps):
            val, grads = grad_loss(
                GaussianScene(
                    means=s.means + eps, sh=s.sh, opacities=s.opacities,
                    log_scales=s.log_scales, quats=s.quats,
                ),
                c,
            )
            return (val + grads.means[0, 0]) * 1e-30

    from splatapult_tpu.io.gaussians import GaussianScene

    # dynamic trip count -> ONE compiled program serves both the 1-step and
    # K-step measurements (the full fwd+bwd program takes minutes to compile)
    def k_steps(s, c, k_iters):
        def body(_, eps):
            return one_step(s, c, eps)

        return jax.lax.fori_loop(0, k_iters, body, jnp.float32(0.0))

    runner = jax.jit(k_steps)

    t0 = time.time()
    float(runner(scene, cam, jnp.int32(1)))  # compile + readback (sync mode on)
    compile_s = time.time() - t0

    def timed(k_iters):
        t0 = time.perf_counter()
        float(runner(scene, cam, jnp.int32(k_iters)))
        return time.perf_counter() - t0

    # The tunnel's protocol round trip is large AND noisy (seconds-scale
    # spikes observed); a single 1-step sample can exceed a K-step sample and
    # flip the difference negative. Min over several trials of BOTH sides is
    # robust to spikes (the round trip is a constant floor plus positive
    # noise, so min approaches floor + compute).
    for _ in range(max(args.warmup, 1)):
        timed(1)
    t_single = min(timed(1) for _ in range(3))
    t_k = min(timed(k) for _ in range(3))
    if k > 1 and t_k > t_single:
        dt = (t_k - t_single) / (k - 1)
        timing = "chained-difference"
    else:
        # degenerate (noise swamped the difference): upper-bound the step by
        # the K-step total over K — pessimistic (includes the round trip once)
        # but never nonsensical. Tagged in the JSON so readers can tell an
        # upper bound from a clean per-step measurement.
        dt = t_k / k
        timing = "degenerate-upper-bound"
        import sys

        print(
            f"# WARNING: degenerate timing fallback (1-step {t_single * 1e3:.1f}ms"
            f" >= {k}-step {t_k * 1e3:.1f}ms); step time includes one tunnel "
            f"round trip — treat as an upper bound",
            file=sys.stderr,
        )

    pixels = args.width * args.height * args.views
    value = pixels / dt
    if args.verbose:
        import sys

        print(
            f"# compile={compile_s:.1f}s step={dt * 1e3:.2f}ms "
            f"(1-step total={t_single * 1e3:.1f}ms, {k}-step total={t_k * 1e3:.1f}ms) "
            f"splats={args.splats} {args.width}x{args.height} views={args.views} "
            f"mode={'fwd' if args.fwd_only else 'fwd+bwd'} scene={kind}",
            file=sys.stderr,
        )
    from splatapult_tpu.render import profile_name

    return {
        "metric": "pixels/s per chip fwd+bwd 1080p"
        if not args.fwd_only
        else "pixels/s per chip fwd 1080p",
        "value": value,
        "unit": "pixels/s",
        "vs_baseline": value / REFERENCE_PIXELS_PER_S,
        "scene": kind,
        "splats": args.splats,
        "step_ms": dt * 1e3,
        "timing": timing,
        # which precision profile ran (VERDICT r4 weak #4: this and the CLI
        # bench silently measured different configurations; both now tag it)
        "profile": profile_name(config),
        "packed_feats16": config.packed_feats16,
        "sort_bands": getattr(config, "sort_bands", 1),
    }


if __name__ == "__main__":
    main()
