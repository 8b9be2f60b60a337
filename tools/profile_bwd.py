"""Decompose the composite backward at bench scale: kernel vs transpose vs scan.

Precomputes concrete bins/feats on device, then times each backward piece as
K data-chained reps in one jitted fori_loop (see bench.py for why).
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


def timed(name, fn, *args, k=6):
    import jax
    import jax.numpy as jnp

    def k_steps(k_iters, *a):
        def body(_, c):
            return fn(c, *a)

        return jax.lax.fori_loop(0, k_iters, body, jnp.float32(0.0))

    r = jax.jit(k_steps)
    float(r(np.int32(1), *args))
    t1 = min(_t(lambda: float(r(np.int32(1), *args))) for _ in range(2))
    tk = min(_t(lambda: float(r(np.int32(k), *args))) for _ in range(2))
    dt = (tk - t1) / (k - 1)
    print(f"{name:40s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--splats", type=int, default=1_000_000)
    parser.add_argument("--width", type=int, default=1920)
    parser.add_argument("--height", type=int, default=1080)
    parser.add_argument("--instance-mult", type=int, default=4)
    parser.add_argument("--early-stop", type=float, default=1e-4)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/splatapult_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from bench import make_scene
    from splatapult_tpu.core import transforms as T
    from splatapult_tpu.ops import composite as C
    from splatapult_tpu.ops.binning import TileGrid, bin_splats
    from splatapult_tpu.ops.tiled import pack_features
    from splatapult_tpu.render import Camera, RenderConfig, prepare_splats

    scene = make_scene(args.splats)
    cam = Camera.from_fov(
        T.look_at(eye=[0.0, 0.8, 4.5], target=[0, 0, 0], up=[0, 1, 0]),
        fovy=np.pi / 4, width=args.width, height=args.height,
    )
    config = RenderConfig(
        width=args.width, height=args.height, pipeline="tiled",
        max_instance_mult=args.instance_mult, early_stop_eps=args.early_stop,
    )
    grid = TileGrid.create(
        width=args.width, height=args.height, num_splats=args.splats,
        tile_size=config.tile_size, block=config.tile_block,
        max_instance_mult=args.instance_mult, early_stop_eps=args.early_stop,
    )

    @jax.jit
    def setup(scene):
        d = prepare_splats(scene, cam, config)
        bins = bin_splats(
            jax.lax.stop_gradient(d["mean2d"]),
            jax.lax.stop_gradient(d["extent"]), grid,
        )
        feats = pack_features(d["mean2d"], d["conic"], d["rgb"], d["alpha"])
        inst = jnp.take(feats, bins["inst_splat"], axis=0)
        out = C._fwd_call(inst, bins["block_meta"], grid)
        return bins, feats, inst, out

    bins, feats, inst, out = jax.block_until_ready(setup(scene))
    print(f"# instances total={int(np.asarray(bins['tile_count']).sum())} "
          f"culled={int(np.asarray(bins['num_culled_instances']))} "
          f"emax={grid.emax} mcap={grid.mcap} blocks={grid.num_blocks} "
          f"live={int(np.asarray(bins['block_live']).sum())}",
          flush=True)

    dout = jnp.ones_like(out) * 1e-3

    def chain(c, *xs):
        # reduce over EVERYTHING so XLA cannot dead-code-eliminate any column
        # of the timed computation (x[0]-style chaining lets whole sort
        # payloads / cumsum columns vanish)
        tot = c * 1e-30
        for x in xs:
            tot = tot + jnp.sum(x.astype(jnp.float32)) * 1e-30
        return tot.astype(jnp.float32)

    timed(
        "fwd kernel only",
        lambda c, i: chain(
            c,
            C._fwd_call(i + c, bins["block_meta"], grid),
        ),
        inst,
    )
    timed(
        "bwd kernel only",
        lambda c, i: chain(
            c,
            C._bwd_call(i + c, bins["block_meta"], out, dout, grid),
        ),
        inst,
    )
    timed(
        "full composite vjp",
        lambda c, f: chain(
            c,
            jax.vjp(lambda ff: C.composite_from_feats(ff, bins, grid), f + c)[1](dout)[0],
        ),
        feats,
    )

    # ---- transpose pieces (the _cff_bwd tail after the kernel) ----
    d_inst = jnp.ones((grid.mcap, C.NUM_FEATS), jnp.float32)

    def transpose_tail(c, d):
        d = d + c
        sorted_cols = lax.sort(
            (bins["inst_splat"],) + tuple(d[:, i] for i in range(9)), num_keys=1
        )
        d_enum = jnp.stack([col[: grid.emax] for col in sorted_cols[1:]], axis=1)
        cs = jnp.cumsum(d_enum, axis=0)
        end = jnp.minimum(bins["seg_offs"] + bins["seg_cnt"], grid.emax)
        g = jnp.take(cs, jnp.clip(end - 1, 0, grid.emax - 1), axis=0)
        g = jnp.where((end > 0)[:, None], g, 0.0)
        d_rows = jnp.diff(g, axis=0, prepend=jnp.zeros((1, 9), g.dtype))
        return chain(c, d_rows)

    timed("transpose tail (sort+cumsum+diff)", transpose_tail, d_inst)

    def transpose_tail_new(c, d):
        d = d + c
        sorted_cols = lax.sort(
            (bins["inst_splat"],) + tuple(d[:, i] for i in range(9)), num_keys=1
        )
        cs8 = C._blocked_cumsum(
            jnp.stack([col[: grid.emax] for col in sorted_cols[1:9]], axis=1)
        )
        cs1 = C._blocked_cumsum(sorted_cols[9][: grid.emax])
        end = jnp.minimum(bins["seg_offs"] + bins["seg_cnt"], grid.emax)
        at = jnp.clip(end - 1, 0, grid.emax - 1)
        live_g = (end > 0)[:, None]
        g8 = jnp.where(live_g, jnp.take(cs8, at, axis=0), 0.0)
        g1 = jnp.where(live_g, jnp.take(cs1, at)[:, None], 0.0)
        g = jnp.concatenate([g8, g1], axis=1)
        d_rows = jnp.diff(g, axis=0, prepend=jnp.zeros((1, 9), g.dtype))
        return chain(c, d_rows)

    timed("transpose tail NEW (as shipped)", transpose_tail_new, d_inst)

    def gather_only(c, f):
        return chain(c, jnp.take(f + c, bins["inst_splat"], axis=0))

    timed("  instance row gather only", gather_only, feats)

    def sort_only(c, d):
        d = d + c
        sorted_cols = lax.sort(
            (bins["inst_splat"],) + tuple(d[:, i] for i in range(9)), num_keys=1
        )
        return chain(c, sorted_cols[1])

    timed("  10-operand sort only", sort_only, d_inst)

    d_enum0 = jnp.ones((grid.emax, 9), jnp.float32)

    def cumsum_only(c, d):
        return chain(c, jnp.cumsum(d + c, axis=0))

    timed("  [emax,9] cumsum only", cumsum_only, d_enum0)

    # ---- prepare (projection/SH, unsorted — the production tiled path) VJP ----
    def prep_loss(s):
        d = prepare_splats(s, cam, config, sort=False)
        return (d["mean2d"].sum() + d["conic"].sum() + d["rgb"].sum()
                + d["alpha"].sum())

    timed(
        "prepare fwd+vjp",
        lambda c, s: chain(
            c,
            jax.grad(prep_loss)(
                type(s)(means=s.means + c, sh=s.sh, opacities=s.opacities,
                        log_scales=s.log_scales, quats=s.quats)
            ).means,
        ),
        scene,
    )


if __name__ == "__main__":
    main()
