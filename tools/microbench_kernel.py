"""Composite-kernel internals microbench: where do the kernel ms go?

Times pallas_call variants that ablate one piece of the forward kernel at a
time on a REAL instance buffer (built by the production binning at the bench
scene), using the K-chained-steps-in-one-program methodology from bench.py.

Variants:
  full        the production forward kernel
  noscan      exclusive cumprod replaced by ones (removes the [B,B]x[B,P]
              triangular matmul AND its log/exp)
  noexp       weights = clipped qh (removes the exp, keeps everything else)
  scan_bf16   triangular scan matmul with bf16 operands (f32 accumulate)
  nowork      block body does only the output init/copy (pipeline overhead)

Usage: python tools/microbench_kernel.py --splats 1000000 --iters 5
"""

import argparse
import functools
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--splats", type=int, default=1_000_000)
    parser.add_argument("--width", type=int, default=1920)
    parser.add_argument("--height", type=int, default=1080)
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--instance-mult", type=int, default=2)
    parser.add_argument("--tile-size", type=int, default=32)
    parser.add_argument("--tile-block", type=int, default=128)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

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
        tile_size=args.tile_size, tile_block=args.tile_block,
        max_instance_mult=args.instance_mult,
    )
    grid = TileGrid.create(
        width=args.width, height=args.height, num_splats=args.splats,
        tile_size=args.tile_size, block=args.tile_block,
        max_instance_mult=args.instance_mult,
    )

    @jax.jit
    def build(s):
        d = prepare_splats(s, cam, config)
        bins = bin_splats(d["mean2d"], d["extent"], grid)
        feats = pack_features(d["mean2d"], d["conic"], d["rgb"], d["alpha"])
        inst = jnp.take(feats, bins["inst_splat"], axis=0)
        return inst, bins["block_tile"], bins["block_first"], bins["block_live"]

    inst, bt, bf, bl = jax.block_until_ready(build(scene))
    print(f"# inst buffer {inst.shape}, {grid.num_blocks} blocks", flush=True)

    B, P = grid.block, grid.tile_pixels

    def make_kernel(variant):
        def kernel(bt_ref, bf_ref, bl_ref, inst_ref, out_ref):
            j = pl.program_id(0)
            t = bt_ref[j]
            first = bf_ref[j] == 1
            live = bl_ref[j] == 1

            @pl.when(first)
            def _():
                out_ref[0] = jnp.concatenate(
                    [jnp.zeros((4, P), jnp.float32), jnp.ones((1, P), jnp.float32),
                     jnp.zeros((3, P), jnp.float32)], axis=0)

            def body():
                feats = inst_ref[:, :]
                px, py = C._pixel_coords(t, grid)
                dx = px - feats[:, 0:1]
                dy = py - feats[:, 1:2]
                qh = (feats[:, 2:3] * dx * dx + feats[:, 3:4] * dx * dy
                      + feats[:, 4:5] * dy * dy + feats[:, 5:6])
                if variant == "noexp":
                    w = jnp.minimum(qh * 0.01, 0.99)
                    w = jnp.where(qh > math.log(1 / 256), w, 0.0)
                else:
                    w = jnp.exp(qh)
                    w = jnp.where(qh > math.log(1 / 256), w, 0.0)
                one_minus = 1.0 - w
                if variant == "noscan":
                    excl = jnp.ones((B, P), jnp.float32)
                elif variant == "scan_bf16":
                    logs = jnp.log(jnp.maximum(one_minus, 1e-37)).astype(jnp.bfloat16)
                    excl = jnp.exp(jnp.dot(C._tri(B, True).astype(jnp.bfloat16), logs,
                                           preferred_element_type=jnp.float32))
                else:
                    excl = C._excl_cumprod_rows(one_minus)
                t_before = out_ref[0, 4:5, :] * excl
                eff = t_before * w
                block_prod = excl[B - 1:B, :] * one_minus[B - 1:B, :]
                t_new = out_ref[0, 4:5, :] * block_prod
                cmat = jnp.transpose(feats[:, 6:9])
                contrib = jnp.dot(cmat, eff, preferred_element_type=jnp.float32)
                out_ref[0, 0:3, :] = out_ref[0, 0:3, :] + contrib
                out_ref[0, 3:4, :] = 1.0 - t_new
                out_ref[0, 4:5, :] = t_new

            if variant == "nowork":
                pass
            else:
                pl.when(live)(body)

        return kernel

    def run_variant(variant):
        kernel = make_kernel(variant)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(grid.num_blocks,),
            in_specs=[pl.BlockSpec((B, C.NUM_FEATS), lambda j, a, b, c: (j, 0))],
            out_specs=pl.BlockSpec((1, C.OUT_ROWS, P), lambda j, a, b, c: (a[j], 0, 0)),
        )
        call = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((grid.num_tiles, C.OUT_ROWS, P), jnp.float32),
        )

        def k_steps(inst, k):
            def body_fn(i, carry):
                out = call(bt, bf, bl, inst + carry * 1e-30)
                return out[0, 0, 0] * 1e-30

            return lax.fori_loop(0, k, body_fn, jnp.float32(0.0))

        runner = jax.jit(k_steps)
        t0 = time.time()
        float(runner(inst, jnp.int32(1)))
        compile_s = time.time() - t0
        t_single = min(_timeit(lambda: float(runner(inst, jnp.int32(1)))) for _ in range(2))
        t_k = min(_timeit(lambda: float(runner(inst, jnp.int32(args.iters)))) for _ in range(2))
        dt = (t_k - t_single) / (args.iters - 1)
        print(f"{variant:10s} {dt * 1e3:8.2f} ms   (compile {compile_s:.1f}s)", flush=True)
        return dt

    for v in ("full", "noscan", "noexp", "scan_bf16", "nowork"):
        run_variant(v)

    # ---- sub-blocked variant: one grid step processes SUB consecutive
    # B-sub-blocks (alignment would need to grow to SUB*B; here we just time
    # the kernel shape on the existing buffer — blocks may straddle tiles, so
    # output values are wrong, but the work/step structure is identical).
    for SUB in (2, 4):
        BO = SUB * B

        def kernel(bt_ref, bf_ref, bl_ref, inst_ref, out_ref):
            j = pl.program_id(0)
            t = bt_ref[j * SUB]
            first = bf_ref[j * SUB] == 1

            @pl.when(first)
            def _():
                out_ref[0] = jnp.concatenate(
                    [jnp.zeros((4, P), jnp.float32), jnp.ones((1, P), jnp.float32),
                     jnp.zeros((3, P), jnp.float32)], axis=0)

            def body():
                px, py = C._pixel_coords(t, grid)
                for u in range(SUB):
                    feats = inst_ref[u * B:(u + 1) * B, :]
                    dx = px - feats[:, 0:1]
                    dy = py - feats[:, 1:2]
                    qh = (feats[:, 2:3] * dx * dx + feats[:, 3:4] * dx * dy
                          + feats[:, 4:5] * dy * dy + feats[:, 5:6])
                    w = jnp.exp(qh)
                    w = jnp.where(qh > math.log(1 / 256), w, 0.0)
                    one_minus = 1.0 - w
                    excl = C._excl_cumprod_rows(one_minus)
                    t_before = out_ref[0, 4:5, :] * excl
                    eff = t_before * w
                    block_prod = excl[B - 1:B, :] * one_minus[B - 1:B, :]
                    t_new = out_ref[0, 4:5, :] * block_prod
                    cmat = jnp.transpose(feats[:, 6:9])
                    contrib = jnp.dot(cmat, eff, preferred_element_type=jnp.float32)
                    out_ref[0, 0:3, :] = out_ref[0, 0:3, :] + contrib
                    out_ref[0, 3:4, :] = 1.0 - t_new
                    out_ref[0, 4:5, :] = t_new

            pl.when(bl_ref[j * SUB] == 1)(body)

        nb2 = grid.num_blocks // SUB
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nb2,),
            in_specs=[pl.BlockSpec((BO, C.NUM_FEATS), lambda j, a, b, c: (j, 0))],
            out_specs=pl.BlockSpec((1, C.OUT_ROWS, P),
                                   lambda j, a, b, c, SUB=SUB: (a[j * SUB], 0, 0)),
        )
        call = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((grid.num_tiles, C.OUT_ROWS, P), jnp.float32),
        )
        inst2 = inst[: nb2 * BO]

        def k_steps(i, k):
            def body_fn(_, carry):
                out = call(bt, bf, bl, i + carry * 1e-30)
                return out[0, 0, 0] * 1e-30

            return lax.fori_loop(0, k, body_fn, jnp.float32(0.0))

        runner = jax.jit(k_steps)
        t0 = time.time()
        float(runner(inst2, jnp.int32(1)))
        compile_s = time.time() - t0
        t_single = min(_timeit(lambda: float(runner(inst2, jnp.int32(1)))) for _ in range(2))
        t_k = min(_timeit(lambda: float(runner(inst2, jnp.int32(args.iters)))) for _ in range(2))
        dt = (t_k - t_single) / (args.iters - 1)
        print(f"sub{SUB:d}       {dt * 1e3:8.2f} ms   (compile {compile_s:.1f}s)", flush=True)


def _timeit(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
