"""Backward-composite-kernel ablations: where do the bwd-kernel ms go?

Variants ablate one piece of ops/composite._bwd_kernel at a time on real
bench-scene buffers; DCE-proof chaining (full d_inst sum).

Usage: python tools/microbench_bwdk.py
"""

import argparse
import functools
import math
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
    parser.add_argument("--width", type=int, default=1920)
    parser.add_argument("--height", type=int, default=1080)
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--instance-mult", type=int, default=2)
    parser.add_argument("--early-stop", type=float, default=1e-4)
    parser.add_argument("--variants", type=str,
                        default="full,nowork,noscan,noscan2,nomom")
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
        max_instance_mult=args.instance_mult, early_stop_eps=args.early_stop,
    )
    grid = TileGrid.create(
        width=args.width, height=args.height, num_splats=args.splats,
        tile_size=config.tile_size, block=config.tile_block,
        max_instance_mult=args.instance_mult, early_stop_eps=args.early_stop,
    )

    @jax.jit
    def build(s):
        d = prepare_splats(s, cam, config)
        bins = bin_splats(d["mean2d"], d["extent"], grid)
        feats = pack_features(d["mean2d"], d["conic"], d["rgb"], d["alpha"])
        inst = jnp.take(feats, bins["inst_splat"], axis=0)
        out = C._fwd_call(inst, bins["block_meta"], grid)
        return inst, bins["block_tile"], bins["block_first"], bins["block_live"], out

    inst, bt, bf, bl, out = jax.block_until_ready(build(scene))
    dout = jnp.ones_like(out) * 1e-3
    B, P = grid.block, grid.tile_pixels
    print(f"# inst {inst.shape}, {grid.num_blocks} blocks", flush=True)

    def make_kernel(variant):
        def kernel(bt_ref, bf_ref, bl_ref, inst_ref, basis_ref, res_ref,
                   dout_ref, dinst_ref, carry):
            j = pl.program_id(0)
            t = bt_ref[j]
            first = bf_ref[j] == 1
            live = bl_ref[j] == 1
            b = B

            @pl.when(first)
            def _():
                carry[0:1, :] = jnp.ones_like(carry[0:1, :])
                carry[1:4, :] = jnp.zeros_like(carry[1:4, :])

            def body():
                feats = inst_ref[:, :]
                px, py = C._pixel_coords(t, grid)
                w = C._block_weights(feats, px, py, grid)
                one_minus = 1.0 - w
                if variant == "noscan":
                    excl = jnp.ones((b, P), jnp.float32)
                elif variant == "tri_bf16":
                    logs = jnp.log(jnp.maximum(one_minus, 1e-37)).astype(jnp.bfloat16)
                    excl = jnp.exp(jnp.dot(
                        C._tri(b, True).astype(jnp.bfloat16), logs,
                        preferred_element_type=jnp.float32))
                else:
                    excl = C._excl_cumprod_rows(one_minus)
                t_run = carry[0:1, :]
                t_before = t_run * excl
                eff = t_before * w
                block_prod = excl[b - 1:b, :] * one_minus[b - 1:b, :]

                t_fin = res_ref[0, 4:5, :]
                d_alpha_out = dout_ref[0, 3:4, :]
                d_tfin_out = dout_ref[0, 4:5, :]
                d_rgb_out = dout_ref[0, 0:3, :]
                inv_om = 1.0 / jnp.maximum(one_minus, 1e-9)

                colors = feats[:, C.F_R : C.F_R + 3]
                if variant in ("vpu_cdot", "vpu_all"):
                    cdot = (colors[:, 0:1] * d_rgb_out[0:1, :]
                            + colors[:, 1:2] * d_rgb_out[1:2, :]
                            + colors[:, 2:3] * d_rgb_out[2:3, :])
                else:
                    cdot = jnp.dot(colors, d_rgb_out, preferred_element_type=jnp.float32)
                row = (d_alpha_out - d_tfin_out) * t_fin - jnp.sum(
                    d_rgb_out * (res_ref[0, 0:3, :] - carry[1:4, :]), axis=0,
                    keepdims=True)
                if variant == "noscan2":
                    incl_dot = eff * cdot
                else:
                    incl_dot = C._scan_rows_add(eff * cdot)
                dw = (incl_dot + row) * inv_om + t_before * cdot
                dqh = w * dw

                if variant == "nomom":
                    d_mx = d_my = d_qa = d_qb = d_qc = d_lna = jnp.sum(
                        dqh, axis=1, keepdims=True)
                else:
                    mom = jnp.dot(dqh, basis_ref[:, :],
                                  preferred_element_type=jnp.float32)
                    m_uu, m_uv, m_vv = mom[:, 0:1], mom[:, 1:2], mom[:, 2:3]
                    m_u, m_v, m_1 = mom[:, 3:4], mom[:, 4:5], mom[:, 5:6]
                    tcx, tcy = C._tile_centers(t, grid)
                    mxu = feats[:, C.F_MX : C.F_MX + 1] - tcx
                    myu = feats[:, C.F_MY : C.F_MY + 1] - tcy
                    d_qa = m_uu - 2.0 * mxu * m_u + mxu * mxu * m_1
                    d_qb = m_uv - mxu * m_v - myu * m_u + mxu * myu * m_1
                    d_qc = m_vv - 2.0 * myu * m_v + myu * myu * m_1
                    d_lna = m_1
                    qa = feats[:, C.F_QA : C.F_QA + 1]
                    qb = feats[:, C.F_QB : C.F_QB + 1]
                    qc = feats[:, C.F_QC : C.F_QC + 1]
                    gx = m_u - mxu * m_1
                    gy = m_v - myu * m_1
                    d_mx = -(2.0 * qa * gx + qb * gy)
                    d_my = -(qb * gx + 2.0 * qc * gy)

                dcols = jnp.dot(eff, jnp.transpose(d_rgb_out),
                                preferred_element_type=jnp.float32)

                dinst_ref[:, :] = jnp.concatenate(
                    [d_mx, d_my, d_qa, d_qb, d_qc, d_lna, dcols,
                     jnp.zeros((b, C.NUM_FEATS - 9), jnp.float32)], axis=1)

                carry[0:1, :] = t_run * block_prod
                if variant in ("vpu_carry", "vpu_all"):
                    for ch in range(3):
                        carry[1 + ch : 2 + ch, :] = carry[1 + ch : 2 + ch, :] + jnp.sum(
                            colors[:, ch : ch + 1] * eff, axis=0, keepdims=True)
                else:
                    carry[1:4, :] = carry[1:4, :] + jnp.dot(
                        jnp.transpose(colors), eff, preferred_element_type=jnp.float32)

            if variant == "nowork":
                dinst_ref[:, :] = jnp.zeros((b, C.NUM_FEATS), jnp.float32)
                return
            run = live & (first | (jnp.max(carry[0:1, :]) >= grid.early_stop_eps))
            pl.when(run)(body)

            @pl.when(jnp.logical_not(run))
            def _():
                dinst_ref[:, :] = jnp.zeros((b, C.NUM_FEATS), jnp.float32)

        return kernel

    basis = jnp.asarray(C.moment_basis(grid))

    def run_variant(variant):
        kernel = make_kernel(variant)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(grid.num_blocks,),
            in_specs=[
                pl.BlockSpec((B, C.NUM_FEATS), lambda j, a, b, c: (j, 0)),
                pl.BlockSpec((P, C.NUM_MOMS), lambda j, a, b, c: (0, 0)),
                pl.BlockSpec((1, C.OUT_ROWS, P), lambda j, a, b, c: (a[j], 0, 0)),
                pl.BlockSpec((1, C.OUT_ROWS, P), lambda j, a, b, c: (a[j], 0, 0)),
            ],
            out_specs=pl.BlockSpec((B, C.NUM_FEATS), lambda j, a, b, c: (j, 0)),
            scratch_shapes=[pltpu.VMEM((4, P), jnp.float32)],
        )
        call = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((grid.mcap, C.NUM_FEATS), jnp.float32),
        )

        def k_steps(inst, k):
            def body_fn(i, carry):
                d = call(bt, bf, bl, inst + carry * 1e-30, basis, out, dout)
                return jnp.sum(d) * 1e-30

            return lax.fori_loop(0, k, body_fn, jnp.float32(0.0))

        runner = jax.jit(k_steps)
        t0 = time.time()
        float(runner(inst, jnp.int32(1)))
        compile_s = time.time() - t0
        t_single = min(_timeit(lambda: float(runner(inst, jnp.int32(1)))) for _ in range(2))
        t_k = min(_timeit(lambda: float(runner(inst, jnp.int32(args.iters)))) for _ in range(2))
        dt = (t_k - t_single) / (args.iters - 1)
        print(f"{variant:10s} {dt * 1e3:8.2f} ms   (compile {compile_s:.1f}s)", flush=True)

    for v in args.variants.split(","):
        run_variant(v.strip())


if __name__ == "__main__":
    main()
