"""Analytic per-phase scaling model for the tile-sharded train step (config 5).

VERDICT r4 item 1(c): commit a per-chip ms-vs-D model BEFORE the first real
pod-slice run, so that run has a prediction to test. The model combines:

- the TRUE per-band instance demand of the bench view (computed here with
  parallel.mesh.band_instance_demands on the CPU backend — the same
  rect-clipping each chip's binning applies), run through the same
  capacity calibration the sharded pipeline uses (peak band + headroom +
  4096 rounding + pow2-cliff clamp), so per-chip emax/mcap are exactly what
  calibrate_config_sharded would allocate;
- the measured v5e phase rates from tools/roofline.py / PERF.md (lax.sort
  row-count curve, gather ns/idx, VPU lane-ops/pair, Pallas grid-step
  overhead);
- collective costs on assumed v5e ICI bandwidth (ASSUMPTION, stated in the
  output: 2D-torus v5e, ~90 GB/s effective per chip; real-slice numbers
  must replace this): the gradient all-reduce (ring, 2(D-1)/D x bytes) and
  the sharded-prepare feature all-gather ((D-1)/D x 56 B/splat).

Per-phase scaling structure (why >=85% is reachable at all):
- kernels + gather + expand scale ~1/D with band demand (peak-band
  imbalance beta = D * peak_band / total makes this beta/D);
- SORTS scale BETTER than 1/D: lax.sort's ns/row falls with row count
  (the multi-pass structure shallows), so banded sorts are superlinear;
- prepare is ~flat if replicated, ~1/D + all-gather if sharded;
- the grad all-reduce GROWS with D (2(D-1)/D) and is the term that must
  hide behind the backward (the in-backward psum placement exists for
  exactly this; AOT schedule evidence in PERF.md r3). Efficiency is
  reported with it fully hidden and fully exposed — the truth on a real
  slice lies between.

Usage: python tools/scaling_model.py [--splats N] [--scene garden]
       [--chips 1 2 4 8] [--no-shard-prepare]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.roofline import (  # noqa: E402
    GRID_STEP_US_BWD, GRID_STEP_US_FWD, HBM_GBS, MXU_BF16, VPU_OPS,
    gather_ns_idx, sort_ns_row_op,
)

ICI_GBS = 90e9  # ASSUMED effective per-chip ICI bandwidth (v5e 2D torus);
# replace with measured numbers on the first real slice.
GRAD_FLOATS = 59  # means 3 + quats 4 + log_scales 3 + opacities 1 + sh 48
PREP_FLOATS = 14  # prepare_splats output columns (mean2d..mask)


def phase_model(n, emax, mcap, tiles, block, tile_px, main_ops=1):
    """Per-chip phase seconds for one fwd+bwd view at this binning geometry.

    main_ops: extra sort operands beyond the packed key (production depth20
    packs tile+depth into ONE key + the -s payload -> 2 columns total; the
    model counts the payload column as 1 extra op)."""
    nblocks = mcap // block
    pairs = nblocks * block * tile_px
    t = {}
    t["binning"] = (emax * sort_ns_row_op(emax)  # bincount-by-sort
                    + mcap * (1 + main_ops) * sort_ns_row_op(mcap)  # main
                    + emax * 4.5e-9)  # expand kernel (measured, structural)
    t["gather"] = mcap * gather_ns_idx(n)
    t["fwd kernel"] = (pairs * 25 / VPU_OPS + pairs * block / MXU_BF16
                       + nblocks * GRID_STEP_US_FWD * 1e-6)
    t["bwd kernel"] = (pairs * 60 / VPU_OPS + pairs * (2 * block + 8) / MXU_BF16
                       + nblocks * GRID_STEP_US_BWD * 1e-6)
    t["bwd tail"] = (mcap * 6 * sort_ns_row_op(mcap)
                     + emax * 9 * 4 * 3 * 2 / HBM_GBS
                     + n * max(6.4e-9, gather_ns_idx(emax)))
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--splats", type=int, default=1_500_000)
    ap.add_argument("--scene", default="garden")
    ap.add_argument("--chips", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--band-layout", default="interleaved",
                    choices=("interleaved", "contiguous"),
                    help="tile-row ownership layout; interleaved (default) "
                         "balances per-chip demand, contiguous is the "
                         "round-4 layout kept for comparison")
    ap.add_argument("--no-shard-prepare", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from bench import make_bench_scene
    from splatapult_tpu.core import transforms as T
    from splatapult_tpu.io.synth import garden_cameras
    from splatapult_tpu.ops.binning import TileGrid
    from splatapult_tpu.parallel.mesh import _shard_config, band_instance_demands
    from splatapult_tpu.render import Camera, RenderConfig, capacity_mult_for_demand

    n, w, h, ts, b = args.splats, 1920, 1080, 32, 128
    scene = make_bench_scene(args.scene, n)
    if args.scene == "garden":
        cam = garden_cameras(1, width=w, height_px=h)
    else:
        cam = Camera.from_fov(
            T.look_at(eye=[0.0, 0.8, 4.5], target=[0, 0, 0], up=[0, 1, 0]),
            fovy=np.pi / 4, width=w, height=h)
    cfg = RenderConfig(width=w, height=h, pipeline="tiled", tile_size=ts,
                       tile_block=b)
    shard_prepare = not args.no_shard_prepare

    # measured prepare forward at garden scale (PERF.md phase table: ~0.2 ms
    # at 1.5M; backward through prepare ~2x) — scaled linearly in N
    t_prep_1 = 0.6e-3 * n / 1.5e6

    print(f"scene={args.scene} n={n} 1080p tile{ts} block{b} "
          f"layout={args.band_layout} shard_prepare={shard_prepare} "
          f"ICI={ICI_GBS/1e9:.0f} GB/s (ASSUMED)")
    results = {}
    for d in args.chips:
        bands = np.asarray(jax.jit(
            band_instance_demands,
            static_argnames=("config", "num_shards", "band_layout")
        )(scene, cam, cfg, d, args.band_layout))
        peak = int(bands.max())
        total = int(bands.sum())
        beta = peak * d / max(total, 1)
        cfg_band = _shard_config(cfg, d)
        mult = capacity_mult_for_demand(peak, n, cfg_band, bucket=1.0)
        grid = TileGrid.create(width=w, height=cfg_band.height, num_splats=n,
                               tile_size=ts, block=b, max_instance_mult=mult)
        t = phase_model(n, grid.emax, grid.mcap, grid.num_tiles, b, ts * ts)
        if shard_prepare:
            t["prepare"] = t_prep_1 / d
            if d > 1:
                # forward feature all-gather AND its backward transpose (the
                # psum-scatter of the ~14 feature-column cotangents) — both
                # present in the replicated AND zero paths (HLO-verified,
                # tests/test_parallel.py::test_zero_fit_no_full_size_grad_allreduce)
                t["prep all-gather"] = n * PREP_FLOATS * 4 * (d - 1) / d / ICI_GBS
                t["feat grad-scatter"] = n * PREP_FLOATS * 4 * (d - 1) / d / ICI_GBS
        else:
            t["prepare"] = t_prep_1  # replicated: flat in D
        # grad all-reduce (ring): grows with D; overlappable vs bwd compute.
        # The ZeRO path (make_zero_fit_steps) ELIMINATES it on the tiles
        # axis: parameters + optimizer state live sharded, grads complete
        # through the feature all_gather's transpose (already counted above),
        # and the optimizer update runs on N/D rows.
        t_ar = n * GRAD_FLOATS * 4 * 2 * (d - 1) / d / ICI_GBS
        compute = sum(t.values())
        hidden_ar = max(0.0, t_ar - t["bwd kernel"] - t["bwd tail"])
        results[d] = (compute, t_ar, hidden_ar, t, peak, beta, grid)
        phase_str = "  ".join(f"{k}={v*1e3:.1f}" for k, v in t.items())
        print(f"\nD={d}: peak_band={peak} beta={beta:.3f} emax={grid.emax} "
              f"mcap={grid.mcap} mult={mult:.3f}")
        print(f"  {phase_str}  [ms]")
        print(f"  compute={compute*1e3:.1f} ms  repl-grad-AR={t_ar*1e3:.1f} ms "
              f"(exposed-if-unhidden={hidden_ar*1e3:.1f}; zero path: 0)")

    t1 = results[args.chips[0]][0] + (0 if args.chips[0] == 1 else 0)
    print("\nefficiency vs D=1 (total work fixed at one view):")
    print(f"  {'D':>3} {'repl AR-hidden':>15} {'eff':>6} "
          f"{'repl AR-exposed':>16} {'eff':>6} {'zero (no AR)':>13} {'eff':>6}")
    for d in args.chips:
        compute, t_ar, hidden_ar, *_ = results[d]
        td_hid = compute + hidden_ar
        td_exp = compute + (t_ar if d > 1 else 0.0)
        td_zero = compute
        e_hid = t1 / (d * td_hid)
        e_exp = t1 / (d * td_exp)
        e_zero = t1 / (d * td_zero)
        print(f"  {d:>3} {td_hid*1e3:>13.1f}ms {e_hid:>6.1%} "
              f"{td_exp*1e3:>14.1f}ms {e_exp:>6.1%} "
              f"{td_zero*1e3:>11.1f}ms {e_zero:>6.1%}")
    print("\n(>=85% bar: BASELINE config 5, 'N>=2 hosts'. 'repl' = replicated "
          "scene, grads all-reduced — 'AR hidden' assumes the in-backward "
          "psum fully overlaps the backward (placement + AOT schedule "
          "evidence, PERF.md), 'exposed' is the no-overlap worst case. "
          "'zero' = parameter-sharded make_zero_fit_steps: NO grad "
          "all-reduce exists to hide — its efficiency needs no overlap "
          "assumption (per-chip optimizer/update savings not modeled, so "
          "'zero' is if anything conservative). beta = peak-band/mean-band "
          "imbalance; sorts scale superlinearly because lax.sort ns/row "
          "falls with row count.)")
    print("\nAsymptotics: with the grad all-reduce eliminated (zero path), "
          "the D->inf limit is bounded by ONE per-chip O(N) term: the "
          "backward tail's per-splat segment-end gather (~6.4-7.2 ns x N, "
          "flat in D). Every replacement was probed at band scale and "
          "REFUTED on this toolchain (tools/probe_scatter_set.py, "
          "overhead-corrected; PERF.md r5 'segment-reduce endgame'): "
          "1-col scatter-set has a fast path (5.3 ns/idx) but 2-col is "
          "54 and 9-col 80 ns/idx, so the 9 gradient columns cannot ride "
          "it (9 x 1-col = 1.5x the gather); sort-based expansion and the "
          "all-to-all compacted exchange both pay a ~10-operand row "
          "movement that costs the same as the gather they replace.")


if __name__ == "__main__":
    main()
