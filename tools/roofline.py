"""Roofline model for the production fwd+bwd step (BASELINE north-star metric).

Computes, from the binning geometry of a scene/view (instance count, tile
count, block count), the speed-of-light time of every pipeline phase on a
TPU v5e against the resource that actually binds it:

- HBM bandwidth (819 GB/s): gathers, sort passes, kernel operand streaming
- VPU throughput (~3.9e12 f32 lane-ops/s = 8x128 lanes x 4 ALU slots x
  0.94 GHz): the per-(splat,pixel)-pair transmittance math in the composite
  kernels — the dominant cost, NOT HBM, once instance lists are tight
- MXU (~197 TF/s bf16): the triangular-scan and moment matmuls (minor)

The point (VERDICT round-1, item 7): make "how far from the light" a number.
Phase floors are algorithmic minima (one pass over the data each touch);
lax.sort's real cost is multi-pass, so its floor uses the measured v5e
streaming rate (~0.6 ns/row/operand at 2M rows, tools/microbench_bin2.py)
rather than pretending a single pass.

Usage: python tools/roofline.py [--splats N] [--measured-ms 161]
(Pure CPU arithmetic + one CPU jax pass to get the binning geometry.)
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_GBS = 819e9  # v5e HBM bandwidth
VPU_OPS = 3.85e12  # f32 lane-ops/s
MXU_BF16 = 197e12  # FLOP/s (default matmul precision = one bf16 pass)
GRID_STEP_US_FWD = 0.41  # measured Pallas per-grid-step overhead (PERF.md)
GRID_STEP_US_BWD = 0.67

# measured v5e lax.sort cost per row per operand vs ROW COUNT (4-operand
# 3-key sorts, tools/probe_scale5m.py round 3): the multi-pass structure
# deepens with rows, so a flat rate mismodels 5M-scale sorts by ~60%
_SORT_CURVE = [(1.33e6, 0.589e-9), (2.66e6, 0.671e-9),
               (5.32e6, 0.795e-9), (10.64e6, 0.977e-9)]


def sort_ns_row_op(rows: float) -> float:
    import math

    pts = _SORT_CURVE
    if rows <= pts[0][0]:
        return pts[0][1]
    if rows >= pts[-1][0]:
        return pts[-1][1]
    for (r0, c0), (r1, c1) in zip(pts, pts[1:]):
        if r0 <= rows <= r1:
            t = (math.log(rows) - math.log(r0)) / (math.log(r1) - math.log(r0))
            return c0 + t * (c1 - c0)
    return pts[-1][1]


def gather_ns_idx(table_rows: float) -> float:
    """Measured 32 B-row gather cost per index vs table size
    (tools/probe_scale5m.py: flat ~4.7 ns to 2.66M rows, 7.0 at 5.32M;
    small tables ~3.4 ns, tools/microbench_gather.py).

    CAVEAT (r5): these rates are for ~32 B rows and tables under the
    ~66-93 MB in-context residency cliff. Wider/bigger tables gather at
    ~19-32 ns/idx (PERF.md r5 "segment-gather residency cliff"); the
    production tail now splits its prefix table 8+2 above 80 MB, which is
    what lets the garden step (127.3 ms) run BELOW this model's r4
    "floor" (138.5) — the old floor priced that gather at fast rates the
    unsplit pipeline did not get."""
    if table_rows <= 1.4e6:
        return 3.4e-9
    if table_rows <= 2.7e6:
        return 4.7e-9
    return 7.0e-9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--splats", type=int, default=1_500_000)
    ap.add_argument("--scene", default="garden")
    ap.add_argument("--measured-ms", type=float, default=None,
                    help="measured step ms to compare against (bench.py)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bench import make_bench_scene
    from splatapult_tpu.io.synth import garden_cameras
    from splatapult_tpu.ops.binning import TileGrid, instance_demand
    from splatapult_tpu.render import Camera, RenderConfig, prepare_splats
    from splatapult_tpu.core import transforms as T
    import numpy as np

    n, w, h, ts, b = args.splats, 1920, 1080, 32, 128
    scene = make_bench_scene(args.scene, n)
    if args.scene == "garden":
        cam = garden_cameras(1, width=w, height_px=h)
    else:
        cam = Camera.from_fov(
            T.look_at(eye=[0.0, 0.8, 4.5], target=[0, 0, 0], up=[0, 1, 0]),
            fovy=np.pi / 4, width=w, height=h)
    cfg = RenderConfig(width=w, height=h, pipeline="tiled")
    grid = TileGrid.create(width=w, height=h, num_splats=n, tile_size=ts, block=b)
    d = jax.jit(lambda s, c: prepare_splats(s, c, cfg, sort=False))(scene, cam)
    demand = int(jax.jit(
        lambda m, e: instance_demand(m, e, grid))(d["mean2d"], d["extent"]))

    emax = int(demand * 1.06 // 4096 + 1) * 4096  # auto-calibrated capacity
    tiles = grid.num_tiles
    mcap = emax + tiles * b  # worst-case alignment; true pad is < b/tile
    nblocks = mcap // b
    p = ts * ts
    pairs = nblocks * b * p

    def ms(x):
        return x * 1e3

    print(f"scene={args.scene} n={n} demand={demand} emax={emax} mcap={mcap} "
          f"blocks={nblocks} pairs={pairs/1e9:.2f}G")
    rows = []

    # --- binning: expand kernel (emax slots; its measured cost resists
    # every structural rewrite tried — onehotb/onehot2/CTAB/C sweeps,
    # PERF.md round 3 — so it is modeled at its measured ~4.5 ns/slot) +
    # bincount sort (emax x 1) + main sort (mcap x 2 ops with the packed
    # depth16 key; 3 ops exact). Round 4 removed the m_pos payload (the
    # backward re-keys on inst_splat) and skips the N x 5 compaction sort
    # for views whose expand windows fit unsorted (the usual case —
    # scattered edge culling; dense culling pays it again).
    main_ops = 2  # production depth_bits=16 (exact f32 depth: 3)
    t_sort = (emax * sort_ns_row_op(emax)
              + mcap * main_ops * sort_ns_row_op(mcap))
    t_expand = emax * 4.5e-9  # measured (microbench_expand minus sorts)
    rows.append(("binning (sorts+expand)", t_sort + t_expand))

    # --- feature gather: mcap random 32 B rows (measured per-index cost; the
    # HBM-bytes floor would be mcap*64 B / BW = far smaller — random access
    # is latency-bound, not bandwidth-bound, on v5e)
    rows.append(("instance gather", mcap * gather_ns_idx(n)))

    # --- fwd kernel: VPU pair math (~25 lane-ops: dx,dy,q=5 mul/add, exp~8,
    # cutoff select, eff/carry ~6) + tri-scan matmul (B flops/pair, bf16)
    fwd_vpu = pairs * 25 / VPU_OPS
    fwd_mxu = pairs * b / MXU_BF16
    fwd_oh = nblocks * GRID_STEP_US_FWD * 1e-6
    rows.append(("fwd kernel (VPU+MXU+loop)", fwd_vpu + fwd_mxu + fwd_oh))

    # --- bwd kernel: ~60 lane-ops/pair (re-walk w: ~14 incl exp; log+exp of
    # the scan ~14; reciprocal ~5; dw/dqh/cdot/eff ~15; moment recombine,
    # carries ~12) + two tri-scans + moment matmul
    bwd_vpu = pairs * 60 / VPU_OPS
    bwd_mxu = pairs * (2 * b + 8) / MXU_BF16
    bwd_oh = nblocks * GRID_STEP_US_BWD * 1e-6
    rows.append(("bwd kernel (VPU+MXU+loop)", bwd_vpu + bwd_mxu + bwd_oh))

    # --- backward tail: inst_splat sort (mcap x 6 ops bf16-packed) + blocked
    # cumsum (emax x 9 cols, ~3 passes) + segment-end gather (N x 36 B rows)
    t_tail = (mcap * 6 * sort_ns_row_op(mcap)
              + emax * 9 * 4 * 3 * 2 / HBM_GBS
              + n * max(6.4e-9, gather_ns_idx(emax)))
    rows.append(("backward tail", t_tail))

    total = sum(t for _, t in rows)
    print()
    for name, t in rows:
        print(f"  {name:28s} {ms(t):7.2f} ms")
    print(f"  {'TOTAL model floor':28s} {ms(total):7.2f} ms  "
          f"(sort phases at MEASURED lax.sort rates)")

    # --- second model (VERDICT r3 weak-1): the sort phases re-floored at
    # bytes-moved x radix passes instead of lax.sort's own measured rates —
    # the honest algorithmic floor: an LSD radix sort streams each row
    # (key + payload, read + write) once per digit pass, the way the
    # reference's GPU sort does 4 x 8-bit passes (shader/multi_radixsort.
    # glsl, radix_sort.hpp:122-124); histograms/scan are negligible. A
    # measured-rate floor can only converge to 100% by definition; the gap
    # between these two models IS lax.sort's multi-pass comparison tax.
    import math

    def radix_sort_s(rows_, op_bytes, key_bits):
        passes = math.ceil(key_bits / 8)
        return passes * rows_ * op_bytes * 2 / HBM_GBS

    key_bits_main = (tiles - 1).bit_length() + 16  # packed depth16 key
    t_sort_radix = (
        radix_sort_s(emax, 8, (tiles - 1).bit_length())  # bincount by digit
        + radix_sort_s(mcap, main_ops * 4 + 4, key_bits_main))  # main
    t_tail_radix = (radix_sort_s(mcap, 6 * 4, max(n - 1, 1).bit_length())
                    + emax * 9 * 4 * 3 * 2 / HBM_GBS
                    + n * max(6.4e-9, gather_ns_idx(emax)))
    radix_rows = [
        ("binning (radix-floor)", t_sort_radix + t_expand),
        ("instance gather", rows[1][1]),
        ("fwd kernel", rows[2][1]),
        ("bwd kernel", rows[3][1]),
        ("backward tail (radix-floor)", t_tail_radix),
    ]
    total_radix = sum(t for _, t in radix_rows)
    print(f"  {'TOTAL radix-bytes floor':28s} {ms(total_radix):7.2f} ms  "
          f"(sort phases at bytes x radix passes; kernels/gather unchanged)")

    hbm_bytes = (mcap * (32 + 36) + emax * 9 * 4 * 6 + tiles * p * 4 * 8 * 4
                 + n * 61 * 4)
    print(f"\n  pure-HBM single-pass bytes ~{hbm_bytes/1e9:.2f} GB "
          f"-> {ms(hbm_bytes / HBM_GBS):.2f} ms at 819 GB/s "
          f"(NOT the binding resource: the step is VPU- and sort-pass-bound)")
    if args.measured_ms:
        print(f"  measured step: {args.measured_ms:.1f} ms -> "
              f"{100 * total * 1e3 / args.measured_ms:.0f}% of the measured-"
              f"rate model, {100 * total_radix * 1e3 / args.measured_ms:.0f}% "
              f"of the radix-bytes floor (the honest pair: the first asks "
              f"'any implementation slack left?', the second 'how much is "
              f"lax.sort's algorithm itself leaving on the table?')")


if __name__ == "__main__":
    main()
