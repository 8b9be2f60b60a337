"""Pallas TPU kernels: tile-binned front-to-back alpha compositing, fwd + bwd.

This pair of kernels replaces the reference's entire per-pixel GPU stage — the
geometry-shader quad expansion (shader/splat_geom.glsl:83-106), the fragment
shader's gaussian evaluation (shader/splat_frag.glsl:20-28) and the fixed-
function back-to-front "over" blending (src/app.cpp:153-156) — with an explicit
per-tile transmittance loop, plus a hand-written VJP the reference (a forward-
only viewer) has no analog of.

Dataflow (see ops/binning.py for how the work-list is built):
- The kernels run over a FLAT grid of B-instance blocks, sorted by tile. Each
  block belongs to exactly one tile (lists are B-aligned with null instances),
  so there is no masking anywhere: null instances carry weight 0 and are no-ops.
- The output block index is the block's owning tile; consecutive blocks of one
  tile revisit the same VMEM-resident output block, which doubles as the
  compositing accumulator (rows 0-2 premultiplied RGB, row 3 alpha, row 4
  transmittance T). Pallas's pipelining double-buffers the instance blocks.
- Within a block, the front-to-back products are closed-form: an exclusive
  cumulative product of (1 - w) along the splat axis as a log-space triangular
  MXU matmul.
- The backward kernel re-walks the same blocks front-to-back (transmittance
  replay: only the forward's final per-pixel color/transmittance are saved, no
  per-splat intermediates). All pixel-axis gradient reductions are MXU
  matmuls: the quadratic form q is linear in the six monomials
  [u^2, uv, v^2, u, v, 1] of *tile-local* pixel coordinates, so the six
  spatial gradients come from ONE [B, P] x [P, 8] moment matmul followed by
  [B, 1]-cheap recombination — not six separate VPU reduction chains.
  (Tile-local coordinates keep the monomials O(tile_size), so the moment
  recombination does not lose precision the way a global-coordinate
  polynomial expansion would.)

Feature parameterization: the opacity rides inside the exponent —
  w = exp(qa*dx^2 + qb*dx*dy + qc*dy^2 + ln(alpha))
with qa = -a/2, qb = -b, qc = -c/2 from the conic (a, b, c). This fuses the
alpha multiply into the exp, makes the 1/256 discard (shader/splat_frag.glsl:
38-41) a comparison on the exponent, and gives the ln-alpha gradient for free
as the zeroth moment.

Layouts (B = block, P = tile_size^2 pixels):
  instance features  [Mcap, 16] f32, cols: mean_x, mean_y, qa, qb, qc,
                     ln_alpha, r, g, b, 0...  (null row: ln_alpha = -100)
  per-tile output    [T, 8, P] f32, rows: premult r, g, b, alpha, T, 0, 0, 0
  compute shape      [B, P]: splats on sublanes, pixels on lanes
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from splatapult_tpu.ops.binning import TileGrid

NUM_FEATS = 16
OUT_ROWS = 8
NULL_LN_ALPHA = -100.0  # exp(-100) == 0 in float32
# feature column indices
F_MX, F_MY, F_QA, F_QB, F_QC, F_LNA, F_R, F_G, F_B = range(9)
NUM_MOMS = 8  # [u^2, uv, v^2, u, v, 1] + 2 zero-pad columns
# packed_colors mode: 16-bit fixed-point color quantization (step 2^-12,
# range +-8); rows shrink to 8 cols = 32 B, the fast row-gather shape on v5e
COLOR_SCALE = 4096.0
NUM_FEATS_PACKED = 8
# packed_feats16 mode (the 5M-regime answer): EVERY feature quantized into
# 4 int32 = 16 B rows, so even a 5M-splat table (80 MB) stays inside the
# fast gather regime (tables past ~85-120 MB gather at ~15 ns/idx vs
# 3.5-4.7 below it — size/residency-driven, tools/probe_gather_real.py).
# Layout per row:
#   w0: mean_x | mean_y as unsigned 16-bit fixed point over [-W, 2W) x
#       [-H, 2H) (the CLIP=1.5 guard band bounds live means to
#       [-W/2, 1.5W]); step = 3W/65536 (~0.088 px at 1080p)
#   w1: f16(qa) << 16 | f16(qb)
#   w2: f16(qc) << 16 | f16(ln_alpha)
#   w3: r:11 | g:11 | b:10 unsigned fixed point over [-4, 4)
# Coarser than packed_colors (color step 2^-8/2^-7 vs 2^-12; the reference's
# own --fp16 framebuffer is comparable); gated by image/grad-error tests and
# meant for the table-size regime where the alternative is a 3-4x slower
# gather. Null rows encode exactly (ln_alpha = -100 is f16-representable).
NUM_FEATS_PACKED16 = 4
MEAN16_STEPS = 65536.0
COLOR11_SCALE = 256.0  # 11-bit channels: step 1/256 over [-4, 4)
COLOR10_SCALE = 128.0  # 10-bit channel:  step 1/128 over [-4, 4)


def _num_feats(grid) -> int:
    if getattr(grid, "packed_feats16", False):
        return NUM_FEATS_PACKED16
    return NUM_FEATS_PACKED if grid.packed_colors else NUM_FEATS


def _mean16_scales(grid):
    """(sx, sy): steps per pixel of the 16-bit mean quantization."""
    return (MEAN16_STEPS / (3.0 * grid.width),
            MEAN16_STEPS / (3.0 * grid.height))


def _f16_bits(x):
    """f32 column [*, 1] -> uint32 of its f16 bit pattern."""
    return lax.bitcast_convert_type(
        x.astype(jnp.float16), jnp.uint16).astype(jnp.uint32)


def _bits_f16(h):
    """int32 low-16 f16 bit pattern -> f32 column, decoded with INTEGER ops.

    Mosaic supports neither f16 arithmetic nor uint32->f32 casts in kernels,
    so the decode is manual: re-bias the exponent into f32 bits for normals,
    scale the mantissa for subnormals (large splats legitimately carry
    f16-subnormal conic entries: sigma ~ 100 px -> qa ~ -5e-5)."""
    h = h & 0xFFFF
    sign = (h >> 15) & 1
    exp = (h >> 10) & 0x1F
    man = h & 0x3FF
    f32_bits = (sign << 31) | ((exp + 112) << 23) | (man << 13)
    normal = lax.bitcast_convert_type(f32_bits, jnp.float32)
    sub = (man.astype(jnp.float32)
           * jnp.where(sign == 1, -5.9604645e-08, 5.9604645e-08))  # 2^-24
    # exp == 31 (inf/nan) never occurs: every encoded field is bounded
    return jnp.where(exp > 0, normal, sub)


def _pack_feats16(feats, grid):
    """[*, 16] f32 feature rows -> [*, 4] int32 (see NUM_FEATS_PACKED16)."""
    sx, sy = _mean16_scales(grid)
    qx = jnp.clip(jnp.round((feats[:, F_MX:F_MX + 1] + grid.width) * sx),
                  0.0, 65535.0).astype(jnp.uint32)
    qy = jnp.clip(jnp.round((feats[:, F_MY:F_MY + 1] + grid.height) * sy),
                  0.0, 65535.0).astype(jnp.uint32)
    w0 = (qx << 16) | qy
    w1 = (_f16_bits(feats[:, F_QA:F_QA + 1]) << 16) | _f16_bits(
        feats[:, F_QB:F_QB + 1])
    w2 = (_f16_bits(feats[:, F_QC:F_QC + 1]) << 16) | _f16_bits(
        feats[:, F_LNA:F_LNA + 1])
    qr = jnp.clip(jnp.round((feats[:, F_R:F_R + 1] + 4.0) * COLOR11_SCALE),
                  0.0, 2047.0).astype(jnp.uint32)
    qg = jnp.clip(jnp.round((feats[:, F_G:F_G + 1] + 4.0) * COLOR11_SCALE),
                  0.0, 2047.0).astype(jnp.uint32)
    qb = jnp.clip(jnp.round((feats[:, F_B:F_B + 1] + 4.0) * COLOR10_SCALE),
                  0.0, 1023.0).astype(jnp.uint32)
    w3 = (qr << 21) | (qg << 10) | qb
    return lax.bitcast_convert_type(
        jnp.concatenate([w0, w1, w2, w3], axis=1), jnp.int32)


def _pack_color_feats(feats):
    """[*, 16] f32 feature rows -> [*, 8] INT32: cols 0-5 the bit-cast f32
    geometry + ln-alpha, RGB as three 16-bit fixed-point halves in cols 6-7.

    The array is int32, not f32 with integer payloads: packed color words
    whose bits happen to form a NaN (any q in [-128, -1] sets the f32
    exponent field all-ones) get their payload canonicalized somewhere in
    the XLA TPU pipeline — integer arrays are never touched. (Also the
    fastest measured row-gather shape: i32x8 at 3.34 ns/idx.)"""
    q = jnp.clip(
        jnp.round(feats[:, F_R : F_R + 3] * COLOR_SCALE), -32768.0, 32767.0
    ).astype(jnp.int32)
    cw0 = (q[:, 0:1] << 16) | (q[:, 1:2] & 0xFFFF)
    cw1 = q[:, 2:3] << 16
    geo = lax.bitcast_convert_type(feats[:, :6], jnp.int32)
    return jnp.concatenate([geo, cw0, cw1], axis=1)


def _unpack_feats(raw, grid):
    """Kernel-side feature decode -> (geometry [B, >=6] f32, colors [B, 3] f32).

    raw is the block's feature ref contents: [B, 16] f32 in exact mode,
    [B, 8] int32 in packed_colors mode (see _pack_color_feats), or [B, 4]
    int32 in packed_feats16 mode (see NUM_FEATS_PACKED16)."""
    if getattr(grid, "packed_feats16", False):
        # int32 bit manipulation throughout: Mosaic kernels support neither
        # uint32->f32 casts nor f16 math (arithmetic >> then mask is exact
        # for these unsigned fields)
        u = raw  # already int32
        sx, sy = _mean16_scales(grid)
        qx = (u[:, 0:1] >> 16) & 0xFFFF
        qy = u[:, 0:1] & 0xFFFF
        mx = qx.astype(jnp.float32) * (1.0 / sx) - grid.width
        my = qy.astype(jnp.float32) * (1.0 / sy) - grid.height
        qa = _bits_f16(u[:, 1:2] >> 16)
        qb = _bits_f16(u[:, 1:2])
        qc = _bits_f16(u[:, 2:3] >> 16)
        lna = _bits_f16(u[:, 2:3])
        r = (((u[:, 3:4] >> 21) & 0x7FF).astype(jnp.float32)
             * (1.0 / COLOR11_SCALE) - 4.0)
        g = (((u[:, 3:4] >> 10) & 0x7FF).astype(jnp.float32)
             * (1.0 / COLOR11_SCALE) - 4.0)
        b = ((u[:, 3:4] & 0x3FF).astype(jnp.float32)
             * (1.0 / COLOR10_SCALE) - 4.0)
        geo = jnp.concatenate([mx, my, qa, qb, qc, lna], axis=1)
        return geo, jnp.concatenate([r, g, b], axis=1)
    if not grid.packed_colors:
        return raw, raw[:, F_R : F_R + 3]
    # bitcast the WHOLE register block (a free reinterpret — slicing first
    # forces a [B, 6] relayout pass per block); cols 6-7 of geo are garbage
    # floats no caller reads (geometry indices are all < 6)
    geo = lax.bitcast_convert_type(raw, jnp.float32)
    u = raw[:, 6:8]  # [B, 2] int32
    inv = 1.0 / COLOR_SCALE
    r = (u[:, 0:1] >> 16).astype(jnp.float32) * inv  # arithmetic shift: sign ok
    g = ((u[:, 0:1] << 16) >> 16).astype(jnp.float32) * inv  # sign-extend low half
    b = (u[:, 1:2] >> 16).astype(jnp.float32) * inv
    return geo, jnp.concatenate([r, g, b], axis=1)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _pack_src(feats, grid):
    """Feature-table encoding for the instance gather (see _num_feats)."""
    if getattr(grid, "packed_feats16", False):
        return _pack_feats16(feats, grid)
    return _pack_color_feats(feats) if grid.packed_colors else feats


# Column-split gather, DISABLED by default (threshold = never): feature
# tables past ~120 MB pay the slow-gather regime on v5e (~15 ns/idx vs
# ~3.5-5 below it — the fast regime appears to be VMEM/working-set
# residency) and two half-width gathers beat one full-width gather
# STANDALONE (148.8 -> 113.9 ms at the 5M ball, tools/probe_gather_real.py)
# — but IN CONTEXT the same split costs +36 ms on the full 5M step
# (644.1 vs 607.9 ms measured, PERF.md round 3): forcing two 80 MB tables
# toward residency evidently displaces the Pallas kernels' own working
# sets. Kept as an opt-in experiment knob; standalone probes lie about
# VMEM-coupled behavior.
_GATHER_SPLIT_BYTES = None  # int bytes to enable; None = never split


def _gather_rows(src, idx):
    """Instance-feature row gather; column-split above _GATHER_SPLIT_BYTES."""
    if _GATHER_SPLIT_BYTES is None:
        return jnp.take(src, idx, axis=0)
    if src.size * src.dtype.itemsize > _GATHER_SPLIT_BYTES and src.shape[1] >= 2:
        h = src.shape[1] // 2
        return jnp.concatenate(
            [jnp.take(src[:, :h], idx, axis=0),
             jnp.take(src[:, h:], idx, axis=0)], axis=1)
    return jnp.take(src, idx, axis=0)


def _acc_dtype(grid: TileGrid):
    """Accumulation dtype of the per-tile output rows (--fp16/--fp32 analog,
    ref: src/app.cpp:1000-1035). Per-block math is always f32; only the
    carried (color, alpha, transmittance) rows round to bf16."""
    return jnp.bfloat16 if grid.accum_dtype == "bfloat16" else jnp.float32


def _tri(b, strict: bool):
    """Lower-triangular ones [b, b] (strict excludes the diagonal)."""
    r = lax.broadcasted_iota(jnp.int32, (b, b), 0)
    c = lax.broadcasted_iota(jnp.int32, (b, b), 1)
    return ((c < r) if strict else (c <= r)).astype(jnp.float32)


def _scan_rows_add(x, strict: bool = False):
    """Cumulative sum along axis 0 as a triangular matmul.

    A [B, B] x [B, P] matmul on the MXU is far cheaper than log2(B) sublane
    roll+select passes on the VPU — prefix scans over the splat axis are the
    bulk of the per-block arithmetic otherwise.
    """
    return jnp.dot(_tri(x.shape[0], strict), x, preferred_element_type=jnp.float32)


def _excl_cumprod_rows(x, eps: float = 1e-37):
    """Exclusive cumulative product along axis 0 via log-space matmul scan.

    Values are transmittance factors in (0, 1]; log-space keeps long products
    stable and turns the scan into one MXU matmul + exp.
    """
    logs = jnp.log(jnp.maximum(x, eps))
    return jnp.exp(_scan_rows_add(logs, strict=True))


def _tile_centers(t, grid: TileGrid):
    """Center of tile t in gl screen coordinates (+y up) -> scalar (tcx, tcy)."""
    ts = grid.tile_size
    tcx = (t % grid.tiles_x).astype(jnp.float32) * ts + 0.5 * ts
    tcy = grid.height - (t // grid.tiles_x).astype(jnp.float32) * ts - 0.5 * ts
    return tcx, tcy


def _pixel_coords(t, grid: TileGrid):
    """gl_FragCoord-style pixel centers for tile t -> ([1, P] x, [1, P] y)."""
    ts = grid.tile_size
    tcx, tcy = _tile_centers(t, grid)
    u, v = _local_coords(grid)
    return tcx + u, tcy + v


def _local_coords(grid: TileGrid):
    """Tile-local pixel-center offsets from the tile center -> ([1,P], [1,P])."""
    ts = grid.tile_size
    pidx = lax.broadcasted_iota(jnp.int32, (1, grid.tile_pixels), 1)
    u = (pidx % ts).astype(jnp.float32) + 0.5 - 0.5 * ts
    v = 0.5 * ts - (pidx // ts).astype(jnp.float32) - 0.5
    return u, v


def moment_basis(grid: TileGrid) -> np.ndarray:
    """Constant [P, 8] monomial basis in tile-local pixel coordinates.

    Identical for every tile (local coordinates), so it is built host-side
    once and streamed to VMEM with a constant index map.
    """
    ts = grid.tile_size
    pidx = np.arange(grid.tile_pixels)
    u = (pidx % ts).astype(np.float32) + 0.5 - 0.5 * ts
    v = 0.5 * ts - (pidx // ts).astype(np.float32) - 0.5
    cols = [u * u, u * v, v * v, u, v, np.ones_like(u), np.zeros_like(u),
            np.zeros_like(u)]
    return np.stack(cols, axis=1)  # [P, 8]


def _block_weights(feats, px, py, grid: TileGrid):
    """Per-(splat, pixel) composite weights w = alpha * g for one block.

    The 1/256 discard (shader/splat_frag.glsl:38-41) is a comparison on the
    exponent: w > cutoff  <=>  qh > ln(cutoff).
    """
    dx = px - feats[:, F_MX : F_MX + 1]  # [B, P]
    dy = py - feats[:, F_MY : F_MY + 1]
    qh = (
        feats[:, F_QA : F_QA + 1] * dx * dx
        + feats[:, F_QB : F_QB + 1] * dx * dy
        + feats[:, F_QC : F_QC + 1] * dy * dy
        + feats[:, F_LNA : F_LNA + 1]
    )
    w = jnp.exp(qh)
    if grid.alpha_cutoff > 0.0:
        w = jnp.where(qh > math.log(grid.alpha_cutoff), w, 0.0)
    return w


def _fwd_kernel(grid: TileGrid, meta_ref, inst_ref, out_ref):
    # meta packs (tile << 2 | first << 1 | live): ONE scalar-prefetch operand
    # instead of three — per-grid-step block bookkeeping is a measured cost
    # at ~18k steps (see PERF.md)
    j = pl.program_id(0)
    meta = meta_ref[j]
    t = meta >> 2
    first = (meta & 2) == 2
    live = (meta & 1) == 1
    p = grid.tile_pixels
    acc = _acc_dtype(grid)

    @pl.when(first)
    def _():
        out_ref[0] = jnp.concatenate(
            [jnp.zeros((4, p), acc), jnp.ones((1, p), acc), jnp.zeros((3, p), acc)],
            axis=0,
        )

    def body():
        feats, colors = _unpack_feats(inst_ref[:, :], grid)
        px, py = _pixel_coords(t, grid)
        w = _block_weights(feats, px, py, grid)
        one_minus = 1.0 - w
        excl = _excl_cumprod_rows(one_minus)
        t_run = out_ref[0, 4:5, :].astype(jnp.float32)
        t_before = t_run * excl
        eff = t_before * w  # [B, P]
        block_prod = excl[grid.block - 1 : grid.block, :] * one_minus[grid.block - 1 : grid.block, :]
        t_new = t_run * block_prod
        # color accumulation: one [3, B] x [B, P] matmul on the MXU instead
        # of three separate sublane reductions
        cmat = jnp.transpose(colors)  # [3, B]
        contrib = jnp.dot(cmat, eff, preferred_element_type=jnp.float32)  # [3, P]
        out_ref[0, 0:3, :] = (out_ref[0, 0:3, :].astype(jnp.float32) + contrib).astype(acc)
        out_ref[0, 3:4, :] = (1.0 - t_new).astype(acc)
        out_ref[0, 4:5, :] = t_new.astype(acc)

    # padding blocks past the last real tile carry only null instances — skip
    # their compute entirely (the out buffer already holds the final state)
    if grid.early_stop_eps > 0.0:
        # also skip once the whole tile is (numerically) opaque — the analog
        # of the per-pixel early-out hardware blending gets for free
        pl.when(live & (first | (jnp.max(out_ref[0, 4:5, :].astype(jnp.float32))
                                 >= grid.early_stop_eps)))(body)
    else:
        pl.when(live)(body)


def _bwd_kernel(grid: TileGrid, meta_ref, inst_ref, basis_ref,
                res_ref, dout_ref, dcols_ref, carry):
    # meta_ref as in _fwd_kernel; res_ref carries the forward residual rows,
    # dout_ref the output cotangent rows — two [1, 8, P] tile-indexed blocks
    # with the same index map. (Round 1-4 concatenated them into one
    # [T, 16, P] operand "so the input needs one block mapping instead of
    # two"; that concat materialized a 134 MB copy every backward at garden
    # scale for no kernel-side benefit.)
    j = pl.program_id(0)
    meta = meta_ref[j]
    t = meta >> 2
    first = (meta & 2) == 2
    live = (meta & 1) == 1
    b = grid.block

    @pl.when(first)
    def _():
        carry[0:1, :] = jnp.ones_like(carry[0:1, :])  # T_run
        carry[1:4, :] = jnp.zeros_like(carry[1:4, :])  # C_sofar rgb

    def body():
        feats, colors = _unpack_feats(inst_ref[:, :], grid)
        px, py = _pixel_coords(t, grid)
        w = _block_weights(feats, px, py, grid)
        one_minus = 1.0 - w
        excl = _excl_cumprod_rows(one_minus)
        t_run = carry[0:1, :]
        t_before = t_run * excl
        eff = t_before * w
        block_prod = excl[b - 1 : b, :] * one_minus[b - 1 : b, :]

        t_fin = res_ref[0, 4:5, :].astype(jnp.float32)
        d_alpha_out = dout_ref[0, 3:4, :].astype(jnp.float32)
        d_tfin_out = dout_ref[0, 4:5, :].astype(jnp.float32)
        d_rgb_out = dout_ref[0, 0:3, :].astype(jnp.float32)  # [3, P]
        inv_om = 1.0 / jnp.maximum(one_minus, 1e-9)

        # dL/dw accumulated over color channels + alpha/transmittance rows.
        # The three per-channel prefix scans collapse into ONE: with the
        # per-pixel cotangent dC_c constant along the splat axis,
        #   sum_c dC_c * S_after_c
        #     = sum_c dC_c (C_fin_c - C_sofar_c) - cumsum(eff * sum_c dC_c c_c),
        # so only the dC-weighted color dot needs scanning.  (colors [B, 3])
        # [B, 1] x [1, P] broadcasts: a K=3 matmul would pad K to the full
        # MXU tile and serialize behind the (much larger) triangular scan
        cdot = (colors[:, 0:1] * d_rgb_out[0:1, :]
                + colors[:, 1:2] * d_rgb_out[1:2, :]
                + colors[:, 2:3] * d_rgb_out[2:3, :])  # [B, P]
        # [1, P] row constants folded together before touching [B, P] shapes
        row = (d_alpha_out - d_tfin_out) * t_fin - jnp.sum(
            d_rgb_out * (res_ref[0, 0:3, :].astype(jnp.float32) - carry[1:4, :]),
            axis=0, keepdims=True,
        )
        incl_dot = _scan_rows_add(eff * cdot)
        dw = (incl_dot + row) * inv_om + t_before * cdot

        # exponent cotangent; w == 0 below the discard cutoff kills its
        # gradient automatically (subgradient of the discard)
        dqh = w * dw

        # all six spatial reductions from ONE moment matmul over the
        # tile-local monomial basis [u^2, uv, v^2, u, v, 1]
        mom = jnp.dot(dqh, basis_ref[:, :], preferred_element_type=jnp.float32)  # [B, 8]
        m_uu, m_uv, m_vv = mom[:, 0:1], mom[:, 1:2], mom[:, 2:3]
        m_u, m_v, m_1 = mom[:, 3:4], mom[:, 4:5], mom[:, 5:6]
        tcx, tcy = _tile_centers(t, grid)
        mxu = feats[:, F_MX : F_MX + 1] - tcx  # [B, 1]
        myu = feats[:, F_MY : F_MY + 1] - tcy
        # dx = u - mxu, dy = v - myu:
        d_qa = m_uu - 2.0 * mxu * m_u + mxu * mxu * m_1
        d_qb = m_uv - mxu * m_v - myu * m_u + mxu * myu * m_1
        d_qc = m_vv - 2.0 * myu * m_v + myu * myu * m_1
        d_lna = m_1
        qa = feats[:, F_QA : F_QA + 1]
        qb = feats[:, F_QB : F_QB + 1]
        qc = feats[:, F_QC : F_QC + 1]
        gx = m_u - mxu * m_1  # = sum_p dqh * dx
        gy = m_v - myu * m_1
        d_mx = -(2.0 * qa * gx + qb * gy)
        d_my = -(qb * gx + 2.0 * qc * gy)

        # color grads: one [B, P] x [P, 3] MXU matmul instead of three
        # VPU multiply+reduce chains over [B, P]
        dcols = jnp.dot(
            eff, jnp.transpose(d_rgb_out), preferred_element_type=jnp.float32
        )  # [B, 3]

        # ONE [9, B] column-major output block: the backward tail sorts each
        # gradient column as a 1-D payload — rows of [9, mcap] are contiguous
        # [mcap] slices, whereas slicing columns out of a [mcap, 16] row
        # buffer costs a full strided relayout pass per column. A single
        # 9-row output also keeps the per-grid-step block bookkeeping to one
        # mapping instead of nine.
        dcols_ref[:, :] = jnp.transpose(jnp.concatenate(
            [d_mx, d_my, d_qa, d_qb, d_qc, d_lna, dcols], axis=1
        ))

        # advance carries past this block (block totals are plain reductions,
        # not scans)
        carry[0:1, :] = t_run * block_prod
        carry[1:4, :] = carry[1:4, :] + jnp.dot(
            jnp.transpose(colors), eff, preferred_element_type=jnp.float32
        )

    if grid.early_stop_eps > 0.0:
        run = live & (first | (jnp.max(carry[0:1, :]) >= grid.early_stop_eps))
    else:
        run = live
    pl.when(run)(body)

    @pl.when(jnp.logical_not(run))
    def _():
        # skipped blocks (padding or early-stopped) still own their d slices
        dcols_ref[:, :] = jnp.zeros((NUM_GRAD_COLS, b), jnp.float32)


_SMEM_BYTES = 1 << 20  # v5e scalar-memory budget for the prefetch operand


def _check_smem(grid: TileGrid):
    need = grid.num_blocks * 4
    if not _interpret() and need > _SMEM_BYTES - 64 * 1024:
        raise ValueError(
            f"instance capacity too large: the kernels' block_meta scalar-"
            f"prefetch operand ({grid.num_blocks} blocks = {need} B) exceeds "
            f"the ~1 MB SMEM budget. Use calibrate_config (demand-fit "
            f"capacity) or a smaller max_instance_mult."
        )


def _fwd_call(inst, block_meta, grid: TileGrid):
    _check_smem(grid)
    p = grid.tile_pixels
    kernel = functools.partial(_fwd_kernel, grid)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid.num_blocks,),
        in_specs=[
            pl.BlockSpec((grid.block, _num_feats(grid)), lambda j, m: (j, 0)),
        ],
        out_specs=pl.BlockSpec((1, OUT_ROWS, p), lambda j, m: (m[j] >> 2, 0, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((grid.num_tiles, OUT_ROWS, p), _acc_dtype(grid)),
        interpret=_interpret(),
    )(block_meta, inst)


NUM_GRAD_COLS = 9  # d_mx, d_my, d_qa, d_qb, d_qc, d_lna, dr, dg, db

# Segment-gather table-size threshold (bytes) above which the backward
# tail's [emax, 9] prefix table splits into [emax, 8] + [emax, 2] for the
# per-splat segment-end gather. Measured IN CONTEXT (r5): at garden's
# 93 MB the 9-col table falls off the gather-residency cliff and the
# split wins big (153.0 -> 127.3 ms); at ball-1M's 66 MB the single
# gather is still fast and the split LOSES 7.7 ms (99.45 -> 107.2), so
# the crossover sits between those — 80 MB routes both correctly.
# Tests monkeypatch this to 0 to force the split branch at toy scale.
_SEG_GATHER_SPLIT_BYTES = 80_000_000


def _bwd_call(inst, block_meta, out_res, dout, grid: TileGrid):
    """-> [9, mcap] per-instance gradient columns (rows are contiguous [mcap]
    slices in instance order)."""
    if not _interpret() and grid.block % 128 != 0:
        raise ValueError(
            f"tile_block={grid.block} is not lowerable on TPU: the backward "
            f"kernel's [9, tile_block] gradient output block needs a lane "
            f"dimension divisible by 128 (Mosaic constraint). Use "
            f"tile_block=128 (the tuned default); arbitrary blocks run in "
            f"CPU interpret mode only."
        )
    p = grid.tile_pixels
    kernel = functools.partial(_bwd_kernel, grid)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid.num_blocks,),
        in_specs=[
            pl.BlockSpec((grid.block, _num_feats(grid)), lambda j, m: (j, 0)),
            pl.BlockSpec((p, NUM_MOMS), lambda j, m: (0, 0)),
            pl.BlockSpec((1, OUT_ROWS, p), lambda j, m: (m[j] >> 2, 0, 0)),
            pl.BlockSpec((1, OUT_ROWS, p), lambda j, m: (m[j] >> 2, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (NUM_GRAD_COLS, grid.block), lambda j, m: (0, j)
        ),
        scratch_shapes=[pltpu.VMEM((4, p), jnp.float32)],
    )
    basis = jnp.asarray(moment_basis(grid))
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NUM_GRAD_COLS, grid.mcap), jnp.float32),
        interpret=_interpret(),
    )(block_meta, inst, basis, out_res, dout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def composite_from_feats(feats, bins, grid: TileGrid):
    """Tile-binned composite from per-splat features -> per-tile [T, 8, P].

    feats is [N + 1, 16] (last row = null splat); ``bins`` is the dict from
    ops.binning.bin_splats. Differentiable in feats via the hand-written
    transmittance-replay backward kernel PLUS a sort transpose: per-instance
    gradients ride the enumeration-id sort back to enumeration order (where
    each splat's instances are contiguous) and are segment-reduced with one
    cumsum — avoiding both the giant scatter-add XLA would emit for the
    instance gather's VJP (~500 ms at 4M instances) and a random-access
    inverse-permutation gather (~110 ms).

    With grid.packed_colors the gather reads 8-column (32 B) rows — the fast
    row-gather shape on v5e — with RGB as 16-bit fixed point (see
    _pack_color_feats); the VJP still returns [N + 1, 16] f32 gradients
    (straight-through past the color rounding).
    """
    src = _pack_src(feats, grid)
    inst = _gather_rows(src, bins["inst_splat"])
    return _fwd_call(inst, bins["block_meta"], grid)


def _cff_fwd(feats, bins, grid):
    if grid.forward_only:
        raise ValueError(
            "composite_from_feats cannot be differentiated with "
            "forward_only=True: the viewer contract declares no backward. "
            "Render with forward_only=False to train."
        )
    src = _pack_src(feats, grid)
    inst = _gather_rows(src, bins["inst_splat"])
    out = _fwd_call(inst, bins["block_meta"], grid)
    # inst is saved as a residual: regathering it in the backward costs ~28 ms
    # at 4M instances (row gathers are ~6.5 ns per index on v5e) vs. one
    # [mcap, 16] f32 buffer kept live
    return out, (inst, bins, out)


def _blocked_cumsum(x, block: int = 512):
    """Inclusive cumsum along axis 0 as two-level blocked prefix sums.

    XLA's native cumsum over millions of rows runs ~log2(M) full-array
    shift+add passes (~9 ms at [2M, 9] on v5e); computing block-local
    cumsums (log2(block) passes) plus a tiny cross-block prefix cuts the
    full-size passes to log2(block) + 1 (~1.5 ms).
    """
    m = x.shape[0]
    if m % block != 0 or m <= block:
        return jnp.cumsum(x, axis=0)
    xb = x.reshape(m // block, block, *x.shape[1:])
    local = jnp.cumsum(xb, axis=1)
    carry = jnp.cumsum(local[:, -1], axis=0) - local[:, -1]  # excl block prefix
    return (local + carry[:, None]).reshape(x.shape)


def _pack_bf16_pairs(cols):
    """Pack pairs of f32 columns as (bf16 << 16 | bf16) int32 columns."""
    out = []
    for i in range(0, len(cols), 2):
        hi = lax.bitcast_convert_type(cols[i].astype(jnp.bfloat16), jnp.uint16)
        hi = hi.astype(jnp.uint32) << 16
        if i + 1 < len(cols):
            lo = lax.bitcast_convert_type(cols[i + 1].astype(jnp.bfloat16), jnp.uint16)
            hi = hi | lo.astype(jnp.uint32)
        out.append(lax.bitcast_convert_type(hi, jnp.int32))
    return out


def _unpack_bf16_pairs(packed, n_cols):
    """Inverse of _pack_bf16_pairs -> list of f32 columns."""
    cols = []
    for i, p in enumerate(packed):
        u = lax.bitcast_convert_type(p, jnp.uint32)
        hi = lax.bitcast_convert_type((u >> 16).astype(jnp.uint16), jnp.bfloat16)
        cols.append(hi.astype(jnp.float32))
        if 2 * i + 1 < n_cols:
            lo = lax.bitcast_convert_type(u.astype(jnp.uint16), jnp.bfloat16)
            cols.append(lo.astype(jnp.float32))
    return cols


def _cff_bwd(grid, residuals, dout):
    inst, bins, out = residuals
    d_inst = _bwd_call(inst, bins["block_meta"], out, dout, grid)
    # sort transpose: tile-sorted grads -> SPLAT-GROUPED order -> per-splat
    # sums. The sort key is inst_splat itself (already in bins): ascending
    # splat ids group each splat's instances into exactly the contiguous
    # range [seg_offs_i, seg_offs_i + seg_cnt_i) — the same segments the
    # enumeration order had, because seg_offs is the exclusive cumsum of
    # seg_cnt in splat-index order — and a segment SUM does not care about
    # the within-segment order. This replaced round 1-3's m_pos
    # (enumeration-id) key, which had to ride the MAIN instance sort as a
    # payload operand purely to be available here; keying on inst_splat
    # deletes that operand from the hot sort (1 of 3 at depth16) at zero
    # cost. Sorts stream HBM sequentially (~0.3 ms per operand at 2M rows)
    # whereas the alternative — inverting the permutation and row-gathering
    # d_inst — is a random-access sweep over a 150 MB array (~110 ms
    # measured on v5e). Pad/sentinel slots carry s = N and sort past every
    # real instance; their d rows are zeros anyway (the backward kernel
    # zero-fills skipped blocks, null instances have zero weight).
    tail_key = bins.get("m_pos", bins["inst_splat"])
    if grid.grad_sort_dtype == "bfloat16":
        # the sort is byte-bound: pairs of bf16 gradient columns ride one
        # int32 payload each (5 operands instead of 9). Only the PER-INSTANCE
        # values round to bf16; the per-splat segment sums below stay f32.
        packed = _pack_bf16_pairs([d_inst[i] for i in range(NUM_GRAD_COLS)])
        sorted_p = lax.sort((tail_key,) + tuple(packed), num_keys=1)
        sorted_cols = (sorted_p[0],) + tuple(
            _unpack_bf16_pairs(sorted_p[1:], NUM_GRAD_COLS)
        )
    else:
        sorted_cols = lax.sort(
            (tail_key,) + tuple(d_inst[i] for i in range(NUM_GRAD_COLS)),
            num_keys=1,
        )
    # per-splat segment sums over the splat-grouped ranges. Segments are
    # CONTIGUOUS (offs is an exact exclusive cumsum of cnt, dropped splats
    # have cnt == 0), so start_i == end_{i-1} and one prefix gather + a
    # first-difference replaces two gathers. The gather LAYOUT is size-
    # conditional (measured r5, tools + PERF.md "segment-gather residency"):
    # below ~60 MB one [emax, 9] row gather runs at the fast per-index rate
    # (~6.4 ns; an 8+1 split measured SLOWER there, r4 microbench_gather);
    # past it the 9-col table falls off the residency cliff (~19 ns/idx at
    # garden's 93 MB) while a 2-col 21 MB table still gathers at ~4.5 ns —
    # so large tables split 8 + 2 (the 9th column rides a 2-wide table with
    # a zero pad column; 1-wide gathers are catastrophic, ~25 ns/idx).
    cs_cols = [c[: grid.emax] for c in sorted_cols[1:10]]
    end = jnp.minimum(bins["seg_offs"] + bins["seg_cnt"], grid.emax)
    at = jnp.clip(end - 1, 0, grid.emax - 1)
    live = (end > 0)[:, None]
    if grid.emax * 36 > _SEG_GATHER_SPLIT_BYTES:
        cs8 = _blocked_cumsum(jnp.stack(cs_cols[:8], axis=1))
        cs2 = _blocked_cumsum(jnp.stack(
            [cs_cols[8], jnp.zeros_like(cs_cols[8])], axis=1))
        g = jnp.where(live, jnp.concatenate(
            [jnp.take(cs8, at, axis=0), jnp.take(cs2, at, axis=0)[:, :1]],
            axis=1), 0.0)  # [N, 9] cs at segment ends
    else:
        cs9 = _blocked_cumsum(jnp.stack(cs_cols, axis=1))  # [emax, 9]
        g = jnp.where(live, jnp.take(cs9, at, axis=0), 0.0)
    d_rows = jnp.diff(g, axis=0, prepend=jnp.zeros((1, 9), g.dtype))  # [N, 9]
    d_feats = jnp.concatenate(
        [d_rows, jnp.zeros((d_rows.shape[0], NUM_FEATS - 9), d_rows.dtype)], axis=1
    )
    d_feats = jnp.concatenate([d_feats, jnp.zeros((1, NUM_FEATS), d_feats.dtype)], axis=0)
    return d_feats, None


composite_from_feats.defvjp(_cff_fwd, _cff_bwd)
