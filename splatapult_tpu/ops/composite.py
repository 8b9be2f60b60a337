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
  so there is no masking anywhere: null instances carry alpha 0 and are no-ops.
- The output block index is the block's owning tile; consecutive blocks of one
  tile revisit the same VMEM-resident output block, which doubles as the
  compositing accumulator (rows 0-2 premultiplied RGB, row 3 alpha, row 4
  transmittance T). Pallas's pipelining double-buffers the instance blocks.
- Within a block, the front-to-back products are closed-form: an exclusive
  cumulative product of (1 - w) along the splat axis, computed with a
  log2(B)-step Hillis-Steele scan of sublane rolls on the VPU.
- The backward kernel re-walks the same blocks front-to-back (transmittance
  replay: only the forward's final per-pixel color/transmittance are saved, no
  per-splat intermediates), producing per-instance feature gradients that the
  caller scatter-adds back to splats through the gather's natural VJP.

Layouts (B = block, P = tile_size^2 pixels):
  instance features  [Mcap, 16] f32, cols: mean_x, mean_y, conic_a, conic_b,
                     conic_c, r, g, b, alpha, 0...  (null row = all zero)
  per-tile output    [T, 8, P] f32, rows: premult r, g, b, alpha, T, 0, 0, 0
  compute shape      [B, P]: splats on sublanes, pixels on lanes
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from splatapult_tpu.ops.binning import TileGrid

NUM_FEATS = 16
OUT_ROWS = 8
# feature column indices
F_MX, F_MY, F_CA, F_CB, F_CC, F_R, F_G, F_B, F_ALPHA = range(9)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


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


def _pixel_coords(t, grid: TileGrid):
    """gl_FragCoord-style pixel centers for tile t -> ([1, P] x, [1, P] y)."""
    ts = grid.tile_size
    tx = (t % grid.tiles_x).astype(jnp.float32)
    ty = (t // grid.tiles_x).astype(jnp.float32)
    pidx = lax.broadcasted_iota(jnp.int32, (1, grid.tile_pixels), 1)
    col = (pidx % ts).astype(jnp.float32)
    rowp = (pidx // ts).astype(jnp.float32)
    px = tx * ts + col + 0.5
    py = grid.height - (ty * ts + rowp) - 0.5  # +y up, row 0 = top
    return px, py


def _block_weights(feats, px, py, grid: TileGrid):
    """Per-(splat, pixel) gaussian weights for one block.

    Returns (w [B, P], g [B, P], dx, dy). w already has the 1/256 discard
    (shader/splat_frag.glsl:38-41) applied when grid.alpha_cutoff > 0.
    """
    dx = px - feats[:, F_MX : F_MX + 1]  # [B, P]
    dy = py - feats[:, F_MY : F_MY + 1]
    a = feats[:, F_CA : F_CA + 1]
    bb = feats[:, F_CB : F_CB + 1]
    c = feats[:, F_CC : F_CC + 1]
    q = a * dx * dx + (2.0 * bb) * dx * dy + c * dy * dy
    g = jnp.exp(-0.5 * q)  # shader/splat_frag.glsl:25
    w = feats[:, F_ALPHA : F_ALPHA + 1] * g
    if grid.alpha_cutoff > 0.0:
        w = jnp.where(w > grid.alpha_cutoff, w, 0.0)
    return w, g, dx, dy


def _fwd_kernel(grid: TileGrid, bt_ref, bf_ref, bl_ref, inst_ref, out_ref):
    j = pl.program_id(0)
    t = bt_ref[j]
    first = bf_ref[j] == 1
    live = bl_ref[j] == 1
    p = grid.tile_pixels

    @pl.when(first)
    def _():
        out_ref[0] = jnp.concatenate(
            [jnp.zeros((4, p), jnp.float32), jnp.ones((1, p), jnp.float32),
             jnp.zeros((3, p), jnp.float32)],
            axis=0,
        )

    def body():
        feats = inst_ref[:, :]  # [B, 16]
        px, py = _pixel_coords(t, grid)
        w, _, _, _ = _block_weights(feats, px, py, grid)
        one_minus = 1.0 - w
        excl = _excl_cumprod_rows(one_minus)
        t_before = out_ref[0, 4:5, :] * excl
        eff = t_before * w  # [B, P]
        block_prod = excl[grid.block - 1 : grid.block, :] * one_minus[grid.block - 1 : grid.block, :]
        t_new = out_ref[0, 4:5, :] * block_prod
        # color accumulation: one [3+1, B] x [B, P] matmul on the MXU instead
        # of three separate sublane reductions
        cmat = jnp.transpose(feats[:, F_R : F_R + 3])  # [3, B]
        contrib = jnp.dot(cmat, eff, preferred_element_type=jnp.float32)  # [3, P]
        out_ref[0, 0:3, :] = out_ref[0, 0:3, :] + contrib
        out_ref[0, 3:4, :] = 1.0 - t_new
        out_ref[0, 4:5, :] = t_new

    # padding blocks past the last real tile carry only null instances — skip
    # their compute entirely (the out buffer already holds the final state)
    if grid.early_stop_eps > 0.0:
        # also skip once the whole tile is (numerically) opaque — the analog
        # of the per-pixel early-out hardware blending gets for free
        pl.when(live & (first | (jnp.max(out_ref[0, 4:5, :]) >= grid.early_stop_eps)))(body)
    else:
        pl.when(live)(body)


def _bwd_kernel(grid: TileGrid, bt_ref, bf_ref, bl_ref, inst_ref, res_ref, dout_ref,
                dinst_ref, carry):
    j = pl.program_id(0)
    t = bt_ref[j]
    first = bf_ref[j] == 1
    live = bl_ref[j] == 1
    b = grid.block

    @pl.when(first)
    def _():
        carry[0:1, :] = jnp.ones_like(carry[0:1, :])  # T_run
        carry[1:4, :] = jnp.zeros_like(carry[1:4, :])  # C_sofar rgb

    def body():
        feats = inst_ref[:, :]
        px, py = _pixel_coords(t, grid)
        w, g, dx, dy = _block_weights(feats, px, py, grid)
        one_minus = 1.0 - w
        excl = _excl_cumprod_rows(one_minus)
        t_run = carry[0:1, :]
        t_before = t_run * excl
        eff = t_before * w
        block_prod = excl[b - 1 : b, :] * one_minus[b - 1 : b, :]

        t_fin = res_ref[0, 4:5, :]
        d_alpha_out = dout_ref[0, 3:4, :]
        d_tfin_out = dout_ref[0, 4:5, :]
        inv_om = 1.0 / jnp.maximum(one_minus, 1e-9)

        # dL/dw accumulated over color channels + alpha/transmittance rows.
        # The three per-channel prefix scans collapse into ONE: with the
        # per-pixel cotangent dC_c constant along the splat axis,
        #   sum_c dC_c * S_after_c
        #     = sum_c dC_c (C_fin_c - C_sofar_c) - cumsum(eff * sum_c dC_c c_c),
        # so only the dC-weighted color dot needs scanning.
        dw = (d_alpha_out - d_tfin_out) * (t_fin * inv_om)
        cdot = jnp.zeros_like(eff)
        sdot_fin = jnp.zeros_like(t_fin)
        dcols = []
        for ch in range(3):
            ccol = feats[:, F_R + ch : F_R + ch + 1]
            d_c = dout_ref[0, ch : ch + 1, :]
            cdot = cdot + ccol * d_c
            sdot_fin = sdot_fin + d_c * (res_ref[0, ch : ch + 1, :] - carry[1 + ch : 2 + ch, :])
            dcols.append(jnp.sum(eff * d_c, axis=1, keepdims=True))  # [B, 1]
        incl_dot = _scan_rows_add(eff * cdot)
        dw = dw + t_before * cdot - (sdot_fin - incl_dot) * inv_om
        if grid.alpha_cutoff > 0.0:
            # subgradient of the discard: contributions below the cutoff are
            # identically zero in the forward, so their w-gradient is zero too.
            # Without a cutoff, zero-weight splats (alpha = 0) still carry a
            # real d/d_alpha = g * dw, so dw must NOT be masked.
            dw = jnp.where(w > 0.0, dw, 0.0)

        d_alpha = jnp.sum(g * dw, axis=1, keepdims=True)
        dq = -0.5 * w * dw
        a = feats[:, F_CA : F_CA + 1]
        bbb = feats[:, F_CB : F_CB + 1]
        c = feats[:, F_CC : F_CC + 1]
        d_ca = jnp.sum(dq * dx * dx, axis=1, keepdims=True)
        d_cb = jnp.sum(2.0 * dq * dx * dy, axis=1, keepdims=True)
        d_cc = jnp.sum(dq * dy * dy, axis=1, keepdims=True)
        d_mx = jnp.sum(-dq * (2.0 * a * dx + 2.0 * bbb * dy), axis=1, keepdims=True)
        d_my = jnp.sum(-dq * (2.0 * bbb * dx + 2.0 * c * dy), axis=1, keepdims=True)

        dinst_ref[:, :] = jnp.concatenate(
            [d_mx, d_my, d_ca, d_cb, d_cc, dcols[0], dcols[1], dcols[2], d_alpha,
             jnp.zeros((b, NUM_FEATS - 9), jnp.float32)],
            axis=1,
        )

        # advance carries past this block (block totals are plain reductions,
        # not scans)
        carry[0:1, :] = t_run * block_prod
        for ch in range(3):
            ccol = feats[:, F_R + ch : F_R + ch + 1]
            carry[1 + ch : 2 + ch, :] = carry[1 + ch : 2 + ch, :] + jnp.sum(
                eff * ccol, axis=0, keepdims=True
            )

    if grid.early_stop_eps > 0.0:
        run = live & (first | (jnp.max(carry[0:1, :]) >= grid.early_stop_eps))
    else:
        run = live
    pl.when(run)(body)

    @pl.when(jnp.logical_not(run))
    def _():
        # skipped blocks (padding or early-stopped) still own their d_inst slice
        dinst_ref[:, :] = jnp.zeros((b, NUM_FEATS), jnp.float32)


def _fwd_call(inst, block_tile, block_first, block_live, grid: TileGrid):
    p = grid.tile_pixels
    kernel = functools.partial(_fwd_kernel, grid)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(grid.num_blocks,),
        in_specs=[
            pl.BlockSpec((grid.block, NUM_FEATS), lambda j, bt, bf, bl: (j, 0)),
        ],
        out_specs=pl.BlockSpec((1, OUT_ROWS, p), lambda j, bt, bf, bl: (bt[j], 0, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((grid.num_tiles, OUT_ROWS, p), jnp.float32),
        interpret=_interpret(),
    )(block_tile, block_first, block_live, inst)


def _bwd_call(inst, block_tile, block_first, block_live, out_res, dout, grid: TileGrid):
    p = grid.tile_pixels
    kernel = functools.partial(_bwd_kernel, grid)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(grid.num_blocks,),
        in_specs=[
            pl.BlockSpec((grid.block, NUM_FEATS), lambda j, bt, bf, bl: (j, 0)),
            pl.BlockSpec((1, OUT_ROWS, p), lambda j, bt, bf, bl: (bt[j], 0, 0)),
            pl.BlockSpec((1, OUT_ROWS, p), lambda j, bt, bf, bl: (bt[j], 0, 0)),
        ],
        out_specs=pl.BlockSpec((grid.block, NUM_FEATS), lambda j, bt, bf, bl: (j, 0)),
        scratch_shapes=[pltpu.VMEM((4, p), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((grid.mcap, NUM_FEATS), jnp.float32),
        interpret=_interpret(),
    )(block_tile, block_first, block_live, inst, out_res, dout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def composite_from_feats(feats, bins, grid: TileGrid):
    """Tile-binned composite from per-splat features -> per-tile [T, 8, P].

    feats is [N + 1, 16] (last row = null splat); ``bins`` is the dict from
    ops.binning.bin_splats. Differentiable in feats via the hand-written
    transmittance-replay backward kernel PLUS a sort-structured gather
    transpose: per-instance gradients are mapped back to enumeration order
    (where each splat's instances are contiguous) with one gather, prefix-
    summed, and segment-differenced — avoiding the giant scatter-add XLA
    would emit for the instance gather's VJP (~500 ms at 4M instances; this
    path costs a few ms).
    """
    inst = jnp.take(feats, bins["inst_splat"], axis=0)
    return _fwd_call(inst, bins["block_tile"], bins["block_first"], bins["block_live"], grid)


def _cff_fwd(feats, bins, grid):
    inst = jnp.take(feats, bins["inst_splat"], axis=0)
    out = _fwd_call(
        inst, bins["block_tile"], bins["block_first"], bins["block_live"], grid
    )
    # inst is saved as a residual: regathering it in the backward costs ~28 ms
    # at 4M instances (row gathers are ~6.5 ns per index on v5e) vs. one
    # [mcap, 16] f32 buffer kept live
    return out, (inst, bins, out)


def _cff_bwd(grid, residuals, dout):
    from splatapult_tpu.ops.scan import segment_sum_rows

    inst, bins, out = residuals
    d_inst = _bwd_call(
        inst, bins["block_tile"], bins["block_first"], bins["block_live"], out, dout, grid
    )
    # gather transpose: pos-space grads -> enumeration order -> per-splat sums.
    # The inverse of the binning sort is recovered by a second (2-operand)
    # sort of the enumeration ids it carried — ~3x cheaper than scattering an
    # inverse index map (see ops/binning.py header). Pad/sentinel rows carry
    # m = emax and sort past the first emax entries; their d rows are zeros
    # anyway (the backward kernel zero-fills skipped blocks).
    pos_of_enum = lax.sort(
        (bins["m_pos"], jnp.arange(grid.mcap, dtype=jnp.int32)), num_keys=1
    )[1][: grid.emax]
    d_enum = jnp.take(d_inst, pos_of_enum, axis=0)
    start = jnp.minimum(bins["seg_offs"], grid.emax)
    end = jnp.minimum(bins["seg_offs"] + bins["seg_cnt"], grid.emax)
    d_rows = segment_sum_rows(d_enum, start, end)  # [N, 16]
    d_feats = jnp.concatenate([d_rows, jnp.zeros((1, NUM_FEATS), d_rows.dtype)], axis=0)
    return d_feats, None


composite_from_feats.defvjp(_cff_fwd, _cff_bwd)
