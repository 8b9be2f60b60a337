"""Tile binning: splat -> (tile, depth)-ordered instance lists, all static shapes.

This replaces the reference's per-frame GPU sort machinery — the presort
compaction with an atomic counter (ref: shader/presort_compute.glsl:50-55) and
the full 32-bit radix sort of every visible splat (ref: src/splatrenderer.cpp:
153-312, shader/multi_radixsort*.glsl) — with a TPU/XLA-native formulation:

1. Depth ordering happens *inside* the one binning sort: per-instance view
   depth rides as a second sort key (full f32, no quantization — the reference
   quantizes depth into its 32-bit radix keys and saw artifacts at 24 bits,
   ref: src/splatrenderer.cpp:165-169), with descending splat index as the
   tie-break (the reference's stable back-to-front draw order implies
   higher-index-in-front under equal depth, ref: shader/presort_compute.glsl:
   52-53). A multi-key TPU sort costs ~1.2 ms over single-key at 2M rows —
   far cheaper than globally depth-sorting the splats and permuting every
   per-splat column before binning (legacy mode: ``depth=None`` assumes the
   caller pre-sorted front-to-back and groups by tile id alone).
2. Dynamic instance counts are handled with a static-size instance buffer:
   enumeration slots map back to (splat, tile-within-rect) pairs via a
   scatter-at-segment-starts + cummax forward fill. No atomics, no
   data-dependent shapes, no host readback (the reference stalls the pipe
   every frame reading its counter, src/splatrenderer.cpp:196-204).
3. Block alignment happens *inside the sort*: exact per-tile padding entries
   (counted by one bincount-by-sort over the enumerated tile ids) are
   appended before the tile sort, so every
   tile's segment in the sorted order starts at a multiple of the compositing
   block size B and is filled to a multiple of B with *null instances*
   (splat index N -> an all-zero feature row). The sorted order IS the
   instance buffer: no scatter ever materializes it, and block metadata
   (owning tile, first-of-tile) falls out of strided slices.

Why this shape: on TPU, XLA scatters and gathers cost ~5-9 ns per *index*
(independent of row width) while sorts and streaming kernels move data at
~0.6-2 ns/element — an order of magnitude cheaper. The enumeration expansion
is therefore a Pallas kernel (_expand_fill_pallas: packed masked-max window
selection over the compacted splat table — no scatters, no gathers), the
histogram is a bincount-by-sort, the only per-index op left is the feature
row gather, and every other reordering is a `lax.sort` (measurements in
tools/microbench_bin2.py and PERF.md).

Overflow: if the enumeration capacity ``emax`` is exceeded, whole FARTHEST
splats are dropped — by the depth key when one is given, by input order
(which is depth order for pre-sorted callers) otherwise — so the sorted
structure stays exact; the dropped instance count is reported, never silent.
"""

from __future__ import annotations

import dataclasses
import functools
import logging

import jax.numpy as jnp
from jax import lax

_log = logging.getLogger("splatapult_tpu")


@dataclasses.dataclass(frozen=True)
class TileGrid:
    """Static geometry of the tiled pipeline (hashable; jit-static)."""

    width: int  # true image width in px
    height: int
    tile_size: int  # TS, pixels per tile side
    block: int  # B, instances per composite block (power of two)
    emax: int  # raw instance enumeration capacity
    mcap: int  # aligned instance buffer capacity (multiple of block)
    alpha_cutoff: float = 1.0 / 256.0
    early_stop_eps: float = 0.0
    # accumulation dtype for the composite output rows ("float32"/"bfloat16"),
    # the reference's --fp32/--fp16 offscreen-FBO knob (ref: src/app.cpp:
    # 1000-1035); per-block math stays f32 either way
    accum_dtype: str = "float32"
    # dtype the PER-INSTANCE gradient columns ride through the backward's
    # transpose sort ("float32"/"bfloat16"). The sort is byte-bound, so bf16
    # halves its payload traffic; per-splat sums still accumulate in f32
    grad_sort_dtype: str = "float32"
    # pack splat RGB as 16-bit fixed point (step 2^-12, range +-8) so feature
    # rows shrink from 64 B to 32 B — 32 B rows gather ~1.85x faster on v5e
    # (tools/microbench_gather.py). Geometry/opacity stay exact f32; max
    # per-splat color error 1.2e-4 (the reference's own --fp16 FBO stores the
    # whole accumulated frame at half precision, far coarser)
    packed_colors: bool = False
    # forward-only rendering (the reference's actual mode — it has no backward
    # at all, SURVEY.md "What the reference is"). Since round 4 the binning
    # carries NO backward-only payload either way (the backward transpose
    # re-keys on inst_splat, see ops/composite._cff_bwd), so this flag is a
    # pure contract marker: differentiating a forward_only composite raises.
    forward_only: bool = False
    # depth precision inside the instance sort key: 32 = full f32 depth bits
    # as a separate key (exact ordering); 20 = the top 20 f32 bits (8 exponent
    # + 12 explicit mantissa bits, relative step ~2.4e-4) PACKED with the tile
    # id into ONE
    # int32 key — one sort operand and one comparison key fewer, at scene-
    # scale image diffs ~30x smaller than depth_bits=16's (PERF.md round 4:
    # bf16 depth measured mean ~2-4e-3 / p99.9 ~0.12 abs image diff on the
    # production scenes and was DEMOTED from default, echoing the
    # reference's own 24-bit-key revert, src/splatrenderer.cpp:165-169);
    # 16 = bf16 depth, kept as an opt-in A/B point. For reference scale:
    # the reference ships a 32-bit LINEAR [0, far] radix key
    # (shader/presort_compute.glsl:52-53) whose RELATIVE step at depth d is
    # 2.3e-7*far/d — coarser than depth20 for anything nearer than ~far/500,
    # finer beyond (where splats are subpixel anyway). depth20 requires
    # num_tiles < 2^11 (a 1080p tile32 grid = 2040 qualifies; the sentinel
    # key num_tiles << 20 | 0xFFFFF must fit int32), 16 requires
    # < 2^15; both fall back to 32 otherwise. Ties order by the descending-
    # index tie-break (the reference's submission-order semantics).
    depth_bits: int = 32
    # quantize the WHOLE instance feature row into 4 int32 = 16 B (16-bit
    # fixed means, f16 conic + ln-alpha, 11/11/10-bit colors) so a 5M-splat
    # table stays inside the fast gather regime; coarser than packed_colors
    # — see ops/composite.NUM_FEATS_PACKED16 for the layout and error bounds
    packed_feats16: bool = False
    # expand-kernel implementation: "auto" defers to the module-level
    # preference order (_EXPAND_ORDER — skipping infeasible impls); naming
    # one of "onehot"/"onehotb"/"onehot2"/"packed" pins it through the
    # config instead of the module global (tools may still monkeypatch the
    # global for A/B sweeps; an "auto" grid honors it)
    expand_impl: str = "auto"
    # compaction-branch selection, same pattern as expand_impl: "auto" =
    # the exact runtime span check (through the module global, which tools
    # monkeypatch); "always" forces the 5-operand partition sort; "never"
    # forces the in-place path UNSAFELY (measurement only)
    compact_mode: str = "auto"
    # INTERLEAVED multi-chip tile-row ownership: with row_stride S > 1 the
    # grid still describes the FULL image (tile ids, pixel coords, sort-key
    # packing are all full-grid), but binning enumerates only the tile rows
    # r with r % S == row_offset (bin_splats' row_offset argument — a traced
    # per-chip value, lax.axis_index). Adjacent tile rows have similar
    # instance density, so striding balances per-chip demand where
    # contiguous bands concentrate it (measured beta up to 2.7 at D=8 on
    # the garden stand-in, tools/scaling_model.py); every (splat, tile)
    # instance still lands on exactly one chip. mcap sizes the alignment
    # pad to the OWNED tile count (num_tiles / S).
    row_stride: int = 1

    @property
    def tiles_x(self) -> int:
        return -(-self.width // self.tile_size)

    @property
    def tiles_y(self) -> int:
        return -(-self.height // self.tile_size)

    @property
    def num_tiles(self) -> int:
        return self.tiles_x * self.tiles_y

    @property
    def num_blocks(self) -> int:  # NB: length of the flat block work-list
        return self.mcap // self.block

    @property
    def tile_pixels(self) -> int:
        return self.tile_size * self.tile_size

    @staticmethod
    def create(width, height, num_splats, tile_size=32, block=128,
               max_instance_mult=6, alpha_cutoff=1.0 / 256.0, early_stop_eps=0.0,
               accum_dtype="float32", grad_sort_dtype="float32",
               packed_colors=False, forward_only=False, depth_bits=32,
               expand_impl="auto", packed_feats16=False, row_stride=1,
               compact_mode="auto"):
        assert block & (block - 1) == 0, "block must be a power of two"
        assert accum_dtype in ("float32", "bfloat16"), accum_dtype
        assert grad_sort_dtype in ("float32", "bfloat16"), grad_sort_dtype
        assert depth_bits in (16, 20, 32), depth_bits
        emax = max(4096, -(-int(max_instance_mult * max(num_splats, 1)) // 4096) * 4096)
        tiles_y = -(-height // tile_size)
        assert tiles_y % row_stride == 0, (
            f"tiles_y={tiles_y} must divide by row_stride={row_stride} "
            f"(pad the image height)")
        tiles = (-(-width // tile_size)) * tiles_y
        # worst-case alignment padding: < block per OWNED tile
        mcap = emax + (tiles // row_stride) * block
        return TileGrid(
            width=width, height=height, tile_size=tile_size, block=block,
            emax=emax, mcap=mcap, alpha_cutoff=alpha_cutoff,
            early_stop_eps=early_stop_eps, accum_dtype=accum_dtype,
            grad_sort_dtype=grad_sort_dtype, packed_colors=packed_colors,
            forward_only=forward_only, depth_bits=depth_bits,
            expand_impl=expand_impl, packed_feats16=packed_feats16,
            row_stride=row_stride, compact_mode=compact_mode,
        )


_EXPAND_C = 512  # slot-chunk size of the Pallas expand kernel (divides emax)
_EXPAND_CTAB = 128  # table-block granularity of the candidate window
# Window size: winners for the C slots of one chunk span at most C rows of
# the compacted table (offs is strictly increasing over kept rows, so at most
# C-1 rows start inside a C-slot span, plus the row covering the chunk start),
# plus up to CTAB-1 rows of block-alignment slop before it.
_EXPAND_WBLK = _EXPAND_C // _EXPAND_CTAB + 1  # window = WBLK * CTAB rows
# "onehot2" sub-chunking: each SUBC-slot subchunk gets its own 2-block window
_EXPAND_SUBC = 128
# expand-kernel implementation preference: "onehot" = one masked-max window
# reduction finds the covering row, then a one-hot MXU matmul selects all
# fields at once (no packing budget: works to 2^24 instances/splats);
# "packed" = one (candidate << bits | field) masked max per field (5 VPU
# window reductions, fields capped by a 31-bit packing budget — infeasible
# past ~2M instances, e.g. the 1.5M-splat 1080p garden scene).
# "auto" tries them in preference order, skipping infeasible ones; onehot
# leads: it is faster where both are feasible (1M ball/1080p: bin_splats
# 18.0 ms onehot vs 20.5 packed vs 36.8 fallback, tools/microbench_expand.py)
# and the only feasible kernel impl at garden scale. "packed" is retained
# deliberately as an INDEPENDENT implementation of the same contract: the
# parametrized tests require both to match the scatter+cummax fallback
# bit-exactly, which cross-validates the onehot transport path (whose
# failure mode — MXU bf16 truncation — is invisible in CPU interpret mode).
_EXPAND_IMPL = "auto"
_EXPAND_ORDER = ("onehot", "packed")
# Compaction-branch override for A/B measurement tools ONLY ("auto" = the
# exact runtime span check; "always" forces the 5-operand partition sort;
# "never" forces the in-place path UNSAFELY — correctness then rests on the
# view actually fitting the windows). Library consumers should pin
# TileGrid.compact_mode instead; an "auto" grid defers here. _EMIT_M_POS
# below stays deliberately tool-only (it resurrects a deleted legacy
# payload purely for A/B measurement).
_COMPACT_MODE = "auto"
# A/B measurement global: emit the legacy m_pos enumeration-id payload from
# the main instance sort (the round-1..3 design, whose backward tail sorted
# by it); composite._cff_bwd keys its transpose on m_pos when present
_EMIT_M_POS = False


def _expand_impl_ok(impl: str, emax: int, n: int, num_tiles: int,
                    fbt: int, fbn: int, ob: int) -> bool:
    """Feasibility of one expand-kernel impl at these sizes.

    "onehot" transports fields as f32 through an MXU matmul (exact for
    integers < 2^24 under Precision.HIGHEST — see _expand_fill_pallas);
    "packed" needs every (window_index << bits | field) word to fit int31.
    """
    if impl == "onehot2":
        # the sub-chunked window formula (wsub = SUBC // CTAB + 1) only covers
        # every winner when CTAB divides SUBC and SUBC <= the chunk size; a
        # CTAB raised past SUBC (e.g. a microbench sweep) would silently
        # mis-bin, so the impl is simply infeasible there
        if _EXPAND_CTAB > _EXPAND_SUBC or _EXPAND_SUBC % _EXPAND_CTAB != 0:
            return False
    if impl in ("onehot", "onehotb", "onehot2"):
        return emax < 2**24 and n < 2**24 and (num_tiles << fbn) < 2**24
    ib = (_EXPAND_WBLK * _EXPAND_CTAB - 1).bit_length()
    return ib + ob <= 31 and ib + fbt + fbn <= 31 and ib + 16 <= 31


def _expand_fill_pallas(offs_c, tnx_c, dhi_c, dlo_c, sid_c, lo_blk,
                        grid: TileGrid, fbt: int, fbn: int, ob: int,
                        impl: str = "onehot"):
    """Expand the compacted per-splat table to per-slot values -> [3, emax].

    The inverse of "which splat covers enumeration slot m": with the kept
    splats compacted (offs strictly increasing), the covering row for any
    slot in chunk j lies in a (WBLK*CTAB)-row window starting at table block
    lo_blk[j] (see _EXPAND_WBLK above for the span bound).

    "onehot" impl: ONE masked max finds the covering row index per slot;
    every field then falls out of a single [5, W] @ [W, C] one-hot MXU
    matmul — no gathers, no scatters, no per-field packed-bit selects, and
    fields stay full width (they only must be exact in f32, i.e. integers
    < 2^24, which is why depth is split in two 16-bit halves).
    "packed" impl: each field rides its own (candidate_index << bits |
    field) masked max — 5 VPU window reductions under a 31-bit budget.
    Rows: 0 = tile id, 1 = ORIGINAL splat index, 2 = sortable depth bits.
    """
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C = _EXPAND_C
    ctab, wblk = _EXPAND_CTAB, _EXPAND_WBLK
    # tile-id step between successive rows of a rect: tiles_x on the full
    # grid, tiles_x * S under interleaved row ownership (row_stride = S)
    tx_n = grid.tiles_x * grid.row_stride
    emax = grid.emax
    n_pad = offs_c.shape[0]
    assert emax % C == 0 and n_pad % ctab == 0 and n_pad >= wblk * ctab

    def onehot_kernel(lo_ref, *refs):
        offs_refs = refs[:wblk]
        table_refs = refs[wblk : 2 * wblk]
        out_ref = refs[-1]
        j = pl.program_id(0)
        m = j * C + lax.broadcasted_iota(jnp.int32, (1, C), 1)  # [1, C] slots

        if impl == "onehotb":
            # blockwise variant: identical math, but the [W, C] coverage mask
            # and one-hot never materialize — a [CTAB, C] working set per
            # window block with a running max, then CTAB-row matmuls
            # accumulated (each output column still has exactly ONE nonzero
            # across all blocks, so the f32 accumulation stays exact)
            win = jnp.full((1, C), -1, jnp.int32)
            for k in range(wblk):
                i_k = k * ctab + lax.broadcasted_iota(jnp.int32, (ctab, 1), 0)
                q_k = offs_refs[k][:, :] <= m  # [CTAB, C]
                win = jnp.maximum(
                    win, jnp.max(jnp.where(q_k, i_k, -1), axis=0, keepdims=True)
                )
            acc = jnp.zeros((5, C), jnp.float32)
            for k in range(wblk):
                i_k = k * ctab + lax.broadcasted_iota(jnp.int32, (ctab, 1), 0)
                onehot_k = (i_k == win).astype(jnp.float32)  # [CTAB, C]
                acc = acc + jnp.dot(
                    table_refs[k][:, :], onehot_k,
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST,
                )
            fields = acc.astype(jnp.int32)  # [5, C]
        else:
            offs_col = jnp.concatenate([r[:, :] for r in offs_refs], axis=0)  # [W*CTAB, 1]
            cand_t = jnp.concatenate([r[:, :] for r in table_refs], axis=1)  # [5, W*CTAB] f32
            q = offs_col <= m  # [W*CTAB, C]
            i_loc = lax.broadcasted_iota(jnp.int32, (wblk * ctab, 1), 0)

            # covering row = last window row whose segment starts at or before m
            win = jnp.max(jnp.where(q, i_loc, -1), axis=0, keepdims=True)  # [1, C]
            onehot = (i_loc == win).astype(jnp.float32)  # [W*CTAB, C]
            # Exactly one nonzero per output column -> the f32 accumulation is
            # exact; Precision.HIGHEST is REQUIRED for the multiply itself: the
            # MXU's default f32 path truncates operands to bf16 (8-bit mantissa),
            # which silently corrupts any transported integer > 256. HIGHEST runs
            # the exact 3-way bf16 split (hi+mid+lo covers all 24 mantissa bits;
            # each piece times 1.0 is exact; the non-overlapping pieces re-sum
            # exactly in f32), so fields < 2^24 round-trip bit-exactly.
            fields = jnp.dot(
                cand_t, onehot, preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,
            ).astype(jnp.int32)  # [5, C]

        offs_m = fields[0:1, :]
        tnx_m = fields[1:2, :]
        tile0_m = tnx_m >> fbn
        nx_m = jnp.maximum(tnx_m & ((1 << fbn) - 1), 1)
        dbits_m = (fields[2:3, :] << 16) | fields[3:4, :]
        sid_m = fields[4:5, :]
        covered = win >= 0  # uncovered slots (past total) -> garbage, masked outside
        jr = m - offs_m
        tile_m = tile0_m + (jr // nx_m) * tx_n + jr % nx_m
        out_ref[:, :] = jnp.where(
            covered,
            jnp.concatenate([tile_m, sid_m, dbits_m], axis=0),
            0,
        )

    nsub = C // _EXPAND_SUBC
    wsub = _EXPAND_SUBC // ctab + 1  # window blocks per subchunk

    def onehot2_kernel(lo_ref, *refs):
        # sub-chunked onehot: each SUBC-slot subchunk gets its own (wsub *
        # CTAB)-row window (winners for SUBC slots span <= SUBC + 1 rows plus
        # < CTAB alignment slop = exactly wsub blocks at SUBC == CTAB), so
        # the per-slot compare work drops from WBLK*CTAB to wsub*CTAB rows
        # (640 -> 256 at the default geometry) at the same grid size.
        offs_refs = refs[: nsub * wsub]
        table_refs = refs[nsub * wsub : 2 * nsub * wsub]
        out_ref = refs[-1]
        j = pl.program_id(0)
        outs = []
        for i in range(nsub):
            offs_col = jnp.concatenate(
                [offs_refs[i * wsub + k][:, :] for k in range(wsub)], axis=0
            )  # [wsub*CTAB, 1]
            cand_t = jnp.concatenate(
                [table_refs[i * wsub + k][:, :] for k in range(wsub)], axis=1
            )  # [5, wsub*CTAB] f32
            m = (j * C + i * _EXPAND_SUBC
                 + lax.broadcasted_iota(jnp.int32, (1, _EXPAND_SUBC), 1))
            q = offs_col <= m  # [wsub*CTAB, SUBC]
            i_loc = lax.broadcasted_iota(jnp.int32, (wsub * ctab, 1), 0)
            win = jnp.max(jnp.where(q, i_loc, -1), axis=0, keepdims=True)
            onehot = (i_loc == win).astype(jnp.float32)
            # exactness argument as in onehot_kernel (HIGHEST is required)
            fields = jnp.dot(
                cand_t, onehot, preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,
            ).astype(jnp.int32)  # [5, SUBC]
            offs_m = fields[0:1, :]
            tnx_m = fields[1:2, :]
            tile0_m = tnx_m >> fbn
            nx_m = jnp.maximum(tnx_m & ((1 << fbn) - 1), 1)
            dbits_m = (fields[2:3, :] << 16) | fields[3:4, :]
            sid_m = fields[4:5, :]
            jr = m - offs_m
            tile_m = tile0_m + (jr // nx_m) * tx_n + jr % nx_m
            outs.append(jnp.where(
                win >= 0,
                jnp.concatenate([tile_m, sid_m, dbits_m], axis=0),
                0,
            ))
        out_ref[:, :] = jnp.concatenate(outs, axis=1)

    def packed_kernel(lo_ref, *refs):
        table_refs, out_ref = refs[:-1], refs[-1]
        j = pl.program_id(0)
        cand = jnp.concatenate([r[:, :] for r in table_refs], axis=0)  # [W*CTAB, 5]
        offs_cand = cand[:, 0:1]  # [W*CTAB, 1]
        m = j * C + lax.broadcasted_iota(jnp.int32, (1, C), 1)  # [1, C] slots
        q = offs_cand <= m  # [W*CTAB, C]
        i_loc = lax.broadcasted_iota(jnp.int32, (wblk * ctab, 1), 0)

        def sel(packed):  # packed [W*CTAB, 1] -> [1, C] (value of max covering i)
            return jnp.max(jnp.where(q, packed, -1), axis=0, keepdims=True)

        sb = ob  # splat ids and offsets share the (widest) bit budget
        s_tnx = sel((i_loc << (fbt + fbn)) | cand[:, 1:2])
        s_off = sel((i_loc << ob) | offs_cand)
        s_dhi = sel((i_loc << 16) | cand[:, 2:3])
        s_dlo = sel((i_loc << 16) | cand[:, 3:4])
        s_sid = sel((i_loc << sb) | cand[:, 4:5])

        tile0_m = (s_tnx >> fbn) & ((1 << fbt) - 1)
        nx_m = jnp.maximum(s_tnx & ((1 << fbn) - 1), 1)
        offs_m = s_off & ((1 << ob) - 1)
        dbits_m = ((s_dhi & 0xFFFF) << 16) | (s_dlo & 0xFFFF)
        sid_m = s_sid & ((1 << sb) - 1)
        jr = m - offs_m
        tile_m = tile0_m + (jr // nx_m) * tx_n + jr % nx_m
        out_ref[:, :] = jnp.concatenate([tile_m, sid_m, dbits_m], axis=0)

    if impl == "onehot2":
        kernel = onehot2_kernel
        # lo_blk here has one entry PER SUBCHUNK (nsub * j + i)
        in_specs = [
            pl.BlockSpec((ctab, 1), functools.partial(
                lambda i, k, j, lo: (lo[nsub * j + i] + k, 0), i, k))
            for i in range(nsub) for k in range(wsub)
        ] + [
            pl.BlockSpec((5, ctab), functools.partial(
                lambda i, k, j, lo: (0, lo[nsub * j + i] + k), i, k))
            for i in range(nsub) for k in range(wsub)
        ]
        table_t = jnp.stack(
            [offs_c, tnx_c, dhi_c, dlo_c, sid_c], axis=0
        ).astype(jnp.float32)
        operands = ([offs_c[:, None]] * (nsub * wsub)
                    + [table_t] * (nsub * wsub))
    elif impl in ("onehot", "onehotb"):
        kernel = onehot_kernel
        in_specs = [
            pl.BlockSpec((ctab, 1), functools.partial(
                lambda k, j, lo: (lo[j] + k, 0), k))
            for k in range(wblk)
        ] + [
            pl.BlockSpec((5, ctab), functools.partial(
                lambda k, j, lo: (0, lo[j] + k), k))
            for k in range(wblk)
        ]
        # table transposed [5, n_pad] pre-converted to f32 (fields < 2^24,
        # exact) so the matmul needs no in-kernel transpose or convert; offs
        # additionally rides in column orientation for the coverage mask
        table_t = jnp.stack(
            [offs_c, tnx_c, dhi_c, dlo_c, sid_c], axis=0
        ).astype(jnp.float32)
        operands = [offs_c[:, None]] * wblk + [table_t] * wblk
    else:
        kernel = packed_kernel
        in_specs = [
            pl.BlockSpec((ctab, 5), functools.partial(
                lambda k, j, lo: (lo[j] + k, 0), k))
            for k in range(wblk)
        ]
        table = jnp.stack([offs_c, tnx_c, dhi_c, dlo_c, sid_c], axis=1)
        operands = [table] * wblk  # same table through WBLK window mappings

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(emax // C,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((3, C), lambda j, lo: (0, j)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((3, emax), jnp.int32),
        interpret=jax.default_backend() == "cpu",
    )(lo_blk, *operands)


def sort_key_mode(grid: TileGrid) -> str:
    """The instance-sort key mode this grid ACTUALLY uses (a static property):
    "packed20" / "packed16" when the requested packed depth key fits the tile
    count, "exact32" otherwise (the silent-downgrade cases are logged by
    bin_splats and surfaced by diagnostics.render_stats — VERDICT r4 weak #5;
    the reference prints its sort-path choice at init,
    src/splatrenderer.cpp:86-103)."""
    if grid.depth_bits == 20 and grid.num_tiles < (1 << 11):
        return "packed20"
    if grid.depth_bits == 16 and grid.num_tiles < (1 << 15):
        return "packed16"
    return "exact32"


def _bincount_by_sort(ids, num_bins: int):
    """Exact bincount of int ids in [0, num_bins] via sort + searchsorted.

    XLA scatter-add with colliding indices serializes on TPU; an unstable
    1-key sort streams at HBM rate and the per-bin boundaries fall out of a
    tiny searchsorted (num_bins queries over the sorted array). Values equal
    to ``num_bins`` act as an ignored overflow/sentinel bucket.
    """
    sorted_ids = lax.sort(ids, is_stable=False)
    edges = jnp.searchsorted(sorted_ids, jnp.arange(num_bins + 1, dtype=jnp.int32))
    return edges[1:] - edges[:-1]


def _tile_rects(mean2d, extent, grid: TileGrid, row_offset=None):
    """Per-splat covered tile rectangles -> (x0, r0, nx, ny, cnt).

    The AABB-vs-tile-grid overlap that replaces the reference's geometry-
    shader quad coverage (ref: shader/splat_geom.glsl:83-106): column range
    [x0, x0+nx), row range [r0, r0+ny), cnt = nx*ny (0 = culled).

    With grid.row_stride = S > 1, only tile rows r with r % S == row_offset
    (this chip's ownership; a traced scalar) count: ny becomes the OWNED row
    count inside the rect, r0 the first owned full-grid row, and the rect's
    j-th tile is tile0 + (j // nx) * (S * tiles_x) + j % nx (the row step
    every consumer applies via grid.row_stride)."""
    ts, tx_n, ty_n, h = grid.tile_size, grid.tiles_x, grid.tiles_y, grid.height
    mx, my = mean2d[:, 0], mean2d[:, 1]
    extent = jnp.asarray(extent)
    if extent.ndim == 1:
        rx = ry = extent
    else:
        rx, ry = extent[:, 0], extent[:, 1]
    valid = (rx > 0.0) & (ry > 0.0)
    x0 = jnp.clip(jnp.floor((mx - rx) / ts), 0, tx_n).astype(jnp.int32)
    x1 = jnp.clip(jnp.ceil((mx + rx) / ts), 0, tx_n).astype(jnp.int32)
    # gl y-up -> image rows: row = height - y
    r0 = jnp.clip(jnp.floor((h - my - ry) / ts), 0, ty_n).astype(jnp.int32)
    r1 = jnp.clip(jnp.ceil((h - my + ry) / ts), 0, ty_n).astype(jnp.int32)
    nx = jnp.maximum(x1 - x0, 0)
    s = grid.row_stride
    if s > 1:
        assert row_offset is not None, "row_stride > 1 needs a row_offset"
        d = jnp.asarray(row_offset, jnp.int32)
        ty_owned = ty_n // s
        # owned rows are r = d + k*s; the rect [r0, r1) covers owned indices
        # [ceil((r0-d)/s), ceil((r1-d)/s)). r0 - d >= -(s-1), so the +s-1
        # floor-div form never sees a negative numerator.
        k0 = jnp.clip((r0 - d + s - 1) // s, 0, ty_owned)
        k1 = jnp.clip((r1 - d + s - 1) // s, 0, ty_owned)
        ny = jnp.maximum(k1 - k0, 0)
        r0 = d + k0 * s  # first OWNED full-grid row
    else:
        ny = jnp.maximum(r1 - r0, 0)
    cnt = jnp.where(valid, nx * ny, 0).astype(jnp.int32)
    return x0, r0, nx, ny, cnt


def instance_demand(mean2d, extent, grid: TileGrid, row_offset=None):
    """Total tile-instance count this view would enumerate -> scalar int32.

    The cheap pre-pass behind capacity auto-tuning: measure the demand once,
    then size ``max_instance_mult`` with a small headroom instead of paying
    for worst-case capacity in every sort/gather/kernel of every step (the
    TPU-native analog of the reference's radix-workgroup auto-tuner,
    ref: src/app.cpp:843-874). With grid.row_stride > 1, the demand of the
    ``row_offset`` chip's interleaved tile rows."""
    _, _, _, _, cnt = _tile_rects(mean2d, extent, grid, row_offset=row_offset)
    return jnp.sum(cnt)  # int32: fine to ~2.1e9 instances


def bin_splats(mean2d, extent, grid: TileGrid, depth=None, row_offset=None):
    """Build the (tile, depth)-ordered instance buffer and flat block work-list.

    Args (all non-differentiable index plumbing; callers stop_gradient):
      mean2d [N, 2] screen centers (gl convention, +y up); front-to-back order
        REQUIRED iff ``depth`` is None
      extent [N, 2] tight AABB half-extents (rx, ry) in px, or [N] isotropic
        radius (both 0 = culled)
      depth [N] view depth per splat (any splat order): rides the tile sort as
        a second key so callers need not pre-sort; ties break by descending
        splat index (reference parity, see module docstring)

    Returns dict:
      inst_splat [mcap] int32 — splat index per aligned instance slot (N = null)
      seg_offs/seg_cnt [N] — per-splat enumeration segments (for the backward
        transpose in ops/composite.py: grads sorted by inst_splat group each
        splat's instances into exactly [seg_offs, seg_offs + seg_cnt))
      block_tile [NB] int32 — owning tile of each B-block
      block_first [NB] int32 — 1 iff block is the first of its tile
      block_live [NB] int32 — 0 for blocks past the last real tile (skipped)
      block_meta [NB] int32 — (tile << 2 | first << 1 | live) packed for the
        kernels' single scalar-prefetch operand
      tile_ok [T] bool — tile has at least one instance
      tile_count [T] int32 — true instance count per tile
      num_culled_instances [] int32 — instances dropped by capacity overflow

    With grid.row_stride = S > 1, ``row_offset`` (traced, this chip's
    lax.axis_index) selects the owned tile rows r % S == row_offset; tile
    ids stay FULL-grid (the composite kernels' pixel-coordinate mapping is
    unchanged) and only owned tiles get alignment padding.
    """
    n = mean2d.shape[0]
    ts, tx_n, ty_n = grid.tile_size, grid.tiles_x, grid.tiles_y
    num_tiles, b, emax, mcap = grid.num_tiles, grid.block, grid.emax, grid.mcap
    h = grid.height
    stride = grid.row_stride
    row_step = tx_n * stride  # tile-id step between a rect's owned rows
    owned_tiles = num_tiles // stride
    pad_cap = owned_tiles * b
    assert mcap == emax + pad_cap, (mcap, emax, pad_cap)
    if stride > 1:
        assert row_offset is not None, "row_stride > 1 needs a row_offset"
    d_off = jnp.asarray(row_offset if row_offset is not None else 0, jnp.int32)

    x0, r0, nx, ny, cnt_raw = _tile_rects(mean2d, extent, grid,
                                          row_offset=row_offset)

    # overflow: drop WHOLE splats past the capacity so every kept splat's rect
    # stays complete and the histogram/padding stay exact. With depth given,
    # drop the FARTHEST splats (the least visible — matching what input-order
    # truncation does for pre-sorted callers); the depth-threshold search runs
    # only when an overflow actually occurs (lax.cond).
    offs_raw = jnp.cumsum(cnt_raw) - cnt_raw
    total_raw = offs_raw[-1] + cnt_raw[-1] if n > 0 else jnp.int32(0)
    if depth is None or n == 0:
        keep = offs_raw + cnt_raw <= emax
    else:
        depth_f = jnp.asarray(depth, jnp.float32)

        def _drop_farthest(_):
            d_sorted, c_sorted = lax.sort((depth_f, cnt_raw), num_keys=1)
            cum = jnp.cumsum(c_sorted)
            # last depth-sorted index whose cumulative instance count fits
            k = jnp.searchsorted(cum, jnp.int32(emax), side="right")
            thr = jnp.where(
                k > 0, d_sorted[jnp.clip(k - 1, 0, n - 1)], -jnp.inf
            )
            keep_lt = depth_f < thr  # total of these is <= cum[k-1] <= emax
            used = jnp.sum(jnp.where(keep_lt, cnt_raw, 0))
            # splats exactly at the threshold depth: admit greedily in input
            # order while capacity remains (exact under depth ties)
            at_thr = depth_f == thr
            c_at = jnp.where(at_thr, cnt_raw, 0)
            fits = used + jnp.cumsum(c_at) <= emax
            return keep_lt | (at_thr & fits)

        keep = lax.cond(
            total_raw > emax,
            _drop_farthest,
            lambda _: jnp.ones((n,), bool),
            operand=None,
        )
    cnt = jnp.where(keep, cnt_raw, 0)
    offs = jnp.cumsum(cnt) - cnt  # exclusive
    total = offs[-1] + cnt[-1] if n > 0 else jnp.int32(0)
    overflow = (cnt_raw.sum() - total).astype(jnp.int32)
    kept = keep & (cnt > 0)

    # ---- enumeration slots -> (splat, tile-within-rect) ----
    # Forward-fill the per-splat fields with packed 1-D scatter+cummax columns:
    # each field rides in the low bits of a word whose high bits are strictly
    # increasing over kept splats (the segment start / the splat id), so the
    # running max at slot m is the word of the last splat whose segment starts
    # at or before m. Two 1-D scatters + two 1-D cummaxes (~8.5 ms at 2M slots
    # on v5e) beat one scatter + one [emax, 4] row gather (~17 ms): random
    # gathers cost ~5-9 ns per index while 1-D scans stream near HBM rate.
    # (An [emax, 4] row-wise cummax fill was also tried and is far SLOWER —
    # narrow trailing dims waste 124/128 lanes; 1-D columns are the fast shape.
    # See tools/microbench_bin2.py.)
    m = jnp.arange(emax, dtype=jnp.int32)
    first_slot = jnp.where(kept, offs, emax)  # emax = dropped
    fbt = max(int(num_tiles).bit_length(), 1)  # bits for tile0
    fbn = max(int(tx_n).bit_length(), 1)  # bits for nx
    packable = (emax << fbt) < 2**32 and (n << fbn) < 2**31
    valid_m = m < total
    # Pallas expand-kernel path (see _expand_fill_pallas). "onehot": fields
    # ride a one-hot f32 matmul, so each integer field must be exact in f32
    # (< 2^24; depth is pre-split in 16-bit halves and always fits).
    # "packed": every (candidate_index << bits | field) word must fit int31.
    ob = max(emax.bit_length(), max(n, 1).bit_length(), 1)
    sel = grid.expand_impl if grid.expand_impl != "auto" else _EXPAND_IMPL
    prefs = _EXPAND_ORDER if sel == "auto" else (sel,)
    impl = next(
        (i for i in prefs if _expand_impl_ok(i, emax, n, num_tiles, fbt, fbn, ob)),
        None,
    )
    kernelable = depth is not None and emax % _EXPAND_C == 0 and impl is not None
    dep_enum = None  # per-slot sortable depth bits (kernel path only)
    if kernelable:
        C, ctab, wblk = _EXPAND_C, _EXPAND_CTAB, _EXPAND_WBLK
        n_pad = (-(-n // ctab) + wblk) * ctab
        sent = jnp.int32((1 << ob) - 1)  # offs sentinel: never covers a slot
        dbits = lax.bitcast_convert_type(
            jnp.maximum(jnp.asarray(depth, jnp.float32), 0.0), jnp.int32
        )  # non-negative f32 bits sort like the floats
        # The expand kernel's candidate window needs the covering rows for any
        # slot chunk to span few enough table rows. Compacting kept rows to a
        # prefix (ONE stable 1-key sort over all 5 columns) guarantees it —
        # but the sort is ~3 ms/M splats, and it is usually unnecessary:
        # culled rows can instead stay IN PLACE as inert rows (sentinel offs:
        # `offs_col <= m` is false for every slot, so they never win and
        # their fields are never selected), as long as each chunk's winner
        # span over the UNCOMPACTED table still fits the window. That span is
        # exactly computable up front — winners for chunk j live in
        # [lo_j, hi_j) = [last row with offs <= chunk start, first row with
        # offs > chunk end) over the PLAIN (nondecreasing) offs — so the
        # partition runs only when the exact check fails (dense culling;
        # lax.cond executes only the taken branch on TPU). Nothing-culled
        # views fit trivially (the round-3 fast path); few-culled views
        # (e.g. a few thousand edge-clipped splats on the bench views) fit
        # in the windows' typical slack (~1.7 slots/row means typical spans
        # run well under the worst-case bound the window is sized for).
        step = _EXPAND_SUBC if impl == "onehot2" else C
        wneed = (_EXPAND_SUBC // ctab + 1) if impl == "onehot2" else wblk
        chunk_starts = jnp.arange(emax // step, dtype=jnp.int32) * step
        nk = (~kept).astype(jnp.int32)
        # ONE searchsorted serves both the span check and the in-place
        # branch's window placement: lo_j = last row with offs <= chunk_j
        # start (= the covering kept row — culled rows after it carry the
        # NEXT kept row's offs, which exceeds the start). Winners for chunk
        # j all precede lo_{j+1} + 1 (rows past lo_{j+1} have offs beyond
        # chunk j's last slot), so the exact-span hi searchsorted is
        # replaced by this one-array bound (conservative only by culled
        # rows whose offs equals the next chunk start).
        lo_u = jnp.clip(
            jnp.searchsorted(offs, chunk_starts, side="right").astype(jnp.int32) - 1,
            0, None,
        )
        lo_next = jnp.concatenate(
            [lo_u[1:], jnp.full((1,), max(n - 1, 0), jnp.int32)]
        )
        fits = jnp.all(lo_next + 1 - (lo_u - lo_u % ctab) <= wneed * ctab)
        cols = (
            jnp.where(kept, offs, sent),
            (r0 * tx_n + x0) << fbn | jnp.maximum(nx, 1),
            dbits,
            jnp.arange(n, dtype=jnp.int32),
        )

        def _compact(c):
            # kept rows to a prefix; window placement re-searches the sorted
            # offs column (the precomputed lo_u indexes UNCOMPACTED rows)
            res = lax.sort((nk,) + c, num_keys=1, is_stable=True)[1:]
            lo_c = jnp.clip(
                jnp.searchsorted(
                    res[0], chunk_starts, side="right"
                ).astype(jnp.int32) - 1,
                0, None,
            )
            return res + (lo_c,)

        def _in_place(c):
            # culled rows stay put as inert sentinel rows (`offs_col <= m`
            # is false for every slot: they never win, their fields are
            # never selected); lo_u already points at the covering rows
            return c + (lo_u,)

        cmode = (grid.compact_mode if grid.compact_mode != "auto"
                 else _COMPACT_MODE)
        if cmode == "always":
            need_compact = jnp.any(nk > 0)
        elif cmode == "never":
            need_compact = jnp.bool_(False)
        else:
            need_compact = jnp.any(nk > 0) & jnp.logical_not(fits)
        offs_c, tnx_c, dbits_c, sid_c, lo = lax.cond(
            need_compact, _compact, _in_place, cols,
        )
        pad_rows = n_pad - n
        offs_c = jnp.concatenate([offs_c, jnp.full((pad_rows,), sent, jnp.int32)])
        zpad = jnp.zeros((pad_rows,), jnp.int32)
        tnx_c = jnp.concatenate([tnx_c, zpad])
        dbits_c = jnp.concatenate([dbits_c, zpad])
        dhi_c = dbits_c >> 16
        dlo_c = dbits_c & 0xFFFF
        sid_c = jnp.concatenate([sid_c, zpad])
        lo = jnp.clip(lo, 0, n_pad - 1)
        lo_blk = jnp.clip(lo // ctab, 0, n_pad // ctab - wneed)
        out3 = _expand_fill_pallas(
            offs_c, tnx_c, dhi_c, dlo_c, sid_c, lo_blk, grid, fbt, fbn, ob,
            impl=impl,
        )
        tile, s, dep_enum = out3[0], out3[1], out3[2]
    elif packable:
        tile0 = r0 * tx_n + x0  # first covered tile of the rect, < num_tiles
        col_a = (first_slot.astype(jnp.uint32) << fbt) | tile0.astype(jnp.uint32)
        col_b = (jnp.arange(n, dtype=jnp.int32) << fbn) | jnp.maximum(nx, 1)
        fill_a = lax.cummax(
            jnp.zeros((emax,), jnp.uint32).at[first_slot].set(
                col_a, mode="drop", unique_indices=True
            ),
            axis=0,
        )
        fill_b = lax.cummax(
            jnp.zeros((emax,), jnp.int32).at[first_slot].set(
                col_b, mode="drop", unique_indices=True
            ),
            axis=0,
        )
        g_offs = (fill_a >> fbt).astype(jnp.int32)
        g_tile0 = (fill_a & ((1 << fbt) - 1)).astype(jnp.int32)
        s = fill_b >> fbn
        g_nx = jnp.maximum(fill_b & ((1 << fbn) - 1), 1)
        j = m - g_offs
        tile = g_tile0 + (j // g_nx) * row_step + j % g_nx
    else:
        # fallback: scatter splat ids, cummax, one [N, 4] row gather of the
        # rect table (packing bits would overflow at this emax/tile count)
        marks = jnp.full((emax,), -1, jnp.int32).at[first_slot].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop", unique_indices=True
        )
        s = jnp.clip(lax.cummax(marks, axis=0), 0, max(n - 1, 0)).astype(jnp.int32)
        table = jnp.stack([offs, x0, r0, jnp.maximum(nx, 1)], axis=1)  # [N, 4]
        g = jnp.take(table, s, axis=0)  # [emax, 4]
        j = m - g[:, 0]
        tile = (g[:, 2] * tx_n + g[:, 1]) + (j // g[:, 3]) * row_step + j % g[:, 3]
    tile = jnp.where(valid_m, tile, num_tiles)  # sentinel sorts to the end
    s = jnp.where(valid_m, s, n)

    # exact per-tile counts (truncation-aware) -> exact alignment padding.
    # Bincount of the enumerated tile ids by sort (the sentinel bucket is
    # dropped); replaces a corner-delta rect histogram whose two 2N-id sorts
    # cost ~4x this one emax sort.
    tile_count = _bincount_by_sort(tile, num_tiles)

    # ---- alignment padding entries, exact per OWNED tile ----
    # [T_owned, b] candidates; column < pad_t are real pads of that tile
    if stride == 1:
        pad_t = (-tile_count) % b  # in [0, b)
        pad_col = lax.broadcasted_iota(jnp.int32, (num_tiles, b), 1)
        pad_tile_grid = lax.broadcasted_iota(jnp.int32, (num_tiles, b), 0)
    else:
        # owned tile index i -> full-grid tile id (row i//tx * S + d) * tx + col
        cnt_owned = lax.dynamic_index_in_dim(
            tile_count.reshape(ty_n // stride, stride, tx_n), d_off, axis=1,
            keepdims=False,
        ).reshape(-1)  # [owned_tiles], row-major over owned rows
        pad_t = (-cnt_owned) % b
        pad_col = lax.broadcasted_iota(jnp.int32, (owned_tiles, b), 1)
        oidx = lax.broadcasted_iota(jnp.int32, (owned_tiles, b), 0)
        pad_tile_grid = ((oidx // tx_n) * stride + d_off) * tx_n + oidx % tx_n
    pad_tile = jnp.where(pad_col < pad_t[:, None], pad_tile_grid, num_tiles).reshape(-1)

    # ---- ONE sort by tile (+ depth): pads land at each tile's end (+inf
    # depth / after all real entries in input order); sentinels land at the
    # very end. Every tile segment is now exactly ceil(count/b)*b long, so
    # segment starts are b-aligned and the sorted order IS the block-aligned
    # instance buffer.
    # No backward-only payload rides this sort: the backward's transpose
    # re-keys on inst_splat itself (splat-grouped order has the same
    # [seg_offs, seg_offs + seg_cnt) segment structure as enumeration order,
    # and segment SUMS are order-independent — see ops/composite._cff_bwd),
    # so the old m_pos enumeration-id operand (1 of 4 at f32 depth, 1 of 3
    # at depth16) is gone from the trainer profile too.
    tile_all = jnp.concatenate([tile, pad_tile])
    s_all = jnp.concatenate([s, jnp.full((pad_cap,), n, jnp.int32)])
    m_all = (jnp.concatenate([m, jnp.full((pad_cap,), emax, jnp.int32)])
             if _EMIT_M_POS else None)
    m_pos = None
    if depth is not None:
        # per-instance depth + descending-splat-index tie-break as extra sort
        # keys; -s doubles as the inst_splat payload (keys are fully unique —
        # one instance per (splat, tile) — so the sort may be unstable).
        # Depth keys are the f32 BITS as int32 (monotone for non-negative
        # floats): full precision, and the kernel path produces them directly.
        imax = jnp.int32(2**31 - 1)
        if dep_enum is None:  # non-kernel paths: one per-slot gather
            depth_bits = lax.bitcast_convert_type(
                jnp.maximum(jnp.asarray(depth, jnp.float32), 0.0), jnp.int32
            )
            dep_enum = jnp.take(
                jnp.concatenate([depth_bits, jnp.full((1,), imax, jnp.int32)]), s
            )
        # STRICT < gates (sort_key_mode): the sentinel/pad key is
        # (num_tiles << bits) | mask, which must stay <= INT32_MAX — at
        # exactly 2048 tiles the 20-bit sentinel would wrap the int32 sign
        # bit and sort BEFORE every real instance (silent corruption).
        # packed20: (tile << 20 | top-20 f32 depth bits): 31-bit key with
        # 12 explicit mantissa bits of depth (relative step ~2.4e-4); real
        # depth codes are <= 0x7F800000 >> 11 = 0xFF000 < 0xFFFFF, so the
        # pad/sentinel code sorts strictly after every real instance.
        # packed16: (tile << 16 | bf16 depth), the opt-in A/B point.
        mode = sort_key_mode(grid)
        packed_bits = {"packed20": 20, "packed16": 16, "exact32": 0}[mode]
        if grid.depth_bits != 32 and packed_bits == 0:
            # a requested production default silently downgrading would
            # otherwise be invisible (VERDICT r4 weak #5); trace-time notice,
            # once per compiled config
            _log.warning(
                "depth_bits=%d requested but num_tiles=%d exceeds the "
                "packed-key budget (%s); using the exact 3-operand sort",
                grid.depth_bits, num_tiles,
                "< 2048" if grid.depth_bits == 20 else "< 32768")
        if packed_bits:
            b_ = packed_bits
            # 16: bits [31:16] (the round-3 bf16 semantic, unchanged);
            # 20: bits [30:11] (sign bit is always 0 for nonneg depths)
            shift = 16 if b_ == 16 else 11
            sentd = (1 << b_) - 1
            key = (tile << b_) | jnp.where(
                valid_m, (dep_enum >> shift) & sentd, sentd
            )
            key_all = jnp.concatenate([key, (pad_tile << b_) | sentd])
            ops = (key_all, -s_all) + (() if m_all is None else (m_all,))
            res = lax.sort(ops, num_keys=2, is_stable=False)
            tile_sorted, inst_splat = res[0] >> b_, -res[1]
            m_pos = res[2] if m_all is not None else None
        else:
            dep_all = jnp.concatenate(
                [jnp.where(valid_m, dep_enum, imax),
                 jnp.full((pad_cap,), imax, jnp.int32)]
            )
            ops = (tile_all, dep_all, -s_all) + (() if m_all is None else (m_all,))
            res = lax.sort(ops, num_keys=3, is_stable=False)
            tile_sorted, inst_splat = res[0], -res[2]
            m_pos = res[3] if m_all is not None else None
    else:
        # input pre-sorted front-to-back: enum order is depth order; a stable
        # tile sort preserves it
        ops = (tile_all, s_all) + (() if m_all is None else (m_all,))
        res = lax.sort(ops, num_keys=1, is_stable=True)
        tile_sorted, inst_splat = res[0], res[1]
        m_pos = res[2] if m_all is not None else None

    # ---- block metadata: free strided slices of the sorted tile ids ----
    nb = grid.num_blocks
    bt = tile_sorted[::b]  # [NB] tile of each block's first row
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), tile_sorted[b - 1 :: b][:-1]])
    block_live_mask = bt < num_tiles
    block_first = (block_live_mask & (bt != prev)).astype(jnp.int32)
    block_live = block_live_mask.astype(jnp.int32)
    # dead blocks (the sentinel suffix) revisit the tile of the LAST live
    # block: they run no compute and the final write-back re-writes that
    # tile's already-final output, so they can never clobber another tile
    # (same guarantee the pre-padding design had). bt is nondecreasing, so
    # the last live block is just before the first sentinel block.
    idx_last = jnp.clip(jnp.searchsorted(bt, jnp.int32(num_tiles)) - 1, 0, nb - 1)
    last_tile = jnp.minimum(jnp.take(bt, idx_last), num_tiles - 1)
    block_tile = jnp.where(block_live_mask, bt, last_tile).astype(jnp.int32)

    tile_ok = tile_count > 0

    block_meta = (block_tile << 2) | (block_first << 1) | block_live

    bins = {
        "inst_splat": inst_splat,
        "block_meta": block_meta,
        "seg_offs": offs,
        "seg_cnt": cnt,
        "block_tile": block_tile,
        "block_first": block_first,
        "block_live": block_live,
        "tile_ok": tile_ok,
        "tile_count": tile_count,
        "num_culled_instances": overflow,
    }
    if m_pos is not None:
        bins["m_pos"] = m_pos
    return bins
