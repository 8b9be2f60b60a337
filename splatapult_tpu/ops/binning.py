"""Tile binning: splat -> (tile, depth)-ordered instance lists, all static shapes.

This replaces the reference's per-frame GPU sort machinery — the presort
compaction with an atomic counter (ref: shader/presort_compute.glsl:50-55) and
the full 32-bit radix sort of every visible splat (ref: src/splatrenderer.cpp:
153-312, shader/multi_radixsort*.glsl) — with a TPU/XLA-native formulation:

1. Splats arrive already globally sorted front-to-back (one length-N sort in
   render.prepare_splats). Binning only has to group duplicates by tile while
   *preserving* that order, so a single stable sort by tile id suffices — the
   depth bits of the reference's radix key are unnecessary.
2. Dynamic instance counts are handled with the searchsorted-enumeration trick:
   a static-size instance buffer of capacity EMAX is mapped back to (splat,
   tile-within-rect) pairs by binary search over the exclusive-cumsum offsets.
   No atomics, no data-dependent shapes, no host readback (the reference stalls
   the pipe every frame reading its counter, src/splatrenderer.cpp:196-204).
3. Each tile's instance list is padded to a multiple of the compositing block
   size B with *null instances* (splat index N -> an all-zero feature row).
   Every B-block therefore belongs to exactly one tile, which removes all
   masking from the composite kernels and gives the backward kernel exclusive
   ownership of its output block. Overflow beyond capacity is counted and
   reported, never silently ignored.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from jax import lax


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
               max_instance_mult=6, alpha_cutoff=1.0 / 256.0, early_stop_eps=0.0):
        assert block & (block - 1) == 0, "block must be a power of two"
        emax = max(block, ((max_instance_mult * max(num_splats, 1) + block - 1) // block) * block)
        tiles = (-(-width // tile_size)) * (-(-height // tile_size))
        mcap = emax + tiles * block  # worst-case alignment padding: < block per tile
        return TileGrid(
            width=width, height=height, tile_size=tile_size, block=block,
            emax=emax, mcap=mcap, alpha_cutoff=alpha_cutoff,
            early_stop_eps=early_stop_eps,
        )


def bin_splats(mean2d, extent, grid: TileGrid):
    """Build the (tile, depth)-ordered instance buffer and flat block work-list.

    Args (all non-differentiable index plumbing; callers stop_gradient):
      mean2d [N, 2] screen centers (gl convention, +y up), front-to-back order
      extent [N, 2] tight AABB half-extents (rx, ry) in px, or [N] isotropic
        radius (both 0 = culled)

    Returns dict:
      inst_splat [mcap] int32 — splat index per instance slot (N = null)
      block_tile [NB] int32 — owning tile of each B-block
      block_first [NB] int32 — 1 iff block is the first of its tile
      tile_ok [T] bool — tile was visited by the kernel (has >= 1 block that ran)
      tile_count [T] int32 — true instance count per tile
      num_culled_instances [] int32 — instances dropped by capacity overflow
    """
    n = mean2d.shape[0]
    ts, tx_n, ty_n = grid.tile_size, grid.tiles_x, grid.tiles_y
    num_tiles, b, emax, mcap, nb = grid.num_tiles, grid.block, grid.emax, grid.mcap, grid.num_blocks
    h = grid.height

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
    ny = jnp.maximum(r1 - r0, 0)
    cnt = jnp.where(valid, nx * ny, 0).astype(jnp.int32)

    offs = jnp.cumsum(cnt) - cnt  # exclusive
    total = offs[-1] + cnt[-1] if n > 0 else jnp.int32(0)

    # enumerate instance slots -> (splat, tile-within-rect). Instead of a
    # binary search of emax queries into offs (XLA's searchsorted 'scan'
    # method costs ~45ms for 400k queries on TPU), scatter each nonzero-count
    # splat's index at its first instance slot and forward-fill with a cummax:
    # O(emax) streaming work, ~100x faster.
    m = jnp.arange(emax, dtype=jnp.int32)
    marks = jnp.full((emax,), -1, jnp.int32).at[offs].max(
        jnp.where(cnt > 0, jnp.arange(n, dtype=jnp.int32), -1), mode="drop"
    )
    s = jnp.clip(lax.cummax(marks, axis=0), 0, max(n - 1, 0)).astype(jnp.int32)
    # one packed row-gather for all per-splat fields (four separate 1-D
    # gathers cost ~4.5ms each on TPU; a single [emax, 4] row gather is <1ms)
    table = jnp.stack([offs, x0, r0, jnp.maximum(nx, 1)], axis=1)  # [N, 4]
    g = jnp.take(table, s, axis=0)  # [emax, 4]
    j = m - g[:, 0]
    valid_m = m < total
    tile = (g[:, 2] + j // g[:, 3]) * tx_n + (g[:, 1] + j % g[:, 3])
    tile = jnp.where(valid_m, tile, num_tiles)  # sentinel sorts to the end

    # stable sort by tile preserves global front-to-back depth order per tile;
    # m rides along so the slot -> enumeration inverse map (needed by the
    # gather transpose in the backward pass) falls out for free
    tile_sorted, splat_sorted, m_sorted = lax.sort((tile, s, m), num_keys=1, is_stable=True)

    bounds = jnp.searchsorted(tile_sorted, jnp.arange(num_tiles + 1, dtype=jnp.int32))
    tile_count = (bounds[1:] - bounds[:-1]).astype(jnp.int32)
    aligned = ((tile_count + b - 1) // b) * b
    astart = jnp.cumsum(aligned) - aligned
    total_aligned = astart[-1] + aligned[-1] if num_tiles > 0 else jnp.int32(0)

    # within-tile rank from position in the sorted array: the index of each
    # run's first element, forward-filled (again cummax instead of a 50ms
    # self-searchsorted)
    # slot = astart[tile] + within-tile-rank, computed without any per-instance
    # gather: at each tile run's first sorted position (bounds[t]) scatter the
    # constant (astart[t] - bounds[t]) and forward-fill — it is nondecreasing
    # over tiles (cumulative alignment padding), so cummax fills runs exactly.
    pos = jnp.arange(emax, dtype=jnp.int32)
    shift_at_start = jnp.zeros((emax,), jnp.int32).at[bounds[:num_tiles]].max(
        jnp.where(tile_count > 0, astart - bounds[:num_tiles], 0), mode="drop"
    )
    slot_shift = lax.cummax(shift_at_start, axis=0)
    valid_sorted = tile_sorted < num_tiles
    slot = jnp.where(valid_sorted, pos + slot_shift, mcap)  # out of range -> dropped
    inst_splat = jnp.full((mcap,), n, jnp.int32).at[slot].set(splat_sorted, mode="drop")
    # enumeration index m -> aligned slot (mcap = dropped/invalid); the
    # backward gather-transpose walks this to turn per-slot gradients into
    # contiguous per-splat segments (see ops/composite.composite_from_feats)
    slot_of_enum = jnp.full((emax,), mcap, jnp.int32).at[m_sorted].set(
        jnp.minimum(slot, mcap), mode="drop"
    )

    # flat block work-list
    bcount = aligned // b
    boffs = jnp.cumsum(bcount) - bcount
    total_blocks = jnp.minimum(boffs[-1] + bcount[-1], nb) if num_tiles > 0 else jnp.int32(0)
    bb = jnp.arange(nb, dtype=jnp.int32)
    tb = jnp.clip(jnp.searchsorted(boffs, bb, side="right") - 1, 0, num_tiles - 1).astype(jnp.int32)
    valid_b = bb < total_blocks
    # padding blocks revisit the tile of the last real block with null
    # instances (no-op), so they never clobber another tile's output
    last_tile = jnp.where(
        total_blocks > 0, jnp.take(tb, jnp.clip(total_blocks - 1, 0, nb - 1)), 0
    )
    block_tile = jnp.where(valid_b, tb, last_tile).astype(jnp.int32)
    block_first = (valid_b & (bb == jnp.take(boffs, tb))).astype(jnp.int32)
    block_live = valid_b.astype(jnp.int32)  # kernels skip compute on padding blocks

    # a tile's output is defined iff its first block actually ran
    tile_ok = (tile_count > 0) & (boffs < total_blocks)

    overflow = jnp.maximum(total - emax, 0) + jnp.maximum(total_aligned - mcap, 0)
    return {
        "inst_splat": inst_splat,
        "slot_of_enum": slot_of_enum,
        "seg_offs": offs,
        "seg_cnt": cnt,
        "block_tile": block_tile,
        "block_first": block_first,
        "block_live": block_live,
        "tile_ok": tile_ok,
        "tile_count": tile_count,
        "num_culled_instances": overflow.astype(jnp.int32),
    }
