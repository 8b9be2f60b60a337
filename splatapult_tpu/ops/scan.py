"""Pallas TPU single-pass prefix sum over tall skinny float32 arrays.

XLA lowers a large `jnp.cumsum(x, axis=0)` to a log-depth pass structure:
at [4M, 16] f32 that is ~22 full HBM sweeps (~29 ms measured on v5e). The
composite backward's gather-transpose (ops/composite.py) needs exactly one
such cumsum per step, so it is worth one sequential-grid Pallas kernel that
does it in a single HBM sweep (~2 ms): TPU grids execute in order, so a
running carry in VMEM scratch is legal.

Layout trick: a [M, 16] array is lane-starved (16 of 128 lanes). The kernel
views it as [M/8, 128] super-rows (free row-major reshape: 8 consecutive
rows side by side in lane groups of 16) and runs a two-level scan:
  1. fine: inclusive prefix across the 8 lane groups inside each super-row
     (3 masked lane-roll+adds);
  2. coarse: exclusive prefix over super-rows of the per-super-row totals
     (lane group 7 after step 1) as one lower-triangular MXU matmul, plus a
     carried block offset.
The (i, j) entry of the result view is then cumsum-through-row (8*i + j).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIDTH = 16
GROUPS = 128 // WIDTH  # 8 rows per super-row
SUPER_BLOCK = 512  # super-rows per grid step (4096 original rows)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _tile16(x_last16):
    """[B, 16] -> [B, 128] by repeating the 16 lanes into all 8 groups."""
    return jnp.concatenate([x_last16] * GROUPS, axis=1)


def _kernel(x_ref, out_ref, carry):
    j = pl.program_id(0)
    b = x_ref.shape[0]

    @pl.when(j == 0)
    def _():
        carry[0:1, :] = jnp.zeros((1, 128), jnp.float32)

    x = x_ref[:, :]  # [B, 128]
    # fine: inclusive prefix over the 8 lane groups (step sizes 16, 32, 64).
    # jnp.roll along lanes wraps; mask the wrapped part to zero.
    col = lax.broadcasted_iota(jnp.int32, x.shape, 1)
    fine = x
    for shift in (16, 32, 64):
        rolled = jnp.roll(fine, shift, axis=1)
        fine = fine + jnp.where(col >= shift, rolled, 0.0)
    # coarse: strict-lower-triangular matmul over super-row totals
    totals = _tile16(fine[:, 112:128])  # [B, 128], same total in every group
    r = lax.broadcasted_iota(jnp.int32, (b, b), 0)
    c = lax.broadcasted_iota(jnp.int32, (b, b), 1)
    tri = (c < r).astype(jnp.float32)
    coarse = jnp.dot(tri, totals, preferred_element_type=jnp.float32)
    out = fine + coarse + carry[0:1, :]
    out_ref[:, :] = out
    carry[0:1, :] = _tile16(out[b - 1 : b, 112:128])


def prefix_sum_rows(x: jax.Array) -> jax.Array:
    """Inclusive cumulative sum along axis 0 of a [M, 16] float32 array.

    M must be a multiple of 4096 (ops/binning.py rounds the enumeration
    capacity up accordingly). One HBM read + one write total.
    """
    m, w = x.shape
    assert w == WIDTH, (m, w)
    rows = GROUPS * SUPER_BLOCK
    if m % rows != 0:
        # ops/binning.py aligns production capacities; pad the odd cases
        pad = rows - m % rows
        return prefix_sum_rows(jnp.pad(x, ((0, pad), (0, 0))))[:m]
    xv = x.reshape(m // GROUPS, 128)
    out = pl.pallas_call(
        _kernel,
        grid=(m // rows,),
        in_specs=[pl.BlockSpec((SUPER_BLOCK, 128), lambda j: (j, 0))],
        out_specs=pl.BlockSpec((SUPER_BLOCK, 128), lambda j: (j, 0)),
        out_shape=jax.ShapeDtypeStruct(xv.shape, jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        interpret=_interpret(),
    )(xv)
    return out.reshape(m, w)


def gather_prefix_rows(cs: jax.Array, pos: jax.Array) -> jax.Array:
    """rows[i] = cs[pos[i] - 1] with cs from prefix_sum_rows; pos==0 -> zeros.

    Gathers whole 128-lane super-rows (row gathers are per-index cost on TPU,
    width-free) and selects the right 16-lane group with an 8-way mask.
    """
    m, w = cs.shape
    assert w == WIDTH
    p = pos - 1
    safe = jnp.clip(p, 0, m - 1)
    super_rows = jnp.take(cs.reshape(m // GROUPS, 128), safe // GROUPS, axis=0)
    g = (safe % GROUPS).astype(jnp.int32)
    out = jnp.zeros((pos.shape[0], WIDTH), cs.dtype)
    for k in range(GROUPS):
        out = jnp.where(
            (g == k)[:, None], super_rows[:, k * WIDTH : (k + 1) * WIDTH], out
        )
    return jnp.where((pos > 0)[:, None], out, 0.0)


def segment_sum_rows(d: jax.Array, starts: jax.Array, ends: jax.Array) -> jax.Array:
    """Per-segment row sums of d [M, 16]: out[i] = d[starts[i]:ends[i]].sum(0).

    The composite backward's gather-transpose reduction: one Pallas prefix
    sum + two super-row gathers, replacing XLA's log-depth cumsum.
    """
    cs = prefix_sum_rows(d)
    return gather_prefix_rows(cs, ends) - gather_prefix_rows(cs, starts)
