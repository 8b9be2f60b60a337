"""Candidate layouts for the backward sort-transpose tail, DCE-proof.

The tail after the bwd kernel: sort 9 gradient columns by m_pos to
enumeration order, per-splat segment sums, first-difference. Candidates vary
the cumsum/gather layout; all costs at bench scale (N=1M, instance-mult 2).

Usage: python tools/microbench_tail.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _t(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def timed(name, fn, *args, k=8):
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
    print(f"{name:56s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/splatapult_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from splatapult_tpu.ops.composite import _blocked_cumsum

    n = 1_000_000
    emax = 2_002_944
    mcap = emax + 2040 * 128
    rng = np.random.default_rng(0)

    def chain(c, *xs):
        tot = c * 1e-30
        for x in xs:
            tot = tot + jnp.sum(x.astype(jnp.float32)) * 1e-30
        return tot.astype(jnp.float32)

    m_pos = jnp.asarray(rng.permutation(mcap).astype(np.int32))
    d_inst = jnp.asarray(rng.standard_normal((mcap, 16)), jnp.float32)
    # per-splat segments: nondecreasing ends over [0, emax]
    cnt = rng.integers(0, 4, n)
    ends_np = np.minimum(np.cumsum(cnt), emax).astype(np.int32)
    end = jnp.asarray(ends_np)
    offs = jnp.asarray(ends_np - cnt.astype(np.int32))
    s_enum = jnp.asarray(np.searchsorted(ends_np, np.arange(emax), side="right")
                         .clip(0, n - 1).astype(np.int32))

    def sort9(c, d):
        d = d + c
        return lax.sort((m_pos,) + tuple(d[:, i] for i in range(9)), num_keys=1)

    timed("sort 10-operand only", lambda c, d: chain(c, *sort9(c, d)[1:]), d_inst)

    # --- shipped: [emax,8]+[emax,1] blocked cumsum + two row gathers ---
    def tail_shipped(c, d):
        cols = sort9(c, d)
        cs8 = _blocked_cumsum(jnp.stack([x[:emax] for x in cols[1:9]], axis=1))
        cs1 = _blocked_cumsum(cols[9][:emax])
        at = jnp.clip(end - 1, 0, emax - 1)
        live = (end > offs)[:, None]
        g8 = jnp.where(live, jnp.take(cs8, at, axis=0), 0.0)
        g1 = jnp.where(live, jnp.take(cs1, at)[:, None], 0.0)
        g = jnp.concatenate([g8, g1], axis=1)
        d_rows = jnp.diff(g, axis=0, prepend=jnp.zeros((1, 9), g.dtype))
        return chain(c, d_rows)

    timed("tail shipped ([emax,8]+[emax,1] cs + 2 gathers)", tail_shipped, d_inst)

    # --- transposed: [9,emax] concat + lane cumsum + axis-1 gather ---
    def tail_transposed(c, d):
        cols = sort9(c, d)
        mat = jnp.stack([x[:emax] for x in cols[1:10]], axis=0)  # [9, emax]
        blk = 512
        nb = emax // blk
        xb = mat.reshape(9, nb, blk)
        local = jnp.cumsum(xb, axis=2)
        carry = jnp.cumsum(local[:, :, -1], axis=1) - local[:, :, -1]
        cs = (local + carry[:, :, None]).reshape(9, emax)
        at = jnp.clip(end - 1, 0, emax - 1)
        g = jnp.where((end > offs)[None, :], jnp.take(cs, at, axis=1), 0.0)  # [9, N]
        d_rows = jnp.diff(g, axis=1, prepend=jnp.zeros((9, 1), g.dtype))
        return chain(c, d_rows)

    timed("tail transposed ([9,emax] cs + axis-1 gather)", tail_transposed, d_inst)

    # --- segment_sum with sorted indices (scatter-add path) ---
    def tail_segsum(c, d):
        cols = sort9(c, d)
        mat = jnp.stack([x[:emax] for x in cols[1:10]], axis=1)  # [emax, 9]
        out = jax.ops.segment_sum(mat, s_enum, num_segments=n,
                                  indices_are_sorted=True)
        return chain(c, out)

    timed("tail segment_sum (sorted scatter-add)", tail_segsum, d_inst)

    # pieces
    cs8_v = jnp.asarray(rng.standard_normal((emax, 8)), jnp.float32)
    cs1_v = jnp.asarray(rng.standard_normal(emax), jnp.float32)
    at_v = jnp.clip(end - 1, 0, emax - 1)
    timed("  piece: stack 8 cols -> [emax,8]",
          lambda c, d: chain(c, jnp.stack([d[:emax, i] + c for i in range(8)], axis=1)),
          d_inst)
    timed("  piece: blocked cumsum [emax,8]",
          lambda c, x: chain(c, _blocked_cumsum(x + c)), cs8_v)
    timed("  piece: row gather [N] from [emax,8]",
          lambda c, x: chain(c, jnp.take(x + c, at_v, axis=0)), cs8_v)
    timed("  piece: 1-D gather [N] from [emax]",
          lambda c, x: chain(c, jnp.take(x + c, at_v)), cs1_v)


if __name__ == "__main__":
    main()
