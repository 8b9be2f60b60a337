"""Candidate binning/gather redesigns, measured with DCE-proof chaining.

Every timed function sum-reduces its full result (see tools/profile_bwd.py:
x[0]-style chaining lets XLA dead-code-eliminate sort payloads and whole
columns, which made earlier per-operand sort costs look free).

Scale matches bench.py defaults: N=1M splats, instance-mult 2.

Usage: python tools/microbench_bin2.py
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
    print(f"{name:52s} {dt * 1e3:8.2f} ms", flush=True)
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

    n = 1_000_000
    emax = 2_002_944
    tiles = 2040
    tx_n = 60
    pad_cap = tiles * 128
    mcap = emax + pad_cap
    rng = np.random.default_rng(0)

    def chain(c, *xs):
        tot = c * 1e-30
        for x in xs:
            tot = tot + jnp.sum(x.astype(jnp.float32)) * 1e-30
        return tot.astype(jnp.float32)

    # production-like: first_slot sorted-unique-ish, s_fill nondecreasing
    first_slot = jnp.sort(jnp.asarray(
        rng.choice(emax, n, replace=False).astype(np.int32)))
    s_fill_sorted = jnp.asarray(
        np.minimum((np.arange(emax) * (n / emax)).astype(np.int32), n - 1))
    s_fill_rand = jnp.asarray(rng.integers(0, n, emax), jnp.int32)
    table = jnp.asarray(rng.standard_normal((n, 4)), jnp.float32)
    feats = jnp.asarray(rng.standard_normal((n + 1, 16)), jnp.float32)
    inst_splat = jnp.asarray(rng.integers(0, n + 1, mcap), jnp.int32)
    tile_enum = jnp.asarray(rng.integers(0, tiles + 1, emax), jnp.int32)
    tile_all = jnp.asarray(rng.integers(0, tiles + 1, mcap), jnp.int32)
    fcols = [jnp.asarray(rng.standard_normal(mcap), jnp.float32) for _ in range(9)]
    ids2 = jnp.asarray(rng.integers(0, (tiles // tx_n + 1) * (tx_n + 1), 2 * n), jnp.int32)

    # --- current: one int-row gather of the rect table at s (sorted) ---
    timed("cur: row gather [N,4] at s SORTED (emax)",
          lambda c, t, s: chain(c, jnp.take(t + c, s, axis=0)),
          table, s_fill_sorted)
    timed("cur: row gather [N,4] at s RANDOM (emax)",
          lambda c, t, s: chain(c, jnp.take(t + c, s, axis=0)),
          table, s_fill_rand)

    # --- candidate: packed two-column 1-D scatter + cummax fill ---
    colA = jnp.asarray(rng.integers(0, 2**31 - 1, n), jnp.uint32)
    colB = jnp.asarray(rng.integers(0, 2**27, n), jnp.int32)

    def fill_2x1d(c, a, b, idx):
        fa = jnp.zeros((emax,), jnp.uint32).at[idx].set(
            a + c.astype(jnp.uint32), mode="drop", unique_indices=True)
        fb = jnp.full((emax,), -1, jnp.int32).at[idx].set(
            b, mode="drop", unique_indices=True)
        return chain(c, lax.cummax(fa, axis=0), lax.cummax(fb, axis=0))

    timed("new: 2x (1-D scatter + cummax) packed fill", fill_2x1d, colA, colB, first_slot)

    def fill_rowscatter(c, a, b, idx):
        rows = jnp.stack([a.astype(jnp.int32), b], axis=1)
        f = jnp.full((emax, 2), -1, jnp.int32).at[idx].set(
            rows + c.astype(jnp.int32), mode="drop", unique_indices=True)
        return chain(c, lax.cummax(f[:, 0], axis=0), lax.cummax(f[:, 1], axis=0))

    timed("new: row scatter [N,2] + slice + 2 cummax", fill_rowscatter, colA, colB, first_slot)

    # --- histogram: current rect-corner vs bincount-by-sort of tile[emax] ---
    timed("cur hist: 2x (sort 2N + searchsorted)",
          lambda c, a: chain(
              c,
              jnp.searchsorted(jnp.sort(a + c.astype(jnp.int32)),
                               jnp.arange((tiles // tx_n + 1) * (tx_n + 1) + 1,
                                          dtype=jnp.int32)),
              jnp.searchsorted(jnp.sort(a), jnp.arange(
                  (tiles // tx_n + 1) * (tx_n + 1) + 1, dtype=jnp.int32)),
          ),
          ids2)

    timed("new hist: unstable sort tile[emax] + searchsorted",
          lambda c, a: chain(
              c,
              jnp.searchsorted(
                  lax.sort(a + c.astype(jnp.int32), is_stable=False),
                  jnp.arange(tiles + 1, dtype=jnp.int32)),
          ),
          tile_enum)

    # --- feature gather placement ---
    timed("cur: gather feats [mcap,16] at RANDOM inst_splat",
          lambda c, f, idx: chain(c, jnp.take(f + c, idx, axis=0)),
          feats, inst_splat)
    timed("alt: gather feats [emax,16] at SORTED s_enum",
          lambda c, f, idx: chain(c, jnp.take(f + c, idx, axis=0)),
          feats, s_fill_sorted)

    # --- the real marginal cost of f32 payloads on the mcap sort ---
    timed("sort mcap 1key+2ops (today, sum-chained)",
          lambda c, t, a, b: chain(c, *lax.sort(
              (t + c.astype(jnp.int32), a, b), num_keys=1, is_stable=True)[1:]),
          tile_all, inst_splat, jnp.asarray(rng.integers(0, emax + 1, mcap), jnp.int32))
    timed("sort mcap 1key+2ops+9 f32 payloads",
          lambda c, t, a, b, *fc: chain(c, *lax.sort(
              (t + c.astype(jnp.int32), a, b) + fc, num_keys=1, is_stable=True)[1:]),
          tile_all, inst_splat,
          jnp.asarray(rng.integers(0, emax + 1, mcap), jnp.int32), *fcols)


if __name__ == "__main__":
    main()
