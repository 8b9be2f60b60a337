"""Targeted micro-benchmarks with the *actual* index patterns binning uses.

Harness: scalar int32 carry perturbs the scattered/gathered VALUES (or gather
source) each iteration so XLA cannot hoist the op out of the loop; a full-array
sum folds the result back into the carry (uniform ~0.1-0.3 ms overhead).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit_chain(fn, iters=8):
    import jax
    import jax.numpy as jnp

    def k_steps(k):
        return jax.lax.fori_loop(0, k, lambda i, c: fn(c), jnp.int32(1))

    r = jax.jit(k_steps)
    np.asarray(r(jnp.int32(1)))
    t1 = min(_t(lambda: np.asarray(r(jnp.int32(1)))) for _ in range(3))
    tk = min(_t(lambda: np.asarray(r(jnp.int32(iters)))) for _ in range(3))
    return max((tk - t1) / (iters - 1), 1e-9)


def _t(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_200_000)  # emax
    p.add_argument("--splats", type=int, default=300_000)
    p.add_argument("--tiles", type=int, default=2040)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    n, ns, T = args.n, args.splats, args.tiles
    mcap = n + T * 128
    rng = np.random.default_rng(0)

    cnt = rng.integers(0, 9, ns).astype(np.int32)
    offs = np.cumsum(cnt) - cnt
    offs_j = jnp.asarray(offs.astype(np.int32))
    cnt_j = jnp.asarray(cnt)
    marks_idx = jnp.asarray(np.where(cnt > 0, offs, n).astype(np.int32))
    arange_ns = jnp.arange(ns, dtype=jnp.int32)

    tile_of = np.sort(rng.integers(0, T, n).astype(np.int32))
    inst_splat_real = jnp.asarray(np.sort(rng.integers(0, ns, n).astype(np.int32)))
    shift = np.minimum((tile_of.astype(np.int64) * 64) % (mcap - n), mcap - n).astype(np.int32)
    slot_monotone = jnp.asarray(np.clip(np.arange(n) + shift, 0, mcap - 1).astype(np.int32))
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))
    tile_j = jnp.asarray(tile_of)

    rows16_m = jnp.asarray(rng.standard_normal((mcap, 16)).astype(np.float32))
    feats_small = jnp.asarray(rng.standard_normal((ns + 1, 16)).astype(np.float32))
    rows16_n = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))
    ivals_n = jnp.arange(n, dtype=jnp.int32)

    cases = {}

    def add(name, fn):
        cases[name] = fn

    isum = lambda a: a.sum(dtype=jnp.int32) if a.dtype != jnp.float32 else a.sum().astype(jnp.int32)

    # --- marks: N values into emax output ---
    add("marks_max_noflags", lambda c: isum(
        jnp.full((n,), -1, jnp.int32).at[offs_j].max(
            jnp.where(cnt_j > 0, arange_ns + c, -1), mode="drop")))
    add("marks_set_unique", lambda c: isum(
        jnp.full((n,), -1, jnp.int32).at[marks_idx].set(arange_ns + c, mode="drop",
                                                        unique_indices=True)))
    add("marks_set_uniq_sorted", lambda c: isum(
        jnp.full((n,), -1, jnp.int32).at[marks_idx].set(
            arange_ns + c, mode="drop", unique_indices=True, indices_are_sorted=True)))
    # --- inst_splat: emax monotone-unique indices into mcap output ---
    add("inst_scatter_noflags", lambda c: isum(
        jnp.full((mcap,), ns, jnp.int32).at[slot_monotone].set(inst_splat_real + c, mode="drop")))
    add("inst_scatter_flags", lambda c: isum(
        jnp.full((mcap,), ns, jnp.int32).at[slot_monotone].set(
            inst_splat_real + c, mode="drop", unique_indices=True, indices_are_sorted=True)))
    # --- random scatter (slot_of_enum pattern): emax random-perm into emax ---
    add("perm_scatter_noflags", lambda c: isum(
        jnp.zeros((n,), jnp.int32).at[perm].set(ivals_n + c, mode="drop")))
    add("perm_scatter_unique", lambda c: isum(
        jnp.zeros((n,), jnp.int32).at[perm].set(ivals_n + c, mode="drop", unique_indices=True)))
    # --- gathers (source perturbed by c) ---
    add("gather1d_monotone[n<-mcap]", lambda c: isum(
        jnp.take((jnp.arange(mcap, dtype=jnp.int32) + c), slot_monotone)))
    add("gather1d_monotone_flag", lambda c: isum(
        jax.lax.gather((jnp.arange(mcap, dtype=jnp.int32) + c), slot_monotone[:, None],
                       jax.lax.GatherDimensionNumbers(offset_dims=(), collapsed_slice_dims=(0,), start_index_map=(0,)),
                       (1,), indices_are_sorted=True, mode="clip")))
    add("rowgather16_mono[n<-mcap]", lambda c: isum(
        jnp.take(rows16_m + c.astype(jnp.float32), slot_monotone, axis=0)))
    add("rowgather16_tileorder[n<-ns]", lambda c: isum(
        jnp.take(feats_small + c.astype(jnp.float32), inst_splat_real, axis=0)))
    add("rowgather16_rand[n<-n]", lambda c: isum(
        jnp.take(rows16_n + c.astype(jnp.float32), perm, axis=0)))
    add("rowgather2int_tbl[n<-T]", lambda c: isum(
        jnp.take(jnp.zeros((T + 1, 2), jnp.int32) + c, jnp.minimum(tile_j, T), axis=0)))
    # --- sorts ---
    add("sort3int_tilekeys", lambda c: isum(
        jax.lax.sort((tile_j + 0 * c, inst_splat_real + c, ivals_n), num_keys=1, is_stable=True)[1]))
    add("sort2int_perminverse", lambda c: isum(
        jax.lax.sort((perm + 0 * c, ivals_n + c), num_keys=1, is_stable=True)[1]))
    # --- scans ---
    add("cummax_n", lambda c: isum(jax.lax.cummax(ivals_n + c, axis=0)))
    add("cumsum16_n", lambda c: isum(jnp.cumsum(rows16_n + c.astype(jnp.float32), axis=0)))
    add("baseline_sum_only", lambda c: isum(ivals_n + c))

    for name, fn in cases.items():
        try:
            dt = timeit_chain(fn)
            print(f"{name:34s} {dt * 1e3:8.3f} ms ({dt / n * 1e9:6.2f} ns/elem)", flush=True)
        except Exception as e:
            print(f"{name:34s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
