"""Micro-benchmarks of the XLA-TPU primitives the binning pass is built from.

Chained-iteration timing (see bench.py methodology note).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit_chain(fn, example, iters=8):
    """fn: (x, i) -> x-like with data dependency. Returns s/iter."""
    import jax
    import jax.numpy as jnp

    def k_steps(x, k):
        return jax.lax.fori_loop(0, k, lambda i, x: fn(x, i), x)

    r = jax.jit(k_steps)
    float(np.asarray(r(example, jnp.int32(1))).ravel()[0])
    t1 = min(_t(lambda: np.asarray(r(example, jnp.int32(1)))) for _ in range(2))
    tk = min(_t(lambda: np.asarray(r(example, jnp.int32(iters)))) for _ in range(2))
    return max((tk - t1) / (iters - 1), 1e-9)


def _t(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_200_000)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    n = args.n
    rng = np.random.default_rng(0)
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))
    sorted_idx = jnp.arange(n, dtype=jnp.int32)
    vals = jnp.asarray(rng.standard_normal((n,)).astype(np.float32))
    rows = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))
    ivals = jnp.arange(n, dtype=jnp.int32)

    cases = {}

    def add(name, fn, ex):
        cases[name] = (fn, ex)

    # scatters
    add("scatter_set_rand", lambda x, i: jnp.zeros((n,), jnp.int32).at[perm].set(x + i, mode="drop"), ivals)
    add("scatter_set_rand_unique", lambda x, i: jnp.zeros((n,), jnp.int32).at[perm].set(x + i, mode="drop", unique_indices=True), ivals)
    add("scatter_set_sorted", lambda x, i: jnp.zeros((n,), jnp.int32).at[sorted_idx].set(x + i, mode="drop", indices_are_sorted=True, unique_indices=True), ivals)
    add("scatter_max_sorted", lambda x, i: jnp.full((n,), -1, jnp.int32).at[sorted_idx].max(x + i, mode="drop", indices_are_sorted=True, unique_indices=True), ivals)
    add("scatter_max_sorted_noflag", lambda x, i: jnp.full((n,), -1, jnp.int32).at[sorted_idx].max(x + i, mode="drop"), ivals)
    # gathers
    add("gather1d_rand", lambda x, i: jnp.take(x + i, perm), ivals)
    add("gather1d_sortedidx", lambda x, i: jnp.take(x + i, sorted_idx), ivals)
    add("gather_rows16_rand", lambda x, i: jnp.take(x + i, perm, axis=0), rows)
    # sorts / scans
    add("sort3_int", lambda x, i: jax.lax.sort((x + i, ivals, ivals), num_keys=1, is_stable=True)[0], ivals)
    add("sort_key_rows16", lambda x, i: jnp.stack(jax.lax.sort((perm + i,) + tuple(x[:, j] for j in range(16)), num_keys=1, is_stable=True)[1:], axis=1), rows)
    add("cummax", lambda x, i: jax.lax.cummax(x + i, axis=0), ivals)
    add("cumsum_rows16", lambda x, i: jnp.cumsum(x + i, axis=0), rows)

    for name, (fn, ex) in cases.items():
        dt = timeit_chain(fn, ex)
        print(f"{name:28s} {dt * 1e3:8.3f} ms   ({dt / n * 1e9:6.2f} ns/elem)", flush=True)


if __name__ == "__main__":
    main()
