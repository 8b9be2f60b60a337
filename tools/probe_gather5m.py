"""Gather locality at config-5 scale: 9.4M indices into a 5M-row 32 B table.

Decomposing the 5M-splat step showed the packed feature gather degrading to
~10 ns/idx (vs 3.3 at a 1M-row table) — latency-bound random access over a
300 MB table. Question: how much of that is recoverable by ordering? Cases:

  random      — today's instance order (tile, depth) with arbitrary ids
  sorted      — fully ascending indices (the locality ceiling)
  seg-sorted  — ascending within ~900-row segments (what a depth-ordered
                feature table would give per tile segment)

Usage: python tools/probe_gather5m.py [n_rows] [m_idx]
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 9_437_184
    seg = 896
    rng = np.random.default_rng(0)
    base = rng.integers(0, n, m)
    cases = {
        "random": base,
        "sorted": np.sort(base),
        "seg-sorted": np.concatenate(
            [np.sort(base[i:i + seg]) for i in range(0, m, seg)]),
    }
    table = jnp.asarray(rng.integers(0, 2**30, (n, 8)), jnp.int32)

    def timed(name, idx_np):
        idx = jnp.asarray(idx_np, jnp.int32)
        k = 6

        def k_steps(tab, kk):
            def body(_, carry):
                g = jnp.take(tab + carry.astype(tab.dtype), idx, axis=0)
                return jnp.sum(g.astype(jnp.float32)) * 1e-30

            return lax.fori_loop(0, kk, body, jnp.float32(0.0))

        runner = jax.jit(k_steps)
        float(runner(table, jnp.int32(1)))
        t1 = min(_t(lambda: float(runner(table, jnp.int32(1)))) for _ in range(2))
        tk = min(_t(lambda: float(runner(table, jnp.int32(k)))) for _ in range(2))
        dt = (tk - t1) / (k - 1) if tk > t1 else tk / k
        print(f"{name:12s} {dt * 1e3:8.2f} ms  ({dt / m * 1e9:5.2f} ns/idx)",
              flush=True)

    for name, idx_np in cases.items():
        timed(name, idx_np)


def _t(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
