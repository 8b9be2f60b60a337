"""Probe: lax.sort cost vs row count around power-of-two boundaries on v5e.

Discovered in round 4: the 1M fwd+bwd step regressed 99 -> 119 ms when the
calibrated capacity pushed mcap from 2,087,936 (just under 2^21) to
2,112,512 (just over). Hypothesis: XLA:TPU's sort pads rows to the next
power of two, so every sort in the step (main instance sort, bincount sort,
backward tail sort) jumps ~2x in cost at the boundary. If true, capacity
calibration must treat powers of two as cliffs, and large-scale sorts
(the 9.35M-row 5M regime pads to 2^24!) should be split/banded under them.

Run: python tools/probe_sort_pow2.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)

    def bench_sort(rows, n_pay=2, iters=8):
        key = jnp.asarray(rng.integers(0, 1 << 27, rows).astype(np.int32))
        pays = [jnp.asarray(rng.integers(-2**30, 2**30, rows).astype(np.int32))
                for _ in range(n_pay)]

        def one(c):
            outs = lax.sort(
                (key + (c * 0).astype(jnp.int32),)
                + tuple(p + (c * 0).astype(jnp.int32) for p in pays),
                num_keys=1)
            return sum(o[0].astype(jnp.float32) for o in outs) * 1e-30 + sum(
                jnp.sum(o[:: 997]).astype(jnp.float32) for o in outs) * 1e-30

        def k_steps(k):
            return lax.fori_loop(0, k, lambda _, c: one(c), jnp.float32(0.0))

        run = jax.jit(k_steps)
        float(run(jnp.int32(1)))

        def t(k):
            t0 = time.perf_counter()
            float(run(jnp.int32(k)))
            return time.perf_counter() - t0

        t1 = min(t(1) for _ in range(3))
        tk = min(t(iters) for _ in range(3))
        return (tk - t1) / (iters - 1)

    print("rows        1key+2ops ms   ns/row")
    for rows in (1_572_864, 1_900_544, 2_087_936, 2_097_152, 2_112_512,
                 2_621_440, 3_145_728, 4_190_208, 4_194_304, 4_210_688,
                 6_291_456, 8_388_608, 8_421_376, 9_350_144):
        dt = bench_sort(rows)
        print(f"{rows:10d} {dt * 1e3:10.2f}   {dt * 1e9 / rows:8.3f}",
              flush=True)


if __name__ == "__main__":
    main()
