"""Microbench: row-gather cost vs row width on the real chip.

Is the instance feature gather ([2M indices] x [1M, 16] f32 = 64 B rows)
paying a slow path that a 32 B row (8 f32 cols, or 16 bf16 cols packed as
8 int32) would avoid?

Usage: python tools/microbench_gather.py
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

    n, m = 1_000_000, 2_097_152
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, n, m), jnp.int32)

    def timed(name, table, cols):
        # K data-chained gathers in one jitted program (DCE-proof: chain
        # through the sum of ALL output elements); see PERF.md methodology
        k = 8

        def k_steps(tab, kk):
            def body(_, carry):
                g = jnp.take(tab + carry.astype(tab.dtype), idx, axis=0)
                return jnp.sum(g[:, :cols].astype(jnp.float32)) * 1e-30

            return lax.fori_loop(0, kk, body, jnp.float32(0.0))

        runner = jax.jit(k_steps)
        float(runner(table, jnp.int32(1)))
        t1 = time.perf_counter(); float(runner(table, jnp.int32(1))); t1 = time.perf_counter() - t1
        tk = time.perf_counter(); float(runner(table, jnp.int32(k))); tk = time.perf_counter() - tk
        dt = (tk - t1) / (k - 1)
        print(f"{name:24s} {dt*1e3:7.2f} ms  ({dt/m*1e9:.2f} ns/idx)", flush=True)

    timed("f32x16 (64B rows)", jnp.asarray(rng.standard_normal((n, 16)), jnp.float32), 16)
    timed("f32x9  (36B rows)", jnp.asarray(rng.standard_normal((n, 9)), jnp.float32), 9)
    timed("f32x8  (32B rows)", jnp.asarray(rng.standard_normal((n, 8)), jnp.float32), 8)
    timed("i32x8  (32B rows)", jnp.asarray(rng.integers(0, 2**30, (n, 8)), jnp.int32), 8)
    timed("f32x4  (16B rows)", jnp.asarray(rng.standard_normal((n, 4)), jnp.float32), 4)
    timed("f32x1  (1-D)", jnp.asarray(rng.standard_normal((n, 1)), jnp.float32), 1)


if __name__ == "__main__":
    main()
