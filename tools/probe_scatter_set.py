"""Probe: XLA scatter-SET rates for the boundary-scatter segment-reduce.

The backward tail's last O(N)-per-chip term (tools/scaling_model.py
asymptotics) is the per-splat segment-end gather: every chip gathers its
cumsum table at all N segment ends even though its band only holds
~emax/D distinct splats. The replacement candidate scatters per-segment
sums FROM the <= emax sorted boundary rows INTO zeros[N+1, 9] — cost
proportional to emax instead of N — and its indices are strictly
INCREASING and UNIQUE (sorted splat ids, one boundary per splat), which
`.at[].set(..., indices_are_sorted=True, unique_indices=True)` passes to
XLA and may change the lowering entirely vs tools/probe_scatter.py's
measured 90 ns/row permutation scatter (random, non-hinted).

Timing: K data-chained repetitions inside ONE jit, per-op = (T_K - T_1)/
(K - 1) — the tunnel's ~25 ms per-dispatch sync overhead cancels in the
difference (bench.py methodology; a min-of-dispatches timer CANNOT strip
it and overstates small ops by up to 25 ms).

Run on the real chip: python tools/probe_scatter_set.py
"""

import time

import numpy as np

K = 8


def _chained(build):
    """build(k) -> jitted scalar fn running k chained reps; returns per-op s."""
    import jax

    f1, fk = jax.jit(build(1)), jax.jit(build(K))

    def timed(f):
        float(f())
        best = float("inf")
        for _ in range(8):
            t0 = time.perf_counter()
            float(f())
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(fk) - timed(f1)) / (K - 1)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    N = 1_500_000          # splat count (gather index count / scatter table rows)
    EMAX = 340_000         # band-scale emax at D=8 (scaling model, garden)

    rng = np.random.default_rng(0)
    ids = np.sort(rng.choice(N, size=EMAX, replace=False)).astype(np.int32)
    idx = jnp.asarray(ids)
    base_t = time.perf_counter()

    for cols in (1, 2, 9):
        vals = jnp.asarray(rng.standard_normal((EMAX, cols)), jnp.float32)

        for hints in (False, True):
            kw = (dict(indices_are_sorted=True, unique_indices=True)
                  if hints else {})

            def build(k, vals=vals, kw=kw, cols=cols):
                def run():
                    def body(i, carry):
                        v = vals + carry  # data-chain: no CSE across reps
                        out = jnp.zeros((N + 1, cols), jnp.float32
                                        ).at[idx].set(v, **kw)
                        return jnp.sum(out) * 1e-9
                    return lax.fori_loop(0, k, body, jnp.float32(0.0))
                return run

            dt = _chained(build)
            print(f"scatter-set [{EMAX}] -> [{N + 1}, {cols}] hints={hints}: "
                  f"{dt * 1e3:.2f} ms = {dt / EMAX * 1e9:.1f} ns/idx")

    # the gather this would replace: N indices into an [EMAX, 9] table
    table = jnp.asarray(rng.standard_normal((EMAX, 9)), jnp.float32)
    at = jnp.asarray(np.sort(rng.integers(0, EMAX, size=N)).astype(np.int32))

    def build_g(k):
        def run():
            def body(i, carry):
                t = table + carry
                return jnp.sum(jnp.take(t, at, axis=0)) * 1e-9
            return lax.fori_loop(0, k, body, jnp.float32(0.0))
        return run

    dt = _chained(build_g)
    print(f"gather baseline [N={N}] from [{EMAX}, 9]: {dt * 1e3:.2f} ms = "
          f"{dt / N * 1e9:.1f} ns/idx")
    print(f"(total probe wall {time.perf_counter() - base_t:.1f}s)")


if __name__ == "__main__":
    main()
