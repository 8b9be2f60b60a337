"""Probe the two 5M-scale degradations that decide the slab architecture.

PERF.md round 2: at 5M splats the binning goes 6.7x the 1M cost and the
feature gather 14.5 ns/idx (vs 3.3 at 1M). Two candidate designs — feature
transport through the sorts vs depth-slab decomposition with small static
table slices — trade sort rows against gather table size, so their net
values hinge on two curves this probe measures on the real chip:

1. lax.sort ns/row/operand vs row count (does splitting one 10M-row sort
   into K smaller sorts pay beyond the log factor?)
2. row-gather ns/index vs (a) table rows, (b) index CONFINEMENT into a
   window of a big table, (c) a static dynamic-slice of the big table —
   distinguishing "cost is table size" from "cost is access locality"
   (tools/probe_gather5m.py showed index ORDER does not matter; this asks
   whether the SPAN does).

Usage: python tools/probe_scale5m.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(name, fn, *args, k=8):
    import jax
    import jax.numpy as jnp

    def k_steps(k_iters, *a):
        def body(_, c):
            return fn(c, *a)

        return jax.lax.fori_loop(0, k_iters, body, jnp.float32(0.0))

    r = jax.jit(k_steps)
    t0 = time.perf_counter()
    float(r(np.int32(1), *args))
    compile_s = time.perf_counter() - t0

    def one(kk):
        t0 = time.perf_counter()
        float(r(np.int32(kk), *args))
        return time.perf_counter() - t0

    t1 = min(one(1) for _ in range(3))
    tk = min(one(k) for _ in range(3))
    dt = (tk - t1) / (k - 1) if tk > t1 else tk / k
    print(f"{name:44s} {dt * 1e3:8.2f} ms   (compile {compile_s:.0f}s)",
          flush=True)
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

    rng = np.random.default_rng(0)

    def dep(c, a):
        """Make ``a`` depend on the loop carry c WITHOUT changing its values
        in a way XLA can fold away: a data-dependent select (c is never
        1e30). `a + int(c)*0` gets constant-folded to `a` and the whole
        timed op hoisted out of the fori_loop — the first version of this
        probe printed 0.006 ns/row 'sorts' that way."""
        return jnp.where(c != jnp.float32(1e30), a, 0)

    def chain(res_list):
        """Order-sensitive reduction: a plain sum over a sort's outputs is
        permutation-invariant and lets XLA drop the sort entirely."""
        tot = jnp.float32(0.0)
        for r in res_list:
            w = (lax.iota(jnp.int32, r.shape[0]) & 7) + 1
            if r.ndim == 2:
                w = w[:, None]
            tot = tot + jnp.sum((r * w).astype(jnp.float32))
        return tot * 1e-30

    # ---- 1. sort rate vs rows (4 int32 operands, 3 keys — the main-sort shape)
    print("== lax.sort (4 ops, 3 keys) rate vs rows ==")
    for rows in (1_330_000, 2_660_000, 5_320_000, 10_640_000):
        cols = [jnp.asarray(rng.integers(0, 2**30, rows, dtype=np.int32))
                for _ in range(4)]

        def do_sort(c, a0, a1, a2, a3):
            res = lax.sort((dep(c, a0), a1, a2, a3),
                           num_keys=3, is_stable=False)
            return chain(res)

        dt = timed(f"sort rows={rows}", do_sort, *cols)
        print(f"    -> {dt / rows / 4 * 1e9:.3f} ns/row/operand")

    # ---- 2. gather cost vs table rows (8-col int32 rows = the 32 B shape)
    print("== gather 10.6M idx from [R, 8] int32 vs R ==")
    nidx = 10_640_000
    for r_tab in (665_000, 1_330_000, 2_660_000, 5_320_000):
        tab = jnp.asarray(rng.integers(0, 2**30, (r_tab, 8), dtype=np.int32))
        idx = jnp.asarray(rng.integers(0, r_tab, nidx, dtype=np.int32))

        def do_gather(c, t, i):
            g = jnp.take(t, dep(c, i), axis=0)
            return chain([g])

        dt = timed(f"gather table={r_tab}", do_gather, tab, idx)
        print(f"    -> {dt / nidx * 1e9:.3f} ns/idx")

    # ---- 3. confinement vs static slicing on the 5.3M table
    print("== 10.6M idx confined to a 665k window of the 5.3M table ==")
    r_tab = 5_320_000
    win = 665_000
    tab = jnp.asarray(rng.integers(0, 2**30, (r_tab, 8), dtype=np.int32))
    base = 2_000_000
    idx_conf = jnp.asarray(
        base + rng.integers(0, win, nidx, dtype=np.int32))

    def g_confined(c, t, i):
        g = jnp.take(t, dep(c, i), axis=0)
        return chain([g])

    dt = timed("confined idx, full table", g_confined, tab, idx_conf)
    print(f"    -> {dt / nidx * 1e9:.3f} ns/idx")

    def g_sliced(c, t, i):
        sl = lax.dynamic_slice_in_dim(
            t, dep(c, jnp.int32(base)), win, axis=0)
        g = jnp.take(sl, i - base, axis=0)
        return chain([g])

    dt = timed("same, via static-size dynamic_slice", g_sliced, tab, idx_conf)
    print(f"    -> {dt / nidx * 1e9:.3f} ns/idx (incl. the slice copy)")

    # ---- 4. K sliced gathers = the slab pattern (8 x 1.33M idx from 8 slices)
    print("== slab pattern: 8 x (1.33M idx from its own 665k slice) ==")
    kslab = 8
    nid_k = nidx // kslab
    idx_k = [jnp.asarray(rng.integers(0, win, nid_k, dtype=np.int32))
             for _ in range(kslab)]

    def g_slabbed(c, t, *idxs):
        tot = jnp.float32(0.0)
        for s in range(kslab):
            sl = lax.dynamic_slice_in_dim(
                t, dep(c, jnp.int32(s * win)), win, axis=0)
            g = jnp.take(sl, idxs[s], axis=0)
            tot = tot + chain([g]) * 1e30
        return tot * 1e-30

    dt = timed("8 slab gathers (incl. slice copies)", g_slabbed, tab, *idx_k)
    print(f"    -> {dt / nidx * 1e9:.3f} ns/idx effective")


if __name__ == "__main__":
    main()
