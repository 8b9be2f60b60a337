"""Microbench the individual ops inside ops/binning.bin_splats at bench scale.

Each candidate op is timed as K data-chained reps in one jitted fori_loop with
a single scalar readback (see bench.py for why).

Usage: python tools/microbench_bin.py
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
    float(r(np.int32(1), *args))
    t1 = min(_t(lambda: float(r(np.int32(1), *args))) for _ in range(2))
    tk = min(_t(lambda: float(r(np.int32(k), *args))) for _ in range(2))
    dt = (tk - t1) / (k - 1)
    print(f"{name:42s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def _t(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


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
    emax = 4_000_000
    pad_cap = 2040 * 128
    mcap = emax + pad_cap
    rng = np.random.default_rng(0)

    f_n = jnp.asarray(rng.standard_normal(n), jnp.float32)
    i_n = jnp.asarray(rng.integers(0, 2040, n), jnp.int32)
    cnt = jnp.asarray(rng.integers(0, 8, n), jnp.int32)
    tile_all = jnp.asarray(rng.integers(0, 2041, mcap), jnp.int32)
    s_all = jnp.asarray(rng.integers(0, n + 1, mcap), jnp.int32)
    m_all = jnp.asarray(rng.integers(0, emax + 1, mcap), jnp.int32)
    marks_idx = jnp.sort(jnp.asarray(rng.integers(0, emax, n), jnp.int32))
    table = jnp.asarray(rng.standard_normal((n + 1, 4)), jnp.float32)
    s_fill = jnp.asarray(rng.integers(0, n, emax), jnp.int32)
    feats = jnp.asarray(rng.standard_normal((n + 1, 16)), jnp.float32)
    inst_splat = jnp.asarray(rng.integers(0, n + 1, mcap), jnp.int32)

    def chain(c, x):
        return (x.reshape(-1)[0] + c * 1e-30).astype(jnp.float32) * 1e-30 + c * 1e-30

    # --- per-splat (N=1M) ops ---
    timed("cumsum N", lambda c, a: chain(c, jnp.cumsum(a + c.astype(jnp.int32))), cnt)
    # --- enumeration ---
    timed(
        "scatter marks (unique, sorted) N->emax",
        lambda c, idx: chain(
            c,
            jnp.full((emax,), -1, jnp.int32)
            .at[idx + c.astype(jnp.int32)]
            .set(jnp.arange(n, dtype=jnp.int32), mode="drop", unique_indices=True),
        ),
        marks_idx,
    )
    timed(
        "cummax emax",
        lambda c, a: chain(c, lax.cummax(a + c.astype(jnp.int32), axis=0)),
        jnp.asarray(rng.integers(-1, n, emax), jnp.int32),
    )
    timed(
        "row gather [N,4] by s (emax)",
        lambda c, t, s: chain(c, jnp.take(t + c, s, axis=0)),
        table,
        s_fill,
    )
    # --- the big sort, variants ---
    timed(
        "sort mcap 1key+2ops (tile,s,m)",
        lambda c, t, s, m: chain(
            c, lax.sort((t + c.astype(jnp.int32), s, m), num_keys=1, is_stable=True)[1]
        ),
        tile_all,
        s_all,
        m_all,
    )
    timed(
        "sort mcap 1key+1op (tile,m)",
        lambda c, t, m: chain(
            c, lax.sort((t + c.astype(jnp.int32), m), num_keys=1, is_stable=True)[1]
        ),
        tile_all,
        m_all,
    )
    timed(
        "sort mcap 1key+1op unstable",
        lambda c, t, m: chain(
            c, lax.sort((t + c.astype(jnp.int32), m), num_keys=1, is_stable=False)[1]
        ),
        tile_all,
        m_all,
    )
    # fused key: tile*emax'+m fits in f64? no — use two-int trick via single i32?
    # tile<2048 (11 bits), m<4.26M (23 bits) -> 34 bits: NO. but tile<2048 and
    # m/block... try packing (tile << 21 | m >> 2)? lossy. Instead try int32 pair
    # sorted as one key by sorting key=tile then segmented... skip.
    timed(
        "gather feats [mcap,16] by inst_splat",
        lambda c, f, idx: chain(c, jnp.take(f + c, idx, axis=0)),
        feats,
        inst_splat,
    )
    timed(
        "gather feats [mcap,8] by inst_splat",
        lambda c, f, idx: chain(c, jnp.take((f + c)[:, :8], idx, axis=0)),
        feats,
        inst_splat,
    )
    # --- histogram path ---
    ids2 = jnp.asarray(rng.integers(0, 2041 * 61, 2 * n), jnp.int32)
    timed(
        "hist: sort 2N ids + searchsorted edges",
        lambda c, a: chain(
            c,
            jnp.searchsorted(
                jnp.sort(a + c.astype(jnp.int32)),
                jnp.arange(2041 * 61 + 1, dtype=jnp.int32),
            ),
        ),
        ids2,
    )
    # bwd permutation sort
    timed(
        "bwd: sort (m_pos, iota) mcap",
        lambda c, m: chain(
            c,
            lax.sort(
                (m + c.astype(jnp.int32), jnp.arange(mcap, dtype=jnp.int32)), num_keys=1
            )[1],
        ),
        m_all,
    )
    timed(
        "bwd: gather d [emax,16] + cumsum [emax+1,16]",
        lambda c, f, idx: chain(
            c, jnp.cumsum(jnp.take(f + c, idx[:emax], axis=0), axis=0)
        ),
        jnp.asarray(rng.standard_normal((mcap, 16)), jnp.float32),
        inst_splat,
    )




def extra():
    import jax
    import jax.numpy as jnp
    from jax import lax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/splatapult_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    n = 1_000_000
    emax = 4_000_000
    mcap = emax + 2040 * 128
    rng = np.random.default_rng(1)

    def chain(c, x):
        return (x.reshape(-1)[0] + c * 1e-30).astype(jnp.float32) * 1e-30 + c * 1e-30

    idx_sorted = jnp.sort(jnp.asarray(rng.integers(0, emax, n), jnp.int32))
    vals5 = jnp.asarray(rng.integers(0, 2**30, (n, 5)), jnp.int32)
    big5 = jnp.asarray(rng.integers(0, 2**30, (emax, 5)), jnp.int32)
    tile_all = jnp.asarray(rng.integers(0, 2041, mcap), jnp.int32)
    s_all = jnp.asarray(rng.integers(0, n + 1, mcap), jnp.int32)
    m_all = jnp.asarray(rng.permutation(mcap).astype(np.int32))
    feats9 = jnp.asarray(rng.standard_normal((n + 1, 9)), jnp.float32)
    inst_splat = jnp.asarray(rng.integers(0, n + 1, mcap), jnp.int32)
    d9 = jnp.asarray(rng.standard_normal((mcap, 9)), jnp.float32)

    timed(
        "row scatter [N->emax,5] unique",
        lambda c, v, idx: chain(
            c,
            jnp.full((emax, 5), -1, jnp.int32)
            .at[idx + c.astype(jnp.int32)]
            .set(v, mode="drop", unique_indices=True),
        ),
        vals5,
        idx_sorted,
    )
    timed(
        "cummax [emax,5] axis0",
        lambda c, a: chain(c, lax.cummax(a + c.astype(jnp.int32), axis=0)),
        big5,
    )
    timed(
        "sort mcap 2key unstable (tile,m)+s",
        lambda c, t, m, s: chain(
            c,
            lax.sort((t + c.astype(jnp.int32), m, s), num_keys=2, is_stable=False)[2],
        ),
        tile_all,
        m_all,
        s_all,
    )
    timed(
        "gather feats [mcap,9]",
        lambda c, f, idx: chain(c, jnp.take(f + c, idx, axis=0)),
        feats9,
        inst_splat,
    )
    timed(
        "bwd: gather [emax,9] + cumsum [emax+1,9] f32",
        lambda c, f, idx: chain(
            c,
            jnp.cumsum(
                jnp.concatenate(
                    [jnp.zeros((1, 9), jnp.float32), jnp.take(f + c, idx[:emax], axis=0)],
                    axis=0,
                ),
                axis=0,
            ),
        ),
        d9,
        inst_splat,
    )


if __name__ == "__extra__":
    pass


if __name__ == "__main__" and os.environ.get("MB_EXTRA"):
    extra()
elif __name__ == "__main__":
    main()
