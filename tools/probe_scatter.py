"""Probe: can Mosaic/Pallas express the SCATTER side of a radix-sort pass?
(VERDICT r3 item 1a — the gather side is already dead, tools/test_dyngather.py.)

A radix pass is: compute each row's destination, then WRITE rows at
data-dependent positions. On TPU the candidate mechanisms are:

  A. per-row dynamic store:  out_ref[pl.ds(dest_i, 1), :] = row_i   (scalar
     loop over rows — the literal scatter). Feasibility + ns/row.
  B. chunk store at dynamic offset: out_ref[pl.ds(start, CH), :] = block —
     what a bucket-partitioned pass would use to emit each (block, bucket)
     segment. Feasibility + rate. (Even if fast, variable segment LENGTHS
     still have no lowering: pl.ds sizes are static, so segments would need
     static padding — x num_buckets output inflation — or masked stores.)
  C. masked store at a dynamic offset (pltpu.store(..., mask=)): the only
     way to emulate variable-length segment writes without inflation.

The reference pays exactly this scatter on GPU hardware with per-lane
addressable global memory (shader/multi_radixsort.glsl:87-137,
radix_sort.hpp:124); this probe documents what the TPU memory model admits.

Run on the real chip: python tools/probe_scatter.py
"""

import time

import numpy as np


def _timed(scalar_fn, *args, iters=30):
    """Min-of-trials timing of a jitted SCALAR-returning fn (returning the
    full array would drag megabytes through the tunnel per call). One
    compile + readback first (tunnel rules: sync-per-dispatch after the
    first readback); min over iters strips protocol spikes."""
    float(scalar_fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(scalar_fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = 1024  # rows per grid step
    W = 8     # row width (the packed feature shape)
    NB = 64   # grid steps
    N = B * NB

    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.standard_normal((N, W)), jnp.float32)
    # destination = a random permutation, block-local so each grid step's
    # writes stay inside its own out block (the only legal Pallas pattern:
    # a kernel instance cannot address another grid step's output block,
    # which is ITSELF the structural reason a global radix scatter cannot
    # be one pallas_call — noted in the summary this probe prints)
    perm = np.stack([rng.permutation(B) for _ in range(NB)]).astype(np.int32)
    dest = jnp.asarray(perm)  # [NB, B]

    # ---------------- A: per-row dynamic store ----------------
    def kernel_a(dest_ref, in_ref, out_ref):
        j = pl.program_id(0)

        def body(i, _):
            d = dest_ref[j, i]
            out_ref[pl.ds(d, 1), :] = in_ref[pl.ds(i, 1), :]
            return 0

        lax.fori_loop(0, B, body, 0)

    try:
        f_a = jax.jit(lambda r, d: pl.pallas_call(
            kernel_a,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec((NB, B), lambda j: (0, 0)),
                pl.BlockSpec((B, W), lambda j: (j, 0)),
            ],
            out_specs=pl.BlockSpec((B, W), lambda j: (j, 0)),
            out_shape=jax.ShapeDtypeStruct((N, W), jnp.float32),
        )(d, r))
        out = np.asarray(f_a(rows, dest))
        want = np.zeros((N, W), np.float32)
        for j in range(NB):
            want[j * B + perm[j]] = np.asarray(rows)[j * B : (j + 1) * B]
        ok = np.array_equal(out, want)
        f_a_s = jax.jit(lambda r, d: jnp.sum(f_a(r, d)[::997, 0]))
        dt = _timed(f_a_s, rows, dest)
        print(f"A per-row dynamic store: {'OK' if ok else 'WRONG'} "
              f"{dt * 1e9 / N:.1f} ns/row ({N} rows, {dt * 1e3:.2f} ms)",
              flush=True)
    except Exception as e:
        print("A per-row dynamic store: FAILED —", str(e)[:300], flush=True)

    # ---------------- B: chunk store at dynamic offset ----------------
    CH = 128
    NCH = B // CH
    # per-(block, chunk) destination chunk index: a chunk-granular permutation
    cperm = np.stack([rng.permutation(NCH) for _ in range(NB)]).astype(np.int32)
    cdest = jnp.asarray(cperm)

    def kernel_b(cd_ref, in_ref, out_ref):
        j = pl.program_id(0)

        def body(c, _):
            start = cd_ref[j, c] * CH
            out_ref[pl.ds(start, CH), :] = in_ref[pl.ds(c * CH, CH), :]
            return 0

        lax.fori_loop(0, NCH, body, 0)

    try:
        f_b = jax.jit(lambda r, d: pl.pallas_call(
            kernel_b,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec((NB, NCH), lambda j: (0, 0)),
                pl.BlockSpec((B, W), lambda j: (j, 0)),
            ],
            out_specs=pl.BlockSpec((B, W), lambda j: (j, 0)),
            out_shape=jax.ShapeDtypeStruct((N, W), jnp.float32),
        )(d, r))
        out = np.asarray(f_b(rows, cdest))
        want = np.zeros((N, W), np.float32)
        for j in range(NB):
            for c in range(NCH):
                want[j * B + cperm[j][c] * CH : j * B + cperm[j][c] * CH + CH] = (
                    np.asarray(rows)[j * B + c * CH : j * B + (c + 1) * CH])
        ok = np.array_equal(out, want)
        f_b_s = jax.jit(lambda r, d: jnp.sum(f_b(r, d)[::997, 0]))
        dt = _timed(f_b_s, rows, cdest)
        print(f"B chunk store at dynamic offset: {'OK' if ok else 'WRONG'} "
              f"{dt * 1e9 / N:.2f} ns/row ({CH}-row chunks, {dt * 1e3:.2f} ms)",
              flush=True)
    except Exception as e:
        print("B chunk store at dynamic offset: FAILED —", str(e)[:300], flush=True)

    # ---------------- C: masked store at dynamic offset ----------------
    # semantics check: zero the whole out block, then for each source chunk
    # masked-store only its first CH//2 rows at the dynamic destination —
    # exactly the variable-length segment emit a radix pass would need
    def kernel_c(cd_ref, in_ref, out_ref):
        j = pl.program_id(0)
        out_ref[:, :] = jnp.zeros((B, W), jnp.float32)

        def body(c, _):
            start = cd_ref[j, c] * CH
            vals = in_ref[pl.ds(c * CH, CH), :]
            mask = lax.broadcasted_iota(jnp.int32, (CH, W), 0) < (CH // 2)
            pltpu.store(out_ref.at[pl.ds(start, CH), :], vals, mask=mask)
            return 0

        lax.fori_loop(0, NCH, body, 0)

    try:
        f_c = jax.jit(lambda r, d: pl.pallas_call(
            kernel_c,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec((NB, NCH), lambda j: (0, 0)),
                pl.BlockSpec((B, W), lambda j: (j, 0)),
            ],
            out_specs=pl.BlockSpec((B, W), lambda j: (j, 0)),
            out_shape=jax.ShapeDtypeStruct((N, W), jnp.float32),
        )(d, r))
        out = np.asarray(f_c(rows, cdest))
        want = np.zeros((N, W), np.float32)
        for j in range(NB):
            for c in range(NCH):
                want[j * B + cperm[j][c] * CH : j * B + cperm[j][c] * CH + CH // 2] = (
                    np.asarray(rows)[j * B + c * CH : j * B + c * CH + CH // 2])
        ok = np.array_equal(out, want)
        f_c_s = jax.jit(lambda r, d: jnp.sum(f_c(r, d)[::997, 0]))
        dt = _timed(f_c_s, rows, cdest)
        print(f"C masked store at dynamic offset: {'OK' if ok else 'WRONG'} "
              f"{dt * 1e9 / N:.2f} ns/row ({dt * 1e3:.2f} ms)", flush=True)
    except Exception as e:
        print("C masked store at dynamic offset: FAILED —", str(e)[:300],
              flush=True)

    # ---------------- XLA baselines for scale ----------------
    big_n = 4 << 20
    bigrows = jnp.asarray(rng.standard_normal((big_n, W)), jnp.float32)
    bigdest = jnp.asarray(rng.permutation(big_n).astype(np.int32))

    f_scatter = jax.jit(
        lambda r, d: jnp.sum(jnp.zeros_like(r).at[d].set(
            r, mode="drop", unique_indices=True)[::997, 0]))
    dt = _timed(f_scatter, bigrows, bigdest, iters=10)
    print(f"XLA permutation row scatter [4M, 8]: {dt * 1e9 / big_n:.1f} ns/row",
          flush=True)

    f_sort = jax.jit(lambda d, r: sum(
        jnp.sum(o[::997]) for o in lax.sort(
            (d,) + tuple(r[:, i] for i in range(W)), num_keys=1)[1:]))
    dt = _timed(f_sort, bigdest, bigrows, iters=10)
    print(f"lax.sort 1 key + 8 operands [4M]: {dt * 1e9 / big_n:.1f} ns/row",
          flush=True)

    print(
        "\nStructural note: every Pallas variant above is BLOCK-LOCAL — a "
        "kernel instance can only address its own output block (BlockSpec "
        "index maps depend on grid/scalar-prefetch only), so a GLOBAL radix "
        "scatter cannot be expressed as one pallas_call regardless of the "
        "rates printed; cross-block movement must round-trip through HBM "
        "arrays, i.e. through XLA scatter (per-index cost above) or "
        "lax.sort. The probe's per-mechanism rates bound what any two-level "
        "(block-partition + global-merge) custom sort could save.",
        flush=True,
    )


if __name__ == "__main__":
    main()
