"""Probe: Mosaic dynamic_gather support in Pallas TPU kernels.

The lowering (jax/_src/pallas/mosaic/lowering.py _gather_lowering_rule)
supports take_along_axis(x, idx, axis=0|1) when idx.shape == x.shape:
  axis=0: out[i,j] = x[idx[i,j], j]   (cross-sublane, per-lane)
  axis=1: out[i,j] = x[i, idx[i,j]]   (cross-lane shuffle, per-sublane)

If the lane-axis form works, the binning expand kernel's 5 masked-max
selects collapse to 1 argmax + 1 gather of a [8, window] field table.
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    R, L = 8, 640

    def kernel_lane(tab_ref, idx_ref, out_ref):
        out_ref[:, :] = jnp.take_along_axis(tab_ref[:, :], idx_ref[:, :], axis=1)

    tab = jnp.asarray(np.arange(R * L).reshape(R, L), jnp.int32)
    idx = jnp.asarray(np.random.randint(0, L, (R, L)), jnp.int32)
    try:
        out = pl.pallas_call(
            kernel_lane, out_shape=jax.ShapeDtypeStruct((R, L), jnp.int32),
        )(tab, idx)
        expect = np.take_along_axis(np.asarray(tab), np.asarray(idx), axis=1)
        print("lane-axis dynamic gather:",
              "OK" if np.array_equal(np.asarray(out), expect) else "WRONG",
              flush=True)
    except Exception as e:
        print("lane-axis dynamic gather: FAILED —", str(e)[:200], flush=True)

    R2, L2 = 640, 512

    def kernel_sub(tab_ref, idx_ref, out_ref):
        out_ref[:, :] = jnp.take_along_axis(tab_ref[:, :], idx_ref[:, :], axis=0)

    tab2 = jnp.asarray(np.arange(R2 * L2).reshape(R2, L2) % 7919, jnp.int32)
    idx2 = jnp.asarray(np.random.randint(0, R2, (R2, L2)), jnp.int32)
    try:
        out2 = pl.pallas_call(
            kernel_sub, out_shape=jax.ShapeDtypeStruct((R2, L2), jnp.int32),
        )(tab2, idx2)
        expect2 = np.take_along_axis(np.asarray(tab2), np.asarray(idx2), axis=0)
        print("sublane-axis dynamic gather:",
              "OK" if np.array_equal(np.asarray(out2), expect2) else "WRONG",
              flush=True)
    except Exception as e:
        print("sublane-axis dynamic gather: FAILED —", str(e)[:200], flush=True)


if __name__ == "__main__":
    main()
