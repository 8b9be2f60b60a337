"""Unit tests for the Pallas prefix-sum / segment-sum kernel (ops/scan.py)."""

import jax.numpy as jnp
import numpy as np

from splatapult_tpu.ops.scan import gather_prefix_rows, prefix_sum_rows, segment_sum_rows


def test_prefix_sum_rows_matches_cumsum():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8192, 16)), jnp.float32)
    got = prefix_sum_rows(x)
    want = jnp.cumsum(x, axis=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-4)


def test_gather_prefix_rows_boundaries():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4096, 16)), jnp.float32)
    cs = prefix_sum_rows(x)
    pos = jnp.asarray([0, 1, 7, 8, 9, 4095, 4096], jnp.int32)
    got = gather_prefix_rows(cs, pos)
    full = np.concatenate([np.zeros((1, 16), np.float32), np.asarray(cs)], axis=0)
    np.testing.assert_allclose(np.asarray(got), full[np.asarray(pos)], rtol=2e-5, atol=2e-4)


def test_segment_sum_rows():
    rng = np.random.default_rng(2)
    m, n = 4096, 37
    x = jnp.asarray(rng.standard_normal((m, 16)), jnp.float32)
    cuts = np.sort(rng.integers(0, m, n - 1))
    starts = np.concatenate([[0], cuts]).astype(np.int32)
    ends = np.concatenate([cuts, [m]]).astype(np.int32)
    got = segment_sum_rows(x, jnp.asarray(starts), jnp.asarray(ends))
    want = np.stack([np.asarray(x)[s:e].sum(0) for s, e in zip(starts, ends)])
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-3)


def test_segment_sum_rows_empty_segments():
    x = jnp.ones((4096, 16), jnp.float32)
    starts = jnp.asarray([0, 5, 5, 100], jnp.int32)
    ends = jnp.asarray([5, 5, 100, 100], jnp.int32)
    got = np.asarray(segment_sum_rows(x, starts, ends))
    np.testing.assert_allclose(got[:, 0], [5.0, 0.0, 95.0, 0.0])
