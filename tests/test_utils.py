"""Tests of qhbmlib_tpu.utils (mirrors reference tests/utils_test.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from qhbmlib_tpu import utils


def test_squeeze():
  """Reference utils_test: Squeeze layer removes the requested axis."""
  x = jnp.ones([3, 1, 4])
  assert utils.Squeeze(axis=1)(x).shape == (3, 4)
  assert utils.Squeeze()(jnp.ones([1, 2, 1])).shape == (2,)


def test_weighted_average():
  """Count-weighted mean, zero-count rows ignored
  (reference qhbmlib/utils.py:43-58)."""
  counts = jnp.asarray([2, 3, 0], jnp.int32)
  values = jnp.asarray([[1.0, 10.0], [6.0, -4.0], [99.0, 99.0]])
  out = utils.weighted_average(counts, values)
  np.testing.assert_allclose(
      np.asarray(out), [(2 * 1 + 3 * 6) / 5, (2 * 10 + 3 * -4) / 5],
      rtol=1e-6)
  # Pytree values: every leaf averaged with the same weights.
  tree = {"a": values, "b": jnp.asarray([1.0, 2.0, 3.0])}
  out = utils.weighted_average(counts, tree)
  np.testing.assert_allclose(np.asarray(out["b"]), (2 * 1 + 3 * 2) / 5,
                             rtol=1e-6)


def test_bits_ints_roundtrip():
  bits = jnp.asarray([[0, 1, 1], [1, 0, 0], [1, 1, 1]], jnp.int8)
  codes = utils.bits_to_ints(bits)
  np.testing.assert_array_equal(np.asarray(codes), [3, 4, 7])
  back = utils.ints_to_bits(codes, 3)
  np.testing.assert_array_equal(np.asarray(back), np.asarray(bits))


def test_unique_bitstrings_with_counts():
  """Dedup semantics of reference qhbmlib/utils.py:61-78, static-size."""
  batch = jnp.asarray(
      [[0, 1], [1, 0], [0, 1], [0, 1], [1, 1]], jnp.int8)
  y, idx, counts = utils.unique_bitstrings_with_counts(batch, size=4)
  assert y.shape == (4, 2) and counts.shape == (4,)
  # Expansion reconstructs the original batch.
  expanded = utils.expand_unique_results(y, idx)
  np.testing.assert_array_equal(np.asarray(expanded), np.asarray(batch))
  # Counts match multiplicities and padding rows count zero.
  assert int(jnp.sum(counts)) == batch.shape[0]
  code_to_count = {
      tuple(np.asarray(y[i])): int(counts[i]) for i in range(4)
      if int(counts[i])
  }
  assert code_to_count == {(0, 1): 3, (1, 0): 1, (1, 1): 1}


def test_unique_bitstrings_under_jit():
  """Static `size` keeps the dedup jit-compatible (SURVEY hard part #3)."""
  batch = jnp.asarray([[0, 0], [0, 0], [1, 1]], jnp.int8)

  @jax.jit
  def summarize(b):
    y, idx, counts = utils.unique_bitstrings_with_counts(b, size=3)
    return utils.weighted_average(counts, utils.bits_to_ints(y).astype(
        jnp.float32))

  got = float(summarize(batch))
  np.testing.assert_allclose(got, (2 * 0 + 1 * 3) / 3, rtol=1e-6)


def test_to_host_complex():
  z = jnp.asarray([[1.0 + 2.0j, -3.0j]], jnp.complex64)
  out = utils.to_host_complex(z)
  assert isinstance(out, np.ndarray)
  np.testing.assert_allclose(out, [[1.0 + 2.0j, -3.0j]], atol=1e-7)
