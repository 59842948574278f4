"""Tests of qhbmlib_tpu.utils (mirrors reference tests/utils_test.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def test_unique_bitstrings_overflow_keeps_highest_counts():
  """When true uniques exceed `size`, the kept support is the top-count
  subset (not the lexicographically smallest), and dropped rows fall out of
  both the counts and the expand gather's valid range."""
  rows = ([[1, 1, 0]] * 4 + [[1, 0, 1]] * 3 + [[0, 0, 1]] + [[1, 1, 1]] +
          [[0, 1, 0]])
  batch = jnp.asarray(rows, jnp.int8)
  y, idx, counts = utils.unique_bitstrings_with_counts(batch, size=2)
  kept = {tuple(np.asarray(y[i])): int(counts[i]) for i in range(2)}
  assert kept == {(1, 1, 0): 4, (1, 0, 1): 3}
  assert int(jnp.sum(counts)) == 7  # dropped singles contribute nothing
  # Dropped rows index out of bounds -> scatter-drop semantics.
  assert np.asarray(idx).max() >= 2
  under_jit = jax.jit(
      lambda b: utils.unique_bitstrings_with_counts(b, size=2))(batch)
  np.testing.assert_array_equal(np.asarray(under_jit[2]), np.asarray(counts))


def test_unique_bitstrings_wide_rows_no_int32_collision():
  """n > 31 bits: a single int32 code would wrap (2^31, 2^32 -> collisions);
  the multi-word path keeps distinct 40-bit strings distinct."""
  n = 40
  rows = np.zeros((6, n), np.int8)
  rows[0, 0] = 1   # bit 39 (weight 2^39) -- wraps to 0 in int32
  rows[1, 8] = 1   # bit 31 (weight 2^31) -- wraps negative in int32
  rows[2, 39] = 1  # bit 0
  rows[3] = rows[0]
  # rows[4], rows[5] stay all-zero.
  batch = jnp.asarray(rows)
  y, idx, counts = utils.unique_bitstrings_with_counts(batch, size=6)
  kept = {tuple(np.asarray(y[i])): int(counts[i]) for i in range(6)
          if int(counts[i])}
  assert kept[tuple(rows[0])] == 2
  assert kept[tuple(rows[1])] == 1
  assert kept[tuple(rows[2])] == 1
  assert kept[tuple(np.zeros(n, np.int8))] == 2
  assert len(kept) == 4
  # Expansion reconstructs the original batch.
  np.testing.assert_array_equal(
      np.asarray(utils.expand_unique_results(y, idx)), rows)
  # The truncating top-count path works on wide rows too.
  y2, _, c2 = utils.unique_bitstrings_with_counts(batch, size=2)
  kept2 = {tuple(np.asarray(y2[i])): int(c2[i]) for i in range(2)}
  assert kept2 == {tuple(rows[0]): 2, tuple(np.zeros(n, np.int8)): 2}
  with pytest.raises(ValueError, match="31 bits"):
    utils.bits_to_ints(batch)


def test_expand_unique_results_fill_value_marks_dropped_rows():
  """Overflowed idx entries (== len(y)) surface as NaN by default (jnp.take
  fill mode) and as the chosen marker with fill_value."""
  y = jnp.asarray([10.0, 20.0])
  idx = jnp.asarray([0, 1, 2, 1])  # row 2 was dropped by a bounding size
  default = np.asarray(utils.expand_unique_results(y, idx))
  np.testing.assert_allclose(default[[0, 1, 3]], [10.0, 20.0, 20.0])
  assert np.isnan(default[2])  # dropped row is loud, not a silent value
  marked = np.asarray(utils.expand_unique_results(y, idx, fill_value=-1.0))
  np.testing.assert_allclose(marked, [10.0, 20.0, -1.0, 20.0])


def test_bounded_cache_put_evicts_fifo():
  cache = {}
  for i in range(5):
    utils.bounded_cache_put(cache, i, str(i), max_entries=3)
  assert list(cache) == [2, 3, 4]
  # Re-inserting an existing key does not evict.
  utils.bounded_cache_put(cache, 3, "new", max_entries=3)
  assert list(cache) == [2, 3, 4] and cache[3] == "new"


def test_all_bitstrings_enumeration():
  got = utils.all_bitstrings(2)
  np.testing.assert_array_equal(got, [[0, 0], [0, 1], [1, 0], [1, 1]])
  assert got.dtype == np.int8


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


def test_categorical_indices_distribution():
  """Empirical frequencies of the inverse-CDF sampler match softmax(logits);
  zero-mass categories are never drawn; indices stay in range."""
  logits = jnp.asarray([0.0, 1.0, -jnp.inf, 2.0, -1.0], jnp.float32)
  probs = np.asarray(jax.nn.softmax(logits))
  n = 200_000
  idx = np.asarray(
      utils.categorical_indices(jax.random.PRNGKey(5), logits, n))
  assert idx.min() >= 0 and idx.max() < logits.shape[0]
  freq = np.bincount(idx, minlength=logits.shape[0]) / n
  assert freq[2] == 0.0  # zero-probability category never drawn
  np.testing.assert_allclose(freq, probs, atol=5e-3)


def test_categorical_indices_cdf_boundary():
  """u rounding up to exactly cdf[-1] must clamp to the last index, not
  index past the end (float32 ulp at large unnormalized totals)."""
  # Large positive logits make cdf[-1] big enough that uniform*cdf[-1]
  # can round to cdf[-1]; regardless, indices must stay in range.
  logits = jnp.full((7,), 25.0, jnp.float32)
  for seed in range(8):
    idx = np.asarray(
        utils.categorical_indices(jax.random.PRNGKey(seed), logits, 4096))
    assert idx.min() >= 0 and idx.max() < 7
  # Uniform logits should draw every category.
  assert len(np.unique(idx)) == 7


def test_categorical_indices_under_jit():
  logits = jnp.asarray([0.5, -0.5, 1.5], jnp.float32)

  @jax.jit
  def draw(key):
    return utils.categorical_indices(key, logits, 64)

  idx = np.asarray(draw(jax.random.PRNGKey(0)))
  assert idx.shape == (64,) and idx.dtype == np.int32
  assert idx.min() >= 0 and idx.max() < 3


def test_to_host_complex():
  z = jnp.asarray([[1.0 + 2.0j, -3.0j]], jnp.complex64)
  out = utils.to_host_complex(z)
  assert isinstance(out, np.ndarray)
  np.testing.assert_allclose(out, [[1.0 + 2.0j, -3.0j]], atol=1e-7)


def test_categorical_indices_two_level_matches_searchsorted():
  """The two-level comparison-count path (n > _TWO_LEVEL_MIN) is index-exact
  with side='right' binary search, including zero-mass runs and boundary u."""
  rng = np.random.RandomState(3)
  n = 5000  # > _TWO_LEVEL_MIN, not a power of two (exercises inf padding)
  logits_np = rng.randn(n).astype(np.float32) * 2
  logits_np[100:200] = -np.inf  # zero-mass run
  logits = jnp.asarray(logits_np)
  num = 20000
  idx = np.asarray(utils.categorical_indices(jax.random.PRNGKey(9), logits,
                                             num))
  # Reference insertion indices from the SAME float32 cdf and u stream the
  # implementation computes (numpy's exp/cumsum round differently, so the
  # cdf must come from jax, not be recomputed).
  cdf = np.asarray(jnp.cumsum(jnp.exp(logits - jnp.max(logits))))
  u = np.asarray(
      jax.random.uniform(jax.random.PRNGKey(9), (num,), jnp.float32)
  ) * cdf[-1]
  expected = np.minimum(np.searchsorted(cdf, u, side="right"), n - 1)
  np.testing.assert_array_equal(idx, expected)
  assert not np.isin(idx, np.arange(100, 200)).any()  # zero-mass never drawn


def test_categorical_indices_two_level_distribution():
  """Empirical frequencies match softmax on the large-n path."""
  n = 2**13
  logits = jnp.asarray(np.linspace(-3, 3, n), jnp.float32)
  num = 400_000
  idx = np.asarray(utils.categorical_indices(jax.random.PRNGKey(11), logits,
                                             num))
  assert idx.min() >= 0 and idx.max() < n
  probs = np.asarray(jax.nn.softmax(logits), np.float64)
  # Coarse-grain into 32 buckets for a statistically meaningful comparison.
  freq = np.bincount(idx, minlength=n) / num
  np.testing.assert_allclose(freq.reshape(32, -1).sum(-1),
                             probs.reshape(32, -1).sum(-1), atol=3e-3)
