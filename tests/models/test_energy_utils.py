"""Tests of models.energy_utils (mirrors reference
tests/models/energy_utils_test.py)."""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from qhbmlib_tpu import nn
from qhbmlib_tpu.models import energy_utils


def test_check_bits():
  assert energy_utils.check_bits([1, 5, 3]) == [1, 5, 3]
  with pytest.raises(ValueError):
    energy_utils.check_bits([1, 1, 2])


def test_check_order():
  assert energy_utils.check_order(2) == 2
  with pytest.raises(ValueError):
    energy_utils.check_order(0)
  with pytest.raises(TypeError):
    energy_utils.check_order(1.5)


def test_spins_from_bitstrings():
  """Reference energy_utils.py:39-52: b -> 1 - 2b."""
  layer = energy_utils.SpinsFromBitstrings()
  bits = jnp.asarray([[0, 1, 0], [1, 1, 0]], jnp.int8)
  out = layer.apply(None, bits)
  np.testing.assert_array_equal(np.asarray(out),
                                [[1.0, -1.0, 1.0], [-1.0, -1.0, 1.0]])


def test_variable_dot():
  """Trainable dot product (reference energy_utils.py:55-81)."""
  layer = energy_utils.VariableDot(nn.Constant(0.5))
  layer.build((None, 4))
  x = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
  out = layer.apply(layer.variables, x)
  np.testing.assert_allclose(np.asarray(out), [0.5 * 10.0], rtol=1e-6)
  assert layer.kernel.shape == (4,)


def test_parity_enumeration():
  """Parity layer lists all <=order combinations (reference
  energy_utils.py:84-110)."""
  n, order = 4, 2
  layer = energy_utils.Parity(list(range(n)), order)
  expect_terms = n + n * (n - 1) // 2
  assert layer.num_terms == expect_terms

  # Products of spins match the explicit combinatorial formula.
  bits = np.array([[0, 1, 1, 0], [1, 0, 1, 1]], np.int8)
  spins = 1.0 - 2.0 * bits.astype(np.float64)
  out = np.asarray(layer.apply(None, jnp.asarray(spins, jnp.float32)))
  combos = [c for k in range(1, order + 1)
            for c in itertools.combinations(range(n), k)]
  for b in range(2):
    for t, combo in enumerate(combos):
      np.testing.assert_allclose(out[b, t], np.prod(spins[b, list(combo)]),
                                 rtol=1e-6)


def test_parity_bits_path_matches_spin_path():
  n, order = 5, 3
  layer = energy_utils.Parity(list(range(n)), order)
  rng = np.random.RandomState(0)
  bits = rng.randint(0, 2, size=(8, n)).astype(np.int8)
  spins = 1.0 - 2.0 * bits.astype(np.float32)
  via_spins = np.asarray(layer.apply(None, jnp.asarray(spins)))
  via_bits = np.asarray(layer.apply_to_bits(jnp.asarray(bits)))
  np.testing.assert_allclose(via_spins, via_bits, atol=1e-6)
