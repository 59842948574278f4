"""Tests for energy models (analog of reference tests/models/energy_test.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qhbmlib_tpu import models, nn
from qhbmlib_tpu.models import energy_utils
from qhbmlib_tpu.ops import statevector as sv


class TestBernoulliEnergy:

  def test_energy_values(self):
    n = 5
    energy = models.BernoulliEnergy(list(range(n)))
    theta = np.random.RandomState(0).uniform(-2, 2, n).astype(np.float32)
    energy.set_trainable_variables([jnp.asarray(theta)])
    bits = sv.all_bitstrings(n)[:7]
    expected = ((1.0 - 2.0 * bits) * theta).sum(-1)
    actual = np.asarray(energy(jnp.asarray(bits)))
    np.testing.assert_allclose(actual, expected, rtol=1e-6)

  def test_logits(self):
    n = 3
    energy = models.BernoulliEnergy(list(range(n)))
    theta = jnp.asarray([0.1, -0.7, 2.0])
    energy.set_trainable_variables([theta])
    np.testing.assert_allclose(np.asarray(energy.logits), 2 * np.asarray(theta))

  def test_operator_shards(self):
    n = 3
    energy = models.BernoulliEnergy(list(range(n)))
    shards = energy.operator_shards(n)
    assert len(shards) == n
    for i, s in enumerate(shards):
      assert s.num_terms == 1
      assert s.codes[0][i] == 3  # Z
      assert sum(s.codes[0]) == 3

  def test_duplicate_bits_raises(self):
    with pytest.raises(ValueError):
      models.BernoulliEnergy([1, 1, 2])

  def test_operator_expectation(self):
    """Shard Z-expectations of a definite bitstring fed through
    operator_expectation reproduce the direct energy (reference
    energy_test.py:194-232)."""
    n = 5
    energy = models.BernoulliEnergy(list(range(n)))
    theta = np.random.RandomState(3).uniform(-2, 2, n).astype(np.float32)
    energy.set_trainable_variables([jnp.asarray(theta)])
    for bits in sv.all_bitstrings(n)[[0, 7, 19, 31]]:
      spins = jnp.asarray(1.0 - 2.0 * bits, jnp.float32)
      via_op = np.asarray(energy.operator_expectation(spins)).reshape(())
      direct = np.asarray(energy(jnp.asarray(bits)[None])).reshape(())
      np.testing.assert_allclose(via_op, direct, rtol=1e-6)
    # pure variant matches the stateful one
    spins = jnp.asarray(1.0 - 2.0 * sv.all_bitstrings(n)[9], jnp.float32)
    flat = [energy.post_process[0].kernel]
    np.testing.assert_allclose(
        np.asarray(energy.operator_expectation_flat(flat, spins)),
        np.asarray(energy.operator_expectation(spins)), rtol=1e-6)


class TestKOBE:

  def test_energy_values_order2(self):
    n = 4
    order = 2
    energy = models.KOBE(list(range(n)), order)
    num_terms = n + n * (n - 1) // 2
    kernel = np.random.RandomState(1).uniform(-1, 1, num_terms).astype(
        np.float32)
    energy.set_trainable_variables([jnp.asarray(kernel)])
    bits = sv.all_bitstrings(n)
    spins = 1.0 - 2.0 * bits
    # manual parity enumeration: singles then pairs (itertools order)
    import itertools
    feats = []
    for k in range(1, order + 1):
      for combo in itertools.combinations(range(n), k):
        feats.append(np.prod(spins[:, list(combo)], axis=-1))
    feats = np.stack(feats, axis=1)
    expected = feats @ kernel
    actual = np.asarray(energy(jnp.asarray(bits)))
    np.testing.assert_allclose(actual, expected, rtol=1e-5)

  def test_parity_int_path_matches_float_path(self):
    n = 6
    parity = energy_utils.Parity(list(range(n)), 3)
    bits = sv.all_bitstrings(n)
    spins = 1.0 - 2.0 * bits.astype(np.float32)
    float_path = np.asarray(parity.apply(None, jnp.asarray(spins)))
    int_path = np.asarray(parity.apply_to_bits(jnp.asarray(bits)))
    np.testing.assert_allclose(float_path, int_path, atol=1e-6)

  def test_parity_differentiable(self):
    parity = energy_utils.Parity([0, 1, 2], 2)

    def f(spins):
      return jnp.sum(parity.apply(None, spins[None, :]))

    g = jax.grad(f)(jnp.asarray([1.0, -1.0, 1.0]))
    # d/ds0 [s0 + s0 s1 + s0 s2] = 1 + s1 + s2 = 1 - 1 + 1 = 1
    np.testing.assert_allclose(float(g[0]), 1.0, atol=1e-6)

  def test_operator_shards_match_indices(self):
    n = 3
    energy = models.KOBE(list(range(n)), 2)
    shards = energy.operator_shards(n)
    assert len(shards) == 3 + 3
    # First n shards are single-qubit Z.
    for i in range(n):
      assert shards[i].codes[0][i] == 3

  def test_bad_order_raises(self):
    with pytest.raises(ValueError):
      models.KOBE([0, 1], 0)
    with pytest.raises(TypeError):
      models.KOBE([0, 1], 1.5)

  def test_operator_expectation(self):
    """Per-term parity expectations of a definite bitstring fed through
    operator_expectation reproduce the direct KOBE energy (reference
    energy_test.py:269-307)."""
    n = 4
    energy = models.KOBE(list(range(n)), 2)
    num_terms = n + n * (n - 1) // 2
    kernel = np.random.RandomState(7).uniform(-1, 1, num_terms).astype(
        np.float32)
    energy.set_trainable_variables([jnp.asarray(kernel)])
    import itertools
    combos = [c for k in range(1, 3)
              for c in itertools.combinations(range(n), k)]
    for bits in sv.all_bitstrings(n)[[0, 5, 11, 15]]:
      spins = 1.0 - 2.0 * bits
      parities = jnp.asarray(
          [np.prod(spins[list(c)]) for c in combos], jnp.float32)
      via_op = np.asarray(energy.operator_expectation(parities)).reshape(())
      direct = np.asarray(energy(jnp.asarray(bits)[None])).reshape(())
      np.testing.assert_allclose(via_op, direct, rtol=1e-5)


class TestGeneralBitstringEnergy:

  def test_dense_stack(self):
    n = 4
    layers = [
        energy_utils.SpinsFromBitstrings(),
        nn.Dense(8, activation=jax.nn.tanh,
                 kernel_initializer=nn.RandomUniform(-1, 1, seed=3)),
        nn.Dense(1, kernel_initializer=nn.RandomUniform(-1, 1, seed=4)),
        nn.Lambda(lambda x: jnp.squeeze(x, -1)),
    ]
    energy = models.BitstringEnergy(list(range(n)), layers)
    bits = jnp.asarray(sv.all_bitstrings(n))
    out = energy(bits)
    assert out.shape == (2**n,)
    # pure path matches stateful path
    out2 = energy.apply_flat(energy.trainable_variables, bits)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2))
    # differentiable w.r.t. variables
    g = jax.grad(lambda tv: jnp.sum(energy.apply_flat(tv, bits)))(
        energy.trainable_variables)
    assert len(g) == len(energy.trainable_variables)

  def test_set_get_variables_roundtrip(self):
    energy = models.BernoulliEnergy([0, 1, 2])
    new = [jnp.asarray([1.0, 2.0, 3.0])]
    energy.set_trainable_variables(new)
    np.testing.assert_allclose(np.asarray(energy.trainable_variables[0]),
                               [1.0, 2.0, 3.0])

  def test_get_set_weights_keras_parity(self):
    """Weights move via get/set_weights like the reference's Keras models
    (reference baselines/train.py:283-284,
    tests/inference/qmhl_loss_test.py:63)."""
    src = models.KOBE([0, 1, 2], 2, nn.RandomUniform(-2, 2, seed=3))
    dst = models.KOBE([0, 1, 2], 2, nn.RandomUniform(-2, 2, seed=4))
    dst.set_weights(src.get_weights())
    bits = jnp.asarray([[0, 1, 1], [1, 0, 1]], jnp.int32)
    np.testing.assert_allclose(np.asarray(dst(bits)), np.asarray(src(bits)))

    from qhbmlib_tpu.models import circuit_utils
    ca = models.DirectQuantumCircuit(
        circuit_utils.hardware_efficient_ansatz(3, 1),
        nn.RandomUniform(-1, 1, seed=5))
    cb = models.DirectQuantumCircuit(
        circuit_utils.hardware_efficient_ansatz(3, 1),
        nn.RandomUniform(-1, 1, seed=6))
    cb.set_weights(ca.get_weights())
    np.testing.assert_allclose(np.asarray(cb.symbol_values),
                               np.asarray(ca.symbol_values))
