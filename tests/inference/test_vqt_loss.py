"""Tests for the VQT loss (analog of reference
tests/inference/vqt_loss_test.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from qhbmlib_tpu import models, nn
from qhbmlib_tpu.inference import ebm, qnn, qhbm, vqt_loss
from qhbmlib_tpu.models import circuit_utils
from qhbmlib_tpu.ops import paulis
from tests import test_util

CLOSE_RTOL = 2e-2  # reference vqt_loss_test.py:40-43 at 1e6 samples
ZERO_ATOL = 1e-3
NUM_SAMPLES = int(1e6)


def _x_rot_qhbm(num_qubits, seed, num_samples=NUM_SAMPLES, exact=False):
  energy = models.BernoulliEnergy(
      list(range(num_qubits)), nn.RandomUniform(-2, 2, seed=seed))
  e_infer = ebm.BernoulliEnergyInference(energy, num_samples,
                                         initial_seed=seed + 1, exact=exact)
  circ = models.DirectQuantumCircuit(
      circuit_utils.rx_ansatz(num_qubits), nn.RandomUniform(-1, 1, seed=seed))
  q_infer = qnn.AnalyticQuantumInference(circ)
  return qhbm.QHBM(e_infer, q_infer)


class TestVQT:

  def test_loss_value_x_rot(self):
    """Closed-form single-qubit X-rotation fixture with H = sum_i Y_i
    (reference vqt_loss_test.py:133-205)."""
    for num_qubits in [1, 2]:
      qhbm_infer = _x_rot_qhbm(num_qubits, seed=5)
      energy = qhbm_infer.e_inference.energy
      circ = qhbm_infer.q_inference.circuit
      test_h = paulis.pauli_sum_from_strings(
          num_qubits, [(1.0, {q: "Y"}) for q in range(num_qubits)])
      test_beta = 3.7

      thetas = np.asarray(energy.trainable_variables[0], np.float64)
      phis = np.asarray(circ.trainable_variables[0], np.float64)

      actual_expectation = float(jnp.sum(qhbm_infer.expectation(test_h)))
      expected_expectation = np.sum(np.tanh(thetas) * np.sin(phis))
      np.testing.assert_allclose(actual_expectation, expected_expectation,
                                 rtol=CLOSE_RTOL)

      actual_entropy = float(qhbm_infer.e_inference.entropy())
      expected_entropy = np.sum(-thetas * np.tanh(thetas) +
                                np.log(2 * np.cosh(thetas)))
      np.testing.assert_allclose(actual_entropy, expected_entropy,
                                 rtol=CLOSE_RTOL)

      actual_loss = float(vqt_loss.vqt(qhbm_infer, test_h, test_beta))
      expected_loss = test_beta * expected_expectation - expected_entropy
      np.testing.assert_allclose(actual_loss, expected_loss, rtol=CLOSE_RTOL)

      loss_fn = vqt_loss.make_vqt(qhbm_infer, test_h)
      params = qhbm_infer.params
      pure = lambda p: loss_fn(p, jax.random.PRNGKey(3), test_beta)[0]
      grads = test_util.jit_toggle(jax.grad(pure))(params)
      expected_thetas_grads = (1 - np.tanh(thetas)**2) * (
          test_beta * np.sin(phis) + thetas)
      expected_phis_grads = test_beta * np.tanh(thetas) * np.cos(phis)
      np.testing.assert_allclose(np.asarray(grads["theta"][0]),
                                 expected_thetas_grads, rtol=CLOSE_RTOL)
      np.testing.assert_allclose(np.asarray(grads["phi"][0]),
                                 expected_phis_grads, rtol=CLOSE_RTOL)

  def test_loss_value_x_rot_exact_mode(self):
    """Exact-count mode matches the closed form to float32 precision --
    the driver's 1e-6 analytic-path parity bar (BASELINE.md)."""
    num_qubits = 2
    qhbm_infer = _x_rot_qhbm(num_qubits, seed=7, num_samples=1000, exact=True)
    energy = qhbm_infer.e_inference.energy
    circ = qhbm_infer.q_inference.circuit
    test_h = paulis.pauli_sum_from_strings(
        num_qubits, [(1.0, {q: "Y"}) for q in range(num_qubits)])
    test_beta = 2.3
    thetas = np.asarray(energy.trainable_variables[0], np.float64)
    phis = np.asarray(circ.trainable_variables[0], np.float64)

    loss_fn = vqt_loss.make_vqt(qhbm_infer, test_h)
    pure = test_util.jit_toggle(
        lambda p: loss_fn(p, jax.random.PRNGKey(0), test_beta)[0])
    actual_loss = float(pure(qhbm_infer.params))
    expected_loss = test_beta * np.sum(np.tanh(thetas) * np.sin(phis)) - (
        np.sum(-thetas * np.tanh(thetas) + np.log(2 * np.cosh(thetas))))
    np.testing.assert_allclose(actual_loss, expected_loss, atol=2e-6)

    grads = jax.grad(
        lambda p: loss_fn(p, jax.random.PRNGKey(0), test_beta)[0])(
            qhbm_infer.params)
    expected_gt = (1 - np.tanh(thetas)**2) * (test_beta * np.sin(phis) +
                                              thetas)
    expected_gp = test_beta * np.tanh(thetas) * np.cos(phis)
    np.testing.assert_allclose(np.asarray(grads["theta"][0]), expected_gt,
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(grads["phi"][0]), expected_gp,
                               atol=2e-6)

  def test_self_vqt(self):
    """VQT of a model against itself at beta=1 equals -logZ with zero
    gradients (reference vqt_loss_test.py:46-83)."""
    num_qubits = 2
    data_h, data_infer = test_util.get_random_hamiltonian_and_inference(
        num_qubits, 2, "data", 1000, ebm_seed=7, initializer_seed=1,
        exact=True)
    model_h, model_infer = test_util.get_random_hamiltonian_and_inference(
        num_qubits, 2, "model", 1000, ebm_seed=7, initializer_seed=1,
        exact=True)
    model_h.set_weights(data_h.get_weights())

    expected_loss = -1.0 * float(data_infer.e_inference.log_partition())

    loss_fn = vqt_loss.make_vqt(model_infer, data_h)
    params = vqt_loss._vqt_params(model_infer, data_h)
    pure = test_util.jit_toggle(
        lambda p: loss_fn(p, jax.random.PRNGKey(5), 1.0)[0])
    actual_loss = float(pure(params))
    np.testing.assert_allclose(actual_loss, expected_loss, rtol=CLOSE_RTOL)

    grads = test_util.jit_toggle(
        jax.grad(lambda p: loss_fn(p, jax.random.PRNGKey(5), 1.0)[0]))(
            params)
    for g in grads["theta"] + grads["phi"]:
      np.testing.assert_allclose(np.asarray(g), 0.0, atol=ZERO_ATOL)

  def test_hamiltonian_vqt_gradients(self):
    """VQT derivatives w.r.t. both model and data parameters vs stencil
    (reference vqt_loss_test.py:86-130)."""
    num_qubits = 2
    data_h, _ = test_util.get_random_hamiltonian_and_inference(
        num_qubits, 1, "data2", 500, ebm_seed=3, initializer_seed=10,
        exact=True)
    model_h, model_infer = test_util.get_random_hamiltonian_and_inference(
        num_qubits, 1, "model2", 500, ebm_seed=4, initializer_seed=20,
        exact=True)
    beta = 1.7
    loss_fn = vqt_loss.make_vqt(model_infer, data_h)
    params = vqt_loss._vqt_params(model_infer, data_h)
    pure = lambda p: loss_fn(p, jax.random.PRNGKey(11), beta)[0]
    actual = test_util.jit_toggle(jax.grad(pure))(params)
    expected = test_util.approximate_gradient(pure, params)
    flat_a = jax.tree_util.tree_leaves(actual)
    flat_e = jax.tree_util.tree_leaves(expected)
    nonzero = 0
    for a, e in zip(flat_a, flat_e):
      np.testing.assert_allclose(np.asarray(a), np.asarray(e), rtol=5e-2,
                                 atol=5e-4)
      if np.abs(np.asarray(e)).max() > 2e-3:
        nonzero += 1
    assert nonzero >= 3  # model and data gradients both non-trivial
