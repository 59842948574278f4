"""Tests for the QMHL loss (analog of reference
tests/inference/qmhl_loss_test.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from qhbmlib_tpu import data as data_module
from qhbmlib_tpu import models
from qhbmlib_tpu.inference import ebm, qnn, qhbm, qmhl_loss
from qhbmlib_tpu.models import circuit_utils
from tests import test_util

CLOSE_RTOL = 3e-2


class TestQMHL:

  def test_self_qmhl(self):
    """QMHL loss of a model against itself equals the model entropy at the
    optimum, with zero gradients (reference qmhl_loss_test.py:48-80)."""
    num_qubits = 2
    data_h, data_infer = test_util.get_random_hamiltonian_and_inference(
        num_qubits, 2, "data", 1000, ebm_seed=3, initializer_seed=2,
        exact=True)
    model_h, model_infer = test_util.get_random_hamiltonian_and_inference(
        num_qubits, 2, "model", 1000, ebm_seed=3, initializer_seed=2,
        exact=True)
    model_h.set_weights(data_h.get_weights())
    qdata = data_module.QHBMData(data_infer)

    expected = float(model_infer.e_inference.entropy())
    loss_fn = qmhl_loss.make_qmhl(qdata, model_infer)
    params = {"model": model_infer.params, "data": data_infer.params}
    pure = lambda p: loss_fn(p, jax.random.PRNGKey(1))[0]
    actual = float(test_util.jit_toggle(pure)(params))
    np.testing.assert_allclose(actual, expected, rtol=CLOSE_RTOL)

    grads = test_util.jit_toggle(jax.grad(pure))(params)
    for g in grads["model"]["theta"] + grads["model"]["phi"]:
      np.testing.assert_allclose(np.asarray(g), 0.0, atol=2e-3)

  def test_loss_value_x_rot(self):
    """Closed-form QMHL fixture: data is Y-rotated product states
    (analog of reference qmhl_loss_test.py:136-272).

    Data: each qubit in thermal state of Bernoulli EBM with theta_d, rotated
    by RX(phi_d).  Model: Bernoulli EBM theta_m + RX(phi_m) ansatz.
    QMHL = <K_model>_data + logZ_model; per qubit with H_m = theta_m *
    (rotated Z), the closed form follows from single-qubit algebra.
    """
    num_qubits = 2
    rng = np.random.RandomState(9)
    theta_d = rng.uniform(-1.5, 1.5, num_qubits).astype(np.float32)
    phi_d = rng.uniform(-1.0, 1.0, num_qubits).astype(np.float32)
    theta_m = rng.uniform(-1.5, 1.5, num_qubits).astype(np.float32)
    phi_m = rng.uniform(-1.0, 1.0, num_qubits).astype(np.float32)

    def build(thetas, phis, seed, num_samples=int(2e5), exact=True):
      energy = models.BernoulliEnergy(list(range(num_qubits)))
      energy.set_trainable_variables([jnp.asarray(thetas)])
      e_infer = ebm.BernoulliEnergyInference(energy, num_samples,
                                             initial_seed=seed, exact=exact)
      circ = models.DirectQuantumCircuit(
          circuit_utils.rx_ansatz(num_qubits, name=f"phi_s{seed}"))
      circ.set_trainable_variables([jnp.asarray(phis)])
      q_infer = qnn.AnalyticQuantumInference(circ)
      return qhbm.QHBM(e_infer, q_infer)

    data_qhbm = build(theta_d, phi_d, seed=1)
    model_qhbm = build(theta_m, phi_m, seed=2)
    qdata = data_module.QHBMData(data_qhbm)

    actual = float(qmhl_loss.qmhl(qdata, model_qhbm))

    # Closed form.  Data thermal state per qubit: rho_d = RX(phi_d)
    # diag(p, 1-p) RX(phi_d)^dag with p = e^-theta / (2cosh theta)
    # (bit 0 has spin +1 -> energy +theta).  Model K per qubit:
    # theta_m RX(phi_m) Z RX(phi_m)^dag.
    # <K>_data = theta_m * tanh(-theta_d)... derive via Bloch vectors:
    # rho_d Bloch vector: r = tanh(theta_d) * (0, sin(phi_d), -cos(phi_d))
    #   [diag(p,1-p) has z-component p-(1-p) = -tanh(theta_d); RX rotation
    #    about x: z -> z cos(phi) ... y -> ...]
    # K Bloch: theta_m * (0, sin(phi_m), cos(phi_m)) on (y, z)?  Compute
    # numerically instead to avoid sign slip:
    def rx(phi):
      return np.array([[np.cos(phi / 2), -1j * np.sin(phi / 2)],
                       [-1j * np.sin(phi / 2), np.cos(phi / 2)]])

    z = np.diag([1.0, -1.0])
    expected = 0.0
    for q in range(num_qubits):
      p = np.exp(-theta_d[q]) / (2 * np.cosh(theta_d[q]))
      rho = rx(phi_d[q]) @ np.diag([p, 1 - p]) @ rx(phi_d[q]).conj().T
      k = theta_m[q] * rx(phi_m[q]) @ z @ rx(phi_m[q]).conj().T
      expected += np.real(np.trace(rho @ k))
      expected += np.log(2 * np.cosh(theta_m[q]))
    np.testing.assert_allclose(actual, expected, rtol=CLOSE_RTOL)

  def test_qmhl_gradients_match_stencil(self):
    num_qubits = 2
    data_h, data_infer = test_util.get_random_hamiltonian_and_inference(
        num_qubits, 1, "datag", 500, ebm_seed=5, initializer_seed=30,
        exact=True)
    model_h, model_infer = test_util.get_random_hamiltonian_and_inference(
        num_qubits, 1, "modelg", 500, ebm_seed=6, initializer_seed=40,
        exact=True)
    qdata = data_module.QHBMData(data_infer)
    loss_fn = qmhl_loss.make_qmhl(qdata, model_infer)
    params = {"model": model_infer.params, "data": data_infer.params}
    pure = lambda p: loss_fn(p, jax.random.PRNGKey(21))[0]
    actual = test_util.jit_toggle(
        jax.grad(lambda p: pure({"model": p, "data": params["data"]})))(
            params["model"])
    expected = test_util.approximate_gradient(
        lambda p: pure({"model": p, "data": params["data"]}),
        params["model"])
    flat_a = jax.tree_util.tree_leaves(actual)
    flat_e = jax.tree_util.tree_leaves(expected)
    assert any(np.abs(np.asarray(e)).max() > 2e-3 for e in flat_e)
    for a, e in zip(flat_a, flat_e):
      np.testing.assert_allclose(np.asarray(a), np.asarray(e), rtol=5e-2,
                                 atol=5e-4)
