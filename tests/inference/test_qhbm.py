"""Tests for QHBM inference and Hamiltonian metrics
(analog of reference tests/inference/qhbm_test.py + qhbm_utils_test.py)."""

import numpy as np

import jax.numpy as jnp

from qhbmlib_tpu import models, nn
from qhbmlib_tpu.inference import (ebm, ebm_utils, qhbm, qhbm_utils, qnn,
                                   qnn_utils)
from qhbmlib_tpu.models import circuit_utils
from qhbmlib_tpu.ops import statevector as sv
from tests import test_util


def _simple_qhbm(num_qubits=2, seed=0, num_samples=50000):
  energy = models.BernoulliEnergy(list(range(num_qubits)),
                                  nn.RandomUniform(-1, 1, seed=seed))
  e_infer = ebm.BernoulliEnergyInference(energy, num_samples,
                                         initial_seed=seed + 1)
  circ = models.DirectQuantumCircuit(
      circuit_utils.hardware_efficient_ansatz(num_qubits, 2),
      nn.RandomUniform(-1, 1, seed=seed + 2))
  q_infer = qnn.AnalyticQuantumInference(circ)
  return qhbm.QHBM(e_infer, q_infer)


class TestQHBM:

  def test_circuits_counts_match_probabilities(self):
    """Sample counts follow the EBM distribution (reference
    qhbm_test.py:73-112)."""
    qhbm_infer = _simple_qhbm(2, seed=3)
    n_samples = 100000
    bitstrings, counts = qhbm_infer.circuits(n_samples)
    probs = np.asarray(ebm_utils.probabilities(qhbm_infer.e_inference.energy))
    idx = np.asarray(bitstrings).astype(np.int64) @ np.asarray([2, 1])
    freq = np.zeros(4)
    freq[idx] = np.asarray(counts) / n_samples
    np.testing.assert_allclose(freq, probs, atol=6e-3)

  def test_mutation_changes_samples(self):
    """Changing energy weights changes the sampled circuits (the
    reference's cache-invalidation contract, qhbm_test.py:113-150)."""
    num_qubits = 4
    energy = models.BernoulliEnergy(list(range(num_qubits)),
                                    nn.Constant(3.0))
    e_infer = ebm.BernoulliEnergyInference(energy, 1000, initial_seed=4)
    circ = models.DirectQuantumCircuit(circuit_utils.rx_ansatz(num_qubits))
    qhbm_infer = qhbm.QHBM(e_infer, qnn.AnalyticQuantumInference(circ))
    def weighted_bit_mean(bits, counts):
      bits = np.asarray(bits, np.float64)
      counts = np.asarray(counts, np.float64)
      return (counts[:, None] * bits).sum() / (counts.sum() * bits.shape[1])

    bits1, counts1 = qhbm_infer.circuits(1000)
    # theta=3 -> p(bit=1) = sigmoid(6) ~ 0.998: almost surely all-ones.
    assert weighted_bit_mean(bits1, counts1) > 0.95
    energy.set_trainable_variables([jnp.full([num_qubits], -3.0)])
    bits2, counts2 = qhbm_infer.circuits(1000)
    assert weighted_bit_mean(bits2, counts2) < 0.05

  def test_expectation_matches_density_matrix(self):
    """<obs>_QHBM equals tr(rho obs) from the exact density matrix."""
    qhbm_infer = _simple_qhbm(2, seed=5, num_samples=200000)
    op = test_util.random_pauli_sum(2, 3, seed=6)
    actual = float(qhbm_infer.expectation(op)[0])
    rho = np.asarray(qhbm_utils.density_matrix(qhbm_infer.modular_hamiltonian),
                     np.complex128)
    expected = float(np.real(np.trace(rho @ np.asarray(op.dense()))))
    np.testing.assert_allclose(actual, expected, atol=2e-2)


  def _data_qhbm(self, energy_kind, seed):
    n = 2
    if energy_kind == "kobe":
      energy = models.KOBE(list(range(n)), 2, nn.RandomUniform(-1, 1,
                                                               seed=seed))
    else:
      energy = models.BernoulliEnergy(list(range(n)),
                                      nn.RandomUniform(-1, 1, seed=seed))
    e_infer = ebm.AnalyticEnergyInference(energy, 1000, initial_seed=seed + 1)
    # Distinct symbol prefix: the observable's circuit_dagger is appended to
    # the model circuit, and symbol sets must stay disjoint.
    circ = models.DirectQuantumCircuit(
        circuit_utils.hardware_efficient_ansatz(n, 2, name="data"),
        nn.RandomUniform(-1, 1, seed=seed + 2))
    return qhbm.QHBM(e_infer, qnn.AnalyticQuantumInference(circ))

  def test_expectation_modular_hamiltonian(self):
    """<K_data>_model equals tr(rho_model K_data) with
    K = U diag(E(x)) U^dagger, for Bernoulli and KOBE (PauliMixin) data
    energies (reference qhbm_test.py:211-250)."""
    for energy_kind in ("bernoulli", "kobe"):
      model = _simple_qhbm(2, seed=13, num_samples=200000)
      data = self._data_qhbm(energy_kind, seed=17)
      k_data = data.modular_hamiltonian
      actual = float(model.expectation(k_data)[0])
      u = np.asarray(qnn_utils.unitary(data.q_inference.circuit),
                     np.complex128)
      energies = np.asarray(
          k_data.energy(jnp.asarray(sv.all_bitstrings(2))), np.float64)
      k_dense = u @ np.diag(energies) @ u.conj().T
      rho = np.asarray(
          qhbm_utils.density_matrix(model.modular_hamiltonian), np.complex128)
      expected = float(np.real(np.trace(rho @ k_dense)))
      np.testing.assert_allclose(actual, expected, atol=2e-2,
                                 err_msg=energy_kind)


class TestHamiltonianMetrics:

  def test_probabilities(self):
    energy = models.BernoulliEnergy([0, 1], nn.RandomUniform(-1, 1, seed=7))
    probs = np.asarray(ebm_utils.probabilities(energy), np.float64)
    energies = np.asarray(energy(jnp.asarray(sv.all_bitstrings(2))),
                          np.float64)
    expected = np.exp(-energies) / np.exp(-energies).sum()
    np.testing.assert_allclose(probs, expected, rtol=1e-5)
    np.testing.assert_allclose(probs.sum(), 1.0, rtol=1e-6)

  def test_unitary_is_unitary(self):
    circ = models.DirectQuantumCircuit(
        circuit_utils.hardware_efficient_ansatz(2, 2),
        nn.RandomUniform(-1, 1, seed=8))
    u = np.asarray(qnn_utils.unitary(circ))
    np.testing.assert_allclose(u @ u.conj().T, np.eye(4), atol=1e-5)

  def test_density_matrix_properties(self):
    qhbm_infer = _simple_qhbm(2, seed=9)
    rho = np.asarray(qhbm_utils.density_matrix(qhbm_infer.modular_hamiltonian),
                     np.complex128)
    np.testing.assert_allclose(rho, rho.conj().T, atol=1e-6)  # Hermitian
    np.testing.assert_allclose(np.trace(rho).real, 1.0, atol=1e-5)
    eigs = np.linalg.eigvalsh(rho)
    assert (eigs > -1e-6).all()

  def test_self_fidelity_is_one(self):
    qhbm_infer = _simple_qhbm(2, seed=10)
    model = qhbm_infer.modular_hamiltonian
    rho = qhbm_utils.density_matrix(model)
    f = float(qhbm_utils.fidelity(model, rho))
    np.testing.assert_allclose(f, 1.0, rtol=1e-4)

  def test_fidelity_against_random_state(self):
    """Fidelity vs the dense sqrtm-based oracle."""
    from scipy.linalg import sqrtm
    qhbm_infer = _simple_qhbm(2, seed=11)
    model = qhbm_infer.modular_hamiltonian
    sigma = np.asarray(test_util.random_mixed_density_matrix(2, seed=12),
                       np.complex128)
    actual = float(qhbm_utils.fidelity(model, sigma))
    rho = np.asarray(qhbm_utils.density_matrix(model), np.complex128)
    s = sqrtm(rho)
    expected = float(np.real(np.trace(sqrtm(s @ sigma @ s)))**2)
    np.testing.assert_allclose(actual, expected, rtol=1e-3)
