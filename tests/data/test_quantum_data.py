"""Tests of the data layer (mirrors reference tests/data/qhbm_data_test.py,
plus the ThermalStateData extension)."""

import jax.numpy as jnp
import numpy as np

from qhbmlib_tpu import models, nn
from qhbmlib_tpu.data import qhbm_data, thermal_data
from qhbmlib_tpu.inference import ebm, qhbm, qnn, qhbm_utils
from qhbmlib_tpu.models import circuit_utils
from qhbmlib_tpu.ops import paulis
from tests import test_util


def _small_qhbm(n=2, seed=0, samples=20000, name="p"):
  energy = models.BernoulliEnergy(list(range(n)),
                                  nn.RandomUniform(-1, 1, seed=seed))
  e_inf = ebm.BernoulliEnergyInference(energy, samples, initial_seed=seed)
  circuit = models.DirectQuantumCircuit(
      circuit_utils.hardware_efficient_ansatz(n, 1, name=name),
      nn.RandomUniform(-1, 1, seed=seed + 1))
  q_inf = qnn.AnalyticQuantumInference(circuit)
  return qhbm.QHBM(e_inf, q_inf)


def test_qhbm_data_expectation_matches_qhbm():
  """QHBMData.expectation == squeeze of the underlying QHBM expectation
  (reference data/qhbm_data.py:26-39)."""
  h = _small_qhbm(seed=3)
  data = qhbm_data.QHBMData(h)
  obs = paulis.pauli_sum_from_strings(
      2, [(0.7, {0: "Z"}), (-0.4, {0: "X", 1: "X"})])
  got = data.expectation(obs)
  want = h.expectation(obs)
  assert got.shape == ()
  np.testing.assert_allclose(float(got), float(jnp.squeeze(want, 0)),
                             rtol=1e-6)


def test_thermal_state_data_pauli_expectation():
  """tr[rho P] against a hand-built density matrix."""
  # rho = |+><+| on one qubit: <X> = 1, <Z> = 0.
  plus = np.full((2, 2), 0.5, np.complex128)
  data = thermal_data.ThermalStateData(plus)
  x_op = paulis.pauli_sum_from_strings(1, [(1.0, {0: "X"})])
  z_op = paulis.pauli_sum_from_strings(1, [(1.0, {0: "Z"})])
  np.testing.assert_allclose(float(data.expectation(x_op)), 1.0, atol=1e-6)
  np.testing.assert_allclose(float(data.expectation(z_op)), 0.0, atol=1e-6)


def test_thermal_state_data_hamiltonian_expectation():
  """tr[rho K] for a modular Hamiltonian equals the dense contraction."""
  h = _small_qhbm(seed=5)
  model = h.modular_hamiltonian
  rho = np.asarray(
      test_util.random_mixed_density_matrix(2, seed=11), np.complex128)
  data = thermal_data.ThermalStateData(rho)
  got = float(data.expectation(model))

  # Dense oracle: K = U diag(E(x)) U^dagger.
  from qhbmlib_tpu.inference import qnn_utils
  u = np.asarray(
      jnp.stack([jnp.real(qnn_utils.unitary(model.circuit)),
                 jnp.imag(qnn_utils.unitary(model.circuit))])).astype(
                     np.float64)
  u = u[0] + 1j * u[1]
  from qhbmlib_tpu.ops import statevector as sv
  bits = np.asarray(sv.all_bitstrings(2))
  energies = np.asarray(model.energy(jnp.asarray(bits)), np.float64)
  k_dense = (u * energies) @ u.conj().T
  want = float(np.real(np.trace(rho @ k_dense)))
  np.testing.assert_allclose(got, want, rtol=1e-4)


def test_thermal_state_data_as_qmhl_target():
  """Self-consistency: data built from a QHBM's own density matrix gives
  the same modular-Hamiltonian expectation as the QHBM data wrapper."""
  h = _small_qhbm(seed=7, samples=500000)
  # Observable model: same weights, disjoint symbol names (circuit addition
  # requires symbol-disjointness, reference circuit.py:138-162).
  obs_qhbm = _small_qhbm(seed=7, name="k")
  obs_qhbm.modular_hamiltonian.set_weights(
      h.modular_hamiltonian.get_weights())
  model = obs_qhbm.modular_hamiltonian
  rho = qhbm_utils.density_matrix(model)
  exact_data = thermal_data.ThermalStateData(rho)
  sampled_data = qhbm_data.QHBMData(h)
  got_exact = float(exact_data.expectation(model))
  got_sampled = float(sampled_data.expectation(model))
  np.testing.assert_allclose(got_exact, got_sampled, rtol=3e-2)
