"""Tests of inference utility modules: ebm_utils, qnn_utils, qhbm_utils.

Mirrors reference tests/inference/{ebm_utils,qnn_utils,qhbm_utils}_test.py.
"""

import jax.numpy as jnp
import numpy as np

from qhbmlib_tpu import models, nn
from qhbmlib_tpu.inference import ebm_utils, qhbm_utils, qnn_utils
from qhbmlib_tpu.models import circuit_utils
from tests import test_util


def test_probabilities_matches_softmax():
  """Exact 2^n enumeration (reference ebm_utils.py:24-36)."""
  energy = models.BernoulliEnergy([0, 1, 2], nn.RandomUniform(-1, 1, seed=2))
  probs = np.asarray(ebm_utils.probabilities(energy))
  bits = np.array([[(i >> (2 - q)) & 1 for q in range(3)] for i in range(8)])
  energies = np.asarray(energy(jnp.asarray(bits, jnp.int8)), np.float64)
  want = np.exp(-energies) / np.sum(np.exp(-energies))
  np.testing.assert_allclose(probs, want, rtol=1e-5)
  np.testing.assert_allclose(np.sum(probs), 1.0, rtol=1e-6)


def test_unitary_is_unitary():
  """Dense unitary extraction (reference qnn_utils.py:23-33)."""
  circuit = models.DirectQuantumCircuit(
      circuit_utils.hardware_efficient_ansatz(3, 2),
      nn.RandomUniform(-1, 1, seed=9))
  u = np.asarray(
      jnp.stack([jnp.real(qnn_utils.unitary(circuit)),
                 jnp.imag(qnn_utils.unitary(circuit))]), np.float64)
  u = u[0] + 1j * u[1]
  np.testing.assert_allclose(u @ u.conj().T, np.eye(8), atol=1e-5)


def test_density_matrix_properties():
  """rho = sum_k p_k U|k><k|U^dagger (reference qhbm_utils.py:24-59)."""
  model, _ = test_util.get_random_hamiltonian_and_inference(
      3, 1, "dm_test", 100, exact=True)
  rho = np.asarray(qhbm_utils.density_matrix(model), np.complex128)
  np.testing.assert_allclose(np.trace(rho), 1.0, atol=1e-5)
  np.testing.assert_allclose(rho, rho.conj().T, atol=1e-6)
  evals = np.linalg.eigvalsh(rho)
  assert np.all(evals > -1e-6)

  # Oracle: build rho by hand from probabilities and the dense unitary.
  probs = np.asarray(ebm_utils.probabilities(model.energy), np.float64)
  u = np.asarray(
      jnp.stack([jnp.real(qnn_utils.unitary(model.circuit)),
                 jnp.imag(qnn_utils.unitary(model.circuit))]), np.float64)
  u = u[0] + 1j * u[1]
  want = (u * probs) @ u.conj().T
  np.testing.assert_allclose(rho, want, atol=1e-5)


def test_fidelity_self_is_one():
  """F(rho, rho) == 1 (reference qhbm_utils_test.py)."""
  model, _ = test_util.get_random_hamiltonian_and_inference(
      2, 1, "fid_self", 100, exact=True)
  rho = qhbm_utils.density_matrix(model)
  fid = float(qhbm_utils.fidelity(model, rho))
  np.testing.assert_allclose(fid, 1.0, rtol=1e-4)


def test_fidelity_against_closed_form():
  """F(rho, sigma) for commuting diagonal states has a closed form."""
  # Diagonal model: identity circuit -> rho diagonal with EBM probs.
  energy = models.BernoulliEnergy([0], nn.Constant(0.3))
  from qhbmlib_tpu.ops import circuit_ir as ir
  identity = ir.CircuitBuilder(1).zp(0, None).build()  # constant ZP(0)=I
  circuit = models.DirectQuantumCircuit(identity)
  model = models.Hamiltonian(energy, circuit)
  rho_diag = np.asarray(ebm_utils.probabilities(model.energy), np.float64)
  sigma_diag = np.array([0.25, 0.75])
  sigma = np.diag(sigma_diag).astype(np.complex128)
  fid = float(qhbm_utils.fidelity(model, sigma))
  want = float(np.sum(np.sqrt(rho_diag * sigma_diag))**2)
  np.testing.assert_allclose(fid, want, rtol=1e-4)
