"""Pallas adjoint reverse-sweep kernel vs the XLA adjoint (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qhbmlib_tpu.models import circuit_utils
from qhbmlib_tpu.ops import adjoint, pallas_adjoint, pallas_sv, paulis
from qhbmlib_tpu.ops import statevector as sv


def _xla_grad_and_lam(pqc, values, op, g):
  """Reference gradient from the production adjoint path + the lam input
  the kernel consumes."""
  n = pqc.num_qubits
  psi = sv.apply_circuit(pqc, values, sv.zero_state(n))
  lam = sv.apply_pauli_sum(
      psi, paulis.PauliSum(op.codes, jnp.ones_like(op.coeffs), op.num_qubits),
      term_weights=g)
  grad, _, _ = adjoint._bwd(pqc, (values, psi, op), g)
  return psi, lam, grad


def _compare(n, layers, seed=0, atol=2e-4):
  pqc = circuit_utils.hardware_efficient_ansatz(n, layers)
  rng = np.random.RandomState(seed)
  values = jnp.asarray(rng.uniform(-1, 1, pqc.num_symbols), jnp.float32)
  terms = [(1.0, {q: "Z"}) for q in range(n)]
  terms += [(0.7, {0: "X"}), (-0.3, {1: "Z", 2: "Z"})]
  op = paulis.pauli_sum_from_strings(n, terms)
  g = jnp.asarray(rng.uniform(-1, 1, op.num_terms), jnp.float32)
  psi, lam, expected = _xla_grad_and_lam(pqc, values, op, g)
  actual = pallas_adjoint.adjoint_sweep(pqc, values, psi, lam,
                                        interpret=True)
  np.testing.assert_allclose(np.asarray(actual), np.asarray(expected),
                             atol=atol)
  assert np.abs(np.asarray(expected)).max() > 1e-3  # non-trivial gradient


@pytest.mark.skipif(not pallas_adjoint.supported(
    circuit_utils.hardware_efficient_ansatz(9, 1)),
                    reason="pallas TPU backend unavailable")
def test_single_layer_matches_xla_adjoint():
  _compare(9, 1)


@pytest.mark.skipif(not pallas_adjoint.supported(
    circuit_utils.hardware_efficient_ansatz(9, 1)),
                    reason="pallas TPU backend unavailable")
def test_multi_layer_matches_xla_adjoint():
  _compare(9, 3, seed=4)


@pytest.mark.skipif(not pallas_adjoint.supported(
    circuit_utils.hardware_efficient_ansatz(10, 1)),
                    reason="pallas TPU backend unavailable")
def test_minor_and_major_qubits():
  _compare(10, 2, seed=7)
