"""Pallas adjoint reverse-sweep kernel vs the XLA adjoint (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qhbmlib_tpu.models import circuit_utils
from qhbmlib_tpu.ops import adjoint, pallas_adjoint, paulis
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


@pytest.mark.skipif(not pallas_adjoint.supported(
    circuit_utils.hardware_efficient_ansatz(9, 1)),
                    reason="pallas TPU backend unavailable")
@pytest.mark.parametrize("layers", [1, 3])
def test_batched_sweep_matches_xla(layers, monkeypatch):
  """Grid-over-batch reverse sweep: batch-summed gradients vs the per-state
  XLA sweep summed by hand."""
  # Hermetic precision: under 'default' the kernel uses bf16 planes while
  # the XLA CPU reference stays f32 -- an expected divergence on TPU too.
  monkeypatch.setenv("QHBM_MATMUL_PRECISION", "high")
  n, batch = 9, 4
  pqc = circuit_utils.hardware_efficient_ansatz(n, layers)
  rng = np.random.RandomState(layers)
  values = jnp.asarray(rng.uniform(-1, 1, pqc.num_symbols), jnp.float32)
  bits = jnp.asarray(rng.randint(0, 2, (batch, n)), jnp.int8)
  terms = [(1.0, {q: "Z", (q + 1) % n: "Z"}) for q in range(n - 1)]
  terms += [(0.7, {q: "X"}) for q in range(n)]
  op = paulis.pauli_sum_from_strings(n, terms)
  g = jnp.asarray(rng.uniform(-1, 1, (batch, op.num_terms)), jnp.float32)
  ones_op = paulis.PauliSum(op.codes, jnp.ones_like(op.coeffs), n)
  psis, lams, grads = [], [], []
  for i in range(batch):
    psi = sv.apply_circuit(pqc, values, sv.basis_state(n, bits[i]))
    lam = sv.apply_pauli_sum(psi, ones_op, term_weights=g[i])
    psis.append(psi)
    lams.append(lam)
    grads.append(
        adjoint._xla_reverse_sweep(pqc, op, g[i], values, psi, lam))
  expected = sum(grads)
  actual = pallas_adjoint.adjoint_sweep_batched(
      pqc, values, jnp.stack(psis), jnp.stack(lams), interpret=True)
  np.testing.assert_allclose(np.asarray(actual), np.asarray(expected),
                             atol=2e-4)
  assert np.abs(np.asarray(expected)).max() > 1e-3


def test_batched_dispatch_cpu_equivalence(monkeypatch):
  """QHBM_PALLAS_BATCHED=1 on a CPU lowering takes the default branches
  (reorganized forward + _xla_states_sweep) and must match the plain path
  bit-for-bit in loss and gradient, including batch padding."""
  n, layers, batch = 10, 2, 6  # batch 6, chunk 4 -> padding exercised
  pqc = circuit_utils.hardware_efficient_ansatz(n, layers)
  rng = np.random.RandomState(7)
  values = jnp.asarray(rng.uniform(-1, 1, pqc.num_symbols), jnp.float32)
  bits = jnp.asarray(rng.randint(0, 2, (batch, n)), jnp.int8)
  terms = [(1.0, {q: "Z", (q + 1) % n: "Z"}) for q in range(n - 1)]
  terms += [(0.7, {q: "X"}) for q in range(n)]
  op = paulis.pauli_sum_from_strings(n, terms)
  w = jnp.asarray(rng.uniform(-1, 1, batch), jnp.float32)

  def loss(v):
    e = adjoint.batched_expectations(pqc, v, bits, (op,), batch_chunk=4)
    return jnp.sum(w * e[:, 0])

  monkeypatch.setenv("QHBM_PALLAS_BATCHED", "0")
  l0, g0 = jax.value_and_grad(loss)(values)
  monkeypatch.setenv("QHBM_PALLAS_BATCHED", "1")
  l1, g1 = jax.value_and_grad(loss)(values)
  np.testing.assert_allclose(float(l0), float(l1), atol=1e-5)
  np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), atol=1e-5)
