"""Tests for circuit models (analog of reference
tests/models/circuit_test.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from qhbmlib_tpu import models, nn
from qhbmlib_tpu.models import circuit_utils
from qhbmlib_tpu.ops import circuit_ir as ir
from qhbmlib_tpu.ops import paulis
from qhbmlib_tpu.ops import statevector as sv


def test_direct_circuit_symbol_order():
  b = ir.CircuitBuilder(2)
  b.rx(0, "zeta").ry(1, "alpha")  # IR order: zeta, alpha
  circ = models.DirectQuantumCircuit(b.build(), nn.RandomUniform(0, 1, seed=0))
  # symbol_names sorted: alpha, zeta
  assert tuple(circ.symbol_names) == ("alpha", "zeta")
  vals = jnp.asarray([0.3, 0.9])
  circ.set_trainable_variables([vals])
  resolved = np.asarray(circ.resolved_values)
  # IR slot order is (zeta, alpha) -> resolved = [0.9, 0.3]
  np.testing.assert_allclose(resolved, [0.9, 0.3])


def test_add_disjoint_symbols():
  c1 = models.DirectQuantumCircuit(circuit_utils.rx_ansatz(2, name="a"))
  c2 = models.DirectQuantumCircuit(circuit_utils.rx_ansatz(2, name="b"))
  combined = c1 + c2
  assert len(combined.trainable_variables) == 2
  assert combined.pqc.num_gates == 4
  u = np.asarray(sv.unitary(combined.pqc, combined.resolved_values))
  u1 = np.asarray(sv.unitary(c1.pqc, c1.resolved_values))
  u2 = np.asarray(sv.unitary(c2.pqc, c2.resolved_values))
  np.testing.assert_allclose(u, u2 @ u1, atol=1e-5)


def test_add_shared_symbols_raises():
  c1 = models.DirectQuantumCircuit(circuit_utils.rx_ansatz(2))
  c2 = models.DirectQuantumCircuit(circuit_utils.rx_ansatz(2))
  with pytest.raises(ValueError):
    _ = c1 + c2


def test_add_shares_variables():
  """Summand variable updates propagate to the combined circuit, like the
  reference's shared tf.Variables (reference circuit.py:138-162)."""
  a = models.DirectQuantumCircuit(
      circuit_utils.hardware_efficient_ansatz(2, 1))
  b = models.DirectQuantumCircuit(
      circuit_utils.rx_ansatz(2), name="b")
  total = a + b
  before = np.asarray(total.symbol_values)
  a.set_trainable_variables([v + 0.25 for v in a.trainable_variables])
  b.set_trainable_variables([v - 0.5 for v in b.trainable_variables])
  after = np.asarray(total.symbol_values)
  assert not np.allclose(after, before)
  expected = np.concatenate([np.asarray(v).reshape(-1)
                             for v in a.trainable_variables +
                             b.trainable_variables])
  np.testing.assert_allclose(np.sort(after), np.sort(expected), atol=1e-6)


def test_pow_inverse_shares_variables():
  c = models.DirectQuantumCircuit(
      circuit_utils.hardware_efficient_ansatz(2, 1))
  c_inv = c**-1
  u = np.asarray(sv.unitary(c.pqc, c.resolved_values))
  u_inv = np.asarray(sv.unitary(c_inv.pqc, c_inv.resolved_values))
  np.testing.assert_allclose(u_inv @ u, np.eye(4), atol=1e-5)
  # Updating the original circuit's variables propagates to the inverse.
  c.set_trainable_variables(
      [v + 0.1 for v in c.trainable_variables])
  u2_inv = np.asarray(sv.unitary(c_inv.pqc, c_inv.resolved_values))
  u2 = np.asarray(sv.unitary(c.pqc, c.resolved_values))
  np.testing.assert_allclose(u2_inv @ u2, np.eye(4), atol=1e-5)
  assert not np.allclose(u2_inv, u_inv)


def test_pow_other_exponent_raises():
  c = models.DirectQuantumCircuit(circuit_utils.rx_ansatz(1))
  with pytest.raises(ValueError):
    _ = c**2


def test_qaia_structure_and_values():
  n = 2
  quantum_terms = [paulis.pauli_string(n, {0: "X"}),
                   paulis.pauli_string(n, {1: "X"})]
  classical_terms = [paulis.pauli_string(n, {0: "Z", 1: "Z"})]
  num_layers = 3
  qaia = models.QAIA(quantum_terms, classical_terms, num_layers,
                     initializer=nn.RandomUniform(0, 1, seed=2))
  etas, thetas, gammas = qaia.value_layers_inputs[0]
  assert etas.shape == (num_layers,)
  assert thetas.shape == (1,)
  assert gammas.shape == (num_layers, 2)
  values = np.asarray(qaia.symbol_values)
  # Per layer: [gamma_l0, gamma_l1, eta_l * theta_0]
  expected = np.concatenate([
      np.concatenate([np.asarray(gammas[l]),
                      np.asarray(etas[l] * thetas)]) for l in range(num_layers)
  ])
  np.testing.assert_allclose(values, expected, rtol=1e-6)
  # Simulates without error.
  state = sv.simulate(qaia.pqc, qaia.resolved_values)
  np.testing.assert_allclose(float(jnp.sum(jnp.abs(state)**2)), 1.0,
                             atol=1e-5)


def test_quantum_circuit_bad_symbols_raises():
  b = ir.CircuitBuilder(1)
  b.rx(0, "a")
  with pytest.raises(ValueError):
    models.QuantumCircuit(b.build(), ("b",), [[jnp.zeros(1)]], [[]])


def test_bit_circuit_matches_basis_state():
  """X^b state injection == engine basis_state fast path (analog of the
  reference's QuantumCircuit.call state-prep prepend, circuit_test.py:83)."""
  import jax
  n = 4
  bc = circuit_utils.bit_circuit(n)
  for bits in ([0, 0, 0, 0], [1, 0, 1, 1], [1, 1, 1, 1]):
    values = jnp.asarray(bits, jnp.float32)
    psi = jax.jit(lambda v: sv.apply_circuit(
        bc, v, sv.zero_state(n)))(values)
    expected = jax.jit(lambda: sv.basis_state(
        n, jnp.asarray(bits, jnp.int32)))()
    np.testing.assert_allclose(np.asarray(sv.to_vector(psi)),
                               np.asarray(sv.to_vector(expected)), atol=1e-6)


def test_direct_circuit_default_init_range():
  """Default initializer draws symbol values uniformly in [0, 2) (reference
  circuit_test.py:270 default-init contract)."""
  pqc = circuit_utils.hardware_efficient_ansatz(6, 3)
  circuit = models.DirectQuantumCircuit(pqc)
  values = np.concatenate([np.ravel(v) for v in circuit.trainable_variables])
  assert values.shape[0] == len(circuit.symbol_names)
  assert (values >= 0).all() and (values < 2).all()
  # Two instances draw different values (random, not constant).
  other = models.DirectQuantumCircuit(pqc)
  assert not np.allclose(
      values,
      np.concatenate([np.ravel(v) for v in other.trainable_variables]))


def test_pow_inverse_is_behavioral_identity():
  """Applying c then c**-1 restores the input state (the inverse shares the
  forward's variables, so this also pins the shared-variable semantics)."""
  import jax
  n = 3
  pqc = circuit_utils.hardware_efficient_ansatz(n, 2)
  c = models.DirectQuantumCircuit(pqc)
  inv = c ** -1
  psi0 = jax.jit(lambda: sv.basis_state(
      n, jnp.asarray([1, 0, 1], jnp.int32)))()

  @jax.jit
  def roundtrip(v_fwd, v_inv):
    psi = sv.apply_circuit(c.pqc, v_fwd, psi0)
    return sv.apply_circuit(inv.pqc, v_inv, psi)

  psi = roundtrip(c.symbol_values, inv.symbol_values)
  np.testing.assert_allclose(np.asarray(sv.to_vector(psi)),
                             np.asarray(sv.to_vector(psi0)), atol=1e-5)
