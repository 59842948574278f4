"""Adjoint differentiation for analytic expectation values.

Replaces TFQ's C++ adjoint-gradient path behind `tfq.layers.Expectation`
(reference: qhbmlib/inference/qnn.py:112,134-138) with a JAX `custom_vjp`:

  forward:  one sweep |psi> = U_G ... U_1 |psi_0>, then <psi|P_t|psi> per term.
  backward: a single reverse sweep that *un-applies* each gate, so memory is
            O(2^n) (three state buffers) instead of O(num_gates * 2^n) as with
            naive autodiff through the simulator.  This is what makes deep
            ansatze trainable at high qubit counts on TPU.

The primitive returns per-term expectations; coefficient contraction happens
outside so PauliSum coefficient gradients flow via ordinary autodiff.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from qhbmlib_tpu.ops import circuit_ir as ir
from qhbmlib_tpu.ops import paulis
from qhbmlib_tpu.ops import statevector as sv


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def adjoint_term_expectations(circuit: ir.Circuit,
                              symbol_values: jnp.ndarray,
                              init_state: jnp.ndarray,
                              op: paulis.PauliSum) -> jnp.ndarray:
  """Per-term expectations <psi(values)|P_t|psi(values)>, shape [num_terms].

  Differentiable w.r.t. `symbol_values` via the adjoint method, and w.r.t.
  `op.coeffs` trivially (the primitive's output does not depend on coeffs;
  contraction happens in `expectation`).  `init_state` is treated as
  non-differentiable data (basis states in the QHBM use case).
  """
  psi = sv.apply_circuit(circuit, symbol_values, init_state)
  return sv.expectation_terms(psi, op)


def _fwd(circuit, symbol_values, init_state, op):
  psi = sv.apply_circuit(circuit, symbol_values, init_state)
  terms = sv.expectation_terms(psi, op)
  return terms, (symbol_values, psi, op)


def _bwd(circuit, res, g):
  """g: cotangent [num_terms].  One reverse sweep over the gates."""
  symbol_values, psi, op = res
  # lambda = sum_t g_t P_t |psi>; then dE/dtheta_k = 2 Re <lambda|dU_k|psi_{k-1}>
  lam = sv.apply_pauli_sum(psi, paulis.PauliSum(op.codes,
                                                jnp.ones_like(op.coeffs),
                                                op.num_qubits),
                           term_weights=g)
  grad = jnp.zeros_like(symbol_values)
  a = psi  # state after gate k (runs backward)
  for gate in reversed(circuit.gates):
    angle = sv.resolve_angle(gate, symbol_values)
    # un-apply gate k: a becomes psi_{k-1}
    a = _apply_inverse(gate, angle, a)
    if gate.slot >= 0:
      d_psi = sv.apply_gate_dangle(gate, angle, a)
      dangle = 2.0 * jnp.real(
          jnp.sum(jnp.conj(lam.reshape(-1)) * d_psi.reshape(-1)))
      grad = grad.at[gate.slot].add(gate.coeff * dangle)
    lam = _apply_inverse(gate, angle, lam)
  zero_state = jnp.zeros_like(psi)
  zero_coeffs = jax.tree_util.tree_map(
      jnp.zeros_like,
      paulis.PauliSum(op.codes, op.coeffs, op.num_qubits))
  return grad, zero_state, zero_coeffs


def _apply_inverse(gate: ir.Gate, angle, state):
  inv = ir.Gate(gate.kind, gate.qubits, -1, 0.0, 0.0, gate.paulis)
  return sv.apply_gate(inv, -angle, state)


adjoint_term_expectations.defvjp(_fwd, _bwd)


def expectation(circuit: ir.Circuit,
                symbol_values: jnp.ndarray,
                init_state: jnp.ndarray,
                op: paulis.PauliSum) -> jnp.ndarray:
  """<psi(values)| op |psi(values)> with adjoint gradients, real scalar."""
  terms = adjoint_term_expectations(circuit, symbol_values, init_state, op)
  return jnp.sum(terms * jnp.real(op.coeffs))


def batched_expectations(circuit: ir.Circuit,
                         symbol_values: jnp.ndarray,
                         init_bits: jnp.ndarray,
                         ops: Tuple[paulis.PauliSum, ...]) -> jnp.ndarray:
  """Expectations of each op against U|b> for each bitstring b.

  All terms of all ops are concatenated into ONE PauliSum so each batch
  element costs exactly one forward sweep plus one adjoint backward sweep,
  regardless of how many observables are measured.

  Args:
    circuit: static circuit IR.
    symbol_values: [num_symbols] current parameter values.
    init_bits: [batch, n] int bitstrings; each becomes a basis init state.
    ops: tuple of PauliSums (e.g. operator shards).

  Returns:
    [batch, len(ops)] float32 expectations, adjoint-differentiable w.r.t.
    `symbol_values` and each op's coefficients.
  """
  n = circuit.num_qubits
  all_codes = tuple(row for op in ops for row in op.codes)
  all_coeffs = jnp.concatenate([jnp.atleast_1d(op.coeffs) for op in ops])
  big = paulis.PauliSum(all_codes, all_coeffs, n)
  # Static slices: which rows of the concatenated terms belong to which op.
  slices = []
  start = 0
  for op in ops:
    slices.append((start, start + op.num_terms))
    start += op.num_terms

  def one(bits):
    init = sv.basis_state(n, bits)
    terms = adjoint_term_expectations(circuit, symbol_values, init, big)
    weighted = terms * jnp.real(all_coeffs)
    return jnp.stack([jnp.sum(weighted[a:b]) for a, b in slices])

  return jax.vmap(one)(init_bits)
