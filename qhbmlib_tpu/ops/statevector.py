"""TPU-native statevector simulation engine.

This is the rebuilt L1 of the reference stack: it replaces TFQ's C++ qsim ops
(`tfq.layers.Expectation` / `SampledExpectation` / `Sample` / `Unitary`;
reference: qhbmlib/inference/qnn.py:112,134-138,166-167 and
qhbmlib/inference/qnn_utils.py:29-33) with pure JAX/XLA functions over a
``(2,) * n`` complex statevector:

  * gates apply as small tensordots (XLA fuses and tiles these onto the VPU/MXU),
  * Pauli strings apply as axis flips + rank-1 phase broadcasts (no gathers),
  * sampling is `|psi|^2` -> categorical / bincount (static shapes),
  * the dense unitary is the circuit vmapped over identity columns.

Qubit-index convention matches cirq: qubit 0 is the most significant bit of
the computational-basis index, i.e. axis q of the state tensor is qubit q.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qhbmlib_tpu.ops import circuit_ir as ir
from qhbmlib_tpu.ops import paulis

COMPLEX_DTYPE = jnp.complex64


# ---------------------------------------------------------------------------
# Gate matrices
# ---------------------------------------------------------------------------

def _one_qubit_rot(angle, axis: str):
  """exp(-i*angle/2 * P) for P in {X, Y, Z}."""
  c = jnp.cos(angle / 2).astype(COMPLEX_DTYPE)
  s = jnp.sin(angle / 2).astype(COMPLEX_DTYPE)
  if axis == "x":
    return jnp.stack([jnp.stack([c, -1j * s]), jnp.stack([-1j * s, c])])
  if axis == "y":
    return jnp.stack([jnp.stack([c, -s]), jnp.stack([s, c])])
  # z
  zero = jnp.zeros((), COMPLEX_DTYPE)
  e_m = jnp.exp(-1j * angle.astype(COMPLEX_DTYPE) / 2)
  e_p = jnp.exp(1j * angle.astype(COMPLEX_DTYPE) / 2)
  return jnp.stack([jnp.stack([e_m, zero]), jnp.stack([zero, e_p])])


_H = np.array([[1, 1], [1, -1]], dtype=np.complex64) / np.sqrt(2.0)
_XX = np.kron(paulis._PAULI_MATS[1], paulis._PAULI_MATS[1])
_YY = np.kron(paulis._PAULI_MATS[2], paulis._PAULI_MATS[2])
_ZZ = np.kron(paulis._PAULI_MATS[3], paulis._PAULI_MATS[3])


def _involution_power(angle, mat, dim):
  """cirq-convention G**t for involution G: exp(i*phi/2)*exp(-i*phi/2*G).

  Here `angle` is already phi = pi * t.
  """
  angle = angle.astype(COMPLEX_DTYPE)
  phase = jnp.exp(1j * angle / 2)
  eye = jnp.eye(dim, dtype=COMPLEX_DTYPE)
  g = jnp.asarray(mat, COMPLEX_DTYPE)
  return phase * (jnp.cos(angle / 2) * eye - 1j * jnp.sin(angle / 2) * g)


def gate_matrix(kind: str, angle) -> jnp.ndarray:
  """Dense matrix of a (non-PROT) gate given its resolved angle parameter.

  For power gates the parameter is the cirq exponent t; for rotations it is
  the rotation angle theta.
  """
  angle = jnp.asarray(angle, jnp.float32)
  if kind == ir.RX:
    return _one_qubit_rot(angle, "x")
  if kind == ir.RY:
    return _one_qubit_rot(angle, "y")
  if kind == ir.RZ:
    return _one_qubit_rot(angle, "z")
  if kind == ir.XP:
    return _involution_power(np.pi * angle, paulis._PAULI_MATS[1], 2)
  if kind == ir.YP:
    return _involution_power(np.pi * angle, paulis._PAULI_MATS[2], 2)
  if kind == ir.ZP:
    zero = jnp.zeros((), COMPLEX_DTYPE)
    one = jnp.ones((), COMPLEX_DTYPE)
    ph = jnp.exp(1j * np.pi * angle.astype(COMPLEX_DTYPE))
    return jnp.stack([jnp.stack([one, zero]), jnp.stack([zero, ph])])
  if kind == ir.HP:
    return _involution_power(np.pi * angle, _H, 2)
  if kind == ir.CZP:
    ph = jnp.exp(1j * np.pi * angle.astype(COMPLEX_DTYPE))
    d = jnp.stack([jnp.ones((), COMPLEX_DTYPE)] * 3 + [ph])
    return jnp.diag(d)
  if kind == ir.CXP:
    top = jnp.eye(2, dtype=COMPLEX_DTYPE)
    bottom = _involution_power(np.pi * angle, paulis._PAULI_MATS[1], 2)
    zeros = jnp.zeros((2, 2), COMPLEX_DTYPE)
    return jnp.block([[top, zeros], [zeros, bottom]])
  if kind == ir.XXP:
    return _involution_power(np.pi * angle, _XX, 4)
  if kind == ir.YYP:
    return _involution_power(np.pi * angle, _YY, 4)
  if kind == ir.ZZP:
    return _involution_power(np.pi * angle, _ZZ, 4)
  raise ValueError(f"no dense matrix for gate kind {kind!r}")


# ---------------------------------------------------------------------------
# State initialization
# ---------------------------------------------------------------------------

def zero_state(num_qubits: int) -> jnp.ndarray:
  state = jnp.zeros((2**num_qubits,), COMPLEX_DTYPE).at[0].set(1.0)
  return state.reshape((2,) * num_qubits)


def basis_state(num_qubits: int, bits: jnp.ndarray) -> jnp.ndarray:
  """|b> for a bitstring `bits` of shape [num_qubits].

  This is the TPU-native replacement for the reference's X^b `bit_circuit`
  state-injection (reference: qhbmlib/models/circuit_utils.py:23-29): basis
  states are written directly instead of prepending X gates.
  """
  idx = bits_to_index(bits, num_qubits)
  state = jnp.zeros((2**num_qubits,), COMPLEX_DTYPE).at[idx].set(1.0)
  return state.reshape((2,) * num_qubits)


def bits_to_index(bits: jnp.ndarray, num_qubits: int) -> jnp.ndarray:
  """Big-endian bitstring -> flat basis index (int32)."""
  weights = jnp.asarray(2**np.arange(num_qubits - 1, -1, -1, dtype=np.int64),
                        jnp.int32)
  return jnp.sum(bits.astype(jnp.int32) * weights, axis=-1)


def index_to_bits(idx: jnp.ndarray, num_qubits: int) -> jnp.ndarray:
  """Flat basis index -> big-endian bitstring (int8), last dim num_qubits."""
  shifts = jnp.asarray(np.arange(num_qubits - 1, -1, -1), jnp.int32)
  return ((idx[..., None] >> shifts) & 1).astype(jnp.int8)


def all_bitstrings(num_qubits: int) -> np.ndarray:
  """[2^n, n] int8 enumeration in ascending index order (static)."""
  idx = np.arange(2**num_qubits, dtype=np.int64)
  shifts = np.arange(num_qubits - 1, -1, -1)
  return ((idx[:, None] >> shifts) & 1).astype(np.int8)


# ---------------------------------------------------------------------------
# Gate application
# ---------------------------------------------------------------------------

def _apply_dense(mat: jnp.ndarray, qubits: Tuple[int, ...],
                 state: jnp.ndarray) -> jnp.ndarray:
  k = len(qubits)
  mat_t = mat.reshape((2,) * (2 * k))
  out = jnp.tensordot(mat_t, state, axes=(tuple(range(k, 2 * k)), qubits))
  return jnp.moveaxis(out, tuple(range(k)), qubits)


def apply_pauli_string(state: jnp.ndarray,
                       codes: Sequence[int]) -> jnp.ndarray:
  """P|psi> for a static Pauli code row (0=I,1=X,2=Y,3=Z).

  Z and the Y-phase are rank-1 broadcasts along the qubit axis; X/Y flips are
  axis reversals.  Everything fuses into one elementwise pass under XLA.
  """
  n = state.ndim
  flip_axes = []
  for q, c in enumerate(codes):
    if c == paulis.X:
      flip_axes.append(q)
    elif c == paulis.Y:
      # Y = flip o diag(i, -i)
      phase = jnp.asarray([1j, -1j], COMPLEX_DTYPE).reshape(
          (1,) * q + (2,) + (1,) * (n - q - 1))
      state = state * phase
      flip_axes.append(q)
    elif c == paulis.Z:
      phase = jnp.asarray([1.0, -1.0], COMPLEX_DTYPE).reshape(
          (1,) * q + (2,) + (1,) * (n - q - 1))
      state = state * phase
  if flip_axes:
    state = jnp.flip(state, axis=flip_axes)
  return state


def apply_pauli_sum(state: jnp.ndarray, op: paulis.PauliSum,
                    term_weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
  """(sum_t w_t * coeffs[t] * P_t)|psi>."""
  out = jnp.zeros_like(state)
  for t in range(op.num_terms):
    w = op.coeffs[t].astype(COMPLEX_DTYPE)
    if term_weights is not None:
      w = w * term_weights[t].astype(COMPLEX_DTYPE)
    out = out + w * apply_pauli_string(state, op.codes[t])
  return out


def resolve_angle(gate: ir.Gate, symbol_values: jnp.ndarray):
  if gate.slot < 0:
    return jnp.asarray(gate.shift, jnp.float32)
  return gate.coeff * symbol_values[gate.slot] + gate.shift


def apply_gate(gate: ir.Gate, angle, state: jnp.ndarray) -> jnp.ndarray:
  """Applies one gate with a resolved angle to the state."""
  if gate.kind == ir.PROT:
    # exp(-i*angle*P) = cos(angle) I - i sin(angle) P
    codes = [0] * state.ndim
    for q, p in zip(gate.qubits, gate.paulis):
      codes[q] = p
    p_state = apply_pauli_string(state, codes)
    a = jnp.asarray(angle, jnp.float32).astype(COMPLEX_DTYPE)
    return jnp.cos(a) * state - 1j * jnp.sin(a) * p_state
  if gate.kind == ir.GPHASE:
    a = jnp.asarray(angle, jnp.float32).astype(COMPLEX_DTYPE)
    return jnp.exp(1j * a) * state
  mat = gate_matrix(gate.kind, angle)
  return _apply_dense(mat, gate.qubits, state)


def apply_gate_dangle(gate: ir.Gate, angle, state: jnp.ndarray) -> jnp.ndarray:
  """(dU/dangle)|psi> -- used by the adjoint differentiation backward sweep."""
  if gate.kind == ir.PROT:
    codes = [0] * state.ndim
    for q, p in zip(gate.qubits, gate.paulis):
      codes[q] = p
    p_state = apply_pauli_string(state, codes)
    a = jnp.asarray(angle, jnp.float32).astype(COMPLEX_DTYPE)
    return -jnp.sin(a) * state - 1j * jnp.cos(a) * p_state
  if gate.kind == ir.GPHASE:
    a = jnp.asarray(angle, jnp.float32).astype(COMPLEX_DTYPE)
    return 1j * jnp.exp(1j * a) * state
  angle = jnp.asarray(angle, jnp.float32)
  _, dmat = jax.jvp(lambda a: gate_matrix(gate.kind, a), (angle,),
                    (jnp.ones_like(angle),))
  return _apply_dense(dmat, gate.qubits, state)


def apply_circuit(circuit: ir.Circuit,
                  symbol_values: jnp.ndarray,
                  state: jnp.ndarray,
                  angle_offsets: Optional[jnp.ndarray] = None) -> jnp.ndarray:
  """Applies the whole circuit.  `angle_offsets[g]` (optional, [num_gates])
  is added to gate g's resolved angle -- the hook used by the parameter-shift
  differentiator to shift individual gate occurrences.
  """
  for g_idx, gate in enumerate(circuit.gates):
    angle = resolve_angle(gate, symbol_values)
    if angle_offsets is not None:
      angle = angle + angle_offsets[g_idx]
    state = apply_gate(gate, angle, state)
  return state


# ---------------------------------------------------------------------------
# Measurement / metrics
# ---------------------------------------------------------------------------

def expectation_terms(state: jnp.ndarray, op: paulis.PauliSum) -> jnp.ndarray:
  """Per-term real expectations <psi|P_t|psi>, shape [num_terms].

  Coefficients are NOT applied; dot with `op.coeffs` outside so that
  coefficient gradients flow through plain autodiff.
  """
  flat = state.reshape(-1).conj()
  vals = []
  for t in range(op.num_terms):
    p_state = apply_pauli_string(state, op.codes[t])
    vals.append(jnp.real(jnp.sum(flat * p_state.reshape(-1))))
  return jnp.stack(vals)


def expectation(state: jnp.ndarray, op: paulis.PauliSum) -> jnp.ndarray:
  """<psi| op |psi> as a real scalar."""
  return jnp.sum(expectation_terms(state, op) * jnp.real(op.coeffs))


def probabilities(state: jnp.ndarray) -> jnp.ndarray:
  return jnp.abs(state.reshape(-1))**2


def sample_indices(key: jax.Array, state: jnp.ndarray,
                   num_samples: int) -> jnp.ndarray:
  """Draws basis-state indices from |psi|^2.  Shape [num_samples], int32."""
  probs = probabilities(state)
  logits = jnp.log(jnp.maximum(probs, 1e-38))
  return jax.random.categorical(key, logits, shape=(num_samples,))


def sample_bitstrings(key: jax.Array, state: jnp.ndarray,
                      num_samples: int) -> jnp.ndarray:
  """Measurement bitstrings [num_samples, n] int8 from |psi|^2."""
  n = state.ndim
  return index_to_bits(sample_indices(key, state, num_samples), n)


def unitary(circuit: ir.Circuit, symbol_values: jnp.ndarray) -> jnp.ndarray:
  """Dense (2^n, 2^n) unitary; metrics-only path (small n).

  Replaces `tfq.layers.Unitary` (reference: qhbmlib/inference/qnn_utils.py:29-33).
  """
  n = circuit.num_qubits
  dim = 2**n
  eye = jnp.eye(dim, dtype=COMPLEX_DTYPE)

  def column(col):
    out = apply_circuit(circuit, symbol_values, col.reshape((2,) * n))
    return out.reshape(-1)

  return jax.vmap(column, in_axes=1, out_axes=1)(eye)


# ---------------------------------------------------------------------------
# Convenience jitted entry points
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0,))
def simulate(circuit: ir.Circuit, symbol_values: jnp.ndarray) -> jnp.ndarray:
  """|psi> = U(values)|0...0>."""
  return apply_circuit(circuit, symbol_values, zero_state(circuit.num_qubits))


@functools.partial(jax.jit, static_argnums=(0,))
def simulate_from_bits(circuit: ir.Circuit, symbol_values: jnp.ndarray,
                       bits: jnp.ndarray) -> jnp.ndarray:
  """|psi> = U(values)|bits>, vmapped over a leading batch dim of `bits`."""
  def one(b):
    return apply_circuit(circuit, symbol_values,
                         basis_state(circuit.num_qubits, b))
  if bits.ndim == 1:
    return one(bits)
  return jax.vmap(one)(bits)
