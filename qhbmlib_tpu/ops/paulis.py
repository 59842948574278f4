"""Array-native Pauli-string algebra for the TPU statevector engine.

This replaces the reference's use of `cirq.PauliSum` / `cirq.PauliString`
(reference: qhbmlib/models/energy.py:165-209, baselines/train.py:46-77) with a
lightweight, jit-friendly representation: a PauliSum is a static integer code
matrix ``codes[t, q] in {0:I, 1:X, 2:Y, 3:Z}`` plus a (traceable) coefficient
vector.  Static codes let every Pauli application compile to axis flips and
rank-1 phase broadcasts on the ``(2,)*n`` statevector -- no gathers, no string
tensors, no protobufs.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Mapping, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

I, X, Y, Z = 0, 1, 2, 3

_CHAR_TO_CODE = {"I": I, "X": X, "Y": Y, "Z": Z}
_CODE_TO_CHAR = "IXYZ"

# Dense 2x2 matrices, used only by the small dense oracle paths.
_PAULI_MATS = (
    np.eye(2, dtype=np.complex64),
    np.array([[0, 1], [1, 0]], dtype=np.complex64),
    np.array([[0, -1j], [1j, 0]], dtype=np.complex64),
    np.array([[1, 0], [0, -1]], dtype=np.complex64),
)


def _is_host(x) -> bool:
  """True for values that stay on the host (no device round trips)."""
  return isinstance(x, (np.ndarray, np.generic, int, float, list, tuple))


def concat_coeffs(parts):
  """Concatenates coefficient vectors, staying in numpy when every input is
  host data -- an eager `jnp.concatenate` at model-build time would create a
  device array whose later constant-embedding fetch is pathologically slow
  over a tunneled backend (see PauliSum docstring)."""
  if all(_is_host(p) for p in parts):
    return np.concatenate([np.atleast_1d(np.asarray(p)) for p in parts])
  return jnp.concatenate([jnp.atleast_1d(p) for p in parts])


def _stack_coeffs(parts):
  if all(_is_host(p) for p in parts):
    return np.stack([np.asarray(p) for p in parts])
  return jnp.stack(parts)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(eq=False)
class PauliSum:
  """Sum of Pauli strings: sum_t coeffs[t] * prod_q P(codes[t, q]) on qubit q.

  ``codes`` is static (part of the pytree aux data) so that jitted functions
  specialize on the operator structure; ``coeffs`` may be a traced array so
  that gradients can flow through operator coefficients.  At rest (the
  constructors below) coeffs is a HOST numpy array: a device-array constant
  captured in a jitted function forces a synchronous device fetch at
  LOWERING time, which over the tunneled TPU backend measured 176s for a
  27-element f32 (the entire round-4 "cold compile" mystery -- numpy
  constants embed into the HLO with zero device interaction).
  """

  codes: Tuple[Tuple[int, ...], ...]  # [num_terms][num_qubits], static
  coeffs: jnp.ndarray  # [num_terms], float32 or complex64
  num_qubits: int

  def tree_flatten(self):
    return (self.coeffs,), (self.codes, self.num_qubits)

  @classmethod
  def tree_unflatten(cls, aux, children):
    codes, num_qubits = aux
    return cls(codes=codes, coeffs=children[0], num_qubits=num_qubits)

  @property
  def num_terms(self) -> int:
    return len(self.codes)

  def codes_array(self) -> np.ndarray:
    return np.asarray(self.codes, dtype=np.int32).reshape(
        self.num_terms, self.num_qubits)

  def __add__(self, other: "PauliSum") -> "PauliSum":
    if self.num_qubits != other.num_qubits:
      raise ValueError("PauliSums must act on the same number of qubits.")
    return PauliSum(
        codes=self.codes + other.codes,
        coeffs=concat_coeffs([self.coeffs, other.coeffs]),
        num_qubits=self.num_qubits)

  def __mul__(self, scalar) -> "PauliSum":
    return PauliSum(self.codes, self.coeffs * scalar, self.num_qubits)

  __rmul__ = __mul__

  def __neg__(self) -> "PauliSum":
    return self * -1.0

  def __sub__(self, other: "PauliSum") -> "PauliSum":
    return self + (-other)

  def __repr__(self):
    terms = []
    for t in range(self.num_terms):
      ops = "".join(f"{_CODE_TO_CHAR[c]}{q}"
                    for q, c in enumerate(self.codes[t]) if c != I) or "I"
      terms.append(f"({ops})")
    return f"PauliSum(n={self.num_qubits}, terms={'+'.join(terms)})"

  def dense(self) -> np.ndarray:
    """Dense (2^n, 2^n) matrix; oracle/metrics path, small n only."""
    dim = 2**self.num_qubits
    out = np.zeros((dim, dim), dtype=np.complex64)
    coeffs = np.asarray(self.coeffs)
    for t in range(self.num_terms):
      mat = np.eye(1, dtype=np.complex64)
      for q in range(self.num_qubits):
        mat = np.kron(mat, _PAULI_MATS[self.codes[t][q]])
      out = out + coeffs[t] * mat
    return out


def pauli_string(num_qubits: int,
                 qubit_paulis: Mapping[int, Union[str, int]],
                 coeff: float = 1.0) -> PauliSum:
  """Single Pauli string, e.g. pauli_string(3, {0: 'Z', 2: 'Z'}, -1.0)."""
  codes = [I] * num_qubits
  for q, p in qubit_paulis.items():
    if not 0 <= q < num_qubits:
      raise ValueError(f"qubit {q} out of range for {num_qubits} qubits")
    codes[q] = _CHAR_TO_CODE[p] if isinstance(p, str) else int(p)
  return PauliSum(
      codes=(tuple(codes),),
      coeffs=np.asarray([coeff], dtype=np.float32),
      num_qubits=num_qubits)


def pauli_sum_from_strings(
    num_qubits: int,
    terms: Iterable[Tuple[float, Mapping[int, Union[str, int]]]]) -> PauliSum:
  """Builds a PauliSum from (coeff, {qubit: pauli}) pairs."""
  codes = []
  coeffs = []
  for coeff, qmap in terms:
    row = [I] * num_qubits
    for q, p in qmap.items():
      if not 0 <= q < num_qubits:
        # Same check as pauli_string: a negative index would silently wrap
        # via Python list indexing onto the wrong qubit.
        raise ValueError(f"qubit {q} out of range for {num_qubits} qubits")
      row[q] = _CHAR_TO_CODE[p] if isinstance(p, str) else int(p)
    codes.append(tuple(row))
    coeffs.append(coeff)
  return PauliSum(
      codes=tuple(codes),
      coeffs=np.asarray(coeffs, dtype=np.float32),
      num_qubits=num_qubits)


def tfim_1d(num_qubits: int, h: float = 1.0, j: float = 1.0,
            periodic: bool = False) -> PauliSum:
  """H = -h*sum_q X_q - j*sum_q Z_q Z_{q+1}: open chain by default, ring
  with `periodic=True`.

  The single shared builder for the benchmark/driver TFIM workloads (their
  recorded numbers use the open chain); the reference's baselines TFIM is
  the periodic variant split into per-shard PauliSums
  (reference baselines/train.py:46-61, rebuilt in
  baselines/train.py get_tfim_hamiltonian).
  """
  terms = [(-h, {q: "X"}) for q in range(num_qubits)]
  # The periodic wrap bond only exists for n > 2: at n=2 the wrap (1, 0)
  # duplicates the open bond (0, 1) (double-counting it), and at n=1 the
  # "bond" {0: Z, 0: Z} would collapse to a bare Z where Z*Z = I.
  last = num_qubits if (periodic and num_qubits > 2) else num_qubits - 1
  terms += [(-j, {q: "Z", (q + 1) % num_qubits: "Z"}) for q in range(last)]
  return pauli_sum_from_strings(num_qubits, terms)


def z_strings_from_masks(masks: Sequence[Sequence[int]],
                         num_qubits: int) -> Tuple[PauliSum, ...]:
  """One single-term Z-string PauliSum per mask row (operator shards).

  Replaces the reference's per-shard `cirq.PauliSum.from_pauli_strings(Z...)`
  (reference: qhbmlib/models/energy.py:165-167, 200-209).
  """
  shards = []
  for mask in masks:
    codes = tuple(Z if m else I for m in mask)
    shards.append(
        PauliSum(
            codes=(codes,),
            coeffs=np.ones([1], dtype=np.float32),
            num_qubits=num_qubits))
  return tuple(shards)


def stack_single_term(paulisums: Sequence[PauliSum]) -> PauliSum:
  """Stacks single-term PauliSums into one multi-term PauliSum.

  Useful for measuring many shards in one fused pass.
  """
  codes = []
  coeffs = []
  for p in paulisums:
    if p.num_terms != 1:
      raise ValueError("stack_single_term requires single-term PauliSums.")
    codes.append(p.codes[0])
    coeffs.append(p.coeffs[0])
  return PauliSum(
      codes=tuple(codes),
      coeffs=_stack_coeffs(coeffs),
      num_qubits=paulisums[0].num_qubits)


class HashableOp:
  """Static (codes, num_qubits) structure of a PauliSum, hashable for use as
  a nondiff `custom_vjp` argument or cache key; coefficients are applied
  OUTSIDE the primitive so their gradients flow through plain autodiff.

  Shared by the dense adjoint engine and the sharded engine (one
  implementation keeps their hashing/equality semantics in lockstep)."""

  def __init__(self, op: PauliSum):
    self.codes = op.codes
    self.num_qubits = op.num_qubits

  def ones(self) -> PauliSum:
    return PauliSum(self.codes, jnp.ones([len(self.codes)], jnp.float32),
                    self.num_qubits)

  def with_coeffs(self, coeffs) -> PauliSum:
    return PauliSum(self.codes, coeffs, self.num_qubits)

  def __hash__(self):
    return hash((self.codes, self.num_qubits))

  def __eq__(self, other):
    return (isinstance(other, HashableOp) and self.codes == other.codes and
            self.num_qubits == other.num_qubits)


def op_slices(ops: Sequence[PauliSum]):
  """Static [(start, end)] row ranges of each op inside the concatenation of
  all their terms."""
  slices = []
  start = 0
  for op in ops:
    slices.append((start, start + op.num_terms))
    start += op.num_terms
  return slices


def concat_ops(ops: Sequence[PauliSum], num_qubits: int):
  """All terms of all ops as ONE PauliSum, plus the per-op row slices.

  Batched expectation paths measure the concatenation in a single fused pass
  and slice the per-op results back out."""
  all_codes = tuple(row for op in ops for row in op.codes)
  all_coeffs = jnp.concatenate([jnp.atleast_1d(op.coeffs) for op in ops])
  return PauliSum(all_codes, all_coeffs, num_qubits), op_slices(ops)
