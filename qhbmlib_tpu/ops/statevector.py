"""TPU-native statevector simulation engine.

This is the rebuilt L1 of the reference stack: it replaces TFQ's C++ qsim ops
(`tfq.layers.Expectation` / `SampledExpectation` / `Sample` / `Unitary`;
reference: qhbmlib/inference/qnn.py:112,134-138,166-167 and
qhbmlib/inference/qnn_utils.py:29-33) with pure JAX/XLA functions.

State layout -- the key TPU design decision
-------------------------------------------

A statevector is held as a 2-D array ``[R, C]`` with ``C = 2^m`` columns
(``m = min(n, 7)``, so C = 128 = one TPU lane register for n >= 7) and
``R = 2^(n-m)`` rows.  Qubits ``0..n-m-1`` ("major") index the rows
(qubit 0 = most significant, cirq convention) and qubits ``n-m..n-1``
("minor") index the columns.  Flattening row-major recovers the standard
basis ordering.

Why not the naive ``(2,)*n`` tensor?  XLA-TPU tiles arrays into (8, 128)
vector registers; rank-n tensors of extent 2 force degenerate layouts and
compile times that explode with n.  With the 2-D layout every gate lowers to
a handful of rank <= 5 ops with a 128-sized minor dimension:

  * minor-qubit gates  -> one [R,C]x[C,C] matmul on the MXU (the gate's 2x2 /
    4x4 matrix is embedded into a 128x128 operator via a static kron+perm);
  * major-qubit gates  -> a reshape exposing the qubit bit + a tiny einsum
    over that axis, minor dimension untouched (pure VPU, HBM-bandwidth);
  * Pauli strings      -> one fused phase pass (iota+popcount row signs,
    static column signs) + one row/column permutation, no matrices;
  * sampling           -> |psi|^2 -> categorical / bincount (static shapes).

Qubit-index convention matches cirq: qubit 0 is the most significant bit of
the computational-basis index.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qhbmlib_tpu import utils
from qhbmlib_tpu.ops import circuit_ir as ir
from qhbmlib_tpu.ops import paulis

COMPLEX_DTYPE = jnp.complex64

# Number of qubits kept in the minor (column) dimension: 2^7 = 128 = the TPU
# lane width, so minor-gate matmuls are exactly MXU-shaped.
MINOR_MAX = int(os.environ.get("QHBM_MINOR_BITS", "7"))


def minor_bits(n: int) -> int:
  return min(n, MINOR_MAX)


def state_shape(n: int) -> Tuple[int, int]:
  m = minor_bits(n)
  return (2**(n - m), 2**m)


def num_qubits_of(state: jnp.ndarray) -> int:
  size = int(state.shape[-2]) * int(state.shape[-1])
  return size.bit_length() - 1


def to_vector(state: jnp.ndarray) -> jnp.ndarray:
  """[R, C] -> flat [2^n] in standard basis order."""
  return state.reshape(state.shape[:-2] + (-1,))


def from_vector(vec: jnp.ndarray, n: int) -> jnp.ndarray:
  return vec.reshape(vec.shape[:-1] + state_shape(n))


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
  r, c = state_shape(num_qubits)
  return jnp.zeros((r, c), COMPLEX_DTYPE).at[0, 0].set(1.0)


def basis_state(num_qubits: int, bits: jnp.ndarray) -> jnp.ndarray:
  """|b> for a bitstring `bits` of shape [num_qubits].

  This is the TPU-native replacement for the reference's X^b `bit_circuit`
  state-injection (reference: qhbmlib/models/circuit_utils.py:23-29): basis
  states are written directly instead of prepending X gates.
  """
  m = minor_bits(num_qubits)
  nr = num_qubits - m
  r, c = state_shape(num_qubits)
  row = bits_to_index(bits[:nr], nr)
  col = bits_to_index(bits[nr:], m)
  return jnp.zeros((r, c), COMPLEX_DTYPE).at[row, col].set(1.0)


def bits_to_index(bits: jnp.ndarray, num_qubits: int) -> jnp.ndarray:
  """Big-endian bitstring -> flat basis index (int32)."""
  if num_qubits == 0:
    return jnp.zeros(bits.shape[:-1], jnp.int32)
  weights = jnp.asarray(2**np.arange(num_qubits - 1, -1, -1, dtype=np.int64),
                        jnp.int32)
  return jnp.sum(bits.astype(jnp.int32) * weights, axis=-1)


def index_to_bits(idx: jnp.ndarray, num_qubits: int) -> jnp.ndarray:
  """Flat basis index -> big-endian bitstring (int8), last dim num_qubits."""
  shifts = jnp.asarray(np.arange(num_qubits - 1, -1, -1), jnp.int32)
  return ((idx[..., None] >> shifts) & 1).astype(jnp.int8)


def all_bitstrings(num_qubits: int) -> np.ndarray:
  """[2^n, n] int8 enumeration in ascending index order (static)."""
  return utils.all_bitstrings(num_qubits)


# ---------------------------------------------------------------------------
# Dense gate application
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _embed_perm(positions: Tuple[int, ...], m: int) -> np.ndarray:
  """Static permutation taking the desired column-bit order to the kron
  layout (gate bits as MSBs in `positions` order, identity bits after)."""
  k = len(positions)
  others = [p for p in range(m) if p not in positions]
  perm = np.zeros(2**m, np.int32)
  for j in range(2**m):
    bits = [(j >> (m - 1 - t)) & 1 for t in range(m)]
    idx = 0
    for p in positions:
      idx = (idx << 1) | bits[p]
    for p in others:
      idx = (idx << 1) | bits[p]
    perm[j] = idx
  return perm


def _embed_minor_mat(mat_k: jnp.ndarray, positions: Tuple[int, ...],
                     m: int) -> jnp.ndarray:
  """Embeds a k-qubit gate matrix (axes ordered per `positions`, MSB first)
  into the full [C, C] minor-space operator."""
  k = len(positions)
  if k == m and positions == tuple(range(m)):
    return mat_k
  big = jnp.kron(mat_k, jnp.eye(2**(m - k), dtype=mat_k.dtype))
  perm = _embed_perm(tuple(positions), m)
  return big[perm][:, perm]


def apply_dense(mat: jnp.ndarray, qubits: Tuple[int, ...],
                state: jnp.ndarray) -> jnp.ndarray:
  """Applies a dense 1- or 2-qubit gate matrix to the [R, C] state.

  `mat` axes follow the order of `qubits` (qubits[0] = most significant).
  """
  r, c = state.shape
  n = num_qubits_of(state)
  m = c.bit_length() - 1
  nr = n - m
  majors = [q for q in qubits if q < nr]
  minors = [q for q in qubits if q >= nr]

  if not majors:
    # All gate qubits in the minor dimension: one MXU matmul.
    pos = tuple(q - nr for q in qubits)
    big = _embed_minor_mat(mat, pos, m)
    return apply_minor_mat(state, big)

  if not minors:
    if len(qubits) == 1:
      q = qubits[0]
      a = 2**q
      view = state.reshape(a, 2, -1)
      out = jnp.einsum("ij,ajb->aib", mat, view,
                       precision=matmul_precision())
      return out.reshape(r, c)
    if len(qubits) == 2:
      q0, q1 = qubits
      s0, s1 = sorted((q0, q1))
      a, b = 2**s0, 2**(s1 - s0 - 1)
      view = state.reshape(a, 2, b, 2, -1)
      mt = mat.reshape(2, 2, 2, 2)
      if q0 == s0:
        out = jnp.einsum("XYxy,axbyd->aXbYd", mt, view,
                         precision=matmul_precision())
      else:
        out = jnp.einsum("XYxy,aybxd->aYbXd", mt, view,
                         precision=matmul_precision())
      return out.reshape(r, c)
    # 3 major qubits (must be sorted): used by the gate-packing fast path.
    q0, q1, q2 = qubits
    assert q0 < q1 < q2, qubits
    a, b, d = 2**q0, 2**(q1 - q0 - 1), 2**(q2 - q1 - 1)
    view = state.reshape(a, 2, b, 2, d, 2, -1)
    mt = mat.reshape(2, 2, 2, 2, 2, 2)
    out = jnp.einsum("XYZxyz,axbydze->aXbYdZe", mt, view,
                     precision=matmul_precision())
    return out.reshape(r, c)

  # Mixed: one major (row) qubit, one minor (column) qubit.
  (maj,) = majors
  (mnr,) = minors
  u_pos = mnr - nr
  a = 2**maj
  view = state.reshape(a, 2, -1, c)
  mt = mat.reshape(2, 2, 2, 2)
  # Normalize to axes (maj_out, mnr_out, maj_in, mnr_in).
  if qubits[0] != maj:
    mt = jnp.transpose(mt, (1, 0, 3, 2))
  outs = []
  for i in (0, 1):
    acc = None
    for j in (0, 1):
      emb = _embed_minor_mat(mt[i, :, j, :], (u_pos,), m)
      contrib = jnp.einsum("cd,abd->abc", emb, view[:, j],
                           precision=matmul_precision())
      acc = contrib if acc is None else acc + contrib
    outs.append(acc)
  out = jnp.stack(outs, axis=1)
  return out.reshape(r, c)


# ---------------------------------------------------------------------------
# Pauli strings
# ---------------------------------------------------------------------------

def apply_pauli_string(state: jnp.ndarray,
                       codes: Sequence[int]) -> jnp.ndarray:
  """P|psi> for a static Pauli code row (0=I,1=X,2=Y,3=Z).

  One fused elementwise phase pass (runtime iota+popcount sign over rows,
  static sign vector over columns, global i^{#Y}) followed by one row
  permutation and one static column permutation for the X/Y bit flips.
  """
  r, c = state.shape
  n = len(codes)
  m = c.bit_length() - 1
  nr = n - m
  assert nr == r.bit_length() - 1, (state.shape, n)

  row_phase_mask = 0  # Z or Y major bits contribute (-1)^bit
  row_flip_mask = 0  # X or Y major bits flip
  col_phase_mask = 0
  col_flip_mask = 0
  y_count = 0
  for q, code in enumerate(codes):
    if code == paulis.I:
      continue
    if q < nr:
      bit = 1 << (nr - 1 - q)
      if code in (paulis.Z, paulis.Y):
        row_phase_mask |= bit
      if code in (paulis.X, paulis.Y):
        row_flip_mask |= bit
    else:
      bit = 1 << (m - 1 - (q - nr))
      if code in (paulis.Z, paulis.Y):
        col_phase_mask |= bit
      if code in (paulis.X, paulis.Y):
        col_flip_mask |= bit
    if code == paulis.Y:
      y_count += 1

  out = state
  # Column phases are a static [C] complex vector (includes the global
  # i^{#Y}); row phases are computed on the fly from an iota (R can be huge).
  if col_phase_mask or y_count:
    cols = np.arange(c)
    signs = 1.0 - 2.0 * (_popcount_np(cols & col_phase_mask) & 1)
    col_vec = ((1j)**(y_count % 4) * signs).astype(np.complex64)
    out = out * jnp.asarray(col_vec)[None, :]
  if row_phase_mask:
    rows = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    par = jax.lax.population_count(
        jnp.bitwise_and(rows, jnp.int32(row_phase_mask))) & 1
    out = out * (1.0 - 2.0 * par).astype(jnp.float32)
  if row_flip_mask:
    rows = jax.lax.broadcasted_iota(jnp.int32, (r,), 0)
    out = jnp.take(out, jnp.bitwise_xor(rows, jnp.int32(row_flip_mask)),
                   axis=0)
  if col_flip_mask:
    out = out[:, np.arange(c) ^ col_flip_mask]
  return out


def _popcount_np(x: np.ndarray) -> np.ndarray:
  out = np.zeros_like(x)
  while np.any(x):
    out += x & 1
    x = x >> 1
  return out


def _is_diag_codes(codes) -> bool:
  return all(code in (paulis.I, paulis.Z) for code in codes)


def _term_factors(codes_row, nr: int):
  """Splits a Pauli code row into major (row-qubit) and minor (column-qubit)
  non-identity factors: ([(q, code)], [(pos_in_minor, code)])."""
  majors = [(q, code) for q, code in enumerate(codes_row)
            if code != paulis.I and q < nr]
  minors = [(q - nr, code) for q, code in enumerate(codes_row)
            if code != paulis.I and q >= nr]
  return majors, minors


def _minor_pauli_np(minor_factors, m: int) -> np.ndarray:
  """Static [C, C] complex64 matrix of a Pauli string supported on minor
  (column) qubits only.  `minor_factors` is [(pos, code)] with ascending
  positions (position 0 = most significant column bit)."""
  positions = tuple(p for p, _ in minor_factors)
  mat = None
  for _, code in minor_factors:
    f = paulis._PAULI_MATS[code]
    mat = f if mat is None else np.kron(mat, f)
  if mat is None:
    return np.eye(2**m, dtype=np.complex64)
  big = np.kron(mat, np.eye(2**(m - len(positions)), dtype=np.complex64))
  perm = _embed_perm(positions, m)
  return np.ascontiguousarray(big[perm][:, perm]).astype(np.complex64)


def _major_kron_np(bin_qubits, factor_by_qubit) -> np.ndarray:
  """Static [2^k, 2^k] kron of per-qubit Pauli factors over the (sorted)
  major qubits of a bin; identity on bin qubits the term does not touch."""
  mat = None
  for q in bin_qubits:
    f = paulis._PAULI_MATS[factor_by_qubit.get(q, paulis.I)]
    mat = f if mat is None else np.kron(mat, f)
  return mat.astype(np.complex64)


def _embed_block_pauli_np(major_factors, start: int, k: int) -> np.ndarray:
  """Static [2^k, 2^k] kron of per-qubit Pauli factors over the row block
  [start, start+k), identity on untouched qubits."""
  return _major_kron_np(range(start, start + k), dict(major_factors))


def _interleave_kron_np(p_np: np.ndarray, k: int) -> np.ndarray:
  """[2^k, 2^k] kron matrix -> (2,)*2k tensor with per-qubit (conj, value)
  index pairs interleaved, matching the transition-tensor axis order."""
  t = p_np.reshape((2,) * (2 * k))
  perm = []
  for i in range(k):
    perm += [i, k + i]
  return np.ascontiguousarray(np.transpose(t, perm))


def _bin_by_support(items, max_k: int = 3):
  """Greedy first-fit binning of (payload, support_tuple) items into bins
  whose union support stays within `max_k` qubits.  One state pass then
  serves every term in a bin.  Returns [(sorted_support_tuple, [payload])].
  """
  bins = []
  for payload, sup in items:
    s = set(sup)
    for b in bins:
      if len(b[0] | s) <= max_k:
        b[0] |= s
        b[1].append(payload)
        break
    else:
      bins.append([set(s), [payload]])
  return [(tuple(sorted(b[0])), b[1]) for b in bins]


# Einsum programs for joint transition tensors over k major qubits:
# conj-side index immediately precedes the value-side index per qubit.
_TRANS_PURE = {
    1: "air,axr->ix",
    2: "aibjr,axbyr->ixjy",
    3: "aibjekr,axbyezr->ixjykz",
}
_TRANS_FULL = {
    1: "aibC,axbD->ixCD",
    2: "aibjeC,axbyeD->ixjyCD",
    3: "aibjekfC,axbyezfD->ixjykzCD",
}


def _major_view(state: jnp.ndarray, bin_qubits, keep_cols: bool):
  """Reshape [R, C] exposing each bin qubit as its own size-2 axis."""
  r, c = state.shape
  shape = []
  prev = -1
  for q in bin_qubits:
    shape.append(2**(q - prev - 1))
    shape.append(2)
    prev = q
  if keep_cols:
    return state.reshape(tuple(shape) + (-1, c))
  return state.reshape(tuple(shape) + (-1,))


def major_transition(state: jnp.ndarray, bin_qubits,
                     keep_cols: bool = False) -> jnp.ndarray:
  """Joint transition tensor over k <= 3 major qubits in ONE state pass:
  G[i1,x1,...] = sum_rest conj(psi)[..i..] psi[..x..]; with `keep_cols` the
  column axes stay separate (G[..., C, D]) so minor factors can contract
  afterwards.  Every Pauli expectation supported on `bin_qubits` (plus
  minors when keep_cols) is then a tiny static contraction against G."""
  k = len(bin_qubits)
  view = _major_view(state, bin_qubits, keep_cols)
  prog = (_TRANS_FULL if keep_cols else _TRANS_PURE)[k]
  return jnp.einsum(prog, jnp.conj(view), view,
                    precision=reduction_precision())


def apply_pauli_sum(state: jnp.ndarray, op: paulis.PauliSum,
                    term_weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
  """(sum_t w_t * coeffs[t] * P_t)|psi>.

  All purely-diagonal (I/Z) terms batch into ONE [R,K]x[K,C] matmul
  building the combined sign-weight array; X/Y-carrying terms are tiered
  below (one [C, C] matmul for minor-only strings, one block operator per
  row block, kron bins for short spanning strings) -- only the remainder
  pays per-term passes."""
  r, c = state.shape
  n = len(op.codes[0]) if op.num_terms else num_qubits_of(state)
  m = int(c).bit_length() - 1
  nr = n - m

  def weight(t):
    w = op.coeffs[t].astype(COMPLEX_DTYPE)
    if term_weights is not None:
      w = w * term_weights[t].astype(COMPLEX_DTYPE)
    return w

  diag_idx = set(t for t in range(op.num_terms) if _is_diag_codes(op.codes[t]))
  out = jnp.zeros_like(state)
  if diag_idx:
    ordered = sorted(diag_idx)
    masks = [pauli_z_masks(op.codes[t], nr, m) for t in ordered]
    d = parity_outer_sum([weight(t) for t in ordered],
                         [rm for rm, _ in masks],
                         [cm for _, cm in masks], state.shape)  # [R, C]
    out = out + d * state

  # Tier the remaining (X/Y-carrying) terms so the pass count stays small:
  #   minor-only strings fold into ONE [C, C] matmul;
  #   major strings inside one row block sum into a [2^k, 2^k] block
  #     operator, one MXU contraction per block;
  #   major strings spanning blocks (<=3 qubits) pack into kron bins;
  #   everything else falls back to a per-term state pass.
  blocks = _row_blocks(nr)
  minor_only, spanning, rest = [], [], []
  block_terms = {b: [] for b in blocks}
  for t in range(op.num_terms):
    if t in diag_idx:
      continue
    majors, minors = _term_factors(op.codes[t], nr)
    if not majors:
      minor_only.append(t)
    elif not minors:
      mq = tuple(q for q, _ in majors)
      home = [b for b in blocks if b[0] <= mq[0] and mq[-1] < b[0] + b[1]]
      if home:
        block_terms[home[0]].append(t)
      elif len(mq) <= 3:
        spanning.append((t, mq))
      else:
        rest.append(t)
    else:
      rest.append(t)

  if minor_only:
    mat = None
    for t in minor_only:
      p_np = jnp.asarray(
          _minor_pauli_np(_term_factors(op.codes[t], nr)[1], m))
      term = weight(t) * p_np
      mat = term if mat is None else mat + term
    out = out + apply_minor_mat(state, mat)

  for (start, k), ts in block_terms.items():
    if not ts:
      continue
    amat = None
    for t in ts:
      majors, _ = _term_factors(op.codes[t], nr)
      p_np = jnp.asarray(_embed_block_pauli_np(majors, start, k))
      term = weight(t) * p_np
      amat = term if amat is None else amat + term
    out = out + apply_row_block(amat, start, k, state)

  for bin_qubits, ts in _bin_by_support(spanning):
    amat = None
    for t in ts:
      majors, _ = _term_factors(op.codes[t], nr)
      p_np = jnp.asarray(_major_kron_np(bin_qubits, dict(majors)))
      term = weight(t) * p_np
      amat = term if amat is None else amat + term
    out = out + apply_dense(amat, bin_qubits, state)

  for t in rest:
    out = out + weight(t) * apply_pauli_string(state, op.codes[t])
  return out


# ---------------------------------------------------------------------------
# Gate application
# ---------------------------------------------------------------------------

def resolve_angle(gate: ir.Gate, symbol_values: jnp.ndarray):
  if gate.slot < 0:
    return jnp.asarray(gate.shift, jnp.float32)
  return gate.coeff * symbol_values[gate.slot] + gate.shift


def _prot_codes(gate: ir.Gate, n: int):
  codes = [0] * n
  for q, p in zip(gate.qubits, gate.paulis):
    codes[q] = p
  return codes


def apply_gate(gate: ir.Gate, angle, state: jnp.ndarray) -> jnp.ndarray:
  """Applies one gate with a resolved angle to the [R, C] state."""
  if gate.kind == ir.PROT:
    # exp(-i*angle*P) = cos(angle) I - i sin(angle) P
    p_state = apply_pauli_string(state, _prot_codes(gate, num_qubits_of(state)))
    a = jnp.asarray(angle, jnp.float32).astype(COMPLEX_DTYPE)
    return jnp.cos(a) * state - 1j * jnp.sin(a) * p_state
  if gate.kind == ir.GPHASE:
    a = jnp.asarray(angle, jnp.float32).astype(COMPLEX_DTYPE)
    return jnp.exp(1j * a) * state
  mat = gate_matrix(gate.kind, angle)
  return apply_dense(mat, gate.qubits, state)


def apply_gate_dangle(gate: ir.Gate, angle, state: jnp.ndarray) -> jnp.ndarray:
  """(dU/dangle)|psi> -- used by the adjoint differentiation backward sweep."""
  if gate.kind == ir.PROT:
    p_state = apply_pauli_string(state, _prot_codes(gate, num_qubits_of(state)))
    a = jnp.asarray(angle, jnp.float32).astype(COMPLEX_DTYPE)
    return -jnp.sin(a) * state - 1j * jnp.cos(a) * p_state
  if gate.kind == ir.GPHASE:
    a = jnp.asarray(angle, jnp.float32).astype(COMPLEX_DTYPE)
    return 1j * jnp.exp(1j * a) * state
  angle = jnp.asarray(angle, jnp.float32)
  _, dmat = jax.jvp(lambda a: gate_matrix(gate.kind, a), (angle,),
                    (jnp.ones_like(angle),))
  return apply_dense(dmat, gate.qubits, state)


# Gate fusion classes: runs of 1-qubit dense gates merge into per-qubit
# matrix products (one combined [C,C] MXU matmul for all minor qubits); runs
# of diagonal gates collapse into a single fused phase pass.  Both cut the
# number of O(2^n) state passes -- the HBM-bandwidth bottleneck.
_ONEQ_DENSE_KINDS = frozenset({ir.XP, ir.YP, ir.HP, ir.RX, ir.RY})
_DIAG_KINDS = frozenset({ir.ZP, ir.RZ, ir.CZP, ir.ZZP, ir.GPHASE})


def _gate_class(gate: ir.Gate) -> str:
  if gate.kind in _ONEQ_DENSE_KINDS:
    return "1q"
  if gate.kind in _DIAG_KINDS:
    return "diag"
  if gate.kind == ir.PROT and all(p == paulis.Z for p in gate.paulis):
    return "diag"
  return "single"


@functools.lru_cache(maxsize=None)
def segment_circuit(gates: Tuple[ir.Gate, ...]):
  """Greedy segmentation into fusable runs: [(cls, (gate_indices...)), ...].

  cls is '1q' (run of 1-qubit dense gates -- distinct qubits commute),
  'diag' (run of diagonal gates -- all commute) or 'single'.
  """
  segments = []
  i = 0
  while i < len(gates):
    cls = _gate_class(gates[i])
    j = i + 1
    while j < len(gates) and cls != "single" and _gate_class(gates[j]) == cls:
      j += 1
    segments.append((cls, tuple(range(i, j))))
    i = j
  return tuple(segments)


def _row_mask(q: int, nr: int) -> int:
  return 1 << (nr - 1 - q)


def _col_mask(q: int, nr: int, m: int) -> int:
  return 1 << (m - 1 - (q - nr))


def diag_parity_triples(gate: ir.Gate, nr: int, m: int):
  """Walsh (parity-sign) decomposition of d(phase angle)/d(resolved angle)
  for a diagonal gate: returns [(coeff, row_mask, col_mask), ...] with
  m(x) = sum_k coeff_k * s(row & row_mask_k) * s(col & col_mask_k), where
  s(y) = (-1)^popcount(y).  Masks are STATIC integers -- sign matrices are
  expanded chunk-wise from one shared iota, so no per-factor state-length
  vector is ever materialized (crucial at high qubit counts, where a single
  [R] vector is megabytes and circuits/observables carry hundreds of
  diagonal terms)."""

  def bit_triples(q, scale):
    # b = (1 - s(mask))/2
    rm = _row_mask(q, nr) if q < nr else 0
    cm = _col_mask(q, nr, m) if q >= nr else 0
    return [(scale * 0.5, 0, 0), (-scale * 0.5, rm, cm)]

  def pair_triples(q0, q1, scale):
    # b0*b1 = (1 - s0 - s1 + s01)/4
    rm0 = _row_mask(q0, nr) if q0 < nr else 0
    cm0 = _col_mask(q0, nr, m) if q0 >= nr else 0
    rm1 = _row_mask(q1, nr) if q1 < nr else 0
    cm1 = _col_mask(q1, nr, m) if q1 >= nr else 0
    s = scale * 0.25
    return [(s, 0, 0), (-s, rm0, cm0), (-s, rm1, cm1),
            (s, rm0 | rm1, cm0 | cm1)]

  if gate.kind == ir.ZP:
    return bit_triples(gate.qubits[0], np.pi)
  if gate.kind == ir.RZ:
    # rz phase = theta*(b - 1/2): the -theta/2 constant cancels
    # bit_triples' +theta/2 term exactly, so only the sign factor survives
    # (emitting the zero-coefficient constant would occupy a chunk slot --
    # a wasted state-sized column -- in every fused-diag pass).
    return bit_triples(gate.qubits[0], 1.0)[1:]
  if gate.kind == ir.CZP:
    return pair_triples(gate.qubits[0], gate.qubits[1], np.pi)
  if gate.kind == ir.ZZP:
    # pi * xor = pi * (1 - s01)/2
    q0, q1 = gate.qubits
    rm = (_row_mask(q0, nr) if q0 < nr else 0) | (
        _row_mask(q1, nr) if q1 < nr else 0)
    cm = (_col_mask(q0, nr, m) if q0 >= nr else 0) | (
        _col_mask(q1, nr, m) if q1 >= nr else 0)
    return [(np.pi / 2, 0, 0), (-np.pi / 2, rm, cm)]
  if gate.kind == ir.GPHASE:
    return [(1.0, 0, 0)]
  # PROT all-Z: -(1-2*parity) = -s(full mask)
  rm, cm = 0, 0
  for q in gate.qubits:
    if q < nr:
      rm |= _row_mask(q, nr)
    else:
      cm |= _col_mask(q, nr, m)
  return [(-1.0, rm, cm)]


def pauli_z_masks(codes, nr: int, m: int):
  """(row_mask, col_mask) of a purely-diagonal (I/Z) Pauli string:
  s(x) = s(row & row_mask) * s(col & col_mask)."""
  rm, cm = 0, 0
  for q, code in enumerate(codes):
    if code == paulis.Z:
      if q < nr:
        rm |= _row_mask(q, nr)
      else:
        cm |= _col_mask(q, nr, m)
  return rm, cm


# Cap on transient [K_chunk, R] sign matrices built from parity masks.
_FACTOR_CHUNK_BYTES = 128 << 20


def _sign_rows(masks, r: int) -> jnp.ndarray:
  """[K, R] parity signs from static row masks and one shared iota."""
  rows = jax.lax.broadcasted_iota(jnp.int32, (1, r), 1)
  par = jax.lax.population_count(
      jnp.bitwise_and(rows, jnp.asarray(masks, jnp.int32)[:, None])) & 1
  return (1.0 - 2.0 * par).astype(jnp.float32)


def _sign_cols(masks, c: int) -> np.ndarray:
  """[K, C] static parity signs from column masks."""
  cols = np.arange(c)[None, :]
  par = _popcount_np(cols & np.asarray(masks, np.int64)[:, None])
  return (1.0 - 2.0 * (par & 1)).astype(np.float32)


def _phase_precision():
  """Phase/sign-weight accumulation is accuracy-critical (the result
  multiplies into exp(i*phase)): floor the precision at HIGH so 1-pass
  bf16 mode cannot round the angles to 8 mantissa bits."""
  prec = matmul_precision()
  if prec in (None, jax.lax.Precision.DEFAULT):
    return jax.lax.Precision.HIGH
  return prec


def _parity_chunks(coeffs, row_masks, col_masks, r, c):
  """Chunk-stacked (w, rm, sc) arrays padded to a multiple of the chunk
  size (pad terms carry weight 0)."""
  k = len(row_masks)
  # Never let the chunk exceed the factor count: ck is r-derived and at
  # small r is millions, so padding k up to it would materialize GB of
  # zero-weight sign columns (the exact pathology this helper replaces).
  ck = max(1, min(_FACTOR_CHUNK_BYTES // (8 * int(r)), k))
  pad = (-k) % ck
  rm = np.asarray(list(row_masks) + [0] * pad, np.int32)
  sc = np.concatenate(
      [_sign_cols(col_masks, c),
       np.zeros((pad, c), np.float32)]) if pad else _sign_cols(col_masks, c)
  w = None
  if coeffs is not None:
    w = jnp.stack([jnp.asarray(x) for x in coeffs])
    if pad:
      w = jnp.concatenate([w, jnp.zeros((pad,), w.dtype)])
  nch = (k + pad) // ck
  return (None if w is None else w.reshape(nch, ck),
          rm.reshape(nch, ck), sc.reshape(nch, ck, int(c)), nch, ck)


def parity_outer_sum(coeffs, row_masks, col_masks, shape_rc) -> jnp.ndarray:
  """sum_k coeffs_k * s(row & rm_k) (x) s(col & cm_k) as chunked matmuls.

  `coeffs` entries may be traced scalars (gate angles) or complex weights.

  Multi-chunk sums run as a lax.scan with a rematerialized body: an
  unrolled chunk loop lets XLA's scheduler keep every chunk's [R, C]
  partial live at once, which at KOBE term counts (K ~ n^2/2) dominated
  the whole train step's memory (measured 66 live states at 28 qubits;
  the scan + remat bounds it at one chunk regardless of K)."""
  r, c = shape_rc
  if not row_masks:
    return None  # no factors (legacy contract: callers guard non-empty)
  w_ch, rm_ch, sc_ch, nch, ck = _parity_chunks(coeffs, row_masks,
                                               col_masks, r, c)
  prec = _phase_precision()
  cdt = w_ch.dtype if jnp.iscomplexobj(w_ch) else None

  def part_of(w_c, rm_c, sc_c):
    s_r = _sign_rows(rm_c, r)
    s_c = jnp.asarray(sc_c)
    if cdt is not None:
      s_r = s_r.astype(cdt)
      s_c = s_c.astype(cdt)
    return jnp.matmul((s_r * w_c[:, None]).T, s_c, precision=prec)

  if nch == 1:
    return part_of(w_ch[0], rm_ch[0], sc_ch[0])

  def body(acc, xs):
    w_c, rm_c, sc_c = xs
    return acc + part_of(w_c, rm_c, sc_c), None

  acc0 = jnp.zeros((int(r), int(c)), cdt or jnp.float32)
  # Inherit the weights' varying-manual-axes type: inside shard_map a
  # device-varying `coeffs` (e.g. the sharded engine's per-device phase
  # weights) makes the body output varying along the mesh axis, and scan
  # requires the initial carry to match.  Outside shard_map this adds a
  # literal zero.
  zero = w_ch[0, 0] * 0
  acc0 = acc0 + (jnp.real(zero) if cdt is None else zero)
  total, _ = jax.lax.scan(jax.checkpoint(body),
                          acc0, (w_ch, jnp.asarray(rm_ch),
                                 jnp.asarray(sc_ch)))
  return total


def parity_bilinear(row_masks, col_masks, p: jnp.ndarray) -> jnp.ndarray:
  """[K] vector of s_r_k^T P s_c_k, chunked over factors (scan + remat for
  multi-chunk inputs -- see parity_outer_sum)."""
  r, c = p.shape
  _, rm_ch, sc_ch, nch, ck = _parity_chunks(None, row_masks, col_masks, r, c)
  k = len(row_masks)

  def vals_of(rm_c, sc_c):
    s_r = _sign_rows(rm_c, r)
    s_c = jnp.asarray(sc_c)
    w = jnp.matmul(p, s_c.T, precision=reduction_precision())  # [R, ck]
    return jnp.einsum("kr,rk->k", s_r, w, precision=reduction_precision())

  if nch == 1:
    return vals_of(rm_ch[0], sc_ch[0])[:k]

  def body(_, xs):
    rm_c, sc_c = xs
    return None, vals_of(rm_c, sc_c)

  _, outs = jax.lax.scan(jax.checkpoint(body), None,
                         (jnp.asarray(rm_ch), jnp.asarray(sc_ch)))
  return outs.reshape(-1)[:k]


# Row (major) qubits are processed in contiguous blocks of up to this many
# bits; each block's per-qubit 2x2 matrices kron-fold into ONE dense block
# matrix applied as a single MXU contraction.  7 bits -> [128, 128] matches
# the MXU's native 128x128 tile.
_ROW_BLOCK_BITS = 7


def matmul_precision():
  """MXU precision for the state-sized block contractions.

  f32 matmuls on TPU decompose into bf16 passes: 'default' (1 pass, ~4x
  faster, ~3 decimal digits), 'high' (3 passes, ~f32), 'highest' (6
  passes).  Statevector sweeps chain hundreds of contractions, so the
  default here is 'high'; override with QHBM_MATMUL_PRECISION.

  'mixed' splits by error structure: state APPLIES (unitary chains, where
  each 1-pass rounding perturbs the state coherently and the errors
  random-walk across the sweep) run 3-pass HIGH, while the big statistical
  REDUCTIONS (`reduction_precision` sites: parity bilinears, transition
  grams) stay 1-pass -- their per-element roundings enter with parity-sign
  weights and cancel ~sqrt(N), so the cheap pass costs ~1e-3, not the
  ~1e-2 the gate polices (benchmarks/RESULTS.md round 5)."""
  name = os.environ.get("QHBM_MATMUL_PRECISION", "high")
  if name == "mixed":
    return jax.lax.Precision.HIGH
  return {
      "none": None,
      "default": jax.lax.Precision.DEFAULT,
      "high": jax.lax.Precision.HIGH,
      "highest": jax.lax.Precision.HIGHEST,
  }[name]


def reduction_precision():
  """Precision for state-sized CONTRACTIONS WHOSE OUTPUT IS A REDUCTION
  (parity bilinears, block/cross transition grams, expectation sums): in
  'mixed' mode these stay 1-pass bf16 (see matmul_precision); in every
  other mode they follow the global setting."""
  if os.environ.get("QHBM_MATMUL_PRECISION", "high") == "mixed":
    return jax.lax.Precision.DEFAULT
  return matmul_precision()


_UNSET = object()


def _planar_matmuls_enabled(prec=_UNSET) -> bool:
  """Planar (re, im) decomposition of state-sized complex contractions.

  At 1-pass bf16 precision ('default') XLA's complex matmul lowering
  measured 1.70x SLOWER than explicit 4-real-dot planar arithmetic at the
  full-1q-segment level (complex 4.106 ms vs planar-on-complex-storage
  2.419 ms at 24q, 256-iteration chained scans; benchmarks/RESULTS.md
  round-3 correction, benchmarks/segment_probe.py seg_comp/seg_hybrid).
  XLA cancels the real/imag extract + lax.complex recombine between
  chained blocks, so the planar win costs nothing at segment boundaries.
  Round 3 measured the complex lowering ~10% faster at 3-pass 'high', so
  'auto' used to fall back to complex above DEFAULT precision.  Round-5
  re-measurement on the full 24q headline says planar now wins at EVERY
  precision (2x2 interleaved A/Bs, 2026-08-21): default 1.7x (round 3),
  mixed 3.38 vs 3.23 steps/s (+4.7%), uniform high 2.98 vs 2.66 (+12%) --
  the engine's later block-packing changes moved the crossover.  'auto'
  is therefore planar everywhere; QHBM_PLANAR_MATMUL=0/1 still forces
  (the `prec` parameter is kept for callers that want to re-probe the
  split).  """
  del prec  # auto no longer depends on the caller's precision
  v = os.environ.get("QHBM_PLANAR_MATMUL", "auto")
  if v == "auto":
    return True
  return v == "1"


def apply_minor_mat(state: jnp.ndarray, mat: jnp.ndarray) -> jnp.ndarray:
  """state @ mat.T for the [R, C] state against a [C, C] minor operator,
  with the planar 4-real-dot decomposition when enabled (see
  `_planar_matmuls_enabled`)."""
  prec = matmul_precision()
  if _planar_matmuls_enabled() and jnp.iscomplexobj(state):
    if jnp.iscomplexobj(mat):
      m_re, m_im = jnp.real(mat), jnp.imag(mat)
    else:
      m_re, m_im = mat, None
    s_re, s_im = jnp.real(state), jnp.imag(state)
    o_re = jnp.matmul(s_re, m_re.T, precision=prec)
    o_im = jnp.matmul(s_im, m_re.T, precision=prec)
    if m_im is not None:
      o_re = o_re - jnp.matmul(s_im, m_im.T, precision=prec)
      o_im = o_im + jnp.matmul(s_re, m_im.T, precision=prec)
    return jax.lax.complex(o_re, o_im)
  return jnp.matmul(state, mat.T, precision=prec)


def cross_gram(lam: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
  """[C, C] cross contraction sum_r conj(lam)[r, c] * a[r, d] — the minor
  transition matrix between two states (lam = a gives the minor Gram all
  minor-only Pauli expectations read from)."""
  prec = reduction_precision()
  prog = "rc,rd->cd"
  if _planar_matmuls_enabled(prec) and jnp.iscomplexobj(a):
    l_re, l_im = jnp.real(lam), jnp.imag(lam)
    a_re, a_im = jnp.real(a), jnp.imag(a)
    g_re = (jnp.einsum(prog, l_re, a_re, precision=prec) +
            jnp.einsum(prog, l_im, a_im, precision=prec))
    g_im = (jnp.einsum(prog, l_re, a_im, precision=prec) -
            jnp.einsum(prog, l_im, a_re, precision=prec))
    return jax.lax.complex(g_re, g_im)
  return jnp.einsum(prog, jnp.conj(lam), a, precision=prec)


def _row_blocks(nr: int):
  """Partition of the nr row qubits into <=7-bit contiguous blocks."""
  blocks = []
  pos = 0
  while pos < nr:
    k = min(_ROW_BLOCK_BITS, nr - pos)
    blocks.append((pos, k))
    pos += k
  return blocks


def _fold_block(mats_by_qubit, start: int, k: int):
  """kron over qubits [start, start+k): per-qubit matrix or identity.
  Returns None when no qubit in the block has a matrix."""
  if not any(start <= q < start + k for q in mats_by_qubit):
    return None
  mat = None
  eye = jnp.eye(2, dtype=COMPLEX_DTYPE)
  for q in range(start, start + k):
    f = mats_by_qubit.get(q, eye)
    mat = f if mat is None else jnp.kron(mat, f)
  return mat


def apply_row_block(mat_k: jnp.ndarray, start: int, k: int,
                    state: jnp.ndarray) -> jnp.ndarray:
  """Contracts a [2^k, 2^k] operator against row qubits [start, start+k)."""
  r, c = state.shape
  pre = 2**start
  v = state.reshape(pre, 2**k, -1)
  prog = "MN,aNb->aMb"
  prec = matmul_precision()
  if _planar_matmuls_enabled() and jnp.iscomplexobj(v):
    if jnp.iscomplexobj(mat_k):
      m_re, m_im = jnp.real(mat_k), jnp.imag(mat_k)
    else:
      m_re, m_im = mat_k, None
    v_re, v_im = jnp.real(v), jnp.imag(v)
    o_re = jnp.einsum(prog, m_re, v_re, precision=prec)
    o_im = jnp.einsum(prog, m_re, v_im, precision=prec)
    if m_im is not None:
      o_re = o_re - jnp.einsum(prog, m_im, v_im, precision=prec)
      o_im = o_im + jnp.einsum(prog, m_im, v_re, precision=prec)
    return jax.lax.complex(o_re, o_im).reshape(r, c)
  out = jnp.einsum(prog, mat_k, v, precision=prec)
  return out.reshape(r, c)


def block_transition(lam: jnp.ndarray, a: jnp.ndarray, start: int,
                     k: int) -> jnp.ndarray:
  """Joint transition matrix over a row block in one MXU contraction:
  G[I, J] = sum_rest conj(lam)[..I..] a[..J..], shape [2^k, 2^k].  Every
  1-local (and in-block multi-local) operator expectation/gradient on the
  block is then a tiny contraction against G."""
  pre = 2**start
  prog = "aIb,aJb->IJ"
  prec = reduction_precision()
  lv = lam.reshape(pre, 2**k, -1)
  av = a.reshape(pre, 2**k, -1)
  if _planar_matmuls_enabled(prec) and jnp.iscomplexobj(lv):
    l_re, l_im = jnp.real(lv), jnp.imag(lv)
    a_re, a_im = jnp.real(av), jnp.imag(av)
    # conj(lam)^T a: re = lre.are + lim.aim, im = lre.aim - lim.are
    g_re = (jnp.einsum(prog, l_re, a_re, precision=prec) +
            jnp.einsum(prog, l_im, a_im, precision=prec))
    g_im = (jnp.einsum(prog, l_re, a_im, precision=prec) -
            jnp.einsum(prog, l_im, a_re, precision=prec))
    return jax.lax.complex(g_re, g_im)
  return jnp.einsum(prog, jnp.conj(lv), av, precision=prec)


def partial_trace_1q(g_block: jnp.ndarray, k: int,
                     pos_in_block: int) -> jnp.ndarray:
  """[2^k, 2^k] block transition -> the 2x2 single-qubit transition."""
  pre, post = 2**pos_in_block, 2**(k - pos_in_block - 1)
  gt = g_block.reshape(pre, 2, post, pre, 2, post)
  return jnp.einsum("aibajb->ij", gt)


def _bf16_state_enabled() -> bool:
  """Opt-in (QHBM_STATE_DTYPE=bf16): thread bfloat16 (re, im) planes
  between the chained contractions of a 1q segment.

  The planes are extracted once at segment entry and recombined to
  complex64 at exit, so inter-block HBM traffic halves (4 bytes/amplitude
  vs 8) and the MXU reads bf16 natively with f32 accumulation.  State
  storage BETWEEN segments stays complex64 -- the win is bounded to
  multi-pass segments and measured at ~4%% of a 24q segment
  (benchmarks/RESULTS.md round-3 table: bf16 planes 2.312 ms vs planar
  2.419).  Accuracy: rounds the state to 8 mantissa bits per segment,
  so the mode is honored ONLY under QHBM_MATMUL_PRECISION=default (the
  contraction itself is 1-pass bf16 there); under 'high'/'highest' the
  flag is ignored rather than silently rounding a multi-pass-precision
  request to 8 mantissa bits -- which also keeps the bench's 'highest'
  accuracy reference (bench.py measure_precision_accuracy, which toggles
  only QHBM_MATMUL_PRECISION) clean of the very rounding it measures."""
  if os.environ.get("QHBM_STATE_DTYPE", "") != "bf16":
    return False
  return os.environ.get("QHBM_MATMUL_PRECISION", "high") == "default"


def _apply_block_planes(mat_k: jnp.ndarray, start: int, k: int, re, im):
  """apply_row_block on bf16 (re, im) planes with f32 MXU accumulation."""
  r, c = re.shape
  m_re = jnp.real(mat_k).astype(jnp.bfloat16)
  m_im = jnp.imag(mat_k).astype(jnp.bfloat16)
  vr = re.reshape(2**start, 2**k, -1)
  vi = im.reshape(2**start, 2**k, -1)
  prog = "MN,aNb->aMb"
  kw = dict(preferred_element_type=jnp.float32)
  o_re = jnp.einsum(prog, m_re, vr, **kw) - jnp.einsum(prog, m_im, vi, **kw)
  o_im = jnp.einsum(prog, m_re, vi, **kw) + jnp.einsum(prog, m_im, vr, **kw)
  return (o_re.reshape(r, c).astype(jnp.bfloat16),
          o_im.reshape(r, c).astype(jnp.bfloat16))


def _apply_minor_planes(mat: jnp.ndarray, re, im):
  m_re = jnp.real(mat).astype(jnp.bfloat16).T
  m_im = jnp.imag(mat).astype(jnp.bfloat16).T
  kw = dict(preferred_element_type=jnp.float32)
  o_re = jnp.matmul(re, m_re, **kw) - jnp.matmul(im, m_im, **kw)
  o_im = jnp.matmul(re, m_im, **kw) + jnp.matmul(im, m_re, **kw)
  return o_re.astype(jnp.bfloat16), o_im.astype(jnp.bfloat16)


def _fused_1q_enabled() -> bool:
  """Streamed fused 1q-segment kernel (ops/pallas_sv.py
  fused_blocks_minor_apply): folds the first two row-block matmuls and the
  minor matmul into ONE HBM pass over the state on TPU lowerings."""
  return os.environ.get("QHBM_FUSED_1Q", "0") == "1"


def apply_majors_and_minor(state: jnp.ndarray, major_by_qubit,
                           minor_combined) -> jnp.ndarray:
  """Applies per-qubit folded row-block operators + the combined minor
  matmul.  Shared by the forward 1q segment and the adjoint un-applies.

  With QHBM_FUSED_1Q=1, TPU lowerings fuse the first two row blocks and the
  minor matmul into one streamed Pallas pass (2 HBM passes per segment at
  24q instead of 4); other platforms and small states use the plain
  per-block matmuls."""
  r, c = state.shape
  n = num_qubits_of(state)
  m = int(c).bit_length() - 1
  nr = n - m
  blocks = _row_blocks(nr)

  def plain(st):
    folded = [(start, k, _fold_block(major_by_qubit, start, k))
              for start, k in blocks]
    passes = ([(s, k, f) for s, k, f in folded if f is not None] +
              ([("minor",)] if minor_combined is not None else []))
    if (_bf16_state_enabled() and jnp.iscomplexobj(st) and len(passes) >= 2):
      # bf16 (re, im) planes between this segment's chained contractions;
      # see _bf16_state_enabled for the bandwidth/accuracy trade.
      re = jnp.real(st).astype(jnp.bfloat16)
      im = jnp.imag(st).astype(jnp.bfloat16)
      for start, k, mat in folded:
        if mat is not None:
          re, im = _apply_block_planes(mat, start, k, re, im)
      if minor_combined is not None:
        re, im = _apply_minor_planes(minor_combined, re, im)
      return jax.lax.complex(re.astype(jnp.float32),
                             im.astype(jnp.float32))
    for start, k, mat in folded:
      if mat is not None:
        st = apply_row_block(mat, start, k, st)
    if minor_combined is not None:
      st = apply_minor_mat(st, minor_combined)
    return st

  if not (_fused_1q_enabled() and len(blocks) >= 2):
    return plain(state)
  (s1, k1), (s2, k2) = blocks[0], blocks[1]
  m1 = _fold_block(major_by_qubit, s1, k1)
  m2 = _fold_block(major_by_qubit, s2, k2)
  mt = minor_combined.T if minor_combined is not None else None
  if sum(x is not None for x in (m1, m2, mt)) < 2:
    return plain(state)  # nothing to fuse

  # Mosaic VMEM admission lives next to the kernel (pallas_sv.fused_1q_fits):
  # admission must reject exactly what the compiler will, including a
  # user-tightened QHBM_PALLAS_VMEM_LIMIT scoped cap (otherwise the
  # transparent fallback becomes a Mosaic compile crash).  The formula
  # boundary is <= 13 fused row bits at c=128; production 7+7-bit blocks
  # (tile 8MB, footprint 168M) are rejected.
  from qhbmlib_tpu.ops import pallas_sv
  if not pallas_sv.fused_1q_fits(k1, k2, c):
    return plain(state)

  def fused(st):
    from qhbmlib_tpu.ops import pallas_sv

    def tpu_path(s):
      out = pallas_sv.fused_blocks_minor_apply(s, k1, k2, m1, m2, mt)
      for start, k in blocks[2:]:
        mat = _fold_block(major_by_qubit, start, k)
        if mat is not None:
          out = apply_row_block(mat, start, k, out)
      return out

    return jax.lax.platform_dependent(st, tpu=tpu_path, default=plain)

  return fused(state)


def _apply_1q_segment(gates, angles, state: jnp.ndarray) -> jnp.ndarray:
  """A run of 1-qubit dense gates: gates on distinct qubits commute, so they
  merge per qubit; minor-qubit products combine into one [C, C] matmul and
  major-qubit matrices kron-fold into <=7-bit row-block matmuls (MXU)."""
  r, c = state.shape
  n = num_qubits_of(state)
  m = c.bit_length() - 1
  nr = n - m
  by_qubit = {}
  for gate, angle in zip(gates, angles):
    by_qubit.setdefault(gate.qubits[0], []).append(
        gate_matrix(gate.kind, angle))
  minor_combined = None
  major_by_qubit = {}
  for q in sorted(by_qubit):
    mat = by_qubit[q][0]
    for nxt in by_qubit[q][1:]:
      # Operator folds run EXACT regardless of QHBM_MATMUL_PRECISION: these
      # [2,2]/[C,C] products cost nothing next to state passes, while bf16
      # rounding HERE biases the combined operator -- and thus every
      # amplitude it touches -- deterministically (unlike state-pass
      # rounding, which is averaged over 2^n amplitudes).  Hardware
      # re-measurement confirmed the hardening is free
      # (benchmarks/RESULTS.md round-3 precision hardening note).
      mat = jnp.matmul(nxt, mat, precision=jax.lax.Precision.HIGHEST)
    if q >= nr:
      emb = _embed_minor_mat(mat, (q - nr,), m)
      minor_combined = emb if minor_combined is None else jnp.matmul(
          emb, minor_combined, precision=jax.lax.Precision.HIGHEST)
    else:
      major_by_qubit[q] = mat
  return apply_majors_and_minor(state, major_by_qubit, minor_combined)


def diag_segment_triples(gates, nr: int, m: int):
  """Concatenated parity triples of a diagonal segment with gate ownership:
  (coeffs, row_masks, col_masks, owner)."""
  coeffs, rms, cms, owner = [], [], [], []
  for g_idx, gate in enumerate(gates):
    for coeff, rm, cm in diag_parity_triples(gate, nr, m):
      coeffs.append(coeff)
      rms.append(rm)
      cms.append(cm)
      owner.append(g_idx)
  return coeffs, rms, cms, owner


def diag_segment_phase(gates, angles, state_shape_rc) -> jnp.ndarray:
  """Total phase angle array [R, C] of a run of diagonal gates, built from
  chunked parity-sign matmuls."""
  r, c = state_shape_rc
  n = (int(r) * int(c)).bit_length() - 1
  m = int(c).bit_length() - 1
  coeffs, rms, cms, owner = diag_segment_triples(gates, n - m, m)
  weighted = [coeffs[k] * jnp.asarray(angles[owner[k]], jnp.float32)
              for k in range(len(coeffs))]
  return parity_outer_sum(weighted, rms, cms, state_shape_rc)


# A diagonal segment's phasor factors when its parity triples touch only
# row (major) qubits or only column (minor) qubits, except for the few
# "cross" factors coupling both -- on 1D-chain workloads (TFIM bonds,
# brick-wall CZ entanglers) exactly one bond straddles the major/minor
# boundary.  Past this many cross factors the factored form's per-factor
# state passes stop paying for the saved transcendentals and the caller
# materializes the [R, C] phase array instead.  Measured on v5e
# (benchmarks/cross_factor_probe.py, 22q, k=1..6): the two paths are
# equal within the tunnel's noise floor at every k probed, so the cap is
# a conservative bound, not a cliff -- 1D-chain workloads have exactly
# one cross factor regardless.
_CROSS_MAX = 8


def phasor_factors_from_triples(weighted, rms, cms, state_shape_rc):
  """Factored phasor exp(i * sum_k w_k s(r&rm_k) s(c&cm_k)) from weighted
  parity triples.

  Returns (row_phase [R, 1] | None, col_phase [1, C] | None, crosses)
  where `crosses` is a list of (weight, row_mask, col_mask) for the mixed
  factors -- each contributing exp(i*w*s_r*s_c) = cos(w) + i*sin(w)*s_r*s_c
  with SCALAR trig -- or None when more than `_CROSS_MAX` factors are
  mixed and the caller should materialize the full [R, C] phase.

  vs the materialized path this replaces the 2^n-element complex exp (two
  VPU transcendental sweeps per apply) with R + C transcendentals, and is
  *more* accurate: per-group phase sums are smaller before the f32 trig
  argument reduction (measured 1.9e-5 vs 1.1e-4 max err against an f64
  oracle at 18 qubits -- benchmarks/diag_factor_probe.py).

  QHBM_DIAG_PHASOR is read at TRACE time: set it before the first call to
  any jitted function on this path.  Flipping it afterwards keeps serving
  whatever the jit cache already compiled (re-jit a fresh callable, as
  benchmarks/run_diag_ab.py does, to A/B the two modes in one process)."""
  if os.environ.get("QHBM_DIAG_PHASOR", "auto") == "materialize":
    return None  # A/B & debug escape hatch: force the [R, C] phase build
  r, c = state_shape_rc
  row_k = [k for k in range(len(rms)) if cms[k] == 0]
  col_k = [k for k in range(len(rms)) if cms[k] != 0 and rms[k] == 0]
  cross = [k for k in range(len(rms)) if cms[k] != 0 and rms[k] != 0]
  if len(cross) > _CROSS_MAX:
    return None
  row_phase = parity_outer_sum([weighted[k] for k in row_k],
                               [rms[k] for k in row_k],
                               [0] * len(row_k), (r, 1)) if row_k else None
  col_phase = parity_outer_sum(
      [weighted[k] for k in col_k], [0] * len(col_k),
      [cms[k] for k in col_k], (1, c)) if col_k else None
  return row_phase, col_phase, [(weighted[k], rms[k], cms[k]) for k in cross]


def diag_segment_phasor_factors(gates, angles, state_shape_rc):
  """`phasor_factors_from_triples` over a diagonal segment's own triples."""
  r, c = state_shape_rc
  n = (int(r) * int(c)).bit_length() - 1
  m = int(c).bit_length() - 1
  coeffs, rms, cms, owner = diag_segment_triples(gates, n - m, m)
  weighted = [coeffs[k] * jnp.asarray(angles[owner[k]], jnp.float32)
              for k in range(len(coeffs))]
  return phasor_factors_from_triples(weighted, rms, cms, state_shape_rc)


def apply_diag_segment_phasor(factors, states, sign=1.0):
  """Multiplies each state in `states` by exp(i * sign * phase) using the
  factored phasor from `diag_segment_phasor_factors`.  All broadcasts fuse
  into the state multiply (one pass per state)."""
  row_phase, col_phase, crosses = factors
  phasor = None
  for ph in (row_phase, col_phase):
    if ph is not None:
      e = jnp.exp(1j * (sign * ph).astype(COMPLEX_DTYPE))
      phasor = e if phasor is None else phasor * e
  for w, rm, cm in crosses:
    st = _sign_rows([rm], int(states[0].shape[0])).reshape(-1, 1) \
        * jnp.asarray(_sign_cols([cm], int(states[0].shape[1])))
    f = (jnp.cos(w) + 1j * (sign * jnp.sin(w)) * st).astype(COMPLEX_DTYPE)
    phasor = f if phasor is None else phasor * f
  if phasor is None:
    return tuple(states)
  return tuple(s * phasor for s in states)


def _apply_diag_segment(gates, angles, state: jnp.ndarray) -> jnp.ndarray:
  """A run of diagonal gates: all diagonal matrices commute, so their phase
  angles accumulate into one broadcasted phasor and the state is multiplied
  once -- in factored row x col x cross form when the segment admits it
  (see `diag_segment_phasor_factors`), else via the materialized [R, C]
  phase array."""
  factors = diag_segment_phasor_factors(gates, angles, state.shape)
  if factors is not None:
    (out,) = apply_diag_segment_phasor(factors, (state,))
    return out
  total = diag_segment_phase(gates, angles, state.shape)
  return state * jnp.exp(1j * total.astype(COMPLEX_DTYPE))


def _pallas_forward_enabled() -> bool:
  """Opt-in: the whole-circuit Pallas kernel is currently VPU-bound on its
  per-factor diagonal rotations and measures SLOWER than the block-matmul
  JAX path below (2.4ms vs 1.8ms per 20q/4L apply, chained-scan timing on
  v5e); the MXU block folding made plain XLA the fast path.  Kept for
  experimentation via QHBM_PALLAS=1."""
  return os.environ.get("QHBM_PALLAS", "0") == "1"


def apply_circuit(circuit: ir.Circuit,
                  symbol_values: jnp.ndarray,
                  state: jnp.ndarray,
                  angle_offsets: Optional[jnp.ndarray] = None,
                  fuse: bool = True) -> jnp.ndarray:
  """Applies the whole circuit.  `angle_offsets[g]` (optional, [num_gates])
  is added to gate g's resolved angle -- the hook used by the parameter-shift
  differentiator to shift individual gate occurrences.  `fuse` enables
  trace-time gate fusion (see _apply_1q_segment / _apply_diag_segment).

  The default production path on every platform is the segment-fused XLA
  path below.  An experimental whole-circuit Pallas kernel (state
  VMEM-resident across all gates) exists behind QHBM_PALLAS=1 for supported
  circuits on TPU lowerings; it is off by default because the XLA path
  measured faster (see ops/pallas_sv.py's module docstring).
  """
  if (fuse and angle_offsets is None and _pallas_forward_enabled()):
    from qhbmlib_tpu.ops import pallas_sv
    if pallas_sv.supported(circuit):
      return jax.lax.platform_dependent(
          state,
          tpu=functools.partial(pallas_sv.apply_circuit_pallas, circuit,
                                symbol_values),
          default=functools.partial(_apply_circuit_jax, circuit,
                                    symbol_values, None, True))
  return _apply_circuit_jax(circuit, symbol_values, angle_offsets, fuse,
                            state)


def _apply_circuit_jax(circuit: ir.Circuit,
                       symbol_values: jnp.ndarray,
                       angle_offsets: Optional[jnp.ndarray],
                       fuse: bool,
                       state: jnp.ndarray) -> jnp.ndarray:
  """Segment-fused pure-JAX circuit application (all platforms)."""
  angles = []
  for g_idx, gate in enumerate(circuit.gates):
    angle = resolve_angle(gate, symbol_values)
    if angle_offsets is not None:
      angle = angle + angle_offsets[g_idx]
    angles.append(angle)

  if not fuse:
    for gate, angle in zip(circuit.gates, angles):
      state = apply_gate(gate, angle, state)
    return state

  gates = circuit.gates
  # For large states, pin the schedule to the segment chain: XLA's list
  # scheduler loses buffer reuse on long unrolled chains of multi-GB buffers
  # (observed 75 live states at 28 qubits without barriers).
  big = int(state.shape[-2]) * int(state.shape[-1]) >= 2**24
  for cls, idxs in segment_circuit(gates):
    seg_gates = [gates[i] for i in idxs]
    seg_angles = [angles[i] for i in idxs]
    if cls == "1q":
      state = _apply_1q_segment(seg_gates, seg_angles, state)
    elif cls == "diag" and len(idxs) > 1:
      state = _apply_diag_segment(seg_gates, seg_angles, state)
    else:
      for gate, angle in zip(seg_gates, seg_angles):
        state = apply_gate(gate, angle, state)
    if big:
      state = jax.lax.optimization_barrier(state)
  return state


# ---------------------------------------------------------------------------
# Measurement / metrics
# ---------------------------------------------------------------------------

def expectation_terms(state: jnp.ndarray, op: paulis.PauliSum) -> jnp.ndarray:
  """Per-term real expectations <psi|P_t|psi>, shape [num_terms].

  Coefficients are NOT applied; dot with `op.coeffs` outside so that
  coefficient gradients flow through plain autodiff.  All purely-diagonal
  (I/Z) terms evaluate together as one bilinear contraction against
  |psi|^2; X/Y-carrying terms are tiered below (cross-gram / block /
  kron-bin transition contractions) -- only >3-major-qubit strings pay a
  per-term state pass.
  """
  r, c = state.shape
  if op.num_terms == 0:  # e.g. concat_ops([], n); jnp.stack([]) would raise
    return jnp.zeros([0], jnp.float32)
  n = len(op.codes[0])
  m = int(c).bit_length() - 1
  nr = n - m
  num_terms = op.num_terms
  vals = [None] * num_terms

  diag_idx = [t for t in range(num_terms) if _is_diag_codes(op.codes[t])]
  if diag_idx:
    prob = jnp.real(jnp.conj(state) * state)  # |psi|^2 as [R, C]
    masks = [pauli_z_masks(op.codes[t], nr, m) for t in diag_idx]
    diag_vals = parity_bilinear([rm for rm, _ in masks],
                                [cm for _, cm in masks], prob)
    for k, t in enumerate(diag_idx):
      vals[t] = diag_vals[k]

  # Tier the X/Y-carrying terms (see apply_pauli_sum): minor-only terms all
  # come from ONE [C, C] cross-row contraction; major-supported terms share
  # joint transition tensors, 3 qubits per state pass; mixed major+minor
  # terms contract a column-resolved transition tensor; >3-major-qubit
  # strings fall back to a per-term pass.
  blocks = _row_blocks(nr)
  minor_only, spanning, mixed, fallback = [], [], [], []
  block_terms = {b: [] for b in blocks}
  for t in range(num_terms):
    if vals[t] is not None:
      continue
    majors, minors = _term_factors(op.codes[t], nr)
    mq = tuple(q for q, _ in majors)
    if not majors:
      minor_only.append(t)
    elif minors:
      if len(mq) <= 3:
        mixed.append((t, mq))
      else:
        fallback.append(t)
    else:
      home = [b for b in blocks if b[0] <= mq[0] and mq[-1] < b[0] + b[1]]
      if home:
        block_terms[home[0]].append(t)
      elif len(mq) <= 3:
        spanning.append((t, mq))
      else:
        fallback.append(t)

  if minor_only:
    kmat = cross_gram(state, state)  # [C, C]
    for t in minor_only:
      p_np = _minor_pauli_np(_term_factors(op.codes[t], nr)[1], m)
      vals[t] = jnp.real(jnp.sum(jnp.asarray(p_np) * kmat))

  for (start, k), ts in block_terms.items():
    if not ts:
      continue
    g_block = block_transition(state, state, start, k)  # [2^k, 2^k]
    for t in ts:
      majors, _ = _term_factors(op.codes[t], nr)
      p_np = _embed_block_pauli_np(majors, start, k)
      vals[t] = jnp.real(jnp.sum(jnp.asarray(p_np) * g_block))

  for bin_qubits, ts in _bin_by_support(spanning):
    k = len(bin_qubits)
    g = major_transition(state, bin_qubits)  # [2, 2] * k
    for t in ts:
      majors, _ = _term_factors(op.codes[t], nr)
      p_np = _interleave_kron_np(_major_kron_np(bin_qubits, dict(majors)), k)
      vals[t] = jnp.real(jnp.sum(jnp.asarray(p_np) * g))

  for bin_qubits, ts in _bin_by_support(mixed):
    k = len(bin_qubits)
    g = major_transition(state, bin_qubits, keep_cols=True)  # [...2x2, C, D]
    for t in ts:
      majors, minors = _term_factors(op.codes[t], nr)
      pmaj = _interleave_kron_np(_major_kron_np(bin_qubits, dict(majors)), k)
      pmin = _minor_pauli_np(minors, m)
      gm = jnp.tensordot(g, jnp.asarray(pmin), axes=([-2, -1], [0, 1]))
      vals[t] = jnp.real(jnp.sum(jnp.asarray(pmaj) * gm))

  conj = None
  for t in fallback:
    if conj is None:
      conj = jnp.conj(state)
    p_state = apply_pauli_string(state, op.codes[t])
    vals[t] = jnp.real(jnp.sum(conj * p_state))
  return jnp.stack(vals)


def expectation(state: jnp.ndarray, op: paulis.PauliSum) -> jnp.ndarray:
  """<psi| op |psi> as a real scalar."""
  return jnp.sum(expectation_terms(state, op) * jnp.real(op.coeffs))


def probabilities(state: jnp.ndarray) -> jnp.ndarray:
  return jnp.abs(to_vector(state))**2


def sample_indices(key: jax.Array, state: jnp.ndarray,
                   num_samples: int) -> jnp.ndarray:
  """Draws basis-state indices from |psi|^2.  Shape [num_samples], int32."""
  probs = probabilities(state)
  return utils.categorical_indices_from_weights(key, probs, num_samples)


def sample_bitstrings(key: jax.Array, state: jnp.ndarray,
                      num_samples: int) -> jnp.ndarray:
  """Measurement bitstrings [num_samples, n] int8 from |psi|^2."""
  n = num_qubits_of(state)
  return index_to_bits(sample_indices(key, state, num_samples), n)


@functools.partial(jax.jit, static_argnums=(0,))
def unitary(circuit: ir.Circuit, symbol_values: jnp.ndarray) -> jnp.ndarray:
  """Dense (2^n, 2^n) unitary; metrics-only path (small n).

  Replaces `tfq.layers.Unitary` (reference:
  qhbmlib/inference/qnn_utils.py:29-33).
  Jitted (circuit static) so metric code can call it eagerly: dispatching
  the column sweeps op-by-op would run complex ops outside XLA, which some
  accelerator backends reject.
  """
  n = circuit.num_qubits
  dim = 2**n
  eye = jnp.eye(dim, dtype=COMPLEX_DTYPE)

  def column(col):
    out = apply_circuit(circuit, symbol_values, from_vector(col, n))
    return to_vector(out)

  return jax.vmap(column, in_axes=1, out_axes=1)(eye)


# ---------------------------------------------------------------------------
# Convenience jitted entry points
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0,))
def simulate(circuit: ir.Circuit, symbol_values: jnp.ndarray) -> jnp.ndarray:
  """|psi> = U(values)|0...0>, shape [R, C]."""
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
