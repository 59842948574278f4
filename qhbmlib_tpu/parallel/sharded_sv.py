"""Amplitude-sharded statevector engine (multi-chip tensor parallelism).

The 2^n-amplitude statevector is split across the 'state' mesh axis: a device
at position d along the axis holds the amplitudes whose first (most
significant, cirq-convention) k = log2(axis size) qubit values equal the bits
of d.  This is the TPU-native replacement for the scaling axis the reference
caps at single-host qsim (SURVEY.md section 2.3, section 5 "long-context"):

  * gates on local qubits (q >= k) apply on the local [R, C] block with the
    dense engine's MXU/VPU paths (ops/statevector.py) -- zero communication;
  * gates on global qubits (q < k) use direct partner exchange: the partner
    block arrives via `jax.lax.ppermute` over ICI and the output is a
    device-bit-dependent linear combination of own + partner blocks (the
    distributed-simulation analog of a ring collective schedule);
  * Pauli-string applications never need swaps: global X/Y become a single
    fused `ppermute` (device-index XOR), global Z/Y phases are per-device
    scalars;
  * expectation values finish with a `psum` over the state axis.

All functions with a `k`/`axis_name` signature run INSIDE `shard_map`; the
`*_sharded` top-level wrappers build the `shard_map` over a mesh from
`parallel.mesh.make_mesh`.  Differentiation: `batched_term_expectations`
carries a custom adjoint VJP (reverse gate sweep, O(2^(n-k)) memory per
device) mirroring ops/adjoint.py.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
try:
  from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
  from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from qhbmlib_tpu.ops import circuit_ir as ir
from qhbmlib_tpu.ops import paulis
from qhbmlib_tpu.ops import statevector as sv
from qhbmlib_tpu.parallel import mesh as mesh_lib

COMPLEX_DTYPE = sv.COMPLEX_DTYPE


# ---------------------------------------------------------------------------
# In-body primitives (run inside shard_map over `axis_name`)
# ---------------------------------------------------------------------------

def _device_bit(axis_name: str, k: int, g: int) -> jnp.ndarray:
  """Bit of global qubit g (< k) in this device's state-axis position."""
  idx = jax.lax.axis_index(axis_name)
  return (idx >> (k - 1 - g)) & 1


def _xor_perm(num_devices: int, mask: int):
  """ppermute permutation sending device d's data to device d ^ mask."""
  return [(d, d ^ mask) for d in range(num_devices)]


def _select_bit(mat: jnp.ndarray, b) -> jnp.ndarray:
  """Indexes axis 0 of `mat` with a traced bit (0/1)."""
  return jnp.where(b == 0, mat[0], mat[1])


def _apply_dense_routed(mat: jnp.ndarray, gate_qubits: Tuple[int, ...],
                        local: jnp.ndarray, k: int,
                        axis_name: str, diag: bool = False) -> jnp.ndarray:
  """Applies a dense 1-/2-qubit gate that may touch global (sharded) qubits.

  Global qubits are handled by direct partner exchange: the partner device's
  block arrives via one `ppermute` and the output is a device-bit-dependent
  linear combination of own + partner blocks (the gate matrix rows are
  selected by this device's bits).  Exactly one full-block exchange per
  global qubit pair -- the same ICI traffic as a global<->local qubit swap,
  with no scratch-qubit or minimum-local-size requirement.

  `diag=True` (a STATIC property of the gate kind: ZP/RZ/CZP/ZZP) short-
  circuits all of that: a diagonal gate never mixes amplitudes across
  devices, so global qubits reduce to a per-device scalar selected by the
  device bits -- zero ICI traffic instead of full-block exchanges whose
  cross coefficients are statically zero.
  """
  num_devices = 2**k
  global_qubits = [q for q in gate_qubits if q < k]
  if not global_qubits:
    return sv.apply_dense(mat, tuple(q - k for q in gate_qubits), local)

  if diag:
    if len(gate_qubits) == 1:
      (g,) = gate_qubits
      d = jnp.diagonal(mat)  # [2]
      return _select_bit(d, _device_bit(axis_name, k, g)) * local
    d = jnp.diagonal(mat.reshape(4, 4)).reshape(2, 2)  # [q0_in, q1_in]
    if len(global_qubits) == 1:
      (g,) = global_qubits
      (u,) = [q for q in gate_qubits if q >= k]
      if gate_qubits[0] != g:  # normalize to [g_in, u_in]
        d = d.T
      sub = _select_bit(d, _device_bit(axis_name, k, g))  # [2] diag on u
      return sv.apply_dense(jnp.diag(sub), (u - k,), local)
    g0, g1 = gate_qubits
    coeff = _select_bit(_select_bit(d, _device_bit(axis_name, k, g0)),
                        _device_bit(axis_name, k, g1))
    return coeff * local

  if len(gate_qubits) == 1:
    (g,) = gate_qubits
    b = _device_bit(axis_name, k, g)
    row = _select_bit(mat, b)  # [2]: this device's output row
    keep = _select_bit(row, b)
    ex = _select_bit(row, 1 - b)
    partner = jax.lax.ppermute(local, axis_name,
                               _xor_perm(num_devices, 1 << (k - 1 - g)))
    return keep * local + ex * partner

  # Two-qubit gate.
  mt = mat.reshape(2, 2, 2, 2)  # (q0_out, q1_out, q0_in, q1_in)
  if len(global_qubits) == 1:
    (g,) = global_qubits
    (u,) = [q for q in gate_qubits if q >= k]
    if gate_qubits[0] != g:  # normalize to (g_out, u_out, g_in, u_in)
      mt = jnp.transpose(mt, (1, 0, 3, 2))
    b = _device_bit(axis_name, k, g)
    m_b = _select_bit(mt, b)  # [u_out, g_in, u_in]
    sub_keep = _select_bit(jnp.transpose(m_b, (1, 0, 2)), b)  # [2, 2] on u
    sub_ex = _select_bit(jnp.transpose(m_b, (1, 0, 2)), 1 - b)
    partner = jax.lax.ppermute(local, axis_name,
                               _xor_perm(num_devices, 1 << (k - 1 - g)))
    u_local = (u - k,)
    return (sv.apply_dense(sub_keep, u_local, local) +
            sv.apply_dense(sub_ex, u_local, partner))

  # Both qubits global: blocks from up to three partner devices.
  g0, g1 = gate_qubits
  b0 = _device_bit(axis_name, k, g0)
  b1 = _device_bit(axis_name, k, g1)
  m_row = _select_bit(_select_bit(mt, b0), b1)  # [g0_in, g1_in]
  mask0 = 1 << (k - 1 - g0)
  mask1 = 1 << (k - 1 - g1)
  pieces = {
      (0, 0): local,
      (1, 0): jax.lax.ppermute(local, axis_name,
                               _xor_perm(num_devices, mask0)),
      (0, 1): jax.lax.ppermute(local, axis_name,
                               _xor_perm(num_devices, mask1)),
      (1, 1): jax.lax.ppermute(local, axis_name,
                               _xor_perm(num_devices, mask0 | mask1)),
  }
  out = jnp.zeros_like(local)
  for (d0, d1), piece in pieces.items():
    j0 = jnp.bitwise_xor(b0, d0)
    j1 = jnp.bitwise_xor(b1, d1)
    coeff = _select_bit(_select_bit(m_row, j0), j1)
    out = out + coeff * piece
  return out


def apply_pauli_string_local(local: jnp.ndarray, codes: Sequence[int], k: int,
                             axis_name: str) -> jnp.ndarray:
  """P|psi> for a full-length static Pauli code row on the sharded state.

  Global X/Y flips collapse into ONE device-index-XOR ppermute; global Z/Y
  phases are per-device scalars; local codes reuse the dense engine's fused
  phase+permute path.  Phases are computed from the *input* device bits, so
  they are applied before the permute (matching ops/statevector.py).
  """
  num_devices = 2**k
  xor_mask = 0
  phase = jnp.ones((), COMPLEX_DTYPE)
  for g in range(k):
    c = codes[g]
    if c == paulis.X:
      xor_mask |= 1 << (k - 1 - g)
    elif c == paulis.Y:
      xor_mask |= 1 << (k - 1 - g)
      b = _device_bit(axis_name, k, g)
      phase = phase * jnp.where(b == 0, 1j, -1j).astype(COMPLEX_DTYPE)
    elif c == paulis.Z:
      b = _device_bit(axis_name, k, g)
      phase = phase * jnp.where(b == 0, 1.0, -1.0).astype(COMPLEX_DTYPE)
  out = sv.apply_pauli_string(local, list(codes)[k:])
  out = out * phase
  if xor_mask:
    out = jax.lax.ppermute(out, axis_name, _xor_perm(num_devices, xor_mask))
  return out


_full_codes = sv._prot_codes  # one shared PROT codes expansion


def _local_num_qubits(local: jnp.ndarray) -> int:
  return (int(local.shape[0]) * int(local.shape[1])).bit_length() - 1


def apply_gate_local(gate: ir.Gate, angle, local: jnp.ndarray, k: int,
                     axis_name: str) -> jnp.ndarray:
  """Sharded equivalent of ops/statevector.py apply_gate."""
  n = k + _local_num_qubits(local)
  if gate.kind == ir.PROT:
    p_state = apply_pauli_string_local(local, _full_codes(gate, n), k,
                                       axis_name)
    a = jnp.asarray(angle, jnp.float32).astype(COMPLEX_DTYPE)
    return jnp.cos(a) * local - 1j * jnp.sin(a) * p_state
  if gate.kind == ir.GPHASE:
    a = jnp.asarray(angle, jnp.float32).astype(COMPLEX_DTYPE)
    return jnp.exp(1j * a) * local
  mat = sv.gate_matrix(gate.kind, angle)
  return _apply_dense_routed(mat, gate.qubits, local, k, axis_name,
                             diag=gate.kind in sv._DIAG_KINDS)


def apply_gate_dangle_local(gate: ir.Gate, angle, local: jnp.ndarray, k: int,
                            axis_name: str) -> jnp.ndarray:
  """(dU/dangle)|psi> on the sharded state (adjoint backward sweep)."""
  n = k + _local_num_qubits(local)
  if gate.kind == ir.PROT:
    p_state = apply_pauli_string_local(local, _full_codes(gate, n), k,
                                       axis_name)
    a = jnp.asarray(angle, jnp.float32).astype(COMPLEX_DTYPE)
    return -jnp.sin(a) * local - 1j * jnp.cos(a) * p_state
  if gate.kind == ir.GPHASE:
    a = jnp.asarray(angle, jnp.float32).astype(COMPLEX_DTYPE)
    return 1j * jnp.exp(1j * a) * local
  angle = jnp.asarray(angle, jnp.float32)
  _, dmat = jax.jvp(lambda a: sv.gate_matrix(gate.kind, a), (angle,),
                    (jnp.ones_like(angle),))
  return _apply_dense_routed(dmat, gate.qubits, local, k, axis_name,
                             diag=gate.kind in sv._DIAG_KINDS)


@functools.lru_cache(maxsize=None)
def _shift_gate(gate: ir.Gate, k: int) -> ir.Gate:
  return dataclasses.replace(gate,
                             qubits=tuple(q - k for q in gate.qubits))


def _segment_is_local(gates, idxs, k) -> bool:
  return all(q >= k for i in idxs for q in gates[i].qubits)


def _apply_1q_segment_sharded(seg_gates, seg_angles, local: jnp.ndarray,
                              k: int, axis_name: str) -> jnp.ndarray:
  """A run of 1-qubit dense gates that may touch global (sharded) qubits.

  Gates on distinct qubits commute, so same-qubit chains fold into one 2x2
  product first: local qubits then reuse the dense engine's fused path
  (kron row blocks + one combined minor matmul) and each global qubit pays
  exactly ONE partner exchange for its whole folded chain -- instead of one
  `ppermute` per gate occurrence (e.g. an rx+ry HEA layer on a global qubit
  costs 1 exchange, not 2)."""
  local_gates, local_angles = [], []
  global_chains = {}
  for gate, angle in zip(seg_gates, seg_angles):
    q = gate.qubits[0]
    if q >= k:
      local_gates.append(_shift_gate(gate, k))
      local_angles.append(angle)
    else:
      global_chains.setdefault(q, []).append((gate, angle))
  if local_gates:
    local = sv._apply_1q_segment(local_gates, local_angles, local)
  hp = jax.lax.Precision.HIGHEST  # tiny operator folds: always exact
  for q in sorted(global_chains):
    mat = None
    for gate, angle in global_chains[q]:
      g_mat = sv.gate_matrix(gate.kind, angle)
      mat = g_mat if mat is None else jnp.matmul(g_mat, mat, precision=hp)
    local = _apply_dense_routed(mat, (q,), local, k, axis_name)
  return local


def _diag_triples_sharded(seg_gates, local_shape, k):
  """Walsh triples of a diagonal segment with ORIGINAL qubit numbering,
  split into (coeffs, global_masks, row_masks, col_masks, owner) for the
  sharded [R, C] local block.

  Works through the dense `diag_segment_triples` on the full-index layout
  [global bits | local rows | cols]: global qubits are the TOP bits of the
  basis index by construction, so a full-layout row mask's high bits ARE
  the device-bit mask."""
  r, c = local_shape
  nr = int(r).bit_length() - 1
  m = int(c).bit_length() - 1
  coeffs, rms, cms, owner = sv.diag_segment_triples(seg_gates, k + nr, m)
  gms = [rm >> nr for rm in rms]
  rms_local = [rm & ((1 << nr) - 1) for rm in rms]
  return coeffs, gms, rms_local, cms, owner


def _apply_diag_segment_sharded(seg_gates, seg_angles, local: jnp.ndarray,
                                k: int, axis_name: str) -> jnp.ndarray:
  """A run of diagonal gates that may touch global qubits: ONE fused phase
  pass over the local block (zero collectives -- diagonals never mix
  amplitudes across devices).  Global bits contribute per-device +-1 signs
  folded into the parity weights; everything else is the dense engine's
  chunked parity-sign matmul build."""
  r, c = local.shape
  coeffs, gms, rms, cms, owner = _diag_triples_sharded(seg_gates,
                                                       local.shape, k)
  idx = jax.lax.axis_index(axis_name)
  signs = _device_signs(idx, gms)  # [K]; mask 0 -> +1
  weighted = [coeffs[j] * signs[j] * jnp.asarray(seg_angles[owner[j]],
                                                 jnp.float32)
              for j in range(len(coeffs))]
  factors = sv.phasor_factors_from_triples(weighted, rms, cms, (r, c))
  if factors is not None:
    (out,) = sv.apply_diag_segment_phasor(factors, (local,))
    return out
  total = sv.parity_outer_sum(weighted, rms, cms, (r, c))
  return local * jnp.exp(1j * total.astype(COMPLEX_DTYPE))


def _bwd_diag_segment_sharded(seg_gates, seg_angles, grad_terms, a, lam, k,
                              axis_name):
  """Backward through a diagonal run touching global qubits (sharded
  analog of ops/adjoint.py _bwd_diag_segment): per-gate gradients are
  per-device partial bilinear reductions (the caller's stacked psum
  completes them), and the un-apply is one shared phase multiply."""
  w = jnp.imag(jnp.conj(lam) * a)
  coeffs, gms, rms, cms, owner = _diag_triples_sharded(seg_gates, a.shape, k)
  per_factor = sv.parity_bilinear(rms, cms, w)
  idx = jax.lax.axis_index(axis_name)
  signs = _device_signs(idx, gms)
  for g_idx, gate in enumerate(seg_gates):
    if gate.slot >= 0:
      dangle = -2.0 * sum(coeffs[j] * signs[j] * per_factor[j]
                          for j in range(len(owner)) if owner[j] == g_idx)
      grad_terms.append((gate.slot, gate.coeff * dangle))
  neg = [-jnp.asarray(a_j, jnp.float32) for a_j in seg_angles]
  weighted = [coeffs[j] * signs[j] * neg[owner[j]]
              for j in range(len(coeffs))]
  factors = sv.phasor_factors_from_triples(weighted, rms, cms, a.shape)
  if factors is not None:
    return sv.apply_diag_segment_phasor(factors, (a, lam))
  total = sv.parity_outer_sum(weighted, rms, cms, a.shape)
  phase = jnp.exp(1j * total.astype(COMPLEX_DTYPE))
  return a * phase, lam * phase


def apply_circuit_local(circuit: ir.Circuit, symbol_values: jnp.ndarray,
                        local: jnp.ndarray, k: int, axis_name: str,
                        angle_offsets: Optional[jnp.ndarray] = None
                        ) -> jnp.ndarray:
  """Sharded circuit application.  Segments that touch only local qubits
  reuse the dense engine's fused appliers on the local block (per-qubit 1q
  merging, packed kron blocks, single-matmul diagonal phases); 1q-dense
  segments with global gates fold per qubit so each global qubit pays one
  exchange per segment; only the remaining global gates pay the per-gate
  partner-exchange path."""
  gates = circuit.gates
  angles = []
  for g_idx, gate in enumerate(gates):
    angle = sv.resolve_angle(gate, symbol_values)
    if angle_offsets is not None:
      angle = angle + angle_offsets[g_idx]
    angles.append(angle)
  for cls, idxs in sv.segment_circuit(gates):
    seg_angles = [angles[i] for i in idxs]
    if _segment_is_local(gates, idxs, k) and cls in ("1q", "diag"):
      seg_gates = [_shift_gate(gates[i], k) for i in idxs]
      if cls == "1q":
        local = sv._apply_1q_segment(seg_gates, seg_angles, local)
      else:
        local = sv._apply_diag_segment(seg_gates, seg_angles, local)
    elif cls == "1q":
      local = _apply_1q_segment_sharded([gates[i] for i in idxs], seg_angles,
                                        local, k, axis_name)
    elif cls == "diag" and len(idxs) > 1:
      local = _apply_diag_segment_sharded([gates[i] for i in idxs],
                                          seg_angles, local, k, axis_name)
    else:
      for j, i in enumerate(idxs):
        local = apply_gate_local(gates[i], seg_angles[j], local, k, axis_name)
  return local


def _apply_inverse_local(gate: ir.Gate, angle, local, k, axis_name):
  inv = ir.Gate(gate.kind, gate.qubits, -1, 0.0, 0.0, gate.paulis)
  return apply_gate_local(inv, -angle, local, k, axis_name)


def basis_state_local(n: int, k: int, bits: jnp.ndarray,
                      axis_name: str) -> jnp.ndarray:
  """Local block of |bits>: nonzero only on the owning device."""
  dev = sv.bits_to_index(bits[:k], k) if k else jnp.zeros((), jnp.int32)
  local_idx = sv.bits_to_index(bits[k:], n - k)
  amp = jnp.where(jax.lax.axis_index(axis_name) == dev, 1.0,
                  0.0).astype(COMPLEX_DTYPE)
  flat = jnp.zeros((2**(n - k),), COMPLEX_DTYPE).at[local_idx].set(amp)
  return sv.from_vector(flat, n - k)


def _global_masks(codes_row, k: int) -> Tuple[int, int, int]:
  """(xor_mask, phase_mask, num_Y) of a code row's global (qubit < k) part.

  xor_mask: device-index XOR bits (X/Y); phase_mask: per-device sign bits
  (Z/Y); the full global phase at device index e is
  (1j)^num_Y * (-1)^popcount(e & phase_mask) -- matching
  `apply_pauli_string_local`'s factor convention."""
  xm = pm = ny = 0
  for g in range(k):
    c = codes_row[g]
    bit = 1 << (k - 1 - g)
    if c == paulis.X:
      xm |= bit
    elif c == paulis.Y:
      xm |= bit
      pm |= bit
      ny += 1
    elif c == paulis.Z:
      pm |= bit
  return xm, pm, ny


def _device_signs(idx, phase_masks) -> jnp.ndarray:
  """[T] float32 signs (-1)^popcount(idx & phase_masks[t]) for a traced
  device index against static per-term masks."""
  masks = np.asarray(phase_masks, np.int32)  # host: see RESULTS.md r5
  par = jax.lax.population_count(jnp.bitwise_and(idx, masks)) & 1
  return (1.0 - 2.0 * par).astype(jnp.float32)


def _phase_combine(ny: int, sign, re_part, im_part):
  """Re((1j)^ny * sign * (re_part + 1j*im_part)) with static ny."""
  r = ny % 4
  if r == 0:
    return sign * re_part
  if r == 1:
    return -sign * im_part
  if r == 2:
    return -sign * re_part
  return sign * im_part


def _expectation_terms_local_legacy(local: jnp.ndarray, op: paulis.PauliSum,
                                    k: int, axis_name: str) -> jnp.ndarray:
  """Pre-tiering reference path: one full local state pass (and one
  ppermute when the term has global X/Y) PER TERM.  Kept as the
  QHBM_SHARDED_EXPECT=legacy escape hatch and as the correctness oracle
  for the tiered path's tests."""
  flat = jnp.conj(local.reshape(-1))
  vals = []
  for t in range(op.num_terms):
    p_state = apply_pauli_string_local(local, op.codes[t], k, axis_name)
    vals.append(jnp.real(jnp.sum(flat * p_state.reshape(-1))))
  return jax.lax.psum(jnp.stack(vals), axis_name)


def expectation_terms_local(local: jnp.ndarray, op: paulis.PauliSum, k: int,
                            axis_name: str) -> jnp.ndarray:
  """Per-term real <psi|P_t|psi>, psum-reduced over the state axis.

  Tiered to minimize state passes and ICI traffic (mirroring the dense
  engine's `ops/statevector.py expectation_terms`):

    * terms whose global part is diagonal (I/Z) evaluate through ONE
      dense-engine tiered pass on the local block (all diagonal terms share
      a single parity-bilinear contraction; X/Y-local terms share block
      transition tensors), times a per-device parity sign -- zero
      collectives until the final psum;
    * terms with global X/Y group by their device-XOR mask and share ONE
      `ppermute` per distinct mask; diagonal local parts within a group
      batch into one bilinear contraction against conj(psi)*partner.

  A 1D-TFIM observable on a 2^k-device mesh thus costs k block exchanges
  (one per global X qubit) and a handful of local contractions, instead of
  one full state pass + psum per term.

  QHBM_SHARDED_EXPECT=legacy (read at TRACE time, like QHBM_DIAG_PHASOR)
  selects the pre-tiering per-term path instead -- the A/B escape hatch
  for the virtual-mesh regime where the tiered path's fewer-but-wider
  contractions measured slower at 8 host devices (VERDICT r4 weak #3;
  benchmarks/analytic_scaling.json)."""
  if os.environ.get("QHBM_SHARDED_EXPECT", "tiered") == "legacy":
    return _expectation_terms_local_legacy(local, op, k, axis_name)
  num_terms = op.num_terms
  num_devices = 2**k
  idx = jax.lax.axis_index(axis_name)
  nl = _local_num_qubits(local)
  m = int(local.shape[1]).bit_length() - 1
  nr = nl - m
  vals = [None] * num_terms

  groups = {}
  infos = []
  for t in range(num_terms):
    info = _global_masks(op.codes[t], k)
    infos.append(info)
    groups.setdefault(info[0], []).append(t)

  # Tier 1: global part diagonal -> dense tiered local pass * device sign.
  ts0 = groups.pop(0, [])
  if ts0:
    lop = paulis.PauliSum(tuple(op.codes[t][k:] for t in ts0),
                          jnp.ones([len(ts0)], jnp.float32), nl)
    local_vals = sv.expectation_terms(local, lop)  # [len(ts0)] per device
    signs = _device_signs(idx, [infos[t][1] for t in ts0])
    for j, t in enumerate(ts0):
      vals[t] = signs[j] * local_vals[j]

  # Tier 2: one partner exchange per distinct global-XOR mask.
  for xm, ts in groups.items():
    partner = jax.lax.ppermute(local, axis_name,
                               _xor_perm(num_devices, xm))
    src = jnp.bitwise_xor(idx, xm)  # phase is evaluated at the SOURCE index
    diag_ts = [t for t in ts if sv._is_diag_codes(op.codes[t][k:])]
    rest_ts = [t for t in ts if t not in diag_ts]
    if diag_ts:
      w = jnp.conj(local) * partner
      masks = [sv.pauli_z_masks(op.codes[t][k:], nr, m) for t in diag_ts]
      br = sv.parity_bilinear([rm for rm, _ in masks],
                              [cm for _, cm in masks], jnp.real(w))
      bi = sv.parity_bilinear([rm for rm, _ in masks],
                              [cm for _, cm in masks], jnp.imag(w))
      signs = _device_signs(src, [infos[t][1] for t in diag_ts])
      for j, t in enumerate(diag_ts):
        vals[t] = _phase_combine(infos[t][2], signs[j], br[j], bi[j])
    if rest_ts:
      flat = jnp.conj(local.reshape(-1))
      signs = _device_signs(src, [infos[t][1] for t in rest_ts])
      for j, t in enumerate(rest_ts):
        p_state = sv.apply_pauli_string(partner, list(op.codes[t])[k:])
        z = jnp.sum(flat * p_state.reshape(-1))
        vals[t] = _phase_combine(infos[t][2], signs[j], jnp.real(z),
                                 jnp.imag(z))
  return jax.lax.psum(jnp.stack(vals), axis_name)


def build_lambda_local(psi: jnp.ndarray, op: paulis.PauliSum,
                       term_weights: jnp.ndarray, k: int,
                       axis_name: str) -> jnp.ndarray:
  """lam = sum_t w_t P_t |psi> on the sharded state, tiered like the dense
  engine's `apply_pauli_sum`: terms group by global-XOR mask, each group
  runs ONE tiered local apply (with per-device phase folded into the term
  weights) followed by a single `ppermute` -- instead of one full state
  pass + exchange per term."""
  num_devices = 2**k
  idx = jax.lax.axis_index(axis_name)
  nl = _local_num_qubits(psi)

  groups = {}
  infos = []
  for t in range(op.num_terms):
    info = _global_masks(op.codes[t], k)
    infos.append(info)
    groups.setdefault(info[0], []).append(t)

  lam = jnp.zeros_like(psi)
  for xm, ts in groups.items():
    signs = _device_signs(idx, [infos[t][1] for t in ts])
    iy = np.asarray([(1j)**(infos[t][2] % 4) for t in ts],
                    np.complex64)  # host: see RESULTS.md r5
    w = (term_weights[jnp.asarray(ts)].astype(COMPLEX_DTYPE) *
         signs.astype(COMPLEX_DTYPE) * iy)
    lop = paulis.PauliSum(tuple(op.codes[t][k:] for t in ts),
                          jnp.ones([len(ts)], jnp.float32), nl)
    contrib = sv.apply_pauli_sum(psi, lop, term_weights=w)
    if xm:
      contrib = jax.lax.ppermute(contrib, axis_name,
                                 _xor_perm(num_devices, xm))
    lam = lam + contrib
  return lam


# ---------------------------------------------------------------------------
# Adjoint differentiation on the sharded state (mirrors ops/adjoint.py)
# ---------------------------------------------------------------------------

def _term_expectations_fwd_local(circuit, values, bits, big_op, k, axis_name):
  psi = apply_circuit_local(circuit, values,
                            basis_state_local(circuit.num_qubits, k, bits,
                                              axis_name), k, axis_name)
  return expectation_terms_local(psi, big_op, k, axis_name)


def _bwd_1q_segment_sharded(seg_gates, seg_angles, grad_terms, a, lam, k,
                            axis_name):
  """Backward through a 1q-dense run that touches global qubits.

  Local chains reuse the dense engine's fused backward (block transition
  MXU contractions + kron-folded un-applies) on the local block.  Each
  global qubit's whole chain then costs ONE exchange total: `a` and `lam`
  ride a single stacked [2, R, C] ppermute (same bytes as two separate
  block exchanges, half the collective dispatches -- VERDICT r4 next #3).
  The 2x2 reduced transition matrix over a global qubit has its diagonal
  entry in the local inner product <lam|a> and its off-diagonal entry in
  <lam|partner_a>, so every gate gradient in the chain is a tiny 2x2
  contraction against those two dots -- and the folded inverse reuses the
  same partner blocks for the un-apply.  Per-device values are partial
  sums; the caller's stacked psum completes them.

  Exactness note: un-applies of disjoint-qubit chains applied symmetrically
  to `a` and `lam` cancel inside later inner products (V† M V = M for M on
  an untouched qubit), so interleaving local/global processing preserves
  the dense `_bwd_1q_segment` math."""
  from qhbmlib_tpu.ops import adjoint as dense_adjoint

  num_devices = 2**k
  local_gates, local_angles = [], []
  global_chains = {}
  for gate, angle in zip(seg_gates, seg_angles):
    q = gate.qubits[0]
    if q >= k:
      local_gates.append(_shift_gate(gate, k))
      local_angles.append(angle)
    else:
      global_chains.setdefault(q, []).append((gate, angle))
  if local_gates:
    a, lam = dense_adjoint._bwd_1q_segment(local_gates, local_angles,
                                           grad_terms, a, lam)
  hp = jax.lax.Precision.HIGHEST
  for q in sorted(global_chains):
    chain = global_chains[q]
    mask = 1 << (k - 1 - q)
    b = _device_bit(axis_name, k, q)
    partner = jax.lax.ppermute(jnp.stack([a, lam]), axis_name,
                               _xor_perm(num_devices, mask))
    partner_a, partner_lam = partner[0], partner[1]
    if any(gate.slot >= 0 for gate, _ in chain):
      dot_own = jnp.sum(jnp.conj(lam) * a)
      dot_cross = jnp.sum(jnp.conj(lam) * partner_a)
    suffix = jnp.eye(2, dtype=COMPLEX_DTYPE)
    for gate, angle in reversed(chain):
      mat = sv.gate_matrix(gate.kind, angle)
      if gate.slot >= 0:
        ang = jnp.asarray(angle, jnp.float32)
        _, dmat = jax.jvp(lambda t: sv.gate_matrix(gate.kind, t), (ang,),
                          (jnp.ones_like(ang),))
        mg = jnp.matmul(
            jnp.matmul(jnp.matmul(suffix, dmat, precision=hp),
                       jnp.conj(mat.T), precision=hp),
            jnp.conj(suffix.T), precision=hp)
        row = _select_bit(mg, b)
        dangle = 2.0 * jnp.real(_select_bit(row, b) * dot_own +
                                _select_bit(row, 1 - b) * dot_cross)
        grad_terms.append((gate.slot, gate.coeff * dangle))
      suffix = jnp.matmul(suffix, mat, precision=hp)
    v_inv = jnp.conj(suffix.T)
    row = _select_bit(v_inv, b)
    keep = _select_bit(row, b)
    ex = _select_bit(row, 1 - b)
    a = keep * a + ex * partner_a
    lam = keep * lam + ex * partner_lam
  return a, lam


def _term_expectations_bwd_local(circuit, values, bits, big_op, g, k,
                                 axis_name):
  """Adjoint reverse sweep; recomputes the forward state (memory O(2^(n-k))
  per device instead of carrying per-batch-element residual states).

  lambda builds from ONE tiered local apply + ppermute per distinct
  global-XOR mask (`build_lambda_local`); local-only segments reuse the
  dense engine's fused backward helpers on the local block; 1q segments
  with global gates fold per qubit (two exchanges per global qubit); and
  per-gate gradient contributions collect into one stacked psum + scatter
  at the end.
  """
  from qhbmlib_tpu.ops import adjoint as dense_adjoint

  psi = apply_circuit_local(circuit, values,
                            basis_state_local(circuit.num_qubits, k, bits,
                                              axis_name), k, axis_name)
  lam = build_lambda_local(psi, big_op, g, k, axis_name)
  grad_terms = []
  a = psi
  gates = circuit.gates
  angles = [sv.resolve_angle(gate, values) for gate in gates]
  for cls, idxs in reversed(sv.segment_circuit(gates)):
    seg_angles = [angles[i] for i in idxs]
    seg_start = len(grad_terms)
    if _segment_is_local(gates, idxs, k) and cls in ("1q", "diag"):
      seg_gates = [_shift_gate(gates[i], k) for i in idxs]
      if cls == "diag":
        a, lam = dense_adjoint._bwd_diag_segment(seg_gates, seg_angles,
                                                 grad_terms, a, lam)
      else:
        a, lam = dense_adjoint._bwd_1q_segment(seg_gates, seg_angles,
                                               grad_terms, a, lam)
    elif cls == "1q":
      a, lam = _bwd_1q_segment_sharded([gates[i] for i in idxs], seg_angles,
                                       grad_terms, a, lam, k, axis_name)
    elif cls == "diag" and len(idxs) > 1:
      a, lam = _bwd_diag_segment_sharded([gates[i] for i in idxs],
                                         seg_angles, grad_terms, a, lam, k,
                                         axis_name)
    else:
      for j, i in reversed(list(enumerate(idxs))):
        gate, angle = gates[i], seg_angles[j]
        a = _apply_inverse_local(gate, angle, a, k, axis_name)
        if gate.slot >= 0:
          d_psi = apply_gate_dangle_local(gate, angle, a, k, axis_name)
          dangle = 2.0 * jnp.real(
              jnp.sum(jnp.conj(lam.reshape(-1)) * d_psi.reshape(-1)))
          grad_terms.append((gate.slot, gate.coeff * dangle))
        lam = _apply_inverse_local(gate, angle, lam, k, axis_name)
    a, lam = dense_adjoint._seq_barrier(a, lam, grad_terms, seg_start)
  if not grad_terms:
    return jnp.zeros_like(values)
  # Local-segment contributions are per-device partial sums; one psum of the
  # stacked vector covers every gate at once.
  slots = jnp.asarray([s for s, _ in grad_terms], jnp.int32)
  contribs = jax.lax.psum(jnp.stack([d for _, d in grad_terms]), axis_name)
  return jnp.zeros_like(values).at[slots].add(contribs)


# ---------------------------------------------------------------------------
# Top-level wrappers (build the shard_map)
# ---------------------------------------------------------------------------

_concat_ops = paulis.concat_ops


def simulate_sharded(circuit: ir.Circuit,
                     symbol_values: jnp.ndarray,
                     mesh,
                     init_bits: Optional[jnp.ndarray] = None,
                     axis_name: str = mesh_lib.STATE_AXIS) -> jnp.ndarray:
  """|psi> = U(values)|bits or 0>, returned as a [2^n] array sharded over the
  state axis.  Metrics / debugging entry point."""
  k = mesh_lib.num_global_qubits(mesh, axis_name)
  n = circuit.num_qubits
  if init_bits is None:
    init_bits = jnp.zeros([n], jnp.int8)

  def body(values, bits):
    local = basis_state_local(n, k, bits, axis_name)
    local = apply_circuit_local(circuit, values, local, k, axis_name)
    return local.reshape(-1)

  spec_r = P()
  fn = shard_map(body, mesh=mesh, in_specs=(spec_r, spec_r),
                 out_specs=P(axis_name))
  return fn(symbol_values, init_bits)


def batched_term_expectations(circuit: ir.Circuit,
                              values: jnp.ndarray,
                              init_bits: jnp.ndarray,
                              big_op: paulis.PauliSum,
                              mesh,
                              axis_name: str = mesh_lib.STATE_AXIS,
                              data_axis: Optional[str] = None) -> jnp.ndarray:
  """Per-term expectations [B, T] of `big_op` against U|b_i> for each row.

  Adjoint-differentiable w.r.t. `values`; per-term (coefficient-free) so
  coefficient gradients flow outside via plain autodiff.  The batch is
  processed with `lax.map` inside the shard_map body (states are sharded, so
  vmap cannot batch the collectives); if `data_axis` is given the batch is
  additionally split across that mesh axis (B must be divisible by its size).
  """
  return _bte(circuit, mesh, axis_name, data_axis, values, init_bits,
              big_op.coeffs, _HashableOp(big_op))


_HashableOp = paulis.HashableOp


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 7))
def _bte(circuit, mesh, axis_name, data_axis, values, init_bits, coeffs,
         hop: _HashableOp):
  out, _ = _bte_fwd(circuit, mesh, axis_name, data_axis, values, init_bits,
                    coeffs, hop)
  return out


def _bte_shard_specs(mesh, axis_name, data_axis):
  rep = P()
  bits_spec = P(data_axis) if data_axis else rep
  out_spec = P(data_axis) if data_axis else rep
  return rep, bits_spec, out_spec


def _bte_fwd(circuit, mesh, axis_name, data_axis, values, init_bits, coeffs,
             hop):
  k = mesh_lib.num_global_qubits(mesh, axis_name)
  op = hop.with_coeffs(jnp.ones_like(coeffs))

  def body(vals, bits_chunk):
    def one(bits):
      return _term_expectations_fwd_local(circuit, vals, bits, op, k,
                                          axis_name)
    return jax.lax.map(one, bits_chunk)

  rep, bits_spec, out_spec = _bte_shard_specs(mesh, axis_name, data_axis)
  fn = shard_map(body, mesh=mesh, in_specs=(rep, bits_spec),
                 out_specs=out_spec)
  out = fn(values, init_bits)
  return out, (values, init_bits, coeffs)


def _bte_bwd(circuit, mesh, axis_name, data_axis, hop, res, g):
  values, init_bits, coeffs = res
  k = mesh_lib.num_global_qubits(mesh, axis_name)
  op = hop.with_coeffs(jnp.ones_like(coeffs))

  def body(vals, bits_chunk, g_chunk):
    def one(args):
      bits, gg = args
      return _term_expectations_bwd_local(circuit, vals, bits, op, gg, k,
                                          axis_name)
    grads = jax.lax.map(one, (bits_chunk, g_chunk))  # [Bl, num_symbols]
    total = jnp.sum(grads, axis=0)
    if data_axis:
      total = jax.lax.psum(total, data_axis)
    return total

  rep, bits_spec, _ = _bte_shard_specs(mesh, axis_name, data_axis)
  fn = shard_map(body, mesh=mesh, in_specs=(rep, bits_spec, bits_spec),
                 out_specs=rep)
  values_bar = fn(values, init_bits, g)
  return values_bar, None, jnp.zeros_like(coeffs)


_bte.defvjp(_bte_fwd, _bte_bwd)


def batched_expectations(circuit: ir.Circuit,
                         symbol_values: jnp.ndarray,
                         init_bits: jnp.ndarray,
                         ops: Tuple[paulis.PauliSum, ...],
                         mesh,
                         axis_name: str = mesh_lib.STATE_AXIS,
                         data_axis: Optional[str] = None) -> jnp.ndarray:
  """Sharded equivalent of ops/adjoint.py batched_expectations: [B, len(ops)]
  expectations of each op against U|b> per bitstring, with adjoint gradients
  for `symbol_values` and autodiff gradients for op coefficients.

  If `data_axis` is set, the batch B is padded to a multiple of that mesh
  axis's size and split across it (data parallelism); results for padding
  rows are discarded.
  """
  n = circuit.num_qubits
  if mesh.shape[axis_name] == 1 and (data_axis is None or
                                     mesh.shape.get(data_axis, 1) == 1):
    # Degenerate mesh (single shard): the dense engine's fused-segment
    # adjoint path is strictly faster; semantics identical.
    from qhbmlib_tpu.ops import adjoint
    return adjoint.batched_expectations(circuit, symbol_values, init_bits,
                                        ops)
  big, slices = _concat_ops(ops, n)
  b = init_bits.shape[0]
  pad = 0
  if data_axis is not None:
    d = mesh.shape[data_axis]
    pad = (-b) % d
    if pad:
      init_bits = jnp.concatenate(
          [init_bits, jnp.zeros([pad, n], init_bits.dtype)], axis=0)
  terms = batched_term_expectations(circuit, symbol_values, init_bits, big,
                                    mesh, axis_name, data_axis)  # [B+pad, T]
  if pad:
    terms = terms[:b]
  weighted = terms * jnp.real(big.coeffs)[None, :]
  return jnp.stack([jnp.sum(weighted[:, a:b2], axis=1) for a, b2 in slices],
                   axis=1)
