"""Whole-circuit Pallas forward kernel: state resident in VMEM, MXU stages.

For n <= ~20 qubits the full statevector (8MB at n=20, split into float32
real/imag planes) fits in VMEM, so the ENTIRE circuit forward runs as ONE
kernel: HBM traffic collapses from one state read+write per gate segment
(the XLA path is HBM-bandwidth-bound at these sizes -- ~0.44 ms per 20q/4L
apply against an ~819 GB/s roofline) to a single state read + write.

v2 (round 2): every hot stage now runs on the MXU, mirroring the dense
engine's block-matmul math (ops/statevector.py) instead of the v1 kernel's
VPU loops:

  * 1q segments: per-qubit 2x2 matrices kron-fold OUTSIDE the kernel into
    <=7-bit row-block operators ([128,128] max) and one combined minor
    [C,C] matrix; the kernel applies each as split-complex MXU dots
    (reference: the XLA path's `_apply_1q_segment`).
  * diagonal segments: the total phase angle theta[R,C] = sum_k w_k *
    s_r_k(row) * s_c_k(col) is ONE [R,K]x[K,C] MXU matmul against +-1
    parity-sign matrices generated in-kernel from iota xor-folds, followed
    by a single cos/sin rotation -- replacing v1's K sequential VPU
    rotations (the measured reason v1 lost to XLA).

Supported gates (the hardware-efficient-ansatz set): 1-qubit dense gates
(XP/YP/HP/RX/RY) and the diagonal family (ZP/RZ/CZP/ZZP/GPHASE/all-Z PROT).
Unsupported circuits fall back to the fused XLA path transparently.

Layered circuits (identical static segment structure per layer) compile as
a `fori_loop` over layers with per-layer parameters indexed from stacked
inputs, keeping Mosaic program size independent of depth.

OPT-IN: the whole-circuit forward/adjoint kernels dispatch only under
QHBM_PALLAS=1 and the grid-over-batch kernels under QHBM_PALLAS_BATCHED=1
(see statevector.apply_circuit / adjoint._use_pallas_batched); the XLA
block-matmul engine remains the default production path (measured faster
at the full-train-step level, benchmarks/RESULTS.md).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:
  from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
  pltpu = None

from qhbmlib_tpu.ops import circuit_ir as ir
from qhbmlib_tpu.ops import statevector as sv

_SUPPORTED_1Q = frozenset({ir.XP, ir.YP, ir.HP, ir.RX, ir.RY})

# VMEM budget: state (2 planes) + working copies must fit comfortably.
_MAX_STATE_BYTES = 8 << 20


def supported(circuit: ir.Circuit) -> bool:
  if pltpu is None:
    return False
  n = circuit.num_qubits
  if n < 8 or 8 * 2**n > _MAX_STATE_BYTES:
    return False
  for cls, idxs in sv.segment_circuit(circuit.gates):
    if cls == "single":
      return False
    if cls == "1q":
      for i in idxs:
        if circuit.gates[i].kind not in _SUPPORTED_1Q:
          return False
  return True


def _prepare_segments(circuit: ir.Circuit, angles, shape_rc):
  """Builds static per-stage descriptors + traced input arrays.

  Returns (descs, inputs):
    descs: static tuple of (kind, meta) consumed by the kernel;
    inputs: flat list of arrays, one per desc (consumed positionally).

  Stage kinds:
    ("rowblock", (start, k))  input [2^k, 2^k] complex -> (re, im) pair
    ("minor_mm", None)        input [C, C] complex transposed -> (re, im)
    ("diag_mm", K)            input 3-tuple (weighted [1,K] float32
                              angles, rmask [1,K] int32, cmask [K,1] int32)
  """
  r, c = shape_rc
  n = circuit.num_qubits
  m = int(c).bit_length() - 1
  nr = n - m
  gates = circuit.gates
  descs = []
  inputs = []
  for cls, idxs in sv.segment_circuit(gates):
    seg_gates = [gates[i] for i in idxs]
    seg_angles = [angles[i] for i in idxs]
    if cls == "1q":
      by_qubit = {}
      for gate, angle in zip(seg_gates, seg_angles):
        by_qubit.setdefault(gate.qubits[0], []).append(
            sv.gate_matrix(gate.kind, angle))
      minor_combined = None
      major_by_qubit = {}
      hp = jax.lax.Precision.HIGHEST
      for q in sorted(by_qubit):
        mat = by_qubit[q][0]
        for nxt in by_qubit[q][1:]:
          # Operator folds run EXACT regardless of QHBM_MATMUL_PRECISION --
          # same hardening as the XLA path (statevector._apply_1q_segment):
          # bf16 rounding here biases the combined operator
          # deterministically, and the fold costs nothing.
          mat = jnp.matmul(nxt, mat, precision=hp)
        if q >= nr:
          emb = sv._embed_minor_mat(mat, (q - nr,), m)
          minor_combined = (emb if minor_combined is None
                            else jnp.matmul(emb, minor_combined,
                                            precision=hp))
        else:
          major_by_qubit[q] = mat
      for start, k in sv._row_blocks(nr):
        folded = sv._fold_block(major_by_qubit, start, k)
        if folded is not None:
          descs.append(("rowblock", (start, k)))
          inputs.append((jnp.real(folded).astype(jnp.float32),
                         jnp.imag(folded).astype(jnp.float32)))
      if minor_combined is not None:
        mt = minor_combined.T  # state @ M.T
        descs.append(("minor_mm", None))
        inputs.append((jnp.real(mt).astype(jnp.float32),
                       jnp.imag(mt).astype(jnp.float32)))
    else:  # diag
      coeffs, rms, cms, owner = sv.diag_segment_triples(seg_gates, nr, m)
      weighted = jnp.stack(
          [jnp.asarray(coeffs[k], jnp.float32) *
           jnp.asarray(seg_angles[owner[k]], jnp.float32)
           for k in range(len(coeffs))])
      rmask = jnp.asarray(np.asarray(rms, np.int32)[None, :])  # [1, K]
      cmask = jnp.asarray(np.asarray(cms, np.int32)[:, None])  # [K, 1]
      descs.append(("diag_mm", len(rms)))
      inputs.append((weighted[None, :], rmask, cmask))
  return tuple(descs), inputs


def _sign_matrix(idx: jnp.ndarray, mask_arr: jnp.ndarray) -> jnp.ndarray:
  """+-1 parity-sign matrix in ONE broadcast xor-fold pass.

  idx is a broadcasted iota ([R,1] rows or [1,C] cols); mask_arr is the
  matching-orientation int32 mask array ([1,K] or [K,1], a kernel input --
  Pallas kernels cannot capture constants)."""
  v = jnp.bitwise_and(idx, mask_arr)
  for shift in (16, 8, 4, 2, 1):
    v = jnp.bitwise_xor(v, v >> shift)
  par = jnp.bitwise_and(v, 1)
  return (1 - 2 * par).astype(jnp.float32)


def _dot(a, b):
  return jax.lax.dot(a, b, precision=matmul_precision_lax(),
                     preferred_element_type=jnp.float32)


def matmul_precision_lax():
  """Kernel dots honor the QHBM_MATMUL_PRECISION mode, clamped to what
  Mosaic lowers: DEFAULT (1-pass bf16) or HIGHEST (6-pass).  The XLA
  engine's 3-pass 'high' mode has no Mosaic equivalent and maps up to
  HIGHEST (conservative: more accurate, slower)."""
  p = sv.matmul_precision()
  if p in (None, jax.lax.Precision.DEFAULT):
    return jax.lax.Precision.DEFAULT
  return jax.lax.Precision.HIGHEST


def _apply_rowblock(x_re, x_im, m_re, m_im, start, k, r, c):
  """Split-complex contraction of a [2^k, 2^k] operator against row qubits
  [start, start+k) (kernel-side mirror of sv.apply_row_block)."""
  pre = 2**start
  nn = 2**k
  if pre == 1:
    vr = x_re.reshape(nn, -1)
    vi = x_im.reshape(nn, -1)
    y_re = _dot(m_re, vr) - _dot(m_im, vi)
    y_im = _dot(m_re, vi) + _dot(m_im, vr)
    return y_re.reshape(r, c), y_im.reshape(r, c)
  vr = x_re.reshape(pre, nn, -1)
  vi = x_im.reshape(pre, nn, -1)
  prog = "MN,aNb->aMb"
  p = matmul_precision_lax()
  y_re = (jnp.einsum(prog, m_re, vr, precision=p) -
          jnp.einsum(prog, m_im, vi, precision=p))
  y_im = (jnp.einsum(prog, m_re, vi, precision=p) +
          jnp.einsum(prog, m_im, vr, precision=p))
  return y_re.reshape(r, c), y_im.reshape(r, c)


def _apply_diag_mm(x_re, x_im, w_row, rmask, cmask, rows, cols):
  """theta = (S_r * w) @ S_c on the MXU, then one cos/sin rotation.

  S_r [R, K] / S_c [K, C] are +-1 parity-sign matrices generated in-kernel
  by one broadcast xor-fold pass each."""
  s_r = _sign_matrix(rows, rmask)
  s_c = _sign_matrix(cols, cmask)
  theta = _dot(s_r * w_row, s_c)  # [R, C]
  cth = jnp.cos(theta)
  sth = jnp.sin(theta)
  y_re = cth * x_re - sth * x_im
  y_im = cth * x_im + sth * x_re
  return y_re, y_im


def _make_kernel(descs, r, c, t_count):
  """Kernel body closed over static stage descriptors.

  With t_count > 1 every input carries a leading [T] axis and the stages run
  inside a fori_loop over layers."""

  def apply_period(t, x_re, x_im, in_refs, rows, cols):
    pos = 2
    for kind, meta in descs:
      if kind == "rowblock":
        start, k = meta
        m_re = in_refs[pos][t] if t is not None else in_refs[pos][:]
        m_im = in_refs[pos + 1][t] if t is not None else in_refs[pos + 1][:]
        pos += 2
        x_re, x_im = _apply_rowblock(x_re, x_im, m_re, m_im, start, k, r, c)
      elif kind == "minor_mm":
        mt_re = in_refs[pos][t] if t is not None else in_refs[pos][:]
        mt_im = in_refs[pos + 1][t] if t is not None else in_refs[pos + 1][:]
        pos += 2
        y_re = _dot(x_re, mt_re) - _dot(x_im, mt_im)
        y_im = _dot(x_re, mt_im) + _dot(x_im, mt_re)
        x_re, x_im = y_re, y_im
      else:  # diag_mm
        w_row = in_refs[pos][t] if t is not None else in_refs[pos][:]
        rmask = in_refs[pos + 1][t] if t is not None else in_refs[pos + 1][:]
        cmask = in_refs[pos + 2][t] if t is not None else in_refs[pos + 2][:]
        pos += 3
        x_re, x_im = _apply_diag_mm(x_re, x_im, w_row, rmask, cmask, rows,
                                    cols)
    return x_re, x_im

  def kernel(*refs):
    in_refs = refs[:-2]
    out_re, out_im = refs[-2], refs[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
    x_re = in_refs[0][:]
    x_im = in_refs[1][:]
    if t_count > 1:
      x_re, x_im = jax.lax.fori_loop(
          0, t_count,
          lambda t, carry: apply_period(t, carry[0], carry[1], in_refs, rows,
                                        cols),
          (x_re, x_im))
    else:
      x_re, x_im = apply_period(None, x_re, x_im, in_refs, rows, cols)
    out_re[:] = x_re
    out_im[:] = x_im

  return kernel


def _find_period(descs):
  """Longest repetition count T such that `descs` == period * T (statically).

  Parameterized circuits built from repeated layers (the hardware-efficient
  ansatz, Trotter steps) produce identical static segment descriptors per
  layer; the kernel then loops over layers instead of unrolling them, which
  divides Mosaic program size (and compile time) by T."""
  s = len(descs)
  for p in range(1, s + 1):
    if s % p:
      continue
    if all(descs[i] == descs[i % p] for i in range(s)):
      return p, s // p
  return s, 1


def _flatten_inputs(inputs, per_period: int, t_count: int):
  """Flattens per-desc input tuples, stacking across T period repeats."""
  flat = []
  if t_count == 1:
    for group in inputs:
      flat.extend(group)
    return flat
  for j in range(per_period):
    arity = len(inputs[j])
    for a in range(arity):
      flat.append(jnp.stack(
          [inputs[t * per_period + j][a] for t in range(t_count)]))
  return flat


# ---------------------------------------------------------------------------
# Natively BATCHED whole-circuit kernel (grid over the state batch)
# ---------------------------------------------------------------------------
#
# The per-state kernel above loses at the train-step level when vmapped over
# the unique-bitstring batch: vmap-of-pallas_call lowers to a SERIAL chain of
# independent kernels, each re-fetching the shared gate operators and
# re-computing the diagonal segments' sign matmuls + cos/sin rotations
# (measured: the in-VMEM residual over the HBM roofline is exactly that VPU
# work -- benchmarks/RESULTS.md).  This kernel instead makes the batch the
# Pallas GRID: one kernel invocation, grid=(B,), one basis state initialized,
# evolved and written back per grid step, while
#
#   * the folded row-block/minor operators AND the diagonal segments'
#     rotation planes (cos/sin of the total phase angle, computed ONCE by
#     XLA outside the kernel via sv.diag_segment_phase) ride along as
#     constant-index inputs -- fetched into VMEM once and shared by all B
#     states;
#   * initial BASIS states are built in-kernel from (row, col) indices (one
#     iota compare), so the batch's input traffic is B*8 bytes instead of
#     B*2^n*8;
#   * Mosaic's grid pipeline double-buffers the per-state output writes
#     against the next step's compute.
#
# Per-state work drops to the irreducible MXU contractions plus 4 elementwise
# multiply-adds per diagonal segment.

def rot_plane_dtype():
  """Rotation planes are stored bf16 under the 1-pass 'default' MXU
  precision mode (the plane product is elementwise VPU work upcast to f32;
  bf16 storage halves their VMEM residency, which is what lets the 20q/4L
  headline shape fit -- the kernel family's register spill slots alone run
  ~84MB at 20q).  Under 'high'/'highest' the planes stay f32 and the VMEM
  gate admits fewer (smaller) shapes."""
  p = sv.matmul_precision()
  if p in (None, jax.lax.Precision.DEFAULT):
    return jnp.bfloat16
  return jnp.float32


def _prepare_segments_rot(circuit: ir.Circuit, angles, shape_rc):
  """Like _prepare_segments, but diagonal segments are emitted as
  PRECOMPUTED rotation planes ("diag_rot": cos/sin of the total segment
  phase, [R, C] each) instead of in-kernel sign matmuls.  The planes are
  batch-invariant: XLA computes them once per call."""
  r, c = shape_rc
  gates = circuit.gates
  descs = []
  inputs = []
  for cls, idxs in sv.segment_circuit(gates):
    seg_gates = [gates[i] for i in idxs]
    seg_angles = [angles[i] for i in idxs]
    if cls == "1q":
      sub_descs, sub_inputs = _prepare_segments(
          ir.Circuit(circuit.num_qubits, tuple(seg_gates),
                     circuit.symbol_names), seg_angles, shape_rc)
      descs.extend(sub_descs)
      inputs.extend(sub_inputs)
    else:
      theta = sv.diag_segment_phase(seg_gates, seg_angles, shape_rc)
      dt = rot_plane_dtype()
      descs.append(("diag_rot", None))
      inputs.append((jnp.cos(theta).astype(dt), jnp.sin(theta).astype(dt)))
  return tuple(descs), inputs


def _make_batched_kernel(descs, r, c, t_count):
  """Grid-over-batch kernel body: refs = [rowcol] + inputs + (out_re, out_im).

  rowcol is an SMEM [B, 2] int32 array of (row, col) basis indices; the
  output blocks are [1, R, C] slices at grid position b."""

  def apply_period(t, x_re, x_im, in_refs):
    def rd(ref):
      return ref[t] if t is not None else ref[:]

    pos = 1  # refs[0] is rowcol
    for kind, meta in descs:
      if kind == "rowblock":
        start, k = meta
        m_re, m_im = rd(in_refs[pos]), rd(in_refs[pos + 1])
        pos += 2
        x_re, x_im = _apply_rowblock(x_re, x_im, m_re, m_im, start, k, r, c)
      elif kind == "minor_mm":
        mt_re, mt_im = rd(in_refs[pos]), rd(in_refs[pos + 1])
        pos += 2
        y_re = _dot(x_re, mt_re) - _dot(x_im, mt_im)
        y_im = _dot(x_re, mt_im) + _dot(x_im, mt_re)
        x_re, x_im = y_re, y_im
      else:  # diag_rot
        cth = rd(in_refs[pos]).astype(jnp.float32)
        sth = rd(in_refs[pos + 1]).astype(jnp.float32)
        pos += 2
        y_re = cth * x_re - sth * x_im
        y_im = cth * x_im + sth * x_re
        x_re, x_im = y_re, y_im
    return x_re, x_im

  def kernel(*refs):
    in_refs = refs[:-2]
    out_re, out_im = refs[-2], refs[-1]
    b = pl.program_id(0)
    row = in_refs[0][b, 0]
    col = in_refs[0][b, 1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
    x_re = jnp.where((rows == row) & (cols == col), 1.0, 0.0).astype(
        jnp.float32)
    x_im = jnp.zeros((r, c), jnp.float32)
    if t_count > 1:
      x_re, x_im = jax.lax.fori_loop(
          0, t_count,
          lambda t, carry: apply_period(t, carry[0], carry[1], in_refs),
          (x_re, x_im))
    else:
      x_re, x_im = apply_period(None, x_re, x_im, in_refs)
    out_re[0] = x_re
    out_im[0] = x_im

  return kernel


# Default scoped VMEM cap passed to every pallas_call in this kernel family.
_DEFAULT_VMEM_LIMIT = 114 << 20


def _vmem_budget_bytes() -> int:
  return int(os.environ.get("QHBM_PALLAS_VMEM_LIMIT", _DEFAULT_VMEM_LIMIT))


# Physical VMEM on v5e/v5p-class chips; Mosaic reports OOM against this.
_PHYS_VMEM_BYTES = 128 << 20


def _rot_plane_bytes(circuit: ir.Circuit) -> int:
  n_diag = sum(1 for cls, _ in sv.segment_circuit(circuit.gates)
               if cls == "diag")
  per_el = 2 if rot_plane_dtype() == jnp.bfloat16 else 4
  return 2 * n_diag * per_el * 2**circuit.num_qubits


def batched_supported(circuit: ir.Circuit) -> bool:
  """Gate support + a VMEM budget check.

  Measured at 20q/4L (Mosaic OOM report): the kernel family's register
  spill slots run ~21 f32 planes, plus 4 planes of double-buffered output
  windows; the resident rotation planes come on top.  131.56M > 128M with
  f32 planes, fits with bf16 -- hence the precision-gated plane dtype."""
  if not supported(circuit):
    return False
  plane = 4 * 2**circuit.num_qubits  # one f32 [R, C] plane
  # The 25-plane estimate is calibrated against the PHYSICAL OOM boundary
  # (the kernel compiles fine under the default scoped cap at the flagship
  # 20q/4L shape -- spill slots are not all charged to the scoped limit).
  # A user-tightened QHBM_PALLAS_VMEM_LIMIT shifts the admission boundary
  # by the same delta, so admission can never say yes to a shape the
  # tighter compile cap will reject (which would turn the transparent XLA
  # fallback into a Mosaic compile crash).
  boundary = _PHYS_VMEM_BYTES + min(0, _vmem_budget_bytes()
                                    - _DEFAULT_VMEM_LIMIT)
  return 25 * plane + _rot_plane_bytes(circuit) <= boundary


def apply_circuit_pallas_batched(circuit: ir.Circuit,
                                 symbol_values: jnp.ndarray,
                                 init_rowcol: jnp.ndarray,
                                 interpret: bool = False) -> jnp.ndarray:
  """Evolves B basis states through the circuit in ONE grid-over-batch
  kernel.

  Args:
    circuit: supported circuit IR (see batched_supported).
    symbol_values: [num_symbols] shared parameters.
    init_rowcol: [B, 2] int32 (row, col) indices of the initial basis
      states in the [R, C] state layout (sv.basis_state's coordinates).
    interpret: run in the Pallas interpreter (tests).

  Returns:
    [B, R, C] complex64 final states.
  """
  n = circuit.num_qubits
  r, c = sv.state_shape(n)
  b = init_rowcol.shape[0]
  angles = [sv.resolve_angle(gate, symbol_values) for gate in circuit.gates]
  descs, inputs = _prepare_segments_rot(circuit, angles, (r, c))
  per_period, t_count = _find_period(descs)
  inputs = _flatten_inputs(inputs, per_period, t_count)
  kernel = _make_batched_kernel(descs[:per_period], r, c, t_count)

  all_inputs = [init_rowcol.astype(jnp.int32)] + inputs
  out_shape = (jax.ShapeDtypeStruct((b, r, c), jnp.float32),
               jax.ShapeDtypeStruct((b, r, c), jnp.float32))
  state_spec_kw = {} if interpret else {"memory_space": pltpu.VMEM}
  if interpret:
    specs = [pl.BlockSpec() for _ in all_inputs]
  else:
    specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)] +
             [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in inputs])
  out_specs = tuple(
      pl.BlockSpec((1, r, c), lambda i: (i, 0, 0), **state_spec_kw)
      for _ in range(2))
  kwargs = {}
  if not interpret and pltpu is not None:
    kwargs["compiler_params"] = pltpu.CompilerParams(
        vmem_limit_bytes=_vmem_budget_bytes())
  o_re, o_im = pl.pallas_call(
      kernel,
      grid=(b,),
      out_shape=out_shape,
      in_specs=specs,
      out_specs=out_specs,
      interpret=interpret,
      **kwargs,
  )(*all_inputs)
  return (o_re + 1j * o_im).astype(sv.COMPLEX_DTYPE)


# ---------------------------------------------------------------------------
# Tiled fused 1q-segment kernel for BIG states (state does not fit VMEM)
# ---------------------------------------------------------------------------
#
# At n >= ~21 qubits the XLA path applies a 1q segment as 3-4 separate
# state-sized matmul passes (one per <=7-bit row block + one minor [C,C]
# matmul), each a full HBM read+write of the state -- the dominant cost of
# both the forward sweep and the adjoint un-applies at 24+ qubits.  This
# kernel fuses the first TWO row blocks and the minor matmul into ONE pass:
# the state viewed as [2^k1, 2^k2, rest] streams through VMEM in
# [2^k1, 2^k2, C]-shaped tiles (16MB max), and each tile applies
#
#   axis-0 contraction (block 1, [2^k1, 2^k1] folded operator, 2D MXU dot),
#   axis-1 contraction (block 2, batched MXU dot),
#   last-axis right-dot (the combined minor operator),
#
# before streaming back.  Row bits beyond k1+k2 (only n > 21) still take
# the standard block matmul afterwards: 2 HBM passes per segment vs 4.
#
# RETIRED (re-measured on v5e, 2026-08-19).  The earlier "WASH" numbers
# (plain 19.67 vs fused 19.43 ms at 24q/4L bf16) came from a measuring
# script with a trace-time flag bug and were plain-vs-plain.  With the
# fixed script the fused variant does not even COMPILE at production block
# sizes: the minimum window tile is [2^k1, 2^k2, c] = [128, 128, 128] = 8MB
# (both row blocks are contracted, only the trailing axis streams), and
# Mosaic's resident footprint -- four double-buffered in/out windows plus
# the in-kernel stage temporaries and relayout copies -- measured
# "Used 168.04M of 128.00M vmem" (XLA:TPU compile permanent error).
# statevector.apply_majors_and_minor now carries a matching ~21x-tile VMEM
# admission (fused_1q_fits below; boundary = 13 fused row bits at c=128)
# and falls back to the plain block matmuls above it, so QHBM_FUSED_1Q=1
# is inert at big-state shapes by construction.
# At 16q/4L -- a shape that DOES fit -- the fixed A/B ran on hardware and
# the fused kernel LOSES 12% (plain 2.355 ms vs fused 2.628 ms, min over
# 3), consistent with the segment_probe.py evidence (hand-tiled Pallas
# streaming loses 25% to XLA elementwise): XLA is not HBM-pass-bound
# here.  Kept for small-block shapes and as a measured negative result;
# do not wire as a production path.

def _fused_1q_kernel(k1, k2, c, stages):
  n1, n2 = 2**k1, 2**k2

  def kernel(*refs):
    x_re_ref, x_im_ref = refs[0], refs[1]
    o_re_ref, o_im_ref = refs[-2], refs[-1]
    mats = refs[2:-2]
    x_re = x_re_ref[:]
    x_im = x_im_ref[:]
    p = matmul_precision_lax()
    pos = 0
    for stage in stages:
      m_re = mats[pos][:]
      m_im = mats[pos + 1][:]
      pos += 2
      if stage == "b1":
        fr = x_re.reshape(n1, -1)
        fi = x_im.reshape(n1, -1)
        y_re = _dot(m_re, fr) - _dot(m_im, fi)
        y_im = _dot(m_re, fi) + _dot(m_im, fr)
        x_re = y_re.reshape(n1, n2, c)
        x_im = y_im.reshape(n1, n2, c)
      elif stage == "b2":
        prog = "MN,aNc->aMc"
        y_re = (jnp.einsum(prog, m_re, x_re, precision=p) -
                jnp.einsum(prog, m_im, x_im, precision=p))
        y_im = (jnp.einsum(prog, m_re, x_im, precision=p) +
                jnp.einsum(prog, m_im, x_re, precision=p))
        x_re, x_im = y_re, y_im
      else:  # minor (pre-transposed right operator)
        fr = x_re.reshape(-1, c)
        fi = x_im.reshape(-1, c)
        y_re = _dot(fr, m_re) - _dot(fi, m_im)
        y_im = _dot(fr, m_im) + _dot(fi, m_re)
        x_re = y_re.reshape(n1, n2, c)
        x_im = y_im.reshape(n1, n2, c)
    o_re_ref[:] = x_re
    o_im_ref[:] = x_im

  return kernel


def fused_1q_fits(k1: int, k2: int, c: int) -> bool:
  """VMEM admission for fused_blocks_minor_apply (kept next to the kernel
  whose allocation behavior it models, so a kernel change updates both).

  Measured on v5e (2026-08-19): resident footprint is ~21x the window
  tile — four double-buffered in/out windows (2 buffering levels each)
  plus the in-kernel stage temporaries and reshape/einsum relayout
  copies.  At k1=k2=7, c=128 (tile 8MB) the compile CRASHES with "Used
  168.04M of 128.00M vmem", so the 21x multiplier is calibrated to that
  point.  The formula boundary is 21*tile <= 128M, i.e. up to 13 fused
  row bits at c=128 (21*4MiB = 84MiB); the 13-bit shape itself is
  hardware-verified (see docs/design.md §7 fused-1q admission note).
  Like batched_supported, a user-tightened QHBM_PALLAS_VMEM_LIMIT shifts
  the boundary down by the same delta so admission never accepts a shape
  the tighter scoped compile cap would reject."""
  tile_bytes = (2**(k1 + k2)) * c * 4
  boundary = _PHYS_VMEM_BYTES + min(0, _vmem_budget_bytes()
                                    - _DEFAULT_VMEM_LIMIT)
  return 21 * tile_bytes <= boundary


def fused_blocks_minor_apply(state: jnp.ndarray,
                             k1: int,
                             k2: int,
                             m1,
                             m2,
                             minor_mat_t,
                             interpret: bool = False) -> jnp.ndarray:
  """Applies (block1 on bits [0,k1)) x (block2 on bits [k1,k1+k2)) x
  (minor operator, PRE-TRANSPOSED) to `state` in ONE streamed pass.

  Any of m1/m2/minor_mat_t may be None (stage skipped; the stage set is
  specialized statically into the kernel)."""
  r, c = state.shape
  n1, n2 = 2**k1, 2**k2
  rest = (r // (n1 * n2)) * c
  grid = max(1, rest // c)

  stages = []
  mat_inputs = []
  for name, mat in (("b1", m1), ("b2", m2), ("minor", minor_mat_t)):
    if mat is not None:
      stages.append(name)
      mat_inputs.append(jnp.real(mat).astype(jnp.float32))
      mat_inputs.append(jnp.imag(mat).astype(jnp.float32))
  x_re = jnp.real(state).astype(jnp.float32).reshape(n1, n2, rest)
  x_im = jnp.imag(state).astype(jnp.float32).reshape(n1, n2, rest)

  tile = (n1, n2, c)
  kw = {} if interpret else {"memory_space": pltpu.VMEM}
  sspec = pl.BlockSpec(tile, lambda j: (0, 0, j), **kw)
  mat_specs = [pl.BlockSpec(a.shape, lambda j: (0, 0), **kw)
               for a in mat_inputs]
  kernel = _fused_1q_kernel(k1, k2, c, tuple(stages))
  out_shape = (jax.ShapeDtypeStruct((n1, n2, rest), jnp.float32),
               jax.ShapeDtypeStruct((n1, n2, rest), jnp.float32))
  kwargs = {}
  if not interpret and pltpu is not None:
    kwargs["compiler_params"] = pltpu.CompilerParams(
        vmem_limit_bytes=_vmem_budget_bytes())
    kwargs["input_output_aliases"] = {0: 0, 1: 1}
  o_re, o_im = pl.pallas_call(
      kernel,
      grid=(grid,),
      out_shape=out_shape,
      in_specs=[sspec, sspec] + mat_specs,
      out_specs=(sspec, sspec),
      interpret=interpret,
      **kwargs,
  )(x_re, x_im, *mat_inputs)
  return (o_re + 1j * o_im).astype(sv.COMPLEX_DTYPE).reshape(r, c)


def apply_circuit_pallas(circuit: ir.Circuit,
                         symbol_values: jnp.ndarray,
                         state: jnp.ndarray,
                         interpret: bool = False) -> jnp.ndarray:
  """One-kernel forward application of a supported circuit."""
  r, c = state.shape
  n = circuit.num_qubits
  angles = [sv.resolve_angle(gate, symbol_values) for gate in circuit.gates]
  descs, inputs = _prepare_segments(circuit, angles, (r, c))
  per_period, t_count = _find_period(descs)
  inputs = _flatten_inputs(inputs, per_period, t_count)
  kernel = _make_kernel(descs[:per_period], r, c, t_count)

  x_re = jnp.real(state).astype(jnp.float32)
  x_im = jnp.imag(state).astype(jnp.float32)
  all_inputs = [x_re, x_im] + inputs
  out_shape = (jax.ShapeDtypeStruct((r, c), jnp.float32),
               jax.ShapeDtypeStruct((r, c), jnp.float32))
  if interpret:
    specs = [pl.BlockSpec() for _ in all_inputs]
    out_specs = tuple(pl.BlockSpec() for _ in range(2))
  else:
    specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in all_inputs]
    out_specs = tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                      for _ in range(2))
  kwargs = {}
  if not interpret and pltpu is not None:
    # Mosaic's default scoped-VMEM cap (16MB) is far below the physical
    # VMEM on v5e+ (~128MB); the whole-circuit kernel needs state planes +
    # working copies resident, so raise the cap explicitly.
    kwargs["compiler_params"] = pltpu.CompilerParams(
        vmem_limit_bytes=_vmem_budget_bytes())
    # The output planes reuse the input state planes' VMEM (saves 2 plane
    # allocations and the copy-out).
    kwargs["input_output_aliases"] = {0: 0, 1: 1}
  o_re, o_im = pl.pallas_call(
      kernel,
      out_shape=out_shape,
      in_specs=specs,
      out_specs=out_specs,
      interpret=interpret,
      **kwargs,
  )(*all_inputs)
  return (o_re + 1j * o_im).astype(sv.COMPLEX_DTYPE)
