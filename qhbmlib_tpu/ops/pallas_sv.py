"""Experimental Pallas forward kernel: whole circuit, state resident in VMEM.

For n <= ~20 qubits the full statevector (8MB at n=20, split into float32
real/imag planes) fits in VMEM, so the ENTIRE circuit forward can run as ONE
kernel: HBM traffic collapses from one round trip per gate segment to a
single state read + write.  Supported gates (the hardware-efficient-ansatz
set): 1-qubit dense gates (XP/YP/HP/RX/RY) and the diagonal family
(ZP/RZ/CZP/ZZP/GPHASE/all-Z PROT).  Unsupported circuits fall back to the
fused JAX path transparently.

Structure: gate matrices and diagonal parity coefficients are computed
OUTSIDE the kernel (tiny traced arithmetic) and passed in as small arrays;
the kernel applies, per segment,

  * minor-qubit products as one [R,C]x[C,C] split-complex MXU matmul,
  * major-qubit 2x2 gates via a row reshape exposing the qubit bit,
  * diagonal parity factors as elementwise split-complex phase stages whose
    +-1 sign planes come from in-kernel iota xor-parity folds (no [R,C]
    angle buffer is materialized).

STATUS: EXPERIMENTAL, not wired into any production path.  The kernel's
logic validates exactly against the dense engine when run as plain JAX
(2e-6 at 12 qubits / 2 layers) and it compiles and runs on TPU v5e in ~4s.
On TPU, pallas-vs-dense differences of ~1e-3 turned out to be MUTUAL
rounding: measured against CPU f32 ground truth the pallas kernel deviates
LESS (1.1e-2) than the dense engine (1.4e-2) at an adversarial tiny-angle
configuration -- both dominated by a platform-level f32 precision effect
still under investigation (Precision.HIGHEST matmuls did not remove it).
The Pallas interpreter hangs on multi-segment kernels, so interpret-mode
tests cover the single-layer case only.  Next steps: wire into the forward
path for n <= 20 and extend the same VMEM-resident structure to the adjoint
backward sweep.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

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

# VMEM budget: state (2 planes) + one working copy must fit comfortably.
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
  """Builds the static per-segment descriptors + traced input arrays.

  Returns (descs, inputs): descs is a static tuple describing each segment;
  inputs is a flat list of arrays consumed positionally by the kernel.
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
      major_qubits = []
      minor_combined = None
      major_mats = []
      for q in sorted(by_qubit):
        mat = by_qubit[q][0]
        for nxt in by_qubit[q][1:]:
          mat = nxt @ mat
        if q >= nr:
          emb = sv._embed_minor_mat(mat, (q - nr,), m)
          minor_combined = (emb if minor_combined is None
                            else emb @ minor_combined)
        else:
          major_qubits.append(q)
          major_mats.append(mat)
      if major_mats:
        stack = jnp.stack(major_mats).reshape(len(major_mats), 4)  # [G, 4]
        inputs.append(("smem", jnp.real(stack).astype(jnp.float32)))
        inputs.append(("smem", jnp.imag(stack).astype(jnp.float32)))
        descs.append(("major1q", tuple(major_qubits)))
      if minor_combined is not None:
        mt = minor_combined.T  # state @ M.T
        inputs.append(("vmem", jnp.real(mt).astype(jnp.float32)))
        inputs.append(("vmem", jnp.imag(mt).astype(jnp.float32)))
        descs.append(("minor_mm", None))
    else:  # diag
      coeffs, rms, cms, owner = sv.diag_segment_triples(seg_gates, nr, m)
      weighted = jnp.stack(
          [jnp.asarray(coeffs[k], jnp.float32) *
           jnp.asarray(seg_angles[owner[k]], jnp.float32)
           for k in range(len(coeffs))])
      inputs.append(("smem", jnp.cos(weighted)[:, None]))
      inputs.append(("smem", jnp.sin(weighted)[:, None]))
      descs.append(("diag", (tuple(rms), tuple(cms))))
  return tuple(descs), inputs


def _xor_parity_sign(idx: jnp.ndarray, mask: int) -> jnp.ndarray:
  """(-1)^popcount(idx & mask) as float32, via xor-folding (no popcount)."""
  if mask == 0:
    return jnp.ones(idx.shape, jnp.float32)
  v = jnp.bitwise_and(idx, jnp.int32(mask))
  for shift in (16, 8, 4, 2, 1):
    v = jnp.bitwise_xor(v, v >> shift)
  par = jnp.bitwise_and(v, 1)
  return (1 - 2 * par).astype(jnp.float32)


def _make_kernel(descs, r, c, nr, m):
  """Returns the kernel body closed over the static segment descriptors."""

  def kernel(*refs):
    in_refs = refs[:-2]
    out_re, out_im = refs[-2], refs[-1]
    x_re = in_refs[0][:]
    x_im = in_refs[1][:]
    pos = 2
    rows = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)

    for kind, meta in descs:
      if kind == "major1q":
        mats_re = in_refs[pos]
        mats_im = in_refs[pos + 1]
        pos += 2
        for g, q in enumerate(meta):
          a = 2**q
          vr = x_re.reshape(a, 2, -1)
          vi = x_im.reshape(a, 2, -1)
          v0r, v1r = vr[:, 0, :], vr[:, 1, :]
          v0i, v1i = vi[:, 0, :], vi[:, 1, :]
          m00r, m01r = mats_re[g, 0], mats_re[g, 1]
          m10r, m11r = mats_re[g, 2], mats_re[g, 3]
          m00i, m01i = mats_im[g, 0], mats_im[g, 1]
          m10i, m11i = mats_im[g, 2], mats_im[g, 3]
          n0r = m00r * v0r - m00i * v0i + m01r * v1r - m01i * v1i
          n0i = m00r * v0i + m00i * v0r + m01r * v1i + m01i * v1r
          n1r = m10r * v0r - m10i * v0i + m11r * v1r - m11i * v1i
          n1i = m10r * v0i + m10i * v0r + m11r * v1i + m11i * v1r
          x_re = jnp.stack([n0r, n1r], axis=1).reshape(r, c)
          x_im = jnp.stack([n0i, n1i], axis=1).reshape(r, c)
      elif kind == "minor_mm":
        mt_re = in_refs[pos][:]
        mt_im = in_refs[pos + 1][:]
        pos += 2
        dot = lambda a, b: jax.lax.dot(a, b,
                                       precision=jax.lax.Precision.HIGHEST,
                                       preferred_element_type=jnp.float32)
        y_re = dot(x_re, mt_re) - dot(x_im, mt_im)
        y_im = dot(x_re, mt_im) + dot(x_im, mt_re)
        x_re, x_im = y_re, y_im
      else:  # diag
        cos_k = in_refs[pos]
        sin_k = in_refs[pos + 1]
        pos += 2
        rms, cms = meta
        for k in range(len(rms)):
          # phase factor exp(i * w_k * s) with s = sign_r * sign_c in {+-1}:
          # cos(w) + i * s * sin(w).
          s = _xor_parity_sign(rows, rms[k]) * _xor_parity_sign(cols, cms[k])
          ck = cos_k[k, 0]
          sk = sin_k[k, 0] * s
          y_re = ck * x_re - sk * x_im
          y_im = ck * x_im + sk * x_re
          x_re, x_im = y_re, y_im

    out_re[:] = x_re
    out_im[:] = x_im

  return kernel


def _find_period(descs):
  """Longest repetition count T such that `descs` == period * T (statically).

  Parameterized circuits built from repeated layers (the hardware-efficient
  ansatz, Trotter steps) produce identical static segment descriptors per
  layer; the kernel then loops over layers instead of unrolling them, which
  divides Mosaic program size (and compile time) by T.
  """
  s = len(descs)
  for p in range(1, s + 1):
    if s % p:
      continue
    if all(descs[i] == descs[i % p] for i in range(s)):
      return p, s // p
  return s, 1


def _stack_inputs(inputs, per_period: int, t_count: int):
  """Stacks the flat per-segment input list across T period repeats.

  `inputs` is [(tag, array), ...] with `per_period` entries per repeat; the
  result has `per_period` entries, each [T, ...]."""
  stacked = []
  for j in range(per_period):
    tag = inputs[j][0]
    arrs = [inputs[t * per_period + j][1] for t in range(t_count)]
    stacked.append((tag, jnp.stack(arrs)))
  return stacked


def _make_layered_kernel(period_descs, t_count, r, c, nr, m):
  """Kernel looping over T repeats of a static period of segments.

  Same math as `_make_kernel`, but inputs carry a leading [T] axis indexed
  by the loop counter, so the compiled program size is independent of the
  number of layers."""

  def kernel(*refs):
    in_refs = refs[:-2]
    out_re, out_im = refs[-2], refs[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)

    def body(t, carry):
      x_re, x_im = carry
      pos = 2
      for kind, meta in period_descs:
        if kind == "major1q":
          mats_re = in_refs[pos]
          mats_im = in_refs[pos + 1]
          pos += 2
          for g, q in enumerate(meta):
            a = 2**q
            vr = x_re.reshape(a, 2, -1)
            vi = x_im.reshape(a, 2, -1)
            v0r, v1r = vr[:, 0, :], vr[:, 1, :]
            v0i, v1i = vi[:, 0, :], vi[:, 1, :]
            m00r, m01r = mats_re[t, g, 0], mats_re[t, g, 1]
            m10r, m11r = mats_re[t, g, 2], mats_re[t, g, 3]
            m00i, m01i = mats_im[t, g, 0], mats_im[t, g, 1]
            m10i, m11i = mats_im[t, g, 2], mats_im[t, g, 3]
            n0r = m00r * v0r - m00i * v0i + m01r * v1r - m01i * v1i
            n0i = m00r * v0i + m00i * v0r + m01r * v1i + m01i * v1r
            n1r = m10r * v0r - m10i * v0i + m11r * v1r - m11i * v1i
            n1i = m10r * v0i + m10i * v0r + m11r * v1i + m11i * v1r
            x_re = jnp.stack([n0r, n1r], axis=1).reshape(r, c)
            x_im = jnp.stack([n0i, n1i], axis=1).reshape(r, c)
        elif kind == "minor_mm":
          mt_re = in_refs[pos][t]
          mt_im = in_refs[pos + 1][t]
          pos += 2
          dot = lambda a, b: jax.lax.dot(a, b,
                                         precision=jax.lax.Precision.HIGHEST,
                                         preferred_element_type=jnp.float32)
          y_re = dot(x_re, mt_re) - dot(x_im, mt_im)
          y_im = dot(x_re, mt_im) + dot(x_im, mt_re)
          x_re, x_im = y_re, y_im
        else:  # diag
          cos_k = in_refs[pos]
          sin_k = in_refs[pos + 1]
          pos += 2
          rms, cms = meta
          for k in range(len(rms)):
            s = _xor_parity_sign(rows, rms[k]) * _xor_parity_sign(cols, cms[k])
            ck = cos_k[t, k, 0]
            sk = sin_k[t, k, 0] * s
            y_re = ck * x_re - sk * x_im
            y_im = ck * x_im + sk * x_re
            x_re, x_im = y_re, y_im
      return x_re, x_im

    x_re, x_im = jax.lax.fori_loop(
        0, t_count, body, (in_refs[0][:], in_refs[1][:]))
    out_re[:] = x_re
    out_im[:] = x_im

  return kernel


def apply_circuit_pallas(circuit: ir.Circuit,
                         symbol_values: jnp.ndarray,
                         state: jnp.ndarray,
                         interpret: bool = False) -> jnp.ndarray:
  """One-kernel forward application of a supported circuit."""
  r, c = state.shape
  n = circuit.num_qubits
  m = int(c).bit_length() - 1
  nr = n - m
  angles = [sv.resolve_angle(gate, symbol_values) for gate in circuit.gates]
  descs, inputs = _prepare_segments(circuit, angles, (r, c))
  per_period, t_count = _find_period(descs)
  if t_count > 1:
    # Inputs per segment: every desc consumes exactly two input arrays.
    inputs = _stack_inputs(inputs, 2 * per_period, t_count)
    descs = descs[:per_period]
    kernel = _make_layered_kernel(descs, t_count, r, c, nr, m)
  else:
    kernel = _make_kernel(descs, r, c, nr, m)

  x_re = jnp.real(state).astype(jnp.float32)
  x_im = jnp.imag(state).astype(jnp.float32)
  tagged = [("vmem", x_re), ("vmem", x_im)] + inputs
  all_inputs = [arr for _, arr in tagged]
  out_shape = (jax.ShapeDtypeStruct((r, c), jnp.float32),
               jax.ShapeDtypeStruct((r, c), jnp.float32))
  if interpret:
    specs = [pl.BlockSpec() for _ in tagged]
    out_specs = tuple(pl.BlockSpec() for _ in range(2))
  else:
    # Small parameter arrays live in SMEM: scalar reads must come from
    # scalar memory on TPU.
    specs = [pl.BlockSpec(
        memory_space=pltpu.SMEM if tag == "smem" else pltpu.VMEM)
        for tag, _ in tagged]
    out_specs = tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                      for _ in range(2))
  kwargs = {}
  if not interpret and pltpu is not None:
    # Mosaic's default scoped-VMEM cap (16MB) is far below the physical
    # VMEM on v5e+; the whole-circuit kernel needs state planes + working
    # copies resident, so raise the cap explicitly.
    kwargs["compiler_params"] = pltpu.CompilerParams(
        vmem_limit_bytes=int(
            os.environ.get("QHBM_PALLAS_VMEM_LIMIT", 100 << 20)))
  o_re, o_im = pl.pallas_call(
      kernel,
      out_shape=out_shape,
      in_specs=specs,
      out_specs=out_specs,
      interpret=interpret,
      **kwargs,
  )(*all_inputs)
  return (o_re + 1j * o_im).astype(sv.COMPLEX_DTYPE)
