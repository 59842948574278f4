"""Pallas adjoint reverse sweep: the backward pass in ONE VMEM-resident kernel.

The adjoint backward (ops/adjoint.py `_bwd`) is the training step's hot
loop: per segment it re-reads and re-writes BOTH state buffers (a, lam)
from HBM, plus a state-sized contraction for the gradient reductions --
~3x the forward's HBM traffic, all bandwidth-bound.  This kernel keeps the
four float32 state planes (a_re, a_im, l_re, l_im; 16MB at 20 qubits)
resident in VMEM for the ENTIRE reverse sweep: HBM touches collapse to one
read of (psi, lam) plus a handful of small reduction outputs.

Division of labor (keeps the kernel to dots + elementwise only):

  kernel  -- per reversed segment, in this order:
             (1) emit gradient reductions from the CURRENT (a, lam):
                 1q segments: row-block transition matrices G[N,N] and the
                 minor cross matrix kmat[C,C] (split-complex MXU dots);
                 diag segments: per-parity-factor bilinears s_r^T P s_c
                 with P = Im(conj(lam) * a), as one [R,K] matmul + one
                 [1,R]x[R,K] column-sum dot;
             (2) un-apply the segment to both states (inverse row-block /
                 minor matmuls, or the negated-phase parity-matmul
                 rotation with cos/sin shared between the two states).
  outside -- the tiny per-gate algebra on those reductions (2x2 partial
             traces, suffix-conjugated dU contractions, coefficient
             groupings), identical to ops/adjoint.py's segment math.

Gate support matches ops/pallas_sv.py (the hardware-efficient-ansatz set);
layered circuits loop via fori_loop with per-layer inputs/outputs stacked
on a leading [T] axis.  Cited reference behavior: this implements the same
adjoint gradient TFQ's C++ engine provides behind tfq.layers.Expectation
(reference qhbmlib/inference/qnn.py:112,134-138).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:
  from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
  pltpu = None

from qhbmlib_tpu.ops import circuit_ir as ir
from qhbmlib_tpu.ops import pallas_sv
from qhbmlib_tpu.ops import statevector as sv

def supported(circuit: ir.Circuit) -> bool:
  """Same admission bound as the forward kernel (pallas_sv._MAX_STATE_BYTES
  caps one complex state at 8MB): the sweep holds 4 state planes +
  temporaries, which fits VMEM whenever the forward's 2-plane budget does.
  One shared bound keeps the two gates from silently diverging."""
  return pltpu is not None and pallas_sv.supported(circuit)


def _prepare_backward(circuit: ir.Circuit, angles, shape_rc,
                      rot_planes: bool = False):
  """Static reverse-stage descriptors + traced inputs + assembly plan.

  Returns (descs, inputs, plan):
    descs: tuple of (kind, meta) consumed by the kernel in order;
    inputs: per-desc tuples of traced arrays;
    plan:  static assembly records, one per desc, used OUTSIDE the kernel
           to turn the kernel's reduction outputs into (slot, dangle)
           gradient terms.

  With `rot_planes` (the batched kernel), diagonal segments carry
  PRECOMPUTED [R, C] cos/sin planes of the total segment phase (computed
  once by XLA, shared across the batch) instead of the in-kernel
  sign-matmul; the parity masks stay as inputs for the gradient bilinears.
  """
  r, c = shape_rc
  n = circuit.num_qubits
  m = int(c).bit_length() - 1
  nr = n - m
  gates = circuit.gates
  descs = []
  inputs = []
  plan = []
  for cls, idxs in reversed(sv.segment_circuit(gates)):
    seg_gates = [gates[i] for i in idxs]
    seg_angles = [angles[i] for i in idxs]
    if cls == "1q":
      by_qubit = {}
      for gate, angle in zip(seg_gates, seg_angles):
        by_qubit.setdefault(gate.qubits[0], []).append((gate, angle))
      grad_qubits = set(q for q, chain in by_qubit.items()
                        if any(g.slot >= 0 for g, _ in chain))
      # Per-qubit inverse (chain product dagger) + per-gate mg matrices
      # (suffix-conjugated dU), all tiny trace-time 2x2 algebra mirroring
      # ops/adjoint.py `_bwd_1q_segment`.
      minor_inv = None
      major_inv = {}
      mg_entries = []  # (qubit, slot, coeff, mg 2x2 complex traced)
      hp = jax.lax.Precision.HIGHEST  # tiny operator folds: always exact,
      # mirroring ops/adjoint.py `_bwd_1q_segment` (bf16 rounding here
      # would bias every gradient the fold feeds, deterministically).
      for q in sorted(by_qubit):
        chain = by_qubit[q]
        suffix = jnp.eye(2, dtype=sv.COMPLEX_DTYPE)
        for gate, angle in reversed(chain):
          mat = sv.gate_matrix(gate.kind, angle)
          if gate.slot >= 0:
            ang = jnp.asarray(angle, jnp.float32)
            _, dmat = jax.jvp(lambda t, kind=gate.kind: sv.gate_matrix(
                kind, t), (ang,), (jnp.ones_like(ang),))
            mg = jnp.matmul(
                jnp.matmul(jnp.matmul(suffix, dmat, precision=hp),
                           jnp.conj(mat.T), precision=hp),
                jnp.conj(suffix.T), precision=hp)
            mg_entries.append((q, gate.slot, gate.coeff, mg))
          suffix = jnp.matmul(suffix, mat, precision=hp)
        v_inv = jnp.conj(suffix.T)
        if q >= nr:
          emb = sv._embed_minor_mat(v_inv, (q - nr,), m)
          minor_inv = (emb if minor_inv is None
                       else jnp.matmul(emb, minor_inv, precision=hp))
        else:
          major_inv[q] = v_inv

      minor_grads = tuple(sorted(q for q in grad_qubits if q >= nr))
      blocks = []  # (start, k, needs_grad)
      block_ins = []
      for start, k in sv._row_blocks(nr):
        folded = sv._fold_block(major_inv, start, k)
        needs_grad = any(start <= q < start + k for q in grad_qubits)
        if folded is None and not needs_grad:
          continue
        # needs_grad implies a grad qubit inside this row block, and every
        # grad qubit (< nr) has a major_inv entry, so folded is non-None
        # whenever we get here.
        blocks.append((start, k, needs_grad))
        block_ins.append((jnp.real(folded).astype(jnp.float32),
                          jnp.imag(folded).astype(jnp.float32)))
      seg_inputs = []
      for pair in block_ins:
        seg_inputs.extend(pair)
      has_minor = minor_inv is not None or bool(minor_grads)
      if has_minor:
        if minor_inv is None:
          minor_inv = jnp.eye(c, dtype=sv.COMPLEX_DTYPE)
        mt = minor_inv.T
        seg_inputs.extend([jnp.real(mt).astype(jnp.float32),
                           jnp.imag(mt).astype(jnp.float32)])
      descs.append(("bwd1q", (tuple(blocks), has_minor,
                              bool(minor_grads))))
      inputs.append(tuple(seg_inputs))
      plan.append(("1q", {
          "blocks": tuple(blocks),
          "minor_grads": minor_grads,
          "mg_entries": mg_entries,
          "nr": nr, "m": m,
      }))
    else:  # diag
      coeffs, rms, cms, owner = sv.diag_segment_triples(seg_gates, nr, m)
      rmask = jnp.asarray(np.asarray(rms, np.int32)[None, :])  # [1, K]
      cmask = jnp.asarray(np.asarray(cms, np.int32)[:, None])  # [K, 1]
      if rot_planes:
        theta = sv.diag_segment_phase(seg_gates, seg_angles, shape_rc)
        dt = pallas_sv.rot_plane_dtype()
        descs.append(("bwddiagrot", len(rms)))
        inputs.append((rmask, cmask, jnp.cos(theta).astype(dt),
                       jnp.sin(theta).astype(dt)))
      else:
        weighted = jnp.stack(
            [jnp.asarray(coeffs[k], jnp.float32) *
             jnp.asarray(seg_angles[owner[k]], jnp.float32)
             for k in range(len(coeffs))])
        descs.append(("bwddiag", len(rms)))
        inputs.append((weighted[None, :], rmask, cmask))
      grad_gates = tuple(
          (g_idx, seg_gates[g_idx].slot, seg_gates[g_idx].coeff)
          for g_idx in range(len(seg_gates)) if seg_gates[g_idx].slot >= 0)
      plan.append(("diag", {
          "coeffs": tuple(float(x) for x in coeffs),
          "owner": tuple(owner),
          "grad_gates": grad_gates,
      }))
  return tuple(descs), inputs, plan


def _out_shapes_for(descs, r, c, t_count):
  """Kernel reduction-output ShapeDtypeStructs, in desc order."""
  shapes = []
  lead = (t_count,) if t_count > 1 else ()
  for kind, meta in descs:
    if kind == "bwd1q":
      blocks, has_minor, minor_grads = meta
      for start, k, needs_grad in blocks:
        if needs_grad:
          nn = 2**k
          shapes.append(jax.ShapeDtypeStruct(lead + (nn, nn), jnp.float32))
          shapes.append(jax.ShapeDtypeStruct(lead + (nn, nn), jnp.float32))
      if minor_grads:
        shapes.append(jax.ShapeDtypeStruct(lead + (c, c), jnp.float32))
        shapes.append(jax.ShapeDtypeStruct(lead + (c, c), jnp.float32))
    else:
      k_count = meta
      shapes.append(jax.ShapeDtypeStruct(lead + (1, k_count), jnp.float32))
  return tuple(shapes)


def _dot(a, b):
  return jax.lax.dot(a, b, precision=pallas_sv.matmul_precision_lax(),
                     preferred_element_type=jnp.float32)


def _dot_t(a, b):
  """a^T @ b: contract the row axes."""
  return jax.lax.dot_general(
      a, b, (((0,), (0,)), ((), ())),
      precision=pallas_sv.matmul_precision_lax(),
      preferred_element_type=jnp.float32)


def _dot_rt(a, b):
  """a @ b^T: contract the column axes."""
  return jax.lax.dot_general(
      a, b, (((1,), (1,)), ((), ())),
      precision=pallas_sv.matmul_precision_lax(),
      preferred_element_type=jnp.float32)


def _block_transition_parts(l_re, l_im, a_re, a_im, start, k, r, c):
  """Split-complex G[I,J] = sum conj(lam)[..I..] a[..J..] over a row block."""
  pre = 2**start
  nn = 2**k
  if pre == 1:
    lr = l_re.reshape(nn, -1)
    li = l_im.reshape(nn, -1)
    ar = a_re.reshape(nn, -1)
    ai = a_im.reshape(nn, -1)
    g_re = _dot_rt(lr, ar) + _dot_rt(li, ai)
    g_im = _dot_rt(lr, ai) - _dot_rt(li, ar)
    return g_re, g_im
  lr = l_re.reshape(pre, nn, -1)
  li = l_im.reshape(pre, nn, -1)
  ar = a_re.reshape(pre, nn, -1)
  ai = a_im.reshape(pre, nn, -1)
  # Mosaic rejects doubly-contracted einsums ("aIb,aJb->IJ"); lower as a
  # batched matmul over `a` (single contracting dim b) + a cheap sum over
  # the [pre, N, N] batch axis.
  prog = "aIb,aJb->aIJ"
  p = pallas_sv.matmul_precision_lax()
  g_re = (jnp.einsum(prog, lr, ar, precision=p) +
          jnp.einsum(prog, li, ai, precision=p)).sum(axis=0)
  g_im = (jnp.einsum(prog, lr, ai, precision=p) -
          jnp.einsum(prog, li, ar, precision=p)).sum(axis=0)
  return g_re, g_im


def _make_bwd_kernel(descs, r, c, t_count,
                     num_outputs_per_period, batched: bool = False):
  """Reverse-sweep kernel body.  Input refs: [a_re, a_im, l_re, l_im] +
  per-desc inputs (leading [T] when t_count > 1).  Output refs: reduction
  arrays in desc order (leading [T] when t_count > 1).

  With `batched`, the state planes are [1, R, C] grid blocks (one state per
  grid step) and every output ref carries a leading [1] batch-block axis."""

  def run_period(t, a_re, a_im, l_re, l_im, in_refs, out_refs, rows, cols):
    def rd(ref):
      return ref[t] if t is not None else ref[:]

    def wr(ref, val):
      if batched:
        if t is not None:
          ref[0, t] = val
        else:
          ref[0] = val
      elif t is not None:
        ref[t] = val
      else:
        ref[:] = val

    pos = 4
    out_pos = 0
    for kind, meta in descs:
      if kind == "bwd1q":
        blocks, has_minor, minor_grads = meta
        block_mats = []
        for _ in blocks:
          block_mats.append((rd(in_refs[pos]), rd(in_refs[pos + 1])))
          pos += 2
        if has_minor:
          minor_mt = (rd(in_refs[pos]), rd(in_refs[pos + 1]))
          pos += 2
        # (1) un-apply a, then emit reductions from (lam, a_unapplied)?
        # NO: reductions use the post-segment states (ops/adjoint.py
        # computes g_mats from (lam, a) BEFORE un-applying).  Emit first.
        for (start, k, needs_grad) in blocks:
          if needs_grad:
            g_re, g_im = _block_transition_parts(l_re, l_im, a_re, a_im,
                                                 start, k, r, c)
            wr(out_refs[out_pos], g_re)
            wr(out_refs[out_pos + 1], g_im)
            out_pos += 2
        if minor_grads:
          k_re = _dot_t(l_re, a_re) + _dot_t(l_im, a_im)
          k_im = _dot_t(l_re, a_im) - _dot_t(l_im, a_re)
          wr(out_refs[out_pos], k_re)
          wr(out_refs[out_pos + 1], k_im)
          out_pos += 2
        # (2) un-apply both states.
        for (start, k, _), (m_re, m_im) in zip(blocks, block_mats):
          a_re, a_im = pallas_sv._apply_rowblock(a_re, a_im, m_re, m_im,
                                                 start, k, r, c)
          l_re, l_im = pallas_sv._apply_rowblock(l_re, l_im, m_re, m_im,
                                                 start, k, r, c)
        if has_minor:
          mt_re, mt_im = minor_mt
          y_re = _dot(a_re, mt_re) - _dot(a_im, mt_im)
          y_im = _dot(a_re, mt_im) + _dot(a_im, mt_re)
          a_re, a_im = y_re, y_im
          y_re = _dot(l_re, mt_re) - _dot(l_im, mt_im)
          y_im = _dot(l_re, mt_im) + _dot(l_im, mt_re)
          l_re, l_im = y_re, y_im
      else:  # bwddiag / bwddiagrot
        if kind == "bwddiagrot":
          rmask = rd(in_refs[pos])
          cmask = rd(in_refs[pos + 1])
          cth = rd(in_refs[pos + 2]).astype(jnp.float32)
          sth = rd(in_refs[pos + 3]).astype(jnp.float32)
          pos += 4
          s_r = pallas_sv._sign_matrix(rows, rmask)
          s_c = pallas_sv._sign_matrix(cols, cmask)
        else:
          w_row = rd(in_refs[pos])
          rmask = rd(in_refs[pos + 1])
          cmask = rd(in_refs[pos + 2])
          pos += 3
          s_r = pallas_sv._sign_matrix(rows, rmask)
          s_c = pallas_sv._sign_matrix(cols, cmask)
        # (1) per-factor bilinears: s_r_k^T P s_c_k with
        # P = Im(conj(lam) * a) = l_re*a_im - l_im*a_re.
        p = l_re * a_im - l_im * a_re
        w2 = _dot_rt(p, s_c)  # [R, K]
        ones_row = jnp.ones((1, r), jnp.float32)
        bilin = _dot(ones_row, s_r * w2)  # [1, K]
        wr(out_refs[out_pos], bilin)
        out_pos += 1
        # (2) un-apply: rotate both states by exp(-i*theta); one theta +
        # one cos/sin pair shared between the two states ("rot": the planes
        # were precomputed outside and shared across the batch).
        if kind == "bwddiag":
          theta = _dot(s_r * w_row, s_c)
          cth = jnp.cos(theta)
          sth = jnp.sin(theta)  # un-apply uses -theta => sin -> -sth
        y_re = cth * a_re + sth * a_im
        y_im = cth * a_im - sth * a_re
        a_re, a_im = y_re, y_im
        y_re = cth * l_re + sth * l_im
        y_im = cth * l_im - sth * l_re
        l_re, l_im = y_re, y_im
    return a_re, a_im, l_re, l_im

  def kernel(*refs):
    in_refs = refs[:-num_outputs_per_period]
    out_refs = refs[-num_outputs_per_period:]
    rows = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
    if batched:
      a_re = in_refs[0][0]
      a_im = in_refs[1][0]
      l_re = in_refs[2][0]
      l_im = in_refs[3][0]
    else:
      a_re = in_refs[0][:]
      a_im = in_refs[1][:]
      l_re = in_refs[2][:]
      l_im = in_refs[3][:]
    if t_count > 1:
      # descs/inputs were built from the REVERSED segment list, so stacked
      # index t=0 is already the last layer: iterate forward.
      def body(t, carry):
        return run_period(t, *carry, in_refs, out_refs, rows, cols)

      jax.lax.fori_loop(0, t_count, body, (a_re, a_im, l_re, l_im))
    else:
      run_period(None, a_re, a_im, l_re, l_im, in_refs, out_refs, rows,
                 cols)

  return kernel


def _assemble_grads(plan, outputs, t_count, c, symbol_values):
  """XLA-side per-gate gradient algebra on the kernel's reductions.

  Mirrors ops/adjoint.py `_bwd_1q_segment` / `_bwd_diag_segment` exactly.
  `plan` describes period stages; for layered circuits each stage's plan
  carries per-layer mg/coeff data under key "per_t"."""
  grad_terms = []
  out_pos = 0
  m = int(c).bit_length() - 1
  for kind, info in plan:
    if kind == "1q":
      blocks = info["blocks"]
      minor_grads = info["minor_grads"]
      nr = info["nr"]
      g_parts = {}
      for (start, k, needs_grad) in blocks:
        if needs_grad:
          g_parts[(start, k)] = (outputs[out_pos], outputs[out_pos + 1])
          out_pos += 2
      if minor_grads:
        kmat = (outputs[out_pos], outputs[out_pos + 1])
        out_pos += 2
      for t in range(t_count):
        mg_entries = (info["per_t"][t]["mg_entries"]
                      if "per_t" in info else info["mg_entries"])
        for (q, slot, coeff, mg) in mg_entries:
          if q >= nr:
            k_re, k_im = kmat
            kr = k_re[t] if t_count > 1 else k_re
            ki = k_im[t] if t_count > 1 else k_im
            g_re = sv.partial_trace_1q(kr, m, q - nr)
            g_im = sv.partial_trace_1q(ki, m, q - nr)
          else:
            (start, k) = next((s, kk) for (s, kk, ng) in blocks
                              if ng and s <= q < s + kk)
            g_re_full, g_im_full = g_parts[(start, k)]
            gr = g_re_full[t] if t_count > 1 else g_re_full
            gi = g_im_full[t] if t_count > 1 else g_im_full
            g_re = sv.partial_trace_1q(gr, k, q - start)
            g_im = sv.partial_trace_1q(gi, k, q - start)
          # dangle = 2 Re sum(mg * G), G = g_re + i g_im.
          dangle = 2.0 * jnp.sum(jnp.real(mg) * g_re - jnp.imag(mg) * g_im)
          grad_terms.append((slot, coeff * dangle))
    else:  # diag
      bilin = outputs[out_pos]
      out_pos += 1
      for t in range(t_count):
        d = info["per_t"][t] if "per_t" in info else info
        row = bilin[t, 0] if t_count > 1 else bilin[0]
        coeffs = d["coeffs"]
        owner = d["owner"]
        for (g_idx, slot, coeff) in d["grad_gates"]:
          dangle = -2.0 * sum(coeffs[k] * row[k]
                              for k in range(len(owner))
                              if owner[k] == g_idx)
          grad_terms.append((slot, coeff * dangle))
  if not grad_terms:
    return jnp.zeros_like(symbol_values)
  slots = jnp.asarray([s for s, _ in grad_terms], jnp.int32)
  contribs = jnp.stack([d for _, d in grad_terms])
  return jnp.zeros_like(symbol_values).at[slots].add(contribs)


def _merge_period_plan(descs, inputs, plan):
  """Collapses a layered circuit's repeated per-period plan entries.

  Reversed-order layer t in the kernel maps to plan entry
  t*per_period + j: per-layer traced inputs are stacked along a leading t
  axis and per-layer mg/coeff assembly data is kept under a "per_t" list.
  Shared by `adjoint_sweep` and `adjoint_sweep_batched` so the subtle merge
  logic has exactly one implementation.

  Returns (descs, inputs, plan, per_period, t_count).
  """
  per_period, t_count = pallas_sv._find_period(descs)
  if t_count > 1:
    period_plan = []
    for j in range(per_period):
      kind, info0 = plan[j]
      per_t_list = [plan[t * per_period + j][1] for t in range(t_count)]
      merged = dict(info0)
      merged["per_t"] = per_t_list
      period_plan.append((kind, merged))
    plan = period_plan
    inputs = pallas_sv._flatten_inputs(inputs, per_period, t_count)
    descs = descs[:per_period]
  else:
    inputs = pallas_sv._flatten_inputs(inputs, per_period, 1)
  return descs, inputs, plan, per_period, t_count


def adjoint_sweep(circuit: ir.Circuit,
                  symbol_values: jnp.ndarray,
                  psi: jnp.ndarray,
                  lam: jnp.ndarray,
                  interpret: bool = False) -> jnp.ndarray:
  """values_bar [num_symbols] from the VMEM-resident reverse sweep."""
  r, c = psi.shape
  angles = [sv.resolve_angle(gate, symbol_values) for gate in circuit.gates]
  descs, inputs, plan = _prepare_backward(circuit, angles, (r, c))
  descs, inputs, plan, per_period, t_count = _merge_period_plan(
      descs, inputs, plan)

  out_shapes = _out_shapes_for(descs, r, c, t_count)
  num_out = len(out_shapes)
  kernel = _make_bwd_kernel(descs, r, c, t_count, num_out)
  if num_out == 0:
    return jnp.zeros_like(symbol_values)

  planes = [jnp.real(psi).astype(jnp.float32),
            jnp.imag(psi).astype(jnp.float32),
            jnp.real(lam).astype(jnp.float32),
            jnp.imag(lam).astype(jnp.float32)]
  all_inputs = planes + list(inputs)
  if interpret:
    specs = [pl.BlockSpec() for _ in all_inputs]
    out_specs = tuple(pl.BlockSpec() for _ in out_shapes)
  else:
    specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in all_inputs]
    out_specs = tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                      for _ in out_shapes)
  kwargs = {}
  if not interpret and pltpu is not None:
    kwargs["compiler_params"] = pltpu.CompilerParams(
        vmem_limit_bytes=pallas_sv._vmem_budget_bytes())
  outputs = pl.pallas_call(
      kernel,
      out_shape=out_shapes,
      in_specs=specs,
      out_specs=out_specs,
      interpret=interpret,
      **kwargs,
  )(*all_inputs)
  if not isinstance(outputs, (tuple, list)):
    outputs = (outputs,)
  return _assemble_grads(plan, tuple(outputs), t_count, c, symbol_values)


def batched_supported(circuit: ir.Circuit) -> bool:
  """Gate support + VMEM estimate for the batched reverse sweep: diag
  rotation planes stay resident while 4 state planes stream per grid step."""
  if not supported(circuit):
    return False
  plane = 4 * 2**circuit.num_qubits  # one f32 [R, C] plane
  # Price the resident rotation planes at their ACTUAL dtype (bf16 under
  # the default MXU precision halves them -- pallas_sv._rot_plane_bytes);
  # pricing them at f32 rejected shapes the kernel was designed to handle.
  resident = 14 * plane + pallas_sv._rot_plane_bytes(circuit)
  return resident <= pallas_sv._vmem_budget_bytes()


def adjoint_sweep_batched(circuit: ir.Circuit,
                          symbol_values: jnp.ndarray,
                          psi: jnp.ndarray,
                          lam: jnp.ndarray,
                          interpret: bool = False) -> jnp.ndarray:
  """BATCH-summed values_bar [num_symbols] from one grid-over-batch kernel.

  `psi`/`lam` are [B, R, C]; the grid runs one reverse sweep per state while
  the inverse gate operators and the diagonal segments' cos/sin rotation
  planes (computed ONCE outside, sv.diag_segment_phase) stay VMEM-resident
  and shared across the batch — the per-state sign matmuls + transcendentals
  that dominated the vmapped variant's VPU residual are paid once per batch.
  Per-state gradient reductions land in [B]-blocked outputs and are summed
  outside (the batch-level VJP sums per-state gradients anyway —
  ops/adjoint.py `_bt_bwd`)."""
  bsz, r, c = psi.shape
  angles = [sv.resolve_angle(gate, symbol_values) for gate in circuit.gates]
  descs, inputs, plan = _prepare_backward(circuit, angles, (r, c),
                                          rot_planes=True)
  descs, inputs, plan, per_period, t_count = _merge_period_plan(
      descs, inputs, plan)

  per_state_shapes = _out_shapes_for(descs, r, c, t_count)
  num_out = len(per_state_shapes)
  if num_out == 0:
    return jnp.zeros_like(symbol_values)
  kernel = _make_bwd_kernel(descs, r, c, t_count, num_out,
                            batched=True)

  planes = [jnp.real(psi).astype(jnp.float32),
            jnp.imag(psi).astype(jnp.float32),
            jnp.real(lam).astype(jnp.float32),
            jnp.imag(lam).astype(jnp.float32)]
  all_inputs = planes + list(inputs)
  out_shapes = tuple(
      jax.ShapeDtypeStruct((bsz,) + s.shape, s.dtype)
      for s in per_state_shapes)
  kw = {} if interpret else {"memory_space": pltpu.VMEM}
  state_spec = pl.BlockSpec((1, r, c), lambda i: (i, 0, 0), **kw)
  shared_specs = [pl.BlockSpec(**kw) for _ in inputs]
  specs = [state_spec] * 4 + shared_specs
  out_specs = tuple(
      pl.BlockSpec((1,) + s.shape,
                   (lambda nd: lambda i: (i,) + (0,) * nd)(len(s.shape)),
                   **kw) for s in per_state_shapes)
  kwargs = {}
  if not interpret and pltpu is not None:
    kwargs["compiler_params"] = pltpu.CompilerParams(
        vmem_limit_bytes=pallas_sv._vmem_budget_bytes())
  outputs = pl.pallas_call(
      kernel,
      grid=(bsz,),
      out_shape=out_shapes,
      in_specs=specs,
      out_specs=out_specs,
      interpret=interpret,
      **kwargs,
  )(*all_inputs)
  if not isinstance(outputs, (tuple, list)):
    outputs = (outputs,)
  summed = tuple(o.sum(axis=0) for o in outputs)
  return _assemble_grads(plan, summed, t_count, c, symbol_values)
