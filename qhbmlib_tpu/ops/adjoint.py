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


def _bwd_diag_segment(seg_gates, seg_angles, grad_terms, a, lam):
  """Backward through a run of commuting diagonal gates.

  Per-gate gradient: for diagonal U_g = exp(i * angle_g * m_g(x)),
  dE/dangle_g = 2 Re <lam| i m_g (.) a_out> = -2 sum_x m_g(x) Im(conj(lam) a),
  where a_out is the state AFTER the whole segment (all gates commute) --
  one elementwise weight array serves every gate.  Un-applying the segment
  to `a` and `lam` is a single shared phase multiply.
  """
  n = sv.num_qubits_of(a)
  mm = int(a.shape[1]).bit_length() - 1
  # One triple enumeration serves both the gradient contraction and the
  # un-apply phasor below (they used to recompute it independently).
  coeffs, rms, cms, owner = sv.diag_segment_triples(seg_gates, n - mm, mm)
  if any(gate.slot >= 0 for gate in seg_gates):
    w = jnp.imag(jnp.conj(lam) * a)
    # One (chunked) bilinear contraction evaluates every gradient gate's
    # mask reduction at once via the static parity-mask factors.  Factors
    # owned by constant (slot < 0) gates -- e.g. the CZ entangler layers
    # that dominate a fused diag segment -- are dropped BEFORE the
    # contraction: parity_bilinear's chunked scan cannot be dead-code
    # eliminated by XLA, and at 28 qubits each wasted factor chunk is a
    # full state-sized matmul.  (The un-apply below still uses every gate.)
    keep = [k for k in range(len(owner)) if seg_gates[owner[k]].slot >= 0]
    per_factor = sv.parity_bilinear([rms[k] for k in keep],
                                    [cms[k] for k in keep], w)
    for g_idx, gate in enumerate(seg_gates):
      if gate.slot >= 0:
        dangle = -2.0 * sum(coeffs[keep[j]] * per_factor[j]
                            for j in range(len(keep))
                            if owner[keep[j]] == g_idx)
        grad_terms.append((gate.slot, gate.coeff * dangle))
  weighted = [coeffs[k] * jnp.asarray(seg_angles[owner[k]], jnp.float32)
              for k in range(len(coeffs))]
  factors = sv.phasor_factors_from_triples(weighted, rms, cms, a.shape)
  if factors is not None:
    # Factored un-apply: exp(-i*phase) as row x col x cross phasors -- no
    # 2^n-element transcendental sweep (see diag_segment_phasor_factors).
    return sv.apply_diag_segment_phasor(factors, (a, lam), sign=-1.0)
  total = sv.parity_outer_sum(weighted, rms, cms, a.shape)
  phase = jnp.exp(-1j * total.astype(sv.COMPLEX_DTYPE))
  return a * phase, lam * phase


def _bwd_1q_segment(seg_gates, seg_angles, grad_terms, a, lam):
  """Backward through a run of 1-qubit dense gates.

  Gates on distinct qubits commute, so for gate g (with later same-qubit
  gates A): dE/dangle_g = 2 Re <lam| A dU_g U_g^dagger A^dagger |a_out>,
  a 2x2 contraction against the reduced transition matrix G_q.  Row-qubit
  G_q's come from ONE <=7-bit block-transition MXU contraction per row
  block (then tiny partial traces); minor-qubit G_q's from one [C, C]
  cross contraction.  Un-applies kron-fold into one block matmul per row
  block plus one [C, C] matmul for all minors.
  """
  r, c = a.shape
  n = sv.num_qubits_of(a)
  m = int(c).bit_length() - 1
  nr = n - m
  by_qubit = {}
  for gate, angle in zip(seg_gates, seg_angles):
    by_qubit.setdefault(gate.qubits[0], []).append((gate, angle))

  grad_qubits = set(q for q, chain in by_qubit.items()
                    if any(gate.slot >= 0 for gate, _ in chain))

  # Reduced transition matrices for every qubit that needs a gradient.
  g_mats = {}
  minor_grads = sorted(q for q in grad_qubits if q >= nr)
  if minor_grads:
    kmat = sv.cross_gram(lam, a)  # [C, C]
    for q in minor_grads:
      g_mats[q] = sv.partial_trace_1q(kmat, m, q - nr)
  for start, k in sv._row_blocks(nr):
    block_grads = sorted(q for q in grad_qubits if start <= q < start + k)
    if not block_grads:
      continue
    g_block = sv.block_transition(lam, a, start, k)
    for q in block_grads:
      g_mats[q] = sv.partial_trace_1q(g_block, k, q - start)

  minor_inv = None
  major_inv_by_qubit = {}
  for q in sorted(by_qubit):
    chain = by_qubit[q]
    g_mat = g_mats.get(q)
    suffix = jnp.eye(2, dtype=sv.COMPLEX_DTYPE)
    for gate, angle in reversed(chain):
      mat = sv.gate_matrix(gate.kind, angle)
      if gate.slot >= 0:
        ang = jnp.asarray(angle, jnp.float32)
        _, dmat = jax.jvp(lambda t: sv.gate_matrix(gate.kind, t), (ang,),
                          (jnp.ones_like(ang),))
        hp = jax.lax.Precision.HIGHEST  # tiny operator folds: always exact
        mg = jnp.matmul(
            jnp.matmul(jnp.matmul(suffix, dmat, precision=hp),
                       jnp.conj(mat.T), precision=hp),
            jnp.conj(suffix.T), precision=hp)
        dangle = 2.0 * jnp.real(jnp.sum(mg * g_mat))
        grad_terms.append((gate.slot, gate.coeff * dangle))
      suffix = jnp.matmul(suffix, mat,
                          precision=jax.lax.Precision.HIGHEST)
    v_inv = jnp.conj(suffix.T)
    if q >= nr:
      emb = sv._embed_minor_mat(v_inv, (q - nr,), m)
      minor_inv = emb if minor_inv is None else jnp.matmul(
          emb, minor_inv, precision=jax.lax.Precision.HIGHEST)
    else:
      major_inv_by_qubit[q] = v_inv

  def unapply(state):
    return sv.apply_majors_and_minor(state, major_inv_by_qubit, minor_inv)

  # Separate un-applies measure faster than a [2, R, C] stacked vmap (the
  # batch axis breaks the clean [2^k, rest] matmul layouts: 97 -> 134 ms on
  # the 20q 64-state gradient batch).
  return unapply(a), unapply(lam)


def _barrier_bits() -> int:
  """State size (in complex elements, log2) from which the reverse sweep
  pins per-segment scheduling with optimization barriers.  Without them
  XLA's list scheduler can keep every reverse-sweep state alive at once
  (observed 75 live 2GB states at 28 qubits); below the threshold the
  scheduler does better unconstrained."""
  import os
  return int(os.environ.get("QHBM_BARRIER_BITS", "24"))


def _seq_barrier(a, lam, grad_terms, start):
  """Ties the gradient scalars produced since `start` into the (a, lam)
  dependency chain with an optimization barrier.  Without it XLA is free to
  schedule ALL reverse-sweep states before ANY gradient reduction, keeping
  every state of the chain live at once -- a >100GB HBM footprint at 28
  qubits.  The barrier forces each segment's reductions to complete before
  the sweep advances, so live memory stays O(state)."""
  new = grad_terms[start:]
  if not new:
    a, lam = jax.lax.optimization_barrier((a, lam))
    return a, lam
  vals = jnp.stack([d for _, d in new])
  a, lam, vals = jax.lax.optimization_barrier((a, lam, vals))
  for i, (slot, _) in enumerate(new):
    grad_terms[start + i] = (slot, vals[i])
  return a, lam


def _bwd(circuit, res, g):
  """g: cotangent [num_terms].  One segment-fused reverse sweep."""
  symbol_values, psi, op = res
  # lambda = sum_t g_t P_t |psi>;
  # then dE/dtheta_k = 2 Re <lambda|dU_k|psi_{k-1}>
  lam = sv.apply_pauli_sum(psi, paulis.PauliSum(op.codes,
                                                jnp.ones_like(op.coeffs),
                                                op.num_qubits),
                           term_weights=g)
  grad = None
  if sv._pallas_forward_enabled():
    # Opt-in (QHBM_PALLAS=1): the entire reverse sweep runs as ONE
    # VMEM-resident Pallas kernel on TPU lowerings (measured ~6% faster
    # than this XLA sweep at 20q/4L in bf16 precision; see
    # benchmarks/RESULTS.md).  Other platforms take the XLA sweep.
    from qhbmlib_tpu.ops import pallas_adjoint
    if pallas_adjoint.supported(circuit):
      import functools as _ft
      grad = jax.lax.platform_dependent(
          symbol_values, psi, lam,
          tpu=_ft.partial(pallas_adjoint.adjoint_sweep, circuit),
          default=_ft.partial(_xla_reverse_sweep, circuit, op, g))
  if grad is None:
    grad = _xla_reverse_sweep(circuit, op, g, symbol_values, psi, lam)
  zero_state = jnp.zeros_like(psi)
  zero_coeffs = jax.tree_util.tree_map(
      jnp.zeros_like,
      paulis.PauliSum(op.codes, op.coeffs, op.num_qubits))
  return grad, zero_state, zero_coeffs


def _xla_reverse_sweep(circuit, op, g, symbol_values, psi, lam):
  """The segment-fused XLA reverse sweep; returns values_bar."""
  del op, g  # gradient terms depend only on (values, psi, lam)
  # Per-gate gradient contributions are collected and scattered ONCE at the
  # end: a per-gate `.at[slot].add` chain serializes hundreds of tiny
  # scatter ops on TPU and dominated the backward wall-clock.
  grad_terms = []
  a = psi  # state after gate k (runs backward)
  gates = circuit.gates
  angles = [sv.resolve_angle(gate, symbol_values) for gate in gates]
  for cls, idxs in reversed(sv.segment_circuit(gates)):
    seg_gates = [gates[i] for i in idxs]
    seg_angles = [angles[i] for i in idxs]
    seg_start = len(grad_terms)
    if cls == "diag" and len(idxs) > 1:
      a, lam = _bwd_diag_segment(seg_gates, seg_angles, grad_terms, a, lam)
    elif cls == "1q":
      a, lam = _bwd_1q_segment(seg_gates, seg_angles, grad_terms, a, lam)
    else:
      for gate, angle in reversed(list(zip(seg_gates, seg_angles))):
        a = _apply_inverse(gate, angle, a)
        if gate.slot >= 0:
          d_psi = sv.apply_gate_dangle(gate, angle, a)
          dangle = 2.0 * jnp.real(
              jnp.sum(jnp.conj(lam.reshape(-1)) * d_psi.reshape(-1)))
          grad_terms.append((gate.slot, gate.coeff * dangle))
        lam = _apply_inverse(gate, angle, lam)
    if a.size >= 2**_barrier_bits():
      # Barriers protect peak HBM at huge states only; at smaller sizes
      # they just constrain XLA's scheduler.
      a, lam = _seq_barrier(a, lam, grad_terms, seg_start)
  if grad_terms:
    slots = jnp.asarray([s for s, _ in grad_terms], jnp.int32)
    contribs = jnp.stack([d for _, d in grad_terms])
    return jnp.zeros_like(symbol_values).at[slots].add(contribs)
  return jnp.zeros_like(symbol_values)


def _apply_inverse(gate: ir.Gate, angle, state):
  inv = ir.Gate(gate.kind, gate.qubits, -1, 0.0, 0.0, gate.paulis)
  return sv.apply_gate(inv, -angle, state)


adjoint_term_expectations.defvjp(_fwd, _bwd)


# -- basis-state variant with O(1)-per-element residuals ----------------------
#
# Under `lax.map` (the batch chunking below), custom_vjp residuals are
# STACKED across iterations; storing psi would cost batch * 2^n memory.  This
# variant keeps only (values, bits) as residuals and recomputes the forward
# state in the backward pass (one extra sweep, state-sized live memory).

@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _term_expectations_from_bits(circuit: ir.Circuit,
                                 symbol_values: jnp.ndarray,
                                 bits: jnp.ndarray,
                                 op: paulis.PauliSum) -> jnp.ndarray:
  psi = sv.apply_circuit(circuit, symbol_values,
                         sv.basis_state(circuit.num_qubits, bits))
  return sv.expectation_terms(psi, op)


def _feb_fwd(circuit, symbol_values, bits, op):
  out = _term_expectations_from_bits(circuit, symbol_values, bits, op)
  return out, (symbol_values, bits, op)


def _feb_bwd(circuit, res, g):
  symbol_values, bits, op = res
  psi = sv.apply_circuit(circuit, symbol_values,
                         sv.basis_state(circuit.num_qubits, bits))
  grad, _, zero_coeffs = _bwd(circuit, (symbol_values, psi, op), g)
  return grad, None, zero_coeffs


_term_expectations_from_bits.defvjp(_feb_fwd, _feb_bwd)


def expectation(circuit: ir.Circuit,
                symbol_values: jnp.ndarray,
                init_state: jnp.ndarray,
                op: paulis.PauliSum) -> jnp.ndarray:
  """<psi(values)| op |psi(values)> with adjoint gradients, real scalar."""
  terms = adjoint_term_expectations(circuit, symbol_values, init_state, op)
  return jnp.sum(terms * jnp.real(op.coeffs))


# One shared implementation (hashing/equality must stay in lockstep with the
# sharded engine's nondiff arguments).
_HashableOp = paulis.HashableOp


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _batched_terms(circuit: ir.Circuit, hop: _HashableOp, batch_chunk: int,
                   symbol_values: jnp.ndarray,
                   init_bits: jnp.ndarray) -> jnp.ndarray:
  """[B, T] coefficient-free per-term expectations over a bitstring batch.

  The custom VJP operates at the BATCH level: the backward pass is a plain
  forward `lax.scan` over chunks running the explicit adjoint sweep --
  differentiating through a `lax.map` instead would produce a transposed
  scan whose buffer reuse XLA loses at high qubit counts (observed 75 live
  2GB states at 28 qubits).
  """
  out, _ = _bt_fwd(circuit, hop, batch_chunk, symbol_values, init_bits)
  return out


def _chunked(bits: jnp.ndarray, chunk: int):
  batch, n = bits.shape
  pad = (-batch) % chunk
  if pad:
    bits = jnp.concatenate([bits, jnp.zeros([pad, n], bits.dtype)], axis=0)
  return bits.reshape(-1, chunk, n), pad


# Store forward states as VJP residuals (skipping the backward's forward
# recompute) while the whole batch of states fits in this much HBM.
_PSI_RESIDUAL_BYTES = 1 << 30


def _store_psi(num_qubits: int, batch: int) -> bool:
  return batch * 8 * (2**num_qubits) <= _PSI_RESIDUAL_BYTES


def _pallas_batched_enabled() -> bool:
  """Opt-in (QHBM_PALLAS_BATCHED=1): run the batch forward/adjoint as
  grid-over-batch Pallas kernels with shared gate operators and rotation
  planes (ops/pallas_sv.py `apply_circuit_pallas_batched`,
  ops/pallas_adjoint.py `adjoint_sweep_batched`)."""
  import os
  return os.environ.get("QHBM_PALLAS_BATCHED", "0") == "1"


def _use_pallas_batched(circuit, n, batch) -> bool:
  if not (_pallas_batched_enabled() and _store_psi(n, batch)):
    return False
  from qhbmlib_tpu.ops import pallas_adjoint, pallas_sv
  return (pallas_sv.batched_supported(circuit) and
          pallas_adjoint.batched_supported(circuit))


def _bits_to_rowcol(bits: jnp.ndarray, n: int) -> jnp.ndarray:
  """[B, n] bitstrings -> [B, 2] (row, col) indices in the [R, C] layout."""
  m = sv.minor_bits(n)
  nr = n - m
  return jnp.stack([sv.bits_to_index(bits[:, :nr], nr),
                    sv.bits_to_index(bits[:, nr:], m)], axis=1)


def _bt_fwd(circuit, hop, batch_chunk, symbol_values, init_bits):
  op = hop.ones()
  n = circuit.num_qubits

  def one(bits):
    psi = sv.apply_circuit(circuit, symbol_values, sv.basis_state(n, bits))
    return sv.expectation_terms(psi, op), psi

  batch = init_bits.shape[0]
  chunks, _ = _chunked(init_bits, batch_chunk)
  if _use_pallas_batched(circuit, n, batch):
    from qhbmlib_tpu.ops import pallas_sv

    def _xla_psis(values, bits_chunks):
      ps = jax.lax.map(
          jax.vmap(lambda b: sv.apply_circuit(circuit, values,
                                              sv.basis_state(n, b))),
          bits_chunks)
      return ps.reshape((-1,) + ps.shape[2:])

    psis = jax.lax.platform_dependent(
        symbol_values, chunks,
        tpu=lambda values, _: pallas_sv.apply_circuit_pallas_batched(
            circuit, values, _bits_to_rowcol(
                chunks.reshape(-1, n), n)),
        default=_xla_psis)
    out = jax.lax.map(
        jax.vmap(lambda p: sv.expectation_terms(p, op)),
        psis.reshape((-1, batch_chunk) + psis.shape[1:]))
    out = out.reshape(-1, op.num_terms)[:batch]
    return out, (symbol_values, init_bits, psis[:batch])
  if _store_psi(n, batch):
    out, psis = jax.lax.map(jax.vmap(one), chunks)
    out = out.reshape(-1, op.num_terms)[:batch]
    return out, (symbol_values, init_bits, psis)
  out = jax.lax.map(jax.vmap(lambda b: one(b)[0]), chunks)
  out = out.reshape(-1, op.num_terms)[:batch]
  return out, (symbol_values, init_bits, None)


def _bt_bwd(circuit, hop, batch_chunk, res, g):
  symbol_values, init_bits, psis = res
  op = hop.ones()
  n = circuit.num_qubits
  batch = init_bits.shape[0]
  if _use_pallas_batched(circuit, n, batch):
    from qhbmlib_tpu.ops import pallas_adjoint
    # psis is the flat [B, R, C] residual.  lam_i = sum_t g_it P_t |psi_i>
    # is built chunk-wise by XLA (tiered Pauli applies), then ONE
    # grid-over-batch kernel runs every reverse sweep with shared operators
    # and rotation planes.
    ones_op = paulis.PauliSum(op.codes, jnp.ones_like(op.coeffs),
                              op.num_qubits)
    pad = (-batch) % batch_chunk
    psi_pad = psis
    g_pad = g
    if pad:
      psi_pad = jnp.concatenate(
          [psis, jnp.zeros((pad,) + psis.shape[1:], psis.dtype)], axis=0)
      g_pad = jnp.concatenate(
          [g, jnp.zeros([pad, g.shape[1]], g.dtype)], axis=0)
    psi_chunks = psi_pad.reshape((-1, batch_chunk) + psis.shape[1:])
    g_chunks = g_pad.reshape(-1, batch_chunk, g.shape[1])
    lams = jax.lax.map(
        lambda xs: jax.vmap(
            lambda p, gg: sv.apply_pauli_sum(p, ones_op, term_weights=gg))(
                xs[0], xs[1]),
        (psi_chunks, g_chunks)).reshape(psi_pad.shape)
    # Padded rows carry g == 0 => lam == 0 => zero gradient contribution.
    total = jax.lax.platform_dependent(
        symbol_values, psi_pad, lams,
        tpu=functools.partial(pallas_adjoint.adjoint_sweep_batched, circuit),
        default=functools.partial(_xla_states_sweep, circuit, op,
                                  batch_chunk))
    return total, None
  chunks, pad = _chunked(init_bits, batch_chunk)
  g_pad = jnp.concatenate(
      [g, jnp.zeros([pad, g.shape[1]], g.dtype)], axis=0) if pad else g
  g_chunks = g_pad.reshape(-1, batch_chunk, g.shape[1])

  def one(bits, gg, psi=None):
    if psi is None:
      psi = sv.apply_circuit(circuit, symbol_values, sv.basis_state(n, bits))
    grad, _, _ = _bwd(circuit, (symbol_values, psi, op), gg)
    return grad

  if psis is not None:
    def body(acc, xs):
      bits_c, g_c, psi_c = xs
      grads = jax.vmap(one)(bits_c, g_c, psi_c)  # [chunk, num_symbols]
      return acc + jnp.sum(grads, axis=0), None

    total, _ = jax.lax.scan(body, jnp.zeros_like(symbol_values),
                            (chunks, g_chunks, psis))
    return total, None

  def body(acc, xs):
    bits_c, g_c = xs
    grads = jax.vmap(one)(bits_c, g_c)  # [chunk, num_symbols]
    return acc + jnp.sum(grads, axis=0), None

  total, _ = jax.lax.scan(body, jnp.zeros_like(symbol_values),
                          (chunks, g_chunks))
  return total, None


def _xla_states_sweep(circuit, op, batch_chunk, symbol_values, psis, lams):
  """Batch-summed gradients from materialized (psi, lam) pairs via the XLA
  reverse sweep (the non-TPU branch of the pallas-batched path)."""
  psi_chunks = psis.reshape((-1, batch_chunk) + psis.shape[1:])
  lam_chunks = lams.reshape((-1, batch_chunk) + lams.shape[1:])

  def body(acc, xs):
    psi_c, lam_c = xs
    grads = jax.vmap(
        lambda p, l: _xla_reverse_sweep(circuit, op, None, symbol_values, p,
                                        l))(psi_c, lam_c)
    return acc + jnp.sum(grads, axis=0), None

  total, _ = jax.lax.scan(body, jnp.zeros_like(symbol_values),
                          (psi_chunks, lam_chunks))
  return total


_batched_terms.defvjp(_bt_fwd, _bt_bwd)


def batched_expectations(circuit: ir.Circuit,
                         symbol_values: jnp.ndarray,
                         init_bits: jnp.ndarray,
                         ops: Tuple[paulis.PauliSum, ...],
                         batch_chunk: int = None) -> jnp.ndarray:
  """Expectations of each op against U|b> for each bitstring b.

  All terms of all ops are concatenated into ONE PauliSum so each batch
  element costs exactly one forward sweep plus one adjoint backward sweep,
  regardless of how many observables are measured.

  The batch is processed in chunks of `batch_chunk` states (vmapped inside,
  `lax.map` outside): the adjoint backward sweep keeps a handful of
  state-sized buffers live per vmapped element, so an unchunked large batch
  at high qubit counts exceeds HBM.  The default bounds the vmapped state
  memory to ~128MB per buffer.

  Args:
    circuit: static circuit IR.
    symbol_values: [num_symbols] current parameter values.
    init_bits: [batch, n] int bitstrings; each becomes a basis init state.
    ops: tuple of PauliSums (e.g. operator shards).
    batch_chunk: states per chunk (None = auto from qubit count).

  Returns:
    [batch, len(ops)] float32 expectations, adjoint-differentiable w.r.t.
    `symbol_values` and each op's coefficients.
  """
  n = circuit.num_qubits
  big, slices = paulis.concat_ops(ops, n)
  all_coeffs = big.coeffs

  batch = init_bits.shape[0]
  if batch_chunk is None:
    import os
    env = os.environ.get("QHBM_BATCH_CHUNK")
    if env:
      batch_chunk = max(1, min(batch, int(env)))
    else:
      # The adjoint backward keeps ~4 state-sized buffers live per vmapped
      # element; target ~128MB of live chunk state (measured optimum on v5e
      # at 20 qubits with the block-matmul engine: chunk=4 beats 2 by 1.45x
      # and 16 by 2.7x).
      state_bytes = 8 * (2**n)
      batch_chunk = max(1, min(batch, (128 << 20) // (4 * state_bytes)))
  terms = _batched_terms(circuit, _HashableOp(big), batch_chunk,
                         symbol_values, init_bits)  # [B, T]
  weighted = terms * jnp.real(all_coeffs)[None, :]
  return jnp.stack(
      [jnp.sum(weighted[:, a:b], axis=1) for a, b in slices], axis=1)
