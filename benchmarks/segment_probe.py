"""Per-segment timing probe at big-state sizes: where does a 24q apply go?

Times (chained-scan discipline, see fused1q_bench.py) each primitive of the
segment-fused apply in isolation:

  seg1q        one 1q segment (X^a on every qubit)
  diag         one diagonal segment (Z^b on every qubit + brick-wall CZ^c)
  block7       one [128,128] row-block matmul pass over the state
  block7_mid   the same block applied at start=7 (non-leading position)
  minor        one [C,C] minor matmul pass
  phase        diag phase-angle build + complex multiply only
  block7_pl    block7 with PLANAR state (two float32 arrays, 4 real dots)
  minor_pl     minor with planar state
  phase_pl     phase rotation with planar state (cos/sin + 4 multiplies)

The planar variants measure how much of the complex-path cost is the
interleaved-complex64 relayout XLA inserts around every MXU contraction.
All complex constants stay under jit (eager complex ops poison the axon
tunnel -- .claude/skills/verify/SKILL.md).

  python -m benchmarks.segment_probe [--qubits 24] [--iters 8]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from qhbmlib_tpu.ops import circuit_ir as ir
from qhbmlib_tpu.ops import statevector as sv


def _chain(step, n, iters, planar=False):
  @jax.jit
  def run(values):
    state = sv.basis_state(n, jnp.zeros([n], jnp.int8))
    if planar:
      state = (jnp.real(state), jnp.imag(state))
      if planar == "bf16":
        state = (state[0].astype(jnp.bfloat16), state[1].astype(jnp.bfloat16))

    def body(carry, _):
      state, vals = carry
      state = step(vals, state)
      first = state[0] if planar else state
      probe = jnp.real(first.reshape(-1)[0]).astype(jnp.float32)
      return (state, vals + 1e-6 * probe), probe

    (state, _), probes = jax.lax.scan(body, (state, values), None,
                                      length=iters)
    first = state[0] if planar else state
    return jnp.sum(probes) + jnp.real(first.reshape(-1)[1])

  return run


def _time(name, run, values, iters, repeats=3):
  float(np.asarray(run(values)))
  times = []
  for r in range(repeats):
    t0 = time.perf_counter()
    float(np.asarray(run(values + 1e-5 * (r + 1))))
    times.append((time.perf_counter() - t0) / iters * 1e3)
  best = min(times)
  print(f"[segment_probe] {name}: {best:.3f} ms "
        f"(all: {[round(t, 3) for t in times]})", file=sys.stderr)
  return best


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--qubits", type=int, default=24)
  p.add_argument("--iters", type=int, default=8)
  args = p.parse_args()
  n = args.qubits
  print(f"[segment_probe] devices: {jax.devices()}", file=sys.stderr)

  b = ir.CircuitBuilder(n)
  for q in range(n):
    b.xp(q, f"x_{q}")
  seg1q = b.build()

  b = ir.CircuitBuilder(n)
  for q in range(n):
    b.zp(q, f"z_{q}")
  for q in range(0, n - 1, 2):
    b.cz(q, q + 1, f"ce_{q}")
  for q in range(1, n - 1, 2):
    b.cz(q, q + 1, f"co_{q}")
  diag = b.build()

  results = {}
  for name, pqc in (("seg1q", seg1q), ("diag", diag)):
    def step(vals, state, pqc=pqc):
      return sv._apply_circuit_jax(pqc, vals, None, True, state)
    run = _chain(step, n, args.iters)
    values = jnp.asarray(
        np.random.RandomState(0).uniform(-1, 1, pqc.num_symbols),
        jnp.float32)
    results[name] = _time(name, run, values, args.iters)

  # primitive passes.  Keep every complex constant as NUMPY here; it enters
  # the graph as a jit-time constant (eager complex jnp ops poison the
  # tunnel).
  rng = np.random.RandomState(1)
  u128_np = np.linalg.qr(rng.randn(128, 128) +
                         1j * rng.randn(128, 128))[0]
  u128_re = jnp.asarray(u128_np.real, jnp.float32)
  u128_im = jnp.asarray(u128_np.imag, jnp.float32)

  def _u128(vals):
    mat = jnp.asarray(u128_np, sv.COMPLEX_DTYPE)
    return mat * jnp.exp(1j * vals[0].astype(sv.COMPLEX_DTYPE))

  def block7(vals, state):
    return sv.apply_row_block(_u128(vals), 0, 7, state)

  def block7_mid(vals, state):
    return sv.apply_row_block(_u128(vals), 7, 7, state)

  def minor(vals, state):
    return jnp.matmul(state, _u128(vals).T, precision=sv.matmul_precision())

  def phase(vals, state):
    total = sv.diag_segment_phase(diag.gates, list(vals), state.shape)
    return state * jnp.exp(1j * total.astype(sv.COMPLEX_DTYPE))

  # planar variants: state as (re, im) float32 pair, explicit 4-real-dot
  # complex arithmetic -- what a planar engine layout would run.
  prec = sv.matmul_precision()

  def _rot(vals):
    c = jnp.cos(vals[0])
    s = jnp.sin(vals[0])
    return u128_re * c - u128_im * s, u128_re * s + u128_im * c

  def block7_pl(vals, state):
    re, im = state
    r, c = re.shape
    m_re, m_im = _rot(vals)
    fr = re.reshape(128, -1)
    fi = im.reshape(128, -1)
    prog = "MN,Nb->Mb"
    o_re = (jnp.einsum(prog, m_re, fr, precision=prec) -
            jnp.einsum(prog, m_im, fi, precision=prec))
    o_im = (jnp.einsum(prog, m_re, fi, precision=prec) +
            jnp.einsum(prog, m_im, fr, precision=prec))
    return o_re.reshape(r, c), o_im.reshape(r, c)

  def minor_pl(vals, state):
    re, im = state
    m_re, m_im = _rot(vals)
    o_re = (jnp.matmul(re, m_re.T, precision=prec) -
            jnp.matmul(im, m_im.T, precision=prec))
    o_im = (jnp.matmul(re, m_im.T, precision=prec) +
            jnp.matmul(im, m_re.T, precision=prec))
    return o_re, o_im

  def phase_pl(vals, state):
    re, im = state
    total = sv.diag_segment_phase(diag.gates, list(vals), re.shape)
    c = jnp.cos(total)
    s = jnp.sin(total)
    return re * c - im * s, re * s + im * c

  # Full-1q-SEGMENT variants (round 3): the planar-vs-complex decision
  # cannot be made from isolated primitives -- XLA fuses across a
  # segment's block chain (seg1q measures 3.3 ms where its isolated
  # primitives sum to 7).  Both variants below run the segment's exact
  # pass structure (every row block from sv._row_blocks + one minor
  # matmul) with angle-parameterized unitaries, complex vs planar.
  blocks = sv._row_blocks(n - 7)
  blk_np = {}
  for _, k in blocks:
    if k not in blk_np:
      blk_np[k] = np.linalg.qr(rng.randn(2**k, 2**k) +
                               1j * rng.randn(2**k, 2**k))[0]

  def seg_comp(vals, state):
    ph = jnp.exp(1j * vals[0].astype(sv.COMPLEX_DTYPE))
    for start, k in blocks:
      mat = jnp.asarray(blk_np[k], sv.COMPLEX_DTYPE) * ph
      state = sv.apply_row_block(mat, start, k, state)
    return jnp.matmul(state, (_u128(vals)).T, precision=prec)

  def _rot_np(mat_np, vals):
    c = jnp.cos(vals[0])
    s = jnp.sin(vals[0])
    mre = jnp.asarray(mat_np.real, jnp.float32)
    mim = jnp.asarray(mat_np.imag, jnp.float32)
    return mre * c - mim * s, mre * s + mim * c

  def seg_pl(vals, state):
    re, im = state
    rr, cc = re.shape

    def block(re, im, mre, mim, start, k):
      vr = re.reshape(2**start, 2**k, -1)
      vi = im.reshape(2**start, 2**k, -1)
      prog = "MN,aNb->aMb"
      o_re = (jnp.einsum(prog, mre, vr, precision=prec) -
              jnp.einsum(prog, mim, vi, precision=prec))
      o_im = (jnp.einsum(prog, mre, vi, precision=prec) +
              jnp.einsum(prog, mim, vr, precision=prec))
      return o_re.reshape(rr, cc), o_im.reshape(rr, cc)

    for start, k in blocks:
      mre, mim = _rot_np(blk_np[k], vals)
      re, im = block(re, im, mre, mim, start, k)
    m_re, m_im = _rot(vals)
    o_re = (jnp.matmul(re, m_re.T, precision=prec) -
            jnp.matmul(im, m_im.T, precision=prec))
    o_im = (jnp.matmul(re, m_im.T, precision=prec) +
            jnp.matmul(im, m_re.T, precision=prec))
    return o_re, o_im

  def seg_hybrid(vals, state):
    # Planar COMPUTE on complex STORAGE: each block extracts (re, im),
    # does the 4 real dots, and recombines with lax.complex.  If XLA
    # cancels real(complex(a,b))->a between chained blocks, this matches
    # seg_pl's speed while keeping the engine's complex state layout --
    # a local change to apply_row_block instead of a storage refactor.
    def block(mat_np, start, k, state):
      rr, cc = state.shape
      re = jnp.real(state).reshape(2**start, 2**k, -1)
      im = jnp.imag(state).reshape(2**start, 2**k, -1)
      mre, mim = _rot_np(mat_np, vals)
      prog = "MN,aNb->aMb"
      o_re = (jnp.einsum(prog, mre, re, precision=prec) -
              jnp.einsum(prog, mim, im, precision=prec))
      o_im = (jnp.einsum(prog, mre, im, precision=prec) +
              jnp.einsum(prog, mim, re, precision=prec))
      return jax.lax.complex(o_re, o_im).reshape(rr, cc)

    for start, k in blocks:
      state = block(blk_np[k], start, k, state)
    re = jnp.real(state)
    im = jnp.imag(state)
    m_re, m_im = _rot(vals)
    o_re = (jnp.matmul(re, m_re.T, precision=prec) -
            jnp.matmul(im, m_im.T, precision=prec))
    o_im = (jnp.matmul(re, m_im.T, precision=prec) +
            jnp.matmul(im, m_re.T, precision=prec))
    return jax.lax.complex(o_re, o_im)

  def seg_pl_bf16(vals, state):
    # bf16-STORAGE planar planes: half the streamed bytes per pass, fed
    # to the MXU natively (f32 accumulation via preferred_element_type,
    # outputs cast back to bf16 storage).  The opt-in "sampled-training"
    # engine candidate from design.md section 6.
    re, im = state
    rr, cc = re.shape

    def block(re, im, mre, mim, start, k):
      vr = re.reshape(2**start, 2**k, -1)
      vi = im.reshape(2**start, 2**k, -1)
      prog = "MN,aNb->aMb"
      kw = dict(preferred_element_type=jnp.float32)
      o_re = (jnp.einsum(prog, mre, vr, **kw) -
              jnp.einsum(prog, mim, vi, **kw))
      o_im = (jnp.einsum(prog, mre, vi, **kw) +
              jnp.einsum(prog, mim, vr, **kw))
      return (o_re.reshape(rr, cc).astype(jnp.bfloat16),
              o_im.reshape(rr, cc).astype(jnp.bfloat16))

    for start, k in blocks:
      mre, mim = _rot_np(blk_np[k], vals)
      re, im = block(re, im, mre.astype(jnp.bfloat16),
                     mim.astype(jnp.bfloat16), start, k)
    m_re, m_im = _rot(vals)
    m_re = m_re.astype(jnp.bfloat16)
    m_im = m_im.astype(jnp.bfloat16)
    kw = dict(preferred_element_type=jnp.float32)
    o_re = jnp.matmul(re, m_re.T, **kw) - jnp.matmul(im, m_im.T, **kw)
    o_im = jnp.matmul(re, m_im.T, **kw) + jnp.matmul(im, m_re.T, **kw)
    return o_re.astype(jnp.bfloat16), o_im.astype(jnp.bfloat16)

  vals1 = jnp.asarray([0.3], jnp.float32)
  valsd = jnp.asarray(
      np.random.RandomState(2).uniform(-1, 1, diag.num_symbols), jnp.float32)
  for name, fn, vals, planar in (
      ("block7", block7, vals1, False),
      ("block7_mid", block7_mid, vals1, False),
      ("minor", minor, vals1, False),
      ("phase", phase, valsd, False),
      ("block7_pl", block7_pl, vals1, True),
      ("minor_pl", minor_pl, vals1, True),
      ("phase_pl", phase_pl, valsd, True),
      ("seg_comp", seg_comp, vals1, False),
      ("seg_pl", seg_pl, vals1, True),
      ("seg_hybrid", seg_hybrid, vals1, False),
      ("seg_pl_bf16", seg_pl_bf16, vals1, "bf16"),
  ):
    results[name] = _time(name, _chain(fn, n, args.iters, planar=planar),
                          vals, args.iters)
  print(json.dumps({"qubits": n, "ms": {k: round(v, 3)
                                        for k, v in results.items()}}))


if __name__ == "__main__":
  main()
