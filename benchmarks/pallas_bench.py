"""Microbenchmark: whole-circuit apply, XLA segment-fused vs Pallas kernel.

Timing discipline per .claude/skills/verify/SKILL.md: K dependent iterations
chained inside ONE jitted lax.scan (the tunnel caches identical dispatches),
synced with a host transfer, repeated in-process; compare MINIMA across
process runs.

  python -m benchmarks.pallas_bench [--qubits 20] [--layers 4] [--iters 16]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from qhbmlib_tpu.models import circuit_utils
from qhbmlib_tpu.ops import pallas_sv, statevector as sv


def chained_apply(apply_fn, pqc, n, iters):
  """One jitted program: `iters` dependent applies (values perturbed from the
  previous output so no two dispatches are identical)."""

  @jax.jit
  def run(values):
    state = sv.basis_state(n, jnp.zeros([n], jnp.int8))

    def body(carry, _):
      state, vals = carry
      state = apply_fn(pqc, vals, state)
      probe = jnp.real(state.reshape(-1)[0])
      return (state, vals + 1e-6 * probe), probe

    (state, _), probes = jax.lax.scan(body, (state, values), None,
                                      length=iters)
    return jnp.sum(probes) + jnp.real(state.reshape(-1)[1])

  return run


def time_variant(name, apply_fn, pqc, n, iters, repeats=3):
  run = chained_apply(apply_fn, pqc, n, iters)
  values = jnp.asarray(
      np.random.RandomState(0).uniform(-1, 1, pqc.num_symbols), jnp.float32)
  out = run(values)  # compile + warm
  float(np.asarray(out))
  times = []
  for r in range(repeats):
    v = values + 1e-5 * r
    t0 = time.perf_counter()
    out = run(v)
    float(np.asarray(out))  # sync
    times.append((time.perf_counter() - t0) / iters * 1e3)
  best = min(times)
  print(f"[pallas_bench] {name}: {best:.3f} ms/apply "
        f"(all: {[round(t, 3) for t in times]})", file=sys.stderr)
  return best


def _tfim_op(n):
  from qhbmlib_tpu.ops import paulis
  terms = [(-1.0, {q: "X"}) for q in range(n)]
  terms += [(-1.0, {q: "Z", q + 1: "Z"}) for q in range(n - 1)]
  return paulis.pauli_sum_from_strings(n, terms)


def chained_grad(variant, pqc, n, iters):
  """Full fwd+bwd gradient of <psi|H|psi>, chained across iterations."""
  from qhbmlib_tpu.ops import adjoint, pallas_adjoint, paulis
  op = _tfim_op(n)
  ones_op = paulis.PauliSum(op.codes, jnp.ones_like(op.coeffs),
                            op.num_qubits)

  @jax.jit
  def run(values):
    def body(vals, _):
      if variant == "xla_grad":
        def f(v):
          psi = sv._apply_circuit_jax(pqc, v, None, True,
                                      sv.basis_state(n,
                                                     jnp.zeros([n],
                                                               jnp.int8)))
          return jnp.sum(sv.expectation_terms(psi, op) * jnp.real(op.coeffs))
        grad = jax.grad(f)(vals)
      else:  # pallas_grad: pallas fwd + pallas reverse sweep
        psi = pallas_sv.apply_circuit_pallas(
            pqc, vals, sv.basis_state(n, jnp.zeros([n], jnp.int8)))
        g = jnp.real(op.coeffs)
        lam = sv.apply_pauli_sum(psi, ones_op, term_weights=g)
        grad = pallas_adjoint.adjoint_sweep(pqc, vals, psi, lam)
      return vals + 1e-6 * grad, grad[0]

    vals, probes = jax.lax.scan(body, values, None, length=iters)
    return jnp.sum(probes) + vals[0]

  return run


def time_grad_variant(name, variant, pqc, n, iters, repeats=3):
  run = chained_grad(variant, pqc, n, iters)
  values = jnp.asarray(
      np.random.RandomState(0).uniform(-1, 1, pqc.num_symbols), jnp.float32)
  float(np.asarray(run(values)))  # compile + warm
  times = []
  for r in range(repeats):
    v = values + 1e-5 * r
    t0 = time.perf_counter()
    float(np.asarray(run(v)))
    times.append((time.perf_counter() - t0) / iters * 1e3)
  best = min(times)
  print(f"[pallas_bench] {name}: {best:.3f} ms/grad "
        f"(all: {[round(t, 3) for t in times]})", file=sys.stderr)
  return best


def chained_batch_grad(variant, pqc, n, iters, batch):
  """Production-shaped gradient: B basis states sharing ONE parameter set
  (the train step's unique-state batch), full fwd+bwd per iteration."""
  from qhbmlib_tpu.ops import adjoint, pallas_adjoint, pallas_sv as psv
  from qhbmlib_tpu.ops import paulis
  op = _tfim_op(n)
  ones_op = paulis.PauliSum(op.codes, jnp.ones_like(op.coeffs),
                            op.num_qubits)
  bits = jnp.asarray(
      np.random.RandomState(1).randint(0, 2, (batch, n)), jnp.int8)

  @jax.jit
  def run(values):
    def body(vals, _):
      if variant == "xla_grad_batch":
        def f(v):
          return jnp.sum(adjoint.batched_expectations(pqc, v, bits, (op,)))
        grad = jax.grad(f)(vals)
      else:  # pallas_grad_batch

        def per_state(b):
          psi = psv.apply_circuit_pallas(pqc, vals, sv.basis_state(n, b))
          lam = sv.apply_pauli_sum(psi, ones_op,
                                   term_weights=jnp.real(op.coeffs))
          return pallas_adjoint.adjoint_sweep(pqc, vals, psi, lam)

        grad = jnp.sum(jax.vmap(per_state)(bits), axis=0)
      return vals + 1e-6 * grad, grad[0]

    vals, probes = jax.lax.scan(body, values, None, length=iters)
    return jnp.sum(probes) + vals[0]

  return run


def time_batch_grad(name, variant, pqc, n, iters, batch, repeats=3):
  run = chained_batch_grad(variant, pqc, n, iters, batch)
  values = jnp.asarray(
      np.random.RandomState(0).uniform(-1, 1, pqc.num_symbols), jnp.float32)
  float(np.asarray(run(values)))  # compile + warm
  times = []
  for r in range(repeats):
    v = values + 1e-5 * r
    t0 = time.perf_counter()
    float(np.asarray(run(v)))
    times.append((time.perf_counter() - t0) / iters * 1e3)
  best = min(times)
  print(f"[pallas_bench] {name} (B={batch}): {best:.3f} ms/iter "
        f"({best / batch:.3f} ms/state) "
        f"(all: {[round(t, 3) for t in times]})", file=sys.stderr)
  return best


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--qubits", type=int, default=20)
  p.add_argument("--layers", type=int, default=4)
  p.add_argument("--iters", type=int, default=16)
  p.add_argument("--batch", type=int, default=8)
  p.add_argument("--variants", default="xla,pallas,xla_grad,pallas_grad")
  args = p.parse_args()

  n = args.qubits
  pqc = circuit_utils.hardware_efficient_ansatz(n, args.layers)
  print(f"[pallas_bench] devices: {jax.devices()}", file=sys.stderr)
  results = {}
  for variant in args.variants.split(","):
    if variant == "xla":
      fn = lambda c, v, s: sv._apply_circuit_jax(c, v, None, True, s)
      results[variant] = time_variant(variant, fn, pqc, n, args.iters)
    elif variant == "pallas":
      if not pallas_sv.supported(pqc):
        print("[pallas_bench] pallas unsupported here", file=sys.stderr)
        continue
      fn = pallas_sv.apply_circuit_pallas
      results[variant] = time_variant(variant, fn, pqc, n, args.iters)
    elif variant in ("xla_grad", "pallas_grad"):
      from qhbmlib_tpu.ops import pallas_adjoint
      if variant == "pallas_grad" and not pallas_adjoint.supported(pqc):
        print("[pallas_bench] pallas adjoint unsupported here",
              file=sys.stderr)
        continue
      results[variant] = time_grad_variant(variant, variant, pqc, n,
                                           args.iters)
    elif variant in ("xla_grad_batch", "pallas_grad_batch"):
      from qhbmlib_tpu.ops import pallas_adjoint
      if (variant == "pallas_grad_batch" and
          not pallas_adjoint.supported(pqc)):
        print("[pallas_bench] pallas adjoint unsupported here",
              file=sys.stderr)
        continue
      results[variant] = time_batch_grad(variant, variant, pqc, n,
                                         args.iters, args.batch)
    else:
      raise ValueError(variant)
  print(json.dumps({"qubits": n, "layers": args.layers,
                    "ms_per_op": results}))


if __name__ == "__main__":
  main()
