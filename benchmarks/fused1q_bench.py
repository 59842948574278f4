"""A/B microbenchmark: QHBM_FUSED_1Q streamed Pallas segment kernel vs the
plain block-matmul XLA path, at big-state sizes (24q default).

The fused kernel (ops/pallas_sv.py fused_blocks_minor_apply) folds the first
two row-block matmuls + the minor matmul of a 1q segment into ONE HBM pass
over the state; at 24q the plain path pays 4 passes per segment.

Both variants are traced in ONE process (the env flag is read at trace
time), alternated 3x, minima compared -- per the verify-skill timing
discipline (tunnel caches identical dispatches; run-to-run timings bimodal).

  python -m benchmarks.fused1q_bench [--qubits 24] [--layers 4] [--iters 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from qhbmlib_tpu.models import circuit_utils
from qhbmlib_tpu.ops import statevector as sv


def build_apply(pqc, n, iters):
  @jax.jit
  def run(values):
    state = sv.basis_state(n, jnp.zeros([n], jnp.int8))

    def body(carry, _):
      state, vals = carry
      state = sv._apply_circuit_jax(pqc, vals, None, True, state)
      probe = jnp.real(state.reshape(-1)[0])
      return (state, vals + 1e-6 * probe), probe

    (state, _), probes = jax.lax.scan(body, (state, values), None,
                                      length=iters)
    return jnp.sum(probes) + jnp.real(state.reshape(-1)[1])

  return run


def build_grad(pqc, n, iters):
  from qhbmlib_tpu.ops import paulis
  terms = [(-1.0, {q: "X"}) for q in range(n)]
  terms += [(-1.0, {q: "Z", q + 1: "Z"}) for q in range(n - 1)]
  op = paulis.pauli_sum_from_strings(n, terms)

  @jax.jit
  def run(values):
    def body(vals, _):
      def f(v):
        psi = sv._apply_circuit_jax(pqc, v, None, True,
                                    sv.basis_state(n, jnp.zeros([n],
                                                                jnp.int8)))
        return jnp.sum(sv.expectation_terms(psi, op) * jnp.real(op.coeffs))
      grad = jax.grad(f)(vals)
      return vals + 1e-6 * grad, grad[0]

    vals, probes = jax.lax.scan(body, values, None, length=iters)
    return jnp.sum(probes) + vals[0]

  return run


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--qubits", type=int, default=24)
  p.add_argument("--layers", type=int, default=4)
  p.add_argument("--iters", type=int, default=8)
  p.add_argument("--mode", default="apply", choices=["apply", "grad"])
  args = p.parse_args()
  n = args.qubits
  pqc = circuit_utils.hardware_efficient_ansatz(n, args.layers)
  build = build_apply if args.mode == "apply" else build_grad
  print(f"[fused1q] devices: {jax.devices()}", file=sys.stderr)

  values = jnp.asarray(
      np.random.RandomState(0).uniform(-1, 1, pqc.num_symbols), jnp.float32)
  # QHBM_FUSED_1Q is read at TRACE time (statevector._fused_1q_enabled), and
  # jax.jit traces lazily on the FIRST CALL -- so each variant must be
  # compiled+warmed while its flag value is still set, or both variants
  # silently trace the same path and the A/B is a guaranteed wash.
  os.environ["QHBM_FUSED_1Q"] = "0"
  run_plain = build(pqc, n, args.iters)
  float(np.asarray(run_plain(values)))  # trace + warm with flag OFF
  os.environ["QHBM_FUSED_1Q"] = "1"
  run_fused = build(pqc, n, args.iters)
  float(np.asarray(run_fused(values)))  # trace + warm with flag ON
  os.environ["QHBM_FUSED_1Q"] = "0"

  results = {"plain": [], "fused": []}
  for r in range(3):
    for name, run in (("plain", run_plain), ("fused", run_fused)):
      v = values + 1e-5 * (r + 1)
      t0 = time.perf_counter()
      float(np.asarray(run(v)))
      results[name].append((time.perf_counter() - t0) / args.iters * 1e3)
  out = {k: round(min(v), 3) for k, v in results.items()}
  print(f"[fused1q] {args.mode} {n}q/{args.layers}L: plain "
        f"{results['plain']} fused {results['fused']}", file=sys.stderr)
  print(json.dumps({"qubits": n, "mode": args.mode, "ms_best": out}))


if __name__ == "__main__":
  main()
