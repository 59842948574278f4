#!/usr/bin/env python
"""A/B benchmark: grid-over-batch Pallas kernels vs the production XLA path.

Measures the QNN gradient core of the 20q headline train step -- a
value_and_grad through `adjoint.batched_expectations` at 20 qubits,
4 ansatz layers, B=64 basis states (the unique-bitstring batch of
bench.py's 20q workload) -- as K dependent iterations chained inside ONE
jitted lax.scan (the tunnel caches identical dispatches; see
.claude/skills/verify/SKILL.md).

One process measures ONE variant (env is read at trace time):
    python benchmarks/batched_bench.py              # XLA production path
    QHBM_PALLAS_BATCHED=1 python benchmarks/batched_bench.py
    QHBM_PALLAS=1 python benchmarks/batched_bench.py  # per-state kernels

Take the MINIMUM over 3+ runs per variant (timings are bimodal).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks import _cache

_cache.enable_if_accelerator()

from qhbmlib_tpu.models import circuit_utils
from qhbmlib_tpu.ops import adjoint, paulis

N = int(os.environ.get("QHBM_BENCH_QUBITS", "20"))
LAYERS = int(os.environ.get("QHBM_BENCH_LAYERS", "4"))
B = int(os.environ.get("QHBM_BENCH_BATCH", "64"))
K = int(os.environ.get("QHBM_BENCH_ITERS", "16"))


def main():
  variant = ("pallas_batched" if os.environ.get("QHBM_PALLAS_BATCHED") == "1"
             else "pallas_per_state" if os.environ.get("QHBM_PALLAS") == "1"
             else "xla")
  pqc = circuit_utils.hardware_efficient_ansatz(N, LAYERS)
  rng = np.random.RandomState(0)
  values0 = jnp.asarray(rng.uniform(-1, 1, pqc.num_symbols), jnp.float32)
  bits = jnp.asarray(rng.randint(0, 2, (B, N)), jnp.int8)
  terms = [(-1.0, {q: "Z", (q + 1) % N: "Z"}) for q in range(N - 1)]
  terms += [(-1.0, {q: "X"}) for q in range(N)]
  op = paulis.pauli_sum_from_strings(N, terms)
  w = jnp.asarray(rng.uniform(0.0, 1.0, B), jnp.float32)
  w = w / jnp.sum(w)

  def loss(v):
    e = adjoint.batched_expectations(pqc, v, bits, (op,))
    return jnp.sum(w * e[:, 0])

  @jax.jit
  def chained(v0):
    def body(v, _):
      val, grad = jax.value_and_grad(loss)(v)
      return v - 1e-4 * grad, val

    return jax.lax.scan(body, v0, None, length=K)

  t0 = time.time()
  vK, vals = chained(values0)
  first = float(np.asarray(vals)[-1])
  print(f"[{variant}] compile+first: {time.time() - t0:.1f}s "
        f"loss={first:.6f}", file=sys.stderr)
  times = []
  v = vK
  for _ in range(3):
    t0 = time.time()
    v, vals = chained(v)
    float(np.asarray(vals)[-1])  # sync
    times.append((time.time() - t0) / K)
  per_iter = min(times)
  print(f"[{variant}] n={N} L={LAYERS} B={B}: {per_iter * 1e3:.2f} ms/iter "
        f"({per_iter * 1e3 / B:.3f} ms/state) "
        f"loss={float(np.asarray(vals)[-1]):.6f}")


if __name__ == "__main__":
  main()
