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


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--qubits", type=int, default=20)
  p.add_argument("--layers", type=int, default=4)
  p.add_argument("--iters", type=int, default=16)
  p.add_argument("--variants", default="xla,pallas")
  args = p.parse_args()

  n = args.qubits
  pqc = circuit_utils.hardware_efficient_ansatz(n, args.layers)
  print(f"[pallas_bench] devices: {jax.devices()}", file=sys.stderr)
  results = {}
  for variant in args.variants.split(","):
    if variant == "xla":
      fn = lambda c, v, s: sv._apply_circuit_jax(c, v, None, True, s)
    elif variant == "pallas":
      if not pallas_sv.supported(pqc):
        print("[pallas_bench] pallas unsupported here", file=sys.stderr)
        continue
      fn = pallas_sv.apply_circuit_pallas
    else:
      raise ValueError(variant)
    results[variant] = time_variant(variant, fn, pqc, n, args.iters)
  print(json.dumps({"qubits": n, "layers": args.layers,
                    "ms_per_apply": results}))


if __name__ == "__main__":
  main()
