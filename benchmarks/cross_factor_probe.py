#!/usr/bin/env python
"""Crossover point for the factored diag phasor's CROSS factors (ADVICE r4).

Each cross factor (a parity triple touching both row and column qubits)
costs one [R, C] sign build + one complex multiply into the accumulated
phasor (`apply_diag_segment_phasor`), while the materialized path pays one
parity-sign outer-sum matmul per factor plus ONE [R, C] complex exp for
the whole segment.  `_CROSS_MAX` caps how many cross factors the factored
form accepts before falling back; it was a heuristic (8) -- this probe
measures the per-apply time of both paths at K = 1..16 cross factors on
the real accelerator and prints the measured crossover.

Synthetic segment: K ZZP bonds, each straddling the row/column boundary
(qubit pairs (nr-1-j, nr+j)), applied to a 2^n state via chained scans
(tunnel-safe timing: dependent iterations inside one jit, host-transfer
sync, perturbed repeats).

Usage: python benchmarks/cross_factor_probe.py [--qubits 22] [--iters 16]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks import _cache  # noqa: E402

_cache.enable_if_accelerator()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from qhbmlib_tpu.ops import circuit_ir as ir  # noqa: E402
from qhbmlib_tpu.ops import statevector as sv  # noqa: E402


def cross_segment(n, k_cross):
  """K ZZP bonds straddling the row/col boundary + a ZP per row qubit (so
  the segment also has a plain row-phase part, like real workloads)."""
  m = min(n, 7)
  nr = n - m
  assert k_cross <= min(nr, m), (k_cross, nr, m)
  b = ir.CircuitBuilder(n)
  b.zp(0, "z0")
  for j in range(k_cross):
    b.add(ir.ZZP, [nr - 1 - j, nr + j], f"c{j}")
  return b.build()


def time_apply(circuit, n, iters, variant):
  os.environ["QHBM_DIAG_PHASOR"] = variant
  values = jnp.asarray(
      np.random.RandomState(0).uniform(0, 2, circuit.num_symbols),
      jnp.float32)

  @jax.jit
  def run(v):
    def body(state, _):
      state = sv.apply_circuit(circuit, v, state)
      # Tiny data dependence back into the angles is NOT possible without
      # retracing; instead chain through the state (each apply's input is
      # the previous output -- already dependent).
      return state, jnp.real(state.reshape(-1)[0])
    state0 = sv.basis_state(n, jnp.zeros([n], jnp.int8))
    _, probes = jax.lax.scan(body, state0, None, length=iters)
    return probes

  float(np.asarray(run(values))[-1])  # compile + real first run
  best = float("inf")
  for r in range(3):
    v_r = values + 1e-6 * (r + 1)  # distinct args: tunnel caches dispatches
    t0 = time.perf_counter()
    float(np.asarray(run(v_r))[-1])
    best = min(best, time.perf_counter() - t0)
  return best / iters * 1e3


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--qubits", type=int, default=22)
  ap.add_argument("--iters", type=int, default=16)
  ap.add_argument("--out", default=os.path.join(
      os.path.dirname(os.path.abspath(__file__)), "cross_factor.json"))
  args = ap.parse_args()
  n = args.qubits
  rows = []
  for k in (1, 2, 3, 4, 5, 6):
    circuit = cross_segment(n, k)
    fac = time_apply(circuit, n, args.iters, "auto")
    mat = time_apply(circuit, n, args.iters, "materialize")
    rows.append({"k_cross": k, "factored_ms": round(fac, 3),
                 "materialized_ms": round(mat, 3)})
    print(f"k={k}: factored {fac:.3f} ms vs materialized {mat:.3f} ms",
          file=sys.stderr, flush=True)
  crossover = next((r["k_cross"] for r in rows
                    if r["factored_ms"] > r["materialized_ms"]), None)
  out = {"qubits": n, "rows": rows, "first_k_where_materialized_wins":
         crossover}
  with open(args.out, "w") as f:
    json.dump(out, f, indent=1)
  print(json.dumps(out))


if __name__ == "__main__":
  main()
