"""Per-segment timing probe at big-state sizes: where does a 24q apply go?

Times (chained-scan discipline, see fused1q_bench.py) each primitive of the
segment-fused apply in isolation:

  seg1q      one 1q segment (X^a on every qubit)
  diag       one diagonal segment (Z^b on every qubit + brick-wall CZ^c)
  block7     one [128,128] row-block matmul pass over the state
  minor      one [C,C] minor matmul pass
  phase      diag phase-angle build + complex multiply only

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


def _chain(step, n, iters):
  @jax.jit
  def run(values):
    state = sv.basis_state(n, jnp.zeros([n], jnp.int8))

    def body(carry, _):
      state, vals = carry
      state = step(vals, state)
      probe = jnp.real(state.reshape(-1)[0])
      return (state, vals + 1e-6 * probe), probe

    (state, _), probes = jax.lax.scan(body, (state, values), None,
                                      length=iters)
    return jnp.sum(probes) + jnp.real(state.reshape(-1)[1])

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

  # primitive passes
  rng = np.random.RandomState(1)
  u128 = jnp.asarray(np.linalg.qr(rng.randn(128, 128) +
                                  1j * rng.randn(128, 128))[0],
                     sv.COMPLEX_DTYPE)

  def block7(vals, state):
    mat = u128 * jnp.exp(1j * vals[0].astype(sv.COMPLEX_DTYPE))
    return sv.apply_row_block(mat, 0, 7, state)

  def minor(vals, state):
    mat = u128 * jnp.exp(1j * vals[0].astype(sv.COMPLEX_DTYPE))
    return jnp.matmul(state, mat.T, precision=sv.matmul_precision())

  def phase(vals, state):
    total = sv.diag_segment_phase(diag.gates, list(vals), state.shape)
    return state * jnp.exp(1j * total.astype(sv.COMPLEX_DTYPE))

  vals1 = jnp.asarray([0.3], jnp.float32)
  valsd = jnp.asarray(
      np.random.RandomState(2).uniform(-1, 1, diag.num_symbols), jnp.float32)
  results["block7"] = _time("block7", _chain(block7, n, args.iters), vals1,
                            args.iters)
  results["minor"] = _time("minor", _chain(minor, n, args.iters), vals1,
                           args.iters)
  results["phase"] = _time("phase", _chain(phase, n, args.iters), valsd,
                           args.iters)
  print(json.dumps({"qubits": n, "ms": {k: round(v, 3)
                                        for k, v in results.items()}}))


if __name__ == "__main__":
  main()
