"""Empirical HBM-floor probe: what stream rate can this chip actually hit?

Times (chained-scan discipline, benchmarks/segment_probe.py) trivial
elementwise passes over a 24q-sized float32 plane, plus a hand-tiled
Pallas streaming kernel at several tile sizes, to establish the real
per-pass cost that the circuit primitives should be compared against.

Measured on the v5e chip (round 2): XLA elementwise moves 256MB of
traffic in 0.79-0.83 ms (~320 GB/s effective, spec 819), and the Pallas
streaming kernel is 25% SLOWER at every tile size -- the basis for
retiring VMEM-fusion of big-state passes (docs/design.md section 6).

  python -m benchmarks.hbm_probe [--qubits 24] [--iters 32]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

try:
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
  pl = pltpu = None


def _chain(step, shape, iters):
  @jax.jit
  def run(v):
    x = jnp.zeros(shape, jnp.float32).at[0, 0].set(1.0)

    def body(carry, _):
      x, v = carry
      x = step(v, x)
      p = x.reshape(-1)[0]
      return (x, v + 1e-6 * p), p

    (x, _), ps = jax.lax.scan(body, (x, v), None, length=iters)
    return jnp.sum(ps) + x.reshape(-1)[1]

  return run


def _time(name, run, iters, traffic_gb, repeats=3):
  v = jnp.float32(1.0001)
  float(np.asarray(run(v)))
  best = 1e9
  for r in range(repeats):
    t0 = time.perf_counter()
    float(np.asarray(run(v + 1e-5 * r)))
    best = min(best, (time.perf_counter() - t0) / iters * 1e3)
  rate = traffic_gb / (best / 1e3)
  print(f"[hbm_probe] {name}: {best:.3f} ms -> {rate:.0f} GB/s",
        file=sys.stderr)
  return best, rate


def _pallas_scale(shape, rows_per_tile):
  r, c = shape

  def kernel(v_ref, x_ref, o_ref):
    o_ref[:] = x_ref[:] * v_ref[0]

  spec = pl.BlockSpec((rows_per_tile, c), lambda i: (i, 0),
                      memory_space=pltpu.VMEM)

  @jax.jit
  def f(v, x):
    return pl.pallas_call(
        kernel, grid=(r // rows_per_tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((r, c), jnp.float32),
    )(jnp.reshape(v, (1,)), x)

  return f


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--qubits", type=int, default=24)
  p.add_argument("--iters", type=int, default=32)
  args = p.parse_args()
  shape = (2**(args.qubits - 7), 128)
  traffic = 2 * shape[0] * shape[1] * 4 / 1e9  # read + write, GB
  print(f"[hbm_probe] devices: {jax.devices()}", file=sys.stderr)

  results = {}
  ms, rate = _time("xla_scale", _chain(lambda v, x: x * v, shape,
                                       args.iters), args.iters, traffic)
  results["xla_scale"] = {"ms": round(ms, 3), "gb_per_s": round(rate)}
  if pl is not None and any(d.platform == "tpu" for d in jax.devices()):
    for rpt in (512, 2048, 8192):
      ms, rate = _time(f"pallas_scale_rpt{rpt}",
                       _chain(_pallas_scale(shape, rpt), shape, args.iters),
                       args.iters, traffic)
      results[f"pallas_scale_rpt{rpt}"] = {"ms": round(ms, 3),
                                           "gb_per_s": round(rate)}
  print(json.dumps({"qubits": args.qubits, "traffic_gb": traffic,
                    "results": results}))


if __name__ == "__main__":
  main()
