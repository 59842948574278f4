#!/usr/bin/env python
"""XLA cost-analysis roofline check for the headline train step.

Lowers/compiles the EXACT bench.py 24q train step and reports the
compiled executable's cost analysis (flops, bytes accessed), then pairs
it with a fresh wall-clock measurement to place the step on the
(HBM-bandwidth x compute) roofline:

  effective GB/s  = bytes_accessed / step_time
  effective TFLOPs = flops / step_time

Against the machine's measured ceilings (round-3 stream probe: ~650 GB/s
on this v5e tunnel; bf16 MXU peak ~197 TFLOPs) this says whether the
remaining headline gap is bandwidth, compute, or neither (serialization/
dispatch).  Prints one JSON line; run ad hoc.
"""

import json
import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks import _cache  # noqa: E402

_cache.enable_if_accelerator()

import jax  # noqa: E402

import bench  # noqa: E402


def main():
  cfg = dict(bench.WORKLOADS["24q"])
  train_step, params, opt_state = bench.build_train_step(cfg)
  key = jax.random.PRNGKey(7)

  t0 = time.perf_counter()
  compiled = train_step.lower(params, opt_state, key).compile()
  compile_s = time.perf_counter() - t0
  cost = compiled.cost_analysis()
  if isinstance(cost, list):
    cost = cost[0] if cost else {}
  flops = float(cost.get("flops", 0.0))
  byt = float(cost.get("bytes accessed", 0.0))
  out = {
      "compile_s": round(compile_s, 1),
      "flops": flops,
      "bytes_accessed": byt,
  }
  for k, v in sorted(cost.items()):
    if k.startswith("bytes accessed") and k != "bytes accessed":
      out.setdefault("bytes_detail", {})[k] = float(v)

  # wall-clock the compiled step (donation semantics differ from the jit
  # path, so re-time via the jit wrapper like bench does)
  r = train_step(params, opt_state, key)
  jax.block_until_ready(r)
  t0 = time.perf_counter()
  reps = 8
  for _ in range(reps):
    loss, grads, p2, o2 = train_step(params, opt_state, key)
  jax.block_until_ready(loss)
  step_s = (time.perf_counter() - t0) / reps
  out["step_ms"] = round(step_s * 1e3, 2)
  out["effective_GBps"] = round(byt / step_s / 1e9, 1)
  out["effective_TFLOPs"] = round(flops / step_s / 1e12, 2)
  out["devices"] = [str(d) for d in jax.devices()]
  print(json.dumps(out))


if __name__ == "__main__":
  main()
