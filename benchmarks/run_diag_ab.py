#!/usr/bin/env python
"""Hardware A/B: factored diag phasor vs materialized [R,C] phase, full
24q headline train step (bench.py workload).

Runs each variant in its own process (QHBM_DIAG_PHASOR is read at trace
time), REPEATS times each, alternating variants to decorrelate tunnel-
latency drift, and reports per-variant MAXIMUM (best) steps/s.  Writes
benchmarks/diag_ab.json.

Usage:  python benchmarks/run_diag_ab.py [--repeats 3]
"""

import argparse
import json
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

CHILD = r"""
import sys, time
sys.path.insert(0, "@ROOT@")
from benchmarks import _cache
_cache.enable_if_accelerator()
import jax
import bench
cfg = dict(bench.WORKLOADS["24q"])
train_step, params, opt_state = bench.build_train_step(cfg)
key = jax.random.PRNGKey(7)
keys = jax.random.split(key, 9)
loss, grads, params, opt_state = train_step(params, opt_state, keys[0])
jax.block_until_ready(loss)
t0 = time.perf_counter()
for i in range(8):
  loss, grads, params, opt_state = train_step(params, opt_state, keys[i + 1])
jax.block_until_ready(loss)
dt = time.perf_counter() - t0
print(f"STEPS_PER_SEC {8.0 / dt:.4f} final_loss {float(loss):.4f}")
"""

VARIANTS = {
    "factored": {"QHBM_DIAG_PHASOR": "auto"},
    "materialized": {"QHBM_DIAG_PHASOR": "materialize"},
}

LINE_RE = re.compile(r"STEPS_PER_SEC ([\d.]+) final_loss (-?[\d.]+)")


def run_once(extra_env, timeout):
  env = dict(os.environ)
  env.setdefault("QHBM_MATMUL_PRECISION", "default")  # headline mode
  env.update(extra_env)
  proc = subprocess.run(
      [sys.executable, "-c", CHILD.replace("@ROOT@", ROOT)], env=env,
      capture_output=True, text=True, timeout=timeout, cwd=ROOT)
  sys.stderr.write(proc.stderr[-1500:])
  if proc.returncode != 0:
    return None
  m = LINE_RE.search(proc.stdout)
  return (float(m.group(1)), float(m.group(2))) if m else None


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--repeats", type=int, default=3)
  ap.add_argument("--timeout", type=int, default=2400)
  args = ap.parse_args()

  runs = {name: [] for name in VARIANTS}
  losses = {}
  for i in range(args.repeats):
    for name, extra in VARIANTS.items():
      r = run_once(extra, args.timeout)
      print(f"run {i + 1}/{args.repeats} {name}: "
            f"{'FAILED' if r is None else f'{r[0]:.4f} steps/s'}", flush=True)
      if r is not None:
        runs[name].append(r[0])
        losses[name] = r[1]

  result = {"runs": runs, "final_loss": losses}
  if all(runs.values()):
    best = {k: max(v) for k, v in runs.items()}
    result["best_steps_per_sec"] = best
    result["factored_speedup"] = round(
        best["factored"] / best["materialized"], 4)
    print(json.dumps({"best": best,
                      "speedup": result["factored_speedup"]}), flush=True)
  with open(os.path.join(HERE, "diag_ab.json"), "w") as f:
    json.dump(result, f, indent=1)


if __name__ == "__main__":
  main()
