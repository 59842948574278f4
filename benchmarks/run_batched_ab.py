#!/usr/bin/env python
"""Driver for the staged Pallas-batched hardware A/B
(benchmarks/batched_bench.py).

Runs each variant in its own process (env is read at trace time), REPEATS
times each, alternating variants to decorrelate tunnel-latency drift, and
reports the per-variant MINIMUM ms/iter (timings through the axon tunnel
are bimodal; see docs/design.md and .claude/skills/verify/SKILL.md).

Writes benchmarks/batched_ab.json with the raw runs and the verdict.

Usage:  python benchmarks/run_batched_ab.py [--repeats 3]
"""

import argparse
import json
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
BENCH = os.path.join(HERE, "batched_bench.py")

VARIANTS = {
    "xla": {},
    "pallas_batched": {"QHBM_PALLAS_BATCHED": "1"},
}

LINE_RE = re.compile(r"\[(\w+)\] n=\d+ .*?: ([\d.]+) ms/iter")


def run_once(name, extra_env, timeout):
  env = dict(os.environ)
  env.pop("QHBM_PALLAS", None)
  env.pop("QHBM_PALLAS_BATCHED", None)
  env.update(extra_env)
  proc = subprocess.run(
      [sys.executable, BENCH], env=env, capture_output=True, text=True,
      timeout=timeout)
  sys.stderr.write(proc.stderr[-2000:])
  if proc.returncode != 0:
    return None
  m = LINE_RE.search(proc.stdout)
  return float(m.group(2)) if m else None


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--repeats", type=int, default=3)
  ap.add_argument("--timeout", type=int, default=1500)
  args = ap.parse_args()

  runs = {name: [] for name in VARIANTS}
  for i in range(args.repeats):
    for name, extra in VARIANTS.items():
      ms = run_once(name, extra, args.timeout)
      print(f"run {i + 1}/{args.repeats} {name}: "
            f"{'FAILED' if ms is None else f'{ms:.2f} ms/iter'}", flush=True)
      if ms is not None:
        runs[name].append(ms)

  result = {"runs": runs}
  if runs["xla"] and runs["pallas_batched"]:
    best = {k: min(v) for k, v in runs.items()}
    result["best_ms_per_iter"] = best
    result["pallas_speedup_vs_xla"] = best["xla"] / best["pallas_batched"]
    print(json.dumps(result["best_ms_per_iter"]), flush=True)
    print(f"pallas_batched speedup vs xla: "
          f"{result['pallas_speedup_vs_xla']:.3f}x", flush=True)
  with open(os.path.join(HERE, "batched_ab.json"), "w") as f:
    json.dump(result, f, indent=1)


if __name__ == "__main__":
  main()
