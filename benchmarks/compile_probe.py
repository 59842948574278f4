#!/usr/bin/env python
"""Where does the 24q cold compile go?  (VERDICT r4 next #2)

Hypothesis: XLA's HLO constant-folding pass evaluates the static parity
sign chains (iota -> and -> popcount, plus the factored diag's [R, C]
cross sign products) with its SCALAR interpreter at compile time, so
compile cost scales with the 2^n state size rather than gate count --
matching the observed 20q 44s vs 24q 366s at HALF the gate count.

Each probe compiles the bench train step in a fresh subprocess on the CPU
backend (compile-pass structure is platform-shared; absolute times are not
comparable to the tunnel's) with and without
--xla_disable_hlo_passes=constant_folding, at a ladder of qubit counts.

Usage: python benchmarks/compile_probe.py [--sizes 16,18,20] [--out FILE]
"""

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["QHBM_REPO"])
import jax
if os.environ.get("QHBM_PROBE_PLATFORM", "cpu") == "cpu":
  jax.config.update("jax_platforms", "cpu")
import bench

n = int(os.environ["QHBM_PROBE_N"])
cfg = dict(n=n, layers=2, samples=100, max_unique=8)
t0 = time.perf_counter()
jax.devices()
t_init = time.perf_counter() - t0
t0 = time.perf_counter()
train_step, params, opt_state = bench.build_train_step(cfg)
jax.block_until_ready((params, opt_state))
t_build = time.perf_counter() - t0
key = jax.random.PRNGKey(0)
t0 = time.perf_counter()
lowered = train_step.lower(params, opt_state, key)
t_lower = time.perf_counter() - t0
text = lowered.as_text()
t0 = time.perf_counter()
compiled = lowered.compile()
t_compile = time.perf_counter() - t0
t0 = time.perf_counter()
out = compiled(params, opt_state, key)
jax.block_until_ready(out)
t_first = time.perf_counter() - t0
print(json.dumps({
    "n": n, "backend_init_s": round(t_init, 2),
    "build_s": round(t_build, 2), "lower_s": round(t_lower, 2),
    "compile_s": round(t_compile, 2), "first_step_s": round(t_first, 2),
    "stablehlo_lines": len(text.splitlines()),
    "stablehlo_bytes": len(text),
}))
"""


def probe(n, disable_folding, platform="cpu", timeout=1800):
  env = dict(os.environ, QHBM_PROBE_N=str(n), QHBM_REPO=REPO,
             QHBM_PROBE_PLATFORM=platform)
  if platform == "cpu":
    env["JAX_PLATFORMS"] = "cpu"
  flags = env.get("XLA_FLAGS", "")
  if disable_folding:
    flags += " --xla_disable_hlo_passes=constant_folding"
  env["XLA_FLAGS"] = flags.strip()
  t0 = time.perf_counter()
  out = subprocess.run([sys.executable, "-c", CHILD], env=env,
                       capture_output=True, text=True, timeout=timeout)
  if out.returncode != 0:
    return {"n": n, "error": out.stderr[-1500:]}
  rec = json.loads(out.stdout.strip().splitlines()[-1])
  rec["wall_s"] = round(time.perf_counter() - t0, 2)
  rec["constant_folding"] = not disable_folding
  rec["platform"] = platform
  return rec


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--sizes", default="16,18,20")
  ap.add_argument("--platform", default="cpu")
  ap.add_argument("--out", default=os.path.join(HERE, "compile_probe.json"))
  args = ap.parse_args()
  rows = []
  for n in [int(s) for s in args.sizes.split(",")]:
    for disable in (False, True):
      rec = probe(n, disable, platform=args.platform)
      print(json.dumps(rec), flush=True)
      rows.append(rec)
  with open(args.out, "w") as f:
    json.dump(rows, f, indent=1)


if __name__ == "__main__":
  main()
