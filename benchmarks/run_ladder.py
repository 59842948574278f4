"""Runs scale-ladder rungs and prints one JSON line per rung.

  python -m benchmarks.run_ladder                 # all rungs, real sizes
  python -m benchmarks.run_ladder --rung r1_tfim2_vqt --steps 5
  python -m benchmarks.run_ladder --smoke         # CI-sized smoke pass
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax

from benchmarks import ladder


def run_rung(name: str, steps: int, smoke: bool, qubits=None) -> dict:
  step_fn, params, opt_state, ebm_state, meta = ladder.build_rung(
      name, smoke=smoke, qubits=qubits)
  key = jax.random.PRNGKey(0)
  t0 = time.perf_counter()
  # Two warmup calls: the first step may change the ebm_state pytree
  # STRUCTURE (e.g. None -> concrete sampler state), which forces a second
  # trace+compile on the next call -- warm until the structure is stable so
  # the timed loop measures steady state.
  for _ in range(2):
    key, sub = jax.random.split(key)
    loss, params, opt_state, ebm_state = step_fn(params, opt_state, sub,
                                                 ebm_state)
  loss.block_until_ready()
  compile_s = time.perf_counter() - t0

  t0 = time.perf_counter()
  for _ in range(steps):
    key, sub = jax.random.split(key)
    loss, params, opt_state, ebm_state = step_fn(params, opt_state, sub,
                                                 ebm_state)
  loss.block_until_ready()
  dt = time.perf_counter() - t0
  return {
      "rung": name,
      **meta,
      "steps_per_sec": round(steps / dt, 4),
      "compile_s": round(compile_s, 1),
      "final_loss": float(loss),
  }


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument("--rung", default=None, choices=ladder.RUNGS)
  parser.add_argument("--steps", type=int, default=3)
  parser.add_argument("--smoke", action="store_true")
  parser.add_argument("--qubits", type=int, default=None,
                      help="override the rung's qubit count")
  args = parser.parse_args()

  rungs = [args.rung] if args.rung else list(ladder.RUNGS)
  for name in rungs:
    try:
      result = run_rung(name, args.steps, args.smoke, args.qubits)
    except Exception as e:  # noqa: BLE001
      result = {"rung": name, "error": f"{type(e).__name__}: {e}"}
    print(json.dumps(result), flush=True)
  sys.exit(0)


if __name__ == "__main__":
  main()
