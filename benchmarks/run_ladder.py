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

from benchmarks import _cache, ladder

# Persistent compilation cache: shields re-runs from compile-service
# latency on the tunneled backend (ladder rungs compile for 30s-8min);
# forces the CPU platform when JAX_PLATFORMS=cpu so a downed tunnel can't
# hang backend init.  See benchmarks/_cache.py for the gating rationale.
_cache.enable_if_accelerator()


def run_rung(name: str, steps: int, smoke: bool, qubits=None,
             max_unique=None) -> dict:
  step_fn, params, opt_state, ebm_state, meta = ladder.build_rung(
      name, smoke=smoke, qubits=qubits, max_unique=max_unique)
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
  result = {
      "rung": name,
      **meta,
      "steps_per_sec": round(steps / dt, 4),
      "compile_s": round(compile_s, 1),
      "final_loss": float(loss),
  }
  if max_unique is not None:
    result["max_unique"] = max_unique  # diet runs are self-describing
  return result


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument("--rung", default=None, choices=ladder.RUNGS)
  parser.add_argument("--steps", type=int, default=3)
  parser.add_argument("--smoke", action="store_true")
  parser.add_argument("--qubits", type=int, default=None,
                      help="override the rung's qubit count")
  parser.add_argument("--max-unique", type=int, default=None,
                      help="override the rung's unique-sample cap "
                           "(memory diet for spec-size single-chip runs)")
  args = parser.parse_args()

  rungs = [args.rung] if args.rung else list(ladder.RUNGS)
  failed = 0
  for name in rungs:
    try:
      result = run_rung(name, args.steps, args.smoke, args.qubits,
                        args.max_unique)
    except Exception as e:  # noqa: BLE001
      result = {"rung": name, "error": f"{type(e).__name__}: {e}"}
      failed += 1
    print(json.dumps(result), flush=True)
  # Per-rung failures are reported as JSON lines rather than aborting the
  # ladder, but the PROCESS must not claim success when rungs failed.
  sys.exit(1 if failed else 0)


if __name__ == "__main__":
  main()
