#!/usr/bin/env python
"""Headline benchmark: VQT train steps/sec at 20 qubits (BASELINE.md).

Workload: 20-qubit 1D TFIM thermal state, Bernoulli EBM (500 expectation
samples, unique support capped at 64 count-weighted bitstrings), 4-layer
hardware-efficient ansatz, full train step = EBM sampling + VQT loss with
eq. A5 score-function + adjoint gradients + Adam update, all inside one jit.

The baseline denominator is the same workload on CPU (one process with
JAX_PLATFORMS=cpu) as a proxy for the reference's qsim-CPU backend -- the
reference publishes no numbers (BASELINE.md).  The CPU measurement is cached
in bench_baseline_cpu.json so repeated bench runs stay fast.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import subprocess
import sys
import time

# Env overrides support small smoke runs (e.g. QHBM_BENCH_QUBITS=8 on CPU).
N_QUBITS = int(os.environ.get("QHBM_BENCH_QUBITS", 20))
NUM_LAYERS = int(os.environ.get("QHBM_BENCH_LAYERS", 4))
NUM_SAMPLES = int(os.environ.get("QHBM_BENCH_SAMPLES", 500))
MAX_UNIQUE = int(os.environ.get("QHBM_BENCH_MAX_UNIQUE", 64))
BETA = 1.2
CACHE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "bench_baseline_cpu.json")


def log(msg):
  print(msg, file=sys.stderr, flush=True)


def run_workload(measure_steps: int) -> float:
  import jax
  import jax.numpy as jnp
  import optax

  from qhbmlib_tpu import models
  from qhbmlib_tpu.inference import ebm, qhbm, qnn, vqt_loss
  from qhbmlib_tpu.models import circuit_utils
  from qhbmlib_tpu.ops import paulis

  n = N_QUBITS
  terms = [(-1.0, {q: "X"}) for q in range(n)]
  terms += [(-1.0, {q: "Z", q + 1: "Z"}) for q in range(n - 1)]
  target = paulis.pauli_sum_from_strings(n, terms)

  energy = models.BernoulliEnergy(list(range(n)))
  e_inf = ebm.BernoulliEnergyInference(energy, NUM_SAMPLES, initial_seed=11,
                                       max_unique_samples=MAX_UNIQUE)
  pqc = circuit_utils.hardware_efficient_ansatz(n, NUM_LAYERS)
  circuit = models.DirectQuantumCircuit(pqc)
  q_inf = qnn.AnalyticQuantumInference(circuit)
  h = qhbm.QHBM(e_inf, q_inf)
  loss_fn = vqt_loss.make_vqt(h, target)

  params = h.params
  opt = optax.adam(1e-2)
  opt_state = opt.init(params)
  beta = jnp.asarray(BETA, jnp.float32)

  @jax.jit
  def train_step(params, opt_state, key):
    def scalar_loss(p):
      val, _ = loss_fn(p, key, beta)
      return val

    loss, grads = jax.value_and_grad(scalar_loss)(params)
    updates, opt_state = opt.update(grads, opt_state)
    params = optax.apply_updates(params, updates)
    return loss, params, opt_state

  key = jax.random.PRNGKey(0)
  log(f"[bench] devices: {jax.devices()}")
  t0 = time.perf_counter()
  key, sub = jax.random.split(key)
  loss, params, opt_state = train_step(params, opt_state, sub)
  loss.block_until_ready()
  log(f"[bench] compile + first step: {time.perf_counter() - t0:.2f}s, "
      f"loss={float(loss):.4f}")

  t0 = time.perf_counter()
  for _ in range(measure_steps):
    key, sub = jax.random.split(key)
    loss, params, opt_state = train_step(params, opt_state, sub)
  loss.block_until_ready()
  dt = time.perf_counter() - t0
  sps = measure_steps / dt
  log(f"[bench] {measure_steps} steps in {dt:.2f}s -> {sps:.4f} steps/s "
      f"(final loss {float(loss):.4f})")
  return sps


def _config():
  return dict(n=N_QUBITS, layers=NUM_LAYERS, samples=NUM_SAMPLES,
              max_unique=MAX_UNIQUE)


def cpu_baseline() -> float:
  if os.path.exists(CACHE_PATH):
    with open(CACHE_PATH) as f:
      cached = json.load(f)
    if cached.get("config") == _config():
      log(f"[bench] using cached CPU baseline: {cached['steps_per_sec']:.4f}")
      return cached["steps_per_sec"]
  log("[bench] measuring CPU baseline (subprocess, one-time)...")
  env = dict(os.environ, JAX_PLATFORMS="cpu")
  out = subprocess.run([sys.executable, os.path.abspath(__file__),
                        "--cpu-child"], env=env, capture_output=True,
                       text=True, timeout=3600)
  if out.returncode != 0:
    log(f"[bench] CPU baseline failed:\n{out.stderr[-2000:]}")
    return float("nan")
  result = json.loads(out.stdout.strip().splitlines()[-1])
  result["config"] = _config()
  with open(CACHE_PATH, "w") as f:
    json.dump(result, f)
  return result["steps_per_sec"]


def main():
  # Benchmark configuration: 1-pass-bf16 MXU contractions.  The library
  # default is the 3-pass 'high' mode (gradient error 5e-4 relative); the
  # fast mode trades that for 1.27x step throughput at 9e-3 relative
  # gradient error, and the VQT loss trajectory is indistinguishable at
  # this workload (see benchmarks/RESULTS.md).  CPU runs are exact f32
  # regardless, so the baseline denominator is unaffected.
  os.environ.setdefault("QHBM_MATMUL_PRECISION", "default")
  if "--cpu-child" in sys.argv:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    sps = run_workload(measure_steps=2)
    print(json.dumps({"steps_per_sec": sps}))
    return
  sps = run_workload(measure_steps=8)
  base = cpu_baseline()
  vs = sps / base if base == base and base > 0 else None
  print(json.dumps({
      "metric": f"vqt_train_steps_per_sec_{N_QUBITS}q",
      "value": round(sps, 4),
      "unit": "steps/s",
      "vs_baseline": round(vs, 2) if vs is not None else None,
  }))


if __name__ == "__main__":
  main()
