"""Scaling-shape measurement for the sharded sampled engine.

r3's `data_shards` fan-out (parameter-shift evaluations + shot batches
split over the mesh 'data' axis) is correctness-validated but had no
scaling curve.  This script measures wall-clock per gradient step at
1/2/4/8 virtual CPU devices — the SHAPE of the curve (how much of the
fan-out is parallelizable vs serial) is informative even on CPU, where
all "devices" share host cores: flat ms/step means the work really
splits; rising ms/step exposes serial or replicated sections.

Each device count needs a fresh backend, so the parent spawns one child
per count:

  python -m benchmarks.sampled_scaling [--qubits 10] [--shots 200]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def child(n_qubits, shots, iters, rows):
  import jax

  jax.config.update("jax_platforms", "cpu")
  import jax.numpy as jnp
  import numpy as np

  from qhbmlib_tpu import models, parallel
  from qhbmlib_tpu.models import circuit_utils
  from qhbmlib_tpu.ops import paulis

  n_dev = len(jax.devices())
  mesh = parallel.make_mesh(data=n_dev, state=1)
  circuit = models.DirectQuantumCircuit(
      circuit_utils.hardware_efficient_ansatz(n_qubits, 2))
  q_inf = parallel.ShardedSampledQuantumInference(circuit, shots, mesh,
                                                  initial_seed=3)
  target = paulis.tfim_1d(n_qubits)
  bits = jnp.asarray(
      np.random.RandomState(0).randint(0, 2, (rows, n_qubits)), jnp.int8)
  key = jax.random.PRNGKey(1)

  def loss(phi):
    return jnp.sum(q_inf.expectation_pure(phi, bits, (target,), key=key))

  step = jax.jit(jax.value_and_grad(loss))
  phi = [jnp.asarray(v) for v in q_inf.phi]

  t0 = time.perf_counter()
  val, grad = step(phi)
  jax.block_until_ready((val, grad))
  compile_s = time.perf_counter() - t0

  best = 1e9
  for r in range(3):
    bumped = [p + 1e-4 * (r + 1) for p in phi]
    t0 = time.perf_counter()
    outs = [step([p + 1e-5 * i for p in bumped]) for i in range(iters)]
    jax.block_until_ready(outs)
    best = min(best, (time.perf_counter() - t0) / iters)
  print(json.dumps({"devices": n_dev, "ms_per_step": round(best * 1e3, 2),
                    "compile_s": round(compile_s, 1)}))


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--qubits", type=int, default=10)
  p.add_argument("--shots", type=int, default=200)
  p.add_argument("--iters", type=int, default=4)
  p.add_argument("--rows", type=int, default=4)
  p.add_argument("--child", action="store_true")
  args = p.parse_args()
  if args.child:
    child(args.qubits, args.shots, args.iters, args.rows)
    return

  rows = []
  for d in (1, 2, 4, 8):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS=f"--xla_force_host_platform_device_count={d}")
    out = subprocess.run(
        [sys.executable, "-m", "benchmarks.sampled_scaling", "--child",
         f"--qubits={args.qubits}", f"--shots={args.shots}",
         f"--iters={args.iters}", f"--rows={args.rows}"],
        env=env, capture_output=True, text=True, timeout=3600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if out.returncode != 0:
      print(f"devices={d} FAILED:\n{out.stderr[-1500:]}", file=sys.stderr)
      continue
    row = json.loads(out.stdout.strip().splitlines()[-1])
    rows.append(row)
    print(f"devices={row['devices']}: {row['ms_per_step']} ms/step "
          f"(compile {row['compile_s']}s)", file=sys.stderr)
  print(json.dumps({"qubits": args.qubits, "shots": args.shots,
                    "batch_rows": args.rows, "rows": rows}))


if __name__ == "__main__":
  main()
