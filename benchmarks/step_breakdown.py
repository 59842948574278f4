#!/usr/bin/env python
"""Where does the 24q headline step's time go?  (round-4 probe)

Times, on the real accelerator, four nested slices of the headline
workload (bench.py 24q: TFIM, Bernoulli EBM 100 samples / 8 unique,
2-layer HEA, VQT):

  * full     -- value_and_grad of the VQT loss + Adam update (the headline)
  * loss     -- VQT loss forward only (EBM sample + 8x forward sim + <H>)
  * fwd_exp  -- expectation only for 8 FIXED basis states (no EBM, no grad)
  * grad_exp -- value_and_grad of the fixed-state expectation sum

The deltas separate adjoint-backward cost from forward cost from
EBM/sampling overhead, telling us where remaining headroom lives.
Prints one JSON line and appends nothing; run ad hoc.
"""

import json
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

from benchmarks import _cache  # noqa: E402

_cache.enable_if_accelerator()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

N = 24
LAYERS = 2
SAMPLES = 100
MAX_UNIQUE = 8
REPS = 8


def main():
  from qhbmlib_tpu import models
  from qhbmlib_tpu.inference import ebm, qhbm, qnn, vqt_loss
  from qhbmlib_tpu.models import circuit_utils
  from qhbmlib_tpu.ops import paulis

  target = paulis.tfim_1d(N)
  energy = models.BernoulliEnergy(list(range(N)))
  e_inf = ebm.BernoulliEnergyInference(energy, SAMPLES, initial_seed=11,
                                       max_unique_samples=MAX_UNIQUE)
  pqc = circuit_utils.hardware_efficient_ansatz(N, LAYERS)
  circuit = models.DirectQuantumCircuit(pqc)
  q_inf = qnn.AnalyticQuantumInference(circuit)
  h = qhbm.QHBM(e_inf, q_inf)
  loss_fn = vqt_loss.make_vqt(h, target)
  params = h.params
  beta = jnp.asarray(1.2, jnp.float32)
  key = jax.random.PRNGKey(0)

  # fixed 8 basis states for the no-EBM slices
  bits = jax.random.bernoulli(
      jax.random.PRNGKey(1), 0.5, (MAX_UNIQUE, N)).astype(jnp.uint8)
  counts = jnp.full((MAX_UNIQUE,), SAMPLES // MAX_UNIQUE, jnp.int32)

  @jax.jit
  def full(p, k):
    def scalar(p):
      val, _ = loss_fn(p, k, beta)
      return val
    return jax.value_and_grad(scalar)(p)

  @jax.jit
  def loss_only(p, k):
    val, _ = loss_fn(p, k, beta)
    return val

  def _exp_sum(p):
    ev = q_inf.expectation_pure(p["phi"], bits, target)  # [B, n_ops]
    return jnp.sum(ev * counts.astype(jnp.float32)[:, None])

  fwd_exp = jax.jit(_exp_sum)
  grad_exp = jax.jit(jax.value_and_grad(_exp_sum))

  out = {}
  for name, fn, args in (
      ("full", full, (params, key)),
      ("loss", loss_only, (params, key)),
      ("fwd_exp", fwd_exp, (params,)),
      ("grad_exp", grad_exp, (params,)),
  ):
    t0 = time.perf_counter()
    r = fn(*args)
    jax.block_until_ready(r)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(REPS):
      r = fn(*args)
    jax.block_until_ready(r)
    ms = (time.perf_counter() - t0) / REPS * 1e3
    out[name] = {"ms": round(ms, 2), "compile_s": round(compile_s, 1)}
    print(f"[breakdown] {name}: {ms:.2f} ms/iter (compile {compile_s:.1f}s)",
          file=sys.stderr, flush=True)

  out["devices"] = [str(d) for d in jax.devices()]
  print(json.dumps(out))


if __name__ == "__main__":
  main()
