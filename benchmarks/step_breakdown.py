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

import numpy as np  # noqa: E402
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
  beta = np.float32(1.2)  # host scalar: device constants stall lowering
  key = jax.random.PRNGKey(0)

  # fixed 8 basis states for the no-EBM slices (HOST numpy: device-array
  # constants captured in the jitted closures stall lowering -- RESULTS.md
  # round 5)
  bits = np.asarray(
      np.random.RandomState(1).randint(0, 2, (MAX_UNIQUE, N)), np.uint8)
  counts = np.full((MAX_UNIQUE,), SAMPLES // MAX_UNIQUE, np.float32)

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
    return jnp.sum(ev * counts[:, None])

  fwd_exp = jax.jit(_exp_sum)
  grad_exp = jax.jit(jax.value_and_grad(_exp_sum))

  def _bump(p, v):
    return jax.tree_util.tree_map(lambda x: x + 1e-9 * v, p)

  def chain(fn, with_key):
    """K dependent iterations inside ONE jit: the tunnel caches identical
    (program, args) dispatches, so a same-args host loop reports ~0.02 ms
    for multi-hundred-ms programs (measured; see the verify notes).  Each
    iteration's params are perturbed by the previous output."""
    @jax.jit
    def run(p, k):
      def body(carry, _):
        p, k = carry
        if with_key:
          k, sub = jax.random.split(k)
          r = fn(p, sub)
        else:
          r = fn(p)
        # Consume EVERY output leaf: feeding only the value back lets
        # XLA dead-code-eliminate the entire backward pass (measured: all
        # four slices collapse to the 132 ms forward).
        v = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(r))
        return (_bump(p, v), k), v
      (_, _), vs = jax.lax.scan(body, (p, k), None, length=REPS)
      return vs
    return run

  out = {}
  for name, fn, with_key in (
      # Pass the WHOLE output tuple through (chain sums every leaf):
      # selecting [0] here would discard the gradients before the scan
      # consumes them and XLA would DCE the entire backward.
      ("full", full, True),
      ("loss", loss_only, True),
      ("fwd_exp", fwd_exp, False),
      ("grad_exp", grad_exp, False),
  ):
    run = chain(fn, with_key)
    t0 = time.perf_counter()
    float(np.asarray(run(params, key))[-1])  # host transfer = real sync
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for r in range(3):
      # DISTINCT args per repeat: the tunnel caches identical
      # (program, args) calls wholesale, returning in ~0 ms.
      p_r = jax.tree_util.tree_map(lambda x: x + 1e-6 * (r + 1), params)
      t0 = time.perf_counter()
      float(np.asarray(run(p_r, key))[-1])  # host transfer = real sync
      best = min(best, time.perf_counter() - t0)
    ms = best / REPS * 1e3
    out[name] = {"ms": round(ms, 2), "compile_s": round(compile_s, 1)}
    print(f"[breakdown] {name}: {ms:.2f} ms/iter (compile {compile_s:.1f}s)",
          file=sys.stderr, flush=True)

  out["devices"] = [str(d) for d in jax.devices()]
  print(json.dumps(out))


if __name__ == "__main__":
  main()
