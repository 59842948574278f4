#!/usr/bin/env python
"""Headline benchmark: VQT train steps/sec at 24 qubits (BASELINE.md).

BASELINE.md's throughput target is ">=10x qsim-CPU VQT step throughput at
24 qubits"; the headline metric is therefore the 24-qubit rung, with the
20-qubit companion number and the measured compute rate (FLOPs from the
compiled executable's cost analysis) reported in "extra".

Workloads (full train step = EBM sampling + VQT loss with eq. A5
score-function + adjoint gradients + Adam update, all inside one jit):

  * 24q: 1D TFIM, Bernoulli EBM (100 samples, 8 unique states), 2-layer
    hardware-efficient ansatz -- benchmarks/ladder.py rung r4 shapes.
  * 20q: 1D TFIM, Bernoulli EBM (500 samples, 64 unique states), 4-layer
    ansatz -- the round-1 headline, kept for continuity.

The baseline denominator is the same workload on CPU (one subprocess with
JAX_PLATFORMS=cpu) as a proxy for the reference's qsim-CPU backend -- the
reference publishes no numbers (BASELINE.md).  CPU measurements are cached
per-workload in bench_baseline_cpu.json (the 24q CPU run alone takes ~10
minutes at ~0.007 steps/s).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""

import json
import os
import subprocess
import sys
import threading
import time

BETA = 1.2
CACHE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "bench_baseline_cpu.json")

# MXU contraction mode for the benchmark (ADVICE r1: report it).  The
# library default is the 3-pass 'high' mode (~5e-4 relative gradient
# error).  The benchmark headline runs 'mixed' (round 5): state applies at
# 3-pass HIGH, the big parity-bilinear/transition-gram reductions at
# 1-pass bf16 -- measured grad rel err 3.2e-4 vs 'high' at 24q, 31x under
# the 1e-2 gate, +21% throughput over 'high'.  The old 1-pass-everything
# 'default' mode is still measured and published as an extra: its gradient
# error straddles the gate (9e-3 vs 'highest' r4; 1.43e-2 vs 'high' at the
# r5 seed-0 trajectory points), which is exactly what the always-on gate
# demotes on.  CPU runs are exact f32 regardless.
PRECISION = os.environ.get("QHBM_MATMUL_PRECISION", "mixed")

WORKLOADS = {
    "24q": dict(n=24, layers=2, samples=100, max_unique=8),
    "20q": dict(n=20, layers=4, samples=500, max_unique=64),
}


def _env_workload():
  """Env overrides define an ad-hoc single workload (smoke runs)."""
  if "QHBM_BENCH_QUBITS" not in os.environ:
    return None
  return dict(
      n=int(os.environ["QHBM_BENCH_QUBITS"]),
      layers=int(os.environ.get("QHBM_BENCH_LAYERS", 2)),
      samples=int(os.environ.get("QHBM_BENCH_SAMPLES", 100)),
      max_unique=int(os.environ.get("QHBM_BENCH_MAX_UNIQUE", 8)))


def log(msg):
  print(msg, file=sys.stderr, flush=True)


def _flat_grads(grads):
  import jax
  import numpy as np
  return np.concatenate([
      np.asarray(x).reshape(-1) for x in jax.tree_util.tree_leaves(grads)])


# bf16-headline accuracy bar (BASELINE.md): max relative gradient error the
# fast 1-pass 'default' mode may show against the 3-pass 'high' reference
# before the bench must demote the headline to the 'high' number.
GRAD_REL_GATE = 1e-2


def precision_gate(traj_default, traj_high):
  """Always-on precision gate: default-vs-high loss/grad deltas at the
  default arm's own (params, key) trajectory points (VERDICT r4 next #4).

  Replays the default arm's recorded step inputs through the HIGH arm's
  already-compiled train step (identical params and PRNG keys -> identical
  EBM samples, so every delta is pure matmul rounding) -- zero extra
  compiles, ~2*steps extra step executions.  Reference is 'high' (3-pass
  bf16, ~5e-4 of its own rounding vs f32 -- benchmarks/RESULTS.md), which
  is two orders of magnitude below the 1e-2 gate, so gate decisions match
  the budget-gated 'highest'-reference artifact."""
  import numpy as np

  step_h = traj_high["train_step"]
  opt0 = traj_high["opt_state0"]
  losses_h, grads_h = [], []
  for p, sub in traj_default["snaps"]:
    loss_h, g_h, _, _ = step_h(p, opt0, sub)
    losses_h.append(float(loss_h))
    grads_h.append(_flat_grads(g_h))
  l_d = np.asarray(traj_default["losses"])
  l_h = np.asarray(losses_h)
  loss_err = float(np.max(np.abs(l_d - l_h)))
  grad_rel = max(
      float(np.linalg.norm(gd - gh) / max(np.linalg.norm(gh), 1e-12))
      for gd, gh in zip(traj_default["grads"], grads_h))
  out = {
      "gate_loss_err": round(loss_err, 9),
      "gate_grad_rel_err": round(grad_rel, 9),
      "gate_reference": "high",
      "gate_trajectory_steps": len(losses_h),
  }
  log(f"[bench:gate] default-vs-high at {len(losses_h)} identical "
      f"(params, key) points: max loss err {loss_err:.2e}, max grad rel "
      f"err {grad_rel:.2e} (gate {GRAD_REL_GATE:.0e})")
  return out


def choose_headline(sps_default, sps_high, grad_rel_err, gate=GRAD_REL_GATE):
  """Demotion rule (pure, unit-tested): if the measured default-mode
  gradient error breaches the gate and a high-mode measurement exists, the
  HIGH number becomes the headline.  Returns (value, precision, demoted).
  An unmeasured gate (None/NaN) keeps the default headline but is reported
  in extra by the caller."""
  have_high = (sps_high is not None and sps_high == sps_high)
  err_known = (grad_rel_err is not None and grad_rel_err == grad_rel_err)
  if err_known and grad_rel_err >= gate and have_high:
    return sps_high, "high", True
  return sps_default, PRECISION, False


def build_train_step(cfg):
  import jax
  import numpy as np
  import optax

  from qhbmlib_tpu import models
  from qhbmlib_tpu.inference import ebm, qhbm, qnn, vqt_loss
  from qhbmlib_tpu.models import circuit_utils
  from qhbmlib_tpu.ops import paulis

  n = cfg["n"]
  target = paulis.tfim_1d(n)  # open chain: the recorded workload

  energy = models.BernoulliEnergy(list(range(n)))
  e_inf = ebm.BernoulliEnergyInference(energy, cfg["samples"],
                                       initial_seed=11,
                                       max_unique_samples=cfg["max_unique"])
  pqc = circuit_utils.hardware_efficient_ansatz(n, cfg["layers"])
  circuit = models.DirectQuantumCircuit(pqc)
  q_inf = qnn.AnalyticQuantumInference(circuit)
  h = qhbm.QHBM(e_inf, q_inf)
  loss_fn = vqt_loss.make_vqt(h, target)

  params = h.params
  opt = optax.adam(1e-2)
  opt_state = opt.init(params)
  beta = np.float32(BETA)  # host scalar: device-array constants stall lowering

  @jax.jit
  def train_step(params, opt_state, key):
    def scalar_loss(p):
      val, _ = loss_fn(p, key, beta)
      return val

    loss, grads = jax.value_and_grad(scalar_loss)(params)
    updates, opt_state = opt.update(grads, opt_state)
    params = optax.apply_updates(params, updates)
    # grads ride along (a few hundred scalars of extra output -- free) so
    # the precision-accuracy artifact can compare gradients across
    # QHBM_MATMUL_PRECISION modes without compiling a second program.
    return loss, grads, params, opt_state

  return train_step, params, opt_state


def measure_flops(train_step, params, opt_state, key):
  """Per-step FLOPs from the compiled executable's cost analysis (f32-
  equivalent ops as counted by XLA); None when the backend won't say."""
  try:
    compiled = train_step.lower(params, opt_state, key).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
      cost = cost[0] if cost else {}
    flops = cost.get("flops")
    return float(flops) if flops else None
  except Exception as e:  # pragma: no cover - backend-specific
    log(f"[bench] cost_analysis unavailable: {e}")
    return None


def run_workload(name, cfg, measure_steps, scan=None, traj=None):
  """Measures steps/s with a host loop; optionally also scan-of-steps.

  With `traj` (a dict), records the measured trajectory for the always-on
  precision gate: traj["snaps"] = the (params, key) input of every measured
  step, traj["losses"]/traj["grads"] = the loss and flattened gradient the
  step returned, traj["train_step"] = the compiled step function itself
  (so another arm can re-evaluate loss/grads at the SAME points with zero
  extra compiles), traj["opt_state0"] = a matching opt state for replays.

  QHBM_BENCH_SCAN=1 additionally times `lax.scan` over `measure_steps`
  train steps inside ONE jitted program and makes THAT the returned
  headline (the loop number is then reported as steps_per_sec_loop).
  Hypothesis tested on hardware 2026-08-19: the axon tunnel costs ~25 ms
  per BLOCKING call (benchmarks/hbm_matrix.py), so a host loop might
  understate throughput by up to 25 ms/step.  Measured: it does NOT --
  JAX async dispatch pipelines dependent steps through the tunnel, and
  scan matched the loop within noise on every workload (24q 3.53 vs
  3.60, 20q 10.45 vs 10.30, 24q-high 2.48 vs 2.47 steps/s).  The scan
  path is therefore OFF by default (it doubles compile time for no
  information); the per-call cost only punishes per-call SYNCS, which
  the bench already avoids.
  """
  import jax

  if scan is None:
    scan = os.environ.get("QHBM_BENCH_SCAN", "0") == "1"
  train_step, params, opt_state = build_train_step(cfg)
  key = jax.random.PRNGKey(0)
  log(f"[bench:{name}] devices: {jax.devices()}")
  t0 = time.perf_counter()
  key, sub = jax.random.split(key)
  loss, _, params, opt_state = train_step(params, opt_state, sub)
  loss.block_until_ready()
  log(f"[bench:{name}] compile + first step: "
      f"{time.perf_counter() - t0:.2f}s, loss={float(loss):.4f}")

  if traj is not None:
    traj["train_step"] = train_step
    traj["opt_state0"] = opt_state
    traj["snaps"], traj["losses"], traj["grads"] = [], [], []
  t0 = time.perf_counter()
  for _ in range(measure_steps):
    key, sub = jax.random.split(key)
    if traj is not None:
      traj["snaps"].append((params, sub))
    loss, grads, params, opt_state = train_step(params, opt_state, sub)
    if traj is not None:
      traj["losses"].append(loss)
      traj["grads"].append(grads)
  loss.block_until_ready()
  dt = time.perf_counter() - t0
  sps_loop = measure_steps / dt
  if traj is not None:
    # Materialize AFTER timing: device->host copies of a few hundred
    # scalars per step, kept off the measured loop.
    traj["losses"] = [float(l) for l in traj["losses"]]
    traj["grads"] = [_flat_grads(g) for g in traj["grads"]]
  log(f"[bench:{name}] {measure_steps} steps in {dt:.2f}s -> "
      f"{sps_loop:.4f} steps/s (host loop, final loss {float(loss):.4f})")
  flops = measure_flops(train_step, params, opt_state, sub)
  if not scan:
    return sps_loop, flops, None

  @jax.jit
  def run_steps(params, opt_state, key):
    def body(carry, _):
      params, opt_state, key = carry
      key, sub = jax.random.split(key)
      loss, _, params, opt_state = train_step(params, opt_state, sub)
      return (params, opt_state, key), loss

    carry, losses = jax.lax.scan(body, (params, opt_state, key), None,
                                 length=measure_steps)
    return carry, losses

  t0 = time.perf_counter()
  (params, opt_state, key), losses = run_steps(params, opt_state, key)
  losses.block_until_ready()
  log(f"[bench:{name}] scan-of-steps compile + first run: "
      f"{time.perf_counter() - t0:.2f}s")
  best = None
  for _ in range(2):
    t0 = time.perf_counter()
    (params, opt_state, key), losses = run_steps(params, opt_state, key)
    losses.block_until_ready()
    dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
  sps_scan = measure_steps / best
  log(f"[bench:{name}] scan: {measure_steps} steps in {best:.2f}s -> "
      f"{sps_scan:.4f} steps/s (final loss {float(losses[-1]):.4f})")
  return sps_scan, flops, sps_loop


def measure_pauli_expectations(cfg, iters=16):
  """BASELINE.md's second headline: PauliSum expectations/sec/chip.

  One "expectation" = <H> of the full TFIM PauliSum (2n-1 terms) for one
  basis-state-prepared, circuit-evolved state.  Timed as `iters` chained
  scan iterations inside ONE jit (the tunnel caches identical dispatches;
  see .claude/skills/verify/SKILL.md), batch = cfg's unique-state count.
  """
  import jax
  import jax.numpy as jnp

  from qhbmlib_tpu import models
  from qhbmlib_tpu.inference import qnn
  from qhbmlib_tpu.models import circuit_utils
  from qhbmlib_tpu.ops import paulis

  n, batch = cfg["n"], cfg["max_unique"]
  target = paulis.tfim_1d(n)  # open chain: the recorded workload
  circuit = models.DirectQuantumCircuit(
      circuit_utils.hardware_efficient_ansatz(n, cfg["layers"]))
  q_inf = qnn.AnalyticQuantumInference(circuit)
  bits = jax.random.bernoulli(
      jax.random.PRNGKey(2), 0.5, (batch, n)).astype(jnp.int8)

  @jax.jit
  def run(phi):
    def body(carry, _):
      vals = q_inf.expectation_pure(carry, bits, target)  # [batch, 1-ish]
      bump = jnp.mean(vals) * 1e-9
      return [p + bump for p in carry], jnp.mean(vals)
    _, outs = jax.lax.scan(body, list(phi), None, length=iters)
    return outs

  phi = [jnp.asarray(v) for v in circuit.trainable_variables]
  run(phi).block_until_ready()  # compile
  best = float("inf")
  for _ in range(3):
    t0 = time.perf_counter()
    run(phi).block_until_ready()
    best = min(best, time.perf_counter() - t0)
  eps = iters * batch / best
  log(f"[bench:{cfg['n']}q] {iters}x{batch} PauliSum expectations in "
      f"{best:.3f}s -> {eps:.1f} expectations/s")
  return eps


def build_eval_vag(cfg):
  """Jitted (params, key) -> (loss, grads) for the bench VQT workload --
  the evaluation-only program the precision-accuracy artifact re-runs at
  recorded trajectory points.  Parameters are explicit inputs, so the
  (randomized) init of this build's own model instance is irrelevant."""
  import jax
  import numpy as np

  from qhbmlib_tpu import models
  from qhbmlib_tpu.inference import ebm, qhbm, qnn, vqt_loss
  from qhbmlib_tpu.models import circuit_utils
  from qhbmlib_tpu.ops import paulis

  n = cfg["n"]
  target = paulis.tfim_1d(n)
  energy = models.BernoulliEnergy(list(range(n)))
  e_inf = ebm.BernoulliEnergyInference(energy, cfg["samples"],
                                       initial_seed=11,
                                       max_unique_samples=cfg["max_unique"])
  circuit = models.DirectQuantumCircuit(
      circuit_utils.hardware_efficient_ansatz(n, cfg["layers"]))
  h = qhbm.QHBM(e_inf, qnn.AnalyticQuantumInference(circuit))
  loss_fn = vqt_loss.make_vqt(h, target)
  beta = np.float32(BETA)  # host scalar: device-array constants stall lowering

  @jax.jit
  def vag(params, key):
    def scalar_loss(p):
      val, _ = loss_fn(p, key, beta)
      return val
    return jax.value_and_grad(scalar_loss)(params)

  return vag


def measure_precision_accuracy(cfg, steps=8):
  """Pins numbers on the 1-pass-bf16 ('default') headline's rounding.

  Runs the headline trajectory in 'default' mode recording every
  (params, key) step point, then re-evaluates loss AND gradient at the
  SAME points under 'highest' (6-pass, ~f32).  Identical parameters and
  identical PRNG keys mean identical EBM samples (the Bernoulli sampler
  uses no matmuls), so every reported delta is pure matmul rounding --
  NOT the chaotic sample-path divergence a two-trajectory comparison
  measures (the round-3 published high/default pair had exactly that
  interpretability problem, VERDICT r3 weak #2).  Costs one extra compile
  (the highest-mode eval program)."""
  import jax
  import numpy as np

  def _flat(grads):
    return np.concatenate([
        np.asarray(x).reshape(-1) for x in jax.tree_util.tree_leaves(grads)])

  saved = os.environ["QHBM_MATMUL_PRECISION"]
  try:
    # Measure the HEADLINE mode's rounding (mixed since round 5; override
    # via QHBM_MATMUL_PRECISION to probe another mode).
    os.environ["QHBM_MATMUL_PRECISION"] = saved
    train_step, params, opt_state = build_train_step(cfg)
    key = jax.random.PRNGKey(7)
    snaps = []
    losses_d, grads_d = [], []
    for _ in range(steps):
      key, sub = jax.random.split(key)
      snaps.append((params, sub))
      loss, grads, params, opt_state = train_step(params, opt_state, sub)
      losses_d.append(float(loss))
      grads_d.append(_flat(grads))

    os.environ["QHBM_MATMUL_PRECISION"] = "highest"
    vag_h = build_eval_vag(cfg)
    losses_h, grads_h = [], []
    for p, sub in snaps:
      loss_h, g_h = vag_h(p, sub)
      losses_h.append(float(loss_h))
      grads_h.append(_flat(g_h))
  finally:
    os.environ["QHBM_MATMUL_PRECISION"] = saved

  l_d, l_h = np.asarray(losses_d), np.asarray(losses_h)
  loss_err = float(np.max(np.abs(l_d - l_h)))
  grad_rels = [
      float(np.linalg.norm(gd - gh) / max(np.linalg.norm(gh), 1e-12))
      for gd, gh in zip(grads_d, grads_h)]
  grad_rel = max(grad_rels)
  out = {
      "default_precision_loss_err": round(loss_err, 9),
      "default_precision_loss_rel_err": round(
          loss_err / max(float(np.max(np.abs(l_h))), 1e-12), 9),
      "default_precision_grad_rel_err": round(grad_rel, 9),
      "precision_reference": "highest",
      "precision_trajectory_steps": steps,
      "final_loss_default": round(float(l_d[-1]), 6),
      "final_loss_highest_same_point": round(float(l_h[-1]), 6),
  }
  log(f"[bench:accuracy] default-vs-highest at {steps} identical "
      f"(params, key) points: max loss err {loss_err:.2e}, max grad rel "
      f"err {grad_rel:.2e}")
  return out


def measure_oracle_forward_err(cfg):
  """Engine (default-precision, live backend) TFIM <H> vs the fully-f64
  C++ oracle (native/qsim_oracle.cc simulate + expectation_f64) for one
  basis-state-prepared, circuit-evolved state at the headline shape."""
  import jax
  import jax.numpy as jnp
  import numpy as np

  from qhbmlib_tpu.models import circuit_utils
  from qhbmlib_tpu.ops import adjoint, native_oracle, paulis

  if not native_oracle.available():
    raise RuntimeError(f"oracle unavailable: {native_oracle.build_error()}")
  n = cfg["n"]
  circuit = circuit_utils.hardware_efficient_ansatz(n, cfg["layers"])
  rng = np.random.RandomState(3)
  values = rng.uniform(0, 2, len(circuit.symbol_names)).astype(np.float32)
  bits = rng.randint(0, 2, size=(1, n)).astype(np.int8)
  target = paulis.tfim_1d(n)

  @jax.jit
  def engine_h(v, b):
    return adjoint.batched_expectations(circuit, v, b, (target,))[0, 0]

  got = float(engine_h(jnp.asarray(values), jnp.asarray(bits)))
  psi = native_oracle.simulate(circuit, np.asarray(values, np.float64),
                               bits=bits[0])
  want = native_oracle.expectation_f64(psi, target)
  err = abs(got - want)
  log(f"[bench:accuracy] forward <H> default={got:.8f} f64-oracle="
      f"{want:.8f} abs err {err:.2e}")
  return {
      "forward_h_default": round(got, 8),
      "forward_h_f64_oracle": round(want, 8),
      "forward_h_abs_err": round(err, 8),
      "forward_h_rel_err": round(err / max(abs(want), 1e-12), 8),
  }


def run_independent_anchor(cfg):
  """The bench workload's quantum step through the INDEPENDENT optimized
  C++ simulator (native/fast_sim.cc): single-core AVX-512 f32 forward +
  TFIM expectation + adjoint gradient for each unique state.  This is the
  anchor BASELINE.md's ">=10x qsim-CPU" phrasing asks for -- a CPU
  denominator that is not the repo's own JAX code.  Omits the classical
  EBM/Adam arithmetic (O(n) per step, negligible at these sizes), so it
  slightly OVERSTATES the CPU simulator's step rate -- conservative for
  the reported speedup."""
  import numpy as np

  from qhbmlib_tpu.models import circuit_utils
  from qhbmlib_tpu.ops import native_fast, paulis

  circuit = circuit_utils.hardware_efficient_ansatz(cfg["n"], cfg["layers"])
  rng = np.random.RandomState(0)
  values = rng.uniform(0, 2, len(circuit.symbol_names))
  zz, xs = native_fast.split_pauli_terms(paulis.tfim_1d(cfg["n"]))
  bits = rng.randint(0, 2, size=(cfg["max_unique"], cfg["n"]))
  secs = native_fast.step_seconds(circuit, values, zz, xs, bits, repeats=2)
  return 1.0 / secs


def independent_baseline(name, cfg, budget_s=None):
  """Cached wrapper for run_independent_anchor (subprocess, like
  cpu_baseline; the 24q measurement takes minutes).  `budget_s` bounds the
  one-time measurement just like cpu_baseline's."""
  cache = {}
  if os.path.exists(CACHE_PATH):
    with open(CACHE_PATH) as f:
      cache = json.load(f)
  key = f"{name}_independent"
  # Key the cached anchor on the simulator source + compile flags too:
  # edits to native/fast_sim.cc must re-measure, never silently compare
  # against a stale anchor.
  from qhbmlib_tpu.ops import native_fast
  src_key = native_fast._artifact_key(native_fast._source_path())
  entry = cache.get(key)
  if entry and entry.get("config") == cfg and entry.get("src") == src_key:
    log(f"[bench:{name}] cached independent C++ baseline: "
        f"{entry['steps_per_sec']:.4f} steps/s")
    return entry["steps_per_sec"]
  if budget_s is not None and budget_s < 120:
    log(f"[bench:{name}] skipping independent baseline measurement "
        f"(budget {budget_s:.0f}s < 120s)")
    return float("nan")
  log(f"[bench:{name}] measuring independent C++ baseline (one-time)...")
  env = dict(os.environ,
             QHBM_BENCH_QUBITS=str(cfg["n"]),
             QHBM_BENCH_LAYERS=str(cfg["layers"]),
             QHBM_BENCH_SAMPLES=str(cfg["samples"]),
             QHBM_BENCH_MAX_UNIQUE=str(cfg["max_unique"]))
  try:
    out = subprocess.run([sys.executable, os.path.abspath(__file__),
                          "--independent-child"], env=env,
                         capture_output=True, text=True,
                         timeout=budget_s if budget_s is not None else 7200)
  except subprocess.TimeoutExpired:
    log(f"[bench:{name}] independent baseline timed out after "
        f"{budget_s:.0f}s")
    return float("nan")
  if out.returncode != 0:
    log(f"[bench:{name}] independent baseline failed:\n{out.stderr[-2000:]}")
    return float("nan")
  result = json.loads(out.stdout.strip().splitlines()[-1])
  cache[key] = {"config": cfg, "src": src_key,
                "steps_per_sec": result["steps_per_sec"]}
  with open(CACHE_PATH, "w") as f:
    json.dump(cache, f, indent=1)
  return result["steps_per_sec"]


def cached_baseline(name, cfg):
  """Cache-only CPU baseline lookup: the committed seed file or an earlier
  measurement this run.  Never launches a subprocess -- this is what the
  PROVISIONAL headline emission uses, so it can never stall."""
  cache = {}
  if os.path.exists(CACHE_PATH):
    with open(CACHE_PATH) as f:
      cache = json.load(f)
  entry = cache.get(name)
  if entry and entry.get("config") == cfg:
    return entry["steps_per_sec"]
  return float("nan")


def cpu_baseline(name, cfg, budget_s=None):
  """CPU baseline steps/s, cached in bench_baseline_cpu.json.

  `budget_s` bounds the one-time subprocess measurement (VERDICT r4: the
  round-4 driver artifact died re-measuring a baseline in an UNGUARDED
  7200s subprocess).  On a cache miss with insufficient budget the
  baseline is simply NaN for this run -- strictly better than risking the
  fresh accelerator headline."""
  cache = {}
  if os.path.exists(CACHE_PATH):
    with open(CACHE_PATH) as f:
      cache = json.load(f)
  entry = cache.get(name)
  if entry and entry.get("config") == cfg:
    log(f"[bench:{name}] cached CPU baseline: "
        f"{entry['steps_per_sec']:.4f} steps/s")
    return entry["steps_per_sec"]
  if budget_s is not None and budget_s < 120:
    log(f"[bench:{name}] skipping CPU baseline measurement "
        f"(budget {budget_s:.0f}s < 120s)")
    return float("nan")
  log(f"[bench:{name}] measuring CPU baseline (subprocess, one-time)...")
  env = dict(os.environ, JAX_PLATFORMS="cpu",
             QHBM_BENCH_QUBITS=str(cfg["n"]),
             QHBM_BENCH_LAYERS=str(cfg["layers"]),
             QHBM_BENCH_SAMPLES=str(cfg["samples"]),
             QHBM_BENCH_MAX_UNIQUE=str(cfg["max_unique"]))
  try:
    out = subprocess.run([sys.executable, os.path.abspath(__file__),
                          "--cpu-child"], env=env, capture_output=True,
                         text=True,
                         timeout=budget_s if budget_s is not None else 7200)
  except subprocess.TimeoutExpired:
    log(f"[bench:{name}] CPU baseline timed out after {budget_s:.0f}s")
    return float("nan")
  if out.returncode != 0:
    log(f"[bench:{name}] CPU baseline failed:\n{out.stderr[-2000:]}")
    return float("nan")
  result = json.loads(out.stdout.strip().splitlines()[-1])
  cache[name] = {"config": cfg, "steps_per_sec": result["steps_per_sec"]}
  with open(CACHE_PATH, "w") as f:
    json.dump(cache, f, indent=1)
  return result["steps_per_sec"]


def _ratio(sps, base):
  return round(sps / base, 2) if base == base and base > 0 else None


def _enable_compile_cache():
  """Persistent compilation cache for the accelerator path.

  The tunnel compile service can be slow or degraded; persisting compiled
  executables under the repo lets warmed-up runs (including earlier
  sessions on the same chip type) shield this run from compile-service
  latency.  The CPU child skips it: XLA:CPU AOT cache entries are pinned
  to the compiling host's machine features and can SIGILL elsewhere."""
  import jax
  cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           ".jax_compile_cache")
  try:
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
  except Exception as e:  # pragma: no cover - version-specific flags
    log(f"[bench] compilation cache unavailable: {e}")


LAST_TPU_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "benchmarks", "last_tpu_bench.json")


# Internal watchdog budget.  MUST stay below the driver's own kill budget
# (~3600s, BENCH_r04.json rc=124): the round-4 artifact was lost because the
# 4500s default let the external kill win the race against _emit_fallback.
TOTAL_TIMEOUT_DEFAULT = 3000


def _total_timeout():
  return float(os.environ.get("QHBM_BENCH_TOTAL_TIMEOUT",
                              TOTAL_TIMEOUT_DEFAULT))


def _run_accel_child():
  """Run the accelerator measurement in a watched child process.

  The tunneled backend can hang indefinitely (jax.devices() never returns
  when the tunnel is down -- observed 2026-08-17/18), and a hung bench run
  records nothing.  The parent stays jax-free, relays the child's stderr,
  and kills the child if backend init never reaches the first `devices:`
  log line within QHBM_BENCH_INIT_TIMEOUT (default 900s -- axon warmup
  alone is 140-470s) or the whole run exceeds QHBM_BENCH_TOTAL_TIMEOUT.

  The child's STDOUT is relayed line-by-line AS IT ARRIVES (and flushed):
  the child emits a provisional headline JSON right after the accelerator
  measurements, so even an external SIGKILL of this whole process tree
  mid-extras leaves a parseable headline as the last stdout line (the
  round-4 driver artifact was lost to exactly that kill -- VERDICT r4
  weak #1).

  Returns (rc, stdout_so_far) on child exit, or (None, stdout_so_far) on
  watchdog kill.
  """
  proc = subprocess.Popen(
      [sys.executable, os.path.abspath(__file__), "--accel-child"],
      stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
  marker_seen = threading.Event()
  out_lines = []

  def pump_err():
    for line in proc.stderr:
      sys.stderr.write(line)
      sys.stderr.flush()
      if "devices:" in line:
        marker_seen.set()

  def pump_out():
    for line in proc.stdout:
      out_lines.append(line)
      sys.stdout.write(line)
      sys.stdout.flush()

  threading.Thread(target=pump_err, daemon=True).start()
  out_thread = threading.Thread(target=pump_out, daemon=True)
  out_thread.start()
  init_to = float(os.environ.get("QHBM_BENCH_INIT_TIMEOUT", 900))
  total_to = _total_timeout()
  t0 = time.time()
  while True:
    rc = proc.poll()
    if rc is not None:
      out_thread.join(timeout=10)
      return rc, "".join(out_lines)
    elapsed = time.time() - t0
    if elapsed > total_to or (elapsed > init_to and not marker_seen.is_set()):
      log(f"[bench] accelerator child unresponsive after {elapsed:.0f}s "
          f"(backend up: {marker_seen.is_set()}); killing it")
      proc.kill()
      proc.wait()
      out_thread.join(timeout=10)
      return None, "".join(out_lines)
    time.sleep(2)


def _has_json_line(text):
  """True when some stdout line already parses as a headline JSON object."""
  for line in text.splitlines():
    line = line.strip()
    if not line.startswith("{"):
      continue
    try:
      parsed = json.loads(line)
    except ValueError:
      continue
    if isinstance(parsed, dict) and "metric" in parsed:
      return True
  return False


def _emit_fallback():
  """Accelerator unreachable: emit the most truthful artifact available.

  If a REAL accelerator run of this exact workload was already recorded
  (LAST_TPU_PATH, refreshed on every successful accelerator bench), that
  measurement IS the framework's performance; re-emit it as the headline,
  explicitly labeled stale, with a fresh CPU measurement of the same
  workload attached for contrast.  (A CPU headline with vs_baseline 1.0
  would misread as "no speedup" when the only thing broken is the tunnel.)
  With no matching recorded measurement, emit the honest CPU number."""
  cfg = _env_workload() or WORKLOADS["24q"]
  name = f"{cfg['n']}q"
  metric = f"vqt_train_steps_per_sec_{name}"
  # Bounded: the fallback runs AFTER the watchdog already spent its budget,
  # so an uncached CPU measurement here must never outlive the driver's
  # remaining patience (the committed seed cache makes this a lookup).
  base = cpu_baseline(name, cfg, budget_s=240)

  recorded = None
  if os.path.exists(LAST_TPU_PATH):
    try:
      with open(LAST_TPU_PATH) as f:
        recorded = json.load(f)
    except Exception:  # pragma: no cover - corrupt file -> CPU fallback
      recorded = None
  rec_cfg = (recorded or {}).get("extra", {}).get("workload")
  if (recorded and recorded.get("metric") == metric and recorded.get("value")
      and (rec_cfg is None or rec_cfg == cfg)):
    # rec_cfg None = a legacy recording without config provenance (accepted
    # on metric match); otherwise the exact workload dict must match so a
    # smoke-config run can never masquerade as the headline workload.
    extra = dict(recorded.get("extra") or {})
    extra.update({
        "platform": "tpu-recorded-stale",
        "recorded_utc": recorded.get("recorded_utc"),
        "note": ("accelerator tunnel unreachable at bench time (backend "
                 "init hang); value is the last successful accelerator "
                 "measurement of this exact workload, NOT a fresh run"),
        "cpu_fresh_steps_per_sec": round(base, 4) if base == base else None,
    })
    print(json.dumps({
        "metric": metric,
        "value": recorded["value"],
        "unit": recorded.get("unit", "steps/s"),
        "vs_baseline": recorded.get("vs_baseline"),
        "extra": extra,
    }))
    return

  print(json.dumps({
      "metric": metric,
      "value": round(base, 4) if base == base else None,
      "unit": "steps/s",
      "vs_baseline": 1.0 if base == base else None,
      "extra": {
          "platform": "cpu-fallback",
          "note": ("accelerator tunnel unreachable (backend init hang); no "
                   "recorded accelerator measurement of this workload "
                   "exists, so the value is the same workload measured on "
                   "host CPU"),
      },
  }))


def _live_platform():
  """Platform of the backend the measurement actually ran on."""
  import jax
  return jax.devices()[0].platform


def _record_last_tpu(stdout_text):
  """Persist the successful accelerator result for future fallback JSONs."""
  if os.environ.get("QHBM_BENCH_PLATFORM") == "cpu":
    return  # test-hook CPU runs are not TPU evidence
  try:
    parsed = json.loads(stdout_text.strip().splitlines()[-1])
    if parsed.get("extra", {}).get("provisional"):
      return  # a cache-only-baseline line must not become the stale record
    if parsed.get("extra", {}).get("platform") in ("cpu-fallback",
                                                   "tpu-recorded-stale",
                                                   "cpu"):
      # Fallback re-emissions are not fresh accelerator evidence, and a
      # child that silently initialized the CPU backend (no accelerator
      # plugin present) must not be recorded as a TPU measurement either.
      return
    wl = parsed.get("extra", {}).get("workload")
    if wl is not None and wl not in WORKLOADS.values():
      return  # ad-hoc smoke workloads must not overwrite the headline record
    parsed["recorded_utc"] = time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                           time.gmtime())
    with open(LAST_TPU_PATH, "w") as f:
      json.dump(parsed, f, indent=1)
  except Exception as e:  # pragma: no cover - never block the relay
    log(f"[bench] could not record last-TPU result: {e}")


def _force_cpu():
  """`JAX_PLATFORMS=cpu` is IGNORED when an accelerator plugin is present
  (see .claude/skills/verify/SKILL.md); the config update before backend
  init is the reliable mechanism."""
  import jax
  jax.config.update("jax_platforms", "cpu")


_MAIN_T0 = time.time()  # accel-child start; proxies the parent's watchdog t0


def _budget_left(margin=120.0):
  """Seconds left before the parent watchdog kills this child, minus a
  safety margin for parent-start skew and the final emit."""
  return _total_timeout() - (time.time() - _MAIN_T0) - margin


def _emit_provisional(metric, sps, cached_base, extra):
  """First-chance headline: printed (and flushed through the parent relay)
  the moment fresh accelerator measurements exist, with cache-only
  baselines.  The enriched final line supersedes it when the run survives;
  any kill in between now truncates EXTRAS, not the record."""
  print(json.dumps({
      "metric": metric,
      "value": round(sps, 4),
      "unit": "steps/s",
      "vs_baseline": _ratio(sps, cached_base),
      "extra": dict(extra, provisional=True),
  }), flush=True)


def _maybe_hang_for_test():
  """Test hook (QHBM_BENCH_HANG_AFTER_PROVISIONAL=1): simulate the round-4
  failure mode -- a post-measurement stall (there: an unguarded CPU
  baseline subprocess) that outlives every kill budget."""
  if os.environ.get("QHBM_BENCH_HANG_AFTER_PROVISIONAL") == "1":
    log("[bench] test hook: hanging after provisional emission")
    time.sleep(100000)


def main():
  os.environ.setdefault("QHBM_MATMUL_PRECISION", PRECISION)
  if "--cpu-child" in sys.argv:
    _force_cpu()
    cfg = _env_workload() or WORKLOADS["24q"]
    # Host loop only: CPU dispatch is sub-ms against multi-second steps,
    # and skipping the scan program avoids a second multi-minute compile.
    sps, _, _ = run_workload(f"{cfg['n']}q-cpu", cfg, measure_steps=2,
                             scan=False)
    print(json.dumps({"steps_per_sec": sps}))
    return

  if "--independent-child" in sys.argv:
    _force_cpu()  # native_fast never touches jax, but keep imports safe
    cfg = _env_workload() or WORKLOADS["24q"]
    sps = run_independent_anchor(cfg)
    print(json.dumps({"steps_per_sec": sps}))
    return

  if "--accel-child" not in sys.argv:
    # Watchdog parent: jax-free, so a downed tunnel can never hang it.
    # Child stdout is relayed line-by-line inside _run_accel_child; no
    # re-emission here (it would duplicate the headline).
    rc, out = _run_accel_child()
    if rc == 0 and out.strip():
      _record_last_tpu(out)
      return
    if _has_json_line(out):
      # The provisional (or final) headline already reached stdout; a
      # fallback emission now would override a REAL fresh measurement
      # with a stale record as the last-parsed JSON line.
      log(f"[bench] accelerator child died (rc={rc}) after emitting a "
          "headline JSON line; keeping that line as the artifact")
      return
    log(f"[bench] accelerator child failed (rc={rc}); CPU fallback")
    _emit_fallback()
    return

  if os.environ.get("QHBM_BENCH_PLATFORM") == "cpu":
    # Test hook: run the whole parent->child->relay path without an
    # accelerator (used by tests/benchmarks; also handy on CI hosts).
    _force_cpu()
  else:
    _enable_compile_cache()
  smoke = _env_workload()
  if smoke is not None:
    name = f"{smoke['n']}q"
    sps, flops, sps_loop = run_workload(name, smoke, measure_steps=8)
    _emit_provisional(f"vqt_train_steps_per_sec_{name}", sps,
                      cached_baseline(name, smoke),
                      {"matmul_precision": PRECISION,
                       "platform": _live_platform(),
                       "workload": smoke})
    _maybe_hang_for_test()
    base = cpu_baseline(name, smoke, budget_s=_budget_left())
    print(json.dumps({
        "metric": f"vqt_train_steps_per_sec_{name}",
        "value": round(sps, 4),
        "unit": "steps/s",
        "vs_baseline": _ratio(sps, base),
        "extra": {"matmul_precision": PRECISION,
                  "platform": _live_platform(),
                  **({"steps_per_sec_loop": round(sps_loop, 4)}
                     if sps_loop is not None else {}),
                  "workload": smoke},
    }), flush=True)
    return

  traj24 = {}
  sps24, flops24, sps24_loop = run_workload("24q", WORKLOADS["24q"],
                                            measure_steps=8, traj=traj24)
  sps20, _, sps20_loop = run_workload("20q", WORKLOADS["20q"],
                                      measure_steps=8)
  # PROVISIONAL headline, cache-only baselines: from here on, any kill --
  # internal watchdog or the driver's -- still leaves a parseable fresh
  # measurement as the last stdout JSON line (VERDICT r4 next #1a).
  _emit_provisional("vqt_train_steps_per_sec_24q", sps24,
                    cached_baseline("24q", WORKLOADS["24q"]),
                    {"steps_per_sec_20q": round(sps20, 4),
                     "vs_baseline_20q": _ratio(
                         sps20, cached_baseline("20q", WORKLOADS["20q"])),
                     "matmul_precision": PRECISION,
                     "platform": _live_platform(),
                     "workload": WORKLOADS["24q"]})
  _maybe_hang_for_test()
  base24 = cpu_baseline("24q", WORKLOADS["24q"], budget_s=_budget_left())
  base20 = cpu_baseline("20q", WORKLOADS["20q"], budget_s=_budget_left())

  extra = {
      "steps_per_sec_20q": round(sps20, 4),
      "vs_baseline_20q": _ratio(sps20, base20),
      "matmul_precision": PRECISION,
      "platform": _live_platform(),
      "workload": WORKLOADS["24q"],
  }
  if sps24_loop is not None:
    # scan-of-steps headline mode (QHBM_BENCH_SCAN=1): keep the host-loop
    # numbers alongside for comparability.
    extra["steps_per_sec_24q_loop"] = round(sps24_loop, 4)
    extra["steps_per_sec_20q_loop"] = round(sps20_loop, 4)
  sps24_high = None
  gate = {}
  if PRECISION != "high":
    # Publish the library-default 3-pass 'high' number alongside the fast
    # 1-pass headline so the headline never silently leans on 9e-3
    # gradients (VERDICT r2 weak #6).  matmul_precision() reads the env at
    # trace time; a fresh build_train_step retraces with the new mode.
    try:
      os.environ["QHBM_MATMUL_PRECISION"] = "high"
      traj24h = {}
      sps24_high, _, _ = run_workload("24q-high", WORKLOADS["24q"],
                                      measure_steps=8, traj=traj24h)
      extra["steps_per_sec_24q_high"] = round(sps24_high, 4)
      extra["vs_baseline_24q_high"] = _ratio(sps24_high, base24)
      # Always-on precision gate: replay the default arm's step inputs
      # through the high arm's compiled program (still env='high' here,
      # though the program is already compiled and env-independent now).
      gate = precision_gate(traj24, traj24h)
      extra.update(gate)
      if PRECISION == "mixed":
        # The 1-pass-everything fast mode, published with its own measured
        # error so the speed-vs-rounding tradeoff stays on the record (its
        # grad error straddles the 1e-2 gate, which is why it is no longer
        # the headline -- VERDICT r4 next #4 / round-5 gate breach).
        os.environ["QHBM_MATMUL_PRECISION"] = "default"
        traj24f = {}
        sps24_fast, _, _ = run_workload("24q-fast", WORKLOADS["24q"],
                                        measure_steps=8, traj=traj24f)
        fast_gate = precision_gate(traj24f, traj24h)
        extra["steps_per_sec_24q_fast_default"] = round(sps24_fast, 4)
        extra["vs_baseline_24q_fast_default"] = _ratio(sps24_fast, base24)
        extra["fast_default_grad_rel_err"] = fast_gate["gate_grad_rel_err"]
        # 20q fast companion: the r1-r4 20q records ran 1-pass 'default';
        # keep that series comparable alongside the gated mixed number.
        sps20_fast, _, _ = run_workload("20q-fast", WORKLOADS["20q"],
                                        measure_steps=8)
        extra["steps_per_sec_20q_fast_default"] = round(sps20_fast, 4)
        extra["vs_baseline_20q_fast_default"] = _ratio(sps20_fast, base20)
    except Exception as e:  # never let the extra kill the headline
      log(f"[bench] high-precision 24q measurement/gate failed: {e}")
    finally:
      os.environ["QHBM_MATMUL_PRECISION"] = PRECISION
  try:
    indep24 = independent_baseline("24q", WORKLOADS["24q"],
                                   budget_s=_budget_left())
    if indep24 == indep24:  # not NaN
      extra["cpu_independent_steps_per_sec"] = round(indep24, 5)
      extra["vs_independent"] = _ratio(sps24, indep24)
      extra["cpu_independent_note"] = (
          "independent single-core AVX-512 C++ simulator "
          "(native/fast_sim.cc): forward + TFIM <H> + adjoint gradient per "
          "unique state; omits negligible classical EBM/Adam arithmetic "
          "(overstates the CPU rate, so vs_independent is conservative)")
  except Exception as e:
    log(f"[bench] independent baseline failed: {e}")
  try:
    extra["pauli_expectations_per_sec_20q"] = round(
        measure_pauli_expectations(WORKLOADS["20q"]), 1)
  except Exception as e:  # never let the extra kill the headline
    log(f"[bench] expectations/sec measurement failed: {e}")
  if (PRECISION in ("default", "mixed")
      and os.environ.get("QHBM_BENCH_ACCURACY", "1") != "0"):
    # Deep accuracy artifact (beyond the always-on gate above): the f64
    # oracle forward check is cheap and always runs; the 'highest'-
    # reference trajectory re-derivation needs one extra 24q compile
    # (~250-500s on a degraded tunnel), so it stays budget-guarded.
    # Fail-soft: problems only drop the extra.
    try:
      extra.update(measure_oracle_forward_err(WORKLOADS["24q"]))
    except Exception as e:
      log(f"[bench] oracle forward check failed: {e}")
    if _budget_left() > 1500:
      try:
        extra.update(measure_precision_accuracy(WORKLOADS["24q"]))
      except Exception as e:
        log(f"[bench] precision-accuracy measurement failed: {e}")
  budget_left = _budget_left()
  if (_live_platform() != "cpu"
      and os.environ.get("QHBM_BENCH_28Q", "1") != "0"
      and budget_left > 900):
    # 900s floor: a cold-cache 28q compile is ~400-500s + ~15s of steps; if
    # the earlier workloads already ate the watchdog budget, skipping the
    # extra is strictly better than letting the parent kill the child and
    # discard the FRESH headline for a stale re-emission.
    # The BASELINE configs[4] spec rung (28q GWG-MCMC QMHL) runs
    # single-chip since round 3; publish it so the driver artifact carries
    # the ladder's top measurement.  TPU-only (the XLA:CPU compile of this
    # program takes ~20 min and has OOM'd a 125 GB host) and guarded: a
    # failure (e.g. RESOURCE_EXHAUSTED from HBM fragmentation after the
    # earlier workloads) only drops the extra.
    try:
      from benchmarks import run_ladder
      log("[bench] measuring 28q GWG-QMHL ladder rung (compile ~400s)...")
      # Spec-default width (max_unique=4, the rung's own default): per-state
      # adjoint cost is linear in the unique count, so this halves the
      # max_unique=2 number the round-3 bench reported -- but it is the
      # representative workload, not a minimal-width showcase (VERDICT r3
      # weak #4).  The adjoint path already runs one state at a time here
      # (QHBM_BATCH_CHUNK auto-resolves to 1 at 2GB states), so width costs
      # wall-clock, not peak HBM.
      r28 = run_ladder.run_rung("r5_gwg28_qmhl", steps=2, smoke=False,
                                max_unique=4)
      extra["steps_per_sec_28q_gwg_qmhl"] = r28["steps_per_sec"]
      extra["workload_28q"] = {"rung": "r5_gwg28_qmhl", "max_unique": 4,
                               "single_chip": True}
    except Exception as e:
      log(f"[bench] 28q ladder extra failed: {e}")
  if flops24:
    tflops = flops24 * sps24 / 1e12
    extra["flops_per_step_24q"] = flops24
    extra["measured_tflops_24q"] = round(tflops, 2)

  # Demotion rule: a gate breach makes the 'high' measurement the headline
  # (unit-tested in tests/benchmarks/test_bench_contract.py).
  value, headline_precision, demoted = choose_headline(
      sps24, sps24_high, gate.get("gate_grad_rel_err"))
  if demoted:
    extra["matmul_precision"] = headline_precision
    extra["steps_per_sec_24q_default_rejected"] = round(sps24, 4)
    extra["note"] = (
        f"default-precision gradients breached the {GRAD_REL_GATE:.0e} "
        "relative-error gate; headline demoted to the 3-pass 'high' "
        "measurement")
  print(json.dumps({
      "metric": "vqt_train_steps_per_sec_24q",
      "value": round(value, 4),
      "unit": "steps/s",
      "vs_baseline": _ratio(value, base24),
      "extra": extra,
  }), flush=True)


if __name__ == "__main__":
  main()
