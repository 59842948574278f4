"""Scale-ladder benchmark configs (BASELINE.md):

  r1: 2-qubit TFIM thermal state -- Bernoulli EBM + hardware-efficient
      ansatz, VQT, exact statevector (CPU-runnable).
  r2: 8-qubit Heisenberg QMHL -- learn the modular Hamiltonian of a known
      thermal state served by ThermalStateData.
  r3: 16-qubit KOBE 2-local energy + layered ansatz VQT with
      parameter-shift (sampled) gradients.
  r4: 24-qubit batched-circuit VQT -- amplitude-sharded statevector
      (ShardedQuantumInference over the available mesh).
  r5: 28-qubit non-factorized EBM with Gibbs-With-Gradients MCMC sampling +
      adjoint-gradient QMHL.

Each rung builds a full jitted train step (sampling + loss + custom
gradients + Adam update).  `smoke=True` shrinks qubit counts/batches so the
same code paths run in CI on CPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from qhbmlib_tpu import data as data_module
from qhbmlib_tpu import models, nn, parallel
from qhbmlib_tpu.inference import ebm, qhbm, qmhl_loss, qnn, vqt_loss
from qhbmlib_tpu.models import circuit_utils
from qhbmlib_tpu.ops import paulis
from qhbmlib_tpu.parallel import mesh as mesh_lib


def _tfim(n, h=1.0, j=1.0):
  return paulis.tfim_1d(n, h, j)  # open chain: the recorded workload


def _heisenberg(n, j=1.0):
  terms = []
  for q in range(n - 1):
    for p in ("X", "Y", "Z"):
      terms.append((j, {q: p, q + 1: p}))
  return paulis.pauli_sum_from_strings(n, terms)


def _vqt_step(qhbm_obj, target, beta, optimizer):
  import optax
  loss_fn = vqt_loss.make_vqt(qhbm_obj, target)
  beta = jnp.asarray(beta, jnp.float32)

  @jax.jit
  def step(params, opt_state, key, ebm_state):
    def scalar(p):
      loss, new_state = loss_fn(p, key, beta, ebm_state)
      return loss, new_state

    (loss, new_state), grads = jax.value_and_grad(scalar, has_aux=True)(
        params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    return loss, optax.apply_updates(params, updates), opt_state, new_state

  params = qhbm_obj.params
  return step, params, optimizer.init(params)


def _qmhl_step(data, qhbm_obj, optimizer):
  import optax
  loss_fn = qmhl_loss.make_qmhl(data, qhbm_obj)
  data_params = data.params

  @jax.jit
  def step(params, opt_state, key, ebm_state):
    def scalar(p):
      loss, states = loss_fn({"model": p, "data": data_params}, key,
                             ebm_state)
      return loss, states

    (loss, states), grads = jax.value_and_grad(scalar, has_aux=True)(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    return loss, optax.apply_updates(params, updates), opt_state, states

  params = qhbm_obj.params
  return step, params, optimizer.init(params)


def build_rung(name: str, smoke: bool = False, qubits: int = None,
               max_unique: int = None):
  """Returns (step_fn, params, opt_state, initial_ebm_state, meta).

  step_fn(params, opt_state, key, ebm_state) ->
      (loss, params, opt_state, ebm_state)

  `qubits` overrides the rung's qubit count.  `max_unique` overrides the
  rung's unique-sample cap (r4/r5): the memory-diet knob that, together
  with QHBM_BATCH_CHUNK=1 (adjoint evaluations one at a time), lets the
  spec-size 28-qubit r5 fit a single 16GB v5e chip -- each live
  statevector is 2GB there, so the cap directly bounds peak HBM.
  """
  import optax
  opt = optax.adam(1e-2)

  if max_unique is not None and max_unique < 1:
    raise ValueError(f"max_unique must be >= 1, got {max_unique} "
                     "(omit it to use the rung default)")

  def unique_cap(default):
    return default if max_unique is None else max_unique

  def size(default, smoke_size):
    if qubits is not None:
      return qubits
    return smoke_size if smoke else default

  if name == "r1_tfim2_vqt":
    n = 2
    energy = models.BernoulliEnergy(list(range(n)))
    e_inf = ebm.BernoulliEnergyInference(energy, 500, initial_seed=1)
    circuit = models.DirectQuantumCircuit(
        circuit_utils.hardware_efficient_ansatz(n, 2))
    q_inf = qnn.AnalyticQuantumInference(circuit)
    h = qhbm.QHBM(e_inf, q_inf)
    step, params, opt_state = _vqt_step(h, _tfim(n), 1.0, opt)
    return step, params, opt_state, None, {"n": n, "loss": "vqt"}

  if name == "r2_heis8_qmhl":
    n = size(8, 4)
    from baselines import utils as baselines_utils
    target = _heisenberg(n)
    rho = baselines_utils.get_thermal_state(1.0, target.dense())
    data = data_module.ThermalStateData(rho)
    energy = models.KOBE(list(range(n)), 2)
    e_inf = ebm.AnalyticEnergyInference(energy, 500, initial_seed=2)
    circuit = models.DirectQuantumCircuit(
        circuit_utils.hardware_efficient_ansatz(n, 2 if smoke else 4))
    q_inf = qnn.AnalyticQuantumInference(circuit)
    h = qhbm.QHBM(e_inf, q_inf)
    step, params, opt_state = _qmhl_step(data, h, opt)
    return step, params, opt_state, None, {"n": n, "loss": "qmhl"}

  if name == "r3_kobe16_vqt_shift":
    n = size(16, 6)
    shots = 100 if smoke else 1000
    energy = models.KOBE(list(range(n)), 2)
    # DELIBERATE workload shaping, not an inverted condition: the measured
    # rung caps the EBM support at 4 unique states so the parameter-shift
    # batch ([~1504 evaluations x 2^16 amplitudes] x 1000 shots, see
    # benchmarks/RESULTS.md r3) stays within one chip's HBM at spec size;
    # every recorded r3 number used this cap.  The n=6 smoke run is tiny
    # either way and runs uncapped to exercise the default dedup path.
    e_inf = ebm.AnalyticEnergyInference(
        energy, 100, initial_seed=3,
        max_unique_samples=4 if not smoke else None)
    circuit = models.DirectQuantumCircuit(
        circuit_utils.hardware_efficient_ansatz(n, 1 if smoke else 2))
    # Multi-device: the unique-state batch and every parameter-shift
    # evaluation split over a 'data' mesh (bit-identical to single-device).
    n_dev = len(jax.devices())
    if n_dev > 1:
      mesh = parallel.make_mesh(data=n_dev, state=1)
      q_inf = parallel.ShardedSampledQuantumInference(circuit, shots, mesh,
                                                      initial_seed=3)
    else:
      q_inf = qnn.SampledQuantumInference(circuit, shots, initial_seed=3)
    h = qhbm.QHBM(e_inf, q_inf)
    step, params, opt_state = _vqt_step(h, _tfim(n), 1.0, opt)
    return step, params, opt_state, None, {"n": n, "loss": "vqt",
                                           "grad": "parameter-shift",
                                           "data_shards": n_dev}

  if name == "r4_tfim24_sharded_vqt":
    n = size(24, 8)
    devices = jax.devices()
    state = 1
    while state * 2 <= len(devices):
      state *= 2
    mesh = parallel.make_mesh(data=1, state=state,
                              devices=devices[:state])
    energy = models.BernoulliEnergy(list(range(n)))
    e_inf = ebm.BernoulliEnergyInference(energy, 100, initial_seed=4,
                                         max_unique_samples=unique_cap(8))
    circuit = models.DirectQuantumCircuit(
        circuit_utils.hardware_efficient_ansatz(n, 2))
    q_inf = parallel.ShardedQuantumInference(circuit, mesh, data_axis=None)
    h = qhbm.QHBM(e_inf, q_inf)
    step, params, opt_state = _vqt_step(h, _tfim(n), 1.0, opt)
    return step, params, opt_state, None, {"n": n, "loss": "vqt",
                                           "state_shards": state}

  if name == "r5_gwg28_qmhl":
    n = size(28, 8)
    # The spec size (28 qubits, BASELINE.json configs[4]) RUNS ON ONE 16GB
    # v5e chip since the round-3 parity-factor scan+remat fix: measured
    # 0.279 steps/s at max_unique=2 and 0.140 at the default max_unique=4
    # (TPU XLA's HBM-aware scheduler fits what the CPU lowering estimates
    # at 25.8GB; see benchmarks/RESULTS.md round-3 ladder).  With >1 device
    # the rung instead shards every statevector over a 'state' mesh axis
    # (ICI partner exchanges, parallel/sharded_sv.py) and spreads the GWG
    # chains over the same devices; on one device it uses the dense engine.
    devices = jax.devices()
    state = 1
    while state * 2 <= len(devices):
      state *= 2
    energy = models.KOBE(list(range(n)), 2)
    circuit = models.DirectQuantumCircuit(
        circuit_utils.hardware_efficient_ansatz(n, 1))
    d_energy = models.BernoulliEnergy(list(range(n)),
                                      nn.RandomNormal(0.0, 0.3, seed=11))
    d_circuit = models.DirectQuantumCircuit(
        circuit_utils.hardware_efficient_ansatz(n, 1, name="data_p"))
    burnin = 4 if smoke else 32
    if state > 1:
      mesh = parallel.make_mesh(data=1, state=state,
                                devices=devices[:state])
      e_inf = parallel.ShardedGibbsWithGradientsInference(
          energy, 32, burnin, mesh, chains_axis=mesh_lib.STATE_AXIS,
          num_chains=8, max_unique_samples=unique_cap(4), initial_seed=5)
      q_inf = parallel.ShardedQuantumInference(circuit, mesh, data_axis=None)
      d_q_inf = parallel.ShardedQuantumInference(d_circuit, mesh,
                                                 data_axis=None)
    else:
      e_inf = ebm.GibbsWithGradientsInference(
          energy, 32, num_burnin_samples=burnin,
          num_chains=8, max_unique_samples=unique_cap(4), initial_seed=5)
      q_inf = qnn.AnalyticQuantumInference(circuit)
      d_q_inf = qnn.AnalyticQuantumInference(d_circuit)
    h = qhbm.QHBM(e_inf, q_inf)
    # Data: a fixed random QHBM at the same size (sampling-based source).
    d_e_inf = ebm.BernoulliEnergyInference(d_energy, 32, initial_seed=6,
                                           max_unique_samples=unique_cap(4))
    data = data_module.QHBMData(qhbm.QHBM(d_e_inf, d_q_inf))
    step, params, opt_state = _qmhl_step(data, h, opt)
    ebm_state = (None, e_inf.chain_state)
    return step, params, opt_state, ebm_state, {"n": n, "loss": "qmhl",
                                                "ebm": "gwg",
                                                "state_shards": state}

  raise ValueError(f"unknown rung {name!r}")


RUNGS = ("r1_tfim2_vqt", "r2_heis8_qmhl", "r3_kobe16_vqt_shift",
         "r4_tfim24_sharded_vqt", "r5_gwg28_qmhl")
