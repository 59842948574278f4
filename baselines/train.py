"""TFIM thermal-state experiment driver.

TPU-native rebuild of reference baselines/train.py:38-678: the same
experiment semantics (VQT beta sweeps, QVARTZ sequential unitary-evolution
QMHL re-learning; vanilla / natural-gradient / mirror-descent training;
TensorBoard-style observability) re-expressed as pure-functional JAX -- the
training step is one jitted function of a parameter pytree, the BKM
information matrix is built from `jax.vmap`/`lax.map` parameter-shift
evaluations instead of variable mutation, and checkpointing (absent in the
reference) is added via orbax.

Run:  python -m baselines.train --config baselines/config.py \
          --output_dir /tmp/qhbm_logs/run0
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree

from qhbmlib_tpu import data as data_module
from qhbmlib_tpu import models, nn
from qhbmlib_tpu.inference import ebm, qhbm, qhbm_utils, qnn
from qhbmlib_tpu.inference import qmhl_loss, vqt_loss
from qhbmlib_tpu.ops import circuit_ir as ir
from qhbmlib_tpu.ops import paulis

from baselines import pqc
from baselines import utils as baselines_utils

try:
  import optax
except ImportError:  # pragma: no cover
  optax = None


# ---------------------------------------------------------------------------
# Metrics writer: JSONL always, TensorBoard when available+enabled.
# ---------------------------------------------------------------------------

class MetricsWriter:
  """Writes scalar/histogram/image metrics to JSONL (+ optional TensorBoard)."""

  def __init__(self, log_dir: str, tensorboard: bool = True):
    os.makedirs(log_dir, exist_ok=True)
    self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
    self._tb = None
    if tensorboard:
      try:
        from torch.utils.tensorboard import SummaryWriter
        self._tb = SummaryWriter(log_dir=log_dir)
      except Exception:
        self._tb = None

  def scalar(self, tag: str, value, step: int):
    value = float(value)
    self._jsonl.write(
        json.dumps({"tag": tag, "value": value, "step": int(step)}) + "\n")
    if self._tb:
      self._tb.add_scalar(tag, value, int(step))

  def histogram(self, tag: str, values, step: int):
    arr = np.asarray(values).reshape(-1)
    self._jsonl.write(
        json.dumps({
            "tag": tag + "/stats", "step": int(step),
            "mean": float(arr.mean()), "std": float(arr.std()),
            "min": float(arr.min()), "max": float(arr.max()),
        }) + "\n")
    if self._tb:
      self._tb.add_histogram(tag, arr, int(step))

  def image(self, tag: str, img, step: int):
    if self._tb:
      self._tb.add_image(tag, np.asarray(img)[0], int(step),
                         dataformats="HWC")

  def hparams(self, hparams: dict):
    self._jsonl.write(json.dumps({"hparams": hparams}) + "\n")
    if self._tb:
      try:
        self._tb.add_hparams(hparams, {})
      except Exception:
        pass

  def flush(self):
    self._jsonl.flush()
    if self._tb:
      self._tb.flush()

  def close(self):
    self.flush()
    self._jsonl.close()
    if self._tb:
      self._tb.close()


# ---------------------------------------------------------------------------
# TFIM dataset builders (reference baselines/train.py:38-89)
# ---------------------------------------------------------------------------

def get_tfim_hamiltonian(bias: float, config):
  """1D chain or 2D torus TFIM split into (X shard, ZZ shard) PauliSums."""
  num_rows = config.dataset.num_rows
  num_cols = config.dataset.num_cols
  if config.dataset.lattice_dim == 1:
    n = num_rows * num_cols
    x_terms = [(-bias, {q: "X"}) for q in range(n)]
    z_terms = [(-1.0, {q: "Z", (q + 1) % n: "Z"}) for q in range(n)]
  else:
    n = num_rows * num_cols
    def qid(r, c):
      return (r % num_rows) * num_cols + (c % num_cols)
    z_terms = []
    for r in range(num_rows):
      for c in range(num_cols):
        z_terms.append((-1.0, {qid(r, c): "Z", qid(r, c + 1): "Z"}))
        z_terms.append((-1.0, {qid(r, c): "Z", qid(r + 1, c): "Z"}))
    x_terms = [(-bias, {q: "X"}) for q in range(n)]
  return (paulis.pauli_sum_from_strings(n, x_terms),
          paulis.pauli_sum_from_strings(n, z_terms))


def get_tfim_unitary(x_hamiltonian: paulis.PauliSum,
                     z_hamiltonian: paulis.PauliSum, config) -> ir.Circuit:
  """Trotterized e^{-iHt} step circuit (reference train.py:80-89)."""
  dt = config.dataset.total_time / (config.dataset.time_steps *
                                    config.dataset.trotter_steps)
  builder = ir.CircuitBuilder(x_hamiltonian.num_qubits)
  for _ in range(config.dataset.trotter_steps):
    ir.exp_pauli_sum(x_hamiltonian, shift=dt, builder=builder)
    ir.exp_pauli_sum(z_hamiltonian, shift=dt, builder=builder)
  return builder.build()


def compute_data_point_metrics(beta=None,
                               target_hamiltonian_matrix=None,
                               prev_target_density_matrix=None,
                               channel_matrix=None):
  """Exact target state + entropy (+ logZ for thermal points); reference
  train.py:92-107.  Pure host numpy (metrics-only)."""
  if beta is not None and target_hamiltonian_matrix is not None:
    target_dm = np.asarray(
        baselines_utils.get_thermal_state(beta, target_hamiltonian_matrix),
        np.complex128)
    target_log_z = float(baselines_utils.log_partition_function(
        beta, target_hamiltonian_matrix))
  else:
    channel = np.asarray(channel_matrix, np.complex128)
    target_dm = channel @ prev_target_density_matrix @ np.conj(channel.T)
    target_log_z = None
  evals = np.maximum(np.real(np.linalg.eigvalsh(target_dm)), 0.0)
  target_entropy = -np.sum(np.where(evals > 0, evals * np.log(evals), 0.0))
  if target_log_z is None:
    return target_dm, target_entropy
  return target_dm, target_entropy, target_log_z


# ---------------------------------------------------------------------------
# Model factory (reference train.py:110-151)
# ---------------------------------------------------------------------------

def get_initial_qhbm(hamiltonian_shards, config, name, seed=None):
  """Builds (modular_hamiltonian, qhbm) per the config."""
  num_sites = config.dataset.num_rows * config.dataset.num_cols
  num_layers = config.model.circuit_layers

  energy_initializer = nn.RandomNormal(config.model.energy_init_mean,
                                       config.model.energy_init_stddev,
                                       seed=seed)
  if config.model.energy == "kobe":
    energy = models.KOBE(list(range(num_sites)), config.model.kobe_order,
                         energy_initializer)
  elif config.model.energy == "bernoulli":
    energy = models.BernoulliEnergy(list(range(num_sites)),
                                    energy_initializer)
  else:
    raise ValueError(config.model.energy)

  if config.model.ebm == "analytic":
    e_inf = ebm.AnalyticEnergyInference(energy, config.training.num_samples,
                                        name=name)
  elif config.model.ebm == "bernoulli":
    e_inf = ebm.BernoulliEnergyInference(energy, config.training.num_samples,
                                         name=name)
  elif config.model.ebm == "gwg":
    e_inf = ebm.GibbsWithGradientsInference(
        energy, config.training.num_samples,
        num_burnin_samples=config.model.gwg_burnin,
        num_chains=config.model.gwg_chains, name=name)
  else:
    raise ValueError(config.model.ebm)

  circuit_initializer = nn.RandomNormal(config.model.circuit_init_mean,
                                        config.model.circuit_init_stddev,
                                        seed=None if seed is None else seed + 1)
  if config.model.circuit == "qhea":
    u = pqc.get_hardware_efficient_model_unitary(num_sites, num_layers, name)
    circuit = models.DirectQuantumCircuit(u, circuit_initializer)
  elif config.model.circuit == "qaia":
    circuit = models.QAIA(hamiltonian_shards,
                          energy.operator_shards(num_sites), num_layers,
                          circuit_initializer)
  else:
    raise ValueError(config.model.circuit)

  if config.model.qnn == "analytic":
    q_inf = qnn.AnalyticQuantumInference(circuit, name=name)
  elif config.model.qnn == "sampled":
    q_inf = qnn.SampledQuantumInference(circuit, config.training.num_samples,
                                        name=name)
  else:
    raise ValueError(config.model.qnn)

  h = qhbm.QHBM(e_inf, q_inf)
  return h.modular_hamiltonian, h


def get_optimizer(optimizer: str, learning_rate: float):
  if optimizer == "SGD":
    return optax.sgd(learning_rate)
  if optimizer == "Adam":
    return optax.adam(learning_rate)
  raise ValueError(optimizer)


# ---------------------------------------------------------------------------
# BKM information matrix (reference train.py:161-249)
# ---------------------------------------------------------------------------

def make_information_matrix(qhbm_obj: qhbm.QHBM,
                            modular_hamiltonian_copy: models.Hamiltonian,
                            num_samples: int):
  """Returns info_matrix(params, key, ebm_state=None) -> [P, P] estimating
  the Bogoliubov-Kubo-Mori metric tr[d_j rho d_k K]:

    * EBM block: sample covariance of the energy gradient (reference
      ebm_block, train.py:177-191);
    * cross / QNN blocks: parameter-shift rows (phi_i +- 0.5, scaled pi/2) of
      the gradient of <K_copy>_rho w.r.t. the copy's energy / circuit
      parameters (reference cross_block/qnn_block, train.py:193-249).
  """
  e_inf = qhbm_obj.e_inference

  def info_matrix(params, key, ebm_state=None):
    theta = list(params["theta"])
    phi = list(params["phi"])
    theta_flat, unravel_theta = ravel_pytree(theta)
    phi_flat, unravel_phi = ravel_pytree(phi)
    k_ebm, k_shift = jax.random.split(jax.random.fold_in(key, 7))

    # EBM block: covariance of per-sample energy gradients.  The sampler
    # state is THREADED (not read off the inference object) so a jitted
    # caller never bakes a stale GWG chain into the compiled step.
    samples, _ = e_inf.sample_with_state(theta, k_ebm, ebm_state, num_samples)
    samples = samples.astype(jnp.float32)

    def energy_grad(x):
      g = jax.grad(
          lambda th_flat: e_inf.energy_apply(
              list(unravel_theta(th_flat)), x[None, :])[0])(theta_flat)
      return g

    # Batched: the Jacobian is only [N, Pt] (Pt ~ tens of parameters), so a
    # vmap costs trivial memory; a lax.map here would serialize N tiny grad
    # kernels inside the jitted step, pure latency on TPU.
    jac = jax.vmap(energy_grad)(samples)  # [N, Pt]
    centered = jac - jnp.mean(jac, axis=0)
    block_ebm = centered.T @ centered / num_samples

    # <K_copy> as a pure function of (shifted phi, copy theta, copy phi).
    def expect(phi_shift_flat, obs_theta_flat, obs_phi_flat, k):
      p = {"theta": theta, "phi": list(unravel_phi(phi_shift_flat))}
      obs_params = {
          "circuit": list(unravel_phi(obs_phi_flat)),
          "energy": list(unravel_theta(obs_theta_flat)),
      }
      # Thread the sampler state here too: without it a GWG-backed QHBM
      # would fall back to the trace-time chain snapshot for every shifted
      # <K_copy> evaluation, biasing the BKM metric from an
      # un-equilibrated constant chain.
      val, _ = qhbm_obj.expectation_pure(p, k, modular_hamiltonian_copy,
                                         obs_params, ebm_state=ebm_state)
      return val[0]

    shift = 0.5
    scale = np.pi / 2

    def shift_row(args):
      i, k, argnum = args

      def g(s):
        return jax.grad(expect, argnums=argnum)(
            phi_flat.at[i].add(s), theta_flat, phi_flat, k)

      return scale * (g(-shift) - g(shift))

    num_phi = phi_flat.shape[0]
    idx = jnp.arange(num_phi)
    keys_c = jax.random.split(jax.random.fold_in(k_shift, 0), num_phi)
    keys_q = jax.random.split(jax.random.fold_in(k_shift, 1), num_phi)
    block_cross = jax.lax.map(lambda a: shift_row((a[0], a[1], 1)),
                              (idx, keys_c))  # [Pp, Pt]
    block_qnn = jax.lax.map(lambda a: shift_row((a[0], a[1], 2)),
                            (idx, keys_q))  # [Pp, Pp]

    upper = jnp.concatenate([block_ebm, block_cross.T], axis=1)
    lower = jnp.concatenate([block_cross, block_qnn], axis=1)
    im = jnp.concatenate([upper, lower], axis=0)
    return (im + im.T) / 2.0

  return info_matrix


def natural_solve(im, grads, training_config):
  """Solves reg(im) @ nat = grads in the info matrix's [theta; phi] block
  order and returns (nat_grads pytree, (reg_im, reg, nat_flat)).

  The flattening is EXPLICIT: ravel_pytree on the params dict sorts keys
  ('phi' < 'theta'), which would pair circuit-gradient entries with
  EBM-metric rows and vice versa -- shapes match, so the permutation would
  be silent.  The least-squares solve matches tf.linalg.lstsq's two modes
  (reference train.py:326-331, config lstsq_fast default False):
  fast=False -> orthogonal least squares (SVD minimum-norm solution; the l2
  regularizer is IGNORED, as in TF); fast=True -> Cholesky-style normal
  equations with l2 regularizer (squares the condition number; cheaper).
  """
  if training_config.info_matrix_eigval_reg:
    min_eig = jnp.min(jnp.linalg.eigvalsh(im))
    reg = jnp.where(
        min_eig <= training_config.info_matrix_reg,
        training_config.info_matrix_reg + jnp.abs(jnp.minimum(min_eig, 0.0)),
        0.0)
  else:
    reg = jnp.asarray(training_config.info_matrix_reg, jnp.float32)
  reg_im = im + reg * jnp.eye(im.shape[0])
  g_theta, unravel_theta = ravel_pytree(list(grads["theta"]))
  g_phi, unravel_phi = ravel_pytree(list(grads["phi"]))
  flat_grads = jnp.concatenate([g_theta, g_phi])
  nt = g_theta.shape[0]
  if training_config.get("lstsq_fast", False):
    l2 = training_config.lstsq_l2_regularizer
    lhs = reg_im.T @ reg_im + l2 * jnp.eye(reg_im.shape[0])
    nat_flat = jnp.linalg.solve(lhs, reg_im.T @ flat_grads)
  else:
    nat_flat = jnp.linalg.lstsq(reg_im, flat_grads)[0]
  nat_grads = {"theta": unravel_theta(nat_flat[:nt]),
               "phi": unravel_phi(nat_flat[nt:])}
  return nat_grads, (reg_im, reg, nat_flat)


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------

def _flat(values) -> np.ndarray:
  return np.concatenate([np.asarray(v).reshape(-1) for v in values])


def train_model(qhbm_obj: qhbm.QHBM,
                modular_hamiltonian: models.Hamiltonian,
                optimizer,
                num_steps: int,
                target_hamiltonian_shards,
                target_density_matrix,
                metrics_dir: str,
                metrics_writer: MetricsWriter,
                config,
                key,
                target_hamiltonian: Optional[paulis.PauliSum] = None,
                beta=None,
                evolved_qhbm_data=None):
  """Trains the model in place; mirrors reference train.py:262-503."""
  method = config.training.method
  is_qmhl = evolved_qhbm_data is not None

  # For QMHL the threaded sampler state is the PAIR (data_chain,
  # model_chain); for VQT it is the model chain alone.  These two helpers
  # keep every consumer (info matrix, mirror divergence, final persist)
  # agnostic to which shape is in play.
  def _model_state(state):
    return state[1] if is_qmhl else state

  def _with_model_state(state, model_state):
    return (state[0], model_state) if is_qmhl else model_state

  if is_qmhl:
    qmhl_fn = qmhl_loss.make_qmhl(evolved_qhbm_data, qhbm_obj)
    data_params = evolved_qhbm_data.params

    def loss_fn(p, k, state):
      # BOTH sampler states are threaded.  Passing None for the data side
      # would make the jitted step bake the data QHBM's chain (a
      # never-burned-in random init) in as a compile-time constant: every
      # step would then estimate <K_model>_data from chains restarted at
      # the same unequilibrated state -- a persistently biased data
      # expectation that never improves.
      return qmhl_fn({"model": p, "data": data_params}, k, state)
  else:
    vqt_fn = vqt_loss.make_vqt(qhbm_obj, target_hamiltonian)
    beta_arr = jnp.asarray(beta, jnp.float32)

    def loss_fn(p, k, state):
      return vqt_fn(p, k, beta_arr, state)

  def value_and_grads(p, k, state):
    def scalar(p_):
      loss, new_state = loss_fn(p_, k, state)
      return loss, new_state

    (loss, new_state), grads = jax.value_and_grad(scalar, has_aux=True)(p)
    return loss, grads, new_state

  params = qhbm_obj.params
  opt_state = optimizer.init(params)
  # Eager chain equilibration BEFORE the jitted step loop: jitted steps skip
  # the fingerprint-based burn-in by design (ebm.py _maybe_burn_in), so
  # without this the configured model.gwg_burnin would never run in any
  # training path and the first optimizer updates would consume gradients
  # estimated from un-equilibrated random-init chains (reference semantics:
  # _ready_inference burns in before the first inference, reference
  # ebm.py:734-743).
  ebm_state = getattr(qhbm_obj.e_inference, "chain_state", None)
  if ebm_state is not None and hasattr(qhbm_obj.e_inference, "burn_in"):
    key, k_burn = jax.random.split(key)
    ebm_state = qhbm_obj.e_inference.burn_in(list(params["theta"]), k_burn,
                                             ebm_state)
  if is_qmhl:
    data_qhbm = getattr(evolved_qhbm_data, "qhbm", None)
    data_e_inf = getattr(data_qhbm, "e_inference", None)
    data_state = getattr(data_e_inf, "chain_state", None)
    if data_state is not None and hasattr(data_e_inf, "burn_in"):
      key, k_burn = jax.random.split(key)
      data_state = data_e_inf.burn_in(list(data_params["theta"]), k_burn,
                                      data_state)
    ebm_state = (data_state, ebm_state)

  # Structural copy with distinct circuit symbol names: used as the
  # observable of the BKM information matrix and as the mirror-descent
  # divergence target (reference train.py:277-278).
  mh_copy = None
  if method in ("natural", "mirror"):
    mh_copy, _ = get_initial_qhbm(target_hamiltonian_shards, config,
                                  "qhbm_copy")

  info_matrix_fn = None
  if method == "natural":
    info_matrix_fn = make_information_matrix(qhbm_obj, mh_copy,
                                             config.training.num_samples)

  @jax.jit
  def vanilla_step(p, o, k, state):
    loss, grads, new_state = value_and_grads(p, k, state)
    updates, o = optimizer.update(grads, o, p)
    return loss, grads, optax.apply_updates(p, updates), o, new_state

  @jax.jit
  def natural_step(p, o, k, state):
    loss, grads, new_state = value_and_grads(p, k, state)
    # Pass the advanced sampler state: the info matrix's EBM covariance
    # block continues the equilibrated persistent chain instead of re-running
    # from the trace-time snapshot every step.
    im = info_matrix_fn(p, k, _model_state(new_state))
    nat_grads, (reg_im, reg, nat_flat) = natural_solve(im, grads,
                                                       config.training)
    updates, o = optimizer.update(nat_grads, o, p)
    return (loss, grads, optax.apply_updates(p, updates), o, new_state,
            (im, reg_im, reg, nat_flat))

  mirror_inner = None
  # Jitted ONCE: constructing jax.jit(value_and_grads) inside the step loop
  # would re-trace and re-compile the outer loss/grads on every step.
  mirror_vag = jax.jit(value_and_grads) if method == "mirror" else None
  if method == "mirror":
    div_fn = vqt_loss.make_vqt(qhbm_obj, mh_copy)

    @jax.jit
    def mirror_inner(p, o, anchor, grads, k, state):
      def inner_loss_fn(p_):
        inner_prod = sum(
            jnp.sum(v * g) for v, g in
            zip(jax.tree_util.tree_leaves(p_),
                jax.tree_util.tree_leaves(grads)))
        div_params = {
            "theta": list(p_["theta"]),
            "phi": list(p_["phi"]),
            "target_energy": [jax.lax.stop_gradient(x)
                              for x in anchor["theta"]],
            "target_circuit": [jax.lax.stop_gradient(x)
                               for x in anchor["phi"]],
        }
        div, new_model_state = div_fn(div_params, k, jnp.float32(1.0),
                                      _model_state(state))
        euclid = 0.5 * sum(
            jnp.sum((v - jax.lax.stop_gradient(c))**2) for v, c in
            zip(jax.tree_util.tree_leaves(p_),
                jax.tree_util.tree_leaves(anchor)))
        alpha = config.training.euclidean_div_factor
        inner = inner_prod + 1.0 / config.training.learning_rate * (
            (1.0 - alpha) * div + alpha * euclid)
        return inner, (inner_prod, div, euclid,
                       _with_model_state(state, new_model_state))

      (inner, aux), igrads = jax.value_and_grad(inner_loss_fn,
                                                has_aux=True)(p)
      updates, o = optimizer.update(igrads, o, p)
      return optax.apply_updates(p, updates), o, inner, aux, igrads

  log = config.logging
  profiler_active = False
  inner_writer = None
  for step in range(num_steps):
    # jax.profiler trace of the first few steady-state steps (skip step 0,
    # which includes compilation).  The reference had no profiling at all
    # (SURVEY.md section 5); traces land under <metrics_dir>/profile.
    if getattr(log, "profiler_steps", 0) > 0 and step == 1:
      jax.profiler.start_trace(os.path.join(metrics_dir, "profile"))
      profiler_active = True
    if profiler_active and step == 1 + log.profiler_steps:
      jax.profiler.stop_trace()
      profiler_active = False
    key, k_step = jax.random.split(key)
    extra = None
    if method == "vanilla":
      loss, grads, params, opt_state, ebm_state = vanilla_step(
          params, opt_state, k_step, ebm_state)
    elif method == "natural":
      (loss, grads, params, opt_state, ebm_state, extra) = natural_step(
          params, opt_state, k_step, ebm_state)
    elif method == "mirror":
      loss, grads, ebm_state = mirror_vag(params, k_step, ebm_state)
      anchor = jax.tree_util.tree_map(jnp.asarray, params)
      # One shared inner-loop writer for the whole run (the reference logs
      # each outer step to its own summary subdir, train.py:375-451, which
      # litters thousands of directories on long runs); the global inner
      # index `step * num_inner_steps + inner_step` keeps per-outer-step
      # trajectories separable.
      if inner_writer is None:
        inner_writer = MetricsWriter(
            os.path.join(metrics_dir, "train_inner"),
            tensorboard=bool(log.tensorboard))
      for inner_step in range(config.training.num_inner_steps):
        key, k_inner = jax.random.split(key)
        params, opt_state, inner, aux, igrads = mirror_inner(
            params, opt_state, anchor, grads, k_inner, ebm_state)
        inner_prod, div, euclid, ebm_state = aux
        inner_idx = step * config.training.num_inner_steps + inner_step
        if log.inner_loss:
          inner_writer.scalar("inner_loss", inner, inner_idx)
        if log.inner_prod:
          inner_writer.scalar("inner_prod", inner_prod, inner_idx)
        if log.div:
          inner_writer.scalar("div", div, inner_idx)
          inner_writer.scalar("euclidean_div", euclid, inner_idx)
        if log.inner_loss_grads:
          inner_writer.histogram("inner_loss_grads",
                                 _flat(jax.tree_util.tree_leaves(igrads)),
                                 inner_idx)
      # Per-outer-step flush: the shared writer must not be less durable
      # than the per-step writers it replaced -- a crash/kill mid-run keeps
      # every completed outer step's inner trajectory on disk.
      inner_writer.flush()
    else:
      raise ValueError(method)

    # -- metrics (reference train.py:341-500) --------------------------------
    if log.loss:
      metrics_writer.scalar("loss", loss, step)
    if log.variables:
      metrics_writer.histogram("variables",
                               _flat(jax.tree_util.tree_leaves(params)), step)
      metrics_writer.histogram("energy_variables", _flat(params["theta"]),
                               step)
      metrics_writer.histogram("circuit_variables", _flat(params["phi"]),
                               step)
    if log.grads:
      fg = _flat(jax.tree_util.tree_leaves(grads))
      metrics_writer.histogram("grads", fg, step)
      metrics_writer.scalar("grad_norm",
                            np.linalg.norm(fg, ord=log.norm_ord), step)
      metrics_writer.scalar(
          "energy_grad_norm",
          np.linalg.norm(_flat(grads["theta"]), ord=log.norm_ord), step)
      metrics_writer.scalar(
          "circuit_grad_norm",
          np.linalg.norm(_flat(grads["phi"]), ord=log.norm_ord), step)
    if method == "natural" and extra is not None:
      im, reg_im, reg, nat_flat = extra
      if log.info_matrix:
        eigvals = np.linalg.eigvalsh(np.asarray(im))
        metrics_writer.histogram("info_matrix_eigvals", eigvals, step)
        metrics_writer.scalar("info_matrix_min_eigval", eigvals.min(), step)
        metrics_writer.scalar("info_matrix_max_eigval", eigvals.max(), step)
        metrics_writer.scalar(
            "info_matrix_cond_number",
            abs(eigvals.max()) / max(abs(eigvals.min()), 1e-30), step)
      if log.reg_info_matrix:
        metrics_writer.scalar("reg", reg, step)
      if log.natural_grads:
        metrics_writer.histogram("natural_grads", np.asarray(nat_flat), step)
        metrics_writer.scalar(
            "natural_grad_norm",
            np.linalg.norm(np.asarray(nat_flat), ord=log.norm_ord), step)

    if step % log.expensive_downsample == 0 or step == num_steps - 1:
      qhbm_obj.set_params(params)
      if log.fidelity:
        fid = qhbm_utils.fidelity(modular_hamiltonian, target_density_matrix)
        metrics_writer.scalar("fidelity", fid, step)
      if log.relative_entropy:
        dm = qhbm_utils.density_matrix(modular_hamiltonian)
        if is_qmhl:
          rel = baselines_utils.relative_entropy(target_density_matrix, dm)
        else:
          rel = baselines_utils.relative_entropy(dm, target_density_matrix)
        metrics_writer.scalar("relative_entropy", rel, step)
      if log.density_matrix:
        img = baselines_utils.density_matrix_to_image(
            qhbm_utils.density_matrix(modular_hamiltonian))
        metrics_writer.image("density_matrix", img, step)

  if profiler_active:
    jax.profiler.stop_trace()
  if inner_writer is not None:
    inner_writer.close()
  qhbm_obj.set_params(params)
  final_chain = _model_state(ebm_state) if ebm_state is not None else None
  if hasattr(qhbm_obj.e_inference, "_chain_state") and final_chain is not None:
    qhbm_obj.e_inference._chain_state = final_chain
  metrics_writer.flush()
  return params


# ---------------------------------------------------------------------------
# Experiment loops (reference train.py:506-678)
# ---------------------------------------------------------------------------

def run_experiment(config, output_dir: str, seed: int = 42):
  """Full experiment: VQT beta sweep or QVARTZ time evolution."""
  key = jax.random.PRNGKey(seed)
  results_dir = os.path.join(output_dir, "results")
  os.makedirs(results_dir, exist_ok=True)
  with open(os.path.join(results_dir, "config.json"), "w") as f:
    json.dump(config.to_dict(), f, default=str)

  bias = round(config.dataset.bias, config.dataset.digits)
  x_h, z_h = get_tfim_hamiltonian(bias, config)
  target_hamiltonian_shards = [x_h, z_h]
  target_hamiltonian = paulis.PauliSum(
      x_h.codes + z_h.codes, paulis.concat_coeffs([x_h.coeffs, z_h.coeffs]),
      x_h.num_qubits)
  # Host numpy: the exact dense target math is metrics-only, and complex
  # host<->device transfers are unavailable on some backends.
  target_matrix = np.asarray(target_hamiltonian.dense(), np.complex128)

  if config.training.loss == "vqt":
    betas = np.linspace(config.dataset.beta_min, config.dataset.beta_max,
                        config.dataset.beta_steps)
    iterates = [round(float(b), config.dataset.digits) for b in betas]
  elif config.training.loss == "qvartz":
    unitary = get_tfim_unitary(x_h, z_h, config)
    iterates = [round(float(config.dataset.beta), config.dataset.digits)
                ] + [unitary] * config.dataset.time_steps
  else:
    raise ValueError(config.training.loss)

  checkpointer = None
  if config.logging.checkpoint:
    try:
      import orbax.checkpoint as ocp
      checkpointer = ocp.PyTreeCheckpointer()
    except Exception:
      checkpointer = None

  for trial in range(config.training.num_trials):
    modular_hamiltonian, qhbm_obj = get_initial_qhbm(
        target_hamiltonian_shards, config, "qhbm", seed=seed + trial)
    target_dm = None
    prev_params = None

    for sequence_step in range(len(iterates)):
      is_vqt = config.training.loss == "vqt" or sequence_step == 0
      optimizer = get_optimizer(
          config.training.optimizer,
          config.training.inner_learning_rate
          if config.training.method == "mirror"
          else config.training.learning_rate)

      evolved_qhbm_data = None
      if is_vqt:
        beta = iterates[sequence_step]
        target_dm, target_entropy, target_log_z = compute_data_point_metrics(
            beta=beta, target_hamiltonian_matrix=target_matrix)
        data_point_label = f"beta_{str(beta).replace('.', 'p')}"
      else:
        evolution_time = round(
            sequence_step * config.dataset.total_time /
            config.dataset.time_steps, config.dataset.digits)
        unitary_matrix = _circuit_matrix(iterates[sequence_step])
        target_dm, target_entropy = compute_data_point_metrics(
            prev_target_density_matrix=target_dm,
            channel_matrix=unitary_matrix)
        target_log_z = None
        data_point_label = f"time_{str(evolution_time).replace('.', 'p')}"

        # Build the evolved data QHBM: previous model + channel circuit
        # (reference train.py:279-293).  Only when training: the evolved
        # data feeds QMHL optimization and needs the previous step's trained
        # parameters, which don't exist in the dataset-only mode
        # (training.train=False) -- the reference likewise builds its data
        # model inside the train gate (reference train.py:600-607), logging
        # only the exact target-state metrics otherwise.
        if config.training.train:
          prev_mh, prev_qhbm = get_initial_qhbm(target_hamiltonian_shards,
                                                config, "prev_qhbm")
          prev_qhbm.set_params(prev_params)
          channel_circuit = models.QuantumCircuit(
              iterates[sequence_step], (), [], [], name="channel")
          evolved_circuit = prev_qhbm.q_inference.circuit + channel_circuit
          if config.model.qnn == "analytic":
            evolved_qnn = qnn.AnalyticQuantumInference(evolved_circuit)
          else:
            evolved_qnn = qnn.SampledQuantumInference(
                evolved_circuit, config.training.num_samples)
          evolved_qhbm = qhbm.QHBM(prev_qhbm.e_inference, evolved_qnn)
          evolved_qhbm_data = data_module.QHBMData(evolved_qhbm)

      if trial == 0:
        dp_writer = MetricsWriter(
            os.path.join(results_dir, "metrics", data_point_label,
                         "data_point"),
            tensorboard=bool(config.logging.tensorboard))
        dp_writer.scalar("target_entropy", target_entropy, 0)
        if is_vqt:
          dp_writer.scalar("target_log_partition_function", target_log_z, 0)
        if config.logging.density_matrix:
          dp_writer.image("target_density_matrix",
                          baselines_utils.density_matrix_to_image(target_dm),
                          0)
        dp_writer.close()

      if config.training.train:
        if sequence_step > 0 and config.training.seq_init == "random":
          modular_hamiltonian, qhbm_obj = get_initial_qhbm(
              target_hamiltonian_shards, config, "qhbm",
              seed=seed + trial + 1000 * sequence_step)

        # Advance the key stream BEFORE the resume check so a resumed run
        # replays the same per-data-point keys as an uninterrupted one.
        key, k_train = jax.random.split(key)
        ckpt_dir = os.path.join(
            os.path.abspath(results_dir), "checkpoints", data_point_label,
            f"trial_{trial}")

        # Kill-and-resume: a finished data point's checkpoint short-circuits
        # its training; the restored parameters seed the next sequence step
        # (QVARTZ re-enters at the first unfinished data point).  The
        # reference has no persistence at all (SURVEY.md section 5).
        if (checkpointer is not None and config.training.get("resume", True)
            and os.path.isdir(ckpt_dir)):
          template = jax.tree_util.tree_map(np.asarray, qhbm_obj.params)
          restored = checkpointer.restore(ckpt_dir, item=template)
          prev_params = jax.tree_util.tree_map(jnp.asarray, restored)
          qhbm_obj.set_params(prev_params)
          print(f"[{data_point_label}] trial {trial}: restored checkpoint, "
                "skipping training")
          continue

        model_label = f"train_model_trial_{trial}"
        model_dir = os.path.join(results_dir, "metrics", data_point_label,
                                 model_label)
        writer = MetricsWriter(model_dir,
                               tensorboard=bool(config.logging.tensorboard))
        t0 = time.time()
        num_steps = (config.training.init_steps if sequence_step == 0 else
                     config.training.num_steps)
        prev_params = train_model(
            qhbm_obj, modular_hamiltonian, optimizer, num_steps,
            target_hamiltonian_shards, target_dm, model_dir, writer, config,
            k_train,
            target_hamiltonian=target_hamiltonian if is_vqt else None,
            beta=beta if is_vqt else None,
            evolved_qhbm_data=evolved_qhbm_data)
        target_loss = (-target_log_z if is_vqt else target_entropy)
        writer.scalar("target_loss", target_loss, max(num_steps - 1, 0))
        writer.close()
        print(f"[{data_point_label}] trial {trial}: {num_steps} steps in "
              f"{(time.time() - t0) / 60.0:.2f} min")

        if checkpointer is not None:
          checkpointer.save(ckpt_dir,
                            jax.tree_util.tree_map(np.asarray, prev_params),
                            force=True)

  hparams_writer = MetricsWriter(os.path.join(results_dir, "hparams"),
                                 tensorboard=bool(config.logging.tensorboard))
  hparams_writer.hparams({
      "loss": config.training.loss,
      "method": config.training.method,
      "optimizer": config.training.optimizer,
      "seq_init": config.training.seq_init,
  })
  hparams_writer.close()
  return results_dir


def _circuit_matrix(circuit: ir.Circuit) -> np.ndarray:
  from qhbmlib_tpu import utils
  from qhbmlib_tpu.ops import statevector as sv
  return utils.to_host_complex(
      sv.unitary(circuit, jnp.zeros([circuit.num_symbols], jnp.float32)))


def main(argv=None):
  from absl import app, flags, logging as absl_logging
  from ml_collections import config_flags

  config_flag = config_flags.DEFINE_config_file(
      "config", os.path.join(os.path.dirname(__file__), "config.py"),
      "Training configuration file.")
  output_flag = flags.DEFINE_string("output_dir", "/tmp/qhbm_logs/exp",
                                    "Output directory.")
  seed_flag = flags.DEFINE_integer("seed", 42, "Random seed.")
  distributed_flag = flags.DEFINE_bool(
      "distributed", False,
      "Join a multi-host slice via jax.distributed.initialize before "
      "training (parallel/topology.py).")
  mesh_flag = flags.DEFINE_string(
      "mesh", None,
      "DxS ('data'x'state') mesh plan from the launcher's topology "
      "inference; recorded alongside the config for the run.")
  hosts_flag = flags.DEFINE_integer(
      "num_hosts", 1, "Host count of the slice (informational; the real "
      "value comes from the TPU metadata at distributed init).")

  def run(argv):
    del argv
    if distributed_flag.value:
      from qhbmlib_tpu.parallel import topology
      n_dev = topology.initialize_distributed()
      absl_logging.info("distributed init: %d global devices over %d hosts",
                        n_dev, hosts_flag.value)
    if mesh_flag.value:
      absl_logging.info("mesh plan: %s", mesh_flag.value)
    config = config_flag.value
    out = os.environ.get("AIP_TENSORBOARD_LOG_DIR", output_flag.value)
    absl_logging.info("Saving results to: %s", out)
    run_experiment(config, out, seed_flag.value)

  app.run(run)


if __name__ == "__main__":
  main()
