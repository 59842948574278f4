"""End-to-end smoke tests of the experiment harness.

Mirrors the reference's implicit contract that `baselines/train.py` runs the
full VQT and QVARTZ loops for every training method; scaled down to 2 qubits
and a couple of steps so CI stays fast.
"""

import json
import os

import numpy as np
import pytest

from baselines import config as config_lib
from baselines import train


def _small_config(loss, method, **overrides):
  config = config_lib.get_config()
  config.dataset.num_rows = 2
  config.dataset.num_cols = 1
  config.dataset.beta_steps = 2
  config.dataset.time_steps = 2
  config.model.circuit_layers = 1
  config.training.num_samples = 30
  config.training.init_steps = 2
  config.training.num_steps = 2
  config.training.num_inner_steps = 2
  config.training.loss = loss
  config.training.method = method
  config.logging.expensive_downsample = 2
  config.logging.tensorboard = False
  config.logging.checkpoint = False
  for k, v in overrides.items():
    node = config
    *path, leaf = k.split(".")
    for p in path:
      node = getattr(node, p)
    setattr(node, leaf, v)
  return config


def _read_metrics(results_dir, label, tag):
  path = os.path.join(results_dir, "metrics", label, "train_model_trial_0",
                      "metrics.jsonl")
  out = []
  with open(path) as f:
    for line in f:
      rec = json.loads(line)
      if rec.get("tag") == tag:
        out.append(rec["value"])
  return out


@pytest.mark.parametrize("method", ["vanilla", "natural", "mirror"])
def test_vqt_methods_run(tmp_path, method):
  config = _small_config("vqt", method)
  results = train.run_experiment(config, str(tmp_path / method), seed=2)
  losses = _read_metrics(results, "beta_0p5", "loss")
  assert len(losses) == 2
  assert all(np.isfinite(l) for l in losses)
  fid = _read_metrics(results, "beta_0p5", "fidelity")
  assert fid and 0.0 <= fid[-1] <= 1.0 + 1e-6


def test_natural_solve_block_order():
  """The natural-gradient flatten order must match the info matrix's
  [theta; phi] block layout.  Regression: ravel_pytree on the params dict
  sorts keys ('phi' < 'theta'), silently pairing circuit gradients with
  EBM-metric rows (shapes match, no error)."""
  import jax.numpy as jnp
  import ml_collections

  tc = ml_collections.ConfigDict()
  tc.info_matrix_eigval_reg = False
  tc.info_matrix_reg = 0.0
  tc.lstsq_fast = False
  tc.lstsq_l2_regularizer = 0.0

  # Block-diagonal metric with distinct scales: theta entries (Pt=2) are
  # divided by 2, phi entries (Pp=3) by 10.  A permuted flatten would divide
  # the wrong blocks.
  im = jnp.diag(jnp.asarray([2.0, 2.0, 10.0, 10.0, 10.0], jnp.float32))
  grads = {"theta": [jnp.asarray([2.0, 4.0])],
           "phi": [jnp.asarray([10.0, 20.0, 30.0])]}
  nat, _ = train.natural_solve(im, grads, tc)
  np.testing.assert_allclose(np.asarray(nat["theta"][0]), [1.0, 2.0],
                             rtol=1e-5)
  np.testing.assert_allclose(np.asarray(nat["phi"][0]), [1.0, 2.0, 3.0],
                             rtol=1e-5)


def test_qvartz_runs(tmp_path):
  config = _small_config("qvartz", "vanilla")
  results = train.run_experiment(config, str(tmp_path / "qvartz"), seed=3)
  # One thermal init point + time_steps evolution points.
  labels = sorted(os.listdir(os.path.join(results, "metrics")))
  assert any(l.startswith("beta_") for l in labels)
  assert sum(l.startswith("time_") for l in labels) == 2
  losses = _read_metrics(results, "time_1p5", "loss")
  assert len(losses) == 2 and all(np.isfinite(l) for l in losses)


def test_vanilla_vqt_converges_toward_target(tmp_path):
  """Longer vanilla run: the loss should approach -logZ from above and
  fidelity should rise (the reference's self-consistency contract)."""
  config = _small_config("vqt", "vanilla")
  config.dataset.beta_steps = 1
  config.dataset.beta_min = 1.0
  config.dataset.beta_max = 1.0
  config.model.circuit_layers = 2
  config.training.init_steps = 60
  config.training.learning_rate = 0.05
  config.logging.expensive_downsample = 59
  results = train.run_experiment(config, str(tmp_path / "conv"), seed=4)
  losses = _read_metrics(results, "beta_1p0", "loss")
  fid = _read_metrics(results, "beta_1p0", "fidelity")
  assert losses[-1] < losses[0]
  assert fid[-1] > 0.9


@pytest.mark.slow
def test_natural_vqt_converges_toward_target(tmp_path):
  """Natural gradient actually trains (regression for the silent flatten
  permutation in the metric solve, which produced garbage directions while
  logging plausible metrics)."""
  config = _small_config("vqt", "natural")
  config.dataset.beta_steps = 1
  config.dataset.beta_min = 1.0
  config.dataset.beta_max = 1.0
  config.model.circuit_layers = 2
  config.training.init_steps = 40
  config.training.learning_rate = 0.05
  config.logging.expensive_downsample = 39
  results = train.run_experiment(config, str(tmp_path / "natconv"), seed=4)
  losses = _read_metrics(results, "beta_1p0", "loss")
  fid = _read_metrics(results, "beta_1p0", "fidelity")
  assert losses[-1] < losses[0]
  assert fid[-1] > 0.85


@pytest.mark.slow
def test_mirror_vqt_converges_toward_target(tmp_path):
  """Mirror descent trains end to end (also guards the hoisted outer
  value-and-grad jit: re-tracing per step would still pass a smoke test)."""
  config = _small_config("vqt", "mirror")
  config.dataset.beta_steps = 1
  config.dataset.beta_min = 1.0
  config.dataset.beta_max = 1.0
  config.model.circuit_layers = 2
  config.training.init_steps = 60
  # The prox subproblem needs enough inner iterations to track the outer
  # gradient: 5 plateaus near fid 0.78 at this scale, 10 reaches 0.92.
  config.training.num_inner_steps = 10
  config.logging.expensive_downsample = 59
  results = train.run_experiment(config, str(tmp_path / "mirconv"), seed=5)
  losses = _read_metrics(results, "beta_1p0", "loss")
  fid = _read_metrics(results, "beta_1p0", "fidelity")
  assert losses[-1] < losses[0]
  assert fid[-1] > 0.8


def test_gwg_natural_runs(tmp_path):
  """GWG EBM + natural gradient: the info matrix's EBM covariance block
  samples through the threaded chain state (no trace-time snapshot)."""
  config = _small_config("vqt", "natural", **{
      "model.ebm": "gwg",
      "model.gwg_burnin": 20,
  })
  results = train.run_experiment(config, str(tmp_path / "gwgnat"), seed=6)
  losses = _read_metrics(results, "beta_0p5", "loss")
  assert len(losses) == 2 and all(np.isfinite(l) for l in losses)


def test_qvartz_gwg_runs(tmp_path):
  """QVARTZ with a GWG EBM: both the DATA-side chain (the evolved QHBM's
  sampler) and the model-side chain are burned in eagerly and threaded
  through the jitted QMHL step as real state -- neither may be baked in as
  a trace-time constant (a random unequilibrated chain would bias
  <K_model>_data on every step)."""
  config = _small_config("qvartz", "vanilla", **{
      "model.ebm": "gwg",
      "model.gwg_burnin": 20,
  })
  results = train.run_experiment(config, str(tmp_path / "qvartz_gwg"),
                                 seed=7)
  labels = sorted(os.listdir(os.path.join(results, "metrics")))
  assert sum(l.startswith("time_") for l in labels) == 2
  losses = _read_metrics(results, "time_1p5", "loss")
  assert len(losses) == 2 and all(np.isfinite(l) for l in losses)


def test_qvartz_dataset_only_mode(tmp_path):
  """training.train=False ('only simulate the dataset', reference
  config.py:52-53): the QVARTZ sequence must walk every time step logging
  exact target metrics without building the (training-only) evolved data
  model -- this used to crash on set_params(None) at the second step."""
  config = _small_config("qvartz", "vanilla", **{"training.train": False})
  results = train.run_experiment(config, str(tmp_path / "nodata"), seed=8)
  labels = sorted(os.listdir(os.path.join(results, "metrics")))
  assert sum(l.startswith("time_") for l in labels) == 2
  for label in labels:
    path = os.path.join(results, "metrics", label, "data_point",
                        "metrics.jsonl")
    with open(path) as f:
      tags = [json.loads(line)["tag"] for line in f]
    assert "target_entropy" in tags
    # No training artifacts in dataset-only mode.
    assert not os.path.isdir(
        os.path.join(results, "metrics", label, "train_model_trial_0"))


def test_kill_and_resume(tmp_path, monkeypatch):
  """An interrupted QVARTZ sequence resumes from the latest checkpoint:
  finished data points are restored (not retrained) and the sequence
  re-enters at the first unfinished point with the restored parameters."""
  pytest.importorskip("orbax.checkpoint")
  out = str(tmp_path / "resume")
  config = _small_config("qvartz", "vanilla",
                         **{"logging.checkpoint": True})

  # "Kill" mid-sequence: preempt the process after the first data point's
  # training (its checkpoint is already on disk).
  calls = {"n": 0}
  orig_train_model = train.train_model

  def preempting_train_model(*args, **kwargs):
    calls["n"] += 1
    if calls["n"] > 1:
      raise RuntimeError("simulated preemption")
    return orig_train_model(*args, **kwargs)

  monkeypatch.setattr(train, "train_model", preempting_train_model)
  with pytest.raises(RuntimeError, match="simulated preemption"):
    train.run_experiment(config, out, seed=5)
  monkeypatch.setattr(train, "train_model", orig_train_model)

  ckpt_root = os.path.join(out, "results", "checkpoints")
  (beta_label,) = os.listdir(ckpt_root)
  saved = os.path.join(ckpt_root, beta_label, "trial_0")
  assert os.path.isdir(saved)
  mtime = os.path.getmtime(saved)

  # Restart with the full sequence: the beta point must be restored (its
  # checkpoint untouched) and the time points trained.
  results = train.run_experiment(config, out, seed=5)
  assert os.path.getmtime(saved) == mtime  # not retrained/resaved
  labels = sorted(os.listdir(os.path.join(results, "metrics")))
  assert sum(l.startswith("time_") for l in labels) == 2
  losses = _read_metrics(results, "time_1p5", "loss")
  assert len(losses) == 2 and all(np.isfinite(l) for l in losses)
  # The restored-then-trained checkpoints exist for every data point.
  assert len(os.listdir(ckpt_root)) == 3

  # A third run restores everything and trains nothing new.
  mtimes = {l: os.path.getmtime(os.path.join(ckpt_root, l, "trial_0"))
            for l in os.listdir(ckpt_root)}
  train.run_experiment(config, out, seed=5)
  for l, t in mtimes.items():
    assert os.path.getmtime(os.path.join(ckpt_root, l, "trial_0")) == t


def test_sweep_launcher_dry(tmp_path):
  from baselines import launch
  sweep = config_lib.get_sweep()
  assert len(sweep) == 2 * 3 * 2 * 2
  jobs = launch.build_jobs("baselines/config.py", str(tmp_path), sweep[:3],
                           seed=1)
  assert len(jobs) == 3
  for job_dir, cmd in jobs:
    assert "--config=baselines/config.py" in cmd
    assert any(a.startswith("--config.training.loss=") for a in cmd)


def test_tpu_topology_inference(tmp_path):
  """Topology string -> chips/hosts/mesh plan, and job-command injection
  (parity with reference launch.py:126-139,202-214)."""
  from baselines import launch
  chips, hosts, plan = launch.tpu_topology_info("2x2")
  assert chips == 4 and hosts == 1 and plan == {"data": 1, "state": 4}
  chips, hosts, plan = launch.tpu_topology_info("4x4")
  assert chips == 16 and hosts == 4 and plan == {"data": 1, "state": 16}
  chips, hosts, plan = launch.tpu_topology_info("2x2x4")
  assert chips == 16 and hosts == 4
  with pytest.raises(ValueError):
    launch.tpu_topology_info("0x2")

  sweep = config_lib.get_sweep()[:1]
  jobs = launch.build_jobs("baselines/config.py", str(tmp_path), sweep,
                           seed=1, tpu_topology="4x4")
  (job_dir, cmd), = jobs
  assert "--distributed" in cmd
  assert "--mesh=1x16" in cmd
  assert "--num_hosts=4" in cmd
