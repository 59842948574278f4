"""Learn the thermal state of a transverse-field Ising chain with VQT.

The reference library's headline experiment (reference baselines/train.py:
262-503, vqt_loss.py:25-55), as a ~60-line standalone script: a QHBM
(Bernoulli EBM + hardware-efficient ansatz) is trained to minimize the VQT
free-energy loss beta<H> - S against a 4-qubit 1D TFIM, and fidelity to the
exact thermal state is reported.

Runs in under a minute:  python examples/vqt_thermal_state.py
Env overrides: QHBM_EXAMPLE_STEPS (default 150); QHBM_EXAMPLE_PLATFORM=cpu
to pin the backend (the plain JAX_PLATFORMS env var is ignored when an
accelerator plugin is present).
"""

import os
import pathlib
import sys

# Runnable from a source checkout without installation (pip install -e .
# also works; PYTHONPATH is avoided because it breaks some accelerator
# plugin discovery -- see .claude/skills/verify or docs/migration.md).
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

if os.environ.get("QHBM_EXAMPLE_PLATFORM"):  # pragma: no cover
  jax.config.update("jax_platforms", os.environ["QHBM_EXAMPLE_PLATFORM"])

import jax.numpy as jnp
import numpy as np
import optax

from qhbmlib_tpu import inference, models, nn
from qhbmlib_tpu.inference import qhbm_utils
from qhbmlib_tpu.models import circuit_utils
from qhbmlib_tpu.ops import paulis


def tfim_1d(n, h=1.0, j=1.0):
  """H = -h sum X_i - j sum Z_i Z_{i+1} (open chain)."""
  return paulis.tfim_1d(n, h, j)


def main():
  n, beta = 4, 1.0
  steps = int(os.environ.get("QHBM_EXAMPLE_STEPS", 150))

  energy = models.BernoulliEnergy(list(range(n)), nn.RandomUniform(-1, 1, 7))
  e_inf = inference.AnalyticEnergyInference(energy, 500, initial_seed=7,
                                            exact=True)
  circuit = models.DirectQuantumCircuit(
      circuit_utils.hardware_efficient_ansatz(n, num_layers=3),
      nn.RandomUniform(-0.5, 0.5, 8))
  q_inf = inference.AnalyticQuantumInference(circuit)
  model = inference.QHBM(e_inf, q_inf)

  target = tfim_1d(n)
  loss_fn = inference.make_vqt(model, target)
  opt = optax.adam(5e-2)

  @jax.jit
  def train_step(params, opt_state, key):
    (loss, _), grads = jax.value_and_grad(
        lambda p: loss_fn(p, key, beta), has_aux=True)(params)
    updates, opt_state = opt.update(grads, opt_state)
    return optax.apply_updates(params, updates), opt_state, loss

  params, opt_state = model.params, opt.init(model.params)
  key = jax.random.PRNGKey(0)
  for step in range(steps):
    key, sub = jax.random.split(key)
    params, opt_state, loss = train_step(params, opt_state, sub)
    if step % 25 == 0 or step == steps - 1:
      print(f"step {step:4d}  vqt loss {float(loss):+.6f}")

  # Push the trained parameters back into the stateful model and score it
  # against the exact thermal state exp(-beta H)/Z.
  model.set_params(params)
  h_dense = np.asarray(target.dense())
  evals, evecs = np.linalg.eigh(h_dense)
  w = np.exp(-beta * (evals - evals.min()))
  sigma = (evecs * (w / w.sum())) @ evecs.conj().T
  fid = float(qhbm_utils.fidelity(model.modular_hamiltonian, sigma))
  print(f"fidelity to exact thermal state: {fid:.4f}")
  return fid


if __name__ == "__main__":
  main()
