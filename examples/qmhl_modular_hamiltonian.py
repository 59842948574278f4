"""Learn a model of unknown quantum data with QMHL.

The reference's second variational loss (reference qmhl_loss.py:21-34,
baselines/train.py QVARTZ loop): given quantum DATA (here, the exact
thermal state of a Heisenberg chain served by `ThermalStateData`), train a
QHBM so its modular Hamiltonian matches the data's -- the quantum
cross-entropy <K_model>_data + logZ_model is minimized exactly when
rho_model == rho_data, at which point the loss equals the data's entropy.

Runs in under a minute:  python examples/qmhl_modular_hamiltonian.py
Env overrides: QHBM_EXAMPLE_STEPS (default 200); QHBM_EXAMPLE_PLATFORM=cpu
to pin the backend.
"""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

if os.environ.get("QHBM_EXAMPLE_PLATFORM"):  # pragma: no cover
  jax.config.update("jax_platforms", os.environ["QHBM_EXAMPLE_PLATFORM"])

import numpy as np
import optax

from qhbmlib_tpu import data as qdata
from qhbmlib_tpu import inference, models, nn
from qhbmlib_tpu.inference import qhbm_utils
from qhbmlib_tpu.models import circuit_utils
from qhbmlib_tpu.ops import paulis


def heisenberg_1d(n, j=1.0):
  terms = []
  for q in range(n - 1):
    for p in ("X", "Y", "Z"):
      terms.append((j, {q: p, q + 1: p}))
  return paulis.pauli_sum_from_strings(n, terms)


def thermal_state(ham, beta):
  evals, evecs = np.linalg.eigh(np.asarray(ham.dense()))
  w = np.exp(-beta * (evals - evals.min()))
  return (evecs * (w / w.sum())) @ evecs.conj().T


def main():
  n, beta = 3, 0.8
  steps = int(os.environ.get("QHBM_EXAMPLE_STEPS", 200))

  sigma = thermal_state(heisenberg_1d(n), beta)
  data = qdata.ThermalStateData(sigma)

  energy = models.KOBE(list(range(n)), order=2,
                       initializer=nn.RandomUniform(-0.5, 0.5, 3))
  e_inf = inference.AnalyticEnergyInference(energy, 500, initial_seed=4,
                                            exact=True)
  circuit = models.DirectQuantumCircuit(
      circuit_utils.hardware_efficient_ansatz(n, num_layers=3),
      nn.RandomUniform(-0.5, 0.5, 5))
  model = inference.QHBM(e_inf, inference.AnalyticQuantumInference(circuit))

  loss_fn = inference.make_qmhl(data, model)
  opt = optax.adam(5e-2)
  params = {"model": model.params, "data": data.params}
  opt_state = opt.init(params)

  @jax.jit
  def train_step(params, opt_state, key):
    (loss, _), grads = jax.value_and_grad(
        lambda p: loss_fn(p, key), has_aux=True)(params)
    updates, opt_state = opt.update(grads, opt_state)
    return optax.apply_updates(params, updates), opt_state, loss

  key = jax.random.PRNGKey(1)
  for step in range(steps):
    key, sub = jax.random.split(key)
    params, opt_state, loss = train_step(params, opt_state, sub)
    if step % 25 == 0 or step == steps - 1:
      print(f"step {step:4d}  qmhl loss {float(loss):+.6f}")

  # At the optimum the QMHL loss equals the data entropy.
  evals = np.linalg.eigvalsh(sigma)
  entropy = float(-(evals * np.log(np.maximum(evals, 1e-12))).sum())
  print(f"data entropy (optimum loss): {entropy:+.6f}")

  model.set_params(params["model"])
  fid = float(qhbm_utils.fidelity(model.modular_hamiltonian, sigma))
  print(f"fidelity to data state: {fid:.4f}")
  return fid


if __name__ == "__main__":
  main()
