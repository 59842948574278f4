"""VQT training with the statevector amplitude-sharded over a device mesh.

What the reference could never do (it caps at single-host qsim; SURVEY.md
section 2.3): split the 2^n-amplitude statevector across the 'state' axis of
a `jax.sharding.Mesh` so qubit counts beyond one chip's HBM become reachable
-- two-qubit gates on sharded qubits turn into ICI `ppermute` partner
exchanges, expectations finish with a `psum`.  The sharded engine is a
drop-in: swap `AnalyticQuantumInference` for `ShardedQuantumInference` and
everything else (losses, gradients, optimizers) is unchanged.

On real hardware the mesh spans TPU chips; this example also runs anywhere
by forcing 8 virtual CPU devices (the standard JAX trick), which is what
its smoke test does:

  QHBM_EXAMPLE_PLATFORM=cpu QHBM_EXAMPLE_VIRTUAL_DEVICES=8 \
      python examples/multichip_sharded_vqt.py
"""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

if os.environ.get("QHBM_EXAMPLE_PLATFORM"):  # pragma: no cover
  jax.config.update("jax_platforms", os.environ["QHBM_EXAMPLE_PLATFORM"])
if os.environ.get("QHBM_EXAMPLE_VIRTUAL_DEVICES"):  # pragma: no cover
  jax.config.update("jax_num_cpu_devices",
                    int(os.environ["QHBM_EXAMPLE_VIRTUAL_DEVICES"]))

import optax

from qhbmlib_tpu import inference, models, nn, parallel
from qhbmlib_tpu.models import circuit_utils
from qhbmlib_tpu.ops import paulis


def tfim_1d(n, h=1.0, j=1.0):
  """H = -h sum X_i - j sum Z_i Z_{i+1} (open chain)."""
  return paulis.tfim_1d(n, h, j)


def main():
  n, beta = 8, 1.2
  steps = int(os.environ.get("QHBM_EXAMPLE_STEPS", 30))

  # ('data', 'state') mesh: amplitude-shard each statevector over 'state'
  # (power of two), split the unique-bitstring circuit batch over 'data'.
  n_dev = len(jax.devices())
  state = n_dev & (-n_dev)  # largest power of two dividing the device count
  mesh = parallel.make_mesh(data=n_dev // state, state=state)
  print(f"mesh: {dict(mesh.shape)} over {n_dev} {jax.devices()[0].platform} "
        "devices")

  energy = models.BernoulliEnergy(list(range(n)), nn.RandomUniform(-1, 1, 2))
  e_inf = inference.BernoulliEnergyInference(energy, 200, initial_seed=2,
                                             max_unique_samples=32)
  circuit = models.DirectQuantumCircuit(
      circuit_utils.hardware_efficient_ansatz(n, num_layers=2),
      nn.RandomUniform(-0.5, 0.5, 3))
  q_inf = parallel.ShardedQuantumInference(circuit, mesh)  # the only change
  model = inference.QHBM(e_inf, q_inf)

  loss_fn = inference.make_vqt(model, tfim_1d(n))
  opt = optax.adam(5e-2)

  @jax.jit
  def train_step(params, opt_state, key):
    (loss, _), grads = jax.value_and_grad(
        lambda p: loss_fn(p, key, beta), has_aux=True)(params)
    updates, opt_state = opt.update(grads, opt_state)
    return optax.apply_updates(params, updates), opt_state, loss

  params, opt_state = model.params, opt.init(model.params)
  key = jax.random.PRNGKey(0)
  losses = []
  for step in range(steps):
    key, sub = jax.random.split(key)
    params, opt_state, loss = train_step(params, opt_state, sub)
    losses.append(float(loss))
    if step % 10 == 0 or step == steps - 1:
      print(f"step {step:3d}  vqt loss {losses[-1]:+.4f}")
  assert losses[-1] < losses[0], "loss should decrease"
  print("sharded VQT training ran end to end.")
  return losses


if __name__ == "__main__":
  main()
