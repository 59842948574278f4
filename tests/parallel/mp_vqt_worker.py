"""One process of the multi-process (multi-host analog) VQT integration test.

Run by tests/parallel/test_multiprocess.py: N of these processes, each with
`devices_per_proc` virtual CPU devices, join via
`topology.initialize_distributed` (JAX distributed runtime + gloo CPU
collectives -- the DCN/ICI transport stand-in) and execute the SAME sharded
VQT program over the global ('data', 'state') mesh.  This exercises what the
single-process virtual-mesh tests cannot: a real process boundary under the
mesh -- cross-process collectives, global-device mesh construction, and the
`sync_params` replicated-input contract.  With data >= nproc the data-axis
gradient psum crosses the process boundary (the multi-host dress rehearsal
for v5p-8 pods).

Self-asserting: each process checks the sharded loss/gradients against the
dense single-device engine evaluated on its own local devices, runs one full
Adam train step on the sharded program, then prints one RESULT line for the
parent to cross-compare between processes.

Usage: python mp_vqt_worker.py <process_id> <num_processes> <port> \
           [devices_per_proc=2] [data_axis_size=num_processes] \
           [state_axis_size=2]
"""

import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = int(sys.argv[3])
devices_per_proc = int(sys.argv[4]) if len(sys.argv) > 4 else 2
data_size = int(sys.argv[5]) if len(sys.argv) > 5 else nproc
state_size = int(sys.argv[6]) if len(sys.argv) > 6 else 2

os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={devices_per_proc}")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from qhbmlib_tpu.parallel import topology  # noqa: E402

n_global = topology.initialize_distributed(f"localhost:{port}", nproc, pid)
assert n_global == devices_per_proc * nproc, (n_global, nproc)
assert jax.process_count() == nproc
assert data_size * state_size == n_global, (data_size, state_size, n_global)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from qhbmlib_tpu import models, parallel  # noqa: E402
from qhbmlib_tpu.inference import ebm, qhbm, qnn, vqt_loss  # noqa: E402
from qhbmlib_tpu.models import circuit_utils  # noqa: E402
from qhbmlib_tpu.ops import paulis  # noqa: E402

n = 4
key = jax.random.PRNGKey(11)
energy = models.BernoulliEnergy(list(range(n)))
e_inf = ebm.AnalyticEnergyInference(energy, 128, initial_seed=5, exact=True)
pqc = circuit_utils.hardware_efficient_ansatz(n, 2)
# Deliberately UNSEEDED: each process builds different random circuit values;
# sync_params must reconcile them (the multi-host replicated-input contract).
circuit = models.DirectQuantumCircuit(pqc)
target = paulis.pauli_sum_from_strings(
    n, [(1.0, {q: "X"}) for q in range(n)] +
    [(-1.0, {q: "Z", q + 1: "Z"}) for q in range(n - 1)])
beta = jnp.asarray(1.3, jnp.float32)

mesh = topology.ici_mesh(data=data_size, state=state_size)
q_shard = parallel.ShardedQuantumInference(circuit, mesh)
h_shard = qhbm.QHBM(e_inf, q_shard)
params = topology.sync_params(h_shard.params)


def losses_and_grads(q_inf):
  h = qhbm.QHBM(e_inf, q_inf)
  loss_fn = vqt_loss.make_vqt(h, target)

  def scalar_loss(p):
    val, _ = loss_fn(p, key, beta)
    return val

  loss, grads = jax.value_and_grad(scalar_loss)(params)
  return float(loss), grads


loss_sharded, grads_sharded = losses_and_grads(q_shard)
# Dense oracle on this process's own local devices, same synced params.
loss_dense, grads_dense = losses_and_grads(qnn.AnalyticQuantumInference(
    circuit))

np.testing.assert_allclose(loss_sharded, loss_dense, atol=2e-5)
flat_s = jax.tree_util.tree_leaves(grads_sharded)
flat_d = jax.tree_util.tree_leaves(grads_dense)
assert max(float(jnp.max(jnp.abs(g))) for g in flat_d) > 1e-4
for gs, gd in zip(flat_s, flat_d):
  np.testing.assert_allclose(np.asarray(gs), np.asarray(gd), atol=2e-5)

# One FULL sharded train step (loss + grads + Adam update): the program every
# process must agree on, including the data-axis psum across the boundary.
opt = optax.adam(1e-2)
loss_fn = vqt_loss.make_vqt(qhbm.QHBM(e_inf, q_shard), target)


@jax.jit
def train_step(p, k):
  def scalar_loss(q):
    val, _ = loss_fn(q, k, beta)
    return val

  loss, grads = jax.value_and_grad(scalar_loss)(p)
  updates, _ = opt.update(grads, opt.init(p))
  return loss, optax.apply_updates(p, updates)


step_loss, new_params = train_step(params, jax.random.PRNGKey(12))
psum = sum(float(jnp.sum(jnp.abs(x)))
           for x in jax.tree_util.tree_leaves(new_params))

gsum = sum(float(jnp.sum(jnp.abs(g))) for g in flat_s)
print(f"RESULT pid={pid} loss={loss_sharded:.8f} gsum={gsum:.8f} "
      f"psum={psum:.8f}", flush=True)
