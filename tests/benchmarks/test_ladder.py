"""Smoke tests: every scale-ladder rung's full train step runs end-to-end
(shrunk sizes; the real sizes run on TPU via benchmarks.run_ladder)."""

import jax
import numpy as np
import pytest

from benchmarks import ladder


@pytest.mark.parametrize("name", ladder.RUNGS)
def test_rung_one_step(name):
  step_fn, params, opt_state, ebm_state, meta = ladder.build_rung(name,
                                                                  smoke=True)
  key = jax.random.PRNGKey(1)
  loss, new_params, opt_state, ebm_state = step_fn(params, opt_state, key,
                                                   ebm_state)
  assert np.isfinite(float(loss)), meta
  # Parameters actually moved.
  before = np.concatenate(
      [np.asarray(x).reshape(-1) for x in jax.tree_util.tree_leaves(params)])
  after = np.concatenate(
      [np.asarray(x).reshape(-1)
       for x in jax.tree_util.tree_leaves(new_params)])
  assert not np.allclose(before, after)


@pytest.mark.slow
def test_r5_spec_size_28q_compiles_on_virtual_mesh():
  """BASELINE.json configs[4]: the 28-qubit GWG + QMHL rung, statevectors
  sharded over the 8-virtual-device 'state' mesh.  Compile-only: lowering +
  XLA compilation prove the sharded program (ICI partner exchanges, psum'd
  adjoint, mesh GWG chains) is executable at the spec size without
  allocating the 2GB statevectors on the CI host."""
  step_fn, params, opt_state, ebm_state, meta = ladder.build_rung(
      "r5_gwg28_qmhl", smoke=True, qubits=28)
  assert meta["n"] == 28 and meta["state_shards"] == 8
  key = jax.random.PRNGKey(1)
  compiled = step_fn.lower(params, opt_state, key, ebm_state).compile()
  assert compiled is not None


def test_thermal_state_data_matches_dense():
  """ThermalStateData expectation == tr[rho K] computed densely."""
  import jax.numpy as jnp
  from baselines import utils as baselines_utils
  from qhbmlib_tpu import data as data_module, models
  from qhbmlib_tpu.models import circuit_utils
  from qhbmlib_tpu.ops import statevector as sv

  n = 3
  target = ladder._heisenberg(n)
  rho = baselines_utils.get_thermal_state(0.7, jnp.asarray(target.dense()))
  data = data_module.ThermalStateData(rho)

  energy = models.KOBE(list(range(n)), 2)
  circuit = models.DirectQuantumCircuit(
      circuit_utils.hardware_efficient_ansatz(n, 2))
  k_model = models.Hamiltonian(energy, circuit)

  actual = float(data.expectation(k_model))

  # Dense oracle: K = U diag(E) U^dagger.
  u = np.asarray(sv.unitary(circuit.pqc, circuit.resolved_values))
  energies = np.asarray(energy(jnp.asarray(sv.all_bitstrings(n))))
  k_mat = u @ np.diag(energies) @ u.conj().T
  expected = float(np.real(np.trace(np.asarray(rho) @ k_mat)))
  np.testing.assert_allclose(actual, expected, atol=1e-4)

  # PauliSum observable path.
  actual_ps = float(np.sum(np.asarray(data.expectation(target))))
  expected_ps = float(
      np.real(np.trace(np.asarray(rho) @ np.asarray(target.dense()))))
  np.testing.assert_allclose(actual_ps, expected_ps, atol=1e-4)
