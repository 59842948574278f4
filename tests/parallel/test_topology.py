"""Topology helpers: ICI-aware meshes + distributed init (CPU-mesh tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qhbmlib_tpu.parallel import sharded_sv, topology
from qhbmlib_tpu.models import circuit_utils
from qhbmlib_tpu.ops import statevector as sv


def test_initialize_distributed_single_process_noop():
  assert topology.initialize_distributed(num_processes=1) == len(
      jax.devices())


def test_ici_mesh_axes_and_shape():
  mesh = topology.ici_mesh(data=2, state=4)
  assert mesh.shape == {"data": 2, "state": 4}
  assert set(mesh.axis_names) == {"data", "state"}
  # Every visible device appears exactly once.
  ids = sorted(d.id for d in mesh.devices.reshape(-1))
  assert ids == sorted(d.id for d in jax.devices()[:8])


def test_ici_mesh_rejects_non_power_of_two_state():
  with pytest.raises(ValueError, match="power of 2"):
    topology.ici_mesh(data=1, state=3)


def test_mesh_constructors_reject_degenerate_axis_sizes():
  """state=0 satisfies `state & (state - 1) == 0` (0 & -1 == 0): every
  constructor must reject it explicitly instead of building a zero-device
  mesh that fails obscurely far from the bad argument."""
  from qhbmlib_tpu import parallel
  for bad in (0, -2):
    with pytest.raises(ValueError):
      parallel.make_mesh(data=1, state=bad)
    with pytest.raises(ValueError):
      topology.ici_mesh(data=1, state=bad)
  with pytest.raises(ValueError):
    parallel.make_mesh(data=0, state=1)
  with pytest.raises(ValueError, match="power of 2"):
    topology.dcn_mesh(replica=2, data=1, state=3)


def test_sharded_qnn_rejects_absent_axes():
  """A misspelled data_axis must raise (it used to silently disable data
  parallelism and run the batch fully replicated); a bad state_axis must
  fail at construction, not as a KeyError at the first expectation."""
  from qhbmlib_tpu import parallel
  from qhbmlib_tpu.models import circuit as circuit_model
  mesh = parallel.make_mesh(data=2, state=2)
  pqc = circuit_utils.hardware_efficient_ansatz(3, 1)
  circ = circuit_model.DirectQuantumCircuit(pqc)
  with pytest.raises(ValueError, match="no axis 'batch'"):
    parallel.ShardedQuantumInference(circ, mesh, data_axis="batch")
  with pytest.raises(ValueError, match="no axis 'amps'"):
    parallel.ShardedQuantumInference(circ, mesh, state_axis="amps")
  # None still legitimately disables data parallelism.
  q = parallel.ShardedQuantumInference(circ, mesh, data_axis=None)
  assert q._data_axis is None


def test_ici_mesh_runs_sharded_engine():
  """The ICI-ordered mesh drops into the amplitude-sharded engine."""
  mesh = topology.ici_mesh(data=1, state=8)
  n = 4
  pqc = circuit_utils.hardware_efficient_ansatz(n, 1)
  values = jnp.asarray(
      np.random.RandomState(0).uniform(-1, 1, pqc.num_symbols), jnp.float32)
  dense = sv.simulate(pqc, values).reshape(-1)
  sharded = sharded_sv.simulate_sharded(pqc, values, mesh)
  np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense),
                             atol=2e-5)


def test_dcn_mesh_requires_multislice():
  """CPU test devices carry no slice_index; the hybrid mesh must raise
  rather than silently produce a wrong topology."""
  with pytest.raises(Exception):
    topology.dcn_mesh(replica=2, data=2, state=2)
