"""Multi-chip QuantumInference: data-parallel batch + amplitude-sharded state.

`ShardedQuantumInference` is a drop-in `inference.qnn.QuantumInference`
implementation: the existing `QHBM` / `vqt` / `qmhl` layers compose with it
unchanged, so the whole QHBM training stack scales over a mesh without any
API change.  Semantics mirror `AnalyticQuantumInference` (exact expectations,
adjoint gradients; reference qhbmlib/inference/qnn.py:87-139); the execution
differs: unique bitstrings are split across the 'data' mesh axis and each
statevector is sharded over the 'state' axis (parallel/sharded_sv.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from qhbmlib_tpu.inference import qnn
from qhbmlib_tpu.models import circuit as circuit_model
from qhbmlib_tpu.models import energy as energy_model
from qhbmlib_tpu.models import hamiltonian as hamiltonian_model
from qhbmlib_tpu.parallel import mesh as mesh_lib
from qhbmlib_tpu.parallel import sharded_sv


class ShardedQuantumInference(qnn.QuantumInference):
  """Exact expectations over a device mesh with adjoint gradients."""

  def __init__(self,
               input_circuit: circuit_model.QuantumCircuit,
               mesh,
               data_axis: Optional[str] = mesh_lib.DATA_AXIS,
               state_axis: str = mesh_lib.STATE_AXIS,
               name: Optional[str] = None):
    """Args:
      input_circuit: the parameterized circuit model.
      mesh: a `jax.sharding.Mesh` from `parallel.make_mesh`.
      data_axis: mesh axis to split the bitstring batch over (None disables
        data parallelism, e.g. for a pure state-sharding mesh).
      state_axis: mesh axis to shard the 2^n amplitudes over.
    """
    super().__init__(input_circuit, name)
    self._mesh = mesh
    # A named-but-absent axis is a caller error (a typo would otherwise
    # silently disable data parallelism and run the batch fully replicated);
    # only an axis of size 1 legitimately collapses to None.
    if data_axis is not None and data_axis not in mesh.shape:
      raise ValueError(f"mesh {tuple(mesh.axis_names)} has no axis "
                       f"{data_axis!r}")
    if state_axis not in mesh.shape:
      raise ValueError(f"mesh {tuple(mesh.axis_names)} has no axis "
                       f"{state_axis!r}")
    self._data_axis = data_axis if (data_axis is not None and
                                    mesh.shape[data_axis] > 1) else None
    self._state_axis = state_axis

  @property
  def mesh(self):
    return self._mesh

  def expectation_pure(self,
                       phi,
                       initial_states,
                       observables,
                       obs_circuit_params=None,
                       obs_energy_params=None,
                       key=None) -> jnp.ndarray:
    del key
    bits = jnp.asarray(initial_states)
    if isinstance(observables, hamiltonian_model.Hamiltonian):
      if not isinstance(observables.energy, energy_model.PauliMixin):
        raise TypeError("General Hamiltonians not accepted.  "
                        "Please use `SampledQuantumInference` instead.")
      total = self._total_circuit(observables)
      flat = list(phi) + list(obs_circuit_params)
      values = total.resolved_values_flat(flat)
      shard_exps = sharded_sv.batched_expectations(
          total.pqc, values, bits, observables.operator_shards, self._mesh,
          self._state_axis, self._data_axis)  # [B, S]
      post = jax.vmap(
          lambda row: observables.energy.operator_expectation_flat(
              obs_energy_params, row))(shard_exps)
      return post[:, None]
    ops = qnn._as_pauli_tuple(observables)
    values = self._circuit.resolved_values_flat(phi)
    return sharded_sv.batched_expectations(self._circuit.pqc, values, bits,
                                           ops, self._mesh, self._state_axis,
                                           self._data_axis)
