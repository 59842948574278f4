"""Mesh-sharded sampled (shot-based) quantum inference.

`ShardedSampledQuantumInference` is a drop-in
`inference.qnn.SampledQuantumInference` (reference qhbmlib/inference/
qnn.py:142-292): identical shot-sampling semantics and parameter-shift
gradients, with the unique-bitstring batch split across a mesh axis
(SURVEY.md section 2.3 DP row: "shard sampled-bitstring/circuit batch
across mesh").  Both the forward shot batches and every parameter-shift
evaluation in the backward run per-device; the gradient reduce over the
batch axis is the shard_map transpose's psum.

Because `qnn._sampled_term_means` takes ONE key per initial state, a
device's chunk of the key batch matches the keys the single-device path
would have used for the same rows -- sharded and unsharded results are
bit-identical (tested in tests/parallel/test_sampled_sharded.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
try:
  from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
  from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from qhbmlib_tpu.inference import qnn
from qhbmlib_tpu.models import circuit as circuit_model
from qhbmlib_tpu.parallel import mesh as mesh_lib


def _pad_batch(bits: jnp.ndarray, keys: jnp.ndarray, d: int):
  """Pads the batch to a multiple of the mesh-axis size `d`.

  Padding rows compute on the all-zeros bitstring with a zero key; their
  outputs are sliced away (and their cotangents are zero), so they only
  cost the (already-parallel) flops of the final partial chunk."""
  b = bits.shape[0]
  pad = (-b) % d
  if pad:
    bits = jnp.concatenate(
        [bits, jnp.zeros((pad,) + bits.shape[1:], bits.dtype)], axis=0)
    keys = jnp.concatenate(
        [keys, jnp.zeros((pad,) + keys.shape[1:], keys.dtype)], axis=0)
  return bits, keys, b


class ShardedSampledQuantumInference(qnn.SampledQuantumInference):
  """Shot-based expectations with the state batch sharded over a mesh axis.

  The statevector itself stays device-local (the sampled engine targets
  sizes where 2^n fits one chip); the parallel axis is the batch of unique
  initial states times parameter-shift evaluations.
  """

  def __init__(self,
               input_circuit: circuit_model.QuantumCircuit,
               expectation_samples: int,
               mesh,
               data_axis: str = mesh_lib.DATA_AXIS,
               name: Optional[str] = None,
               initial_seed=None):
    super().__init__(input_circuit, expectation_samples, name, initial_seed)
    self._mesh = mesh
    self._data_axis = data_axis
    if data_axis not in mesh.shape:
      raise ValueError(f"mesh {tuple(mesh.axis_names)} has no axis "
                       f"{data_axis!r}")

  @property
  def mesh(self):
    return self._mesh

  def _pvary(self, tree):
    """Marks a replicated input as device-varying so the shard_map transpose
    psums its cotangent (required under jax's varying-manual-axes checks;
    the forward is the identity)."""
    axis = self._data_axis
    if hasattr(jax.lax, "pcast"):
      mark = lambda x: jax.lax.pcast(x, axis, to="varying")
    elif hasattr(jax.lax, "pvary"):  # pre-0.9 jax
      mark = lambda x: jax.lax.pvary(x, axis)
    else:  # older still: transpose psums automatically
      return tree
    return jax.tree_util.tree_map(mark, tree)

  def _run_term_means(self, plan, pqc, values, bits, keys):
    shots = self.expectation_samples
    d = self._mesh.shape[self._data_axis]
    if d == 1:
      return qnn._sampled_term_means(plan, pqc, shots, values, bits, keys)
    bits, keys, b = _pad_batch(bits, keys, d)
    spec = P(self._data_axis)

    def body(v, bb, kk):
      return qnn._sampled_term_means(plan, pqc, shots, self._pvary(v), bb,
                                     kk)

    sharded = shard_map(body, mesh=self._mesh, in_specs=(P(), spec, spec),
                        out_specs=spec)
    return sharded(values, bits, keys)[:b]

  def _run_energy_expectation(self, pqc, energy_apply, values, energy_params,
                              bits, keys):
    shots = self.expectation_samples
    # energy_params enters as a replicated (P()) pytree input; its cotangent
    # is psum'd by the shard_map transpose alongside `values`'s (both are
    # marked varying via _pvary).
    d = self._mesh.shape[self._data_axis]
    if d == 1:
      return qnn._sampled_energy_expectation(pqc, shots, energy_apply,
                                             values, energy_params, bits,
                                             keys)
    bits_p, keys_p, b = _pad_batch(bits, keys, d)
    spec = P(self._data_axis)

    def wrapped(v, ep, bb, kk):
      return qnn._sampled_energy_expectation(pqc, shots, energy_apply,
                                             self._pvary(v),
                                             self._pvary(ep), bb, kk)

    sharded = shard_map(wrapped, mesh=self._mesh,
                        in_specs=(P(), P(), spec, spec), out_specs=spec)
    return sharded(values, energy_params, bits_p, keys_p)[:b]
