"""Mesh-sharded Gibbs-With-Gradients MCMC inference.

`ShardedGibbsWithGradientsInference` is a drop-in
`inference.ebm.GibbsWithGradientsInference` (reference qhbmlib/inference/
ebm.py:705-760) whose independent chains are spread across a mesh axis via
`shard_map` -- chains never communicate, so the only collective is the
implicit gather of the sampled bitstrings at the shard_map boundary (the
dedup/counting stays global, downstream code is unchanged).

Key discipline: each scan step splits the step key into `num_chains`
per-chain keys exactly like the single-device path, and every device
slices out its own chunk -- sharded and unsharded chains are therefore
bit-identical (tested in tests/parallel/test_sampled_sharded.py).
"""

from __future__ import annotations

from typing import Optional

import jax
try:
  from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
  from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from qhbmlib_tpu.inference import ebm
from qhbmlib_tpu.models import energy as energy_model
from qhbmlib_tpu.parallel import mesh as mesh_lib


class ShardedGibbsWithGradientsInference(ebm.GibbsWithGradientsInference):
  """GWG MCMC with chains sharded over a mesh axis."""

  def __init__(self,
               input_energy: energy_model.BitstringEnergy,
               num_expectation_samples: int,
               num_burnin_samples: int,
               mesh,
               chains_axis: str = mesh_lib.DATA_AXIS,
               name: Optional[str] = None,
               num_chains: int = 1,
               max_unique_samples: Optional[int] = None,
               initial_seed=None,
               step_fn=None):
    if chains_axis not in mesh.shape:
      raise ValueError(f"mesh {tuple(mesh.axis_names)} has no axis "
                       f"{chains_axis!r}")
    d = mesh.shape[chains_axis]
    if num_chains % d:
      raise ValueError(
          f"num_chains={num_chains} must be divisible by the "
          f"{chains_axis!r} axis size {d}")
    super().__init__(input_energy, num_expectation_samples,
                     num_burnin_samples, name, num_chains,
                     max_unique_samples, initial_seed, step_fn)
    self._mesh = mesh
    self._chains_axis = chains_axis

  @property
  def mesh(self):
    return self._mesh

  def run_chains(self, theta, key, chain_state, num_steps: int):
    """Advances all chains `num_steps` steps, chains split over the mesh.

    Returns (samples [num_steps, num_chains, n], final_state), identical to
    the single-device implementation for the same arguments.
    """
    d = self._mesh.shape[self._chains_axis]
    if d == 1:
      return super().run_chains(theta, key, chain_state, num_steps)
    e_apply = lambda th, bits: self.energy_apply(th, bits)
    num_chains = self.num_chains
    local = num_chains // d
    axis = self._chains_axis

    def body(th, k, local_state):
      me = jax.lax.axis_index(axis)

      def step(carry, kk):
        state = carry
        # Same per-chain key schedule as the dense path; slice my chunk.
        keys_all = jax.random.split(kk, num_chains)
        keys_me = jax.lax.dynamic_slice_in_dim(keys_all, me * local, local)
        new_state = jax.vmap(
            lambda kk2, s: self._step_fn(e_apply, th, kk2, s))(keys_me,
                                                               state)
        return new_state, new_state

      keys = jax.random.split(k, num_steps)
      final_state, samples = jax.lax.scan(step, local_state, keys)
      return samples, final_state

    fn = shard_map(body, mesh=self._mesh,
                   in_specs=(P(), P(), P(axis)),
                   out_specs=(P(None, axis), P(axis)))
    return fn(theta, key, chain_state)
