"""Metrics on BitstringEnergy models.

Mirrors reference qhbmlib/inference/ebm_utils.py:24-36.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from qhbmlib_tpu.models import energy as energy_model
from qhbmlib_tpu.ops import statevector as sv


def probabilities(input_energy: energy_model.BitstringEnergy,
                  theta=None) -> jnp.ndarray:
  """Exact EBM probabilities softmax(-E) over all 2^n bitstrings."""
  all_bits = jnp.asarray(sv.all_bitstrings(input_energy.num_bits))
  if theta is None:
    theta = input_energy.trainable_variables
  all_energies = input_energy.apply_flat(theta, all_bits)
  return jax.nn.softmax(-all_energies)
