"""Layers used by the energy models.

TPU-native rebuild of reference qhbmlib/models/energy_utils.py:23-110.  The
main departure is `Parity`: the reference loops a ragged index list with
per-term gathers (reference: energy_utils.py:104-110); here the parity terms
are a static 0/1 mask matrix so that

  * on float inputs the parities are a masked product (differentiable -- the
    Gibbs-With-Gradients sampler needs d(energy)/d(input)), and
  * on bit inputs they collapse to one int matmul + mod-2 (MXU-friendly).
"""

from __future__ import annotations

import itertools
from typing import List

import jax.numpy as jnp
import numpy as np

from qhbmlib_tpu import nn


def check_bits(bits: List[int]) -> List[int]:
  """Validates a list of bit indices (duplicates would alias energy terms)."""
  if len(set(bits)) != len(bits):
    raise ValueError(f"bit index list contains duplicates: {bits}")
  return bits


def check_order(order: int) -> int:
  """Validates a parity interaction order (must be a positive int)."""
  if not isinstance(order, int):
    raise TypeError(f"parity order must be an int, got {type(order).__name__}")
  if order <= 0:
    raise ValueError(f"parity order must be positive, got {order}")
  return order


class SpinsFromBitstrings(nn.Layer):
  """Maps bits to spins: |0> -> +1, |1> -> -1 (Bloch-sphere convention)."""

  trainable = False

  def __init__(self):
    super().__init__()
    self.built = True

  def apply(self, variables, inputs):
    del variables
    return (1.0 - 2.0 * jnp.asarray(inputs, jnp.float32))


class VariableDot(nn.Layer):
  """Dot product with a trainable kernel of matching last-dim size."""

  def __init__(self, initializer: nn.Initializer = None):
    super().__init__()
    self._initializer = initializer or nn.RandomUniform()

  def build(self, input_shape):
    if self.built:
      return
    self.variables = [self._initializer([int(input_shape[-1])])]
    self.built = True

  def apply(self, variables, inputs):
    return jnp.sum(jnp.asarray(inputs, jnp.float32) * variables[0], axis=-1)

  @property
  def kernel(self):
    return self.variables[0]


class Parity(nn.Layer):
  """All parity products of <= `order` spins, as a static mask matrix."""

  trainable = False

  def __init__(self, bits: List[int], order: int):
    super().__init__()
    bits = check_bits(bits)
    order = check_order(order)
    n = len(bits)
    indices_list = []
    for i in range(1, order + 1):
      indices_list.extend(itertools.combinations(range(n), i))
    self.indices = indices_list
    self.num_terms = len(indices_list)
    mask = np.zeros((self.num_terms, n), np.float32)
    for t, combo in enumerate(indices_list):
      mask[t, list(combo)] = 1.0
    self.mask = mask  # [num_terms, n], static
    self.built = True

  def apply(self, variables, inputs):
    """[batch, n] spins -> [batch, num_terms] parities.

    Differentiable in `inputs` (masked product).  On exact spin inputs this
    equals 1 - 2*((bits @ mask^T) mod 2).
    """
    del variables
    spins = jnp.asarray(inputs, jnp.float32)
    # [batch, T, n]: entries are spin where masked, 1 where not.
    masked = jnp.where(self.mask[None, :, :] > 0, spins[:, None, :], 1.0)
    return jnp.prod(masked, axis=-1)

  def apply_to_bits(self, bits: jnp.ndarray) -> jnp.ndarray:
    """Fast non-differentiable path: [batch, n] bits -> [batch, T] parities
    via an integer matmul (rides the MXU for large enumerations)."""
    counts = jnp.asarray(bits, jnp.int32) @ jnp.asarray(self.mask.T, jnp.int32)
    return (1 - 2 * (counts % 2)).astype(jnp.float32)
