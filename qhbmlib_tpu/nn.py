"""Minimal layer/initializer system for qhbmlib_tpu models.

The reference builds models out of Keras layers (reference:
qhbmlib/models/energy.py:26-87, qhbmlib/models/circuit.py:27-178).  Here a
layer is a thin object holding a list of jnp arrays (`variables`) plus a pure
``apply(variables, x)``; models compose layers and expose both a stateful
convenience call and the pure flat-parameter path that the jitted inference
code differentiates through.  No Keras, no implicit variable tracking.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class Initializer:
  """Deterministic initializer: callable shape -> array."""

  def __call__(self, shape) -> jnp.ndarray:
    raise NotImplementedError()


class RandomUniform(Initializer):

  def __init__(self, minval=-0.05, maxval=0.05, seed: Optional[int] = None):
    self.minval = minval
    self.maxval = maxval
    self._key = jax.random.PRNGKey(
        np.random.randint(0, 2**31 - 1) if seed is None else seed)

  def __call__(self, shape):
    self._key, sub = jax.random.split(self._key)
    return jax.random.uniform(sub, tuple(shape), jnp.float32, self.minval,
                              self.maxval)


class RandomNormal(Initializer):

  def __init__(self, mean=0.0, stddev=0.05, seed: Optional[int] = None):
    self.mean = mean
    self.stddev = stddev
    self._key = jax.random.PRNGKey(
        np.random.randint(0, 2**31 - 1) if seed is None else seed)

  def __call__(self, shape):
    self._key, sub = jax.random.split(self._key)
    return self.mean + self.stddev * jax.random.normal(sub, tuple(shape),
                                                       jnp.float32)


class Constant(Initializer):

  def __init__(self, value=0.0):
    self.value = value

  def __call__(self, shape):
    return jnp.full(tuple(shape), self.value, jnp.float32)


class Zeros(Constant):

  def __init__(self):
    super().__init__(0.0)


class Layer:
  """Base layer: `variables` (list of arrays) + pure `apply`."""

  trainable: bool = True

  def __init__(self):
    self.variables: List[jnp.ndarray] = []
    self.built = False

  def build(self, input_shape) -> None:
    """Creates variables given input shape (excluding batch dim handling is
    the layer's business).  Idempotent."""
    self.built = True

  def apply(self, variables: Sequence[jnp.ndarray], x):
    raise NotImplementedError()

  def __call__(self, x):
    if not self.built:
      self.build(np.shape(x))
    return self.apply(self.variables, x)

  @property
  def trainable_variables(self) -> List[jnp.ndarray]:
    return list(self.variables) if self.trainable else []

  def set_variables(self, new_vars: Sequence[jnp.ndarray]) -> None:
    assert len(new_vars) == len(self.variables)
    self.variables = [jnp.asarray(v) for v in new_vars]


class Lambda(Layer):
  """Stateless layer wrapping a pure function."""

  trainable = False

  def __init__(self, fn: Callable):
    super().__init__()
    self.fn = fn
    self.built = True

  def apply(self, variables, x):
    del variables
    return self.fn(x)


class Dense(Layer):
  """y = activation(x @ kernel + bias)."""

  def __init__(self,
               units: int,
               activation: Optional[Callable] = None,
               kernel_initializer: Optional[Initializer] = None,
               bias_initializer: Optional[Initializer] = None,
               use_bias: bool = True):
    super().__init__()
    self.units = units
    self.activation = activation
    self.kernel_initializer = kernel_initializer or RandomUniform()
    self.bias_initializer = bias_initializer or Zeros()
    self.use_bias = use_bias

  def build(self, input_shape):
    if self.built:
      return
    in_dim = int(input_shape[-1])
    self.variables = [self.kernel_initializer([in_dim, self.units])]
    if self.use_bias:
      self.variables.append(self.bias_initializer([self.units]))
    self.built = True

  def apply(self, variables, x):
    x = jnp.asarray(x, jnp.float32)
    y = x @ variables[0]
    if self.use_bias:
      y = y + variables[1]
    if self.activation is not None:
      y = self.activation(y)
    return y


def flatten_variables(layers: Sequence[Layer]) -> List[jnp.ndarray]:
  """Flat list of trainable variables across layers, in layer order."""
  out = []
  for layer in layers:
    out.extend(layer.trainable_variables)
  return out


def unflatten_variables(layers: Sequence[Layer],
                        flat: Sequence[jnp.ndarray]) -> List[List[jnp.ndarray]]:
  """Splits a flat trainable-variable list back into per-layer lists.

  Non-trainable layers receive their own (constant) variables.
  """
  out = []
  i = 0
  for layer in layers:
    if layer.trainable:
      k = len(layer.variables)
      out.append(list(flat[i:i + k]))
      i += k
    else:
      out.append(list(layer.variables))
  if i != len(flat):
    raise ValueError(f"expected {i} variables, got {len(flat)}")
  return out


def apply_layers(layers: Sequence[Layer], flat: Sequence[jnp.ndarray], x):
  """Pure application of a layer stack given flat trainable variables."""
  per_layer = unflatten_variables(layers, flat)
  for layer, lvars in zip(layers, per_layer):
    x = layer.apply(lvars, x)
  return x
