"""Energy-function models over bitstrings.

TPU-native rebuild of reference qhbmlib/models/energy.py:26-209.  Models are
"data": a static layer stack plus current variable values, with a pure
``apply_flat(flat_vars, bitstrings)`` used by the jitted/differentiated
inference paths and a stateful ``__call__`` mirroring the reference API.
"""

from __future__ import annotations

import abc
from typing import List, Optional, Sequence

import jax.numpy as jnp

from qhbmlib_tpu import nn
from qhbmlib_tpu.models import energy_utils
from qhbmlib_tpu.ops import paulis


class BitstringEnergy:
  r"""Energy function E(x) over bitstrings as a stack of layers.

  Implicitly defines the EBM p(x) = exp(-E(x)) / sum_y exp(-E(y)).
  Mirrors reference qhbmlib/models/energy.py:26-87.
  """

  def __init__(self,
               bits: List[int],
               energy_layers: List[nn.Layer],
               name: Optional[str] = None):
    self._bits = energy_utils.check_bits(bits)
    self._energy_layers = list(energy_layers)
    self.name = name or type(self).__name__
    # Build all layers now by probing shapes through the stack (input width
    # is known: num_bits).
    self._build_sequentially()

  def _build_sequentially(self):
    x_shape = (1, self.num_bits)
    x = jnp.zeros(x_shape, jnp.float32)
    for layer in self._energy_layers:
      if not layer.built:
        layer.build(x.shape)
      x = layer.apply(layer.variables, x)

  @property
  def num_bits(self) -> int:
    return len(self._bits)

  @property
  def bits(self) -> List[int]:
    return self._bits

  @property
  def energy_layers(self) -> List[nn.Layer]:
    """Where callers access model weights (hypernetwork hook parity with
    reference energy.py:67-74)."""
    return self._energy_layers

  @property
  def trainable_variables(self) -> List[jnp.ndarray]:
    return nn.flatten_variables(self._energy_layers)

  def set_trainable_variables(self, flat: Sequence[jnp.ndarray]) -> None:
    per_layer = nn.unflatten_variables(self._energy_layers, flat)
    for layer, lvars in zip(self._energy_layers, per_layer):
      if layer.trainable:
        layer.set_variables(lvars)

  def get_weights(self) -> List[jnp.ndarray]:
    """Keras-style accessor (reference models are Keras layers; weights move
    via get/set_weights, e.g. reference baselines/train.py:283-284)."""
    return list(self.trainable_variables)

  def set_weights(self, weights: Sequence[jnp.ndarray]) -> None:
    self.set_trainable_variables(weights)

  def apply_flat(self, flat: Sequence[jnp.ndarray],
                 bitstrings: jnp.ndarray) -> jnp.ndarray:
    """Pure energy evaluation: [batch, num_bits] -> [batch]."""
    return nn.apply_layers(self._energy_layers, flat, bitstrings)

  def __call__(self, bitstrings: jnp.ndarray) -> jnp.ndarray:
    return self.apply_flat(self.trainable_variables, bitstrings)


class PauliMixin(abc.ABC):
  """Adds a Pauli-Z operator representation to a BitstringEnergy.

  Mirrors reference qhbmlib/models/energy.py:90-120, with cirq PauliSums
  replaced by the array-native ops.paulis.PauliSum.
  """

  @property
  @abc.abstractmethod
  def post_process(self) -> List[nn.Layer]:
    """Layers mapping operator shard expectations -> scalar average energy."""
    raise NotImplementedError()

  @abc.abstractmethod
  def operator_shards(self, num_qubits: int) -> Sequence[paulis.PauliSum]:
    """Parameter-independent Pauli Z strings to measure."""
    raise NotImplementedError()

  def operator_expectation(self, expectation_shards: jnp.ndarray):
    """Average energy from operator shard expectations (stateful)."""
    x = expectation_shards
    for layer in self.post_process:
      x = layer(x)
    return x

  def operator_expectation_flat(self, flat: Sequence[jnp.ndarray],
                                expectation_shards: jnp.ndarray):
    """Pure variant of `operator_expectation`."""
    return nn.apply_layers(self.post_process, flat, expectation_shards)


class BernoulliEnergy(BitstringEnergy, PauliMixin):
  """Product of independent spins in magnetic fields: E(x) = sum_i theta_i s_i.

  Mirrors reference qhbmlib/models/energy.py:123-167.
  """

  def __init__(self,
               bits: List[int],
               initializer: Optional[nn.Initializer] = None,
               name: Optional[str] = None):
    initializer = initializer or nn.RandomUniform()
    pre_process = [energy_utils.SpinsFromBitstrings()]
    post_process = [energy_utils.VariableDot(initializer=initializer)]
    super().__init__(bits, pre_process + post_process, name)
    self._post_process = post_process

  @property
  def logits(self) -> jnp.ndarray:
    """p(bit=1) = e^theta/(e^theta + e^-theta)  =>  logit = 2*theta."""
    return 2.0 * self.post_process[0].kernel

  @staticmethod
  def logits_from_flat(flat: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Pure logits given flat trainable variables (single kernel)."""
    return 2.0 * flat[0]

  @property
  def post_process(self) -> List[nn.Layer]:
    return self._post_process

  def operator_shards(self, num_qubits: int) -> Sequence[paulis.PauliSum]:
    return paulis.z_strings_from_masks(
        [[1 if q == i else 0 for q in range(num_qubits)]
         for i in range(num_qubits)], num_qubits)


class KOBE(BitstringEnergy, PauliMixin):
  """K-th Order Binary Energy: all parity terms up to order k.

  Mirrors reference qhbmlib/models/energy.py:170-209.
  """

  def __init__(self,
               bits: List[int],
               order: int,
               initializer: Optional[nn.Initializer] = None,
               name: Optional[str] = None):
    initializer = initializer or nn.RandomUniform()
    parity_layer = energy_utils.Parity(bits, order)
    self._num_terms = parity_layer.num_terms
    self._indices = parity_layer.indices
    pre_process = [energy_utils.SpinsFromBitstrings(), parity_layer]
    post_process = [energy_utils.VariableDot(initializer=initializer)]
    super().__init__(bits, pre_process + post_process, name)
    self._post_process = post_process

  @property
  def post_process(self) -> List[nn.Layer]:
    return self._post_process

  def operator_shards(self, num_qubits: int) -> Sequence[paulis.PauliSum]:
    masks = []
    for combo in self._indices:
      masks.append([1 if q in combo else 0 for q in range(num_qubits)])
    return paulis.z_strings_from_masks(masks, num_qubits)
