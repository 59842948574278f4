"""Parameterized quantum circuit models.

TPU-native rebuild of reference qhbmlib/models/circuit.py:27-292.  The
serialized-proto `pqc` tensor becomes a static `ops.circuit_ir.Circuit`; the
trainable map from variables to circuit symbol values (`value_layers_inputs`
-> `value_layers` -> `symbol_values`) keeps the reference's hypernetwork-hook
structure but is a pure function of a flat variable list.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from qhbmlib_tpu import nn
from qhbmlib_tpu.ops import circuit_ir as ir
from qhbmlib_tpu.ops import paulis


class QuantumCircuit:
  """A parameterized circuit plus the trainable map to its symbol values.

  Mirrors reference qhbmlib/models/circuit.py:27-178.
  """

  def __init__(self,
               pqc: ir.Circuit,
               symbol_names: Sequence[str],
               value_layers_inputs: List[List[jnp.ndarray]],
               value_layers: List[List[nn.Layer]],
               name: Optional[str] = None):
    """Initializes a QuantumCircuit.

    Args:
      pqc: static circuit IR (the parameterized unitary).
      symbol_names: order in which `symbol_values` entries map onto the
        circuit's symbols.  Must be a permutation of `pqc.symbol_names`.
      value_layers_inputs: list (one entry per pipeline) of lists of arrays;
        the trainable inputs.
      value_layers: matching list of layer pipelines; pipeline i maps
        `value_layers_inputs[i]` to a segment of the symbol values.
      name: optional name.
    """
    if set(symbol_names) != set(pqc.symbol_names):
      raise ValueError("symbol_names must match the circuit's symbols; "
                       f"got {symbol_names} vs {pqc.symbol_names}")
    self.name = name or "QuantumCircuit"
    self._symbol_names = tuple(symbol_names)
    # Permutation taking the concatenated pipeline outputs (ordered by
    # `symbol_names`) to the IR's slot order.
    name_to_pos = {s: i for i, s in enumerate(symbol_names)}
    self._perm = np.asarray([name_to_pos[s] for s in pqc.symbol_names],
                            np.int32)
    self._pqc = pqc
    self._value_layers = value_layers
    self._value_layers_inputs = [
        [jnp.asarray(v, jnp.float32) for v in pipeline]
        for pipeline in value_layers_inputs
    ]

  # -- properties mirroring the reference API -------------------------------

  @property
  def qubits(self) -> List[int]:
    return list(range(self._pqc.num_qubits))

  @property
  def num_qubits(self) -> int:
    return self._pqc.num_qubits

  @property
  def pqc(self) -> ir.Circuit:
    return self._pqc

  @property
  def symbol_names(self) -> Sequence[str]:
    return self._symbol_names

  @property
  def value_layers(self) -> List[List[nn.Layer]]:
    return self._value_layers

  @property
  def value_layers_inputs(self) -> List[List[jnp.ndarray]]:
    return self._value_layers_inputs

  @property
  def trainable_variables(self) -> List[jnp.ndarray]:
    out = []
    for pipeline_inputs in self._value_layers_inputs:
      out.extend(pipeline_inputs)
    for pipeline in self._value_layers:
      out.extend(nn.flatten_variables(pipeline))
    return out

  def get_weights(self) -> List[jnp.ndarray]:
    """Keras-style accessor (reference models are Keras layers; weights move
    via get/set_weights, e.g. reference baselines/train.py:604-605)."""
    return list(self.trainable_variables)

  def set_weights(self, weights: Sequence[jnp.ndarray]) -> None:
    self.set_trainable_variables(weights)

  def set_trainable_variables(self, flat: Sequence[jnp.ndarray]) -> None:
    i = 0
    for pipeline_inputs in self._value_layers_inputs:
      for j in range(len(pipeline_inputs)):
        pipeline_inputs[j] = jnp.asarray(flat[i], jnp.float32)
        i += 1
    for pipeline in self._value_layers:
      for layer in pipeline:
        if layer.trainable:
          k = len(layer.variables)
          layer.set_variables(list(flat[i:i + k]))
          i += k
    if i != len(flat):
      raise ValueError(f"expected {i} variables, got {len(flat)}")

  # -- symbol values ---------------------------------------------------------

  def symbol_values_flat(self, flat: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Pure map: flat trainable variables -> symbol values in
    `symbol_names` order (reference circuit.py:94-107)."""
    i = 0
    inputs_per_pipeline = []
    for pipeline_inputs in self._value_layers_inputs:
      k = len(pipeline_inputs)
      inputs_per_pipeline.append(list(flat[i:i + k]))
      i += k
    segments = []
    for pipeline_inputs, pipeline in zip(inputs_per_pipeline,
                                         self._value_layers):
      x = pipeline_inputs if len(pipeline_inputs) != 1 else pipeline_inputs[0]
      for layer in pipeline:
        if layer.trainable:
          k = len(layer.variables)
          x = layer.apply(list(flat[i:i + k]), x)
          i += k
        else:
          x = layer.apply(layer.variables, x)
      segments.append(jnp.reshape(jnp.asarray(x, jnp.float32), [-1]))
    if i != len(flat):
      # Mirror set_trainable_variables' strictness: silently ignoring
      # trailing arrays would turn a parameter-ordering bug downstream into
      # wrong symbol values with no error.
      raise ValueError(f"{self.name}: expected {i} flat variables, got "
                       f"{len(flat)}")
    if not segments:
      return jnp.zeros([0], jnp.float32)
    return jnp.concatenate(segments, axis=0)

  @property
  def symbol_values(self) -> jnp.ndarray:
    return self.symbol_values_flat(self.trainable_variables)

  def resolved_values_flat(self, flat: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Symbol values permuted into the IR's internal slot order; this is what
    simulation functions consume."""
    values = self.symbol_values_flat(flat)
    if values.shape[0] == 0:
      return values
    return values[self._perm]

  @property
  def resolved_values(self) -> jnp.ndarray:
    return self.resolved_values_flat(self.trainable_variables)

  # -- composition -----------------------------------------------------------

  def __add__(self, other: "QuantumCircuit") -> "QuantumCircuit":
    """Concatenation; symbol sets must be disjoint (reference
    circuit.py:138-162)."""
    if not isinstance(other, QuantumCircuit):
      raise TypeError("can only add QuantumCircuit to QuantumCircuit")
    if set(self._symbol_names) & set(other._symbol_names):
      raise ValueError("Circuits to be summed must not have symbols in common.")
    new_pqc = self._pqc.append(other._pqc)
    combined = QuantumCircuit(
        new_pqc,
        tuple(self._symbol_names) + tuple(other._symbol_names),
        self._value_layers_inputs + other._value_layers_inputs,
        self._value_layers + other._value_layers,
        name=f"{self.name}_{other.name}")
    # Share (alias) the summands' input lists so variable updates propagate,
    # exactly like __pow__: the reference's summands share tf.Variables
    # (reference circuit.py:138-162), and the constructor above re-wraps
    # the inner lists into fresh copies.
    combined._value_layers_inputs = (self._value_layers_inputs +
                                     other._value_layers_inputs)
    return combined

  def __pow__(self, exponent: int) -> "QuantumCircuit":
    """Inverse circuit; shares this circuit's variables (reference
    circuit.py:164-178)."""
    if exponent != -1:
      raise ValueError("Only the inverse (exponent == -1) is supported.")
    inverse = QuantumCircuit(
        self._pqc.inverse(),
        self._symbol_names,
        self._value_layers_inputs,
        self._value_layers,
        name=f"{self.name}_inverse")
    # Share (alias) the input lists so variable updates propagate.
    inverse._value_layers_inputs = self._value_layers_inputs
    return inverse


class DirectQuantumCircuit(QuantumCircuit):
  """Direct 1:1 map from a flat variable to sorted circuit symbols.

  Mirrors reference qhbmlib/models/circuit.py:181-208.
  """

  def __init__(self,
               pqc: ir.Circuit,
               initializer: Optional[nn.Initializer] = None,
               name: Optional[str] = None):
    initializer = initializer or nn.RandomUniform(0, 2)
    symbol_names = tuple(sorted(pqc.symbol_names))
    values = [[initializer([len(symbol_names)])]]
    super().__init__(pqc, symbol_names, values, [[]], name)


class QAIA(QuantumCircuit):
  """QAOA-like ansatz from quantum + classical Hamiltonian terms with tied
  parameters.  Mirrors reference qhbmlib/models/circuit.py:211-292: each layer
  applies exp(-i*gamma_{l,k} * H_k) for the quantum terms then
  exp(-i*eta_l*theta_b * Z-term_b) for the classical terms.
  """

  def __init__(self,
               quantum_h_terms: Sequence[paulis.PauliSum],
               classical_h_terms: Sequence[paulis.PauliSum],
               num_layers: int,
               initializer: Optional[nn.Initializer] = None,
               name: Optional[str] = None):
    initializer = initializer or nn.RandomUniform(0, 2 * np.pi)
    num_qubits = max(t.num_qubits for t in
                     list(quantum_h_terms) + list(classical_h_terms))
    builder = ir.CircuitBuilder(num_qubits)
    # Symbol names carry the instance name so that independent QAIA copies
    # (e.g. the natural-gradient observable copy) can be composed with this
    # circuit's inverse without symbol collisions.
    prefix = name or f"qaia{id(self)}"
    flat_symbols = []
    for layer in range(num_layers):
      for k, term in enumerate(quantum_h_terms):
        sym = f"{prefix}_gamma_{layer}_{k}"
        ir.exp_pauli_sum(term, symbol=sym, builder=builder)
        flat_symbols.append(sym)
      for k, term in enumerate(classical_h_terms):
        sym = f"{prefix}_eta_{layer}_{k}"
        ir.exp_pauli_sum(term, symbol=sym, builder=builder)
        flat_symbols.append(sym)
    pqc = builder.build()

    num_quantum = len(quantum_h_terms)
    num_classical = len(classical_h_terms)

    def embed_params(inputs):
      """Ties QAIA parameters: per-layer values are
      [gammas_l, etas_l*thetas]."""
      etas, thetas, gammas = inputs
      classical_params = etas[:, None] * thetas[None, :]  # [L, C]
      return jnp.concatenate([gammas, classical_params], axis=1).reshape([-1])

    value_layers_inputs = [[
        initializer([num_layers]),  # true etas
        initializer([num_classical]),  # thetas
        initializer([num_layers, num_quantum]),  # gammas
    ]]
    value_layers = [[nn.Lambda(embed_params)]]
    super().__init__(pqc, tuple(flat_symbols), value_layers_inputs,
                     value_layers, name)
