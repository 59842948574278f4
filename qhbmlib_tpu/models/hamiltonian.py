"""Hamiltonians in spectral (diagonalized) representation.

Mirrors reference qhbmlib/models/hamiltonian.py:26-51: pairs a BitstringEnergy
(eigenvalues) with a QuantumCircuit (eigenvectors), precomputing the dagger
circuit and -- when the energy is a PauliMixin -- the operator shards as
array-native PauliSums.
"""

from __future__ import annotations

from typing import Optional

from qhbmlib_tpu.models import circuit as circuit_model
from qhbmlib_tpu.models import energy as energy_model


class Hamiltonian:
  """Diagonalized representation of a Hermitian operator."""

  def __init__(self,
               input_energy: energy_model.BitstringEnergy,
               input_circuit: circuit_model.QuantumCircuit,
               name: Optional[str] = None):
    if input_energy.num_bits != input_circuit.num_qubits:
      raise ValueError("`input_energy` and `input_circuit` must act on the "
                       "same number of bits.")
    self.name = name or "Hamiltonian"
    self.energy = input_energy
    self.circuit = input_circuit
    self.circuit_dagger = input_circuit**-1

    self.operator_shards = None
    if isinstance(self.energy, energy_model.PauliMixin):
      self.operator_shards = tuple(
          self.energy.operator_shards(input_circuit.num_qubits))

  @property
  def trainable_variables(self):
    return (list(self.energy.trainable_variables) +
            list(self.circuit.trainable_variables))

  def set_trainable_variables(self, flat):
    ne = len(self.energy.trainable_variables)
    self.energy.set_trainable_variables(flat[:ne])
    self.circuit.set_trainable_variables(flat[ne:])

  def get_weights(self):
    """Keras-style weight access for parity with reference usage
    (reference: baselines/train.py:283-284)."""
    return [v for v in self.trainable_variables]

  def set_weights(self, weights):
    self.set_trainable_variables(weights)
