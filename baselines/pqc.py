"""Hardware-efficient ansatz builder.

Mirrors reference baselines/pqc.py:21-63 (X^a Z^b rotation layers plus
brick-wall CZ^a entanglers); the circuit is built directly in the
array-native IR via models/circuit_utils.py.
"""

from __future__ import annotations

from qhbmlib_tpu.models import circuit_utils
from qhbmlib_tpu.ops import circuit_ir as ir


def get_hardware_efficient_model_unitary(num_qubits: int, num_layers: int,
                                         name: str) -> ir.Circuit:
  """X^a Z^b rotations on every qubit then even/odd CZ^a entangler pairs,
  repeated `num_layers` times."""
  return circuit_utils.hardware_efficient_ansatz(num_qubits, num_layers,
                                                 name=name)
