"""Metrics on QuantumCircuit models.

Mirrors reference qhbmlib/inference/qnn_utils.py:23-33.
"""

from __future__ import annotations

import jax.numpy as jnp

from qhbmlib_tpu.models import circuit as circuit_model
from qhbmlib_tpu.ops import statevector as sv


def unitary(input_circuit: circuit_model.QuantumCircuit,
            phi=None) -> jnp.ndarray:
  """Dense (2^n, 2^n) unitary of the circuit at its current (or given)
  parameter values."""
  if phi is None:
    values = input_circuit.resolved_values
  else:
    values = input_circuit.resolved_values_flat(phi)
  return sv.unitary(input_circuit.pqc, values)
