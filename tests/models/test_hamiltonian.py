"""Tests of models.hamiltonian (mirrors reference
tests/models/hamiltonian_test.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from qhbmlib_tpu import models, nn
from qhbmlib_tpu.inference import qnn_utils
from qhbmlib_tpu.models import circuit_utils


def _make(num_qubits=3, layers=1):
  energy = models.BernoulliEnergy(list(range(num_qubits)),
                                  nn.RandomUniform(-1, 1, seed=4))
  circuit = models.DirectQuantumCircuit(
      circuit_utils.hardware_efficient_ansatz(num_qubits, layers),
      nn.RandomUniform(-1, 1, seed=5))
  return models.Hamiltonian(energy, circuit)


def test_init_properties():
  h = _make()
  assert h.energy.num_bits == 3
  assert h.circuit.num_qubits == 3
  # PauliMixin energies precompute operator shards
  # (reference models/hamiltonian.py:46-51).
  assert h.operator_shards is not None
  assert len(h.operator_shards) == 3


def test_size_mismatch_raises():
  """Reference hamiltonian_test.py:76 pins the ValueError."""
  energy = models.BernoulliEnergy([0, 1])
  circuit = models.DirectQuantumCircuit(
      circuit_utils.hardware_efficient_ansatz(3, 1))
  with pytest.raises(ValueError):
    models.Hamiltonian(energy, circuit)


def test_circuit_dagger_inverts():
  """U followed by U^-1 is the identity (dense check at small n)."""
  h = _make(num_qubits=2)
  u = np.asarray(qnn_utils.unitary(h.circuit))
  values = h.circuit.resolved_values
  from qhbmlib_tpu.ops import statevector as sv
  u_dag = np.asarray(sv.unitary(h.circuit_dagger.pqc, values))
  np.testing.assert_allclose(u_dag @ u, np.eye(4), atol=1e-5)


def test_weights_roundtrip():
  """get_weights/set_weights parity (reference baselines/train.py:283-284)."""
  h = _make()
  w = h.get_weights()
  perturbed = [x + 1.0 for x in w]
  h.set_weights(perturbed)
  for got, want in zip(h.get_weights(), perturbed):
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))
  # energy and circuit variables both updated
  assert len(h.energy.trainable_variables) + len(
      h.circuit.trainable_variables) == len(w)


def test_non_pauli_energy_has_no_shards():
  layers = [nn.Lambda(lambda x: jnp.asarray(x, jnp.float32)),
            nn.Dense(1, kernel_initializer=nn.RandomUniform(-1, 1, seed=1)),
            nn.Lambda(lambda x: jnp.squeeze(x, -1))]
  energy = models.BitstringEnergy([0, 1], layers)
  circuit = models.DirectQuantumCircuit(
      circuit_utils.hardware_efficient_ansatz(2, 1))
  h = models.Hamiltonian(energy, circuit)
  assert h.operator_shards is None
