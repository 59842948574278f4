"""fast_sim.cc (the independent CPU performance anchor) must agree with
the JAX engine on energies AND adjoint gradients — otherwise its steps/s
would not be comparable work.  Mirrors the role of the reference's
cirq.Simulator cross-checks (reference tests/inference/qnn_test.py:183-264)
for the optimized native path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qhbmlib_tpu import models
from qhbmlib_tpu.inference import qnn
from qhbmlib_tpu.models import circuit_utils
from qhbmlib_tpu.ops import circuit_ir as ir
from qhbmlib_tpu.ops import native_fast, paulis

pytestmark = pytest.mark.skipif(
    not native_fast.available(),
    reason=f"native fast_sim unavailable: {native_fast.build_error()}")


def _jax_energy_and_grad(circuit, slot_values, target, bits):
  """Energies + jacobian from the JAX engine, in IR-SLOT order.

  DirectQuantumCircuit's flat variable follows sorted symbol names while
  native_fast consumes IR slot order; permute at both ends so the two
  engines see the same parameter vector.
  """
  model = models.DirectQuantumCircuit(circuit)
  q_inf = qnn.AnalyticQuantumInference(model)
  # sorted-name index -> IR slot index
  to_slot = np.array([circuit.symbol_names.index(s)
                      for s in model.symbol_names])

  def per_state(sorted_vals):
    return q_inf.expectation_pure([sorted_vals], bits, target)[:, 0]

  sorted_vals = jnp.asarray(np.asarray(slot_values)[to_slot], jnp.float32)
  energies = per_state(sorted_vals)
  jac = jax.jacrev(per_state)(sorted_vals)  # [B, num_sorted]
  jac_slot = np.zeros_like(np.asarray(jac, np.float64))
  jac_slot[:, to_slot] = np.asarray(jac, np.float64)
  return np.asarray(energies, np.float64), jac_slot


@pytest.mark.parametrize("n,layers", [(5, 2), (7, 1)])
def test_hea_energies_and_grads_match_jax(n, layers):
  circuit = circuit_utils.hardware_efficient_ansatz(n, layers)
  rng = np.random.RandomState(7 + n)
  values = rng.uniform(-1.5, 1.5, len(circuit.symbol_names))
  target = paulis.tfim_1d(n)
  zz, xs = native_fast.split_pauli_terms(target)
  bits = rng.randint(0, 2, size=(4, n))

  energies, sym_grads, _ = native_fast.vqt_step(circuit, values, zz, xs, bits)
  jax_e, jax_j = _jax_energy_and_grad(circuit, values, target, bits)

  np.testing.assert_allclose(energies, jax_e, atol=2e-4)
  np.testing.assert_allclose(sym_grads, jax_j, atol=2e-4)


def test_rotation_gate_kinds_match_jax():
  """RX/RY/RZ/YP kinds (not exercised by the bench HEA) also agree."""
  n = 4
  b = ir.CircuitBuilder(n)
  for q in range(n):
    b.rx(q, f"a_{q}")
  for q in range(n):
    b.ry(q, f"b_{q}")
  for q in range(n):
    b.rz(q, f"c_{q}")
  for q in range(n):
    b.yp(q, f"d_{q}")
  circuit = b.build()
  rng = np.random.RandomState(3)
  values = rng.uniform(-2, 2, len(circuit.symbol_names))
  target = paulis.tfim_1d(n)
  zz, xs = native_fast.split_pauli_terms(target)
  bits = rng.randint(0, 2, size=(3, n))

  energies, sym_grads, _ = native_fast.vqt_step(circuit, values, zz, xs, bits)
  jax_e, jax_j = _jax_energy_and_grad(circuit, values, target, bits)

  np.testing.assert_allclose(energies, jax_e, atol=2e-4)
  np.testing.assert_allclose(sym_grads, jax_j, atol=2e-4)


def test_split_pauli_terms_rejects_general_sums():
  psum = paulis.pauli_sum_from_strings(3, [(1.0, {0: "Y"})])
  with pytest.raises(ValueError):
    native_fast.split_pauli_terms(psum)
