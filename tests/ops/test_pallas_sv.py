"""Experimental Pallas forward kernel: single-layer validation.

Multi-layer kernels currently mis-execute on TPU and hang the Pallas
interpreter (see ops/pallas_sv.py STATUS); only the validated configuration
is tested.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qhbmlib_tpu.models import circuit_utils
from qhbmlib_tpu.ops import pallas_sv, statevector as sv


@pytest.mark.skipif(not pallas_sv.supported(
    circuit_utils.hardware_efficient_ansatz(9, 1)),
                    reason="pallas TPU backend unavailable")
def test_single_layer_matches_dense_interpret():
  n = 9
  pqc = circuit_utils.hardware_efficient_ansatz(n, 1)
  values = jnp.asarray(
      np.random.RandomState(3).uniform(-1, 1, pqc.num_symbols), jnp.float32)
  state = sv.zero_state(n)
  dense = sv.apply_circuit(pqc, values, state)
  pall = pallas_sv.apply_circuit_pallas(pqc, values, state, interpret=True)
  np.testing.assert_allclose(np.asarray(sv.to_vector(pall)),
                             np.asarray(sv.to_vector(dense)), atol=1e-5)


def test_supported_gate_detection():
  assert pallas_sv.supported(
      circuit_utils.hardware_efficient_ansatz(10, 2)) == (
          pallas_sv.pltpu is not None)
  # PROT with X paulis is unsupported
  from qhbmlib_tpu.ops import circuit_ir as ir, paulis
  b = ir.CircuitBuilder(9)
  b.prot((0, 1), (paulis.X, paulis.Y), "t")
  assert not pallas_sv.supported(b.build())
  # too small / too large states
  assert not pallas_sv.supported(circuit_utils.hardware_efficient_ansatz(4, 1))
  assert not pallas_sv.supported(
      circuit_utils.hardware_efficient_ansatz(24, 1))
