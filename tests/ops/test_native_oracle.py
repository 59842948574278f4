"""JAX engine vs the independent C++ oracle (double precision).

Mirrors the reference's cross-simulator strategy against cirq.Simulator
(reference tests/inference/qnn_test.py:183-264): two independent
implementations of the gate semantics must agree on random circuits.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from qhbmlib_tpu.ops import native_oracle, statevector as sv
from tests.ops.test_statevector import RNG, random_circuit

pytestmark = pytest.mark.skipif(
    not native_oracle.available(),
    reason=f"native oracle unavailable: {native_oracle.build_error()}")


@pytest.mark.parametrize("n,depth,seed", [(2, 3, 21), (4, 3, 22), (6, 2, 23)])
def test_simulate_matches_native(n, depth, seed):
  circuit = random_circuit(n, depth, seed)
  values = RNG.uniform(-2, 2, circuit.num_symbols)
  expected = native_oracle.simulate(circuit, values)
  actual = np.asarray(
      sv.to_vector(sv.simulate(circuit, jnp.asarray(values, jnp.float32))))
  np.testing.assert_allclose(actual, expected, atol=2e-5)


@pytest.mark.parametrize("n,seed", [(3, 31), (5, 32)])
def test_expectation_f64_matches_engine(n, seed):
  """The f64 host-side PauliSum expectation (the precision reference for
  bench.py's bf16-accuracy artifact) agrees with the JAX engine's tiered
  expectation on random states and random multi-term observables."""
  from qhbmlib_tpu.ops import paulis
  rng = np.random.RandomState(seed)
  vec = rng.normal(size=2**n) + 1j * rng.normal(size=2**n)
  vec = vec / np.linalg.norm(vec)
  terms = [(float(rng.uniform(-1, 1)),
            {int(q): "XYZ"[rng.randint(3)]
             for q in rng.choice(n, rng.randint(1, n), replace=False)})
           for _ in range(6)]
  op = paulis.pauli_sum_from_strings(n, terms)
  got = native_oracle.expectation_f64(vec, op)
  state = sv.from_vector(jnp.asarray(vec, jnp.complex64), n)
  want = float(sv.expectation(state, op))
  np.testing.assert_allclose(got, want, atol=2e-5)
  # And against the dense-matrix definition, full f64.
  dense = np.asarray(op.dense(), np.complex128)
  exact = float(np.real(np.conj(vec) @ dense @ vec))
  np.testing.assert_allclose(got, exact, atol=1e-12)


def test_basis_state_init_matches_native():
  n = 4
  circuit = random_circuit(n, 2, seed=24)
  values = RNG.uniform(-1, 1, circuit.num_symbols)
  for idx in (3, 9, 15):
    bits = sv.all_bitstrings(n)[idx]
    expected = native_oracle.simulate(circuit, values, bits=bits)
    actual = np.asarray(
        sv.to_vector(sv.simulate_from_bits(
            circuit, jnp.asarray(values, jnp.float32), jnp.asarray(bits))))
    np.testing.assert_allclose(actual, expected, atol=2e-5)
