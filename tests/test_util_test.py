"""Tests of the shared test fixtures themselves.

Mirrors the reference's tests/test_util_test.py (508 LoC of checks that the
five-point stencil and random generators are trustworthy, e.g. reference
test_util_test.py:359-481 stencil-vs-analytic)."""

import jax
import jax.numpy as jnp
import numpy as np

from qhbmlib_tpu.ops import statevector as sv
from tests import test_util


def test_approximate_gradient_matches_analytic():
  """Stencil gradient of a smooth function matches the closed form
  (reference test_util_test.py:359-481)."""
  x0 = jnp.asarray([0.3, -1.1, 2.4], jnp.float32)

  def f(x):
    return jnp.sum(jnp.sin(x) * jnp.exp(0.1 * x))

  approx = test_util.approximate_gradient(f, x0)
  exact = jax.grad(f)(x0)
  np.testing.assert_allclose(np.asarray(approx), np.asarray(exact),
                             rtol=1e-4, atol=1e-5)


def test_approximate_gradient_pytree():
  params = {"a": jnp.asarray([0.5], jnp.float32),
            "b": jnp.asarray([[1.0, -2.0]], jnp.float32)}

  def f(p):
    return jnp.squeeze(p["a"])**2 + jnp.sum(jnp.cos(p["b"]))

  approx = test_util.approximate_gradient(f, params)
  exact = jax.grad(f)(params)
  jax.tree_util.tree_map(
      lambda x, y: np.testing.assert_allclose(
          np.asarray(x), np.asarray(y), rtol=1e-4, atol=1e-5),
      approx, exact)


def test_jit_toggle_passes_on_deterministic_fn():
  @test_util.jit_toggle
  def f(x):
    return jnp.sum(x * 2.0)

  out = f(jnp.arange(4, dtype=jnp.float32))
  np.testing.assert_allclose(float(out), 12.0)


def test_random_pauli_sum_is_hermitian():
  """Expectations of the random operator against random states are real,
  and the dense matrix is Hermitian (analog of reference
  test_util_test.py random-Hermitian checks)."""
  n = 3
  op = test_util.random_pauli_sum(n, 4, seed=7)
  dense = np.zeros((2**n, 2**n), np.complex128)
  mats = [np.eye(2), np.array([[0, 1], [1, 0]]),
          np.array([[0, -1j], [1j, 0]]), np.array([[1, 0], [0, -1]])]
  for t in range(op.num_terms):
    term = np.ones((1, 1), np.complex128)
    for q in range(n):
      term = np.kron(term, mats[op.codes[t][q]])
    dense += float(np.real(op.coeffs[t])) * term
  np.testing.assert_allclose(dense, dense.conj().T, atol=1e-6)
  # Engine expectation against |0...0> equals dense[0, 0].
  val = sv.expectation(sv.zero_state(n), op)
  np.testing.assert_allclose(float(val), np.real(dense[0, 0]), atol=1e-5)


def test_random_mixed_density_matrix_valid():
  rho = np.asarray(
      test_util.random_mixed_density_matrix(2, seed=3), np.complex128)
  np.testing.assert_allclose(np.trace(rho), 1.0, atol=1e-5)
  np.testing.assert_allclose(rho, rho.conj().T, atol=1e-6)
  evals = np.linalg.eigvalsh(rho)
  assert np.all(evals > -1e-7)


def test_random_hamiltonian_factory_shapes():
  model, infer = test_util.get_random_hamiltonian_and_inference(
      3, 2, "fixture_check", 100, exact=True)
  assert model.energy.num_bits == 3
  assert model.circuit.num_qubits == 3
  samples = infer.e_inference.sample(16)
  assert samples.shape == (16, 3)
