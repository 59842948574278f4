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


def test_approximate_gradient_exact_on_quartics():
  """The five-point stencil is EXACT (up to float64 round-off) for
  polynomials of degree <= 4 -- the property that makes it trustworthy at
  the library's gradient tolerances (reference test_util_test.py:359-481)."""
  x0 = jnp.asarray([0.7, -0.4], jnp.float32)

  def f(x):
    return jnp.sum(0.3 * x**4 - 1.2 * x**3 + x**2 - 5.0 * x + 2.0)

  approx = np.asarray(test_util.approximate_gradient(f, x0, delta=1e-1))
  x = np.asarray(x0, np.float64)
  exact = 1.2 * x**3 - 3.6 * x**2 + 2.0 * x - 5.0
  np.testing.assert_allclose(approx, exact, rtol=1e-5)


def test_approximate_gradient_error_scales_as_delta4():
  """Truncation error of the five-point stencil is O(delta^4): shrinking
  delta by 2 must shrink the error on a non-polynomial function ~16x."""
  x0 = jnp.asarray([0.9], jnp.float32)

  def f(x):
    return jnp.sum(jnp.exp(x))

  exact = float(np.exp(0.9))
  err = {}
  for delta in (0.4, 0.2):
    approx = float(
        np.asarray(test_util.approximate_gradient(f, x0, delta=delta))[0])
    err[delta] = abs(approx - exact)
  ratio = err[0.4] / max(err[0.2], 1e-12)
  assert 8.0 < ratio < 32.0, (err, ratio)


def test_approximate_gradient_catches_wrong_gradient():
  """Guard on the guard: the stencil must DISAGREE with an incorrect
  analytic gradient (otherwise its agreement checks prove nothing)."""
  x0 = jnp.asarray([0.5, 1.5], jnp.float32)

  def f(x):
    return jnp.sum(jnp.sin(x))

  approx = np.asarray(test_util.approximate_gradient(f, x0))
  wrong = np.sin(np.asarray(x0))  # should be cos
  assert np.abs(approx - wrong).max() > 0.1


def test_approximate_jacobian_matches_jax():
  """Vector-valued stencil Jacobian vs jax.jacrev (reference
  test_util_test.py approximate_jacobian checks)."""
  x0 = {"w": jnp.asarray([[0.2, -0.8], [1.1, 0.4]], jnp.float32)}

  def f(p):
    return jnp.stack([jnp.sum(jnp.sin(p["w"])),
                      jnp.prod(jnp.cos(p["w"])),
                      jnp.sum(p["w"]**3)])

  approx = test_util.approximate_jacobian(f, x0)
  exact = jax.jacrev(f)(x0)
  np.testing.assert_allclose(np.asarray(approx["w"]),
                             np.asarray(exact["w"]), rtol=1e-3, atol=1e-5)


def test_jit_toggle_passes_on_deterministic_fn():
  @test_util.jit_toggle
  def f(x):
    return jnp.sum(x * 2.0)

  out = f(jnp.arange(4, dtype=jnp.float32))
  np.testing.assert_allclose(float(out), 12.0)


def test_jit_toggle_detects_trace_divergence():
  """The toggle must FAIL when eager and traced execution differ -- here a
  Python-side counter bakes a different constant into the trace (the class
  of bug the reference's eager_mode_toggle exists to catch)."""
  counter = {"n": 0}

  @test_util.jit_toggle
  def f(x):
    counter["n"] += 1
    return x + counter["n"]

  try:
    f(jnp.asarray(1.0))
  except AssertionError:
    return
  raise AssertionError("jit_toggle accepted a trace-divergent function")


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


_I2 = np.eye(2, dtype=np.complex128)
_X = np.array([[0, 1], [1, 0]], np.complex128)
_Z = np.array([[1, 0], [0, -1]], np.complex128)


def _power(gate, t):
  """cirq exponent convention incl. global phase: G**t for involution G
  (qhbmlib_tpu/ops/circuit_ir.py:15-23), built independently via eigh."""
  w, v = np.linalg.eigh(gate)
  return np.exp(1j * np.pi * t / 2) * (
      v @ np.diag(np.exp(-1j * np.pi * t / 2 * w)) @ v.conj().T)


def test_hardware_efficient_ansatz_unitary_matches_hand_built():
  """The 2q/1L baseline ansatz unitary equals an independently hand-built
  kron product (reference test_util_test.py:81-97 checks the same ansatz
  against a hand-assembled cirq circuit)."""
  from qhbmlib_tpu.models import circuit_utils
  pqc = circuit_utils.hardware_efficient_ansatz(2, 1)
  rng = np.random.default_rng(11)
  values = rng.uniform(-1, 1, pqc.num_symbols).astype(np.float32)
  got = np.asarray(sv.unitary(pqc, jnp.asarray(values)), np.complex128)

  by_name = dict(zip(pqc.symbol_names, values.astype(np.float64)))
  # Layer order (circuit_utils.hardware_efficient_ansatz): X^a on q0,q1;
  # Z^b on q0,q1; CZ^c on (q0,q1).  Qubit 0 is the MOST significant index
  # (statevector row-major layout).
  u = np.kron(_power(_X, by_name["p_x_0_0"]), _power(_X, by_name["p_x_0_1"]))
  u = np.kron(_power(_Z, by_name["p_z_0_0"]),
              _power(_Z, by_name["p_z_0_1"])) @ u
  cz = np.diag([1.0, 1.0, 1.0, -1.0]).astype(np.complex128)
  w, v = np.linalg.eigh(cz)
  t = by_name["p_cz_e_0_0"]
  czp = np.exp(1j * np.pi * t / 2) * (
      v @ np.diag(np.exp(-1j * np.pi * t / 2 * w)) @ v.conj().T)
  u = czp @ u
  np.testing.assert_allclose(got, u, atol=1e-5)


def test_random_circuit_unitary_is_unitary():
  """U U^dagger = I for the random-factory circuit (reference
  test_util_test.py:119-133 random-unitary validity)."""
  model, _ = test_util.get_random_hamiltonian_and_inference(
      3, 2, "fixture_unitary", 100, exact=True)
  u = np.asarray(
      sv.unitary(model.circuit.pqc, model.circuit.symbol_values),
      np.complex128)
  np.testing.assert_allclose(u @ u.conj().T, np.eye(8), atol=1e-5)


def test_exact_thermal_entropy_fixture():
  """baselines.utils thermal-state helpers against a hand-solved 1-qubit
  diagonal Hamiltonian (reference test_util_test.py:162-181
  EntropyTest.test_exact_entropy)."""
  from baselines import utils as b_utils
  beta = 0.7
  h = np.diag([1.0, -1.0]).astype(np.complex128)  # Z
  rho = np.asarray(b_utils.get_thermal_state(beta, jnp.asarray(h)))
  z = 2 * np.cosh(beta)
  expected = np.diag([np.exp(-beta) / z, np.exp(beta) / z])
  np.testing.assert_allclose(rho, expected, atol=1e-6)
  logz = float(b_utils.log_partition_function(beta, jnp.asarray(h)))
  np.testing.assert_allclose(logz, np.log(z), atol=1e-6)
  # entropy via relative_entropy(rho, rho) = 0 sanity
  np.testing.assert_allclose(
      float(b_utils.relative_entropy(jnp.asarray(rho), jnp.asarray(rho))),
      0.0, atol=1e-6)


def test_approximate_jacobian_catches_wrong_jacobian():
  """Jacobian analog of the wrong-gradient guard."""
  x0 = jnp.asarray([0.4, -0.9], jnp.float32)

  def f(x):
    return jnp.stack([jnp.sum(jnp.sin(x)), jnp.sum(x**2)])

  approx = np.asarray(test_util.approximate_jacobian(f, x0))
  wrong = np.stack([np.sin(np.asarray(x0)), 2.0 * np.asarray(x0)**2])
  assert np.abs(approx - wrong).max() > 0.1
