"""Tests for QNN inference (analog of reference tests/inference/qnn_test.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qhbmlib_tpu import models, nn
from qhbmlib_tpu.inference import qnn
from qhbmlib_tpu.models import circuit_utils, energy_utils
from qhbmlib_tpu.ops import paulis
from qhbmlib_tpu.ops import statevector as sv
from tests import test_util

ANALYTIC_ATOL = 2e-3  # reference qnn_test.py:49-50
SAMPLED_ATOL = 2e-2  # reference sampled tolerance at 1e6 shots


def _setup(n=2, layers=2, seed=0, sampled=False, shots=100000):
  pqc = circuit_utils.hardware_efficient_ansatz(n, layers)
  circ = models.DirectQuantumCircuit(pqc, nn.RandomUniform(-1, 1, seed=seed))
  if sampled:
    q_infer = qnn.SampledQuantumInference(circ, shots, initial_seed=seed + 1)
  else:
    q_infer = qnn.AnalyticQuantumInference(circ)
  return circ, q_infer


def _dense_oracle_expectations(circ, bits, ops):
  """Exact expectations via the dense unitary."""
  u = np.asarray(sv.unitary(circ.pqc, circ.resolved_values), np.complex128)
  out = np.zeros((bits.shape[0], len(ops)))
  n = circ.num_qubits
  for i, b in enumerate(np.asarray(bits)):
    idx = int("".join(str(x) for x in b), 2)
    psi = u[:, idx]
    for j, op in enumerate(ops):
      out[i, j] = np.real(psi.conj() @ np.asarray(op.dense()) @ psi)
  return out


class TestAnalyticQuantumInference:

  def test_pauli_expectations_match_dense(self):
    n = 2
    circ, q_infer = _setup(n, seed=1)
    ops = (test_util.random_pauli_sum(n, 3, seed=2),
           paulis.pauli_string(n, {0: "Z"}))
    bits = jnp.asarray([[0, 0], [0, 1], [1, 1]], jnp.int8)
    actual = np.asarray(q_infer.expectation(bits, ops))
    expected = _dense_oracle_expectations(circ, bits, ops)
    np.testing.assert_allclose(actual, expected, atol=ANALYTIC_ATOL)

  def test_expectation_dedups_and_expands(self):
    n = 2
    circ, q_infer = _setup(n, seed=3)
    op = paulis.pauli_string(n, {1: "Z"})
    bits = jnp.asarray([[0, 1], [0, 1], [1, 0], [0, 1]], jnp.int8)
    out = np.asarray(q_infer.expectation(bits, op))
    assert out.shape == (4, 1)
    np.testing.assert_allclose(out[0], out[1], atol=1e-6)
    np.testing.assert_allclose(out[1], out[3], atol=1e-6)

  def test_hamiltonian_observable(self):
    """Hamiltonian observables measure shards through the dagger circuit and
    post-process with the energy (reference qnn.py:114-139)."""
    n = 2
    circ, q_infer = _setup(n, seed=4)
    obs_energy = models.BernoulliEnergy(list(range(n)),
                                        nn.RandomUniform(-1, 1, seed=5))
    obs_circ = models.DirectQuantumCircuit(
        circuit_utils.hardware_efficient_ansatz(n, 1, name="obs"),
        nn.RandomUniform(-1, 1, seed=6))
    obs = models.Hamiltonian(obs_energy, obs_circ)
    bits = jnp.asarray([[0, 0], [1, 0]], jnp.int8)
    actual = np.asarray(q_infer.expectation(bits, obs))
    # Dense oracle: <psi| U_obs K U_obs^dagger |psi>, K = sum theta_i Z_i.
    kernel = np.asarray(obs_energy.trainable_variables[0])
    k_dense = sum(
        kernel[i] * np.asarray(paulis.pauli_string(n, {i: "Z"}).dense())
        for i in range(n))
    u_obs = np.asarray(sv.unitary(obs_circ.pqc, obs_circ.resolved_values),
                       np.complex128)
    h_dense = u_obs @ k_dense @ u_obs.conj().T
    u = np.asarray(sv.unitary(circ.pqc, circ.resolved_values), np.complex128)
    for i, b in enumerate(np.asarray(bits)):
      idx = int("".join(str(x) for x in b), 2)
      psi = u[:, idx]
      expected = np.real(psi.conj() @ h_dense @ psi)
      np.testing.assert_allclose(actual[i, 0], expected, atol=ANALYTIC_ATOL)

  def test_gradients_match_stencil(self):
    n = 2
    circ, q_infer = _setup(n, layers=1, seed=7)
    op = test_util.random_pauli_sum(n, 2, seed=8)
    bits = jnp.asarray([[0, 1]], jnp.int8)

    def f(phi):
      return jnp.sum(q_infer.expectation_pure(phi, bits, op))

    actual = test_util.jit_toggle(jax.grad(f))(circ.trainable_variables)
    expected = test_util.approximate_gradient(f, circ.trainable_variables)
    for a, e in zip(actual, expected):
      np.testing.assert_allclose(np.asarray(a), np.asarray(e), atol=1e-3)


class TestSampledQuantumInference:

  def test_matches_analytic(self):
    """Sampled vs analytic engines agree at the reference's 1e6-shot
    statistical power (reference qnn_test.py:164-180, vqt_loss_test.py:40-43;
    the inverse-CDF sampler keeps this fast)."""
    n = 2
    circ, q_analytic = _setup(n, seed=9)
    q_sampled = qnn.SampledQuantumInference(circ, 1_000_000, initial_seed=10)
    ops = (test_util.random_pauli_sum(n, 3, seed=11),)
    bits = jnp.asarray([[0, 0], [1, 0]], jnp.int8)
    a = np.asarray(q_analytic.expectation(bits, ops))
    s = np.asarray(q_sampled.expectation(bits, ops))
    np.testing.assert_allclose(a, s, atol=SAMPLED_ATOL)

  def test_parameter_shift_gradient(self):
    """Parameter-shift gradients (fresh 1e6-shot batches per shifted
    evaluation) vs adjoint-exact, at the reference's rtol-2e-2 power."""
    n = 2
    circ, q_sampled = _setup(n, layers=1, seed=12, sampled=True,
                             shots=1_000_000)
    op = paulis.pauli_sum_from_strings(n, [(0.7, {0: "Z"}), (-0.4, {1: "X"})])
    bits = jnp.asarray([[0, 0]], jnp.int8)
    key = jax.random.PRNGKey(42)

    def f_sampled(phi):
      return jnp.sum(
          q_sampled.expectation_pure(phi, bits, op, key=key))

    _, q_analytic = _setup(n, layers=1, seed=12)

    def f_exact(phi):
      return jnp.sum(q_analytic.expectation_pure(phi, bits, op))

    g_s = test_util.jit_toggle(jax.grad(f_sampled))(circ.trainable_variables)
    g_a = jax.grad(f_exact)(circ.trainable_variables)
    for a, e in zip(g_s, g_a):
      np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                 atol=SAMPLED_ATOL)

  def test_general_energy_observable(self):
    """Non-PauliMixin Hamiltonian observables go through the sampled-energy
    path (reference qnn.py:170-238)."""
    n = 2
    circ, q_sampled = _setup(n, seed=13, sampled=True, shots=100000)
    layers = [
        energy_utils.SpinsFromBitstrings(),
        nn.Dense(4, activation=jax.nn.tanh,
                 kernel_initializer=nn.RandomUniform(-1, 1, seed=14)),
        nn.Dense(1, kernel_initializer=nn.RandomUniform(-1, 1, seed=15)),
        nn.Lambda(lambda x: jnp.squeeze(x, -1)),
    ]
    obs_energy = models.BitstringEnergy(list(range(n)), layers)
    obs_circ = models.DirectQuantumCircuit(
        circuit_utils.hardware_efficient_ansatz(n, 1, name="obs2"),
        nn.RandomUniform(-1, 1, seed=16))
    obs = models.Hamiltonian(obs_energy, obs_circ)
    bits = jnp.asarray([[0, 1]], jnp.int8)
    actual = float(q_sampled.expectation(bits, obs)[0, 0])

    # Dense oracle: K = sum_x E(x)|x><x| in obs eigenbasis.
    e_vals = np.asarray(obs_energy(jnp.asarray(sv.all_bitstrings(n))))
    u_obs = np.asarray(sv.unitary(obs_circ.pqc, obs_circ.resolved_values),
                       np.complex128)
    h_dense = u_obs @ np.diag(e_vals) @ u_obs.conj().T
    u = np.asarray(sv.unitary(circ.pqc, circ.resolved_values), np.complex128)
    psi = u[:, 1]
    expected = float(np.real(psi.conj() @ h_dense @ psi))
    np.testing.assert_allclose(actual, expected, atol=SAMPLED_ATOL)

    # Gradients: energy params via the tape path, circuit params via shift.
    key = jax.random.PRNGKey(17)

    def f(params):
      phi, etv = params
      return jnp.sum(q_sampled.expectation_pure(
          phi, bits, obs,
          obs_circuit_params=obs_circ.trainable_variables,
          obs_energy_params=etv, key=key))

    g_phi, g_etv = jax.grad(f)(
        (circ.trainable_variables, obs_energy.trainable_variables))
    assert any(np.abs(np.asarray(g)).max() > 1e-3 for g in g_phi)
    assert any(np.abs(np.asarray(g)).max() > 1e-3 for g in g_etv)

  def test_sample(self):
    n = 2
    circ, q_sampled = _setup(n, seed=18, sampled=True, shots=100)
    bits = jnp.asarray([[0, 0], [1, 1]], jnp.int8)
    counts = jnp.asarray([5, 3])
    samples, mask = q_sampled.sample(bits, counts)
    assert samples.shape == (2, 5, n)
    np.testing.assert_array_equal(np.asarray(mask),
                                  [[1, 1, 1, 1, 1], [1, 1, 1, 0, 0]])

  def test_sample_jit_with_static_max_count(self):
    """Under jit, `counts` is traced: a static `max_count` must be passed
    (and makes the method trace-safe); omitting it raises an actionable
    error instead of a TracerConversionError deep in int()."""
    n = 2
    circ, q_sampled = _setup(n, seed=18, sampled=True, shots=100)
    bits = jnp.asarray([[0, 0], [1, 1]], jnp.int8)
    counts = jnp.asarray([5, 3])

    jitted = jax.jit(
        lambda b, c: q_sampled.sample(b, c, max_count=5))
    samples, mask = jitted(bits, counts)
    assert samples.shape == (2, 5, n)
    np.testing.assert_array_equal(np.asarray(mask),
                                  [[1, 1, 1, 1, 1], [1, 1, 1, 0, 0]])

    with pytest.raises(ValueError, match="static `max_count`"):
      jax.jit(lambda b, c: q_sampled.sample(b, c))(bits, counts)

  def test_sample_rejects_truncating_max_count(self):
    """An eager `max_count` below max(counts) would silently draw fewer
    samples than a state's count while the mask marks them all valid --
    biased count-weighted statistics downstream.  The eager path (where
    counts is concrete and the check is free) must reject it."""
    n = 2
    circ, q_sampled = _setup(n, seed=18, sampled=True, shots=100)
    bits = jnp.asarray([[0, 0], [1, 1]], jnp.int8)
    counts = jnp.asarray([5, 3])
    with pytest.raises(ValueError, match="truncate"):
      q_sampled.sample(bits, counts, max_count=4)
    # An upper bound larger than max(counts) is fine.
    samples, mask = q_sampled.sample(bits, counts, max_count=8)
    assert samples.shape == (2, 8, n)
    np.testing.assert_array_equal(np.asarray(mask).sum(axis=1), [5, 3])

  def test_sample_uneven(self):
    """No discrepancy in sample statistics when count entries differ
    (analog of reference qnn_test.py test_sample_uneven)."""
    n = 1
    # rx(pi/2)|0> has equal |0>/|1> probabilities (the reference uses H).
    circ = models.DirectQuantumCircuit(circuit_utils.rx_ansatz(n),
                                       nn.Constant(np.pi / 2))
    q_infer = qnn.SampledQuantumInference(circ, 100, initial_seed=11)
    big, small = 100000, 50000
    bits = jnp.asarray([[0], [0]], jnp.int8)
    counts = jnp.asarray([small, big])
    samples, mask = q_infer.sample(bits, counts)
    samples = np.asarray(samples)[..., 0]
    mask = np.asarray(mask)
    assert mask.sum(axis=1).tolist() == [small, big]
    # Each row should be ~half ones among its masked-valid entries.
    frac = (samples * mask).sum(axis=1) / mask.sum(axis=1)
    np.testing.assert_allclose(frac, [0.5, 0.5], atol=1e-2)
    # And the two rows agree with each other despite different counts.
    np.testing.assert_allclose(frac[0], frac[1], atol=1e-2)
