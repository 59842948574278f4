"""Tests for EBM inference (analog of reference tests/inference/ebm_test.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qhbmlib_tpu import models, nn
from qhbmlib_tpu.inference import ebm
from qhbmlib_tpu.ops import statevector as sv
from tests import test_util


def _random_kobe(n, seed=0):
  return models.KOBE(list(range(n)), 2, nn.RandomUniform(-1, 1, seed=seed))


class TestAnalyticEnergyInference:

  def test_sample_histogram_matches_softmax(self):
    n = 3
    energy = _random_kobe(n, seed=1)
    infer = ebm.AnalyticEnergyInference(energy, 100000, initial_seed=5)
    samples = infer.sample(100000)
    idx = np.asarray(samples).astype(np.int64) @ (2**np.arange(n - 1, -1, -1))
    hist = np.bincount(idx, minlength=2**n) / 100000.0
    probs = np.asarray(jax.nn.softmax(-energy(infer.all_bitstrings)))
    np.testing.assert_allclose(hist, probs, atol=6e-3)
    # Non-uniformity guard: distribution must differ from uniform.
    assert np.abs(probs - 1 / 2**n).max() > 1e-3

  def test_seeded_determinism(self):
    energy = _random_kobe(3, seed=2)
    infer = ebm.AnalyticEnergyInference(energy, 100, initial_seed=7)
    s1 = infer.sample(50)
    s2 = infer.sample(50)
    # Fixed seed -> identical samples on every call (reference
    # ebm.py:89-123 fixed-seed semantics).
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    infer.seed = None
    s3 = infer.sample(50)
    s4 = infer.sample(50)
    assert not np.array_equal(np.asarray(s3), np.asarray(s4))

  def test_entropy_and_log_partition_exact(self):
    n = 4
    energy = _random_kobe(n, seed=3)
    infer = ebm.AnalyticEnergyInference(energy, 100, initial_seed=1)
    energies = np.asarray(energy(infer.all_bitstrings), np.float64)
    z = np.exp(-energies).sum()
    probs = np.exp(-energies) / z
    theta = energy.trainable_variables
    key = jax.random.PRNGKey(1)
    logz = test_util.jit_toggle(
        lambda th: infer.log_partition_pure(th, key))(theta)
    entropy = test_util.jit_toggle(
        lambda th: infer.entropy_pure(th, key))(theta)
    np.testing.assert_allclose(float(logz), np.log(z), rtol=1e-5)
    np.testing.assert_allclose(float(entropy),
                               -(probs * np.log(probs)).sum(), rtol=1e-5)

  def test_expectation_value(self):
    n = 3
    energy = _random_kobe(n, seed=4)
    infer = ebm.AnalyticEnergyInference(energy, 200000, initial_seed=9)
    probs = np.asarray(jax.nn.softmax(-energy(infer.all_bitstrings)),
                       np.float64)
    f = lambda bits: jnp.sum(bits.astype(jnp.float32), -1)
    vals = np.asarray(sv.all_bitstrings(n)).sum(-1)
    expected = (probs * vals).sum()
    actual = float(infer.expectation(f))
    np.testing.assert_allclose(actual, expected, rtol=2e-2)

  def test_expectation_finite_difference(self):
    """Eq. A5 custom gradient vs five-point stencil, exact mode
    (analog of reference ebm_test.py:456)."""
    n = 3
    energy = _random_kobe(n, seed=5)
    infer = ebm.AnalyticEnergyInference(energy, 500, exact=True)
    key = jax.random.PRNGKey(0)

    def f(fp, bits):
      # A nonlinear function of bits with its own parameter.
      return jnp.cos(jnp.sum(bits.astype(jnp.float32) * fp, -1))

    f_param = jnp.asarray([0.3, -1.1, 0.7])

    def loss(theta):
      return infer.expectation_pure(theta, f, f_param, key)

    actual = test_util.jit_toggle(jax.grad(loss))(energy.trainable_variables)
    expected = test_util.approximate_gradient(loss,
                                              energy.trainable_variables)
    for a, e in zip(actual, expected):
      np.testing.assert_allclose(np.asarray(a), np.asarray(e), rtol=1e-3,
                                 atol=1e-5)
      assert np.abs(np.asarray(e)).max() > 1e-4  # non-zero guard

  def test_log_partition_gradient(self):
    """Eq. C2 gradient vs exact: dlogZ/dtheta = -<dE/dtheta>_p."""
    n = 3
    energy = _random_kobe(n, seed=6)
    infer = ebm.AnalyticEnergyInference(energy, 500, exact=True)
    key = jax.random.PRNGKey(0)

    def logz(theta):
      return infer.log_partition_pure(theta, key)

    actual = test_util.jit_toggle(jax.grad(logz))(energy.trainable_variables)
    expected = test_util.approximate_gradient(logz,
                                              energy.trainable_variables)
    for a, e in zip(actual, expected):
      np.testing.assert_allclose(np.asarray(a), np.asarray(e), rtol=1e-3,
                                 atol=1e-5)

  def test_expectation_nested_structure(self):
    """Pytree-valued f mixing pathwise and score gradients, vs stencil
    (analog of reference ebm_test.py:457-512 nested-structure test)."""
    n = 3
    num_units = 5
    energy = _random_kobe(n, seed=8)
    infer = ebm.AnalyticEnergyInference(energy, 500, exact=True)
    key = jax.random.PRNGKey(0)

    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(42), 3)
    dense_w = jax.random.uniform(k0, (n, num_units), minval=1.0, maxval=2.0)
    dense_b = jax.random.uniform(k1, (num_units,), minval=1.0, maxval=2.0)
    scalar = jnp.float32(1.37)

    def f(fp, bits):
      w, b, s, th = fp
      x = bits.astype(jnp.float32)
      reduced = jnp.sum(x, -1)
      # Nested structure: [scalar-per-sample, vector, [theta-dependent matrix]]
      return [s * reduced, x @ w + b,
              [jnp.einsum("i,j->ij", reduced, th[0])]]

    theta0 = energy.trainable_variables
    # Fixed cotangents contract the pytree output to a scalar so both the
    # pathwise (through fp) and score (through theta) terms are exercised.
    cot_vec = jax.random.uniform(k2, (num_units,), minval=0.5, maxval=1.5)

    def loss(theta):
      out = infer.expectation_pure(
          theta, f, (dense_w, dense_b, scalar, theta), key)
      s_avg, v_avg, (m_avg,) = out
      return (s_avg + jnp.sum(cot_vec * v_avg) +
              jnp.sum(m_avg * jnp.arange(1.0, m_avg.size + 1.0).reshape(
                  m_avg.shape)))

    actual = test_util.jit_toggle(jax.grad(loss))(theta0)
    expected = test_util.approximate_gradient(loss, theta0)
    for a, e in zip(actual, expected):
      np.testing.assert_allclose(np.asarray(a), np.asarray(e), rtol=1e-3,
                                 atol=1e-5)
      assert np.abs(np.asarray(e)).max() > 1e-4  # non-zero guard

    # Value check: expectation equals the explicit softmax(-E) average.
    out = infer.expectation_pure(
        theta0, f, (dense_w, dense_b, scalar, theta0), key)
    bits = infer.all_bitstrings
    probs = np.asarray(jax.nn.softmax(-energy(bits)), np.float64)
    vals = f((dense_w, dense_b, scalar, theta0), bits)
    for got, want in zip(jax.tree_util.tree_leaves(out),
                         jax.tree_util.tree_leaves(vals)):
      w = probs.reshape((-1,) + (1,) * (np.asarray(want).ndim - 1))
      np.testing.assert_allclose(np.asarray(got),
                                 (w * np.asarray(want)).sum(0), rtol=1e-4)

    # Unconnected parameter receives an exactly-zero gradient.
    def loss_mu(mu):
      out = infer.expectation_pure(
          theta0, f, (dense_w, dense_b, scalar, theta0), key)
      return jax.tree_util.tree_reduce(
          lambda acc, x: acc + jnp.sum(x), out, 0.0) + 0.0 * jnp.sum(mu * 0.0)
    g_mu = jax.grad(loss_mu)(jnp.ones((3,)))
    np.testing.assert_array_equal(np.asarray(g_mu), 0.0)

  def test_too_many_bits_raises(self):
    with pytest.raises(ValueError):
      ebm.AnalyticEnergyInference(_random_kobe(2), 10).__class__(
          models.BernoulliEnergy(list(range(23))), 10)


class TestBernoulliEnergyInference:

  def test_sample_statistics(self):
    n = 4
    energy = models.BernoulliEnergy(list(range(n)),
                                    nn.RandomUniform(-1, 1, seed=7))
    infer = ebm.BernoulliEnergyInference(energy, 100000, initial_seed=3)
    samples = np.asarray(infer.sample(100000))
    p_hat = samples.mean(0)
    p = np.asarray(jax.nn.sigmoid(energy.logits))
    np.testing.assert_allclose(p_hat, p, atol=6e-3)

  def test_entropy_closed_form(self):
    n = 3
    energy = models.BernoulliEnergy(list(range(n)),
                                    nn.RandomUniform(-2, 2, seed=8))
    infer = ebm.BernoulliEnergyInference(energy, 100)
    p = np.asarray(jax.nn.sigmoid(energy.logits), np.float64)
    expected = -(p * np.log(p) + (1 - p) * np.log(1 - p)).sum()
    entropy = test_util.jit_toggle(
        lambda th: infer.entropy_pure(th, jax.random.PRNGKey(0)))(
            energy.trainable_variables)
    np.testing.assert_allclose(float(entropy), expected, rtol=1e-5)

  def test_log_partition_closed_form(self):
    n = 3
    energy = models.BernoulliEnergy(list(range(n)),
                                    nn.RandomUniform(-2, 2, seed=9))
    infer = ebm.BernoulliEnergyInference(energy, 100)
    thetas = np.asarray(energy.logits, np.float64) / 2
    expected = np.log(2 * np.cosh(thetas)).sum()
    logz = test_util.jit_toggle(
        lambda th: infer.log_partition_pure(th, jax.random.PRNGKey(0)))(
            energy.trainable_variables)
    np.testing.assert_allclose(float(logz), expected, rtol=1e-5)

  def test_large_n_unique_path(self):
    """n > enum threshold goes through padded-unique support."""
    n = ebm.DEFAULT_ENUM_BITS + 2
    energy = models.BernoulliEnergy(list(range(n)),
                                    nn.RandomUniform(1.0, 2.0, seed=10))
    infer = ebm.BernoulliEnergyInference(energy, 2000, initial_seed=1,
                                         max_unique_samples=2048)
    # With strongly positive thetas, p(bit=1) ~ sigmoid(2*theta) > 0.88,
    # so <sum(bits)> = sum(p).
    f = lambda bits: jnp.sum(bits.astype(jnp.float32), -1)
    p = np.asarray(jax.nn.sigmoid(energy.logits), np.float64)
    actual = float(infer.expectation(f))
    np.testing.assert_allclose(actual, p.sum(), rtol=5e-2)


class TestGibbsWithGradients:

  def test_chain_histogram(self):
    """MCMC samples converge to softmax(-E) with FULL support over all 2^n
    outcomes at high statistical power (analog of reference
    ebm_test.py:879-941, which runs 1e6-scale sample checks)."""
    n = 4
    energy = _random_kobe(n, seed=11)
    num_samples = 100_000
    infer = ebm.GibbsWithGradientsInference(
        energy, num_samples, num_burnin_samples=500, num_chains=32,
        initial_seed=4)
    samples = infer.sample(num_samples)
    idx = np.asarray(samples).astype(np.int64) @ (2**np.arange(n - 1, -1, -1))
    hist = np.bincount(idx, minlength=2**n) / idx.shape[0]
    all_bits = jnp.asarray(sv.all_bitstrings(n))
    probs = np.asarray(jax.nn.softmax(-energy(all_bits)))
    # Full support: every one of the 2^n outcomes is visited.
    assert (hist > 0).all()
    np.testing.assert_allclose(hist, probs, atol=1e-2)

  def test_pluggable_step_fn(self):
    """`step_fn` swaps the transition kernel (the functional analog of the
    reference's tfp.mcmc.TransitionKernel protocol, reference
    ebm.py:564-702): a plain single-site Metropolis kernel still converges
    to softmax(-E), and a degenerate identity kernel freezes the chain --
    proving the custom kernel is what actually runs."""
    n = 3
    energy = _random_kobe(n, seed=13)

    def metropolis_step(energy_apply, theta, key, state):
      k_idx, k_accept = jax.random.split(key)
      i = jax.random.randint(k_idx, (), 0, n)
      flip = (jnp.arange(n) == i).astype(jnp.int8)
      x_prime = jnp.bitwise_xor(state, flip)
      energies = energy_apply(theta, jnp.stack([x_prime, state]))
      accept = (jax.random.uniform(k_accept) <=
                jnp.minimum(jnp.exp(energies[1] - energies[0]), 1.0))
      return jnp.where(accept, x_prime, state)

    infer = ebm.GibbsWithGradientsInference(
        energy, 50_000, num_burnin_samples=500, num_chains=16,
        initial_seed=9, step_fn=metropolis_step)
    samples = infer.sample(50_000)
    idx = np.asarray(samples).astype(np.int64) @ (2**np.arange(n - 1, -1, -1))
    hist = np.bincount(idx, minlength=2**n) / idx.shape[0]
    all_bits = jnp.asarray(sv.all_bitstrings(n))
    probs = np.asarray(jax.nn.softmax(-energy(all_bits)))
    np.testing.assert_allclose(hist, probs, atol=2e-2)

    frozen = ebm.GibbsWithGradientsInference(
        energy, 64, num_burnin_samples=10, num_chains=1, initial_seed=9,
        step_fn=lambda e_apply, theta, key, state: state)
    s = np.asarray(frozen.sample(64))
    assert (s == s[0]).all()

  def test_burn_in_on_parameter_change(self):
    """Changing energy weights re-equilibrates the chain (analog of the
    reference's preface-inference mutation test, qhbm_test.py:113-150)."""
    n = 8
    energy = models.BernoulliEnergy(list(range(n)),
                                    nn.Constant(2.0))
    infer = ebm.GibbsWithGradientsInference(
        energy, 100, num_burnin_samples=300, num_chains=4, initial_seed=6)
    s1 = np.asarray(infer.sample(400))
    # theta=2 => p(bit=1) = sigmoid(4) ~ 0.98... energy E = sum theta*s,
    # spins s=1-2b, E low when bits are 1.
    assert s1.mean() > 0.9
    energy.set_trainable_variables([jnp.full([n], -2.0)])
    s2 = np.asarray(infer.sample(400))
    assert s2.mean() < 0.1

  def test_stateful_inference_burns_in_and_advances_chain(self):
    """expectation()/entropy()/log_partition() equilibrate like the
    reference's `_ready_inference` (reference ebm.py:734-743) and persist the
    advanced chain, so successive calls continue one long chain."""
    n = 8
    energy = models.BernoulliEnergy(list(range(n)), nn.Constant(2.0))
    infer = ebm.GibbsWithGradientsInference(
        energy, 100, num_burnin_samples=300, num_chains=4, initial_seed=9)
    state0 = np.asarray(infer.chain_state)

    # First stateful inference call (NOT sample()) must burn in: theta=2
    # puts nearly all mass on the all-ones bitstring, and 300 burn-in steps
    # reach it from the random initial chain.
    mean_bits = float(infer.expectation(lambda b: jnp.mean(b, axis=-1)))
    assert mean_bits > 0.9
    state1 = np.asarray(infer.chain_state)
    assert not np.array_equal(state0, state1)
    assert np.asarray(state1).mean() > 0.9  # equilibrated, not just advanced

    # A second call continues the chain (state advances; at equilibrium the
    # occasional accepted flip changes it eventually -- assert it was
    # persisted by checking the fingerprint short-circuits re-burn-in).
    burns = []
    orig_burn = infer.burn_in
    infer.burn_in = lambda *a, **k: burns.append(1) or orig_burn(*a, **k)
    float(infer.entropy())
    assert not burns  # unchanged parameters: no re-equilibration

    energy.set_trainable_variables([jnp.full([n], -2.0)])
    mean_bits = float(infer.expectation(lambda b: jnp.mean(b, axis=-1)))
    assert burns  # parameter change re-equilibrates
    assert mean_bits < 0.1

  def test_expectation_gradient_matches_analytic(self):
    """GWG-sampled eq. A5 gradient approximates the exact one."""
    n = 3
    energy = _random_kobe(n, seed=12)
    theta = energy.trainable_variables
    gwg = ebm.GibbsWithGradientsInference(
        energy, 30000, num_burnin_samples=500, num_chains=16, initial_seed=8)
    exact = ebm.AnalyticEnergyInference(energy, 1000, exact=True)
    key = jax.random.PRNGKey(1)

    def f(fp, bits):
      del fp
      return jnp.prod(1.0 - 2.0 * bits.astype(jnp.float32), -1)

    g_gwg = jax.grad(lambda th: gwg.expectation_pure(th, f, None, key))(theta)
    g_exact = jax.grad(
        lambda th: exact.expectation_pure(th, f, None, key))(theta)
    for a, e in zip(g_gwg, g_exact):
      np.testing.assert_allclose(np.asarray(a), np.asarray(e), atol=6e-2)


class TestGWGKernel:
  """Kernel internals, mirroring reference ebm_test.py:806-858
  (test_get_index_proposal_probs / test_one_step)."""

  def test_index_proposal_probs_closed_form(self):
    """For BernoulliEnergy, dE/db = -2*theta, so the Taylor proposal
    d(x) = (2b-1)*dE/db = 2*theta*s (s = 1-2b) and q(i|x) = softmax(theta*s)
    at the reference's T=2."""
    n = 5
    energy = models.BernoulliEnergy(list(range(n)),
                                    nn.RandomUniform(-2, 2, seed=13))
    theta = energy.trainable_variables
    apply_fn = lambda th, bits: energy.apply_flat(th, bits)
    bits = jnp.asarray([0, 1, 1, 0, 1], jnp.float32)
    probs = test_util.jit_toggle(
        lambda b: ebm.gwg_index_proposal_probs(apply_fn, theta, b))(bits)
    spins = 1.0 - 2.0 * np.asarray(bits)
    expected = np.asarray(
        jax.nn.softmax(jnp.asarray(spins * np.asarray(theta[0]))))
    np.testing.assert_allclose(np.asarray(probs), expected, rtol=1e-5)

  def test_one_step_flips_at_most_one_bit(self):
    n = 6
    energy = _random_kobe(n, seed=14)
    theta = energy.trainable_variables
    apply_fn = lambda th, bits: energy.apply_flat(th, bits)
    state = jnp.zeros([n], jnp.int8)
    for i in range(50):
      key = jax.random.PRNGKey(i)
      new = ebm.gwg_one_step(apply_fn, theta, key, state)
      assert int(jnp.sum(jnp.abs(new.astype(jnp.int32)
                                 - state.astype(jnp.int32)))) <= 1
      state = new

  def test_one_step_uniform_energy_always_flips(self):
    """With theta = 0 the MH ratio is exactly 1: every proposal is accepted,
    so the new state differs in exactly one bit."""
    n = 7
    energy = models.BernoulliEnergy(list(range(n)), nn.Constant(0.0))
    theta = energy.trainable_variables
    apply_fn = lambda th, bits: energy.apply_flat(th, bits)
    state = jnp.asarray(np.random.RandomState(0).randint(0, 2, n), jnp.int8)
    for i in range(25):
      new = ebm.gwg_one_step(apply_fn, theta, jax.random.PRNGKey(i), state)
      assert int(jnp.sum(jnp.abs(new.astype(jnp.int32)
                                 - state.astype(jnp.int32)))) == 1
      state = new

  def test_extreme_energy_scale_chain_still_moves(self):
    """MH acceptance at energy gaps past the f32 exp range: the linear form
    min(exp(dE) * q_ratio, 1) evaluates inf * 0 = NaN there (exp overflows
    exactly when the reverse-proposal prob underflows), and `u <= NaN` is
    False -- the chain would deterministically reject near-certain downhill
    moves and freeze at the worst state.  The log-space rule must walk a
    gap-200 landscape straight to its mode."""
    n = 4
    energy = models.BernoulliEnergy(list(range(n)), nn.Constant(100.0))
    theta = energy.trainable_variables
    apply_fn = lambda th, bits: energy.apply_flat(th, bits)
    # E(x) = 100 * sum(1 - 2x): all-zeros is the highest-energy state, each
    # flip to 1 lowers E by 200 and must be accepted w.p. ~1.
    state = jnp.zeros([n], jnp.int8)
    key = jax.random.PRNGKey(3)
    for _ in range(4 * n):
      key, sub = jax.random.split(key)
      state = ebm.gwg_one_step(apply_fn, theta, sub, state)
    np.testing.assert_array_equal(np.asarray(state), np.ones([n], np.int8))

  def test_one_step_seeded_deterministic(self):
    n = 4
    energy = _random_kobe(n, seed=15)
    theta = energy.trainable_variables
    apply_fn = lambda th, bits: energy.apply_flat(th, bits)
    state = jnp.asarray([1, 0, 1, 0], jnp.int8)
    key = jax.random.PRNGKey(42)
    a = ebm.gwg_one_step(apply_fn, theta, key, state)
    b = ebm.gwg_one_step(apply_fn, theta, key, state)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
