"""Sharded sampled engine + sharded GWG chains vs their single-device twins.

Runs on the 8-virtual-CPU-device mesh forced by tests/conftest.py.  Because
both sharded classes consume the exact same per-row key schedule as the
dense implementations, results must be BIT-IDENTICAL (not just statistically
close) -- the strongest possible equivalence check.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# shard_map programs compile for minutes on the virtual CPU mesh; this
# module runs in the nightly full suite, not the CI fast lane.
pytestmark = pytest.mark.slow

from qhbmlib_tpu import models, parallel
from qhbmlib_tpu.inference import ebm, qhbm, qnn, vqt_loss
from qhbmlib_tpu.models import circuit_utils
from qhbmlib_tpu.ops import paulis


@pytest.fixture(scope="module")
def data_mesh():
  return parallel.make_mesh(data=8, state=1)


def _tfim(n):
  terms = [(-1.0, {q: "X"}) for q in range(n)]
  terms += [(-1.0, {q: "Z", q + 1: "Z"}) for q in range(n - 1)]
  return paulis.pauli_sum_from_strings(n, terms)


def _circuit(n, layers=1, name=""):
  return models.DirectQuantumCircuit(
      circuit_utils.hardware_efficient_ansatz(n, layers, name=name))


class TestShardedSampledQNN:

  def test_forward_matches_dense(self, data_mesh):
    n, shots = 4, 200
    circuit = _circuit(n)
    dense = qnn.SampledQuantumInference(circuit, shots, initial_seed=3)
    sharded = parallel.ShardedSampledQuantumInference(
        circuit, shots, data_mesh, initial_seed=3)
    bits = jnp.asarray(
        [[0, 0, 0, 0], [1, 0, 1, 0], [0, 1, 1, 1]], jnp.int8)
    ops = (_tfim(n),)
    key = jax.random.PRNGKey(7)
    a = dense.expectation_pure(dense.phi, bits, ops, key=key)
    b = sharded.expectation_pure(sharded.phi, bits, ops, key=key)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

  def test_gradients_match_dense(self, data_mesh):
    n, shots = 3, 150
    circuit = _circuit(n)
    dense = qnn.SampledQuantumInference(circuit, shots, initial_seed=4)
    sharded = parallel.ShardedSampledQuantumInference(
        circuit, shots, data_mesh, initial_seed=4)
    bits = jnp.asarray([[0, 0, 0], [1, 1, 0]], jnp.int8)
    op = (_tfim(n),)
    key = jax.random.PRNGKey(11)

    def loss(inf, phi):
      return jnp.sum(inf.expectation_pure(phi, bits, op, key=key))

    ga = jax.grad(lambda p: loss(dense, p))(list(dense.phi))
    gb = jax.grad(lambda p: loss(sharded, p))(list(sharded.phi))
    for x, y in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
      # The shift-plan psum reduces shards in a different order than the
      # dense sum; f32 reassociation noise is ~1 ulp of the largest
      # gradient entry (observed 1.5e-6 on |g|~5), so allow rtol at f32 eps.
      np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=3e-6,
                                 atol=1e-6)

  def test_hamiltonian_general_energy_observable(self, data_mesh):
    """The general-BitstringEnergy observable path (sample + energy feed)."""
    n, shots = 3, 100
    circuit = _circuit(n)
    obs_energy = models.KOBE(list(range(n)), 2)
    obs_circuit = _circuit(n, name="obs")
    observable = models.Hamiltonian(obs_energy, obs_circuit)

    dense = qnn.SampledQuantumInference(circuit, shots, initial_seed=5)
    sharded = parallel.ShardedSampledQuantumInference(
        circuit, shots, data_mesh, initial_seed=5)
    bits = jnp.asarray([[0, 0, 0], [0, 1, 0], [1, 1, 1], [1, 0, 1],
                        [0, 0, 1]], jnp.int8)
    key = jax.random.PRNGKey(13)
    kw = dict(obs_circuit_params=observable.circuit.trainable_variables,
              obs_energy_params=observable.energy.trainable_variables,
              key=key)
    a = dense.expectation_pure(dense.phi, bits, observable, **kw)
    b = sharded.expectation_pure(sharded.phi, bits, observable, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def loss(inf, phi, ep):
      return jnp.sum(inf.expectation_pure(
          phi, bits, observable,
          obs_circuit_params=observable.circuit.trainable_variables,
          obs_energy_params=ep, key=key))

    ga = jax.grad(lambda p, e: loss(dense, p, e), argnums=(0, 1))(
        list(dense.phi), list(observable.energy.trainable_variables))
    gb = jax.grad(lambda p, e: loss(sharded, p, e), argnums=(0, 1))(
        list(sharded.phi), list(observable.energy.trainable_variables))
    for x, y in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
      # The shift-plan psum reduces shards in a different order than the
      # dense sum; f32 reassociation noise is ~1 ulp of the largest
      # gradient entry (observed 1.5e-6 on |g|~5), so allow rtol at f32 eps.
      np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=3e-6,
                                 atol=1e-6)

  def test_vqt_step_with_sharded_sampled_engine(self, data_mesh):
    """Full jitted VQT train step composes with the sharded sampled engine
    (the 16-qubit ladder rung r3 topology, shrunk)."""
    import optax
    n = 4
    energy = models.KOBE(list(range(n)), 2)
    e_inf = ebm.AnalyticEnergyInference(energy, 50, initial_seed=6,
                                        max_unique_samples=8)
    q_inf = parallel.ShardedSampledQuantumInference(
        _circuit(n), 100, data_mesh, initial_seed=6)
    h = qhbm.QHBM(e_inf, q_inf)
    loss_fn = vqt_loss.make_vqt(h, _tfim(n))
    params = h.params
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
      def scalar(p):
        val, _ = loss_fn(p, key, jnp.asarray(1.0, jnp.float32))
        return val

      loss, grads = jax.value_and_grad(scalar)(params)
      updates, opt_state = opt.update(grads, opt_state)
      return loss, optax.apply_updates(params, updates), opt_state

    key = jax.random.PRNGKey(0)
    loss0, params, opt_state = step(params, opt_state, key)
    loss1, params, opt_state = step(params, opt_state,
                                    jax.random.fold_in(key, 1))
    assert np.isfinite(float(loss0)) and np.isfinite(float(loss1))


class TestShardedGWG:

  def test_chains_bit_identical(self, data_mesh):
    n = 5
    energy = models.KOBE(list(range(n)), 2)
    dense = ebm.GibbsWithGradientsInference(
        energy, 64, num_burnin_samples=0, num_chains=16, initial_seed=8)
    sharded = parallel.ShardedGibbsWithGradientsInference(
        energy, 64, 0, data_mesh, num_chains=16, initial_seed=8)
    theta = list(energy.trainable_variables)
    key = jax.random.PRNGKey(21)
    state0 = jax.random.bernoulli(jax.random.PRNGKey(2), 0.5,
                                  (16, n)).astype(jnp.int8)
    s_a, f_a = dense.run_chains(theta, key, state0, 7)
    s_b, f_b = sharded.run_chains(theta, key, state0, 7)
    np.testing.assert_array_equal(np.asarray(s_a), np.asarray(s_b))
    np.testing.assert_array_equal(np.asarray(f_a), np.asarray(f_b))

  def test_support_counts_state_matches(self, data_mesh):
    n = 4
    energy = models.KOBE(list(range(n)), 2)
    dense = ebm.GibbsWithGradientsInference(
        energy, 32, num_burnin_samples=2, num_chains=8,
        max_unique_samples=8, initial_seed=9)
    sharded = parallel.ShardedGibbsWithGradientsInference(
        energy, 32, 2, data_mesh, num_chains=8, max_unique_samples=8,
        initial_seed=9)
    theta = list(energy.trainable_variables)
    key = jax.random.PRNGKey(30)
    state0 = jnp.zeros([8, n], jnp.int8)
    sup_a, cnt_a, st_a = dense.support_counts_state(theta, key, state0)
    sup_b, cnt_b, st_b = sharded.support_counts_state(theta, key, state0)
    np.testing.assert_array_equal(np.asarray(sup_a), np.asarray(sup_b))
    np.testing.assert_array_equal(np.asarray(cnt_a), np.asarray(cnt_b))
    np.testing.assert_array_equal(np.asarray(st_a), np.asarray(st_b))

  def test_bad_chain_count_raises(self, data_mesh):
    energy = models.KOBE([0, 1], 2)
    with pytest.raises(ValueError, match="divisible"):
      parallel.ShardedGibbsWithGradientsInference(
          energy, 8, 0, data_mesh, num_chains=3)

  def test_pluggable_step_fn_reaches_sharded_chains(self, data_mesh):
    """A custom `step_fn` must drive the d>1 sharded path too, not only the
    d==1 delegation to the dense implementation: an identity kernel freezes
    every sharded chain, and the custom kernel stays bit-identical between
    the dense and sharded inferences."""
    n = 4
    energy = models.KOBE(list(range(n)), 2)
    theta = list(energy.trainable_variables)
    key = jax.random.PRNGKey(40)
    state0 = jax.random.bernoulli(jax.random.PRNGKey(3), 0.5,
                                  (16, n)).astype(jnp.int8)

    frozen = parallel.ShardedGibbsWithGradientsInference(
        energy, 64, 0, data_mesh, num_chains=16, initial_seed=8,
        step_fn=lambda e_apply, th, k, s: s)
    samples, final = frozen.run_chains(theta, key, state0, 5)
    np.testing.assert_array_equal(np.asarray(final), np.asarray(state0))
    for t in range(5):
      np.testing.assert_array_equal(np.asarray(samples[t]),
                                    np.asarray(state0))

    def flip_all(e_apply, th, k, s):
      del e_apply, th, k
      return jnp.bitwise_xor(s, jnp.ones_like(s))

    dense = ebm.GibbsWithGradientsInference(
        energy, 64, num_burnin_samples=0, num_chains=16, initial_seed=8,
        step_fn=flip_all)
    sharded = parallel.ShardedGibbsWithGradientsInference(
        energy, 64, 0, data_mesh, num_chains=16, initial_seed=8,
        step_fn=flip_all)
    s_a, f_a = dense.run_chains(theta, key, state0, 4)
    s_b, f_b = sharded.run_chains(theta, key, state0, 4)
    np.testing.assert_array_equal(np.asarray(s_a), np.asarray(s_b))
    np.testing.assert_array_equal(np.asarray(f_a), np.asarray(f_b))
