"""Inference on energy functions (EBMs over bitstrings).

TPU-native rebuild of reference qhbmlib/inference/ebm.py:30-760.

Functional-state design notes (vs the reference's mutable Keras layers):

  * The reference memoizes distribution state behind parameter-change
    detection (`preface_inference`, reference ebm.py:30-45,125-162).  Here
    every pure method recomputes from the current parameters under jit --
    XLA CSE makes this free within a step, and staleness is impossible.
    The only genuinely stateful object, the Gibbs-With-Gradients chain,
    threads its state explicitly (and the stateful wrapper re-equilibrates
    when it observes a parameter change, mirroring reference ebm.py:734-743).
  * Seed handling mirrors reference ebm.py:89-123: constructing with
    `initial_seed=None` auto-splits an internal PRNG key before every
    stateful inference call; a fixed seed is reused verbatim.
  * Samplers feed the estimators a static-shape (support, counts) pair
    instead of 1e6+ raw bitstrings: exhaustive enumeration + bincount for
    small n, padded unique samples otherwise.  `exact=True` replaces
    stochastic counts with expected counts N*p(x), making every estimate and
    custom gradient deterministic and exact -- an option the reference lacks.
"""

from __future__ import annotations

import abc
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from qhbmlib_tpu import utils
from qhbmlib_tpu.inference import estimators
from qhbmlib_tpu.models import energy as energy_model

# Largest n for which exhaustive 2^n support enumeration is used.
DEFAULT_ENUM_BITS = 16


_as_key = utils.as_prng_key


def categorical_counts(key: jax.Array, logits: jnp.ndarray, num_samples: int,
                       length: int) -> jnp.ndarray:
  """Counts of `num_samples` categorical draws over `length` outcomes."""
  idx = utils.categorical_indices(key, logits, num_samples)
  return jnp.zeros([length], jnp.float32).at[idx].add(1.0)


class EnergyInferenceBase(abc.ABC):
  r"""Interface for inference on BitstringEnergy objects.

  Mirrors reference qhbmlib/inference/ebm.py:48-230.
  """

  def __init__(self,
               input_energy: energy_model.BitstringEnergy,
               initial_seed=None,
               name: Optional[str] = None):
    self._energy = input_energy
    self.name = name or type(self).__name__
    self._update_seed = initial_seed is None
    self._key = _as_key(initial_seed)

  @property
  def energy(self) -> energy_model.BitstringEnergy:
    return self._energy

  @property
  def seed(self):
    return self._key

  @seed.setter
  def seed(self, initial_seed):
    self._update_seed = initial_seed is None
    self._key = _as_key(initial_seed)

  def _next_key(self) -> jax.Array:
    """Auto-splits the internal key unless the user pinned a seed."""
    if self._update_seed:
      self._key, sub = jax.random.split(self._key)
      return sub
    return self._key

  @property
  def theta(self) -> Sequence[jnp.ndarray]:
    """Current flat trainable variables of the energy."""
    return self._energy.trainable_variables

  def energy_apply(self, theta, bitstrings):
    return self._energy.apply_flat(theta, bitstrings)

  # -- stateful convenience API (mirrors the reference layer methods) -------

  def __call__(self, inputs, *args, **kwargs):
    if inputs is None:
      return self
    return self.sample(inputs)

  def entropy(self):
    return self.entropy_pure(self.theta, self._next_key())

  def expectation(self, function: Callable):
    """Expectation of `function` (bitstrings -> values) under the EBM."""
    f = lambda _, bits: function(bits)
    return self.expectation_pure(self.theta, f, None, self._next_key())

  def log_partition(self):
    return self.log_partition_pure(self.theta, self._next_key())

  def sample(self, num_samples: int):
    return self.sample_pure(self.theta, self._next_key(), num_samples)

  # -- pure API (used by the jitted/differentiated loss paths) --------------

  @abc.abstractmethod
  def sample_pure(self, theta, key, num_samples: int) -> jnp.ndarray:
    """[num_samples, n] int8 samples from the EBM."""

  @abc.abstractmethod
  def entropy_pure(self, theta, key):
    """Entropy estimate."""

  @abc.abstractmethod
  def expectation_pure(self, theta, f, f_params, key):
    """<f>_p with eq. A5 gradients; f: (f_params, bitstrings) -> pytree."""

  @abc.abstractmethod
  def log_partition_pure(self, theta, key):
    """log Z estimate with eq. C2 gradients."""


class EnergyInference(EnergyInferenceBase):
  """Default estimator implementations (reference ebm.py:233-415)."""

  def __init__(self,
               input_energy: energy_model.BitstringEnergy,
               num_expectation_samples: int,
               initial_seed=None,
               name: Optional[str] = None):
    super().__init__(input_energy, initial_seed, name)
    self.num_expectation_samples = int(num_expectation_samples)

  # Subclasses provide the sampled support used by both custom gradients.
  @abc.abstractmethod
  def support_and_counts(self, theta, key):
    """Returns ([U, n] float support bitstrings, [U] float counts),
    both stop-gradient."""

  def support_counts_state(self, theta, key, state):
    """State-threading variant for jitted training steps; stateless samplers
    pass `state` through unchanged (GWG overrides this)."""
    support, counts = self.support_and_counts(theta, key)
    return support, counts, state

  def sample_with_state(self, theta, key, state, num_samples: int):
    """Raw samples with sampler-state threading: (samples, new_state).

    Stateless samplers ignore and pass through `state`; GWG overrides this
    to advance its persistent chain, so jitted consumers (e.g. the BKM
    info matrix's EBM covariance block, baselines/train.py) never bake a
    stale chain into the compiled program."""
    return self.sample_pure(theta, key, num_samples), state

  def expectation_pure_with_state(self, theta, f, f_params, key, state=None):
    """Like `expectation_pure` but threads sampler state: (avg, new_state)."""
    support, counts, new_state = self.support_counts_state(theta, key, state)
    support = jax.lax.stop_gradient(support)
    counts = jax.lax.stop_gradient(counts)
    avg = estimators.sampled_expectation(
        lambda th, bits: self.energy_apply(th, bits), f, theta, f_params,
        support, counts)
    return avg, new_state

  def log_partition_pure_with_state(self, theta, key, state=None):
    """Like `log_partition_pure` but threads sampler state."""
    k1, k2 = jax.random.split(key)
    support, counts, new_state = self.support_counts_state(theta, k1, state)
    support = jax.lax.stop_gradient(support)
    counts = jax.lax.stop_gradient(counts)
    forward = lambda th: self._log_partition_forward(th, k2)
    value = estimators.log_partition(
        lambda th, bits: self.energy_apply(th, bits), forward, theta, support,
        counts)
    return value, new_state

  def entropy_pure(self, theta, key):
    """<E>_p + logZ (reference ebm.py:258-260)."""
    k1, k2 = jax.random.split(key)
    e_avg = self.expectation_pure(
        theta, lambda th, bits: self.energy_apply(th, bits), theta, k1)
    return e_avg + self.log_partition_pure(theta, k2)

  def expectation_pure(self, theta, f, f_params, key):
    support, counts = self.support_and_counts(theta, key)
    support = jax.lax.stop_gradient(support)
    counts = jax.lax.stop_gradient(counts)
    return estimators.sampled_expectation(
        lambda th, bits: self.energy_apply(th, bits), f, theta, f_params,
        support, counts)

  def _log_partition_forward(self, theta, key):
    """Uniform-sampling MC estimate: n log2 - log Ns + LSE(-E(x_i))
    (reference ebm.py:345-394)."""
    n = self.energy.num_bits
    ns = self.num_expectation_samples
    samples = jax.random.bernoulli(
        key, 0.5, (ns, n)).astype(jnp.int8)
    energies = self.energy_apply(theta, samples)
    return (n * jnp.log(2.0) - jnp.log(float(ns)) +
            jax.scipy.special.logsumexp(-energies))

  def log_partition_pure(self, theta, key):
    k1, k2 = jax.random.split(key)
    support, counts = self.support_and_counts(theta, k1)
    support = jax.lax.stop_gradient(support)
    counts = jax.lax.stop_gradient(counts)
    forward = lambda th: self._log_partition_forward(th, k2)
    return estimators.log_partition(
        lambda th, bits: self.energy_apply(th, bits), forward, theta, support,
        counts)


class AnalyticEnergyInference(EnergyInference):
  """Exact categorical over all 2^n bitstrings (reference ebm.py:418-492)."""

  def __init__(self,
               input_energy: energy_model.BitstringEnergy,
               num_expectation_samples: int,
               initial_seed=None,
               name: Optional[str] = None,
               exact: bool = False,
               max_unique_samples: Optional[int] = None):
    """Args mirror the reference; `exact=True` replaces sampled counts with
    expected counts N*p(x) for deterministic, exact estimates/gradients.
    `max_unique_samples` caps the sampled support size; defaults to the full
    2^n enumeration for n <= 10 (cheap, identical estimator) and to
    min(2^12, num_samples) above (so expensive downstream functions -- i.e.
    quantum expectations -- only run on the unique sampled support, matching
    reference ebm.py:262-280)."""
    super().__init__(input_energy, num_expectation_samples, initial_seed, name)
    n = input_energy.num_bits
    if n > 22:
      raise ValueError(
          f"AnalyticEnergyInference enumerates all 2^n bitstrings; n={n} "
          "would materialize a >16M-row enumeration on every inference call. "
          "For large n use BernoulliEnergyInference (factorized energies) or "
          "GibbsWithGradientsInference (MCMC); if you specifically need the "
          "analytic estimator semantics at smaller n, the `exact=True` and "
          "`max_unique_samples=` options bound its cost without changing the "
          "estimator.")
    # Host numpy, NOT an eager device array: this enumeration is
    # captured as a constant in jitted inference programs, and a
    # device-array constant costs a synchronous device fetch at
    # lowering time (minutes over a tunneled backend).
    self._all_bitstrings = utils.all_bitstrings(n)
    self.exact = exact
    if max_unique_samples is None and n > 10:
      max_unique_samples = min(2**12, num_expectation_samples)
    self.max_unique_samples = max_unique_samples

  @property
  def all_bitstrings(self) -> jnp.ndarray:
    return self._all_bitstrings

  @property
  def all_energies(self) -> jnp.ndarray:
    return self.energy(self.all_bitstrings)

  def logits_pure(self, theta) -> jnp.ndarray:
    return -self.energy_apply(theta, self._all_bitstrings)

  @property
  def distribution(self):
    """Current categorical distribution as (logits over all bitstrings)."""
    return self.logits_pure(self.theta)

  def probabilities_pure(self, theta) -> jnp.ndarray:
    return jax.nn.softmax(self.logits_pure(theta))

  def support_and_counts(self, theta, key):
    logits = jax.lax.stop_gradient(self.logits_pure(theta))
    if self.exact:
      support = self._all_bitstrings.astype(jnp.float32)
      counts = jax.nn.softmax(logits) * self.num_expectation_samples
      return support, counts
    if self.max_unique_samples is None:
      # Small n: bincount over the full enumeration -- identical estimator to
      # sample+dedup (it IS the dedup), with static 2^n support.
      support = self._all_bitstrings.astype(jnp.float32)
      counts = categorical_counts(key, logits, self.num_expectation_samples,
                                  logits.shape[0])
      return support, counts
    samples = self.sample_pure(theta, key, self.num_expectation_samples)
    uniq, _, counts = utils.unique_bitstrings_with_counts(
        samples, size=self.max_unique_samples)
    return uniq.astype(jnp.float32), counts.astype(jnp.float32)

  def sample_pure(self, theta, key, num_samples: int):
    logits = jax.lax.stop_gradient(self.logits_pure(theta))
    idx = utils.categorical_indices(key, logits, num_samples)
    return jnp.take(self._all_bitstrings, idx, axis=0)

  def entropy_pure(self, theta, key):
    """Exact categorical entropy (reference ebm.py:478-480), differentiable."""
    del key
    logits = self.logits_pure(theta)
    log_probs = jax.nn.log_softmax(logits)
    return -jnp.sum(jnp.exp(log_probs) * log_probs)

  def _log_partition_forward(self, theta, key):
    """Exact: logsumexp over all logits (reference ebm.py:482-485)."""
    del key
    return jax.scipy.special.logsumexp(self.logits_pure(theta))


class BernoulliEnergyInference(EnergyInference):
  """Factorized Bernoulli per bit (reference ebm.py:495-561)."""

  def __init__(self,
               input_energy: energy_model.BernoulliEnergy,
               num_expectation_samples: int,
               initial_seed=None,
               name: Optional[str] = None,
               exact: bool = False,
               max_unique_samples: Optional[int] = None):
    super().__init__(input_energy, num_expectation_samples, initial_seed, name)
    n = input_energy.num_bits
    self._enumerable = n <= DEFAULT_ENUM_BITS
    if self._enumerable:
      # Host numpy, NOT an eager device array: this enumeration is
      # captured as a constant in jitted inference programs, and a
      # device-array constant costs a synchronous device fetch at
      # lowering time (minutes over a tunneled backend).
      self._all_bitstrings = utils.all_bitstrings(n)
    self.exact = exact
    self.max_unique_samples = max_unique_samples or min(
        2**min(n, 12), num_expectation_samples)

  def logits_pure(self, theta) -> jnp.ndarray:
    return energy_model.BernoulliEnergy.logits_from_flat(theta)

  @property
  def distribution(self):
    """Current per-bit logits."""
    return self.logits_pure(self.theta)

  def _joint_logits(self, theta) -> jnp.ndarray:
    """Log-probs of every bitstring, [2^n] (enumerable path)."""
    l = self.logits_pure(theta)
    bits = self._all_bitstrings.astype(jnp.float32)
    # log p(x) = sum_i [b_i * log sigmoid(l_i) + (1-b_i) * log sigmoid(-l_i)]
    return (bits @ jax.nn.log_sigmoid(l) +
            (1.0 - bits) @ jax.nn.log_sigmoid(-l))

  def support_and_counts(self, theta, key):
    # Only `exact=True` uses the full 2^n enumeration (deterministic test
    # fixtures).  The sampled path mirrors the reference exactly: draw N
    # samples, dedup, evaluate downstream functions on the unique support
    # only (reference ebm.py:262-280) -- crucial when the downstream f is a
    # quantum expectation costing O(2^n) per support row.
    if self._enumerable and self.exact:
      logits = jax.lax.stop_gradient(self._joint_logits(theta))
      support = self._all_bitstrings.astype(jnp.float32)
      counts = jax.nn.softmax(logits) * self.num_expectation_samples
      return support, counts
    samples = self.sample_pure(theta, key, self.num_expectation_samples)
    uniq, _, counts = utils.unique_bitstrings_with_counts(
        samples, size=self.max_unique_samples)
    return uniq.astype(jnp.float32), counts.astype(jnp.float32)

  def sample_pure(self, theta, key, num_samples: int):
    l = jax.lax.stop_gradient(self.logits_pure(theta))
    probs = jax.nn.sigmoid(l)
    return jax.random.bernoulli(
        key, probs, (num_samples, self.energy.num_bits)).astype(jnp.int8)

  def entropy_pure(self, theta, key):
    """Exact factorized entropy (reference ebm.py:538-544), differentiable."""
    del key
    l = self.logits_pure(theta)
    p = jax.nn.sigmoid(l)
    return jnp.sum(p * jax.nn.softplus(-l) + (1.0 - p) * jax.nn.softplus(l))

  def _log_partition_forward(self, theta, key):
    """Exact: sum_i log(2 cosh theta_i) (reference ebm.py:546-557)."""
    del key
    thetas = 0.5 * self.logits_pure(theta)
    return jnp.sum(jnp.logaddexp(thetas, -thetas))


# ---------------------------------------------------------------------------
# Gibbs With Gradients (arXiv:2102.04509)
# ---------------------------------------------------------------------------

def gwg_index_proposal_probs(energy_apply, theta, state_f: jnp.ndarray):
  """q(i | x): softmax of the Taylor-approximated energy differences
  (reference ebm.py:618-650)."""
  grad_e = jax.grad(lambda xf: energy_apply(theta, xf[None, :])[0])(state_f)
  # d(x) ~ (2x - 1) * dE/dx; T = 2
  approx_energy_diff = (2.0 * state_f - 1.0) * grad_e
  return jax.nn.softmax(approx_energy_diff / 2.0)


def gwg_one_step(energy_apply, theta, key, state: jnp.ndarray) -> jnp.ndarray:
  """One Gibbs-With-Gradients Metropolis-Hastings step on a [n] int8 state
  (reference ebm.py:652-685).

  API note: the reference packages GWG as a reusable
  `tfp.mcmc.TransitionKernel` (`bootstrap_results`/`one_step` protocol,
  reference ebm.py:564-702).  The idiomatic-JAX equivalent of that protocol
  is exactly this shape -- a pure `(key, state) -> state` step function --
  which composes with `lax.scan`/`vmap` directly and is what
  blackjax-style samplers expect.  A different sampler plugs into
  `GibbsWithGradientsInference` via its `step_fn` constructor argument
  with this signature; no kernel class registry is needed."""
  n = state.shape[0]
  k_idx, k_accept = jax.random.split(key)
  state_f = state.astype(jnp.float32)
  probs = gwg_index_proposal_probs(energy_apply, theta, state_f)
  i = jax.random.categorical(k_idx, jnp.log(jnp.maximum(probs, 1e-38)))
  flip = jax.nn.one_hot(i, n, dtype=jnp.int8)
  x_prime = jnp.bitwise_xor(state, flip)
  probs_prime = gwg_index_proposal_probs(energy_apply, theta,
                                         x_prime.astype(jnp.float32))
  # Log-space MH acceptance: the linear form min(exp(dE) * q_ratio, 1)
  # produces inf * 0 = NaN at large energy scales (exp overflows past
  # dE ~ 88 in f32 exactly when the reverse-proposal prob underflows to 0),
  # and `u <= NaN` is False -- the chain would deterministically reject
  # moves it should accept with probability ~1 and freeze.  log u <= log a
  # is the same decision rule without either overflow.
  # Floor at 1e-30 (comfortably normal-range): 1e-38 is subnormal in f32
  # and flushes to zero under XLA's FTZ, which would reintroduce -inf here.
  log_q_ratio = (jnp.log(jnp.maximum(probs_prime[i], 1e-30)) -
                 jnp.log(jnp.maximum(probs[i], 1e-30)))
  energies = energy_apply(theta, jnp.stack([x_prime, state]))
  log_accept = jnp.minimum(energies[1] - energies[0] + log_q_ratio, 0.0)
  u = jnp.maximum(jax.random.uniform(k_accept), 1e-30)
  accept = jnp.log(u) <= log_accept
  return jnp.where(accept, x_prime, state)


class GibbsWithGradientsInference(EnergyInference):
  """MCMC inference via parallel Gibbs-With-Gradients chains.

  Mirrors reference ebm.py:705-760.  TPU-native differences: the sequential
  Python/TensorArray loop becomes a `lax.scan`, and `num_chains` independent
  chains run under `vmap` (the reference runs exactly one chain; keep
  `num_chains=1` for identical semantics).  Chain state is threaded
  functionally; the stateful wrapper re-equilibrates (burn-in) whenever it
  observes changed energy parameters, mirroring `_ready_inference`.
  """

  def __init__(self,
               input_energy: energy_model.BitstringEnergy,
               num_expectation_samples: int,
               num_burnin_samples: int,
               name: Optional[str] = None,
               num_chains: int = 1,
               max_unique_samples: Optional[int] = None,
               initial_seed=None,
               step_fn=None):
    """`step_fn(energy_apply, theta, key, state[n] int8) -> state` swaps the
    MCMC transition kernel (defaults to `gwg_one_step`) -- the functional
    analog of the reference's pluggable `tfp.mcmc.TransitionKernel`
    (reference ebm.py:564-702)."""
    super().__init__(input_energy, num_expectation_samples, initial_seed, name)
    self._step_fn = step_fn if step_fn is not None else gwg_one_step
    self.num_burnin_samples = int(num_burnin_samples)
    self.num_chains = int(num_chains)
    n = input_energy.num_bits
    self.max_unique_samples = max_unique_samples or min(
        2**min(n, 12), num_expectation_samples, 4096)
    self._chain_state = jax.random.bernoulli(
        self._next_key(), 0.5, (self.num_chains, n)).astype(jnp.int8)
    self._fingerprint = None

  @property
  def chain_state(self) -> jnp.ndarray:
    return self._chain_state

  # -- pure chain machinery ---------------------------------------------------

  def run_chains(self, theta, key, chain_state, num_steps: int):
    """Advances all chains `num_steps` steps.

    Returns (samples [num_steps, num_chains, n], final_state).
    """
    e_apply = lambda th, bits: self.energy_apply(th, bits)

    def step(carry, k):
      state = carry
      keys = jax.random.split(k, state.shape[0])
      new_state = jax.vmap(
          lambda kk, s: self._step_fn(e_apply, theta, kk, s))(keys, state)
      return new_state, new_state

    keys = jax.random.split(key, num_steps)
    final_state, samples = jax.lax.scan(step, chain_state, keys)
    return samples, final_state

  def sample_with_state(self, theta, key, chain_state, num_samples: int):
    """(samples [num_samples, n], new_chain_state)."""
    if chain_state is None:
      chain_state = self._chain_state
    steps = -(-num_samples // self.num_chains)
    samples, final_state = self.run_chains(theta, key, chain_state, steps)
    flat = samples.reshape(-1, samples.shape[-1])[:num_samples]
    return flat, final_state

  def burn_in(self, theta, key, chain_state):
    if self.num_burnin_samples == 0:
      return chain_state
    _, final_state = self.run_chains(theta, key, chain_state,
                                     self.num_burnin_samples)
    return final_state

  # -- EnergyInference API -----------------------------------------------------

  def _maybe_burn_in(self, theta=None):
    """Re-equilibrates the stored chain if energy parameters changed.

    No-op under tracing (parameters can't be fingerprinted; jitted training
    steps must thread chain state via `support_counts_state` instead).
    """
    theta = self.theta if theta is None else theta
    if any(isinstance(v, jax.core.Tracer) for v in theta):
      return
    fp = tuple(np.asarray(v).tobytes() for v in theta)
    if fp != self._fingerprint:
      self._chain_state = self.burn_in(theta, self._next_key(),
                                       self._chain_state)
      self._fingerprint = fp

  def sample_pure(self, theta, key, num_samples: int):
    samples, _ = self.sample_with_state(theta, key, self._chain_state,
                                        num_samples)
    return samples

  def sample(self, num_samples: int):
    self._maybe_burn_in()
    samples, new_state = self.sample_with_state(self.theta, self._next_key(),
                                                self._chain_state, num_samples)
    self._chain_state = new_state
    return samples

  def support_and_counts(self, theta, key):
    # Stateful entry point shared by expectation/entropy/log_partition: like
    # the reference's `_ready_inference` (reference ebm.py:734-743), every
    # inference call re-equilibrates on parameter change and then persists
    # the advanced chain, so successive calls continue one long chain.
    # Inside jitted training steps use `support_counts_state` (burn-in and
    # persistence are skipped under tracing; the chain state must be a real
    # argument/output there).
    self._maybe_burn_in(theta)
    support, counts, new_state = self.support_counts_state(
        theta, key, self._chain_state)
    if not isinstance(new_state, jax.core.Tracer):
      self._chain_state = new_state
    return support, counts

  def support_counts_state(self, theta, key, chain_state):
    """Pure variant threading chain state: returns (support, counts, state).

    Use this inside jitted training steps so the chain state is a real
    argument/output instead of a baked-in constant.
    """
    if chain_state is None:
      chain_state = self._chain_state
    samples, new_state = self.sample_with_state(theta, key, chain_state,
                                                self.num_expectation_samples)
    uniq, _, counts = utils.unique_bitstrings_with_counts(
        samples, size=self.max_unique_samples)
    return uniq.astype(jnp.float32), counts.astype(jnp.float32), new_state
