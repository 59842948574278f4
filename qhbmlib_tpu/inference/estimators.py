"""Custom-gradient Monte-Carlo estimators for EBM inference.

These are the scientific core of the library -- the score-function gradient of
sample-averaged expectations (QHBM paper eq. A5; reference:
qhbmlib/inference/ebm.py:262-329) and the log-partition gradient (eq. C2;
reference: qhbmlib/inference/ebm.py:331-415) -- reimplemented as JAX
`custom_vjp`s.

TPU-native differences from the reference:

  * The reference computes per-sample Jacobians of the energy
    (`tape.jacobian`, reference ebm.py:305-308), an O(batch * params) object.
    Both eq. A5 terms are weighted averages of those Jacobians, so here they
    are computed as TWO plain VJPs of the energy with different cotangent
    vectors -- no Jacobian is ever materialized.
  * Sampling enters only through a (support, counts) pair: any sampler that
    produces occurrence counts over a static support (exhaustive enumeration,
    multinomial draws, padded unique samples) plugs in with static shapes.
    Zero-count padding rows are exact no-ops.
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from qhbmlib_tpu import utils


def _combined_sums(values, cotangents) -> jnp.ndarray:
  """Per-sample sum over all leaves/backdims of cotangent * value -> [U]."""
  leaves_v = jax.tree_util.tree_leaves(values)
  leaves_g = jax.tree_util.tree_leaves(cotangents)
  total = None
  for v, g in zip(leaves_v, leaves_g):
    s = jnp.sum(jnp.reshape(g * v, (v.shape[0], -1)), axis=-1)
    total = s if total is None else total + s
  return total


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def sampled_expectation(energy_apply: Callable, f: Callable,
                        theta, f_params, support_f: jnp.ndarray,
                        counts_f: jnp.ndarray):
  """Count-weighted average of f over sampled support, with eq. A5 gradients.

  Args:
    energy_apply: static pure fn (theta, bitstrings) -> [U] energies.
    f: static pure fn (f_params, bitstrings) -> pytree of [U, ...] values.
    theta: energy parameters (pytree); receives the score-function gradient.
    f_params: parameters f depends on (pytree); receives pathwise gradients.
      If f also depends on the energy parameters, pass them (also) inside
      f_params -- cotangents add up in the caller.
    support_f: [U, n] float bitstrings (stop-gradient sampled support).
    counts_f: [U] float occurrence counts (stop-gradient).

  Returns:
    pytree of [...] count-weighted averages of f's outputs.
  """
  bits = support_f.astype(jnp.int8)
  values = f(f_params, bits)
  return utils.weighted_average(counts_f, values)


def _se_fwd(energy_apply, f, theta, f_params, support_f, counts_f):
  bits = support_f.astype(jnp.int8)
  values = f(f_params, bits)
  avg = utils.weighted_average(counts_f, values)
  return avg, (theta, f_params, support_f, counts_f, values)


def _se_bwd(energy_apply, f, res, g):
  theta, f_params, support_f, counts_f, values = res
  bits = support_f.astype(jnp.int8)
  counts = counts_f
  total = jnp.sum(counts)

  # Pathwise term: d/d(f_params) of the count-weighted average, cotangent g.
  def avg_fn(fp):
    return utils.weighted_average(counts, f(fp, bits))

  _, vjp_f = jax.vjp(avg_fn, f_params)
  (f_bar,) = vjp_f(g)

  # Score-function terms (eq. A5): <grad E><w.f> - <(w.f) grad E>, where
  # w.f is the per-sample scalar sum of upstream cotangent times value.
  combined = _combined_sums(values, g)  # [U]
  avg_combined = jnp.sum(counts * combined) / total

  _, vjp_e = jax.vjp(lambda th: energy_apply(th, bits), theta)
  (mean_grad_e,) = vjp_e(counts / total)
  (mean_combined_grad_e,) = vjp_e(counts * combined / total)

  theta_bar = jax.tree_util.tree_map(
      lambda a, b: a * avg_combined - b, mean_grad_e, mean_combined_grad_e)
  return (theta_bar, f_bar, jnp.zeros_like(support_f),
          jnp.zeros_like(counts_f))


sampled_expectation.defvjp(_se_fwd, _se_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def log_partition(energy_apply: Callable, forward_fn: Callable,
                  theta, support_f: jnp.ndarray, counts_f: jnp.ndarray):
  """Log partition function with the eq. C2 gradient: dlogZ = -<grad E>_p.

  Args:
    energy_apply: static pure fn (theta, bitstrings) -> [U] energies.
    forward_fn: static pure fn theta -> scalar logZ estimate (exact
      enumeration, closed form, or an MC estimate -- subclass specific,
      mirroring reference ebm.py:345-394,482-485,546-557).
    theta: energy parameters.
    support_f / counts_f: [U, n], [U] float model samples (stop-gradient)
      used by the gradient estimator.
  """
  del support_f, counts_f
  return forward_fn(theta)


def _lp_fwd(energy_apply, forward_fn, theta, support_f, counts_f):
  return forward_fn(theta), (theta, support_f, counts_f)


def _lp_bwd(energy_apply, forward_fn, res, g):
  theta, support_f, counts_f = res
  bits = support_f.astype(jnp.int8)
  total = jnp.sum(counts_f)
  _, vjp_e = jax.vjp(lambda th: energy_apply(th, bits), theta)
  (mean_grad_e,) = vjp_e(counts_f / total)
  theta_bar = jax.tree_util.tree_map(lambda x: -g * x, mean_grad_e)
  return theta_bar, jnp.zeros_like(support_f), jnp.zeros_like(counts_f)


log_partition.defvjp(_lp_fwd, _lp_bwd)
