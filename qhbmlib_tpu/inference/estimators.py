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
from typing import Callable

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


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _avg_with_score(energy_apply: Callable, theta, values,
                    support_f: jnp.ndarray, counts_f: jnp.ndarray):
  """Count-weighted average of per-sample `values` whose VJP adds the
  eq. A5 score-function gradient for `theta`.

  Placing the custom VJP at the averaging boundary (instead of wrapping the
  whole f evaluation) lets the expensive f -- typically a batched quantum
  expectation -- run its forward ONCE and receive ordinary pathwise
  cotangents through `values`; the old design's backward re-ran f's forward
  to build an inner jax.vjp.
  """
  return utils.weighted_average(counts_f, values)


def _aws_fwd(energy_apply, theta, values, support_f, counts_f):
  avg = utils.weighted_average(counts_f, values)
  return avg, (theta, values, support_f, counts_f)


def _aws_bwd(energy_apply, res, g):
  theta, values, support_f, counts_f = res
  bits = support_f.astype(jnp.int8)
  counts = counts_f
  total = jnp.sum(counts)

  # Pathwise cotangent of `values`: d avg / d values = counts/total.
  weights = counts / total

  def one_bar(v_leaf, g_leaf):
    w = weights.reshape((-1,) + (1,) * (v_leaf.ndim - 1))
    return w * jnp.broadcast_to(g_leaf, v_leaf.shape[1:])

  values_bar = jax.tree_util.tree_map(one_bar, values, g)

  # Score-function terms (eq. A5): <grad E><w.f> - <(w.f) grad E>, where
  # w.f is the per-sample scalar sum of upstream cotangent times value.
  combined = _combined_sums(values, g)  # [U]
  avg_combined = jnp.sum(counts * combined) / total

  _, vjp_e = jax.vjp(lambda th: energy_apply(th, bits), theta)
  (mean_grad_e,) = vjp_e(counts / total)
  (mean_combined_grad_e,) = vjp_e(counts * combined / total)

  theta_bar = jax.tree_util.tree_map(
      lambda a, b: a * avg_combined - b, mean_grad_e, mean_combined_grad_e)
  return (theta_bar, values_bar, jnp.zeros_like(support_f),
          jnp.zeros_like(counts_f))


_avg_with_score.defvjp(_aws_fwd, _aws_bwd)


def sampled_expectation(energy_apply: Callable, f: Callable,
                        theta, f_params, support_f: jnp.ndarray,
                        counts_f: jnp.ndarray):
  """Count-weighted average of f over sampled support, with eq. A5 gradients.

  Args:
    energy_apply: static pure fn (theta, bitstrings) -> [U] energies.
    f: static pure fn (f_params, bitstrings) -> pytree of [U, ...] values.
    theta: energy parameters (pytree); receives the score-function gradient.
    f_params: parameters f depends on (pytree); receives pathwise gradients
      through ordinary autodiff of f.  If f also depends on the energy
      parameters, pass them (also) inside f_params -- cotangents add up in
      the caller.
    support_f: [U, n] float bitstrings (stop-gradient sampled support).
    counts_f: [U] float occurrence counts (stop-gradient).

  Returns:
    pytree of [...] count-weighted averages of f's outputs.
  """
  bits = support_f.astype(jnp.int8)
  values = f(f_params, bits)
  return _avg_with_score(energy_apply, theta, values, support_f, counts_f)


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
