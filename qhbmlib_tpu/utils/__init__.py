"""Utilities used across more than one module.

TPU-native reimplementation of the reference's qhbmlib/utils.py:20-92:
`weighted_average` keeps the identical count-weighted einsum semantics; the
dynamic-shape `tf.raw_ops.UniqueWithCountsV2` dedup (reference:
qhbmlib/utils.py:61-78) becomes static-shape, jit-safe alternatives
(`unique_bitstrings_with_counts` with a fixed `size`, or exhaustive
enumeration + bincount for small n -- see inference/ebm.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "Squeeze",
    "all_bitstrings",
    "bits_to_ints",
    "bounded_cache_put",
    "categorical_indices",
    "categorical_indices_from_weights",
    "expand_unique_results",
    "ints_to_bits",
    "to_host_complex",
    "unique_bitstrings_with_counts",
    "weighted_average",
]


def as_prng_key(seed) -> jax.Array:
  """Normalizes a user seed to a PRNG key.

  Accepts None (fresh random key), a Python int, a raw uint32[2] key-data
  array, or an already-typed key.  Shared by every inference family so a
  given seed type behaves identically everywhere (reference seed semantics:
  qhbmlib/inference/ebm.py:89-123)."""
  if seed is None:
    return jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
  if isinstance(seed, int):
    return jax.random.PRNGKey(seed)
  seed = jnp.asarray(seed)
  if seed.shape == (2,):
    return jax.random.wrap_key_data(seed.astype(jnp.uint32))
  return seed


def bounded_cache_put(cache: dict, key, value, max_entries: int = 64):
  """FIFO-bounded dict insert for id()-keyed caches.

  Entries pin strong references to their keyed objects, keeping their ids
  unique (CPython recycles addresses of collected objects) -- but only while
  resident: evicting the oldest entry bounds retention when callers create a
  fresh keyed object every step (e.g. annealed VQT targets)."""
  if key not in cache and len(cache) >= max_entries:
    cache.pop(next(iter(cache)))
  cache[key] = value
  return value


def weighted_average(counts: jnp.ndarray, values) -> jnp.ndarray:
  """Count-weighted mean over the leading axis of each leaf of `values`.

  Zero-count rows contribute nothing, so padded/unsampled support entries are
  harmless.  Mirrors reference qhbmlib/utils.py:43-58.
  """
  float_counts = counts.astype(jnp.float32)
  total = jnp.sum(float_counts)

  def one(v):
    weighted = jnp.einsum("i,i...->...", float_counts, v)
    return weighted / total

  return jax.tree_util.tree_map(one, values)


def bits_to_ints(bitstrings: jnp.ndarray) -> jnp.ndarray:
  """Big-endian [..., n] bits -> integer codes (int32; requires n <= 31).

  Raises for wider rows instead of silently wrapping (2^31 would overflow
  int32 and distinct bitstrings would collide); multi-word consumers use
  `_bit_code_words`."""
  n = bitstrings.shape[-1]
  if n > 31:
    raise ValueError(f"bits_to_ints holds at most 31 bits in int32; got "
                     f"n={n} (use _bit_code_words / ints_to_bits per word)")
  weights = jnp.asarray(2**np.arange(n - 1, -1, -1, dtype=np.int64), jnp.int32)
  return jnp.sum(bitstrings.astype(jnp.int32) * weights, axis=-1)


def _bit_code_words(bitstrings: jnp.ndarray) -> jnp.ndarray:
  """[batch, W] int32 code words (31 bits per word) for arbitrary n."""
  n = bitstrings.shape[-1]
  return jnp.stack([bits_to_ints(bitstrings[..., s:s + 31])
                    for s in range(0, n, 31)], axis=-1)


def _words_to_bits(words: jnp.ndarray, n: int) -> jnp.ndarray:
  """Inverse of `_bit_code_words`: [..., W] words -> [..., n] int8 bits."""
  parts = [ints_to_bits(words[..., w], min(31, n - 31 * w))
           for w in range((n + 30) // 31)]
  return jnp.concatenate(parts, axis=-1)


def ints_to_bits(ints: jnp.ndarray, num_bits: int) -> jnp.ndarray:
  """Integer codes -> big-endian [..., num_bits] int8 bits."""
  shifts = jnp.asarray(np.arange(num_bits - 1, -1, -1), jnp.int32)
  return ((ints[..., None] >> shifts) & 1).astype(jnp.int8)


def all_bitstrings(num_bits: int) -> np.ndarray:
  """[2^n, n] int8 enumeration in ascending index order (static numpy).

  The single shared implementation of the 2^n enumeration used by the
  analytic EBMs (reference ebm.py:445-447) and the statevector engine's
  expectation/metrics paths."""
  idx = np.arange(2**num_bits, dtype=np.int64)
  shifts = np.arange(num_bits - 1, -1, -1)
  return ((idx[:, None] >> shifts) & 1).astype(np.int8)


def unique_bitstrings_with_counts(
    bitstrings: jnp.ndarray,
    size: Optional[int] = None
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
  """Unique rows of a bitstring batch plus inverse indices and counts.

  jit-safe when `size` is given: output shapes are static, extra rows are
  filled with zeros and have count 0 (harmless under `weighted_average`).
  If the true number of unique rows exceeds `size`, the `size`
  HIGHEST-COUNT rows are kept (ties to the smaller bitstring) and the rest
  dropped: their `idx` entries point out of bounds (scatter drops them;
  gather clamps), so downstream count-weighted estimators renormalize over
  the kept support.  Keeping by count minimizes and de-biases the dropped
  mass -- truncating `jnp.unique`'s sorted output directly would keep the
  lexicographically smallest bitstrings, a support systematically
  conditioned on small basis indices.

  Returns:
    y: [size, n] unique bitstrings (same dtype as input).
    idx: [batch] index of each input row in `y`.
    counts: [size] int32 occurrence counts.
  """
  n = bitstrings.shape[-1]
  # One int32 code for n <= 31; [W]-word code rows beyond that (a single
  # int32 code would silently wrap and collide distinct bitstrings -- the
  # large-n regime is exactly where the MCMC samplers operate).
  wide = n > 31
  codes = _bit_code_words(bitstrings) if wide else bits_to_ints(bitstrings)
  axis_kw = dict(axis=0) if wide else {}
  decode = ((lambda u: _words_to_bits(u, n)) if wide
            else (lambda u: ints_to_bits(u, n)))
  batch = codes.shape[0]
  if size is None:
    uniq, idx, counts = jnp.unique(codes, return_inverse=True,
                                   return_counts=True, **axis_kw)
    idx = jnp.reshape(idx, (batch,))  # axis-unique may return [batch, 1]
  elif size >= batch:
    # Overflow impossible (at most `batch` uniques exist).
    uniq, idx, counts = jnp.unique(codes, return_inverse=True,
                                   return_counts=True, size=size,
                                   fill_value=0, **axis_kw)
    idx = jnp.reshape(idx, (batch,))  # axis-unique may return [batch, 1]
    # jnp.unique counts the fill_value rows; recompute counts by scatter-add
    # so padding rows get exactly zero.
    counts = jnp.zeros_like(counts).at[idx].add(1)
  else:
    # Full dedup first (the sort costs the same as a truncated unique), then
    # keep the top-`size` rows by count.
    full_u, full_idx, full_c = jnp.unique(codes, return_inverse=True,
                                          return_counts=True, size=batch,
                                          fill_value=0, **axis_kw)
    full_idx = jnp.reshape(full_idx, (batch,))
    full_c = jnp.zeros_like(full_c).at[full_idx].add(1)
    counts, top_pos = jax.lax.top_k(full_c, size)
    uniq = jnp.take(full_u, top_pos, axis=0)
    # Map each input row to its kept slot; dropped rows map to `size` (out
    # of bounds), preserving the drop-on-scatter / clamp-on-gather contract.
    pos_map = jnp.full((batch,), size, jnp.int32).at[top_pos].set(
        jnp.arange(size, dtype=jnp.int32))
    idx = jnp.take(pos_map, full_idx)
  return decode(uniq).astype(bitstrings.dtype), idx, counts


def expand_unique_results(y: jnp.ndarray, idx: jnp.ndarray,
                          fill_value=None) -> jnp.ndarray:
  """Inverse of unique_bitstrings_with_counts: expanded[i] == y[idx[i]].

  Mirrors reference qhbmlib/utils.py:81-92.  If the dedup overflowed a
  bounding `size`, dropped rows carry idx == len(y) (out of bounds): with
  `fill_value=None` they get `jnp.take`'s default out-of-bounds fill (NaN
  for floats -- loud, not a silent wrong value; the reference never
  truncates so it has no such case); pass a `fill_value` to choose the
  marker explicitly.
  """
  if fill_value is None:
    return jnp.take(y, idx, axis=0)
  gathered = jnp.take(y, jnp.minimum(idx, y.shape[0] - 1), axis=0)
  in_range = (idx >= 0) & (idx < y.shape[0])
  mask = in_range.reshape(in_range.shape + (1,) * (gathered.ndim - 1))
  return jnp.where(mask, gathered, jnp.asarray(fill_value, gathered.dtype))


_TWO_LEVEL_MIN = 4096


def categorical_indices(key: jax.Array, logits: jnp.ndarray,
                        num_samples: int) -> jnp.ndarray:
  """`num_samples` draws from softmax(logits) by inverse-CDF search.

  `jax.random.categorical` materializes a [num_samples, len(logits)] Gumbel
  noise array -- 65M transcendentals for 1000 shots over a 16-qubit
  distribution, and it dominates every sampled-engine path.  Inverse-CDF
  costs one normalization pass over the distribution plus a search per
  sample.

  The search is a branch-free comparison COUNT, not `jnp.searchsorted`:
  on TPU searchsorted lowers to a serial binary search of per-sample dynamic
  gathers, measured at 337 ms vs 13 ms for the cumsum itself at the sampled
  engine's r3 shapes ([1504, 65536] distributions x 1000 shots) -- it was
  >95% of the whole parameter-shift step.  Counting `cdf[j] <= u` on the VPU
  is exactly `side="right"` insertion; for large N a two-level (block ends,
  then one gathered block row) count keeps the compare volume at
  O(S * 2*sqrt(N)) instead of O(S * N).  Returns int32 [num_samples].
  """
  logits = logits.reshape(-1).astype(jnp.float32)
  return categorical_indices_from_weights(
      key, jnp.exp(logits - jnp.max(logits)), num_samples)


def categorical_indices_from_weights(key: jax.Array, weights: jnp.ndarray,
                                     num_samples: int) -> jnp.ndarray:
  """`categorical_indices` on UNNORMALIZED non-negative weights (e.g. |psi|^2
  probabilities), skipping the softmax exp/max passes -- the sampled engine
  already holds probabilities, and log->exp roundtripping them costs two
  extra transcendental passes over [instances, 2^n]."""
  w = weights.reshape(-1).astype(jnp.float32)
  cdf = jnp.cumsum(w)
  n = cdf.shape[0]
  # uniform() < 1, but u = uniform*cdf[-1] can ROUND UP to exactly cdf[-1]
  # (float32 ulp at large totals) where "right" insertion would return n;
  # the final clamp keeps indices in range.
  u = jax.random.uniform(key, (num_samples,), jnp.float32) * cdf[-1]
  if n <= _TWO_LEVEL_MIN:
    idx = jnp.sum((cdf[None, :] <= u[:, None]).astype(jnp.int32), axis=-1)
  else:
    block = 1 << (n.bit_length() // 2)  # ~sqrt(n), power of two
    nb = -(-n // block)
    pad = nb * block - n
    cdfp = cdf if pad == 0 else jnp.concatenate(
        [cdf, jnp.full([pad], jnp.inf, jnp.float32)])
    blocks = cdfp.reshape(nb, block)
    # Block containing the insertion point: count of block ENDS <= u.  All
    # entries of earlier blocks are <= u (monotone cdf); all entries of
    # later blocks exceed u (they are >= ends[b] > u).
    b = jnp.sum((blocks[:, -1][None, :] <= u[:, None]).astype(jnp.int32),
                axis=-1)
    b = jnp.minimum(b, nb - 1)
    within = jnp.sum((blocks[b] <= u[:, None]).astype(jnp.int32), axis=-1)
    idx = b * block + within
  return jnp.minimum(idx, n - 1).astype(jnp.int32)


class Squeeze:
  """Callable squeeze wrapper, mirroring reference qhbmlib/utils.py:20-40."""

  def __init__(self, axis=None):
    self._axis = axis

  def __call__(self, inputs):
    if self._axis is None:
      return jnp.squeeze(inputs)
    return jnp.squeeze(inputs, axis=self._axis)


def to_host_complex(x) -> np.ndarray:
  """Fetches a complex device array to host as numpy, transferring the real
  and imaginary parts separately (some accelerator backends cannot transfer
  complex arrays in either direction)."""
  return (np.asarray(jnp.real(x), np.float64) +
          1j * np.asarray(jnp.imag(x), np.float64))
