"""Exact density-matrix math + metrics rendering.

TPU-native rebuild of reference baselines/utils.py: `jnp.linalg.eigh` runs
natively on TPU, so logm/expm are built from eigendecompositions instead of
`tf.linalg.logm` (which has no TPU kernel in the reference's stack either --
it ran on CPU there).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _cdtype():
  return jnp.complex128 if jax.config.jax_enable_x64 else jnp.complex64


def _fdtype():
  return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def _logm_psd(mat: jnp.ndarray) -> jnp.ndarray:
  """Matrix log of a Hermitian PSD matrix via eigh (clipped for stability)."""
  mat = jnp.asarray(mat, _cdtype())
  evals, evecs = jnp.linalg.eigh(mat)
  log_evals = jnp.log(jnp.maximum(jnp.real(evals), 1e-300))
  return (evecs * log_evals.astype(_cdtype())) @ jnp.conj(evecs.T)


def optimized_trace_matmul(rho, sigma):
  """tr[rho @ sigma] without materializing the product (reference
  baselines/utils.py:24-38)."""
  return jnp.sum(
      jnp.asarray(rho, _cdtype()) * jnp.asarray(sigma, _cdtype()).T)


def relative_entropy(rho, sigma):
  """D(rho||sigma) = tr[rho (log rho - log sigma)] (reference
  baselines/utils.py:41-58)."""
  log_rho = _logm_psd(rho)
  log_sigma = _logm_psd(sigma)
  return jnp.real(optimized_trace_matmul(rho, log_rho - log_sigma))


def get_thermal_state(beta, h_num):
  """exp(-beta h)/Z via eigh + softmax (the LSE-gradient trick of reference
  baselines/utils.py:61-115 is exactly a softmax over -beta*eigenvalues)."""
  h_num = jnp.asarray(h_num, _cdtype())
  evals, evecs = jnp.linalg.eigh(h_num)
  weights = jnp.exp(
      jnp.asarray(-beta, _fdtype()) * jnp.real(evals) -
      jnp.max(jnp.asarray(-beta, _fdtype()) * jnp.real(evals)))
  probs = (weights / jnp.sum(weights)).astype(_cdtype())
  return (evecs * probs) @ jnp.conj(evecs.T)


def log_partition_function(beta, h_num):
  """ln tr[exp(-beta h)] (reference baselines/utils.py:118-134)."""
  evals = jnp.linalg.eigvalsh(jnp.asarray(h_num, _cdtype()))
  x = jnp.asarray(-beta, _fdtype()) * jnp.real(evals)
  m = jnp.max(x)
  return m + jnp.log(jnp.sum(jnp.exp(x - m)))


def density_matrix_to_image(dm) -> np.ndarray:
  """Renders a density matrix as a [1, 512, 512, 3] RGB image: |Re| in the
  red channel, |Im| in blue, joint-normalized, superpixel-upscaled (reference
  baselines/utils.py:137-160)."""
  max_qubits = 9
  total_edge = 2**max_qubits
  dm = np.asarray(dm)
  dm_len = dm.shape[0]
  scale = total_edge // dm_len
  dm_real = np.abs(np.real(dm))
  dm_imag = np.abs(np.imag(dm))
  max_dm = max(dm_real.max(), dm_imag.max(), 1e-30)
  dm_real = np.kron(dm_real / max_dm, np.ones((scale, scale), np.float32))
  dm_imag = np.kron(dm_imag / max_dm, np.ones((scale, scale), np.float32))
  zeros = np.zeros((total_edge, total_edge), np.float32)
  img = np.stack([dm_real.astype(np.float32), zeros,
                  dm_imag.astype(np.float32)], axis=-1)
  return img[None]
