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


def _eigh_host(mat):
  """Hermitian eigendecomposition on the HOST (numpy).

  These exact dense-matrix metrics are never differentiated and the
  matrices are tiny (2^n x 2^n for small n); running eigh on host also
  sidesteps accelerator backends without an eigh kernel (e.g. the axon TPU
  tunnel reports UNIMPLEMENTED).
  """
  return np.linalg.eigh(np.asarray(mat, np.complex128))


def _logm_psd(mat: jnp.ndarray) -> jnp.ndarray:
  """Matrix log of a Hermitian PSD matrix via eigh (clipped for stability)."""
  evals, evecs = _eigh_host(mat)
  log_evals = np.log(np.maximum(np.real(evals), 1e-300))
  return (evecs * log_evals.astype(np.complex128)) @ np.conj(evecs.T)


def optimized_trace_matmul(rho, sigma):
  """tr[rho @ sigma] without materializing the product (reference
  baselines/utils.py:24-38).  Host numpy (metrics-only)."""
  return np.sum(np.asarray(rho, np.complex128) *
                np.asarray(sigma, np.complex128).T)


def relative_entropy(rho, sigma):
  """D(rho||sigma) = tr[rho (log rho - log sigma)] (reference
  baselines/utils.py:41-58)."""
  log_rho = _logm_psd(rho)
  log_sigma = _logm_psd(sigma)
  return float(np.real(optimized_trace_matmul(rho, log_rho - log_sigma)))


def get_thermal_state(beta, h_num):
  """exp(-beta h)/Z via eigh + softmax (the LSE-gradient trick of reference
  baselines/utils.py:61-115 is exactly a softmax over -beta*eigenvalues)."""
  evals, evecs = _eigh_host(h_num)
  x = -float(beta) * np.real(evals)
  weights = np.exp(x - np.max(x))
  probs = (weights / np.sum(weights)).astype(np.complex128)
  return (evecs * probs) @ np.conj(evecs.T)


def log_partition_function(beta, h_num):
  """ln tr[exp(-beta h)] (reference baselines/utils.py:118-134)."""
  evals, _ = _eigh_host(h_num)
  x = -float(beta) * np.real(evals)
  m = np.max(x)
  return float(m + np.log(np.sum(np.exp(x - m))))


def density_matrix_to_image(dm) -> np.ndarray:
  """Renders a density matrix as a [1, 512, 512, 3] RGB image: |Re| in the
  red channel, |Im| in blue, joint-normalized, superpixel-upscaled (reference
  baselines/utils.py:137-160)."""
  max_qubits = 9
  total_edge = 2**max_qubits
  dm = np.asarray(dm)
  dm_len = dm.shape[0]
  # Above 9 qubits the matrix is already larger than the target edge:
  # render at native resolution (scale 1) instead of scale 0, which would
  # produce empty kron factors and crash the metrics step.
  scale = max(1, total_edge // dm_len)
  edge = dm_len * scale
  dm_real = np.abs(np.real(dm))
  dm_imag = np.abs(np.imag(dm))
  max_dm = max(dm_real.max(), dm_imag.max(), 1e-30)
  dm_real = np.kron(dm_real / max_dm, np.ones((scale, scale), np.float32))
  dm_imag = np.kron(dm_imag / max_dm, np.ones((scale, scale), np.float32))
  zeros = np.zeros((edge, edge), np.float32)
  img = np.stack([dm_real.astype(np.float32), zeros,
                  dm_imag.astype(np.float32)], axis=-1)
  return img[None]
