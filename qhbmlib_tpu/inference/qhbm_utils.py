"""Metrics on Hamiltonian models (density matrix, fidelity).

Mirrors reference qhbmlib/inference/qhbm_utils.py:24-116 with jnp linalg
(eigh runs natively on TPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from qhbmlib_tpu.inference import ebm_utils
from qhbmlib_tpu.inference import qnn_utils
from qhbmlib_tpu.models import hamiltonian as hamiltonian_model


def _cached_jit(model, name, factory):
  """Per-model cache of jitted metric helpers: repeated metrics calls reuse
  one compiled executable instead of retracing a fresh closure each call."""
  cache = model.__dict__.setdefault("_metric_jit_cache", {})
  if name not in cache:
    cache[name] = jax.jit(factory())
  return cache[name]


def density_matrix(model: hamiltonian_model.Hamiltonian) -> np.ndarray:
  r"""Thermal state rho = U_phi P_theta U_phi^dagger of a modular
  Hamiltonian (reference qhbm_utils.py:24-59).  Returned on HOST (numpy):
  it feeds host-side metrics, and complex device arrays cannot always be
  transferred wholesale.  The complex contraction runs under jit -- eager
  complex ops are rejected by some accelerator backends."""

  def factory():
    def compute(theta, phi):
      probs = ebm_utils.probabilities(model.energy,
                                      theta).astype(jnp.complex64)
      u = qnn_utils.unitary(model.circuit, phi)
      rho = jnp.einsum("k,ik,jk->ij", probs, u, jnp.conj(u))
      return jnp.real(rho), jnp.imag(rho)

    return compute

  compute = _cached_jit(model, "density_matrix", factory)
  re, im = compute(list(model.energy.trainable_variables),
                   list(model.circuit.trainable_variables))
  return np.asarray(re, np.float64) + 1j * np.asarray(im, np.float64)


def fidelity(model: hamiltonian_model.Hamiltonian, sigma) -> jnp.ndarray:
  r"""F(rho, sigma) via the Hermitian eigendecomposition of
  sqrt(K) U^dagger sigma U sqrt(K) (reference qhbm_utils.py:62-116).

  `sigma` is taken as a host array; it enters the device computation as
  separate real/imag float parts (complex host<->device transfers are not
  available on every backend), and the final eigendecomposition runs on
  host (metrics-only; never differentiated).
  """
  sigma = np.asarray(sigma, np.complex128)
  sig_re = jnp.asarray(np.real(sigma), jnp.float32)
  sig_im = jnp.asarray(np.imag(sigma), jnp.float32)

  def factory():
    def omega_parts(theta, phi, s_re, s_im):
      k_theta = ebm_utils.probabilities(model.energy, theta).astype(
          jnp.complex64)
      u_phi = qnn_utils.unitary(model.circuit, phi)
      sig = (s_re + 1j * s_im).astype(jnp.complex64)
      sqrt_k = jnp.sqrt(k_theta)
      omega = jnp.einsum("a,ab,bc,cd,d->ad", sqrt_k, jnp.conj(u_phi.T), sig,
                         u_phi, sqrt_k)
      return jnp.real(omega), jnp.imag(omega)

    return omega_parts

  omega_parts = _cached_jit(model, "fidelity_omega", factory)
  o_re, o_im = omega_parts(list(model.energy.trainable_variables),
                           list(model.circuit.trainable_variables),
                           sig_re, sig_im)
  omega = (np.asarray(o_re, np.float64) + 1j * np.asarray(o_im, np.float64))
  d_omega = np.linalg.eigvalsh(omega.astype(np.complex128))
  d_omega = np.maximum(np.real(d_omega), 0.0)
  return jnp.asarray(np.sum(np.sqrt(d_omega))**2, jnp.float32)
