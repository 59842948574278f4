"""Metrics on Hamiltonian models (density matrix, fidelity).

Mirrors reference qhbmlib/inference/qhbm_utils.py:24-116 with jnp linalg
(eigh runs natively on TPU).
"""

from __future__ import annotations

import jax.numpy as jnp

from qhbmlib_tpu.inference import ebm_utils
from qhbmlib_tpu.inference import qnn_utils
from qhbmlib_tpu.models import hamiltonian as hamiltonian_model


def density_matrix(model: hamiltonian_model.Hamiltonian) -> jnp.ndarray:
  r"""Thermal state rho = U_phi P_theta U_phi^dagger of a modular
  Hamiltonian (reference qhbm_utils.py:24-59)."""
  probs = ebm_utils.probabilities(model.energy).astype(jnp.complex64)
  u = qnn_utils.unitary(model.circuit)
  return jnp.einsum("k,ik,jk->ij", probs, u, jnp.conj(u))


def fidelity(model: hamiltonian_model.Hamiltonian,
             sigma: jnp.ndarray) -> jnp.ndarray:
  r"""F(rho, sigma) via the Hermitian eigendecomposition of
  sqrt(K) U^dagger sigma U sqrt(K) (reference qhbm_utils.py:62-116)."""
  sigma = jnp.asarray(sigma, jnp.complex64)
  k_theta = ebm_utils.probabilities(model.energy).astype(jnp.complex64)
  u_phi = qnn_utils.unitary(model.circuit)
  u_phi_dagger = jnp.conj(u_phi.T)
  sqrt_k = jnp.sqrt(k_theta)
  omega = jnp.einsum("a,ab,bc,cd,d->ad", sqrt_k, u_phi_dagger, sigma, u_phi,
                     sqrt_k)
  d_omega = jnp.linalg.eigvalsh(omega)
  # Clip tiny negative eigenvalues from finite precision.
  d_omega = jnp.maximum(jnp.real(d_omega), 0.0)
  return jnp.sum(jnp.sqrt(d_omega))**2
