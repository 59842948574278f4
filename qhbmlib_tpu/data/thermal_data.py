"""Exact thermal-state quantum data source.

The reference's only concrete QuantumData is QHBM-backed (reference
qhbmlib/data/qhbm_data.py:26-39); QMHL experiments that "learn the modular
Hamiltonian of a known thermal state" therefore had to wrap a trained QHBM.
`ThermalStateData` closes that gap: it serves exact expectation values
tr[rho K] against a dense target density matrix rho (e.g. a Gibbs state from
baselines.utils.get_thermal_state), usable as QMHL training data for any
modular-Hamiltonian observable.  Dense-linear-algebra path: small/medium n
only (the 2^n x 2^n unitary is materialized).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from qhbmlib_tpu.data import quantum_data
from qhbmlib_tpu.models import hamiltonian as hamiltonian_model
from qhbmlib_tpu.ops import statevector as sv


class ThermalStateData(quantum_data.QuantumData):
  """QuantumData serving exact expectations against a fixed density matrix."""

  def __init__(self, density_matrix):
    import numpy as np
    # Stored as separate float32 real/imag parts: some accelerator backends
    # cannot transfer complex host arrays; the complex matrix is rebuilt
    # under trace (device-side) where complex arithmetic works fine.
    rho = np.asarray(density_matrix, np.complex128)
    # HOST numpy throughout: these are captured as constants in jitted
    # expectation programs, and a device-array constant costs a
    # synchronous device fetch at lowering time (minutes over a tunneled
    # backend -- benchmarks/RESULTS.md round 5).
    self._rho_re = np.asarray(np.real(rho), np.float32)
    self._rho_im = np.asarray(np.imag(rho), np.float32)
    n = int(rho.shape[0]).bit_length() - 1
    self._num_qubits = n
    self._all_bits = sv.all_bitstrings(n)

  @property
  def num_qubits(self) -> int:
    return self._num_qubits

  @property
  def _rho(self) -> jnp.ndarray:
    return (self._rho_re + 1j * self._rho_im).astype(jnp.complex64)

  @property
  def density_matrix(self) -> jnp.ndarray:
    return self._rho

  def expectation(self, observable):
    if isinstance(observable, hamiltonian_model.Hamiltonian):
      obs_params = {
          "circuit": list(observable.circuit.trainable_variables),
          "energy": list(observable.energy.trainable_variables),
      }
    else:
      obs_params = None
    value, _ = self.expectation_pure({}, None, observable, obs_params)
    return value

  def expectation_pure(self, data_params, key, observable, obs_params,
                       state=None):
    """tr[rho K]; differentiable w.r.t. the observable's parameters.

    For a Hamiltonian observable K = U diag(E_theta(x)) U^dagger:
      tr[rho K] = sum_x E_theta(x) * <x| U^dagger rho U |x>.
    For a PauliSum observable the trace contracts term by term.
    """
    del data_params, key
    if isinstance(observable, hamiltonian_model.Hamiltonian):
      values = observable.circuit.resolved_values_flat(
          list(obs_params["circuit"]))
      u = sv.unitary(observable.circuit.pqc, values)  # [2^n, 2^n]
      # d[x] = <x|U^dagger rho U|x>
      d = jnp.real(jnp.einsum("ix,ij,jx->x", jnp.conj(u), self._rho, u))
      energies = observable.energy.apply_flat(
          list(obs_params["energy"]), self._all_bits)
      return jnp.sum(d * energies), state
    op = observable
    total = jnp.zeros((), jnp.float32)
    dim = 2**self._num_qubits
    for t in range(op.num_terms):
      # tr[rho P_t] by applying P_t to rho's columns.
      p_rho = jax.vmap(
          lambda col: sv.to_vector(
              sv.apply_pauli_string(sv.from_vector(col, self._num_qubits),
                                    op.codes[t])),
          in_axes=1, out_axes=1)(self._rho)
      total = total + jnp.real(op.coeffs[t]) * jnp.real(jnp.trace(p_rho))
    return total, state
