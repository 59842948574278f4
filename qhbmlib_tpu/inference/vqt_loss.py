"""VQT loss: variational free energy beta*<H> - S.

TPU-native rebuild of reference qhbmlib/inference/vqt_loss.py:25-55.  The
loss value and gradients follow the reference exactly:

    f_vqt(x) = beta * <H>_{U|x>} - stop_grad(E_theta(x))
    loss     = <f_vqt>_EBM  -  stop_grad(log Z)

where <.>_EBM carries the eq. A5 score-function custom gradient.
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp

from qhbmlib_tpu import utils
from qhbmlib_tpu.inference import qhbm as qhbm_module
from qhbmlib_tpu.models import hamiltonian as hamiltonian_model
from qhbmlib_tpu.ops import paulis


def make_vqt(input_qhbm: qhbm_module.QHBM,
             target_hamiltonian: Union[paulis.PauliSum,
                                       hamiltonian_model.Hamiltonian]):
  """Builds the pure VQT loss function for a fixed (qhbm, target) pair.

  Returns:
    loss_fn(params, key, beta, ebm_state=None) -> (loss, new_ebm_state), pure
    and jit/grad-safe.  `params` is
      {'theta': [...], 'phi': [...]}                        and, if the target
      is a Hamiltonian, additionally
      {'target_circuit': [...], 'target_energy': [...]}.
    For a PauliSum target, coefficient gradients are available by
    differentiating w.r.t. `params['target_coeffs']` (optional entry).
  """
  e_inf = input_qhbm.e_inference
  q_inf = input_qhbm.q_inference
  is_hamiltonian = isinstance(target_hamiltonian,
                              hamiltonian_model.Hamiltonian)

  def f_vqt(fp, bits):
    """beta*<H>_{U|x>} - stop_grad(E(x)) per unique bitstring
    (reference vqt_loss.py:46-51)."""
    if is_hamiltonian:
      h_exp = q_inf.expectation_pure(
          fp["phi"], bits, target_hamiltonian,
          obs_circuit_params=fp["target_circuit"],
          obs_energy_params=fp["target_energy"],
          key=fp.get("qnn_key"))
    else:
      h_exp = q_inf.expectation_pure(fp["phi"], bits, fp["target"],
                                     key=fp.get("qnn_key"))
    h_exp = jnp.squeeze(h_exp, 1)  # single observable
    energies = jax.lax.stop_gradient(
        e_inf.energy_apply(fp["theta"], bits))
    return fp["beta"] * h_exp - energies

  def loss_fn(params, key, beta, ebm_state=None):
    k_ebm, k_qnn, k_logz = jax.random.split(key, 3)
    theta = list(params["theta"])
    fp = {
        "phi": list(params["phi"]),
        "theta": theta,
        "beta": beta,
        "qnn_key": k_qnn,
    }
    if is_hamiltonian:
      fp["target_circuit"] = list(params["target_circuit"])
      fp["target_energy"] = list(params["target_energy"])
    else:
      target = target_hamiltonian
      if "target_coeffs" in params:
        target = paulis.PauliSum(target.codes, params["target_coeffs"],
                                 target.num_qubits)
      fp["target"] = target

    avg_expectation, new_state = e_inf.expectation_pure_with_state(
        theta, f_vqt, fp, k_ebm, ebm_state)
    # Entire log-partition value is stop-gradiented (reference
    # vqt_loss.py:53-55); its gradient enters through the energies term of
    # f_vqt via the score-function estimator.
    log_z, new_state = e_inf.log_partition_pure_with_state(
        jax.lax.stop_gradient(theta), k_logz, new_state)
    return avg_expectation - jax.lax.stop_gradient(log_z), new_state

  return loss_fn


def vqt(input_qhbm: qhbm_module.QHBM,
        target_hamiltonian,
        beta) -> jnp.ndarray:
  """Computes the VQT loss (stateful convenience; value only).

  For training/gradients, use `make_vqt` (pure) with jax.value_and_grad.
  """
  loss_fn = _cached_loss_fn(input_qhbm, target_hamiltonian)
  params = _vqt_params(input_qhbm, target_hamiltonian)
  key = input_qhbm.e_inference._next_key()
  loss, _ = loss_fn(params, key, jnp.asarray(beta, jnp.float32))
  return loss


def _vqt_params(input_qhbm, target_hamiltonian):
  params = dict(input_qhbm.params)
  if isinstance(target_hamiltonian, hamiltonian_model.Hamiltonian):
    params["target_circuit"] = list(
        target_hamiltonian.circuit.trainable_variables)
    params["target_energy"] = list(
        target_hamiltonian.energy.trainable_variables)
  return params


def _cached_loss_fn(input_qhbm, target_hamiltonian):
  cache = getattr(input_qhbm, "_vqt_cache", None)
  if cache is None:
    cache = {}
    input_qhbm._vqt_cache = cache
  # Pin the target in the entry: ids are unique only among live objects, so
  # without the strong reference a recycled id could serve a stale loss_fn.
  key = id(target_hamiltonian)
  hit = cache.get(key)
  if hit is None or hit[0] is not target_hamiltonian:
    hit = utils.bounded_cache_put(
        cache, key,
        (target_hamiltonian, make_vqt(input_qhbm, target_hamiltonian)))
  return hit[1]
