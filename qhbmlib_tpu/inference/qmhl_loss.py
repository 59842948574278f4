"""QMHL loss: quantum cross-entropy <K_model>_data + log Z_model.

TPU-native rebuild of reference qhbmlib/inference/qmhl_loss.py:21-34.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from qhbmlib_tpu import utils
from qhbmlib_tpu.inference import qhbm as qhbm_module


def make_qmhl(data, input_qhbm: qhbm_module.QHBM):
  """Builds the pure QMHL loss for a fixed (data, model) pair.

  Args:
    data: a data.QuantumData (e.g. QHBMData); must expose
      `expectation_pure(data_params, key, observable, obs_params, state)`.
    input_qhbm: the model QHBM.

  Returns:
    loss_fn(params, key, ebm_state=None) -> (loss, new_states) with
    params = {'model': {'theta': [...], 'phi': [...]},
              'data': <data parameter pytree>}.
  """
  model_k = input_qhbm.modular_hamiltonian

  def loss_fn(params, key, ebm_state=None):
    k_data, k_logz = jax.random.split(key)
    model_params = params["model"]
    obs_params = {
        "circuit": list(model_params["phi"]),
        "energy": list(model_params["theta"]),
    }
    data_state, model_state = (ebm_state if ebm_state is not None
                               else (None, None))
    data_exp, data_state = data.expectation_pure(
        params["data"], k_data, model_k, obs_params, data_state)
    log_z, model_state = input_qhbm.e_inference.log_partition_pure_with_state(
        list(model_params["theta"]), k_logz, model_state)
    loss = jnp.squeeze(data_exp) + log_z
    return loss, (data_state, model_state)

  return loss_fn


def qmhl(data, input_qhbm: qhbm_module.QHBM) -> jnp.ndarray:
  """Computes the QMHL loss (stateful convenience; value only).

  For training/gradients, use `make_qmhl` (pure) with jax.value_and_grad.
  """
  loss_fn = _cached_loss_fn(data, input_qhbm)
  params = {"model": input_qhbm.params, "data": data.params}
  key = input_qhbm.e_inference._next_key()
  loss, _ = loss_fn(params, key)
  return loss


def _cached_loss_fn(data, input_qhbm):
  cache = getattr(input_qhbm, "_qmhl_cache", None)
  if cache is None:
    cache = {}
    input_qhbm._qmhl_cache = cache
  # Pin the dataset in the entry: ids are unique only among live objects, so
  # without the strong reference a recycled id could serve a stale loss_fn.
  key = id(data)
  hit = cache.get(key)
  if hit is None or hit[0] is not data:
    hit = utils.bounded_cache_put(cache, key,
                                  (data, make_qmhl(data, input_qhbm)))
  return hit[1]
