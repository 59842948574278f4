"""Quantum data sources defined by QHBMs.

Mirrors reference qhbmlib/data/qhbm_data.py:26-39.
"""

from __future__ import annotations

import jax.numpy as jnp

from qhbmlib_tpu.data import quantum_data
from qhbmlib_tpu.inference import qhbm as qhbm_module


class QHBMData(quantum_data.QuantumData):
  """QuantumData defined by a QHBM."""

  def __init__(self, input_qhbm: qhbm_module.QHBM):
    self.qhbm = input_qhbm

  def expectation(self, observable):
    return jnp.squeeze(self.qhbm.expectation(observable), 0)

  def expectation_pure(self, data_params, key, observable, obs_params,
                       state=None):
    value, new_state = self.qhbm.expectation_pure(
        data_params, key, observable, obs_params, ebm_state=state)
    return jnp.squeeze(value, 0), new_state

  @property
  def params(self):
    return self.qhbm.params
