"""Interface to quantum data sources.

Mirrors reference qhbmlib/data/quantum_data.py:25-41.
"""

from __future__ import annotations

import abc


class QuantumData(abc.ABC):
  """Interface for quantum datasets."""

  @abc.abstractmethod
  def expectation(self, observable):
    """Expectation value of an observable against this dataset (scalar)."""
    raise NotImplementedError()

  @abc.abstractmethod
  def expectation_pure(self, data_params, key, observable, obs_params,
                       state=None):
    """Pure expectation: returns (scalar, new_sampler_state)."""
    raise NotImplementedError()

  @property
  def params(self):
    """Current data-side parameters (pytree; may be empty)."""
    return {}
