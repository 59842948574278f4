"""Inference on quantum Hamiltonians (thermal states / QHBMs).

TPU-native rebuild of reference qhbmlib/inference/qhbm.py:28-147.  A QHBM
pairs an EnergyInference (eigenvalue distribution) with a QuantumInference
(eigenvector circuit); `expectation` nests the quantum estimator inside the
classical score-function estimator exactly as the reference does
(reference qhbm.py:124-147).
"""

from __future__ import annotations

from typing import Optional

import jax

from qhbmlib_tpu import utils
from qhbmlib_tpu.inference import ebm
from qhbmlib_tpu.inference import qnn
from qhbmlib_tpu.models import hamiltonian as hamiltonian_model


class QHBM:
  r"""Inference methods for normalized exponentials of modular Hamiltonians.

  The modular Hamiltonian is K = U_phi K_theta U_phi^dagger; the thermal
  state is rho = Z^-1 e^-K = sum_x p_theta(x) U_phi|x><x|U_phi^dagger.
  """

  def __init__(self,
               input_ebm: ebm.EnergyInference,
               input_qnn: qnn.QuantumInference,
               name: Optional[str] = None):
    self._e_inference = input_ebm
    self._q_inference = input_qnn
    self.name = name or "QHBM"
    self._modular_hamiltonian = hamiltonian_model.Hamiltonian(
        input_ebm.energy, input_qnn.circuit)

  @property
  def e_inference(self) -> ebm.EnergyInference:
    return self._e_inference

  @property
  def q_inference(self) -> qnn.QuantumInference:
    return self._q_inference

  @property
  def modular_hamiltonian(self) -> hamiltonian_model.Hamiltonian:
    return self._modular_hamiltonian

  @property
  def params(self):
    """Current parameters: {'theta': energy vars, 'phi': circuit vars}."""
    return {
        "theta": list(self._e_inference.energy.trainable_variables),
        "phi": list(self._q_inference.circuit.trainable_variables),
    }

  def set_params(self, params) -> None:
    self._e_inference.energy.set_trainable_variables(params["theta"])
    self._q_inference.circuit.set_trainable_variables(params["phi"])

  @property
  def trainable_variables(self):
    return self.modular_hamiltonian.trainable_variables

  def circuits(self, num_samples: int):
    """Thermally distributed eigenstate sample: (unique bitstrings, counts).

    The reference returns serialized state-prep+ansatz circuits (reference
    qhbm.py:97-122); in the array-native engine the (bitstrings, counts) pair
    together with `self.q_inference.circuit` is the same information without
    string tensors: state i is U_phi |bitstrings[i]>.
    """
    samples = self._e_inference.sample(num_samples)
    bitstrings, _, counts = utils.unique_bitstrings_with_counts(samples)
    return bitstrings, counts

  # -- expectation values ------------------------------------------------------

  def expectation(self, observables):
    """Estimates <obs> against the thermal state (stateful convenience).

    Returns [n_ops] sample-averaged expectations.
    """
    key = self._e_inference._next_key()
    value, _ = self.expectation_pure(self.params, key, observables,
                                     _obs_params_from(observables))
    return value

  def expectation_pure(self, params, key, observables, obs_params=None,
                       ebm_state=None):
    """Pure nested estimator: e_inf.expectation(q_inf.expectation(.)).

    Args:
      params: {'theta': [...], 'phi': [...]} model parameters.
      key: PRNG key.
      observables: PauliSum(s) or Hamiltonian (static structure).
      obs_params: {'circuit': [...], 'energy': [...]} for Hamiltonian
        observables (None uses zeros-free static path for PauliSums, whose
        coefficients ride in the PauliSum pytree itself).
      ebm_state: optional sampler state (e.g. GWG chains), threaded through.

    Returns:
      ([n_ops] expectations, new_ebm_state)
    """
    q_inf = self._q_inference
    is_hamiltonian = isinstance(observables, hamiltonian_model.Hamiltonian)

    def f(fp, bits):
      if is_hamiltonian:
        return q_inf.expectation_pure(
            fp["phi"], bits, observables,
            obs_circuit_params=fp["obs_circuit"],
            obs_energy_params=fp["obs_energy"],
            key=fp.get("qnn_key"))
      return q_inf.expectation_pure(fp["phi"], bits, fp["obs"],
                                    key=fp.get("qnn_key"))

    k_ebm, k_qnn = jax.random.split(key)
    f_params = {"phi": list(params["phi"]), "qnn_key": k_qnn}
    if is_hamiltonian:
      f_params["obs_circuit"] = list(obs_params["circuit"])
      f_params["obs_energy"] = list(obs_params["energy"])
    else:
      f_params["obs"] = observables

    avg, new_state = self._e_inference.expectation_pure_with_state(
        params["theta"], f, f_params, k_ebm, ebm_state)
    return avg, new_state


def _obs_params_from(observables):
  if isinstance(observables, hamiltonian_model.Hamiltonian):
    return {
        "circuit": list(observables.circuit.trainable_variables),
        "energy": list(observables.energy.trainable_variables),
    }
  return None
