"""Inference on parameterized quantum circuits.

TPU-native rebuild of reference qhbmlib/inference/qnn.py:29-292:

  * `AnalyticQuantumInference` -- exact expectations via the statevector
    engine with adjoint (`custom_vjp`) gradients, replacing
    `tfq.layers.Expectation` (reference qnn.py:87-139).
  * `SampledQuantumInference` -- shot-based expectations via basis-rotated
    sampling with parameter-shift gradients, replacing
    `tfq.layers.SampledExpectation`/`Sample` + the ParameterShift
    differentiator (reference qnn.py:142-292).  Shifted evaluations run as a
    vmapped batch of per-gate angle offsets over ONE compiled circuit instead
    of a batch of generated programs.

Pure methods take explicit flat variable lists; observables' coefficients and
parameters are explicit arguments so gradients flow to them.
"""

from __future__ import annotations

import abc
import functools
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from qhbmlib_tpu import utils
from qhbmlib_tpu.models import circuit as circuit_model
from qhbmlib_tpu.models import energy as energy_model
from qhbmlib_tpu.models import hamiltonian as hamiltonian_model
from qhbmlib_tpu.ops import adjoint
from qhbmlib_tpu.ops import circuit_ir as ir
from qhbmlib_tpu.ops import paulis
from qhbmlib_tpu.ops import shift
from qhbmlib_tpu.ops import statevector as sv

Observable = Union[paulis.PauliSum, Sequence[paulis.PauliSum],
                   hamiltonian_model.Hamiltonian]


def _as_pauli_tuple(observables) -> Tuple[paulis.PauliSum, ...]:
  if isinstance(observables, paulis.PauliSum):
    return (observables,)
  return tuple(observables)


class QuantumInference(abc.ABC):
  """Interface for inference on quantum circuits (reference qnn.py:29-84)."""

  def __init__(self,
               input_circuit: circuit_model.QuantumCircuit,
               name: Optional[str] = None):
    self._circuit = input_circuit
    self.name = name or type(self).__name__
    self._total_cache = {}

  @property
  def circuit(self) -> circuit_model.QuantumCircuit:
    return self._circuit

  @property
  def phi(self) -> Sequence[jnp.ndarray]:
    """Current flat trainable variables of the circuit."""
    return self._circuit.trainable_variables

  def _total_circuit(self, observables) -> circuit_model.QuantumCircuit:
    """self.circuit + observables.circuit_dagger, cached per Hamiltonian.

    The cache entry pins a strong reference to the keyed Hamiltonian: ids are
    only unique among *live* objects, so an id()-keyed cache without the
    pinned reference could serve a stale circuit after CPython recycles the
    address of a garbage-collected observable."""
    key = id(observables)
    hit = self._total_cache.get(key)
    if hit is None or hit[0] is not observables:
      hit = utils.bounded_cache_put(
          self._total_cache, key,
          (observables, self._circuit + observables.circuit_dagger))
    return hit[1]

  def expectation(self, initial_states: jnp.ndarray,
                  observables: Observable) -> jnp.ndarray:
    """Expectation values of observables against the QNN (stateful).

    Args:
      initial_states: [batch, n] int bitstrings; each is prepared as a basis
        state, evolved by the circuit, and measured.
      observables: a PauliSum (or sequence of PauliSums), or a Hamiltonian.

    Returns:
      [batch, n_ops] expectations (n_ops == 1 for a Hamiltonian).
    """
    initial_states = jnp.asarray(initial_states)
    unique_states, idx, _ = utils.unique_bitstrings_with_counts(initial_states)
    if isinstance(observables, hamiltonian_model.Hamiltonian):
      unique_exp = self.expectation_pure(
          self.phi, unique_states, observables,
          obs_circuit_params=observables.circuit.trainable_variables,
          obs_energy_params=observables.energy.trainable_variables)
    else:
      unique_exp = self.expectation_pure(self.phi, unique_states, observables)
    return utils.expand_unique_results(unique_exp, idx)

  @abc.abstractmethod
  def expectation_pure(self,
                       phi,
                       initial_states,
                       observables,
                       obs_circuit_params=None,
                       obs_energy_params=None,
                       key=None) -> jnp.ndarray:
    """Pure expectation: [batch, n_ops]."""


class AnalyticQuantumInference(QuantumInference):
  """Exact expectations with adjoint gradients (reference qnn.py:87-139)."""

  def expectation_pure(self,
                       phi,
                       initial_states,
                       observables,
                       obs_circuit_params=None,
                       obs_energy_params=None,
                       key=None) -> jnp.ndarray:
    del key
    bits = jnp.asarray(initial_states)
    if isinstance(observables, hamiltonian_model.Hamiltonian):
      if not isinstance(observables.energy, energy_model.PauliMixin):
        raise TypeError("General Hamiltonians not accepted.  "
                        "Please use `SampledQuantumInference` instead.")
      total = self._total_circuit(observables)
      flat = list(phi) + list(obs_circuit_params)
      values = total.resolved_values_flat(flat)
      shard_exps = adjoint.batched_expectations(
          total.pqc, values, bits, observables.operator_shards)  # [B, S]
      post = jax.vmap(
          lambda row: observables.energy.operator_expectation_flat(
              obs_energy_params, row))(shard_exps)
      return post[:, None]
    ops = _as_pauli_tuple(observables)
    values = self._circuit.resolved_values_flat(phi)
    return adjoint.batched_expectations(self._circuit.pqc, values, bits, ops)


# ---------------------------------------------------------------------------
# Sampled engine
# ---------------------------------------------------------------------------

def _measurement_rotation(num_qubits: int,
                          codes: Sequence[int]) -> ir.Circuit:
  """Basis-rotation SUFFIX mapping each term's Paulis onto Z.

  Kept separate from the base circuit (not appended) so the sampled engine
  simulates the base circuit ONCE per (state, shift) and applies only this
  constant single-layer suffix per measurement group -- with G groups that
  is 1 full simulation + G cheap suffixes instead of G full simulations.
  """
  b = ir.CircuitBuilder(num_qubits)
  for q, c in enumerate(codes):
    if c == paulis.X:
      b.h(q)
    elif c == paulis.Y:
      b.rx(q, shift=np.pi / 2)  # Rx(pi/2): Y -> Z
  return b.build()


def _group_terms(ops):
  """Greedy qubit-wise-commuting grouping of all terms of all ops.

  Terms whose per-qubit Paulis agree wherever both are non-identity share a
  measurement basis: ONE basis-rotated circuit simulation + shot batch
  serves the whole group (real-hardware practice; at a TFIM observable this
  collapses ~40 per-term simulations into 2).

  Returns [(basis_codes, masks [Gt, n] np.int32, term_indices tuple)].
  """
  groups = []
  t_global = 0
  for op in ops:
    n = op.num_qubits
    for t in range(op.num_terms):
      codes = op.codes[t]
      placed = False
      for g in groups:
        basis = g["basis"]
        if all(basis[q] in (paulis.I, c)
               for q, c in enumerate(codes) if c != paulis.I):
          for q, c in enumerate(codes):
            if c != paulis.I:
              basis[q] = c
          g["terms"].append((codes, t_global))
          placed = True
          break
      if not placed:
        groups.append({"basis": [c for c in codes],
                       "terms": [(codes, t_global)]})
      t_global += 1
  out = []
  for g in groups:
    masks = np.asarray(
        [[1 if c != paulis.I else 0 for c in codes]
         for codes, _ in g["terms"]], np.int32)
    idxs = tuple(t for _, t in g["terms"])
    out.append((tuple(g["basis"]), masks, idxs))
  return out


def _sampled_term_means_one(plan, pqc, values, init_bits, key, shots,
                            angle_offsets=None):
  """[T] sampled <P_t> (coefficient-free) for one initial state.

  `plan` = (groups, num_terms); the base circuit is simulated ONCE, then
  each measurement-basis group applies its constant rotation suffix + one
  shot batch, all of the group's term parities estimated from the same
  samples.
  """
  groups, num_terms = plan
  n = pqc.num_qubits
  psi0 = sv.apply_circuit(pqc, values, sv.basis_state(n, init_bits),
                          angle_offsets=angle_offsets)
  out = jnp.zeros([num_terms], jnp.float32)
  for gi, (rot_suffix, masks, term_idx) in enumerate(groups):
    # NOTE: the empty values array must be built here, not at module level:
    # a module-level jnp constant initializes the jax backend at import time,
    # which breaks dryrun_multichip's pre-init CPU-platform forcing (and can
    # crash outright when the accelerator plugin is present but broken).
    psi = (psi0 if rot_suffix.num_gates == 0 else
           sv.apply_circuit(rot_suffix, jnp.zeros([0], jnp.float32), psi0))
    probs = sv.probabilities(psi)
    idx = utils.categorical_indices_from_weights(
        jax.random.fold_in(key, gi), probs, shots)
    bits = sv.index_to_bits(idx, n).astype(jnp.int32)  # [shots, n]
    par = 1 - 2 * ((bits @ jnp.asarray(masks.T, jnp.int32)) % 2)  # [shots,Gt]
    means = jnp.mean(par.astype(jnp.float32), axis=0)
    out = out.at[np.asarray(term_idx, np.int32)].set(means)
  return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _sampled_term_means(plan, pqc: ir.Circuit, shots: int,
                        values: jnp.ndarray, init_bits: jnp.ndarray,
                        keys: jax.Array) -> jnp.ndarray:
  """Sampled per-term expectations [B, T] with parameter-shift gradients.

  `plan` is a static (groups, num_terms) measurement plan (see
  `_group_terms`).  Coefficients are applied OUTSIDE so their gradients flow
  through plain autodiff.  `keys` carries ONE key per initial state ([B]
  leading axis): per-state keys (rather than one key split inside) keep the
  batch axis slice-able, so the sharded wrapper (parallel/sampled_sharded.py)
  produces bit-identical results to the single-device path.
  """
  def one(bits, k):
    return _sampled_term_means_one(plan, pqc, values, bits, k, shots)

  return jax.vmap(one)(init_bits, keys)


def _stm_fwd(plan, pqc, shots, values, init_bits, keys):
  out = _sampled_term_means(plan, pqc, shots, values, init_bits, keys)
  return out, (values, init_bits, keys)


def _stm_bwd(plan, pqc, shots, res, g):
  """Parameter-shift backward: fresh shots per shifted evaluation, mirroring
  the reference's re-sampled gradient circuits (reference qnn.py:189-234)."""
  values, init_bits, keys = res
  offsets, weights, slots = shift.shift_plan(pqc)
  num_symbols = values.shape[0]
  if offsets.shape[0] == 0:
    return jnp.zeros_like(values), None, None

  def eval_one(offset_row, r):
    def per_state(bits, k):
      return _sampled_term_means_one(plan, pqc, values, bits,
                                     jax.random.fold_in(k, r + 1), shots,
                                     angle_offsets=offset_row)
    return jax.vmap(per_state)(init_bits, keys)  # [B, T]

  # Shift-plan constants stay HOST numpy: an eager jnp.asarray on these
  # concrete lists creates device-array constants whose lowering-time
  # fetch stalls a tunneled backend (benchmarks/RESULTS.md round 5).
  evals = jax.vmap(eval_one)(np.asarray(offsets, np.float32),
                             jnp.arange(len(offsets)))  # [R, B, T]
  contribs = jnp.einsum("rbt,bt->r", evals, g) * np.asarray(
      weights, np.float32)
  values_bar = jnp.zeros([num_symbols], jnp.float32).at[
      np.asarray(slots, np.int32)].add(contribs)
  return values_bar, None, None


_sampled_term_means.defvjp(_stm_fwd, _stm_bwd)


class SampledQuantumInference(QuantumInference):
  """Shot-based expectations with parameter-shift gradients
  (reference qnn.py:142-292)."""

  def __init__(self,
               input_circuit: circuit_model.QuantumCircuit,
               expectation_samples: int,
               name: Optional[str] = None,
               initial_seed=None):
    super().__init__(input_circuit, name)
    self.expectation_samples = int(expectation_samples)
    self._update_seed = initial_seed is None
    # Same seed normalization as the EnergyInference family (utils.as_prng_key)
    # so e.g. a raw uint32[2] key-data seed behaves identically here.
    self._key = utils.as_prng_key(initial_seed)
    self._plan_cache = {}

  def _next_key(self):
    if self._update_seed:
      self._key, sub = jax.random.split(self._key)
      return sub
    return self._key

  def _measurement_plan(self, pqc: ir.Circuit,
                        ops: Tuple[paulis.PauliSum, ...]):
    """Static grouped measurement plan ((groups, num_terms), slices), cached.

    Qubit-wise-commuting terms share one basis-rotated circuit + shot batch.
    """
    cache_key = (id(pqc),) + tuple(id(op) for op in ops)
    hit = self._plan_cache.get(cache_key)
    # The entry pins (pqc, ops) so their ids stay unique for the cache's
    # lifetime (id reuse after GC would otherwise alias a different plan).
    if hit is None or hit[0] is not pqc or any(
        a is not b for a, b in zip(hit[1], ops)):
      groups = []
      for basis_codes, masks, term_idx in _group_terms(ops):
        groups.append((_measurement_rotation(pqc.num_qubits, basis_codes),
                       masks, term_idx))
      num_terms = sum(op.num_terms for op in ops)
      slices = paulis.op_slices(ops)
      hit = utils.bounded_cache_put(
          self._plan_cache, cache_key,
          (pqc, tuple(ops), ((tuple(groups), num_terms), tuple(slices))))
    return hit[2]

  def expectation(self, initial_states, observables):
    initial_states = jnp.asarray(initial_states)
    unique_states, idx, _ = utils.unique_bitstrings_with_counts(initial_states)
    if isinstance(observables, hamiltonian_model.Hamiltonian):
      unique_exp = self.expectation_pure(
          self.phi, unique_states, observables,
          obs_circuit_params=observables.circuit.trainable_variables,
          obs_energy_params=observables.energy.trainable_variables,
          key=self._next_key())
    else:
      unique_exp = self.expectation_pure(self.phi, unique_states, observables,
                                         key=self._next_key())
    return utils.expand_unique_results(unique_exp, idx)

  def _run_term_means(self, plan, pqc, values, bits, keys):
    """Dispatch hook: subclasses (parallel/sampled_sharded.py) shard the
    batch axis over a mesh; semantics are identical."""
    return _sampled_term_means(plan, pqc, self.expectation_samples, values,
                               bits, keys)

  def _run_energy_expectation(self, pqc, energy_apply, values, energy_params,
                              bits, keys):
    """Dispatch hook for the general-BitstringEnergy observable path."""
    return _sampled_energy_expectation(pqc, self.expectation_samples,
                                       energy_apply, values, energy_params,
                                       bits, keys)

  def expectation_pure(self,
                       phi,
                       initial_states,
                       observables,
                       obs_circuit_params=None,
                       obs_energy_params=None,
                       key=None) -> jnp.ndarray:
    if key is None:
      if any(isinstance(x, jax.core.Tracer)
             for x in jax.tree_util.tree_leaves((list(phi), initial_states))):
        raise ValueError(
            "expectation_pure under jit requires an explicit `key`: the "
            "key=None convenience fallback draws from the object's internal "
            "key stream, which a traced call would bake in as a constant "
            "(every compiled call re-using identical shot noise).")
      key = self._next_key()
    bits = jnp.asarray(initial_states)
    keys = jax.random.split(key, bits.shape[0])
    if isinstance(observables, hamiltonian_model.Hamiltonian):
      total = self._total_circuit(observables)
      flat = list(phi) + list(obs_circuit_params)
      values = total.resolved_values_flat(flat)
      if isinstance(observables.energy, energy_model.PauliMixin):
        plan, slices = self._measurement_plan(total.pqc,
                                              observables.operator_shards)
        term_means = self._run_term_means(plan, total.pqc, values, bits,
                                          keys)  # [B, T]
        coeffs = jnp.concatenate(
            [jnp.atleast_1d(s.coeffs) for s in observables.operator_shards])
        weighted = term_means * jnp.real(coeffs)[None, :]
        shard_exps = jnp.stack(
            [jnp.sum(weighted[:, a:b], axis=1) for a, b in slices], axis=1)
        post = jax.vmap(
            lambda row: observables.energy.operator_expectation_flat(
                obs_energy_params, row))(shard_exps)
        return post[:, None]
      # General BitstringEnergy observable: sample measurement bitstrings and
      # push them through the energy (reference qnn.py:170-238).
      return self._run_energy_expectation(
          total.pqc,
          lambda th, samples: observables.energy.apply_flat(th, samples),
          values, obs_energy_params, bits, keys)[:, None]
    ops = _as_pauli_tuple(observables)
    values = self._circuit.resolved_values_flat(phi)
    plan, slices = self._measurement_plan(self._circuit.pqc, ops)
    term_means = self._run_term_means(plan, self._circuit.pqc, values, bits,
                                      keys)
    coeffs = jnp.concatenate([jnp.atleast_1d(op.coeffs) for op in ops])
    weighted = term_means * jnp.real(coeffs)[None, :]
    return jnp.stack([jnp.sum(weighted[:, a:b], axis=1) for a, b in slices],
                     axis=1)

  def sample(self, initial_states, counts, max_count=None):
    """Measurement samples from the QNN applied to each initial state.

    Replaces the reference's ragged output (reference qnn.py:266-292) with a
    fixed-shape (samples [B, max_count, n], mask [B, max_count]) pair where
    `mask[i, j] = j < counts[i]`.

    `max_count` (a static Python int) bounds the per-state sample axis.  It
    defaults to `int(max(counts))`, which concretizes `counts` -- fine on the
    eager convenience path, impossible under `jit`.  Callers tracing this
    method must pass `max_count` explicitly and it must be an upper bound on
    every possible runtime count (e.g. the total sample budget): a state
    whose count exceeds `max_count` would silently receive only `max_count`
    draws while `mask[i]` marks them all valid, so count-weighted downstream
    statistics would attribute count[i] weight to fewer samples.  The eager
    path rejects such a `max_count` outright; under trace the bound cannot
    be value-checked, so it is the caller's contract.
    """
    initial_states = jnp.asarray(initial_states)
    counts = jnp.asarray(counts)
    if max_count is None:
      if isinstance(counts, jax.core.Tracer):
        raise ValueError(
            "sample() under jit requires a static `max_count` argument: "
            "`counts` is traced, so the per-state sample axis cannot be "
            "sized from its runtime maximum.")
      max_count = int(jnp.max(counts))
    elif not isinstance(counts, jax.core.Tracer):
      actual = int(jnp.max(counts))
      if int(max_count) < actual:
        raise ValueError(
            f"max_count={int(max_count)} is smaller than max(counts)="
            f"{actual}: the per-state sample axis would silently truncate "
            "that state's draws. Pass max_count >= max(counts) (e.g. the "
            "total sample budget).")
    max_count = int(max_count)
    values = self._circuit.resolved_values
    n = self._circuit.num_qubits
    key = self._next_key()

    def one(bits, k):
      state = sv.apply_circuit(self._circuit.pqc, values,
                               sv.basis_state(n, bits))
      return sv.sample_bitstrings(k, state, max_count)

    keys = jax.random.split(key, initial_states.shape[0])
    samples = jax.vmap(one)(initial_states, keys)
    mask = jnp.arange(max_count)[None, :] < counts[:, None]
    return samples, mask


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _sampled_energy_expectation(pqc: ir.Circuit, shots: int, energy_apply,
                                values: jnp.ndarray, energy_params,
                                init_bits: jnp.ndarray,
                                keys: jax.Array) -> jnp.ndarray:
  """[B] sampled <K> where K's eigenbasis measurement feeds an energy fn.

  `keys` is one PRNG key per initial state ([B] leading axis), keeping the
  batch axis slice-able for the sharded wrapper."""
  return _see_forward(pqc, shots, energy_apply, values, energy_params,
                      init_bits, keys, None)


def _see_forward(pqc, shots, energy_apply, values, energy_params, init_bits,
                 keys, angle_offsets):
  n = pqc.num_qubits

  def one(bits, k):
    state = sv.apply_circuit(pqc, values, sv.basis_state(n, bits),
                             angle_offsets=angle_offsets)
    samples = sv.sample_bitstrings(k, state, shots)
    return jnp.mean(energy_apply(energy_params, samples))

  return jax.vmap(one)(init_bits, keys)


def _see_fwd(pqc, shots, energy_apply, values, energy_params, init_bits,
             keys):
  out = _see_forward(pqc, shots, energy_apply, values, energy_params,
                     init_bits, keys, None)
  return out, (values, energy_params, init_bits, keys)


def _see_bwd(pqc, shots, energy_apply, res, g):
  values, energy_params, init_bits, keys = res

  # Energy-parameter gradients: same samples (same keys), tape through energy.
  def fwd_e(ep):
    return _see_forward(pqc, shots, energy_apply, values, ep, init_bits,
                        keys, None)

  _, vjp_e = jax.vjp(fwd_e, energy_params)
  (energy_bar,) = vjp_e(g)

  # Circuit-parameter gradients: parameter shift with fresh shots.
  offsets, weights, slots = shift.shift_plan(pqc)
  if offsets.shape[0] == 0:
    values_bar = jnp.zeros_like(values)
  else:
    frozen_ep = jax.lax.stop_gradient(energy_params)

    def eval_one(offset_row, r):
      fresh = jax.vmap(lambda k: jax.random.fold_in(k, r + 1))(keys)
      return _see_forward(pqc, shots, energy_apply, values, frozen_ep,
                          init_bits, fresh, offset_row)

    # Host numpy for the static shift plan (see the analytic path above).
    evals = jax.vmap(eval_one)(np.asarray(offsets, np.float32),
                               jnp.arange(len(offsets)))  # [R, B]
    contribs = jnp.einsum("rb,b->r", evals, g) * np.asarray(
        weights, np.float32)
    values_bar = jnp.zeros_like(values).at[
        np.asarray(slots, np.int32)].add(contribs)

  return values_bar, energy_bar, None, None


_sampled_energy_expectation.defvjp(_see_fwd, _see_bwd)
