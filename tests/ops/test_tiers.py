"""High-qubit tier coverage for Pauli-sum expectations and applications.

The support-tiered paths in statevector.expectation_terms /
apply_pauli_sum (diagonal / minor-only / block-local major / block-spanning
major / mixed / fallback) only all engage at n >= 15, above the sizes the
rest of the CPU suite uses.  This file pins each tier against the
brute-force per-term oracle (apply_pauli_string + full reduction) at n=16,
where the row qubits split into two blocks [0..6] and [7..8].
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qhbmlib_tpu.models import circuit_utils
from qhbmlib_tpu.ops import paulis, statevector as sv

N = 16


def _random_state(seed):
  key = jax.random.PRNGKey(seed)
  circ = circuit_utils.hardware_efficient_ansatz(N, 1)
  vals = jax.random.normal(key, [circ.num_symbols], jnp.float32)
  return jax.jit(lambda v: sv.apply_circuit(circ, v, sv.zero_state(N)))(vals)


# One term per tier (n=16: minor qubits are 9..15, row blocks [0..6], [7..8]).
_TIER_TERMS = [
    ("diag", (1.0, {3: "Z", 12: "Z"})),
    ("minor_only", (0.7, {10: "X", 14: "Y"})),
    ("block_local", (-0.6, {1: "X", 4: "Y"})),
    ("block_spanning", (0.9, {6: "X", 7: "X"})),
    ("mixed_major_minor", (-1.1, {5: "Y", 11: "X"})),
    ("four_major_fallback", (0.4, {0: "X", 2: "X", 6: "Y", 8: "X"})),
]


def _oracle_term(state, codes):
  p_state = sv.apply_pauli_string(state, codes)
  return float(jnp.real(jnp.sum(jnp.conj(state) * p_state)))


@pytest.mark.parametrize("name,term", _TIER_TERMS)
def test_expectation_tier_matches_oracle(name, term):
  state = _random_state(1)
  op = paulis.pauli_sum_from_strings(N, [term])
  got = float(jax.jit(
      lambda s: sv.expectation_terms(s, op))(state)[0])
  want = _oracle_term(state, op.codes[0])
  np.testing.assert_allclose(got, want, atol=5e-5), name


def test_expectation_all_tiers_together():
  state = _random_state(2)
  op = paulis.pauli_sum_from_strings(N, [t for _, t in _TIER_TERMS])
  got = np.asarray(jax.jit(lambda s: sv.expectation_terms(s, op))(state))
  want = np.asarray([_oracle_term(state, op.codes[t])
                     for t in range(op.num_terms)])
  np.testing.assert_allclose(got, want, atol=5e-5)


def test_apply_pauli_sum_tiers_match_oracle():
  state = _random_state(3)
  op = paulis.pauli_sum_from_strings(N, [t for _, t in _TIER_TERMS])
  weights = jnp.asarray(np.linspace(0.5, 1.5, op.num_terms), jnp.float32)

  @jax.jit
  def tiered(s):
    return sv.apply_pauli_sum(s, op, term_weights=weights)

  @jax.jit
  def oracle(s):
    out = jnp.zeros_like(s)
    for t in range(op.num_terms):
      w = (op.coeffs[t] * weights[t]).astype(sv.COMPLEX_DTYPE)
      out = out + w * sv.apply_pauli_string(s, op.codes[t])
    return out

  a, b = tiered(state), oracle(state)
  err = float(jnp.max(jnp.abs(jnp.real(a - b))) +
              jnp.max(jnp.abs(jnp.imag(a - b))))
  assert err < 1e-4, err
