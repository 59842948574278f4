"""Sharded statevector engine vs the dense single-device engine.

Runs on the 8-virtual-CPU-device mesh forced by tests/conftest.py.  The dense
engine (ops/statevector.py, ops/adjoint.py) is the oracle, itself validated
against closed forms in tests/ops/test_statevector.py -- mirroring the
reference's cross-simulator oracle strategy (reference tests/inference/
qnn_test.py:183-264).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qhbmlib_tpu import models, parallel, utils
from qhbmlib_tpu.inference import ebm, qhbm, qnn, vqt_loss
from qhbmlib_tpu.models import circuit_utils
from qhbmlib_tpu.ops import adjoint, circuit_ir as ir, paulis
from qhbmlib_tpu.ops import statevector as sv
from qhbmlib_tpu.parallel import sharded_sv

ATOL = 2e-5


def _rich_circuit(n):
  """A circuit exercising every routing path: local gates, global 1q gates,
  global-global and global-local 2q gates, PROT strings, constant gates."""
  b = ir.CircuitBuilder(n)
  for q in range(n):
    b.rx(q, f"a{q}")
  b.h(0)
  for q in range(n - 1):
    b.cz(q, q + 1, f"c{q}")
  b.add(ir.ZZP, [0, n - 1], "zz0")
  b.rz(0, "rz0")
  b.zp(1, "zp1")
  b.prot((1, 0, 2), (paulis.X, paulis.Y, paulis.Z), "p0")
  for q in range(n):
    b.ry(q, f"b{q}")
  b.add(ir.CXP, [0, 1], "cx0")
  return b.build()


@pytest.fixture(scope="module")
def state_mesh():
  return parallel.make_mesh(data=1, state=8)


@pytest.fixture(scope="module")
def mixed_mesh():
  return parallel.make_mesh(data=2, state=4)


class TestShardedSimulate:

  def test_matches_dense_from_zero(self, state_mesh):
    n = 5
    circuit = _rich_circuit(n)
    values = jax.random.uniform(jax.random.PRNGKey(0),
                                [circuit.num_symbols]) * 2.0
    dense = sv.simulate(circuit, values).reshape(-1)
    sharded = sharded_sv.simulate_sharded(circuit, values, state_mesh)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense),
                               atol=ATOL)

  def test_matches_dense_from_basis(self, state_mesh):
    n = 4
    circuit = _rich_circuit(n)
    values = jax.random.normal(jax.random.PRNGKey(1), [circuit.num_symbols])
    for idx in [1, 7, 10, 15]:
      bits = jnp.asarray(sv.all_bitstrings(n)[idx])
      dense = sv.simulate_from_bits(circuit, values, bits).reshape(-1)
      sharded = sharded_sv.simulate_sharded(circuit, values, state_mesh,
                                            init_bits=bits)
      np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense),
                                 atol=ATOL)

  def test_all_global_qubits(self, state_mesh):
    """n == k: every qubit is sharded; one amplitude per device."""
    n = 3
    circuit = _rich_circuit(n)
    values = jax.random.normal(jax.random.PRNGKey(2), [circuit.num_symbols])
    dense = sv.simulate(circuit, values).reshape(-1)
    sharded = sharded_sv.simulate_sharded(circuit, values, state_mesh)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense),
                               atol=ATOL)

  def test_diagonal_gates_on_global_qubits_use_no_collectives(self,
                                                              state_mesh):
    """A diagonal gate never mixes amplitudes across devices, so a
    diag-only circuit on sharded qubits must compile to ZERO ppermutes
    (the routed path would otherwise exchange full blocks whose cross
    coefficients are statically zero)."""
    n = 5  # 3 global (8-device mesh) + 2 local
    b = ir.CircuitBuilder(n)
    b.rz(0, "a")          # global 1q diag
    b.zp(1, "b")          # global 1q diag
    b.cz(0, 2, "c")       # global-global 2q diag
    b.cz(1, 4, "d")       # global-local 2q diag
    b.add(ir.ZZP, [2, 3], "e")  # global-local 2q diag
    circuit = b.build()
    values = jnp.asarray([0.3, 0.7, 1.1, -0.4, 0.9], jnp.float32)

    fn = jax.jit(
        lambda v: sharded_sv.simulate_sharded(circuit, v, state_mesh))
    hlo = fn.lower(values).compile().as_text()
    assert "collective-permute" not in hlo
    # And it still matches the dense engine.
    dense = sv.simulate(circuit, values).reshape(-1)
    got = np.asarray(fn(values)).reshape(-1)
    np.testing.assert_allclose(got, np.asarray(dense), atol=ATOL)


class TestShardedFuzz:
  """Randomized sharded-vs-dense equivalence: random circuits over every
  gate kind (incl. diag/global routing mixes and PROT strings) and random
  observables must match the dense engine in value AND gradient.  Seeded,
  so failures reproduce."""

  @pytest.mark.slow
  @pytest.mark.parametrize("n,seed", [(4, 101), (5, 102), (5, 103), (6, 104)])
  def test_random_circuit_matches_dense(self, state_mesh, n, seed):
    from tests.ops.test_statevector import random_circuit
    rng = np.random.RandomState(seed)
    circuit = random_circuit(n, depth=2, seed=seed)
    values = jnp.asarray(rng.uniform(-2, 2, circuit.num_symbols), jnp.float32)
    terms = [(float(rng.uniform(-1, 1)),
              {int(q): "XYZ"[rng.randint(3)]
               for q in rng.choice(n, rng.randint(1, 3), replace=False)})
             for _ in range(4)]
    ops = (paulis.pauli_sum_from_strings(n, terms),)
    bits = jnp.asarray(rng.randint(0, 2, (3, n)), jnp.int8)

    sharded_state = sharded_sv.simulate_sharded(circuit, values, state_mesh)
    dense_state = sv.simulate(circuit, values).reshape(-1)
    np.testing.assert_allclose(np.asarray(sharded_state),
                               np.asarray(dense_state), atol=ATOL)

    def loss(fn):
      return lambda v: jnp.sum(fn(circuit, v, bits, ops))

    dense_fn = loss(adjoint.batched_expectations)
    sharded_fn = loss(lambda c, v, b, o: sharded_sv.batched_expectations(
        c, v, b, o, state_mesh))
    vd, gd = jax.value_and_grad(dense_fn)(values)
    vs, gs = jax.value_and_grad(sharded_fn)(values)
    np.testing.assert_allclose(float(vs), float(vd), atol=ATOL)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gd), atol=ATOL)


class TestShardedExpectation:

  def _setup(self, n, seed=3):
    circuit = _rich_circuit(n)
    values = jax.random.uniform(jax.random.PRNGKey(seed),
                                [circuit.num_symbols]) * 2.0
    key = jax.random.PRNGKey(seed + 1)
    ops = (
        paulis.pauli_sum_from_strings(
            n, [(0.7, {0: "Z"}), (-1.3, {0: "X", 1: "X"})]),
        paulis.pauli_sum_from_strings(
            n, [(float(c), {q: "Z", (q + 1) % n: "Z"})
                for q, c in enumerate(np.linspace(-1, 1, n))]),
    )
    bits = jax.random.bernoulli(key, 0.5, [6, n]).astype(jnp.int8)
    return circuit, values, bits, ops

  def test_values_match_dense(self, state_mesh):
    circuit, values, bits, ops = self._setup(5)
    dense = adjoint.batched_expectations(circuit, values, bits, ops)
    sharded = sharded_sv.batched_expectations(circuit, values, bits, ops,
                                              state_mesh)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense),
                               atol=ATOL)

  def test_gradients_match_dense(self, state_mesh):
    circuit, values, bits, ops = self._setup(4)

    def loss_dense(v):
      return jnp.sum(adjoint.batched_expectations(circuit, v, bits, ops))

    def loss_sharded(v):
      return jnp.sum(
          sharded_sv.batched_expectations(circuit, v, bits, ops, state_mesh))

    gd = jax.grad(loss_dense)(values)
    gs = jax.grad(loss_sharded)(values)
    assert float(jnp.max(jnp.abs(gd))) > 1e-3  # non-trivial gradient guard
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gd), atol=ATOL)

  def test_coefficient_gradients_match_dense(self, state_mesh):
    circuit, values, bits, ops = self._setup(4)
    op = ops[1]

    def loss_dense(c):
      o = paulis.PauliSum(op.codes, c, op.num_qubits)
      return jnp.sum(adjoint.batched_expectations(circuit, values, bits,
                                                  (o,)))

    def loss_sharded(c):
      o = paulis.PauliSum(op.codes, c, op.num_qubits)
      return jnp.sum(
          sharded_sv.batched_expectations(circuit, values, bits, (o,),
                                          state_mesh))

    gd = jax.grad(loss_dense)(op.coeffs)
    gs = jax.grad(loss_sharded)(op.coeffs)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gd), atol=ATOL)

  def test_data_parallel_matches(self, mixed_mesh):
    """2x4 mesh: batch split over 'data', state over 'state'; batch size not
    divisible by the data axis exercises the padding path."""
    circuit, values, bits, ops = self._setup(4, seed=7)
    bits = bits[:5]  # 5 % 2 != 0 -> padding
    dense = adjoint.batched_expectations(circuit, values, bits, ops)
    sharded = sharded_sv.batched_expectations(circuit, values, bits, ops,
                                              mixed_mesh, data_axis="data")
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense),
                               atol=ATOL)


class TestShardedQuantumInference:

  def test_vqt_matches_single_device(self, mixed_mesh):
    """End-to-end: the full VQT loss + gradients through a QHBM built on
    ShardedQuantumInference match the single-device AnalyticQuantumInference
    stack exactly (same seeds, exact=True EBM)."""
    n = 4
    key = jax.random.PRNGKey(11)
    energy = models.BernoulliEnergy(list(range(n)))
    e_inf = ebm.AnalyticEnergyInference(energy, 128, initial_seed=5,
                                        exact=True)
    pqc = circuit_utils.hardware_efficient_ansatz(n, 2)
    circuit = models.DirectQuantumCircuit(pqc)

    q_dense = qnn.AnalyticQuantumInference(circuit)
    q_shard = parallel.ShardedQuantumInference(circuit, mixed_mesh)

    target = paulis.pauli_sum_from_strings(
        n, [(1.0, {q: "X"}) for q in range(n)] +
        [(-1.0, {q: "Z", q + 1: "Z"}) for q in range(n - 1)])
    beta = jnp.asarray(1.3, jnp.float32)

    losses = {}
    grads = {}
    for tag, q_inf in [("dense", q_dense), ("sharded", q_shard)]:
      h = qhbm.QHBM(e_inf, q_inf)
      loss_fn = vqt_loss.make_vqt(h, target)
      params = h.params

      def scalar_loss(p):
        val, _ = loss_fn(p, key, beta)
        return val

      losses[tag] = scalar_loss(params)
      grads[tag] = jax.grad(scalar_loss)(params)

    np.testing.assert_allclose(float(losses["sharded"]),
                               float(losses["dense"]), atol=ATOL)
    flat_d = jax.tree_util.tree_leaves(grads["dense"])
    flat_s = jax.tree_util.tree_leaves(grads["sharded"])
    assert max(float(jnp.max(jnp.abs(g))) for g in flat_d) > 1e-4
    for gd, gs in zip(flat_d, flat_s):
      np.testing.assert_allclose(np.asarray(gs), np.asarray(gd), atol=ATOL)
