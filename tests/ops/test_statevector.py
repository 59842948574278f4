"""Tests for the statevector engine against a dense numpy oracle.

The reference cross-checks its simulator against `cirq.Simulator`
(reference: tests/inference/qnn_test.py:183-264); since this framework has no
cirq dependency, the oracle here is exact dense linear algebra built from
numpy krons, with cirq's gate/ordering conventions hand-coded.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qhbmlib_tpu.ops import adjoint, circuit_ir as ir, paulis, shift
from qhbmlib_tpu.ops import statevector as sv

RNG = np.random.RandomState(42)

I2 = np.eye(2, dtype=np.complex128)
PX = np.array([[0, 1], [1, 0]], dtype=np.complex128)
PY = np.array([[0, -1j], [1j, 0]], dtype=np.complex128)
PZ = np.array([[1, 0], [0, -1]], dtype=np.complex128)
PH = np.array([[1, 1], [1, -1]], dtype=np.complex128) / np.sqrt(2)


def dense_power(mat, t):
  """cirq-convention G**t for involution G."""
  dim = mat.shape[0]
  return np.exp(1j * np.pi * t / 2) * (
      np.cos(np.pi * t / 2) * np.eye(dim) - 1j * np.sin(np.pi * t / 2) * mat)


def embed(mat, qubits, n):
  """Embeds a k-qubit dense matrix acting on `qubits` into n qubits."""
  k = len(qubits)
  mat_t = mat.reshape((2,) * (2 * k))
  full = np.eye(2**n, dtype=np.complex128).reshape((2,) * (2 * n))
  # Apply mat to columns: treat full as state batch over output index.
  out = np.tensordot(mat_t, full, axes=(tuple(range(k, 2 * k)), qubits))
  out = np.moveaxis(out, tuple(range(k)), qubits)
  return out.reshape(2**n, 2**n)


def oracle_gate(gate: ir.Gate, angle: float, n: int) -> np.ndarray:
  if gate.kind == ir.RX:
    m = np.cos(angle / 2) * I2 - 1j * np.sin(angle / 2) * PX
  elif gate.kind == ir.RY:
    m = np.cos(angle / 2) * I2 - 1j * np.sin(angle / 2) * PY
  elif gate.kind == ir.RZ:
    m = np.cos(angle / 2) * I2 - 1j * np.sin(angle / 2) * PZ
  elif gate.kind == ir.XP:
    m = dense_power(PX, angle)
  elif gate.kind == ir.YP:
    m = dense_power(PY, angle)
  elif gate.kind == ir.ZP:
    m = np.diag([1.0, np.exp(1j * np.pi * angle)])
  elif gate.kind == ir.HP:
    m = dense_power(PH, angle)
  elif gate.kind == ir.CZP:
    m = np.diag([1.0, 1.0, 1.0, np.exp(1j * np.pi * angle)])
  elif gate.kind == ir.CXP:
    m = np.block([[I2, np.zeros((2, 2))],
                  [np.zeros((2, 2)), dense_power(PX, angle)]])
  elif gate.kind == ir.XXP:
    m = dense_power(np.kron(PX, PX), angle)
  elif gate.kind == ir.YYP:
    m = dense_power(np.kron(PY, PY), angle)
  elif gate.kind == ir.ZZP:
    m = dense_power(np.kron(PZ, PZ), angle)
  elif gate.kind == ir.PROT:
    p = np.eye(1, dtype=np.complex128)
    full = {q: c for q, c in zip(gate.qubits, gate.paulis)}
    mats = {1: PX, 2: PY, 3: PZ}
    for q in range(n):
      p = np.kron(p, mats[full[q]] if q in full else I2)
    return (np.cos(angle) * np.eye(2**n) - 1j * np.sin(angle) * p)
  elif gate.kind == ir.GPHASE:
    return np.exp(1j * angle) * np.eye(2**n, dtype=np.complex128)
  else:
    raise ValueError(gate.kind)
  return embed(m, gate.qubits, n)


def oracle_unitary(circuit: ir.Circuit, values: np.ndarray) -> np.ndarray:
  n = circuit.num_qubits
  u = np.eye(2**n, dtype=np.complex128)
  for g in circuit.gates:
    angle = g.shift if g.slot < 0 else g.coeff * values[g.slot] + g.shift
    u = oracle_gate(g, angle, n) @ u
  return u


def random_circuit(n, depth, seed=0):
  rng = np.random.RandomState(seed)
  b = ir.CircuitBuilder(n)
  kinds_1q = [ir.XP, ir.YP, ir.ZP, ir.HP, ir.RX, ir.RY, ir.RZ]
  kinds_2q = [ir.CZP, ir.CXP, ir.XXP, ir.YYP, ir.ZZP]
  s = 0
  for _ in range(depth):
    for q in range(n):
      b.add(kinds_1q[rng.randint(len(kinds_1q))], [q], f"s{s}",
            coeff=float(rng.uniform(0.5, 1.5)), shift=float(rng.uniform(-1, 1)))
      s += 1
    if n >= 2:
      q0, q1 = rng.choice(n, 2, replace=False)
      b.add(kinds_2q[rng.randint(len(kinds_2q))], [int(q0), int(q1)], f"s{s}")
      s += 1
    if n >= 2 and rng.rand() < 0.5:
      qs = sorted(rng.choice(n, 2, replace=False))
      b.prot([int(qs[0]), int(qs[1])],
             [int(rng.randint(1, 4)), int(rng.randint(1, 4))], f"s{s}")
      s += 1
  return b.build()


@pytest.mark.parametrize("n,depth,seed", [(1, 3, 0), (2, 3, 1), (3, 2, 2),
                                          (4, 2, 3)])
def test_unitary_matches_oracle(n, depth, seed):
  circuit = random_circuit(n, depth, seed)
  values = jnp.asarray(RNG.uniform(-2, 2, circuit.num_symbols), jnp.float32)
  actual = np.asarray(sv.unitary(circuit, values))
  expected = oracle_unitary(circuit, np.asarray(values))
  np.testing.assert_allclose(actual, expected, atol=1e-5)


@pytest.mark.parametrize("n", [1, 2, 3])
def test_simulate_from_bits(n):
  circuit = random_circuit(n, 2, seed=n)
  values = jnp.asarray(RNG.uniform(-2, 2, circuit.num_symbols), jnp.float32)
  u = oracle_unitary(circuit, np.asarray(values))
  bits = sv.all_bitstrings(n)
  states = sv.simulate_from_bits(circuit, values, jnp.asarray(bits))
  for i in range(2**n):
    np.testing.assert_allclose(
        np.asarray(states[i]).reshape(-1), u[:, i], atol=1e-5)


def test_ir_bounds_validated_on_every_construction_path():
  """Out-of-range qubits/slots/arity must fail at construction: past the IR
  they index simulator state and packed native arrays out of bounds (the C
  oracle heap-corrupts, not raises)."""
  with pytest.raises(ValueError, match="has 2 qubits"):
    ir.Circuit.from_dict({"num_qubits": 2, "symbol_names": [],
                          "gates": [{"kind": ir.XP, "qubits": [2]}]})
  with pytest.raises(ValueError, match="symbol slot"):
    ir.Circuit(1, (ir.Gate(ir.RX, (0,), slot=3),), ("a",))
  with pytest.raises(ValueError, match="takes 1 qubit"):
    ir.Gate(ir.RX, (0, 1))
  with pytest.raises(ValueError, match="takes 2 qubits"):
    ir.Gate(ir.CZP, (0,))
  with pytest.raises(ValueError, match="non-negative"):
    ir.Gate(ir.RX, (-1,))
  # Duplicate qubits and unknown kinds must also fail on direct/from_dict
  # construction (a duplicate PROT qubit silently overwrites its pauli code
  # slot; an unknown kind only exploded at simulation time).
  with pytest.raises(ValueError, match="distinct"):
    ir.Gate(ir.PROT, (0, 0), paulis=(1, 1))
  with pytest.raises(ValueError, match="distinct"):
    ir.Gate(ir.ZZP, (1, 1))
  with pytest.raises(ValueError, match="unknown gate kind"):
    ir.Gate("xx", (0, 1))
  # A non-trivial coeff on a constant (symbol-less) builder gate is
  # silently ignored by resolve_angle -- the builder rejects it.
  with pytest.raises(ValueError, match="constant gate"):
    ir.CircuitBuilder(2).rx(0, coeff=0.5)
  # The deliberate constant forms stay legal.
  ir.CircuitBuilder(2).cz(0, 1).h(0).rx(1, shift=0.3).build()


def test_pauli_sum_validation_and_small_tfim():
  from qhbmlib_tpu.ops import paulis as paulis_lib
  # Negative qubit indices must not silently wrap onto the last qubit.
  with pytest.raises(ValueError, match="out of range"):
    paulis_lib.pauli_sum_from_strings(4, [(1.0, {-1: "Z"})])
  # PauliSum equality must not raise on multi-term operators (the default
  # dataclass __eq__ compared the coeffs array -> ambiguous-truth error).
  a, b = paulis_lib.tfim_1d(4), paulis_lib.tfim_1d(4)
  assert (a == b) is False and (a == a) is True  # identity semantics
  assert a in [a]
  # Periodic wrap bond only exists for n > 2: n=2 must not double-count the
  # single bond, n=1 has no bond at all.
  p2 = paulis_lib.tfim_1d(2, periodic=True)
  zz_rows = [c for c in p2.codes if c.count(paulis_lib.Z) == 2]
  assert len(zz_rows) == 1
  p1 = paulis_lib.tfim_1d(1, periodic=True)
  assert all(paulis_lib.Z not in c for c in p1.codes)
  np.testing.assert_allclose(np.asarray(p2.dense()),
                             np.asarray(paulis_lib.tfim_1d(2).dense()))
  # Zero-term operators evaluate to an empty vector, not a stack() crash.
  empty = paulis_lib.PauliSum(codes=(), coeffs=jnp.zeros([0]), num_qubits=3)
  state = sv.zero_state(3)
  assert sv.expectation_terms(state, empty).shape == (0,)


def test_oracle_rejects_malformed_bits():
  if not __import__("qhbmlib_tpu.ops.native_oracle",
                    fromlist=["available"]).available():
    pytest.skip("native oracle unavailable")
  from qhbmlib_tpu.ops import native_oracle
  circuit = ir.CircuitBuilder(2).rx(0, "a").build()
  with pytest.raises(ValueError, match="entries for 2 qubits"):
    native_oracle.simulate(circuit, np.asarray([0.3]), bits=[1, 1, 1])
  with pytest.raises(ValueError, match="0/1"):
    native_oracle.simulate(circuit, np.asarray([0.3]), bits=[2, 0])


def test_circuit_json_roundtrip():
  """IR persistence (the reference serializes circuits via cirq protos,
  reference models/circuit.py:63): to_json/from_json is an exact inverse,
  including PROT pauli codes, shared slots, and constant gates."""
  circuit = random_circuit(4, depth=3, seed=77)
  circuit = circuit.append(ir.CircuitBuilder(4).cz(0, 1).build())  # constant
  restored = ir.Circuit.from_json(circuit.to_json())
  assert restored == circuit  # frozen dataclasses: exact structural equality
  values = jnp.asarray(RNG.uniform(-1, 1, circuit.num_symbols), jnp.float32)
  np.testing.assert_array_equal(
      np.asarray(sv.to_vector(sv.simulate(restored, values))),
      np.asarray(sv.to_vector(sv.simulate(circuit, values))))


def test_prot_gate_pauli_alignment_validated():
  """A PROT gate with misaligned pauli codes must fail on EVERY construction
  path -- the engines index codes positionally against qubits, so a silent
  mismatch would desynchronize the JAX engine and the native oracle."""
  with pytest.raises(ValueError, match="one pauli code per qubit"):
    ir.Gate(kind=ir.PROT, qubits=(0, 1, 2), paulis=(1, 2))
  with pytest.raises(ValueError, match="one pauli code per qubit"):
    ir.CircuitBuilder(3).prot((0, 1, 2), (paulis.X, paulis.Y))
  with pytest.raises(ValueError, match="1=X, 2=Y, 3=Z"):
    ir.Gate(kind=ir.PROT, qubits=(0,), paulis=(4,))
  with pytest.raises(ValueError, match="only apply to prot"):
    ir.Gate(kind=ir.RX, qubits=(0,), paulis=(1,))


def test_append_and_inverse():
  c1 = random_circuit(2, 2, seed=10)
  c2 = random_circuit(2, 1, seed=11)
  # Rename c2 symbols to be disjoint.
  c2 = ir.Circuit(c2.num_qubits, c2.gates,
                  tuple(f"other_{s}" for s in c2.symbol_names))
  combined = c1.append(c2)
  v1 = RNG.uniform(-1, 1, c1.num_symbols)
  v2 = RNG.uniform(-1, 1, c2.num_symbols)
  values = jnp.asarray(np.concatenate([v1, v2]), jnp.float32)
  u = np.asarray(sv.unitary(combined, values))
  expected = oracle_unitary(c2, v2) @ oracle_unitary(c1, v1)
  np.testing.assert_allclose(u, expected, atol=1e-5)

  inv = combined.inverse()
  u_inv = np.asarray(sv.unitary(inv, values))
  np.testing.assert_allclose(u_inv @ expected, np.eye(4), atol=1e-5)


def test_shared_symbols_append_remaps_slots():
  b1 = ir.CircuitBuilder(1)
  b1.rx(0, "a")
  b2 = ir.CircuitBuilder(1)
  b2.rx(0, "a").rx(0, "b")
  combined = b1.build().append(b2.build())
  assert combined.symbol_names == ("a", "b")
  values = jnp.asarray([0.7, 0.3], jnp.float32)
  u = np.asarray(sv.unitary(combined, values))
  expected = oracle_unitary(
      b2.build(), np.asarray([0.7, 0.3])) @ oracle_unitary(
      b1.build(), np.asarray([0.7]))
  np.testing.assert_allclose(u, expected, atol=1e-5)


def test_pauli_sum_expectation_matches_dense():
  n = 3
  circuit = random_circuit(n, 2, seed=5)
  values = jnp.asarray(RNG.uniform(-2, 2, circuit.num_symbols), jnp.float32)
  op = paulis.pauli_sum_from_strings(
      n, [(0.5, {0: "X", 1: "Y"}), (-1.2, {2: "Z"}),
          (0.7, {0: "Z", 1: "Z", 2: "X"})])
  state = sv.simulate(circuit, values)
  actual = float(sv.expectation(state, op))
  psi = np.asarray(state).reshape(-1)
  expected = np.real(psi.conj() @ np.asarray(op.dense(), np.complex128) @ psi)
  np.testing.assert_allclose(actual, expected, atol=1e-5)


def test_sampling_statistics():
  n = 2
  b = ir.CircuitBuilder(n)
  b.ry(0, "t0").ry(1, "t1")
  circuit = b.build()
  values = jnp.asarray([0.9, 2.1], jnp.float32)
  state = sv.simulate(circuit, values)
  probs = np.asarray(sv.probabilities(state))
  samples = sv.sample_bitstrings(jax.random.PRNGKey(7), state, 200000)
  idx = np.asarray(samples) @ np.asarray([2, 1])
  hist = np.bincount(idx, minlength=4) / 200000.0
  np.testing.assert_allclose(hist, probs, atol=5e-3)
  # Seeded determinism.
  samples2 = sv.sample_bitstrings(jax.random.PRNGKey(7), state, 100)
  samples3 = sv.sample_bitstrings(jax.random.PRNGKey(7), state, 100)
  np.testing.assert_array_equal(np.asarray(samples2), np.asarray(samples3))


class TestGradients:
  """Adjoint and parameter-shift gradients vs autodiff and stencil."""

  def _setup(self, n=3, depth=2, seed=3):
    circuit = random_circuit(n, depth, seed)
    values = jnp.asarray(RNG.uniform(-1, 1, circuit.num_symbols), jnp.float32)
    terms = [(1.0, {0: "Z"}), (0.5, {0: "X", 1 % n: "X"})]
    if n >= 3:
      terms.append((-0.8, {1: "Y", 2: "Z"}))
    op = paulis.pauli_sum_from_strings(n, terms)
    return circuit, values, op

  def test_adjoint_matches_autodiff(self):
    circuit, values, op = self._setup()
    init = sv.zero_state(circuit.num_qubits)

    def f_adj(v):
      return adjoint.expectation(circuit, v, init, op)

    def f_auto(v):
      state = sv.apply_circuit(circuit, v, init)
      return sv.expectation(state, op)

    np.testing.assert_allclose(float(f_adj(values)), float(f_auto(values)),
                               atol=1e-5)
    g_adj = jax.grad(f_adj)(values)
    g_auto = jax.grad(f_auto)(values)
    np.testing.assert_allclose(np.asarray(g_adj), np.asarray(g_auto),
                               atol=1e-4)

  def test_adjoint_mixed_constant_diag_segment(self):
    """Fused diag segments mixing constant entanglers (slot < 0, e.g. a CZ
    brick) with parameterized RZ/ZZP gates: the backward contracts parity
    factors of ONLY the parameterized gates (the constant gates' factors
    are dropped before the chunked bilinear -- a 28q perf property), and
    the gradient still matches autodiff; a segment with zero parameterized
    gates exercises the skip-entirely branch."""
    n = 9
    gates = [ir.Gate(ir.RX, (q,), q, 1.0, 0.0) for q in range(n)]
    gates += [ir.Gate(ir.CZP, (q, q + 1), -1, 0.0, 1.0) for q in range(n - 1)]
    gates.append(ir.Gate(ir.RZ, (3,), n, 1.0, 0.0))
    gates.append(ir.Gate(ir.ZZP, (2, 7), n + 1, 1.0, 0.0))
    circuit = ir.Circuit(n, tuple(gates),
                         tuple(f"s{i}" for i in range(n + 2)))
    values = jnp.asarray(RNG.uniform(-1, 1, n + 2), jnp.float32)
    op = paulis.tfim_1d(n)
    init = sv.zero_state(n)

    def f_adj(v):
      return adjoint.expectation(circuit, v, init, op)

    def f_auto(v):
      return sv.expectation(sv.apply_circuit(circuit, v, init), op)

    np.testing.assert_allclose(np.asarray(jax.grad(f_adj)(values)),
                               np.asarray(jax.grad(f_auto)(values)),
                               atol=1e-4)

    # All-constant diag segment: no gradient factors at all, but the
    # segment un-apply must still be exact for gates before/after it.
    gates2 = [ir.Gate(ir.RX, (q,), q, 1.0, 0.0) for q in range(n)]
    gates2 += [ir.Gate(ir.CZP, (q, q + 1), -1, 0.0, 1.0)
               for q in range(n - 1)]
    gates2.append(ir.Gate(ir.RX, (0,), n, 1.0, 0.0))
    circuit2 = ir.Circuit(n, tuple(gates2),
                          tuple(f"t{i}" for i in range(n + 1)))
    v2 = values[:n + 1]
    g_adj = jax.grad(lambda v: adjoint.expectation(circuit2, v, init, op))(v2)
    g_auto = jax.grad(lambda v: sv.expectation(
        sv.apply_circuit(circuit2, v, init), op))(v2)
    np.testing.assert_allclose(np.asarray(g_adj), np.asarray(g_auto),
                               atol=1e-4)

  def test_adjoint_coeff_gradients(self):
    circuit, values, op = self._setup()
    init = sv.zero_state(circuit.num_qubits)

    def f(coeffs):
      op2 = paulis.PauliSum(op.codes, coeffs, op.num_qubits)
      return adjoint.expectation(circuit, values, init, op2)

    g = jax.grad(f)(op.coeffs)
    # dE/dc_t = <P_t>
    state = sv.apply_circuit(circuit, values, init)
    expected = np.asarray(sv.expectation_terms(state, op))
    np.testing.assert_allclose(np.asarray(g), expected, atol=1e-5)

  def test_parameter_shift_matches_autodiff(self):
    circuit, values, op = self._setup(seed=8)
    init = sv.zero_state(circuit.num_qubits)

    def eval_fn(offsets):
      state = sv.apply_circuit(circuit, values, init, angle_offsets=offsets)
      return sv.expectation(state, op)

    g_shift = shift.shift_gradient(circuit, eval_fn, circuit.num_symbols)

    def f_auto(v):
      state = sv.apply_circuit(circuit, v, init)
      return sv.expectation(state, op)

    g_auto = jax.grad(f_auto)(values)
    np.testing.assert_allclose(np.asarray(g_shift), np.asarray(g_auto),
                               atol=1e-4)

  def test_parameter_shift_chunked_matches_unchunked(self, monkeypatch):
    """QHBM_SHIFT_CHUNK bounds concurrent shifted simulations; a chunk that
    does not divide 2P exercises the zero-offset padding path."""
    circuit, values, op = self._setup(seed=8)
    init = sv.zero_state(circuit.num_qubits)

    def eval_fn(offsets):
      state = sv.apply_circuit(circuit, values, init, angle_offsets=offsets)
      return sv.expectation(state, op)

    monkeypatch.setenv("QHBM_SHIFT_CHUNK", "3")
    g_chunked = shift.shift_gradient(circuit, eval_fn, circuit.num_symbols)
    monkeypatch.delenv("QHBM_SHIFT_CHUNK")
    g_full = shift.shift_gradient(circuit, eval_fn, circuit.num_symbols)
    np.testing.assert_allclose(np.asarray(g_chunked), np.asarray(g_full),
                               atol=1e-6)

  def test_batched_expectations_grad(self):
    circuit, values, op = self._setup(n=2, depth=1, seed=9)
    shard0 = paulis.pauli_string(2, {0: "Z"})
    shard1 = paulis.pauli_string(2, {1: "Z"})
    bits = jnp.asarray([[0, 0], [1, 0], [1, 1]], jnp.int8)

    def f(v):
      e = adjoint.batched_expectations(circuit, v, bits, (shard0, shard1))
      return jnp.sum(e * jnp.asarray([[1.0, -0.5]]))

    def f_auto(v):
      states = sv.simulate_from_bits(circuit, v, bits)
      outs = []
      for i in range(3):
        outs.append(jnp.stack([sv.expectation(states[i], shard0),
                               sv.expectation(states[i], shard1)]))
      return jnp.sum(jnp.stack(outs) * jnp.asarray([[1.0, -0.5]]))

    np.testing.assert_allclose(float(f(values)), float(f_auto(values)),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(jax.grad(f)(values)),
                               np.asarray(jax.grad(f_auto)(values)), atol=1e-4)


def test_exp_pauli_sum_trotter():
  """exp(-i t H) for commuting H matches expm."""
  n = 2
  h = paulis.pauli_sum_from_strings(n, [(0.7, {0: "Z", 1: "Z"}),
                                        (-0.3, {0: "Z"})])
  circuit = ir.exp_pauli_sum(h, symbol="t")
  t = 0.37
  u = np.asarray(sv.unitary(circuit, jnp.asarray([t], jnp.float32)))
  from scipy.linalg import expm
  expected = expm(-1j * t * np.asarray(h.dense(), np.complex128))
  np.testing.assert_allclose(u, expected, atol=1e-5)


def test_batched_expectations_chunked_matches_unchunked():
  """The lax.map chunked batch path is numerically identical to plain vmap."""
  circuit = random_circuit(3, 2, seed=12)
  values = jnp.asarray(RNG.uniform(-1, 1, circuit.num_symbols), jnp.float32)
  ops = (paulis.pauli_string(3, {0: "Z"}),
         paulis.pauli_string(3, {1: "X", 2: "Z"}))
  bits = jnp.asarray(sv.all_bitstrings(3)[:5])

  full = adjoint.batched_expectations(circuit, values, bits, ops,
                                      batch_chunk=16)
  chunked = adjoint.batched_expectations(circuit, values, bits, ops,
                                         batch_chunk=2)
  np.testing.assert_allclose(np.asarray(chunked), np.asarray(full), atol=1e-6)

  def loss(v, chunk):
    return jnp.sum(
        adjoint.batched_expectations(circuit, v, bits, ops,
                                     batch_chunk=chunk))

  g_full = jax.grad(lambda v: loss(v, 16))(values)
  g_chunk = jax.grad(lambda v: loss(v, 2))(values)
  np.testing.assert_allclose(np.asarray(g_chunk), np.asarray(g_full),
                             atol=1e-5)


def test_jit_toggle_on_simulator():
  """Engine behaves identically eagerly and under jit (reference
  eager_mode_toggle contract)."""
  import tests.test_util as test_util
  circuit = random_circuit(3, 2, seed=13)
  values = jnp.asarray(RNG.uniform(-1, 1, circuit.num_symbols), jnp.float32)
  op = paulis.pauli_sum_from_strings(3, [(0.5, {0: "Z"}), (1.0, {1: "X"})])

  @test_util.jit_toggle
  def run():
    state = sv.simulate(circuit, values)
    return sv.expectation(state, op)

  run()


class TestPlanarMatmuls:
  """QHBM_PLANAR_MATMUL: planar (re, im) 4-real-dot decomposition of the
  state-sized complex contractions (measured 1.70x faster than XLA's
  complex lowering at bf16 'default' precision on TPU; see
  benchmarks/RESULTS.md round-3 correction).  Must be bit-compatible with
  the complex path up to matmul rounding on every contraction site."""

  def _circuit(self, n=10, layers=2):
    from qhbmlib_tpu.models import circuit_utils
    return circuit_utils.hardware_efficient_ansatz(n, layers)

  def test_forward_expectations_and_adjoint_match(self, monkeypatch):
    from qhbmlib_tpu.ops import adjoint, paulis
    monkeypatch.setenv("QHBM_MATMUL_PRECISION", "high")
    n = 10
    circ = self._circuit(n)
    vals = jnp.asarray(
        np.random.RandomState(3).uniform(0, 2, circ.num_symbols),
        jnp.float32)
    op = paulis.tfim_1d(n)
    bits = jnp.asarray(
        np.random.RandomState(4).randint(0, 2, (3, n)), jnp.int8)

    def measure():
      def f(v):
        return jnp.sum(adjoint.batched_expectations(circ, v, bits, (op,)))
      return jax.value_and_grad(jax.jit(f))(vals)

    monkeypatch.setenv("QHBM_PLANAR_MATMUL", "0")
    val0, grad0 = measure()
    monkeypatch.setenv("QHBM_PLANAR_MATMUL", "1")
    val1, grad1 = measure()
    np.testing.assert_allclose(float(val0), float(val1), atol=5e-5)
    np.testing.assert_allclose(np.asarray(grad0), np.asarray(grad1),
                               atol=5e-4)

  def test_primitive_sites_match(self, monkeypatch):
    """apply_row_block / apply_minor_mat / block_transition / cross_gram
    each match their complex lowering on random states."""
    monkeypatch.setenv("QHBM_MATMUL_PRECISION", "high")
    rng = np.random.default_rng(7)
    n = 11
    r, c = 2**(n - 7), 128
    state = rng.standard_normal((r, c)) + 1j * rng.standard_normal((r, c))
    state = jnp.asarray(state / np.linalg.norm(state), sv.COMPLEX_DTYPE)
    lam = rng.standard_normal((r, c)) + 1j * rng.standard_normal((r, c))
    lam = jnp.asarray(lam / np.linalg.norm(lam), sv.COMPLEX_DTYPE)
    u = np.linalg.qr(rng.standard_normal((16, 16)) +
                     1j * rng.standard_normal((16, 16)))[0]
    u16 = jnp.asarray(u, sv.COMPLEX_DTYPE)
    u128 = jnp.asarray(
        np.linalg.qr(rng.standard_normal((128, 128)) +
                     1j * rng.standard_normal((128, 128)))[0],
        sv.COMPLEX_DTYPE)

    cases = {
        "row_block": lambda: sv.apply_row_block(u16, 0, 4, state),
        "minor_mat": lambda: sv.apply_minor_mat(state, u128),
        "block_transition": lambda: sv.block_transition(lam, state, 0, 4),
        "cross_gram": lambda: sv.cross_gram(lam, state),
    }
    for name, fn in cases.items():
      monkeypatch.setenv("QHBM_PLANAR_MATMUL", "0")
      want = jax.jit(fn)()
      monkeypatch.setenv("QHBM_PLANAR_MATMUL", "1")
      got = jax.jit(fn)()
      np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                 atol=1e-5, err_msg=name)


class TestBf16StatePlanes:
  """QHBM_STATE_DTYPE=bf16: bfloat16 (re, im) planes threaded between a 1q
  segment's chained contractions (opt-in bandwidth mode; see
  statevector._bf16_state_enabled).  Must match the complex path to bf16
  rounding on forward states, expectations, and adjoint gradients."""

  def test_segment_and_adjoint_match_to_bf16_rounding(self, monkeypatch):
    from qhbmlib_tpu.models import circuit_utils
    from qhbmlib_tpu.ops import adjoint, paulis
    # n = 9 keeps multi-row [4, 128] plane blocks (the structure under
    # test) while trimming this test's 5 measure() x 2 compiles -- it was
    # 104s of the fast lane (VERDICT r4 weak #5).
    n = 9
    circ = circuit_utils.hardware_efficient_ansatz(n, 2)
    vals = jnp.asarray(
        np.random.RandomState(5).uniform(0, 2, circ.num_symbols),
        jnp.float32)
    op = paulis.tfim_1d(n)
    bits = jnp.asarray(
        np.random.RandomState(6).randint(0, 2, (3, n)), jnp.int8)

    def measure_state():
      return np.asarray(jax.jit(lambda v: sv.simulate(circ, v))(vals))

    def measure():
      state = measure_state()

      def f(v):
        return jnp.sum(adjoint.batched_expectations(circ, v, bits, (op,)))

      val, grad = jax.value_and_grad(jax.jit(f))(vals)
      return state, float(val), np.asarray(grad)

    # The planes are only honored under 1-pass-bf16 MXU precision (a
    # 'high'/'highest' request must not be silently rounded to 8 mantissa
    # bits); measure both runs at 'default' so the comparison isolates the
    # storage rounding.
    monkeypatch.setenv("QHBM_MATMUL_PRECISION", "default")
    monkeypatch.delenv("QHBM_STATE_DTYPE", raising=False)
    st0, val0, grad0 = measure()
    monkeypatch.setenv("QHBM_STATE_DTYPE", "bf16")
    st1, val1, grad1 = measure()
    # Under a multi-pass precision request the flag is ignored entirely.
    monkeypatch.setenv("QHBM_MATMUL_PRECISION", "highest")
    st_hp = measure_state()  # QHBM_STATE_DTYPE=bf16 still set
    monkeypatch.delenv("QHBM_STATE_DTYPE", raising=False)
    st_hp_ref = measure_state()
    np.testing.assert_array_equal(st_hp, st_hp_ref)
    monkeypatch.setenv("QHBM_MATMUL_PRECISION", "default")
    monkeypatch.setenv("QHBM_STATE_DTYPE", "bf16")
    # bf16 has 8 mantissa bits: ~4e-3 relative per rounding, a few chained.
    np.testing.assert_allclose(st1, st0, atol=5e-2)
    assert np.linalg.norm(st1 - st0) / np.linalg.norm(st0) < 2e-2
    np.testing.assert_allclose(val1, val0, atol=5e-2)
    rel = np.linalg.norm(grad1 - grad0) / max(np.linalg.norm(grad0), 1e-12)
    assert rel < 5e-2, rel
    # And it is OFF by default: the baseline run must be exactly the
    # unmodified complex path (guard against the flag leaking).
    monkeypatch.delenv("QHBM_STATE_DTYPE", raising=False)
    st2 = measure_state()
    np.testing.assert_array_equal(st2, st0)


class TestDiagPhasorFactors:
  """The factored diag phasor (row x col x cross, statevector.py
  diag_segment_phasor_factors) against the materialized [R, C] phase path
  it replaced -- same segment, same angles, same point."""

  def _segment_circuit(self, n):
    """ZP on every qubit + brick-wall CZ: one bond crosses the row/col
    boundary when n > MINOR_MAX."""
    b = ir.CircuitBuilder(n)
    for q in range(n):
      b.zp(q, f"z_{q}")
    for q in range(0, n - 1, 2):
      b.cz(q, q + 1, f"ce_{q}")
    for q in range(1, n - 1, 2):
      b.cz(q, q + 1, f"co_{q}")
    return b.build()

  def _random_state(self, n, seed=3):
    rng = np.random.RandomState(seed)
    st = rng.randn(2**n) + 1j * rng.randn(2**n)
    st /= np.linalg.norm(st)
    r = 2**max(n - sv.MINOR_MAX, 0)
    return jnp.asarray(st.reshape(r, -1).astype(np.complex64))

  @pytest.mark.parametrize("n", [5, 9])
  def test_factored_matches_materialized(self, n, monkeypatch):
    circ = self._segment_circuit(n)
    gates = list(circ.gates)
    k = circ.num_symbols
    values = jnp.linspace(0.2, 1.1, k)
    st = self._random_state(n)

    def apply(vals):
      return sv._apply_diag_segment(gates, [vals[i] for i in range(k)], st)

    monkeypatch.delenv("QHBM_DIAG_PHASOR", raising=False)
    factors = sv.diag_segment_phasor_factors(
        gates, [values[i] for i in range(k)], st.shape)
    if n > sv.MINOR_MAX:
      assert factors is not None and len(factors[2]) >= 1  # boundary bond
    out_fac = np.asarray(jax.jit(apply)(values))
    monkeypatch.setenv("QHBM_DIAG_PHASOR", "materialize")
    out_mat = np.asarray(jax.jit(lambda v: apply(v))(values))
    np.testing.assert_allclose(out_fac, out_mat, atol=2e-6)

  def test_cross_overflow_falls_back(self):
    n = 9  # rows carry qubits 0..1; every (row, col) ZZ pair is a cross
    b = ir.CircuitBuilder(n)
    pairs = [(rq, cq) for rq in (0, 1) for cq in range(2, 7)]
    for i, (rq, cq) in enumerate(pairs):  # 10 crosses > _CROSS_MAX
      b.prot([rq, cq], [3, 3], f"s_{i}")
    circ = b.build()
    gates = list(circ.gates)
    k = circ.num_symbols
    values = jnp.linspace(0.1, 0.9, k)
    st = self._random_state(n, seed=5)
    factors = sv.diag_segment_phasor_factors(
        gates, [values[i] for i in range(k)], st.shape)
    assert factors is None  # falls back to the materialized path
    out = np.asarray(jax.jit(
        lambda v: sv._apply_diag_segment(gates, [v[i] for i in range(k)],
                                         st))(values))
    # materialized fallback still correct vs a direct phase build
    total = np.asarray(jax.jit(
        lambda v: sv.diag_segment_phase(gates, [v[i] for i in range(k)],
                                        st.shape))(values))
    np.testing.assert_allclose(out, np.asarray(st) * np.exp(1j * total),
                               atol=2e-6)

  def test_adjoint_gradient_same_point(self, monkeypatch):
    """value_and_grad through the backward un-apply, factored vs
    materialized, on an XP layer + diag layer circuit crossing the
    row/col boundary."""
    n = 9
    b = ir.CircuitBuilder(n)
    for q in range(n):
      b.xp(q, f"x_{q}")
    for q in range(n):
      b.zp(q, f"z_{q}")
    for q in range(0, n - 1, 2):
      b.cz(q, q + 1, f"ce_{q}")
    for q in range(1, n - 1, 2):
      b.cz(q, q + 1, f"co_{q}")
    circ = b.build()
    op = paulis.tfim_1d(n)
    bits = jnp.zeros([n], jnp.int8)
    values = jnp.linspace(-0.4, 0.8, circ.num_symbols)

    def loss(vals):
      state = sv.basis_state(n, bits)
      terms = adjoint.adjoint_term_expectations(circ, vals, state, op)
      return jnp.sum(jnp.asarray(op.coeffs) * terms)

    monkeypatch.delenv("QHBM_DIAG_PHASOR", raising=False)
    v_fac, g_fac = jax.jit(jax.value_and_grad(loss))(values)
    monkeypatch.setenv("QHBM_DIAG_PHASOR", "materialize")
    v_mat, g_mat = jax.jit(jax.value_and_grad(lambda v: loss(v)))(values)
    np.testing.assert_allclose(float(v_fac), float(v_mat), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_fac), np.asarray(g_mat),
                               atol=1e-4)


class TestPrecisionModes:

  def test_mixed_splits_apply_and_reduction(self, monkeypatch):
    monkeypatch.setenv("QHBM_MATMUL_PRECISION", "mixed")
    assert sv.matmul_precision() == jax.lax.Precision.HIGH
    assert sv.reduction_precision() == jax.lax.Precision.DEFAULT
    # Planar 'auto' is planar at every precision since the round-5
    # re-measurement (it wins at default, mixed, AND high); 0/1 force.
    assert sv._planar_matmuls_enabled(jax.lax.Precision.DEFAULT)
    assert sv._planar_matmuls_enabled(jax.lax.Precision.HIGH)
    monkeypatch.setenv("QHBM_PLANAR_MATMUL", "0")
    assert not sv._planar_matmuls_enabled(jax.lax.Precision.DEFAULT)

  def test_uniform_modes_are_uniform(self, monkeypatch):
    for mode, prec in [("high", jax.lax.Precision.HIGH),
                       ("highest", jax.lax.Precision.HIGHEST),
                       ("default", jax.lax.Precision.DEFAULT)]:
      monkeypatch.setenv("QHBM_MATMUL_PRECISION", mode)
      assert sv.matmul_precision() == prec
      assert sv.reduction_precision() == prec

  def test_mixed_matches_high_closely(self, monkeypatch):
    """Mixed-mode expectation+gradient vs uniform high on a small circuit:
    the 1-pass reductions must stay within bf16-reduction noise."""
    from qhbmlib_tpu.models import circuit_utils
    n = 8
    circ = circuit_utils.hardware_efficient_ansatz(n, 2)
    vals = jnp.asarray(
        np.random.RandomState(3).uniform(0, 2, circ.num_symbols),
        jnp.float32)
    op = paulis.tfim_1d(n)
    bits = jnp.asarray(
        np.random.RandomState(4).randint(0, 2, (2, n)), jnp.int8)

    def vag():
      def f(v):
        return jnp.sum(adjoint.batched_expectations(circ, v, bits, (op,)))
      return jax.value_and_grad(jax.jit(f))(vals)

    monkeypatch.setenv("QHBM_MATMUL_PRECISION", "high")
    val_h, grad_h = vag()
    monkeypatch.setenv("QHBM_MATMUL_PRECISION", "mixed")
    val_m, grad_m = vag()
    assert abs(float(val_m) - float(val_h)) < 5e-3
    rel = (np.linalg.norm(np.asarray(grad_m) - np.asarray(grad_h)) /
           max(np.linalg.norm(np.asarray(grad_h)), 1e-12))
    assert rel < 5e-3, rel


class TestHostResidentConstants:
  """Structural constants captured in jitted closures must be HOST numpy:
  embedding a device-resident jax.Array as an HLO constant forces a
  synchronous device fetch at lowering time that measured 30-176s PER
  CONSTANT over the tunneled TPU backend (benchmarks/RESULTS.md round 5 --
  the entire round-4 'cold compile' regression)."""

  def test_pauli_sum_constructors_stay_numpy(self):
    assert isinstance(paulis.tfim_1d(6).coeffs, np.ndarray)
    assert isinstance(
        paulis.pauli_sum_from_strings(4, [(1.0, {0: "Z"})]).coeffs,
        np.ndarray)
    assert isinstance(paulis.pauli_string(4, {1: "X"}, 0.5).coeffs,
                      np.ndarray)
    a, b = paulis.tfim_1d(4), paulis.pauli_sum_from_strings(
        4, [(0.5, {0: "X"})])
    assert isinstance((a + b).coeffs, np.ndarray)
    assert isinstance((a * 2.0).coeffs, np.ndarray)
    shards = paulis.z_strings_from_masks([[1, 0, 1, 0]], 4)
    assert isinstance(shards[0].coeffs, np.ndarray)
    assert isinstance(paulis.stack_single_term(list(shards) * 2).coeffs,
                      np.ndarray)

  def test_concat_coeffs_preserves_tracers(self):
    """Traced coefficient vectors must still flow (gradients through
    operator coefficients)."""
    import jax

    def f(c):
      combined = paulis.concat_coeffs([c, np.ones(2, np.float32)])
      return jnp.sum(combined)

    g = jax.grad(f)(jnp.ones(3))
    np.testing.assert_allclose(np.asarray(g), np.ones(3), atol=1e-6)

  def test_analytic_ebm_enumeration_is_numpy(self):
    from qhbmlib_tpu import models
    from qhbmlib_tpu.inference import ebm
    e = models.BernoulliEnergy(list(range(4)))
    inf = ebm.BernoulliEnergyInference(e, 16, initial_seed=1)
    assert isinstance(inf._all_bitstrings, np.ndarray)
    inf2 = ebm.AnalyticEnergyInference(
        models.BernoulliEnergy(list(range(4))), 16, initial_seed=1)
    assert isinstance(inf2._all_bitstrings, np.ndarray)
