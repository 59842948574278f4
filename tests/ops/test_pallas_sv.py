"""Pallas whole-circuit forward kernel: interpret-mode validation vs the
dense engine (the TPU execution paths are exercised on hardware via
benchmarks/pallas_bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qhbmlib_tpu.models import circuit_utils
from qhbmlib_tpu.ops import circuit_ir as ir, pallas_sv, paulis
from qhbmlib_tpu.ops import statevector as sv


def _validate(n, layers, seed=3, atol=1e-5):
  pqc = circuit_utils.hardware_efficient_ansatz(n, layers)
  values = jnp.asarray(
      np.random.RandomState(seed).uniform(-1, 1, pqc.num_symbols),
      jnp.float32)
  state = sv.zero_state(n)
  dense = sv.apply_circuit(pqc, values, state)
  pall = pallas_sv.apply_circuit_pallas(pqc, values, state, interpret=True)
  np.testing.assert_allclose(np.asarray(sv.to_vector(pall)),
                             np.asarray(sv.to_vector(dense)), atol=atol)


@pytest.mark.skipif(not pallas_sv.supported(
    circuit_utils.hardware_efficient_ansatz(9, 1)),
                    reason="pallas TPU backend unavailable")
def test_single_layer_matches_dense_interpret():
  _validate(9, 1)


@pytest.mark.skipif(not pallas_sv.supported(
    circuit_utils.hardware_efficient_ansatz(9, 1)),
                    reason="pallas TPU backend unavailable")
def test_multi_layer_matches_dense_interpret():
  """The layered fori_loop kernel (v2 MXU stages) over 3 repeats."""
  _validate(9, 3)


@pytest.mark.skipif(not pallas_sv.supported(
    circuit_utils.hardware_efficient_ansatz(10, 1)),
                    reason="pallas TPU backend unavailable")
def test_two_row_blocks_interpret():
  """n=10 with C=128 gives nr=3 row qubits in one block; n=9..10 exercise
  the single-block path, larger nr needs the second block -- emulate with a
  narrow minor dimension if configured; otherwise this covers block+minor."""
  _validate(10, 2, seed=5)


def test_fused_blocks_minor_apply_interpret():
  """Streamed fused 1q-segment kernel (big-state path) vs the plain
  block-matmul sequence, incl. stage subsets."""
  rng = np.random.default_rng(0)
  n = 16
  r, c = 2**(n - 7), 128
  state = rng.standard_normal((r, c)) + 1j * rng.standard_normal((r, c))
  state = jnp.asarray(state / np.linalg.norm(state), sv.COMPLEX_DTYPE)

  def randu():
    a = rng.standard_normal((2, 2)) + 1j * rng.standard_normal((2, 2))
    q, _ = np.linalg.qr(a)
    return jnp.asarray(q, sv.COMPLEX_DTYPE)

  blocks = sv._row_blocks(n - 7)
  (s1, k1), (s2, k2) = blocks[0], blocks[1]
  majors = {0: randu(), 3: randu(), 6: randu(), 7: randu(), 8: randu()}
  minor = None
  for q in range(3):
    m = np.kron(np.kron(np.eye(2**q), np.asarray(randu())),
                np.eye(2**(7 - q - 1)))
    minor = m if minor is None else m @ minor
  minor = jnp.asarray(minor, sv.COMPLEX_DTYPE)
  m1 = sv._fold_block(majors, s1, k1)
  m2 = sv._fold_block(majors, s2, k2)

  def plain(st, use_m1, use_m2, use_minor):
    if use_m1:
      st = sv.apply_row_block(m1, s1, k1, st)
    if use_m2:
      st = sv.apply_row_block(m2, s2, k2, st)
    if use_minor:
      st = jnp.matmul(st, minor.T, precision=sv.matmul_precision())
    return st

  for use_m1, use_m2, use_minor in ((True, True, True), (True, False, True),
                                    (True, True, False)):
    got = pallas_sv.fused_blocks_minor_apply(
        state, k1, k2, m1 if use_m1 else None, m2 if use_m2 else None,
        minor.T if use_minor else None, interpret=True)
    want = jax.jit(plain, static_argnums=(1, 2, 3))(state, use_m1, use_m2,
                                                    use_minor)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_apply_majors_and_minor_fused_flag_cpu(monkeypatch):
  """With QHBM_FUSED_1Q=1 the shared helper still matches the plain path on
  CPU lowerings (platform_dependent default branch)."""
  monkeypatch.setenv("QHBM_FUSED_1Q", "1")
  rng = np.random.default_rng(1)
  n = 15
  r, c = 2**(n - 7), 128
  state = rng.standard_normal((r, c)) + 1j * rng.standard_normal((r, c))
  state = jnp.asarray(state / np.linalg.norm(state), sv.COMPLEX_DTYPE)
  u = np.linalg.qr(rng.standard_normal((2, 2)) +
                   1j * rng.standard_normal((2, 2)))[0]
  majors = {1: jnp.asarray(u, sv.COMPLEX_DTYPE),
            7: jnp.asarray(u.conj().T, sv.COMPLEX_DTYPE)}
  got = jax.jit(lambda s: sv.apply_majors_and_minor(s, majors, None))(state)
  monkeypatch.setenv("QHBM_FUSED_1Q", "0")
  want = jax.jit(
      lambda s: sv.apply_majors_and_minor(s, majors, None))(state)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


@pytest.mark.skipif(not pallas_sv.supported(
    circuit_utils.hardware_efficient_ansatz(9, 1)),
                    reason="pallas TPU backend unavailable")
def test_batched_matches_dense_interpret(monkeypatch):
  """Grid-over-batch kernel: B basis states through one kernel vs the dense
  engine applied per state."""
  # Hermetic precision: bf16 planes under 'default' cannot meet the f32
  # dense reference at this tolerance.
  monkeypatch.setenv("QHBM_MATMUL_PRECISION", "high")
  n, layers, batch = 9, 3, 5
  pqc = circuit_utils.hardware_efficient_ansatz(n, layers)
  values = jnp.asarray(
      np.random.RandomState(3).uniform(-1, 1, pqc.num_symbols), jnp.float32)
  rng = np.random.RandomState(0)
  bits = jnp.asarray(rng.randint(0, 2, (batch, n)), jnp.int8)
  m = sv.minor_bits(n)
  nr = n - m
  rowcol = jnp.stack([sv.bits_to_index(bits[:, :nr], nr),
                      sv.bits_to_index(bits[:, nr:], m)], axis=1)
  got = pallas_sv.apply_circuit_pallas_batched(pqc, values, rowcol,
                                               interpret=True)
  want = jnp.stack([
      sv.apply_circuit(pqc, values, sv.basis_state(n, bits[i]))
      for i in range(batch)])
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_batched_supported_budget(monkeypatch):
  """The VMEM gate admits the 20q/4L headline shape under the bf16-plane
  ('default' MXU) mode, rejects it under 'high' (f32 planes, measured OOM:
  131.56M > 128M), and rejects 22q outright."""
  if pallas_sv.pltpu is None:
    pytest.skip("pallas TPU backend unavailable")
  monkeypatch.setenv("QHBM_MATMUL_PRECISION", "default")
  assert pallas_sv.batched_supported(
      circuit_utils.hardware_efficient_ansatz(20, 4))
  assert not pallas_sv.batched_supported(
      circuit_utils.hardware_efficient_ansatz(22, 4))
  monkeypatch.setenv("QHBM_MATMUL_PRECISION", "high")
  assert not pallas_sv.batched_supported(
      circuit_utils.hardware_efficient_ansatz(20, 4))


def test_supported_gate_detection():
  assert pallas_sv.supported(
      circuit_utils.hardware_efficient_ansatz(10, 2)) == (
          pallas_sv.pltpu is not None)
  # PROT with X paulis is unsupported
  b = ir.CircuitBuilder(9)
  b.prot((0, 1), (paulis.X, paulis.Y), "t")
  assert not pallas_sv.supported(b.build())
  # too small / too large states
  assert not pallas_sv.supported(circuit_utils.hardware_efficient_ansatz(4, 1))
  assert not pallas_sv.supported(
      circuit_utils.hardware_efficient_ansatz(24, 1))
