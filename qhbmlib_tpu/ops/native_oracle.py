"""ctypes bindings for the native C++ statevector oracle.

Builds native/qsim_oracle.cc on demand (g++, cached next to the source) and
exposes `simulate(circuit, symbol_values, bits=None)` returning a
double-precision numpy statevector.  Used by tests as an independent
cross-simulator check of the JAX engine (the role cirq.Simulator played for
the reference; reference tests/inference/qnn_test.py:183-264) -- the C++
implementation derives its own gate matrices from (kind, angle), so
agreement is meaningful.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from qhbmlib_tpu.ops import circuit_ir as ir

_KIND_TO_ENUM = {
    ir.XP: 0, ir.YP: 1, ir.ZP: 2, ir.HP: 3,
    ir.RX: 4, ir.RY: 5, ir.RZ: 6,
    ir.CZP: 7, ir.CXP: 8,
    ir.XXP: 9, ir.YYP: 10, ir.ZZP: 11,
    ir.PROT: 12, ir.GPHASE: 13,
}

_LIB = None
_BUILD_ERROR = None


def _source_path() -> str:
  return os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
      os.path.abspath(__file__)))), "native", "qsim_oracle.cc")


def _load():
  global _LIB, _BUILD_ERROR
  if _LIB is not None or _BUILD_ERROR is not None:
    return _LIB
  src = _source_path()
  lib_path = os.path.join(os.path.dirname(src), "libqsim_oracle.so")
  try:
    if (not os.path.exists(lib_path) or
        os.path.getmtime(lib_path) < os.path.getmtime(src)):
      # Compile to a process-unique temp name and os.replace (atomic on
      # POSIX): concurrent builders (pytest-xdist workers, the bench
      # watchdog's subprocess children) must never CDLL a half-written .so.
      tmp_path = f"{lib_path}.{os.getpid()}.tmp"
      try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", tmp_path, src],
            check=True, capture_output=True, text=True, timeout=240)
        os.replace(tmp_path, lib_path)
      finally:
        if os.path.exists(tmp_path):
          os.unlink(tmp_path)
    lib = ctypes.CDLL(lib_path)
    lib.simulate_circuit.restype = ctypes.c_int
    _LIB = lib
  except subprocess.CalledProcessError as e:
    # Keep the compiler's diagnostics: the bare CalledProcessError repr
    # hides g++'s stderr, making every skipped oracle test unactionable.
    _BUILD_ERROR = RuntimeError(f"{e}\n--- g++ stderr ---\n{e.stderr}")
  except Exception as e:  # noqa: BLE001
    _BUILD_ERROR = e
  return _LIB


def available() -> bool:
  return _load() is not None


def build_error() -> Optional[Exception]:
  _load()
  return _BUILD_ERROR


def simulate(circuit: ir.Circuit, symbol_values,
             bits=None) -> np.ndarray:
  """U(values)|bits or 0> as a [2^n] complex128 numpy statevector."""
  lib = _load()
  if lib is None:
    raise RuntimeError(f"native oracle unavailable: {_BUILD_ERROR}")
  n = circuit.num_qubits
  values = np.asarray(symbol_values, np.float64)
  num_gates = circuit.num_gates
  kinds = np.zeros(num_gates, np.int32)
  q0 = np.full(num_gates, -1, np.int32)
  q1 = np.full(num_gates, -1, np.int32)
  angles = np.zeros(num_gates, np.float64)
  prot_offsets = np.zeros(num_gates + 1, np.int32)
  prot_qubits = []
  prot_codes = []
  for g, gate in enumerate(circuit.gates):
    kinds[g] = _KIND_TO_ENUM[gate.kind]
    if gate.qubits:
      q0[g] = gate.qubits[0]
    if len(gate.qubits) > 1:
      q1[g] = gate.qubits[1]
    angle = gate.shift if gate.slot < 0 else (
        gate.coeff * float(values[gate.slot]) + gate.shift)
    angles[g] = angle
    prot_offsets[g + 1] = prot_offsets[g]
    if gate.kind == ir.PROT:
      # paulis/qubits alignment + qubit ranges are enforced on every Gate/
      # Circuit construction path (circuit_ir __post_init__).
      prot_qubits.extend(gate.qubits)
      prot_codes.extend(gate.paulis)
      prot_offsets[g + 1] += len(gate.qubits)
  pq = np.asarray(prot_qubits or [0], np.int32)
  pc = np.asarray(prot_codes or [0], np.int32)
  init = 0
  if bits is not None:
    bits = np.asarray(bits).reshape(-1)
    # Validate BEFORE crossing into C: a bad init index is an out-of-bounds
    # write in simulate_circuit (heap corruption, not an exception).
    if bits.shape[0] != n:
      raise ValueError(f"bits has {bits.shape[0]} entries for {n} qubits")
    if np.any((bits != 0) & (bits != 1)):
      raise ValueError(f"bits must be 0/1: {bits}")
    for b in bits:
      init = (init << 1) | int(b)
  dim = 2**n
  out_re = np.zeros(dim, np.float64)
  out_im = np.zeros(dim, np.float64)

  def ptr(arr, typ):
    return arr.ctypes.data_as(ctypes.POINTER(typ))

  rc = lib.simulate_circuit(
      ctypes.c_int(n), ctypes.c_int(num_gates),
      ptr(kinds, ctypes.c_int), ptr(q0, ctypes.c_int), ptr(q1, ctypes.c_int),
      ptr(angles, ctypes.c_double), ptr(prot_offsets, ctypes.c_int),
      ptr(pq, ctypes.c_int), ptr(pc, ctypes.c_int),
      ctypes.c_int64(init),
      ptr(out_re, ctypes.c_double), ptr(out_im, ctypes.c_double))
  if rc != 0:
    raise RuntimeError(f"native oracle failed with code {rc}")
  return out_re + 1j * out_im


def _popcount(x: np.ndarray) -> np.ndarray:
  out = np.zeros_like(x)
  while np.any(x):
    out += x & 1
    x = x >> 1
  return out


def expectation_f64(psi: np.ndarray, op) -> float:
  """<psi|op|psi> in float64 numpy on a flat [2^n] statevector.

  Oracle-side companion to `simulate`: together they give a fully
  double-precision forward+expectation reference, used by bench.py's
  bf16-headline accuracy artifact and by precision tests.  Bit convention
  matches the engine (qubit 0 = most significant index bit, phases taken at
  the input index -- ops/statevector.py apply_pauli_string)."""
  psi = np.asarray(psi, np.complex128).reshape(-1)
  n = op.num_qubits
  if psi.size != 2**n:
    raise ValueError(f"psi has {psi.size} amplitudes for {n} qubits")
  idx = np.arange(psi.size, dtype=np.int64)
  conj = np.conj(psi)
  coeffs = np.asarray(op.coeffs, np.complex128)
  total = 0.0
  for t in range(op.num_terms):
    flip = pm = 0
    ny = 0
    for q, c in enumerate(op.codes[t]):
      bit = 1 << (n - 1 - q)
      if c == 1:  # X
        flip |= bit
      elif c == 2:  # Y
        flip |= bit
        pm |= bit
        ny += 1
      elif c == 3:  # Z
        pm |= bit
    src = idx ^ flip
    val = conj * psi[src]
    if pm:
      val = val * (1.0 - 2.0 * (_popcount(src & pm) & 1))
    total += float(np.real(coeffs[t] * (1j)**(ny % 4) * np.sum(val)))
  return total
