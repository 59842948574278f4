"""Parameter-shift differentiation in the circuit IR.

Replaces `tfq.differentiators.ParameterShift.get_gradient_circuits`
(reference: qhbmlib/inference/qnn.py:168,189-234).  Every supported gate is
``phase * exp(-i*phi/2 * G)`` with involution generator ``G`` and
``phi = angle_scale(kind) * param``, so the exact two-point rule applies:

    dE/dphi = (E(phi + pi/2) - E(phi - pi/2)) / 2.

Instead of generating shifted *programs* (the TFQ approach: a batch of new
serialized circuits), we keep ONE static circuit and vmap the simulator over a
batch of per-gate angle offsets -- the same compiled kernel evaluates all
shifted configurations, which is exactly what the TPU wants.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qhbmlib_tpu.ops import circuit_ir as ir


def shift_plan(
    circuit: ir.Circuit) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
  """Static plan for parameter-shift gradients of a circuit.

  Returns:
    offsets: [2*P, num_gates] float32; row r is the angle-offset vector for
      shifted evaluation r (P = number of parameterized gate occurrences).
    weights: [2*P] float32; dE/d(symbol) = sum_r weights[r]*E_r -- the FULL
      chain-rule factor is folded in, including the gate coefficient
      (weights[r] = sign * scale/2 * gate.coeff).  Callers must NOT
      multiply by gate.coeff again.
    slots: [2*P] int32; symbol slot each shifted evaluation contributes to.
  """
  param_gates = circuit.parameterized_gate_indices()
  num_gates = circuit.num_gates
  rows = []
  weights = []
  slots = []
  for g_idx in param_gates:
    gate = circuit.gates[g_idx]
    scale = gate.angle_scale  # dphi/dparam where phi is the rotation angle
    if scale == 0.0:  # e.g. GPHASE: expectation has no dependence
      continue
    # Shift the *resolved angle parameter* by +/- (pi/2)/scale so the
    # rotation angle phi shifts by +/- pi/2.
    delta = (np.pi / 2.0) / scale
    for sign in (+1.0, -1.0):
      row = np.zeros([num_gates], np.float32)
      row[g_idx] = sign * delta
      rows.append(row)
      # dE/dparam = scale/2 * (E+ - E-); dparam/dsymbol = gate.coeff
      weights.append(sign * 0.5 * scale * gate.coeff)
      slots.append(gate.slot)
  if not rows:
    return (np.zeros([0, num_gates], np.float32), np.zeros([0], np.float32),
            np.zeros([0], np.int32))
  return (np.stack(rows), np.asarray(weights, np.float32),
          np.asarray(slots, np.int32))


def shift_gradient(circuit: ir.Circuit,
                   eval_fn: Callable[[jnp.ndarray], jnp.ndarray],
                   num_symbols: int) -> jnp.ndarray:
  """Parameter-shift gradient of a scalar-valued circuit evaluation.

  Args:
    circuit: static circuit IR.
    eval_fn: maps angle_offsets [num_gates] -> scalar expectation estimate.
      (Typically closed over symbol values, init state, observable and -- for
      the sampled engine -- a PRNG key.)
    num_symbols: length of the symbol gradient to produce.

  Returns:
    [num_symbols] gradient d(eval)/d(symbol_values).
  """
  offsets, weights, slots = shift_plan(circuit)
  if offsets.shape[0] == 0:
    return jnp.zeros([num_symbols], jnp.float32)
  # Bound concurrent state memory: an unchunked vmap holds all 2P shifted
  # simulations live at once (20 x 2GB statevectors for 10 parameterized
  # gates at 28 qubits).  Chunk like the adjoint batch (~128MB of live
  # chunk state by default; QHBM_SHIFT_CHUNK overrides).
  import os
  env = os.environ.get("QHBM_SHIFT_CHUNK")
  if env:
    # Clamp to the row count like the default branch: an oversized override
    # would otherwise pad with zero-offset rows that each cost a full
    # discarded simulation.
    chunk = max(1, min(offsets.shape[0], int(env)))
  else:
    state_bytes = 8 * 2**circuit.num_qubits
    chunk = max(1, min(offsets.shape[0], (128 << 20) // state_bytes))
  evals = jax.lax.map(jax.vmap(eval_fn), _pad_rows(offsets, chunk))
  evals = evals.reshape(-1)[:offsets.shape[0]]  # [2P]
  contribs = evals * jnp.asarray(weights)
  return jnp.zeros([num_symbols], jnp.float32).at[jnp.asarray(slots)].add(
      contribs)


def _pad_rows(offsets: np.ndarray, chunk: int) -> jnp.ndarray:
  """[2P, G] -> [ceil(2P/chunk), chunk, G], zero-padded (a zero offset row
  is a valid evaluation whose result is discarded by the caller's slice)."""
  total = offsets.shape[0]
  pad = (-total) % chunk
  if pad:
    offsets = np.concatenate(
        [offsets, np.zeros([pad, offsets.shape[1]], offsets.dtype)], axis=0)
  return jnp.asarray(offsets).reshape(-1, chunk, offsets.shape[1])
