"""Named device-mesh construction.

Axes:
  'data'  -- shards the unique-bitstring circuit batch (data parallel).
  'state' -- shards the 2^n statevector amplitudes (the tensor-parallel
             analog; see SURVEY.md section 2.3).

The 'state' axis size must be a power of two: device position along the axis
holds the value of the first log2(size) (most-significant, cirq-convention)
qubits of the basis index.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
STATE_AXIS = "state"


def make_mesh(data: int = 1,
              state: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
  """Builds a ('data', 'state') mesh over `data * state` devices.

  Args:
    data: size of the data-parallel axis.
    state: size of the amplitude-sharding axis (power of two).
    devices: devices to use; defaults to `jax.devices()[:data * state]`.
  """
  # `state < 1` must be checked explicitly: 0 & -1 == 0 slips through the
  # power-of-two test and would build a zero-device mesh.
  if state < 1 or state & (state - 1):
    raise ValueError(f"state axis size must be a power of 2, got {state}")
  if data < 1:
    raise ValueError(f"data axis size must be >= 1, got {data}")
  n = data * state
  if devices is None:
    avail = jax.devices()
    if len(avail) < n:
      raise ValueError(f"need {n} devices, have {len(avail)}")
    devices = avail[:n]
  dev_array = np.asarray(devices).reshape(data, state)
  return Mesh(dev_array, (DATA_AXIS, STATE_AXIS))


def num_global_qubits(mesh: Mesh, axis_name: str = STATE_AXIS) -> int:
  """log2 of the state-axis size: how many qubits are sharded over devices."""
  size = mesh.shape[axis_name]
  k = int(size).bit_length() - 1
  if 2**k != size:
    raise ValueError(f"state axis size {size} is not a power of 2")
  return k
