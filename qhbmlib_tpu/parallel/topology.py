"""Multi-host / multi-slice topology: distributed init and ICI-aware meshes.

The reference's only notion of topology is the XManager launcher's
TPU-topology -> core-count table (reference baselines/launch.py:126-139,
202-214); no code ever communicates across hosts.  This module is the
TPU-native scaling story SURVEY.md section 2.3 calls for:

  * `initialize_distributed` -- `jax.distributed.initialize` wrapper: every
    host in a multi-host slice (or multi-slice DCN job) calls this once,
    after which `jax.devices()` is the GLOBAL device list and the meshes
    below span all hosts.  XLA then compiles the same shard_map programs
    (parallel/sharded_sv.py) with cross-host ICI/DCN collectives -- no code
    above this layer changes.
  * `ici_mesh` -- a ('data', 'state') mesh laid out by
    `mesh_utils.create_device_mesh`, which orders devices so that the LAST
    mesh axis falls along physically adjacent ICI links; the 'state' axis
    (amplitude sharding: per-gate ppermute partner exchanges) is placed
    last so its collectives ride nearest-neighbor ICI hops.
  * `dcn_mesh` -- a ('replica', 'data', 'state') hybrid mesh via
    `mesh_utils.create_hybrid_device_mesh`: the 'replica' axis maps across
    slices (DCN), carrying only per-step gradient psums (a few KB for QHBM
    models), while 'data'/'state' stay inside each slice on ICI.  This is
    the standard bandwidth hierarchy: statevector partner exchanges
    (O(2^n / shards) per gate) never cross DCN.
  * `sync_params` -- broadcast process 0's parameter pytree to every
    process.  Model constructors draw random initial values from a
    per-process host RNG (qhbmlib_tpu/nn.py RandomUniform), which is
    correct single-process but diverges across hosts; SPMD training
    requires identical replicated inputs on every process.  Call this once
    on the freshly built parameters before the first train step (see
    tests/parallel/mp_vqt_worker.py for the full multi-process recipe).

Sweep-level parallelism (independent hyperparameter points) stays at the
launcher level (baselines/launch.py), one job per point, as in the
reference.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

from qhbmlib_tpu.parallel import mesh as mesh_lib

REPLICA_AXIS = "replica"


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> int:
  """Initializes JAX's multi-host runtime; returns the global device count.

  On Cloud TPU all three arguments are inferred from the metadata server, so
  `initialize_distributed()` with no arguments is the common call.  Safe to
  call in single-process runs (it no-ops when there is nothing to join).
  """
  if num_processes is not None and int(num_processes) <= 1:
    return len(jax.devices())
  try:
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
  except (ValueError, RuntimeError) as e:
    import logging
    msg = str(e)
    if "once" in msg or "already" in msg:
      # Re-initialization by a second component in an already-distributed
      # process: benign, the runtime is up.
      logging.getLogger(__name__).debug(
          "jax.distributed already initialized; reusing it (%s)", e)
      return len(jax.devices())
    # Only pure auto-detection (no argument given) may fall through to
    # single-process: that is the "no cluster here" case.  Any explicit
    # argument declares distributed intent, and a silent degradation would
    # leave each host training an independent replica (or hang in the first
    # collective) with no error pointing at initialization.
    if (coordinator_address, num_processes, process_id) != (None, None, None):
      raise
    logging.getLogger(__name__).warning(
        "jax.distributed.initialize() auto-detection failed (%s); continuing "
        "single-process with the local devices only. If this host IS part of "
        "a multi-host job, pass coordinator_address/num_processes/process_id "
        "explicitly -- explicit arguments make this failure fatal instead.",
        e)
  return len(jax.devices())


def ici_mesh(data: int = 1,
             state: int = 1,
             devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
  """('data', 'state') mesh with ICI-aware device ordering.

  Like `parallel.make_mesh`, but devices are arranged by
  `mesh_utils.create_device_mesh`, which maps the trailing mesh axis onto
  physically contiguous ICI rings on real TPU slices -- the 'state' axis's
  per-gate `ppermute` partner exchanges then use nearest-neighbor links.
  Falls back to the flat ordering off-TPU (CPU test meshes).
  """
  if state < 1 or state & (state - 1):
    raise ValueError(f"state axis size must be a power of 2, got {state}")
  if data < 1:
    raise ValueError(f"data axis size must be >= 1, got {data}")
  if devices is None:
    devices = jax.devices()
  n = data * state
  if len(devices) < n:
    raise ValueError(f"need {n} devices, have {len(devices)}")
  try:
    dev_array = mesh_utils.create_device_mesh((data, state),
                                              devices=list(devices)[:n])
  except Exception as e:  # non-TPU platforms without topology info
    # Loud fallback: on a real TPU slice, losing ICI-aware placement means
    # every 'state'-axis partner exchange may ride non-adjacent links --
    # the exact degradation this constructor exists to prevent.
    if any(getattr(d, "platform", "") == "tpu" for d in list(devices)[:n]):
      import warnings
      warnings.warn(
          f"mesh_utils.create_device_mesh failed on TPU devices ({e!r}); "
          "falling back to FLAT device ordering -- 'state'-axis ppermute "
          "exchanges may not ride nearest-neighbor ICI links.",
          RuntimeWarning, stacklevel=2)
    dev_array = np.asarray(list(devices)[:n]).reshape(data, state)
  return Mesh(dev_array, (mesh_lib.DATA_AXIS, mesh_lib.STATE_AXIS))


def dcn_mesh(replica: int,
             data: int = 1,
             state: int = 1,
             devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
  """('replica', 'data', 'state') hybrid mesh for multi-slice jobs.

  `replica` spans slices over DCN (gradient psums only); 'data' and 'state'
  stay intra-slice on ICI.  Requires a multi-slice environment (device
  attribute `slice_index`); raises otherwise.
  """
  if state < 1 or state & (state - 1):
    raise ValueError(f"state axis size must be a power of 2, got {state}")
  if data < 1 or replica < 1:
    raise ValueError(
        f"axis sizes must be >= 1, got replica={replica}, data={data}")
  if devices is None:
    devices = jax.devices()
  dev_array = mesh_utils.create_hybrid_device_mesh(
      (1, data, state), (replica, 1, 1), devices=list(devices))
  return Mesh(dev_array,
              (REPLICA_AXIS, mesh_lib.DATA_AXIS, mesh_lib.STATE_AXIS))


def sync_params(params):
  """Broadcasts process 0's parameter pytree to all processes.

  Multi-host SPMD requires every process to pass bitwise-identical
  replicated inputs to jitted programs; model constructors draw initial
  values from a per-process host RNG (nn.RandomUniform with no seed), so a
  freshly built model differs across processes.  Single-process runs
  return `params` unchanged.
  """
  if jax.process_count() == 1:
    return params
  from jax.experimental import multihost_utils
  return multihost_utils.broadcast_one_to_all(params)
