"""Multi-chip parallelism for the TPU-native QHBM stack.

The reference is single-process/single-device (no `tf.distribute` anywhere;
see reference baselines/launch.py:64-65 where `num_workers` is never wired
into training).  This package is the TPU-native scaling layer that the
reference lacks:

  * `mesh`        -- named `jax.sharding.Mesh` construction ('data', 'state').
  * `sharded_sv`  -- amplitude-sharded statevector engine: the 2^n state is
    split over the 'state' mesh axis; gates on global (sharded) qubits move
    data over ICI with `ppermute` half-exchanges (the tensor-parallel /
    ring-schedule analog of the qubit index space).
  * `qnn_sharded` -- `ShardedQuantumInference`, a drop-in QuantumInference
    whose expectations run data-parallel over the 'data' axis and
    amplitude-sharded over the 'state' axis.  The existing `vqt`/`qmhl`/
    `QHBM` layers compose with it unchanged.
  * `sampled_sharded` -- `ShardedSampledQuantumInference`, the shot-based
    engine with the state batch (and every parameter-shift evaluation)
    split over a mesh axis.
  * `ebm_sharded` -- `ShardedGibbsWithGradientsInference`, GWG MCMC chains
    spread across a mesh axis (bit-identical to the single-device chains).
"""

from qhbmlib_tpu.parallel.mesh import make_mesh
from qhbmlib_tpu.parallel import sharded_sv
from qhbmlib_tpu.parallel.qnn_sharded import ShardedQuantumInference
from qhbmlib_tpu.parallel.sampled_sharded import ShardedSampledQuantumInference
from qhbmlib_tpu.parallel.ebm_sharded import ShardedGibbsWithGradientsInference
