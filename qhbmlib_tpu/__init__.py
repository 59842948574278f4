"""qhbmlib_tpu: a TPU-native framework for Quantum Hamiltonian-Based Models.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
google/qhbm-library (TF/TFQ reference mounted at /root/reference):

  * ops/        array-native circuit IR + statevector engine + differentiators
                (replaces TFQ's C++ ops and the qsim simulator)
  * models/     energy functions, parameterized circuits, Hamiltonians
  * inference/  EBM + QNN + QHBM inference engines, VQT/QMHL losses
  * data/       quantum data interfaces
  * parallel/   device-mesh sharding (data-parallel circuit batches,
                ICI-sharded amplitude vectors)
  * utils/      shared numerics
"""

__version__ = "0.1.0"

from qhbmlib_tpu import ops
from qhbmlib_tpu import utils
