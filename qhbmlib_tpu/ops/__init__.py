"""L1: the TPU-native quantum simulation engine (circuit IR + statevector).

This package is the rebuilt equivalent of the reference's external native
layer (TensorFlow Quantum C++ ops wrapping qsim; see SURVEY.md section 1, L1).
"""

from qhbmlib_tpu.ops import adjoint
from qhbmlib_tpu.ops import circuit_ir
from qhbmlib_tpu.ops import paulis
from qhbmlib_tpu.ops import shift
from qhbmlib_tpu.ops import statevector

from qhbmlib_tpu.ops.circuit_ir import Circuit, CircuitBuilder, Gate
from qhbmlib_tpu.ops.paulis import (PauliSum, pauli_string,
                                    pauli_sum_from_strings)
