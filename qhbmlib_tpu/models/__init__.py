"""L2: model parameterizations (energies, circuits, Hamiltonians).

Public surface mirrors reference qhbmlib/models/__init__.py:17-41.
"""

from qhbmlib_tpu.models.circuit import DirectQuantumCircuit
from qhbmlib_tpu.models.circuit import QAIA
from qhbmlib_tpu.models.circuit import QuantumCircuit
from qhbmlib_tpu.models.circuit_utils import bit_circuit
from qhbmlib_tpu.models.circuit_utils import hardware_efficient_ansatz
from qhbmlib_tpu.models.energy import BernoulliEnergy
from qhbmlib_tpu.models.energy import BitstringEnergy
from qhbmlib_tpu.models.energy import KOBE
from qhbmlib_tpu.models.energy import PauliMixin
from qhbmlib_tpu.models.energy_utils import Parity
from qhbmlib_tpu.models.energy_utils import SpinsFromBitstrings
from qhbmlib_tpu.models.energy_utils import VariableDot
from qhbmlib_tpu.models.hamiltonian import Hamiltonian
