"""Quantum data interfaces (mirrors reference qhbmlib/data/__init__.py)."""

from qhbmlib_tpu.data.qhbm_data import QHBMData
from qhbmlib_tpu.data.quantum_data import QuantumData
from qhbmlib_tpu.data.thermal_data import ThermalStateData
