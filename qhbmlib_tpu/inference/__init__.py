"""L3/L4: inference engines and losses.

Public surface mirrors reference qhbmlib/inference/__init__.py:17-47.
"""

from qhbmlib_tpu.inference import ebm_utils
from qhbmlib_tpu.inference import qhbm_utils
from qhbmlib_tpu.inference import qnn_utils
from qhbmlib_tpu.inference.ebm_utils import probabilities
from qhbmlib_tpu.inference.qhbm_utils import density_matrix
from qhbmlib_tpu.inference.qhbm_utils import fidelity
from qhbmlib_tpu.inference.qnn_utils import unitary
from qhbmlib_tpu.inference.ebm import AnalyticEnergyInference
from qhbmlib_tpu.inference.ebm import BernoulliEnergyInference
from qhbmlib_tpu.inference.ebm import EnergyInference
from qhbmlib_tpu.inference.ebm import EnergyInferenceBase
from qhbmlib_tpu.inference.ebm import GibbsWithGradientsInference
from qhbmlib_tpu.inference.ebm import gwg_one_step
from qhbmlib_tpu.inference.qhbm import QHBM
from qhbmlib_tpu.inference.qmhl_loss import make_qmhl
from qhbmlib_tpu.inference.qmhl_loss import qmhl
from qhbmlib_tpu.inference.qnn import AnalyticQuantumInference
from qhbmlib_tpu.inference.qnn import QuantumInference
from qhbmlib_tpu.inference.qnn import SampledQuantumInference
from qhbmlib_tpu.inference.vqt_loss import make_vqt
from qhbmlib_tpu.inference.vqt_loss import vqt
