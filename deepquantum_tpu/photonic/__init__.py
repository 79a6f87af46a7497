from . import gates, qmath
from .circuit import QumodeCircuit
from .state import BosonicState, CatState, FockState, GaussianState, GKPState
from ..config import HBAR as hbar, KAPPA as kappa, set_hbar, set_kappa
