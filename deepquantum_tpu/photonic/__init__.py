"""Photonic quantum simulation: Fock / Gaussian / Bosonic backends.

Public surface mirrors the reference (src/deepquantum/photonic/__init__.py):
circuit + state containers eagerly, gate classes / measurements / heavier
subsystems lazily.
"""

from . import gates, qmath
from .circuit import QumodeCircuit
from .state import BosonicState, CatState, FockState, FockStateBosonic, GaussianState, GKPState
from .qmath import (
    ladder_to_quadrature,
    perm_chunksize_dict,
    permanent,
    quadrature_to_ladder,
    schur_anti_symm_even,
    set_perm_chunksize,
    sqrtm_herm,
    takagi,
    williamson,
    xpxp_to_xxpp,
    xxpp_to_xpxp,
)
from ..config import HBAR as hbar, KAPPA as kappa, set_hbar, set_kappa

_LAZY_ATTRS = {
    'QumodeCircuitTDM': ('.tdm', 'QumodeCircuitTDM'),
    'DistributedFockState': ('.distributed', 'DistributedFockState'),
    'DistributedQumodeCircuit': ('.distributed', 'DistributedQumodeCircuit'),
    'Generaldyne': ('.measurement', 'Generaldyne'),
    'Homodyne': ('.measurement', 'Homodyne'),
    'GeneralBosonic': ('.measurement', 'GeneralBosonic'),
    'PhotonNumberResolvingBosonic': ('.measurement', 'PhotonNumberResolvingBosonic'),
    'Clements': ('.ansatz', 'Clements'),
    'GaussianBosonSampling': ('.ansatz', 'GaussianBosonSampling'),
    'GraphGBS': ('.ansatz', 'GraphGBS'),
    'UnitaryDecomposer': ('.decompose', 'UnitaryDecomposer'),
    'UnitaryMapper': ('.mapper', 'UnitaryMapper'),
    'DrawClements': ('.draw', 'DrawClements'),
    'DrawCircuit': ('.draw', 'DrawCircuit'),
    'hafnian': ('.hafnian_', 'hafnian'),
    'hafnian_batch': ('.hafnian_', 'hafnian_batch'),
    'torontonian': ('.torontonian_', 'torontonian'),
    'cv_to_wigner': ('.wigner', 'cv_to_wigner'),
    'fock_to_wigner': ('.wigner', 'fock_to_wigner'),
    'quadrature_ladder_transform': ('.qmath', 'quadrature_to_ladder'),
}
_API_NAMES = (
    'PhaseShift', 'BeamSplitter', 'MZI', 'BeamSplitterTheta', 'BeamSplitterPhi',
    'BeamSplitterSingle', 'UAnyGate', 'Squeezing', 'Squeezing2', 'Displacement',
    'DisplacementPosition', 'DisplacementMomentum', 'QuadraticPhase',
    'ControlledX', 'ControlledZ', 'CubicPhase', 'Kerr', 'CrossKerr',
    'PhotonLoss', 'Delay', 'DelayBS', 'DelayMZI', 'Barrier',
)
_LAZY_SUBMODULES = ('ansatz', 'api', 'channel', 'decompose', 'distributed', 'draw',
                    'gaussian_prob', 'hafnian_', 'mapper', 'measurement', 'state',
                    'tdm', 'torontonian_', 'utils', 'wigner')


def __getattr__(name):
    import importlib
    if name in _LAZY_SUBMODULES:
        return importlib.import_module(f'.{name}', __name__)
    if name in _API_NAMES:
        from . import api
        return getattr(api, name)
    if name in _LAZY_ATTRS:
        mod, attr = _LAZY_ATTRS[name]
        return getattr(importlib.import_module(mod, __name__), attr)
    raise AttributeError(f'module {__name__!r} has no attribute {name!r}')


def __dir__():
    return sorted(set(globals()) | set(_LAZY_SUBMODULES) | set(_API_NAMES)
                  | set(_LAZY_ATTRS))
