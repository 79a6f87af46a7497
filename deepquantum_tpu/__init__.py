"""deepquantum_tpu — a TPU-native quantum simulation framework.

JAX/XLA/Pallas re-design with the capabilities of DeepQuantum (qubit
statevector / density matrix / MPS / distributed simulation, photonic Fock /
Gaussian / Bosonic backends, MBQC), built TPU-first: circuits are data, the
simulator is a pure jitted program, distribution is GSPMD sharding over a
device mesh.
"""

__version__ = '0.1.0'

from . import config
from .config import cdtype, rdtype, set_dtype
from .circuit import Observable, QubitCircuit
from .gate import GateOp
from .state import QubitState
from .ops import qmath
from .ops.qmath import (
    amplitude_encoding,
    expectation_pauli,
    inner_product_mps,
    measure,
    meyer_wallach_measure,
    multi_kron,
    partial_trace,
    slice_state_vector,
)


# Lazy re-export table: reference top-level API surface
# (reference src/deepquantum/__init__.py exports) -> submodule here.
_LAZY_SUBMODULES = ('mps', 'photonic', 'mbqc', 'models', 'parallel', 'api',
                    'adjoint', 'cutting', 'qasm', 'optimizer', 'channel',
                    'bitmath', 'draw', 'utils')
_ANSATZ_NAMES = (
    'Ansatz', 'HHL', 'QuantumFourierTransform', 'QuantumPhaseEstimation',
    'QuantumPhaseEstimationSingleQubit', 'QuantumConvolutionalNeuralNetwork',
    'RandomCircuitG3', 'ShorCircuit', 'ShorCircuitFor15', 'NumberEncoder',
    'PhiAdder', 'PhiModularAdder', 'ControlledMultiplier', 'ControlledUa',
)
_API_NAMES = (
    'U3Gate', 'PhaseShift', 'Identity', 'PauliX', 'PauliY', 'PauliZ', 'Hadamard',
    'SGate', 'SDaggerGate', 'TGate', 'TDaggerGate', 'Rx', 'Ry', 'Rz', 'CNOT',
    'Swap', 'ImaginarySwap', 'Rxx', 'Ryy', 'Rzz', 'Rxy',
    'ReconfigurableBeamSplitter', 'Toffoli', 'Fredkin', 'ProjectionJ',
    'UAnyGate', 'LatentGate', 'HamiltonianGate', 'CombinedSingleGate', 'Barrier',
    'BitFlip', 'PhaseFlip', 'Depolarizing', 'Pauli', 'AmplitudeDamping',
    'PhaseDamping', 'GeneralizedAmplitudeDamping',
    'XLayer', 'YLayer', 'ZLayer', 'HLayer', 'RxLayer', 'RyLayer', 'RzLayer',
    'U3Layer', 'CnotLayer', 'CnotRing', 'expectation',
)
_LAZY_ATTRS = {
    'MatrixProductState': ('.mps', 'MatrixProductState'),
    'DistributedQubitCircuit': ('.parallel.circuit', 'DistributedQubitCircuit'),
    'DistributedQubitState': ('.parallel.sharded', 'DistributedQubitState'),
    'QumodeCircuit': ('.photonic.circuit', 'QumodeCircuit'),
    'QumodeCircuitTDM': ('.photonic.tdm', 'QumodeCircuitTDM'),
    'FockState': ('.photonic.state', 'FockState'),
    'GaussianState': ('.photonic.state', 'GaussianState'),
    'BosonicState': ('.photonic.state', 'BosonicState'),
    'CatState': ('.photonic.state', 'CatState'),
    'GKPState': ('.photonic.state', 'GKPState'),
    'FockStateBosonic': ('.photonic.state', 'FockStateBosonic'),
    'DistributedFockState': ('.photonic.distributed', 'DistributedFockState'),
    'DistributedQumodeCircuit': ('.photonic.distributed', 'DistributedQumodeCircuit'),
    'Clements': ('.photonic.ansatz', 'Clements'),
    'GaussianBosonSampling': ('.photonic.ansatz', 'GaussianBosonSampling'),
    'GraphGBS': ('.photonic.ansatz', 'GraphGBS'),
    'UnitaryDecomposer': ('.photonic.decompose', 'UnitaryDecomposer'),
    'UnitaryMapper': ('.photonic.mapper', 'UnitaryMapper'),
    'DrawClements': ('.photonic.draw', 'DrawClements'),
    'permanent': ('.photonic.qmath', 'permanent'),
    'takagi': ('.photonic.qmath', 'takagi'),
    'williamson': ('.photonic.qmath', 'williamson'),
    'hafnian': ('.photonic.hafnian_', 'hafnian'),
    'torontonian': ('.photonic.torontonian_', 'torontonian'),
    'Pattern': ('.mbqc.pattern', 'Pattern'),
    'SubGraphState': ('.mbqc.state', 'SubGraphState'),
    'GraphState': ('.mbqc.state', 'GraphState'),
    'cir_to_qasm3': ('.qasm', 'cir_to_qasm3'),
    'qasm3_to_cir': ('.qasm', 'qasm3_to_cir'),
    'setup_distributed': ('.parallel.sharded', 'setup_distributed'),
    'cleanup_distributed': ('.parallel.sharded', 'cleanup_distributed'),
}


def __getattr__(name):
    # heavier submodules and the class-style API load lazily
    import importlib
    if name in _LAZY_SUBMODULES:
        return importlib.import_module(f'.{name}', __name__)
    if name in _ANSATZ_NAMES:
        from .models import ansatz
        return getattr(ansatz, name)
    if name in _API_NAMES:
        from . import api
        return getattr(api, name)
    if name in _LAZY_ATTRS:
        mod, attr = _LAZY_ATTRS[name]
        return getattr(importlib.import_module(mod, __name__), attr)
    if name == 'dtype_map':
        # reference __init__.py:115: real dtype -> matching complex dtype
        import jax.numpy as jnp
        return {jnp.float32: jnp.complex64, jnp.float64: jnp.complex128}
    raise AttributeError(f'module {__name__!r} has no attribute {name!r}')


def __dir__():
    return sorted(set(globals()) | set(_LAZY_SUBMODULES) | set(_ANSATZ_NAMES)
                  | set(_API_NAMES) | set(_LAZY_ATTRS) | {'dtype_map'})
