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


def __getattr__(name):
    # heavier submodules load lazily
    if name == 'mps':
        from . import mps
        return mps
    if name == 'MatrixProductState':
        from .mps import MatrixProductState
        return MatrixProductState
    if name == 'DistributedQubitCircuit':
        from .parallel.circuit import DistributedQubitCircuit
        return DistributedQubitCircuit
    if name == 'photonic':
        from . import photonic
        return photonic
    if name == 'QumodeCircuit':
        from .photonic.circuit import QumodeCircuit
        return QumodeCircuit
    if name == 'mbqc':
        from . import mbqc
        return mbqc
    if name == 'Pattern':
        from .mbqc.pattern import Pattern
        return Pattern
    if name in ('HHL', 'QuantumFourierTransform', 'QuantumPhaseEstimation', 'Ansatz',
                'QuantumConvolutionalNeuralNetwork', 'RandomCircuitG3', 'ShorCircuit',
                'ShorCircuitFor15', 'NumberEncoder', 'PhiAdder', 'PhiModularAdder',
                'ControlledMultiplier', 'ControlledUa', 'QuantumPhaseEstimationSingleQubit'):
        from .models import ansatz
        return getattr(ansatz, name)
    raise AttributeError(f'module {__name__!r} has no attribute {name!r}')
