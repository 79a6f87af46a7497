"""Gate descriptors: circuits-as-data IR.

In the reference every gate is an ``nn.Module`` holding mutable parameter
tensors (reference: src/deepquantum/gate.py, operation.py:110). Here a gate is
an immutable *descriptor*: static metadata (wires/controls/kind) plus a pure
``matrix_fn`` and indices into the circuit's flat parameter vector. The
simulator unrolls descriptors at trace time, so XLA sees one straight-line
program per circuit structure.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from .config import cdtype
from .ops import gates as G

__all__ = ['GateOp', 'GATE_REGISTRY']


@dataclasses.dataclass
class GateOp:
    """One operation in the circuit IR.

    kind: 'gate' (unitary), 'channel' (Kraus, density-matrix only),
          'barrier', 'cut', 'move', 'reset'.
    """
    name: str
    wires: tuple
    controls: tuple = ()
    matrix_fn: Callable | None = None      # params -> (2^k, 2^k) unitary
    static_matrix: Any = None              # fixed matrix when matrix_fn is None
    pidx: tuple = ()                       # indices into the full parameter vector
    npara: int = 0
    kind: str = 'gate'
    condition: bool = False
    requires_grad: bool = True
    inv: bool = False                      # apply the adjoint of the matrix
    extra: dict = dataclasses.field(default_factory=dict)  # plane/ham/qasm/mbqc metadata

    def matrix(self, full_params: jnp.ndarray | None = None) -> jnp.ndarray:
        """Local unitary (or stacked Kraus set for channels).

        With ``full_params=None`` a standalone descriptor (class-style API)
        evaluates on its own ``extra['inputs']`` values."""
        if self.matrix_fn is None:
            # stays numpy: lowered as an inline constant with no device
            # round-trip (complex device->host reads are not universally
            # supported, e.g. over the axon TPU tunnel)
            mat = np.asarray(self.static_matrix, dtype=cdtype())
        else:
            if not self.npara:
                p = None
            elif full_params is None:
                p = jnp.asarray(self.extra['inputs'])
            else:
                p = full_params[jnp.array(self.pidx, dtype=jnp.int32)]
            mat = self.matrix_fn(p)
        if self.inv:
            mat = mat.conj().T if mat.ndim == 2 else jnp.conj(jnp.swapaxes(mat, -1, -2))
        return mat

    def __call__(self, state):
        """Apply this gate to a state vector — standalone class-style usage
        (reference operation.py:110 ``Gate.forward``). Accepts a flat
        ``(2^n,)`` vector, a ``(2,)*n`` tensor, or a batch ``(b, 2^n)``."""
        from .ops.apply import evolve_state, evolve_state_controlled
        from .utils.compat import to_device

        assert self.kind == 'gate', f'{self.name} cannot be applied standalone'
        state = to_device(state) if isinstance(state, (list, tuple, np.ndarray)) else state
        n = self.extra.get('nqubit')
        size = int(np.prod(state.shape))
        if n is None:
            n = int(round(np.log2(size)))
        batch = size // 2 ** n
        m = self.matrix()

        def apply(s):
            if self.controls:
                return evolve_state_controlled(
                    s, m, n, list(self.wires), list(self.controls)).reshape(-1)
            return evolve_state(s, m, n, list(self.wires)).reshape(-1)

        fn = jax.jit(apply)
        if batch > 1:
            return jax.vmap(fn)(state.reshape(batch, 2 ** n))
        return fn(state.reshape(-1)).reshape(state.shape)

    @property
    def all_wires(self):
        return tuple(self.controls) + tuple(self.wires)


def _rand_angle():
    return float(np.random.rand() * 2 * np.pi)


def _rand_angle_pi():
    return float(np.random.rand() * np.pi)


# name -> (npara, matrix_fn builder, default init). matrix_fn takes the packed
# param subvector p (1-D array) to keep a uniform calling convention.
GATE_REGISTRY: dict[str, dict] = {
    'U3Gate': dict(nwires=1, npara=3, fn=lambda p: G.u3_matrix(p[0], p[1], p[2])),
    'PhaseShift': dict(nwires=1, npara=1, fn=lambda p: G.phaseshift_matrix(p[0])),
    'Identity': dict(nwires=1, npara=0, fn=lambda p: G.identity_matrix()),
    'PauliX': dict(nwires=1, npara=0, fn=lambda p: G.paulix_matrix()),
    'PauliY': dict(nwires=1, npara=0, fn=lambda p: G.pauliy_matrix()),
    'PauliZ': dict(nwires=1, npara=0, fn=lambda p: G.pauliz_matrix()),
    'Hadamard': dict(nwires=1, npara=0, fn=lambda p: G.hadamard_matrix()),
    'SGate': dict(nwires=1, npara=0, fn=lambda p: G.s_matrix()),
    'SDaggerGate': dict(nwires=1, npara=0, fn=lambda p: G.sdg_matrix()),
    'TGate': dict(nwires=1, npara=0, fn=lambda p: G.t_matrix()),
    'TDaggerGate': dict(nwires=1, npara=0, fn=lambda p: G.tdg_matrix()),
    'Rx': dict(nwires=1, npara=1, fn=lambda p: G.rx_matrix(p[0])),
    'Ry': dict(nwires=1, npara=1, fn=lambda p: G.ry_matrix(p[0])),
    'Rz': dict(nwires=1, npara=1, fn=lambda p: G.rz_matrix(p[0])),
    'CNOT': dict(nwires=2, npara=0, fn=lambda p: G.cnot_matrix()),
    'Swap': dict(nwires=2, npara=0, fn=lambda p: G.swap_matrix()),
    'ImaginarySwap': dict(nwires=2, npara=0, fn=lambda p: G.iswap_matrix()),
    'Rxx': dict(nwires=2, npara=1, fn=lambda p: G.rxx_matrix(p[0])),
    'Ryy': dict(nwires=2, npara=1, fn=lambda p: G.ryy_matrix(p[0])),
    'Rzz': dict(nwires=2, npara=1, fn=lambda p: G.rzz_matrix(p[0])),
    'Rxy': dict(nwires=2, npara=1, fn=lambda p: G.rxy_matrix(p[0])),
    'ReconfigurableBeamSplitter': dict(nwires=2, npara=1, fn=lambda p: G.rbs_matrix(p[0])),
    'Toffoli': dict(nwires=3, npara=0, fn=lambda p: G.toffoli_matrix()),
    'Fredkin': dict(nwires=3, npara=0, fn=lambda p: G.fredkin_matrix()),
}
