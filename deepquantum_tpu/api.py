"""Class-style operation API: the reference's class surface on the IR.

The reference exposes every gate, layer, and channel as an ``nn.Module``
class instantiated standalone and passed to ``QubitCircuit.add`` (reference:
src/deepquantum/gate.py, layer.py, channel.py, __init__.py exports). Here the
same names are factory callables producing this framework's circuits-as-data
descriptors — a ``GateOp`` for gates/channels, a ``QubitCircuit`` fragment
for layers — which ``QubitCircuit.add`` consumes. Parameters still live in
the owning circuit's flat vector, so jit/grad semantics are unchanged.

Simulation-detail flags of the reference API (``den_mat``, ``tsr_mode``,
``noise``/``mu``/``sigma``) are accepted and ignored: density-matrix mode is
a circuit-level property here, and parameter noise is applied at build time
by the circuit sugar.
"""

from __future__ import annotations

import warnings

import numpy as np

from .channel import CHANNEL_REGISTRY
from .circuit import Observable, QubitCircuit
from .config import cdtype
from .gate import GATE_REGISTRY, GateOp
from .ops import gates as G

__all__ = [
    'U3Gate', 'PhaseShift', 'Identity', 'PauliX', 'PauliY', 'PauliZ', 'Hadamard',
    'SGate', 'SDaggerGate', 'TGate', 'TDaggerGate', 'Rx', 'Ry', 'Rz', 'CNOT',
    'Swap', 'ImaginarySwap', 'Rxx', 'Ryy', 'Rzz', 'Rxy',
    'ReconfigurableBeamSplitter', 'Toffoli', 'Fredkin', 'ProjectionJ',
    'UAnyGate', 'LatentGate', 'HamiltonianGate', 'CombinedSingleGate', 'Barrier',
    'BitFlip', 'PhaseFlip', 'Depolarizing', 'Pauli', 'AmplitudeDamping',
    'PhaseDamping', 'GeneralizedAmplitudeDamping',
    'XLayer', 'YLayer', 'ZLayer', 'HLayer', 'RxLayer', 'RyLayer', 'RzLayer',
    'U3Layer', 'CnotLayer', 'CnotRing', 'Observable', 'expectation',
]


def _warn_ignored(**flags):
    """Reference users should hear (once per call site) that a simulation flag
    has different semantics here instead of silently diverging (round-1
    review, Weak #7)."""
    for k, v in flags.items():
        if v:
            warnings.warn(
                f'{k}={v!r} is accepted for reference-API parity but has no '
                'per-gate effect in deepquantum_tpu: density-matrix/tensor '
                'representation is a circuit-level property, and parameter '
                'noise is sampled when the gate is added to a circuit, not '
                'per forward. See COMPONENTS.md.',
                UserWarning, stacklevel=3)


def _tuple_wires(wires, default=None):
    if wires is None:
        wires = default
    return (wires,) if isinstance(wires, int) else tuple(wires)


def _resolve_wires(wires, minmax, nqubit):
    if wires is None:
        if minmax is None:
            minmax = [0, nqubit - 1]
        wires = list(range(minmax[0], minmax[1] + 1))
    return _tuple_wires(wires)


def _standalone(name, inputs, wires, controls, condition, requires_grad,
                matrix_fn, npara, nqubit, static_matrix=None, kind='gate',
                extra=None) -> GateOp:
    """Build a GateOp carrying its own parameter values in ``extra['inputs']``
    (``QubitCircuit.add`` registers them in the circuit's flat vector; re-adding
    the same descriptor shares the slice, reference circuit.py:830)."""
    controls = () if controls is None else (
        (controls,) if isinstance(controls, int) else tuple(controls))
    extra = dict(extra or {})
    extra['nqubit'] = nqubit
    if requires_grad is None:
        requires_grad = inputs is None and npara > 0
    if npara:
        if inputs is None:
            values = [float(np.random.rand() * 2 * np.pi) for _ in range(npara)]
        else:
            values = [float(v) for v in np.asarray(inputs, np.float64).reshape(-1)]
        assert len(values) == npara, f'{name} expects {npara} parameters'
        extra['inputs'] = values
    return GateOp(name=name, wires=wires, controls=controls, matrix_fn=matrix_fn,
                  static_matrix=static_matrix, npara=npara, kind=kind,
                  condition=condition, requires_grad=bool(requires_grad),
                  extra=extra)


def _gate_factory(name: str, default_nwires: int = 1):
    reg = GATE_REGISTRY[name]

    def factory(inputs=None, nqubit=None, wires=None, controls=None,
                condition=False, den_mat=False, tsr_mode=False,
                requires_grad=None, noise=False, mu=0, sigma=0.1):
        _warn_ignored(den_mat=den_mat, tsr_mode=tsr_mode, noise=noise)
        wires = _tuple_wires(wires, default=list(range(default_nwires)))
        nq = nqubit if nqubit is not None else max(
            list(wires) + ([controls] if isinstance(controls, int) else list(controls or []))) + 1
        return _standalone(name, inputs, wires, controls, condition,
                           requires_grad, reg['fn'], reg['npara'], nq)

    factory.__name__ = name
    factory.__qualname__ = name
    factory.__doc__ = f'{name} gate descriptor (class-style API; see GATE_REGISTRY["{name}"]).'
    return factory


_NWIRES = {'CNOT': 2, 'Swap': 2, 'ImaginarySwap': 2, 'Rxx': 2, 'Ryy': 2,
           'Rzz': 2, 'Rxy': 2, 'ReconfigurableBeamSplitter': 2,
           'Toffoli': 3, 'Fredkin': 3}
for _name in GATE_REGISTRY:
    globals()[_name] = _gate_factory(_name, _NWIRES.get(_name, 1))


def ProjectionJ(inputs=None, nqubit=None, wires=None, plane='xy', controls=None,
                condition=False, den_mat=False, tsr_mode=False,
                requires_grad=None, **kwargs) -> GateOp:
    """J(theta) basis-projection gate for MBQC planes (reference gate.py:1674)."""
    wires = _tuple_wires(wires, default=[0])
    nq = nqubit if nqubit is not None else max(wires) + 1
    plane = plane.lower()
    return _standalone('ProjectionJ', inputs, wires, controls, condition,
                       requires_grad,
                       lambda p, _pl=plane: G.projection_j_matrix(p[0], _pl),
                       1, nq, extra={'plane': plane})


def UAnyGate(unitary, nqubit=None, wires=None, minmax=None, controls=None,
             name='UAnyGate', den_mat=False, tsr_mode=False, **kwargs) -> GateOp:
    """Arbitrary-unitary gate (reference gate.py:2745)."""
    unitary = np.asarray(unitary, dtype=cdtype())
    k = int(round(np.log2(unitary.shape[-1])))
    if nqubit is None:
        nqubit = k if wires is None and minmax is None else None
    wires = _resolve_wires(wires, minmax if minmax is not None else [0, k - 1],
                           nqubit or k)
    if nqubit is None:
        nqubit = max(wires) + 1
    return _standalone(name, None, wires, controls, False, False, None, 0,
                       nqubit, static_matrix=unitary)


def LatentGate(inputs=None, nqubit=None, wires=None, minmax=None, controls=None,
               den_mat=False, tsr_mode=False, requires_grad=None, **kwargs) -> GateOp:
    """Polar-projected latent-matrix gate (reference gate.py:2791)."""
    wires = _resolve_wires(wires, minmax, nqubit if nqubit is not None else 1)
    if nqubit is None:
        nqubit = max(wires) + 1
    dim = 2 ** len(wires)
    if inputs is None:
        inputs = np.random.randn(dim, dim)
    inputs = np.asarray(inputs, np.float64).reshape(-1)
    return _standalone('LatentGate', inputs, wires, controls, False,
                       requires_grad,
                       lambda p, _d=dim: G.latent_matrix(p.reshape(_d, _d)),
                       dim * dim, nqubit)


def HamiltonianGate(hamiltonian, t=None, nqubit=None, wires=None, minmax=None,
                    controls=None, den_mat=False, tsr_mode=False,
                    requires_grad=None, **kwargs) -> GateOp:
    """exp(-i H t) gate (reference gate.py:2867)."""
    ham = np.asarray(hamiltonian, dtype=cdtype())
    k = int(round(np.log2(ham.shape[-1])))
    wires = _resolve_wires(wires, minmax if minmax is not None else [0, k - 1],
                           nqubit if nqubit is not None else k)
    if nqubit is None:
        nqubit = max(wires) + 1
    return _standalone('HamiltonianGate', t, wires, controls, False,
                       requires_grad,
                       lambda p, _h=ham: G.hamiltonian_matrix(_h, p[0]),
                       1, nqubit, extra={'ham': ham})


def CombinedSingleGate(gatelist, nqubit=None, wires=None, den_mat=False,
                       tsr_mode=False, **kwargs) -> GateOp:
    """Product of single-qubit gates fused into one descriptor
    (reference gate.py:2957); the combined parameter vector is the
    concatenation of the members', applied in list order."""
    gatelist = list(gatelist)
    assert all(len(g.wires) == 1 for g in gatelist), 'members must be single-qubit gates'
    wires = _tuple_wires(wires, default=gatelist[0].wires)
    nq = nqubit if nqubit is not None else max(wires) + 1
    slices, off = [], 0
    for g in gatelist:
        slices.append(slice(off, off + g.npara))
        off += g.npara
    inputs = [v for g in gatelist for v in g.extra.get('inputs', [])]

    def fn(p):
        m = None
        for g, sl in zip(gatelist, slices):
            mg = g.matrix_fn(p[sl] if g.npara else None)
            if g.inv:
                mg = mg.conj().T
            m = mg if m is None else mg @ m
        return m

    return _standalone('CombinedSingleGate', inputs if off else None, wires,
                       None, False, any(g.requires_grad for g in gatelist),
                       fn, off, nq)


def Barrier(nqubit=None, wires=None, **kwargs) -> GateOp:
    """No-op scheduling barrier (reference gate.py:3021)."""
    wires = _tuple_wires(wires, default=list(range(nqubit if nqubit is not None else 1)))
    return GateOp(name='Barrier', wires=wires, kind='barrier', npara=0,
                  requires_grad=False, extra={'nqubit': nqubit or max(wires) + 1})


def _channel_factory(name: str):
    reg = CHANNEL_REGISTRY[name]

    def factory(inputs=None, nqubit=None, wires=0, tsr_mode=False,
                requires_grad=None, **kwargs):
        wires = _tuple_wires(wires)
        nq = nqubit if nqubit is not None else max(wires) + 1
        if inputs is None:
            inputs = [float(np.random.rand() * np.pi) for _ in range(reg['npara'])]
        return _standalone(name, inputs, wires, None, False, False,
                           reg['fn'], reg['npara'], nq, kind='channel')

    factory.__name__ = name
    factory.__qualname__ = name
    factory.__doc__ = f'{name} Kraus channel descriptor (density-matrix circuits only).'
    return factory


for _name in CHANNEL_REGISTRY:
    globals()[_name] = _channel_factory(_name)


# ------------------------------------------------------------------- layers
def _fixed_layer(method: str, doc: str):
    def factory(nqubit=1, wires=None, den_mat=False, tsr_mode=False, **kwargs):
        cir = QubitCircuit(nqubit)
        getattr(cir, method)(wires)
        return cir
    factory.__doc__ = doc
    return factory


XLayer = _fixed_layer('xlayer', 'Layer of PauliX gates (reference layer.py:180).')
YLayer = _fixed_layer('ylayer', 'Layer of PauliY gates.')
ZLayer = _fixed_layer('zlayer', 'Layer of PauliZ gates.')
HLayer = _fixed_layer('hlayer', 'Layer of Hadamard gates.')


def _rot_layer(method: str, doc: str):
    def factory(nqubit=1, wires=None, inputs=None, den_mat=False,
                tsr_mode=False, requires_grad=True, **kwargs):
        cir = QubitCircuit(nqubit)
        getattr(cir, method)(wires, inputs)
        return cir
    factory.__doc__ = doc
    return factory


RxLayer = _rot_layer('rxlayer', 'Layer of Rx gates (reference layer.py:232).')
RyLayer = _rot_layer('rylayer', 'Layer of Ry gates.')
RzLayer = _rot_layer('rzlayer', 'Layer of Rz gates.')
U3Layer = _rot_layer('u3layer', 'Layer of U3 gates (reference layer.py:312).')


def CnotLayer(nqubit=2, wires=None, name='CnotLayer', den_mat=False,
              tsr_mode=False, **kwargs) -> QubitCircuit:
    """Layer of CNOTs on the given (control, target) pairs (reference layer.py:407)."""
    cir = QubitCircuit(nqubit)
    cir.cxlayer(wires)
    return cir


def CnotRing(nqubit=2, minmax=None, step=1, reverse=False, den_mat=False,
             tsr_mode=False, **kwargs) -> QubitCircuit:
    """Ring of CNOTs (reference layer.py:446)."""
    cir = QubitCircuit(nqubit)
    cir.cnot_ring(minmax=minmax, step=step, reverse=reverse)
    return cir


# -------------------------------------------------------------- expectation
def expectation(state, observable: Observable, den_mat: bool = False,
                chi: int | None = None):
    """Expectation value of a Pauli-string observable on a state vector,
    density matrix, or MPS tensor list (reference qmath.py:830)."""
    import jax.numpy as jnp

    if isinstance(state, (list, tuple)):  # MPS tensors
        from .ops.qmath import inner_product_mps
        ket = list(state)
        for wire, b in zip(observable.wires, observable.basis):
            mat = jnp.asarray(_PAULI[b](), dtype=ket[wire[0]].dtype)
            ket[wire[0]] = jnp.einsum('ab,xby->xay', mat, ket[wire[0]])
        return jnp.real(inner_product_mps(list(state), ket))
    state = jnp.asarray(state)
    n = observable.nqubit
    if den_mat:
        rho = state.reshape(-1, 2 ** n, 2 ** n)
        ox = observable.apply(rho.reshape([-1] + [2] * (2 * n)), den_mat=True)
        out = jnp.real(jnp.trace(ox.reshape(-1, 2 ** n, 2 ** n), axis1=-2, axis2=-1))
    else:
        psi = state.reshape(-1, 2 ** n)
        ox = observable.apply(psi.reshape([-1] + [2] * n)).reshape(-1, 2 ** n)
        out = jnp.real(jnp.einsum('bi,bi->b', jnp.conj(psi), ox))
    batched = state.size > (4 ** n if den_mat else 2 ** n)
    return out if batched else out[0]


_PAULI = {'x': G.paulix_matrix, 'y': G.pauliy_matrix, 'z': G.pauliz_matrix,
          'i': G.identity_matrix}
