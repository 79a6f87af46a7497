"""Class-style photonic operation API: the reference's class surface on the IR.

The reference exposes photonic gates as ``nn.Module`` classes instantiated
standalone and passed to ``QumodeCircuit.add`` (reference:
src/deepquantum/photonic/gate.py, __init__.py exports). Here the same names
are factory callables producing ``PhotonicOp`` descriptors which
``QumodeCircuit.add`` consumes, registering their parameters in the circuit's
flat vector.

Reference simulation-detail flags (``cutoff``, ``den_mat``, ``noise``/
``mu``/``sigma``, ``requires_grad``) are accepted; backend-specific
representation choices are circuit-level properties here.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import cdtype, rdtype
from . import gates as PG
from .circuit import PhotonicOp
from .gates import PHOTONIC_REGISTRY, passive_xp_from_unitary

__all__ = [
    'PhaseShift', 'BeamSplitter', 'MZI', 'BeamSplitterTheta', 'BeamSplitterPhi',
    'BeamSplitterSingle', 'UAnyGate', 'Squeezing', 'Squeezing2', 'Displacement',
    'DisplacementPosition', 'DisplacementMomentum', 'QuadraticPhase',
    'ControlledX', 'ControlledZ', 'CubicPhase', 'Kerr', 'CrossKerr',
    'PhotonLoss', 'Delay', 'DelayBS', 'DelayMZI', 'Barrier',
]


def _wires(wires, default_n):
    if wires is None:
        wires = list(range(default_n))
    return [wires] if isinstance(wires, int) else list(wires)


def _standalone(name, wires, inputs, npara, unitary_fn=None, xp_fn=None,
                fock_fn=None, static_unitary=None, kind='gate', extra=None,
                requires_grad=None) -> PhotonicOp:
    extra = dict(extra or {})
    if requires_grad is None:
        requires_grad = inputs is None and npara > 0
    if npara:
        if inputs is None:
            values = [float(np.random.rand() * 2 * np.pi) for _ in range(npara)]
        else:
            values = [float(v) for v in np.asarray(inputs, np.float64).reshape(-1)]
        assert len(values) == npara, f'{name} expects {npara} parameters'
        extra['inputs'] = values
        extra['requires_grad'] = bool(requires_grad)
    return PhotonicOp(name, wires, (), npara, kind, unitary_fn, xp_fn, fock_fn,
                      static_unitary, extra)


def _registry_factory(name: str, default_nwires: int):
    reg = PHOTONIC_REGISTRY[name]

    def factory(inputs=None, nmode=None, wires=None, cutoff=None, den_mat=False,
                requires_grad=None, noise=False, mu=0, sigma=0.1, **kwargs):
        if noise or den_mat:
            import warnings
            warnings.warn(
                'noise/den_mat on a standalone photonic gate descriptor is '
                'accepted for reference-API parity but ignored: den_mat is a '
                'circuit-level property, and gate noise is a circuit-level '
                'property too — QumodeCircuit(noise=True) samples at build '
                'time, QumodeCircuit(noise=True, noise_per_forward=True) '
                'matches the reference per-forward jitter (COMPONENTS.md).',
                UserWarning, stacklevel=2)
        ws = _wires(wires, default_nwires)
        return _standalone(name, ws, inputs, reg['npara'],
                           unitary_fn=reg['unitary'], xp_fn=reg['xp'],
                           fock_fn=reg['fock'], requires_grad=requires_grad)

    factory.__name__ = name
    factory.__qualname__ = name
    factory.__doc__ = f'{name} photonic gate descriptor (class-style API).'
    return factory


_NWIRES = {'BeamSplitter': 2, 'MZI': 2, 'Squeezing2': 2, 'ControlledX': 2,
           'ControlledZ': 2, 'CrossKerr': 2}
for _name in PHOTONIC_REGISTRY:
    globals()[_name] = _registry_factory(_name, _NWIRES.get(_name, 1))


def BeamSplitterTheta(inputs=None, nmode=None, wires=None, phi: float = np.pi / 2,
                      requires_grad=None, **kwargs) -> PhotonicOp:
    """BS with trainable theta, fixed phi = pi/2 (reference photonic/gate.py:519)."""
    fn_u = lambda p: PG.bs_unitary(jnp.stack([p[0], jnp.asarray(phi, rdtype())]))
    return _standalone('BeamSplitterTheta', _wires(wires, 2), inputs, 1,
                       unitary_fn=fn_u,
                       xp_fn=lambda p: passive_xp_from_unitary(fn_u(p)),
                       fock_fn=lambda p, c: PG.bs_fock_from_unitary(fn_u(p), c),
                       requires_grad=requires_grad)


def BeamSplitterPhi(inputs=None, nmode=None, wires=None, theta: float = np.pi / 4,
                    requires_grad=None, **kwargs) -> PhotonicOp:
    """BS with trainable phi, fixed theta (reference photonic/gate.py BeamSplitterPhi)."""
    fn_u = lambda p: PG.bs_unitary(jnp.stack([jnp.asarray(theta, rdtype()), p[0]]))
    return _standalone('BeamSplitterPhi', _wires(wires, 2), inputs, 1,
                       unitary_fn=fn_u,
                       xp_fn=lambda p: passive_xp_from_unitary(fn_u(p)),
                       fock_fn=lambda p, c: PG.bs_fock_from_unitary(fn_u(p), c),
                       requires_grad=requires_grad)


def BeamSplitterSingle(inputs=None, nmode=None, wires=None, convention: str = 'rx',
                       requires_grad=None, **kwargs) -> PhotonicOp:
    """Single-parameter BS in rx/ry/h convention (reference photonic/gate.py BeamSplitterSingle)."""
    fn_u = lambda p, _c=convention: PG.bs_single_unitary(p, _c)
    return _standalone(f'BeamSplitterSingle_{convention}', _wires(wires, 2),
                       inputs, 1, unitary_fn=fn_u,
                       xp_fn=lambda p: passive_xp_from_unitary(fn_u(p)),
                       fock_fn=lambda p, c: PG.bs_fock_from_unitary(fn_u(p), c),
                       requires_grad=requires_grad)


def UAnyGate(unitary, nmode=None, wires=None, minmax=None, cutoff=None,
             name='UAnyGate', **kwargs) -> PhotonicOp:
    """Arbitrary passive linear-optical unitary (reference photonic/gate.py:938)."""
    u = np.asarray(unitary, dtype=np.complex128)
    k = u.shape[-1]
    if wires is None:
        if minmax is None:
            minmax = [0, k - 1]
        wires = list(range(minmax[0], minmax[1] + 1))
    wires = [wires] if isinstance(wires, int) else list(wires)
    return _standalone(name, wires, None, 0, static_unitary=u.astype(cdtype()))


def PhotonLoss(inputs=None, nmode=None, wires=0, requires_grad=None, **kwargs) -> PhotonicOp:
    """Photon loss channel, T = cos^2(theta/2) (reference photonic/channel.py:14)."""
    if inputs is None:
        inputs = [float(np.random.rand() * np.pi)]
    return _standalone('PhotonLoss', _wires(wires, 1), inputs, 1, kind='loss',
                       requires_grad=False)


def Delay(inputs=None, nmode=None, wires=0, ntau: int = 1, convention: str = 'bs',
          requires_grad=None, **kwargs) -> PhotonicOp:
    """Delay loop of ntau concurrent modes for TDM circuits
    (reference photonic/gate.py Delay; unrolled by QumodeCircuitTDM)."""
    assert convention in ('bs', 'mzi')
    # 2 params either way: BS-theta + loop PS-phi, or MZI theta/phi
    # (reference DelayBS/DelayMZI, photonic/gate.py:2486/2573)
    npara = 2
    wire = wires if isinstance(wires, int) else wires[0]
    return _standalone(f'Delay_{convention}', [wire], inputs, npara, kind='delay',
                       extra={'ntau': ntau, 'convention': convention},
                       requires_grad=requires_grad)


def DelayBS(inputs=None, nmode=None, wires=0, ntau: int = 1, **kwargs) -> PhotonicOp:
    """Delay loop with BS coupling (reference photonic/gate.py DelayBS)."""
    return Delay(inputs, nmode, wires, ntau, 'bs', **kwargs)


def DelayMZI(inputs=None, nmode=None, wires=0, ntau: int = 1, **kwargs) -> PhotonicOp:
    """Delay loop with MZI coupling (reference photonic/gate.py DelayMZI)."""
    return Delay(inputs, nmode, wires, ntau, 'mzi', **kwargs)


def Barrier(nmode=None, wires=None, **kwargs) -> PhotonicOp:
    """No-op scheduling barrier (reference photonic/operation.py Barrier)."""
    ws = _wires(wires, nmode if nmode is not None else 1)
    return PhotonicOp('Barrier', ws, (), 0, kind='barrier')
