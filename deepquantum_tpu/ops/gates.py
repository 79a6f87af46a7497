"""Qubit gate matrix library — pure jnp functions.

Every gate is a pure function ``params -> (2^k, 2^k) complex matrix`` so that
gate construction traces cleanly under ``jit``/``vmap``/``grad``. This replaces
the reference's nn.Module gate classes with their ``get_matrix`` methods
(reference: src/deepquantum/gate.py), keeping identical matrix conventions:

- U3(theta, phi, lambda): gate.py:523 docstring matrix
- PhaseShift diag(1, e^{i theta}): gate.py:677
- Rx/Ry/Rz with half-angle convention: gate.py:1443/1538/1634
- Rxx/Ryy/Rzz/Rxy two-qubit rotations: gate.py:2139-2366
- ReconfigurableBeamSplitter (full-angle real Givens in the {01,10} block): gate.py:2457
- ProjectionJ measurement gates for the MBQC planes: gate.py:1751
- HamiltonianGate exp(-i H t): gate.py:2990
- LatentGate polar-projected unitary: gate.py:2836
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import cdtype, rdtype

__all__ = [
    'u3_matrix', 'phaseshift_matrix', 'identity_matrix', 'paulix_matrix', 'pauliy_matrix',
    'pauliz_matrix', 'hadamard_matrix', 's_matrix', 'sdg_matrix', 't_matrix', 'tdg_matrix',
    'rx_matrix', 'ry_matrix', 'rz_matrix', 'projection_j_matrix', 'cnot_matrix', 'swap_matrix',
    'iswap_matrix', 'rxx_matrix', 'ryy_matrix', 'rzz_matrix', 'rxy_matrix', 'rbs_matrix',
    'toffoli_matrix', 'fredkin_matrix', 'hamiltonian_matrix', 'latent_matrix', 'cz_matrix',
]


def _c(x):
    return jnp.asarray(x, dtype=cdtype())


def u3_matrix(theta, phi, lambd):
    theta = jnp.asarray(theta, rdtype())
    phi = jnp.asarray(phi, rdtype())
    lambd = jnp.asarray(lambd, rdtype())
    cos = jnp.cos(theta / 2)
    sin = jnp.sin(theta / 2)
    e_ip = jnp.exp(1j * _c(phi))
    e_il = jnp.exp(1j * _c(lambd))
    return jnp.stack([
        _c(cos), -e_il * sin,
        e_ip * sin, e_ip * e_il * cos,
    ]).reshape(2, 2)


def phaseshift_matrix(theta):
    theta = jnp.asarray(theta, rdtype())
    one = jnp.ones((), cdtype())
    zero = jnp.zeros((), cdtype())
    return jnp.stack([one, zero, zero, jnp.exp(1j * _c(theta))]).reshape(2, 2)


def identity_matrix():
    return np.eye(2, dtype=cdtype())


def paulix_matrix():
    return np.array([[0, 1], [1, 0]], dtype=cdtype())


def pauliy_matrix():
    return np.array([[0, -1j], [1j, 0]], dtype=cdtype())


def pauliz_matrix():
    return np.array([[1, 0], [0, -1]], dtype=cdtype())


def hadamard_matrix():
    return np.array([[1, 1], [1, -1]], dtype=cdtype()) / np.sqrt(2.0)


def s_matrix():
    return np.array([[1, 0], [0, 1j]], dtype=cdtype())


def sdg_matrix():
    return np.array([[1, 0], [0, -1j]], dtype=cdtype())


def t_matrix():
    return np.array([[1, 0], [0, (1 + 1j) / 2 ** 0.5]], dtype=cdtype())


def tdg_matrix():
    return np.array([[1, 0], [0, (1 - 1j) / 2 ** 0.5]], dtype=cdtype())


def rx_matrix(theta):
    theta = jnp.asarray(theta, rdtype())
    cos = _c(jnp.cos(theta / 2))
    isin = 1j * _c(jnp.sin(theta / 2))
    return jnp.stack([cos, -isin, -isin, cos]).reshape(2, 2)


def ry_matrix(theta):
    theta = jnp.asarray(theta, rdtype())
    cos = _c(jnp.cos(theta / 2))
    sin = _c(jnp.sin(theta / 2))
    return jnp.stack([cos, -sin, sin, cos]).reshape(2, 2)


def rz_matrix(theta):
    theta = jnp.asarray(theta, rdtype())
    e_m = jnp.exp(-1j * _c(theta) / 2)
    e_p = jnp.exp(1j * _c(theta) / 2)
    zero = jnp.zeros((), cdtype())
    return jnp.stack([e_m, zero, zero, e_p]).reshape(2, 2)


def projection_j_matrix(theta, plane: str = 'xy'):
    """J-measurement gate for MBQC (reference: gate.py:1751-1768)."""
    theta = jnp.asarray(theta, rdtype())
    plane = plane.lower()
    if plane in ('xy', 'yx'):
        one = jnp.ones((), cdtype())
        e_m = jnp.exp(-1j * _c(theta))
        return jnp.stack([one, e_m, one, -e_m]).reshape(2, 2) / 2 ** 0.5
    elif plane in ('yz', 'zy'):
        c_p_s = _c(jnp.cos(theta / 2) + jnp.sin(theta / 2))
        c_m_s = _c(jnp.cos(theta / 2) - jnp.sin(theta / 2))
        return jnp.stack([c_p_s, -1j * c_m_s, c_m_s, 1j * c_p_s]).reshape(2, 2) / 2 ** 0.5
    elif plane in ('zx', 'xz'):
        cos = _c(jnp.cos(theta / 2))
        sin = _c(jnp.sin(theta / 2))
        return jnp.stack([cos, sin, sin, -cos]).reshape(2, 2)
    else:
        raise ValueError(f'Unsupported measurement plane: {plane}')


def cnot_matrix():
    return np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]], dtype=cdtype())


def cz_matrix():
    return np.diag(np.array([1, 1, 1, -1], dtype=cdtype()))


def swap_matrix():
    return np.array([[1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], dtype=cdtype())


def iswap_matrix():
    return np.array([[1, 0, 0, 0], [0, 0, 1j, 0], [0, 1j, 0, 0], [0, 0, 0, 1]], dtype=cdtype())


def rxx_matrix(theta):
    theta = jnp.asarray(theta, rdtype())
    cos = _c(jnp.cos(theta / 2))
    isin = 1j * _c(jnp.sin(theta / 2))
    z = jnp.zeros((), cdtype())
    return jnp.stack([
        cos, z, z, -isin,
        z, cos, -isin, z,
        z, -isin, cos, z,
        -isin, z, z, cos,
    ]).reshape(4, 4)


def ryy_matrix(theta):
    theta = jnp.asarray(theta, rdtype())
    cos = _c(jnp.cos(theta / 2))
    isin = 1j * _c(jnp.sin(theta / 2))
    z = jnp.zeros((), cdtype())
    return jnp.stack([
        cos, z, z, isin,
        z, cos, -isin, z,
        z, -isin, cos, z,
        isin, z, z, cos,
    ]).reshape(4, 4)


def rzz_matrix(theta):
    theta = jnp.asarray(theta, rdtype())
    e_m = jnp.exp(-1j * _c(theta) / 2)
    e_p = jnp.exp(1j * _c(theta) / 2)
    return jnp.diag(jnp.stack([e_m, e_p, e_p, e_m]))


def rxy_matrix(theta):
    theta = jnp.asarray(theta, rdtype())
    cos = _c(jnp.cos(theta / 2))
    isin = 1j * _c(jnp.sin(theta / 2))
    one = jnp.ones((), cdtype())
    z = jnp.zeros((), cdtype())
    return jnp.stack([
        one, z, z, z,
        z, cos, -isin, z,
        z, -isin, cos, z,
        z, z, z, one,
    ]).reshape(4, 4)


def rbs_matrix(theta):
    """Reconfigurable beam splitter (full-angle Givens, reference: gate.py:2455-2462)."""
    theta = jnp.asarray(theta, rdtype())
    cos = _c(jnp.cos(theta))
    sin = _c(jnp.sin(theta))
    one = jnp.ones((), cdtype())
    z = jnp.zeros((), cdtype())
    return jnp.stack([
        one, z, z, z,
        z, cos, sin, z,
        z, -sin, cos, z,
        z, z, z, one,
    ]).reshape(4, 4)


def toffoli_matrix():
    m = np.eye(8, dtype=cdtype())
    m[6:8, 6:8] = np.array([[0, 1], [1, 0]])
    return m


def fredkin_matrix():
    m = np.eye(8, dtype=cdtype())
    m[5:7, 5:7] = np.array([[0, 1], [1, 0]])
    return m


def hamiltonian_matrix(ham, t):
    """exp(-i H t) (reference: gate.py:2990-2994)."""
    ham = jnp.asarray(ham, cdtype())
    t = _c(t)
    return jax.scipy.linalg.expm(-1j * ham * t)


def latent_matrix(latent):
    """Closest unitary to an arbitrary latent matrix via polar projection U Vh (reference: gate.py:2836-2840)."""
    latent = jnp.asarray(latent, cdtype())
    u, _, vh = jnp.linalg.svd(latent)
    return u @ vh
