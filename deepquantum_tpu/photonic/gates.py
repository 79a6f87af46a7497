"""Photonic gate library: creation-op unitaries, symplectic transforms, Fock matrices.

TPU-native counterpart of reference src/deepquantum/photonic/gate.py. Every
gate is three pure functions:

- ``*_unitary(p)``: k x k matrix on creation operators (passive gates only)
- ``*_xp(p)``: affine symplectic (matrix_xp, vector_xp) in xxpp ordering
- ``*_fock(p, cutoff)``: (cutoff,)*2k transformation tensor on Fock states

Fock matrices use the arXiv:2004.11002 recurrences (reference gate.py:347
Eq.74-75 for BS, gate.py:1091 Eq.51-52 for squeezing, gate.py:1431 Eq.57-58
for displacement, gate.py:1259 Eq.64-67 for two-mode squeezing) expressed as
``lax.scan`` over ranks — O(1) program size per gate and vectorized inner
steps instead of the reference's per-element Python loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from ..config import cdtype, rdtype

__all__ = ['PHOTONIC_REGISTRY']


def _r(x):
    return jnp.asarray(x, rdtype())


def _c(x):
    return jnp.asarray(x, dtype=cdtype())


def _sqrtn(cutoff):
    return jnp.sqrt(jnp.arange(cutoff, dtype=rdtype()))


def _shift0(x, axis):
    """Shift by one along axis, filling with zeros (x[m-1] indexing)."""
    return jnp.roll(x, 1, axis=axis).at[(slice(None),) * axis + (0,)].set(0)


# --------------------------------------------------------------- PhaseShift
def ps_unitary(p):
    return jnp.exp(1j * _c(p[0])).reshape(1, 1)


def ps_xp(p):
    theta = _r(p[0])
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack([cos, -sin, sin, cos]).reshape(2, 2), jnp.zeros((2, 1), rdtype())


def ps_fock(p, cutoff):
    n = jnp.arange(cutoff)
    return jnp.diag(jnp.exp(1j * _c(p[0]) * n))


# --------------------------------------------------------------- BeamSplitter family
def bs_unitary(p):
    """BS(theta, phi) on creation ops (reference gate.py:331-339)."""
    theta, phi = _r(p[0]), _r(p[1])
    cos = _c(jnp.cos(theta))
    sin = _c(jnp.sin(theta))
    return jnp.stack([cos, -jnp.exp(-1j * _c(phi)) * sin,
                      jnp.exp(1j * _c(phi)) * sin, cos]).reshape(2, 2)


def mzi_unitary(p, phi_first: bool = True):
    """MZI(theta, phi) (reference gate.py:505-517)."""
    theta, phi = _r(p[0]), _r(p[1])
    cos = _c(jnp.cos(theta / 2))
    sin = _c(jnp.sin(theta / 2))
    e_it = 1j * jnp.exp(1j * _c(theta) / 2)
    e_ip = jnp.exp(1j * _c(phi))
    if phi_first:
        mat = jnp.stack([e_ip * sin, cos, e_ip * cos, -sin]).reshape(2, 2)
    else:
        mat = jnp.stack([e_ip * sin, e_ip * cos, cos, -sin]).reshape(2, 2)
    return e_it * mat


def bs_single_unitary(p, convention: str = 'rx'):
    """BS with rx/ry/h conventions, half-angle (reference gate.py:825-837)."""
    theta = _r(p[0])
    cos = _c(jnp.cos(theta / 2))
    sin = _c(jnp.sin(theta / 2))
    if convention == 'rx':
        return jnp.stack([cos, 1j * sin, 1j * sin, cos]).reshape(2, 2)
    if convention == 'ry':
        return jnp.stack([cos, -sin, sin, cos]).reshape(2, 2)
    if convention == 'h':
        return jnp.stack([cos, sin, sin, -cos]).reshape(2, 2)
    raise ValueError(f'Unknown convention {convention}')


def passive_xp_from_unitary(u):
    """Symplectic of a passive unitary: [[Re, -Im], [Im, Re]] (reference gate.py:376)."""
    k = u.shape[-1]
    m = jnp.concatenate([
        jnp.concatenate([jnp.real(u), -jnp.imag(u)], axis=-1),
        jnp.concatenate([jnp.imag(u), jnp.real(u)], axis=-1),
    ], axis=-2)
    return m, jnp.zeros((2 * k, 1), rdtype())


def bs_fock_from_unitary(u, cutoff):
    """Two-mode Fock tensor from a 2x2 creation-op matrix via Eq.74-75
    (reference gate.py:347-373), as two lax.scans."""
    sqrt = _sqrtn(cutoff)
    inv = jnp.where(sqrt > 0, 1 / jnp.where(sqrt > 0, sqrt, 1), 0)
    # rank 3: R[p][m, n] nonzero iff m + n == p
    r0 = jnp.zeros((cutoff, cutoff), cdtype()).at[0, 0].set(1)

    def rank3_step(r_prev, p_idx):
        term_m = sqrt[:, None] * u[0, 0] * _shift0(r_prev, 0)
        term_n = sqrt[None, :] * u[1, 0] * _shift0(r_prev, 1)
        r_new = inv[p_idx] * (term_m + term_n)
        return r_new, r_new

    _, r_rest = jax.lax.scan(rank3_step, r0, jnp.arange(1, cutoff))
    rank3 = jnp.concatenate([r0[None], r_rest], axis=0)  # (p, m, n)
    rank3 = jnp.transpose(rank3, (1, 2, 0))              # (m, n, p)

    # rank 4: S[q][m, n, p], S[0] = rank3
    def rank4_step(s_prev, q_idx):
        term_m = sqrt[:, None, None] * u[0, 1] * _shift0(s_prev, 0)
        term_n = sqrt[None, :, None] * u[1, 1] * _shift0(s_prev, 1)
        s_new = inv[q_idx] * (term_m + term_n)
        return s_new, s_new

    _, s_rest = jax.lax.scan(rank4_step, rank3, jnp.arange(1, cutoff))
    full = jnp.concatenate([rank3[None], s_rest], axis=0)  # (q, m, n, p)
    return jnp.transpose(full, (1, 2, 3, 0))               # (m, n, p, q)


def bs_fock(p, cutoff):
    return bs_fock_from_unitary(bs_unitary(p), cutoff)


def mzi_fock(p, cutoff, phi_first=True):
    return bs_fock_from_unitary(mzi_unitary(p, phi_first), cutoff)


def bs_single_fock(p, cutoff, convention='rx'):
    return bs_fock_from_unitary(bs_single_unitary(p, convention), cutoff)


# --------------------------------------------------------------- Squeezing
def squeeze_xp(p):
    """S(r, theta) symplectic (reference gate.py:1120-1129)."""
    r, theta = _r(p[0]), _r(p[1])
    ch, sh = jnp.cosh(r), jnp.sinh(r)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    m = jnp.stack([ch - sh * cos, -sh * sin, -sh * sin, ch + sh * cos]).reshape(2, 2)
    return m, jnp.zeros((2, 1), rdtype())


def squeeze_fock(p, cutoff):
    """S(r, theta) Fock matrix via Eq.51-52 (reference gate.py:1091-1114)."""
    r, theta = _r(p[0]), _r(p[1])
    sqrt = _sqrtn(cutoff)
    inv = jnp.where(sqrt > 0, 1 / jnp.where(sqrt > 0, sqrt, 1), 0)
    sech = 1 / jnp.cosh(r)
    e_it_tanh = jnp.exp(1j * _c(theta)) * jnp.tanh(r)
    e_m_it_tanh = jnp.exp(-1j * _c(theta)) * jnp.tanh(r)
    # column 0: T[m,0]; only even m: T[m+1,0] = -sqrt[m]/sqrt[m+1] e_it_tanh T[m-1,0]
    def col0_step(prev, m):
        new = -sqrt[m] * inv[m + 1] * e_it_tanh * prev
        return new, new
    seed = jnp.sqrt(sech).astype(cdtype())
    _, evens = jax.lax.scan(col0_step, seed, jnp.arange(1, cutoff - 1, 2))
    col0 = jnp.zeros(cutoff, cdtype()).at[0].set(seed)
    col0 = col0.at[jnp.arange(2, cutoff, 2)].set(evens[: (cutoff - 1) // 2])
    # columns: T[:, n+1] = inv[n+1] * (sqrt_m * sech * T[m-1, n] + sqrt[n] e_m_it_tanh T[:, n-1])
    def col_step(carry, n):
        col_n, col_nm1 = carry
        new = inv[n + 1] * (sqrt * sech * _shift0(col_n, 0) + sqrt[n] * e_m_it_tanh * col_nm1)
        return (new, col_n), new
    _, cols = jax.lax.scan(col_step, (col0, jnp.zeros_like(col0)), jnp.arange(cutoff - 1))
    return jnp.concatenate([col0[:, None], cols.T], axis=1)


def squeeze2_xp(p):
    """S2(r, theta) symplectic (reference gate.py:1296-1311)."""
    r, theta = _r(p[0]), _r(p[1])
    ch, sh = jnp.cosh(r), jnp.sinh(r)
    cs, ss = jnp.cos(theta) * sh, jnp.sin(theta) * sh
    z = jnp.zeros((), rdtype())
    m = jnp.stack([
        ch, cs, z, ss,
        cs, ch, ss, z,
        z, ss, ch, -cs,
        ss, z, -cs, ch,
    ]).reshape(4, 4)
    return m, jnp.zeros((4, 1), rdtype())


def squeeze2_fock(p, cutoff):
    """S2(r, theta) Fock tensor via Eq.64-67 (reference gate.py:1259-1292)."""
    r, theta = _r(p[0]), _r(p[1])
    sqrt = _sqrtn(cutoff)
    inv = jnp.where(sqrt > 0, 1 / jnp.where(sqrt > 0, sqrt, 1), 0)
    sech = _c(1 / jnp.cosh(r))
    e_it_tanh = jnp.exp(1j * _c(theta)) * jnp.tanh(r)
    e_m_it_tanh = jnp.exp(-1j * _c(theta)) * jnp.tanh(r)
    # rank 2 diagonal: T[n,n,0,0] = sech * e_it_tanh^n
    diag = sech * e_it_tanh ** jnp.arange(cutoff)
    base = jnp.diag(diag)  # (m, n) at p=0
    # rank 3: R[p][m,n] = sech sqrt[m]/sqrt[p] R[p-1][m-1,n]
    def rank3_step(r_prev, p_idx):
        new = sech * sqrt[:, None] * inv[p_idx] * _shift0(r_prev, 0)
        return new, new
    _, r_rest = jax.lax.scan(rank3_step, base, jnp.arange(1, cutoff))
    rank3 = jnp.concatenate([base[None], r_rest], axis=0)   # (p, m, n)
    rank3 = jnp.transpose(rank3, (1, 2, 0))                  # (m, n, p)
    # rank 4: S[q][m,n,p] = sech sqrt[n]/sqrt[q] S[q-1][m,n-1,p] - e_m_it_tanh sqrt[p]/sqrt[q] S[q-1][m,n,p-1]
    def rank4_step(s_prev, q_idx):
        t1 = sech * sqrt[None, :, None] * _shift0(s_prev, 1)
        t2 = e_m_it_tanh * sqrt[None, None, :] * _shift0(s_prev, 2)
        new = inv[q_idx] * (t1 - t2)
        return new, new
    _, s_rest = jax.lax.scan(rank4_step, rank3, jnp.arange(1, cutoff))
    full = jnp.concatenate([rank3[None], s_rest], axis=0)    # (q, m, n, p)
    return jnp.transpose(full, (1, 2, 3, 0))                 # (m, n, p, q)


# --------------------------------------------------------------- Displacement
def disp_xp(p):
    """D(r, theta): identity + displacement (reference gate.py:1457-1464)."""
    r, theta = _r(p[0]), _r(p[1])
    vec = jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)]).reshape(2, 1)
    vec = vec * config.HBAR ** 0.5 / config.KAPPA
    return jnp.eye(2, dtype=rdtype()), vec


def disp_fock(p, cutoff):
    """D(r, theta) Fock matrix via Eq.57-58 (reference gate.py:1431-1452)."""
    r, theta = _r(p[0]), _r(p[1])
    sqrt = _sqrtn(cutoff)
    inv = jnp.where(sqrt > 0, 1 / jnp.where(sqrt > 0, sqrt, 1), 0)
    alpha = _c(r) * jnp.exp(1j * _c(theta))
    alpha_c = _c(r) * jnp.exp(-1j * _c(theta))
    # column 0: T[m,0] = e^{-r^2/2} alpha^m / sqrt(m!)
    ratios = alpha * inv  # ratios[m] = alpha / sqrt(m); ratios[0] unused
    col0 = jnp.exp(-_c(r) ** 2 / 2) * jnp.concatenate([
        jnp.ones(1, cdtype()), jnp.cumprod(ratios[1:])])
    def col_step(col_n, n):
        new = inv[n + 1] * (-alpha_c * col_n + sqrt * _shift0(col_n, 0))
        return new, new
    _, cols = jax.lax.scan(col_step, col0, jnp.arange(cutoff - 1))
    return jnp.concatenate([col0[:, None], cols.T], axis=1)


def disp_position_xp(p):
    """X(x): displacement along x (reference gate.py:1492)."""
    x = _r(p[0])
    vec = jnp.stack([x, jnp.zeros((), rdtype())]).reshape(2, 1)
    return jnp.eye(2, dtype=rdtype()), vec


def disp_position_fock(p, cutoff):
    x = _r(p[0])
    r = jnp.abs(x) * config.KAPPA / config.HBAR ** 0.5
    theta = jnp.where(x >= 0, 0.0, jnp.pi).astype(rdtype())
    return disp_fock(jnp.stack([r, theta]), cutoff)


def disp_momentum_xp(p):
    """Z(z): displacement along p (reference gate.py:1576)."""
    z = _r(p[0])
    vec = jnp.stack([jnp.zeros((), rdtype()), z]).reshape(2, 1)
    return jnp.eye(2, dtype=rdtype()), vec


def disp_momentum_fock(p, cutoff):
    z = _r(p[0])
    r = jnp.abs(z) * config.KAPPA / config.HBAR ** 0.5
    theta = jnp.where(z >= 0, jnp.pi / 2, -jnp.pi / 2).astype(rdtype())
    return disp_fock(jnp.stack([r, theta]), cutoff)


# --------------------------------------------------------------- Quadratic/cubic/Kerr
def quad_phase_xp(p):
    """P(s): [[1, 0], [s, 1]] (reference gate.py:1794-1801)."""
    s = _r(p[0])
    one = jnp.ones((), rdtype())
    zero = jnp.zeros((), rdtype())
    return jnp.stack([one, zero, s, one]).reshape(2, 2), jnp.zeros((2, 1), rdtype())


def quad_phase_fock(p, cutoff):
    """P(s) = PS(theta) S(r, phi) decomposition (reference gate.py:1779-1791)."""
    s = _r(p[0])
    r = jnp.arccosh(jnp.sqrt(1 + s ** 2 / 4))
    theta = jnp.arctan(s / 2)
    phi = -jnp.sign(s) * jnp.pi / 2 - theta
    mat_s = squeeze_fock(jnp.stack([r, phi]), cutoff)
    mat_ps = ps_fock(theta[None], cutoff)
    return mat_ps @ mat_s


def cx_xp(p):
    """CV controlled-X (reference gate.py:1979-1988)."""
    s = _r(p[0])
    one = jnp.ones((), rdtype())
    zero = jnp.zeros((), rdtype())
    m = jnp.stack([
        one, zero, zero, zero,
        s, one, zero, zero,
        zero, zero, one, -s,
        zero, zero, zero, one,
    ]).reshape(4, 4)
    return m, jnp.zeros((4, 1), rdtype())


def cx_fock(p, cutoff):
    """CX(s) via BS/S/S/BS decomposition (reference gate.py:1961-1976)."""
    s = _r(p[0])
    zero = jnp.zeros((), rdtype())
    r = jnp.arcsinh(-s / 2)
    theta = jnp.arctan2(-1 / jnp.cosh(r), -jnp.tanh(r)) / 2
    mat_bs1 = bs_fock(jnp.stack([theta, zero]), cutoff)
    mat_s1 = squeeze_fock(jnp.stack([r, zero]), cutoff)
    mat_s2 = squeeze_fock(jnp.stack([-r, zero]), cutoff)
    mat_bs2 = bs_fock(jnp.stack([theta + jnp.pi / 2, zero]), cutoff)
    return jnp.einsum('abcd,ce,df,efgh->abgh', mat_bs2, mat_s1, mat_s2, mat_bs1)


def cz_xp(p):
    """CV controlled-Z (reference gate.py:2159-2169)."""
    s = _r(p[0])
    m = jnp.eye(4, dtype=rdtype())
    m = m.at[2, 1].set(s).at[3, 0].set(s)
    return m, jnp.zeros((4, 1), rdtype())


def cz_fock(p, cutoff):
    """CZ(s) = (I x PS(pi/2)) CX(s) (I x PS(-pi/2)) (reference gate.py:2144-2155)."""
    theta = jnp.array(jnp.pi / 2, rdtype())
    mat_ps1 = ps_fock(-theta[None], cutoff)
    mat_cx = cx_fock(p, cutoff)
    mat_ps2 = ps_fock(theta[None], cutoff)
    return jnp.einsum('an,mnkl,lb->makb', mat_ps2, mat_cx, mat_ps1)


def cubic_phase_fock(p, cutoff):
    """V(gamma) = exp(i gamma x^3 / 3 hbar) (reference gate.py:2264-2269)."""
    from .qmath import ladder_ops
    gamma = _r(p[0])
    a, ad = ladder_ops(cutoff)
    x = (jnp.asarray(a) + jnp.asarray(ad)) * config.HBAR ** 0.5 / (2 * config.KAPPA)
    x3 = x @ x @ x
    return jax.scipy.linalg.expm(1j * _c(gamma) * x3 / (3 * config.HBAR))


def kerr_fock(p, cutoff):
    """K(kappa) = exp(i kappa n^2) (reference gate.py:2460-2465)."""
    n = jnp.arange(cutoff)
    return jnp.diag(jnp.exp(1j * _c(p[0]) * n ** 2))


def cross_kerr_fock(p, cutoff):
    """CK(kappa) = exp(i kappa n1 n2) (reference gate.py:2459-2465)."""
    n = jnp.arange(cutoff)
    n1n2 = jnp.kron(n, n)
    return jnp.diag(jnp.exp(1j * _c(p[0]) * n1n2)).reshape([cutoff] * 4)


def uany_fock_np(matrix: np.ndarray, nt: int, cutoff: int) -> np.ndarray:
    """Fock tensor of an arbitrary nt-mode unitary via the Eq.(71) recurrence
    (reference gate.py:938-967). Host-side numpy: UAnyGate is non-parametric,
    so this is computed once and cached as a static matrix."""
    import itertools
    sqrt = np.sqrt(np.arange(cutoff))
    tran = np.zeros([cutoff] * (2 * nt), dtype=np.complex128)
    tran[tuple([0] * 2 * nt)] = 1.0
    for rank in range(nt + 1, 2 * nt + 1):
        col = rank - nt - 1
        mj = matrix[:, col]
        for modes in itertools.product(range(cutoff), repeat=rank - 1):
            mode_out = modes[:nt]
            mode_in_part = modes[nt:]
            in_rest = sum(mode_out) - sum(mode_in_part)
            if 0 < in_rest < cutoff:
                state = list(modes) + [in_rest] + [0] * (2 * nt - rank)
                tot = 0
                for i in range(nt):
                    pre = list(state)
                    pre[i] -= 1
                    pre[len(modes)] -= 1
                    if pre[i] >= 0:
                        tot += mj[i] * sqrt[modes[i]] * tran[tuple(pre)]
                tran[tuple(state)] = tot / sqrt[in_rest]
    return tran


# registry: name -> dict(nwires, npara, unitary, xp, fock)
PHOTONIC_REGISTRY = {
    'PhaseShift': dict(nwires=1, npara=1, unitary=ps_unitary, xp=ps_xp, fock=ps_fock),
    'BeamSplitter': dict(nwires=2, npara=2, unitary=bs_unitary,
                         xp=lambda p: passive_xp_from_unitary(bs_unitary(p)), fock=bs_fock),
    'MZI': dict(nwires=2, npara=2, unitary=mzi_unitary,
                xp=lambda p: passive_xp_from_unitary(mzi_unitary(p)), fock=mzi_fock),
    'Squeezing': dict(nwires=1, npara=2, unitary=None, xp=squeeze_xp, fock=squeeze_fock),
    'Squeezing2': dict(nwires=2, npara=2, unitary=None, xp=squeeze2_xp, fock=squeeze2_fock),
    'Displacement': dict(nwires=1, npara=2, unitary=None, xp=disp_xp, fock=disp_fock),
    'DisplacementPosition': dict(nwires=1, npara=1, unitary=None, xp=disp_position_xp,
                                 fock=disp_position_fock),
    'DisplacementMomentum': dict(nwires=1, npara=1, unitary=None, xp=disp_momentum_xp,
                                 fock=disp_momentum_fock),
    'QuadraticPhase': dict(nwires=1, npara=1, unitary=None, xp=quad_phase_xp, fock=quad_phase_fock),
    'ControlledX': dict(nwires=2, npara=1, unitary=None, xp=cx_xp, fock=cx_fock),
    'ControlledZ': dict(nwires=2, npara=1, unitary=None, xp=cz_xp, fock=cz_fock),
    'CubicPhase': dict(nwires=1, npara=1, unitary=None, xp=None, fock=cubic_phase_fock),
    'Kerr': dict(nwires=1, npara=1, unitary=None, xp=None, fock=kerr_fock),
    'CrossKerr': dict(nwires=2, npara=1, unitary=None, xp=None, fock=cross_kerr_fock),
}
