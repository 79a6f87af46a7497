"""Wigner functions and quadrature/photon-number statistics for Fock/CV states.

Mirrors reference photonic/qmath.py:276-370 (statistics) and :633-790
(fock_to_wigner via the iterative Laguerre method, cv_to_wigner as a weighted
Gaussian sum). Plotting goes through matplotlib when plot=True.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from ..config import cdtype, rdtype
from ..ops.qmath import partial_trace

__all__ = ['fock_to_wigner', 'cv_to_wigner', 'quadrature_mean_fock', 'photon_number_mean_var_fock']


def photon_number_mean_var_fock(state, nmode: int, cutoff: int, wires, den_mat: bool = False):
    """Photon-number mean/variance per wire from a Fock tensor (reference qmath.py:315)."""
    state = jnp.asarray(state)
    c = cutoff
    if den_mat:
        rho = state.reshape(-1, c ** nmode, c ** nmode)
        prob = jnp.real(jnp.diagonal(rho, axis1=1, axis2=2)).reshape([-1] + [c] * nmode)
    else:
        if state.ndim == nmode:
            state = state[None]
        prob = jnp.abs(state.reshape([-1] + [c] * nmode)) ** 2
    n_op = jnp.arange(c)
    means, variances = [], []
    for w in wires:
        axes = tuple(j + 1 for j in range(nmode) if j != w)
        p_i = jnp.sum(prob, axis=axes)
        mean = jnp.sum(n_op * p_i, axis=-1)
        mean2 = jnp.sum(n_op ** 2 * p_i, axis=-1)
        means.append(mean)
        variances.append(mean2 - mean ** 2)
    return jnp.stack(means), jnp.stack(variances)


def quadrature_mean_fock(state, nmode: int, cutoff: int, wires, den_mat: bool = False):
    """<x> per wire from a Fock tensor (reference qmath.py:338)."""
    state = jnp.asarray(state)
    c = cutoff
    coef = 2 * config.KAPPA ** 2 / config.HBAR
    factor = jnp.sqrt(jnp.arange(1, c, dtype=rdtype()) / 2)
    means = []
    if den_mat:
        rho = state.reshape(-1, c ** nmode, c ** nmode)
        for w in wires:
            trace_lst = [i for i in range(nmode) if i != w]
            rdm = partial_trace(rho, nmode, trace_lst, c).reshape(-1, c, c)
            off = jnp.diagonal(rdm, offset=1, axis1=1, axis2=2)
            means.append(jnp.sum(factor * 2 * jnp.real(off), axis=1))
    else:
        if state.ndim == nmode:
            state = state[None]
        state = state.reshape([-1] + [c] * nmode)
        for w in wires:
            perm = [0, w + 1] + [j + 1 for j in range(nmode) if j != w]
            s = jnp.transpose(state, perm)
            cn = s[:, :-1]
            cn1 = s[:, 1:]
            f = factor.reshape([1, -1] + [1] * (nmode - 1))
            term = f * 2 * jnp.real(jnp.conj(cn) * cn1)
            means.append(jnp.sum(term, axis=tuple(range(1, nmode + 1))))
    return coef ** (-0.5) * jnp.stack(means)


def fock_to_wigner(state, wire: int, nmode: int, cutoff: int, den_mat: bool = False,
                   xrange=10, prange=10, npoints=100, plot: bool = True, k: int = 0):
    """Wigner function of one mode of a Fock state (reference qmath.py:633, qutip method)."""
    state = jnp.asarray(state)
    c = cutoff
    if den_mat:
        rho = state.reshape(-1, c ** nmode, c ** nmode)
    else:
        psi = state.reshape(-1, c ** nmode, 1)
        rho = psi @ jnp.conj(jnp.swapaxes(psi, -1, -2))
    trace_lst = [i for i in range(nmode) if i != wire]
    rdm = partial_trace(rho, nmode, trace_lst, c)
    if rdm.ndim == 2:
        rdm = rdm[None]
    xlist = [-xrange, xrange] if isinstance(xrange, int) else list(xrange)
    plist = [-prange, prange] if isinstance(prange, int) else list(prange)
    nx, npts = (npoints, npoints) if isinstance(npoints, int) else (npoints[0], npoints[1])
    xvec = np.linspace(xlist[0], xlist[1], nx)
    pvec = np.linspace(plist[0], plist[1], npts)
    coef = 2 * config.KAPPA ** 2 / config.HBAR
    gx, gp = np.meshgrid(xvec, pvec, indexing='ij')
    alpha = jnp.asarray(coef ** 0.5 * (gx + 1j * gp) / 2 ** 0.5, cdtype())
    w_list = [None] * c
    w_list[0] = jnp.asarray(coef * np.exp(-2 * np.abs(np.asarray(alpha)) ** 2) / np.pi, cdtype())
    w = rdm[:, 0, 0].reshape(-1, 1, 1) * w_list[0]
    for i in range(1, c):
        w_list[i] = 2 * alpha * w_list[i - 1] / np.sqrt(i)
        w = w + 2 * jnp.real(rdm[:, 0, i].reshape(-1, 1, 1) * w_list[i])
    for i in range(1, c):
        sqrt_i = i ** 0.5
        temp = w_list[i]
        w_list[i] = (2 * jnp.conj(alpha) * temp - sqrt_i * w_list[i - 1]) / sqrt_i
        w = w + rdm[:, i, i].reshape(-1, 1, 1) * w_list[i]
        for j in range(i + 1, c):
            sqrt_j = j ** 0.5
            temp2 = (2 * alpha * w_list[j - 1] - sqrt_i * temp) / sqrt_j
            temp = w_list[j]
            w_list[j] = temp2
            w = w + 2 * jnp.real(rdm[:, i, j].reshape(-1, 1, 1) * w_list[j])
    w = jnp.real(w)
    if plot:
        _plot_wigner(np.asarray(w), xvec, pvec, k)
    return w


def cv_to_wigner(state, wire, xrange=10, prange=10, npoints=100, plot: bool = True,
                 k: int = 0, normalize: bool = True):
    """Wigner function of one mode of a Gaussian/Bosonic state (reference qmath.py:713)."""
    cov = jnp.asarray(state[0])
    mean = jnp.asarray(state[1])
    xlist = [-xrange, xrange] if isinstance(xrange, int) else list(xrange)
    plist = [-prange, prange] if isinstance(prange, int) else list(prange)
    nx, npts = (npoints, npoints) if isinstance(npoints, int) else (npoints[0], npoints[1])
    xvec = np.linspace(xlist[0], xlist[1], nx)
    pvec = np.linspace(plist[0], plist[1], npts)
    gx, gp = np.meshgrid(xvec, pvec, indexing='ij')
    coords = jnp.asarray(np.stack([gx.reshape(-1), gp.reshape(-1)], axis=1), rdtype())  # (npts^2, 2)
    if cov.ndim == 2:
        cov = cov[None]
    if mean.ndim == 2:
        mean = mean[None]
    if cov.ndim == 3:
        cov = cov[:, None]
    if mean.ndim == 3:
        mean = mean[:, None]
    weight = jnp.asarray(state[2]) if len(state) > 2 else jnp.ones(cov.shape[:2], cdtype())
    nmode = cov.shape[-1] // 2
    idx = np.array([wire, wire + nmode])
    cov = cov[..., idx[:, None], idx]                     # (batch, ncomb, 2, 2)
    mean = mean[..., idx, :].astype(cdtype())
    cov_inv = jnp.linalg.inv(cov)
    det = jnp.linalg.det(2 * jnp.pi * cov)
    m_re = jnp.real(mean).astype(rdtype())
    m_im = jnp.imag(mean).astype(rdtype())
    # (batch, ncomb)
    exp_real = jnp.exp((jnp.swapaxes(m_im, -1, -2) @ cov_inv @ m_im) / 2).squeeze((-1, -2))
    diff = coords[None, :, None, :, None] - m_re[:, None]     # (batch, npts^2, ncomb, 2, 1)
    quad = (jnp.swapaxes(diff, -1, -2) @ cov_inv[:, None] @ diff).squeeze((-1, -2))
    prob_g = jnp.exp(-quad / 2) / jnp.sqrt(det)[:, None]
    phase = (jnp.swapaxes(diff, -1, -2).astype(cdtype())
             @ (cov_inv.astype(cdtype()) @ m_im.astype(cdtype()))[:, None]).squeeze((-1, -2))
    exp_imag = jnp.exp(1j * phase)
    vals = exp_real[:, None] * prob_g * exp_imag * weight[:, None]
    w = jnp.real(jnp.sum(vals, axis=-1)).reshape(-1, len(xvec), len(pvec))
    if normalize:
        dx = xvec[1] - xvec[0]
        dp = pvec[1] - pvec[0]
        total = jnp.sum(w, axis=(1, 2)) * dx * dp
        w = w / total.reshape(-1, 1, 1)
    if plot:
        _plot_wigner(np.asarray(w), xvec, pvec, k)
    return w


def _plot_wigner(w, xvec, pvec, k=0):
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots()
    cs = ax.contourf(xvec, pvec, w[k].T, levels=60, cmap='RdBu_r')
    ax.set_xlabel('x')
    ax.set_ylabel('p')
    fig.colorbar(cs)
    plt.show()
