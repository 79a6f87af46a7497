"""Photonic state containers (reference src/deepquantum/photonic/state.py).

FockState: basis ints (hashable, dict keys) or dense cutoff^n tensor.
GaussianState: (cov, mean) in xxpp ordering, hbar=2, kappa=2^-1/2 defaults.
BosonicState: weighted superposition of Gaussians (cov, mean, weight);
CatState / GKPState / FockStateBosonic are constructors for common cases.
All arrays are host (numpy) until they cross into a jitted program.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from .. import config
from ..config import cdtype, rdtype

__all__ = ['FockState', 'GaussianState', 'BosonicState', 'CatState', 'GKPState', 'FockStateBosonic']


class FockState:
    """A Fock state: basis ints (basis=True) or a dense state tensor.

    Mirrors reference photonic/state.py:20-178 (hashable for dict keys).
    """

    def __init__(self, state: Any, nmode: int | None = None, cutoff: int | None = None,
                 basis: bool = True, den_mat: bool = False) -> None:
        self.basis = basis
        self.den_mat = den_mat
        if basis:
            if isinstance(state, FockState):
                state = state.state
            state = np.asarray(state, dtype=np.int64).reshape(-1)
            if nmode is None:
                nmode = len(state)
            if len(state) < nmode:
                state = np.concatenate([np.zeros(nmode - len(state), dtype=np.int64), state])
            state = state[:nmode]
            if cutoff is None:
                cutoff = int(state.sum()) + 1
            self.state = state
        else:
            if isinstance(state, FockState):
                state = state.state
            if isinstance(state, (list, tuple)) and np.asarray(state).ndim == 1:
                # basis ints -> dense tensor
                ints = np.asarray(state, dtype=np.int64)
                if nmode is None:
                    nmode = len(ints)
                if cutoff is None:
                    cutoff = int(ints.sum()) + 1
                dense = np.zeros([cutoff] * nmode, dtype=cdtype())
                dense[tuple(ints)] = 1
                if den_mat:
                    flat = dense.reshape(-1, 1)
                    dense = (flat @ flat.conj().T).reshape([cutoff] * (2 * nmode))
                self.state = dense
            else:
                state = np.asarray(state)
                if nmode is None:
                    nmode = state.ndim if not den_mat else state.ndim // 2
                if cutoff is None:
                    cutoff = state.shape[-1]
                self.state = state.astype(cdtype()) if isinstance(state, np.ndarray) else state
        self.nmode = nmode
        self.cutoff = cutoff

    def __hash__(self):
        if self.basis:
            return hash(tuple(self.state.tolist()))
        return id(self)

    def __eq__(self, other):
        if not isinstance(other, FockState):
            return NotImplemented
        if self.basis and other.basis:
            return self.nmode == other.nmode and list(self.state) == list(other.state)
        return self is other

    def __repr__(self):
        if self.basis:
            return '|' + ''.join(str(int(i)) for i in self.state) + '>'
        return f'FockState(tensor, nmode={self.nmode}, cutoff={self.cutoff})'

    __str__ = __repr__


class GaussianState:
    """Gaussian state: covariance + mean in xxpp (reference photonic/state.py:179)."""

    def __init__(self, state: Any = 'vac', nmode: int | None = None, cutoff: int | None = None) -> None:
        if isinstance(state, str) and state == 'vac':
            if nmode is None:
                nmode = 1
            cov = np.eye(2 * nmode) * config.HBAR / (4 * config.KAPPA ** 2)
            mean = np.zeros((2 * nmode, 1))
        else:
            cov, mean = state[0], state[1]
            cov = np.asarray(cov, dtype=np.float64)
            mean = np.asarray(mean, dtype=np.float64)
            if nmode is None:
                nmode = cov.shape[-1] // 2
        cov = cov.reshape(-1, 2 * nmode, 2 * nmode).astype(rdtype())
        mean = mean.reshape(-1, 2 * nmode, 1).astype(rdtype())
        self.cov = cov
        self.mean = mean
        self.nmode = nmode
        self.cutoff = 5 if cutoff is None else cutoff

    def check_purity(self, rtol: float = 3e-4, atol: float = 3e-4) -> bool:
        """Purity via slogdet (reference photonic/state.py:222)."""
        sign, log_det = np.linalg.slogdet(4 * config.KAPPA ** 2 / config.HBAR * np.asarray(self.cov))
        return bool((sign > 0).all() and np.allclose(log_det, 0, rtol=rtol, atol=atol))

    @property
    def is_pure(self) -> bool:
        return self.check_purity()


class BosonicState:
    """Weighted linear combination of Gaussian states (reference photonic/state.py:276).

    cov: (batch, ncomb, 2n, 2n), mean: (batch, ncomb, 2n, 1) complex,
    weight: (batch, ncomb) complex.
    """

    def __init__(self, state: Any = 'vac', nmode: int | None = None, cutoff: int | None = None) -> None:
        if isinstance(state, str) and state == 'vac':
            if nmode is None:
                nmode = 1
            cov = np.eye(2 * nmode) * config.HBAR / (4 * config.KAPPA ** 2)
            mean = np.zeros((2 * nmode, 1))
            weight = np.ones(1)
        else:
            cov, mean, weight = state[0], state[1], state[2]
            cov = np.asarray(cov)
            mean = np.asarray(mean)
            weight = np.asarray(weight)
            if nmode is None:
                nmode = cov.shape[-1] // 2
        ncomb = weight.reshape(-1).shape[0] if np.asarray(weight).ndim <= 1 else weight.shape[-1]
        cov = np.broadcast_to(cov.reshape(-1, 2 * nmode, 2 * nmode),
                              (max(1, cov.size // (4 * nmode * nmode)), 2 * nmode, 2 * nmode))
        cov = cov.reshape(-1, 2 * nmode, 2 * nmode)
        if cov.shape[0] == 1 and ncomb > 1:
            cov = np.repeat(cov, ncomb, axis=0)
        cov = cov.reshape(1, -1, 2 * nmode, 2 * nmode).astype(rdtype())
        mean = mean.reshape(1, -1, 2 * nmode, 1).astype(cdtype())
        weight = weight.reshape(1, -1).astype(cdtype())
        self.cov = cov
        self.mean = mean
        self.weight = weight
        self.nmode = nmode
        self.cutoff = 5 if cutoff is None else cutoff

    @property
    def ncomb(self) -> int:
        return self.weight.shape[-1]


def CatState(r: float = None, theta: float = None, p: int = 1, cutoff: int | None = None) -> BosonicState:
    """Single-mode cat state as 4 weighted Gaussians (reference photonic/state.py:415,
    arXiv:2103.05530 Sec. IV B)."""
    hbar, kappa = config.HBAR, config.KAPPA
    if r is None:
        r = float(np.random.rand())
    if theta is None:
        theta = float(np.random.rand() * 2 * np.pi)
    covs = np.eye(2) * hbar / (4 * kappa ** 2)
    re = r * np.cos(theta)
    im = r * np.sin(theta)
    scale = hbar ** 0.5 / kappa
    means = np.stack([
        np.array([re, im], dtype=complex),
        -np.array([re, im], dtype=complex),
        1j * np.array([im, -re], dtype=complex),
        -1j * np.array([im, -re], dtype=complex),
    ]) * scale
    temp = np.exp(-2 * r ** 2)
    w0 = 0.5 / (1 + temp * np.cos(p * np.pi)) + 0j
    weights = np.array([w0, w0,
                        np.exp(-1j * np.pi * p) * temp * w0,
                        np.exp(1j * np.pi * p) * temp * w0])
    covs4 = np.stack([covs] * 4)
    return BosonicState([covs4, means.reshape(4, 2, 1), weights], nmode=1, cutoff=cutoff or 5)


def _gkp_weight(k, l, theta, phi, epsilon):
    """c_{k,l}(theta, phi) (reference photonic/state.py:531, arXiv:2103.05530 Eq.43/B1)."""
    k = k.astype(np.int64)
    l = l.astype(np.int64)
    k2, l2, k4, l4 = k % 2, l % 2, k % 4, l % 4
    result = np.zeros(len(k))
    result[(k2 == 0) & (l2 == 0)] = 1
    result[(k4 == 0) & (l2 == 1)] = np.cos(theta)
    result[(k4 == 2) & (l2 == 1)] = -np.cos(theta)
    result[(k4 == 3) & (l4 == 0)] = np.sin(theta) * np.cos(phi)
    result[(k4 == 1) & (l4 == 0)] = np.sin(theta) * np.cos(phi)
    result[(k4 == 3) & (l4 == 2)] = -np.sin(theta) * np.cos(phi)
    result[(k4 == 1) & (l4 == 2)] = -np.sin(theta) * np.cos(phi)
    result[(k4 == 3) & (l4 == 3)] = -np.sin(theta) * np.sin(phi)
    result[(k4 == 1) & (l4 == 1)] = -np.sin(theta) * np.sin(phi)
    result[(k4 == 3) & (l4 == 1)] = np.sin(theta) * np.sin(phi)
    result[(k4 == 1) & (l4 == 3)] = np.sin(theta) * np.sin(phi)
    exp_eps = np.exp(-2 * epsilon)
    prefactor = np.exp(-0.25 * np.pi * (l ** 2 + k ** 2) * (1 - exp_eps) / (1 + exp_eps))
    return result * prefactor


def GKPState(theta: float = None, phi: float = None, amp_cutoff: float = 0.1,
             epsilon: float = 0.05, cutoff: int | None = None) -> BosonicState:
    """Finite-energy single-mode GKP state (reference photonic/state.py:468)."""
    hbar, kappa = config.HBAR, config.KAPPA
    if theta is None:
        theta = float(np.random.rand() * 2 * np.pi)
    if phi is None:
        phi = float(np.random.rand() * 2 * np.pi)
    exp_eps = np.exp(-2 * epsilon)
    z_max = int(np.ceil(np.sqrt(-4 / np.pi * np.log(amp_cutoff) * (1 + exp_eps) / (1 - exp_eps))))
    coords = np.arange(-z_max, z_max + 1)
    gx, gy = np.meshgrid(coords, coords, indexing='ij')
    means = np.stack([gx.reshape(-1), gy.reshape(-1)], axis=1).astype(np.float64)
    k, l = means[:, 0], means[:, 1]
    weights = _gkp_weight(k, l, theta, phi, epsilon)
    filt = np.abs(weights) > amp_cutoff
    weights = weights[filt].astype(complex)
    weights = weights / weights.sum()
    means = means[filt]
    means = means * np.exp(-epsilon) / (1 + exp_eps) * (np.pi * hbar / 2) ** 0.5 / kappa + 0j
    covs = np.eye(2) * hbar / (4 * kappa ** 2) * (1 - exp_eps) / (1 + exp_eps)
    covs = np.stack([covs] * len(weights))
    return BosonicState([covs, means.reshape(-1, 2, 1), weights], nmode=1, cutoff=cutoff or 5)


def combine_bosonic_states(states: list, cutoff: int | None = None) -> BosonicState:
    """Tensor-product of Bosonic states: block-diag covs over the cartesian
    product of components, kron of weights (reference photonic/state.py:734)."""
    import itertools
    if cutoff is None:
        cutoff = states[0].cutoff
    nmode = sum(s.nmode for s in states)
    ncombs = [s.ncomb for s in states]
    covs = []
    means = []
    weights = []
    for combo in itertools.product(*[range(c) for c in ncombs]):
        cov = np.zeros((2 * nmode, 2 * nmode), dtype=np.float64)
        mean = np.zeros((2 * nmode, 1), dtype=np.complex128)
        w = 1.0 + 0j
        off = 0
        for s, ci in zip(states, combo):
            k = s.nmode
            # xxpp block placement: x block at [off:off+k], p block at [nmode+off:...]
            idx = np.concatenate([np.arange(off, off + k), nmode + np.arange(off, off + k)])
            cov[np.ix_(idx, idx)] = np.asarray(s.cov)[0, ci]
            mean[idx] = np.asarray(s.mean)[0, ci]
            w = w * complex(np.asarray(s.weight)[0, ci])
            off += k
        covs.append(cov)
        means.append(mean)
        weights.append(w)
    return BosonicState([np.stack(covs), np.stack(means), np.asarray(weights)], nmode, cutoff)


def FockStateBosonic(n: int, r: float = 0.05, cutoff: int | None = None) -> BosonicState:
    """Single-mode Fock state as a Gaussian combination (reference
    photonic/state.py:596, arXiv:2103.05530 Sec. IV C)."""
    from scipy.special import comb
    assert r ** 2 < 1 / n, 'NOT a physical state'
    hbar, kappa = config.HBAR, config.KAPPA
    m = np.arange(n + 1)
    combs = comb(n, m)
    weight = (1 - n * r ** 2) / (1 - (n - m) * r ** 2) * combs * (-1.0) ** (n - m)
    weight = (weight / weight.sum()).astype(complex)
    mean = np.zeros((n + 1, 2, 1), dtype=complex)
    cov = (np.eye(2)[None] * hbar / (4 * kappa ** 2)
           * ((1 + (n - m) * r ** 2) / (1 - (n - m) * r ** 2)).reshape(-1, 1, 1))
    if cutoff is None:
        cutoff = n + 1
    return BosonicState([cov, mean, weight], 1, cutoff)
