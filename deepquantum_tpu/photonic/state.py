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

__all__ = ['FockState', 'GaussianState', 'BosonicState', 'CatState', 'GKPState']


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


def CatState(r: float = 1.0, theta: float = 0.0, p: int = 1, cutoff: int = 5) -> BosonicState:
    """Cat state |alpha> + (-1)^p |-alpha> as 2 (4 with cross terms) Gaussians
    (reference photonic/state.py:415)."""
    alpha = r * np.exp(1j * theta)
    hbar, kappa = config.HBAR, config.KAPPA
    scale = hbar ** 0.5 / kappa / 2 ** 0.5 * 2 ** 0.5  # sqrt(2 hbar)/2kappa... see below
    # mean of |alpha>: (sqrt(hbar)/kappa) * (Re alpha, Im alpha) (vacuum-width coherent state)
    s = hbar ** 0.5 / kappa
    cov = np.eye(2) * hbar / (4 * kappa ** 2)
    means = []
    weights = []
    norm = 2 * (1 + (-1) ** p * np.exp(-2 * r ** 2))
    for sign in (1, -1):
        means.append(sign * np.array([alpha.real, alpha.imag]) * s)
        weights.append(1 / norm)
    # cross terms (complex means)
    means.append(np.array([1j * alpha.imag, -1j * alpha.real]) * s)
    weights.append((-1) ** p * np.exp(-2 * r ** 2) / norm)
    means.append(np.array([-1j * alpha.imag, 1j * alpha.real]) * s)
    weights.append((-1) ** p * np.exp(-2 * r ** 2) / norm)
    cov4 = np.stack([cov] * 4)
    mean4 = np.stack(means).reshape(4, 2, 1)
    w4 = np.array(weights)
    return BosonicState([cov4, mean4, w4], nmode=1, cutoff=cutoff)


def GKPState(mu: int = 0, delta: float = 0.3, nmax: int = 20, cutoff: int = 5) -> BosonicState:
    """Finite-energy GKP state as a Gaussian comb (reference photonic/state.py:468)."""
    hbar, kappa = config.HBAR, config.KAPPA
    # lattice of means in units of sqrt(pi hbar)/ (2 kappa ... ) — follow the
    # standard finite-energy construction (arXiv:2103.05530)
    eps = delta ** 2
    coef = np.sqrt(np.pi * hbar) / (2 * kappa)  # half-lattice spacing in x
    means = []
    weights = []
    damp = np.exp(-eps)
    for a in range(-nmax, nmax + 1):
        for b in range(-nmax, nmax + 1):
            # peaks at (a + mu/2) sqrt(pi hbar), b sqrt(pi hbar)/2 pattern
            x = (2 * a + mu) * coef
            pp = b * coef
            w = np.exp(-0.25 * np.pi * eps * ((2 * a + mu) ** 2 + b ** 2)) * \
                np.exp(-1j * np.pi * b * (2 * a + mu) / 2)
            means.append([x * damp ** 0.5, pp * damp ** 0.5])
            weights.append(w)
    means = np.asarray(means, dtype=np.complex128).reshape(-1, 2, 1)
    weights = np.asarray(weights)
    weights = weights / weights.sum()
    cov = np.eye(2) * hbar / (4 * kappa ** 2) * (1 - np.exp(-2 * eps)) / (1 + np.exp(-2 * eps))
    covs = np.stack([cov] * len(weights))
    return BosonicState([covs, means, weights], nmode=1, cutoff=cutoff)
