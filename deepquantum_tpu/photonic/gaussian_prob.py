"""Fock-basis probabilities of Gaussian states (hafnian / torontonian path).

Mirrors reference photonic/circuit.py:1104-1177 (_get_probs_gaussian_helper /
_get_prob_gaussian_base): Q-function matrices from (cov, mean) in the ladder
representation, then per final state a sub-matrix hafnian (pnrd) or
torontonian (threshold). States are grouped by total photon number so each
group is one fixed-shape vmapped device computation.
"""

from __future__ import annotations

from math import factorial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import cdtype, rdtype
from .hafnian_ import hafnian
from .qmath import fock_combinations, quadrature_to_ladder
from .torontonian_ import torontonian

__all__ = ['fock_probs_gaussian', 'probs_gaussian_helper']


def _q_mats(cov, mean):
    nmode = cov.shape[-1] // 2
    eye = jnp.eye(2 * nmode, dtype=cdtype())
    cov_ladder = quadrature_to_ladder(cov)
    mean_ladder = quadrature_to_ladder(mean)
    q = cov_ladder + eye / 2
    q_inv = jnp.linalg.inv(q)
    det_q = jnp.linalg.det(q)
    x_mat = eye.reshape(2, nmode, 2 * nmode)[::-1].reshape(2 * nmode, 2 * nmode)
    o_mat = eye - q_inv
    a_mat = x_mat @ o_mat
    gamma = (jnp.conj(mean_ladder).swapaxes(-1, -2) @ q_inv).reshape(-1)
    p_vac = jnp.exp(-0.5 * (jnp.conj(mean_ladder).swapaxes(-1, -2) @ q_inv @ mean_ladder).reshape(())) \
        / jnp.sqrt(det_q)
    return a_mat, o_mat, gamma, p_vac


def _prob_one_state(final_state, a_mat, o_mat, gamma, p_vac, detector, purity, loop):
    """Probability of one Fock basis outcome — static shapes from the state."""
    nmode = len(final_state)
    fs = np.asarray(final_state, np.int64)
    idx_half = np.repeat(np.arange(nmode), fs)
    idx_double = np.concatenate([idx_half, idx_half + nmode])
    if detector == 'pnrd':
        sub_gamma = gamma[idx_double]
        if purity:
            sub_mat = a_mat[:nmode, :nmode][np.ix_(idx_half, idx_half)]
            sub_gamma = sub_gamma[: len(idx_half)]
        else:
            sub_mat = a_mat[np.ix_(idx_double, idx_double)]
        n = len(sub_gamma)
        if n == 1:
            sub_mat = sub_gamma.reshape(1, 1)
        else:
            sub_mat = sub_mat.at[jnp.arange(n), jnp.arange(n)].set(sub_gamma)
        haf = hafnian(sub_mat, loop=loop)
        if purity:
            haf = jnp.abs(haf) ** 2
        norm = float(np.prod([factorial(int(x)) for x in fs]))
        prob = p_vac * haf / norm
    else:  # threshold
        sub_mat = o_mat[np.ix_(idx_double, idx_double)]
        # undisplaced states (loop=False, a STATIC host-side fact) take the
        # click-probability torontonian — gamma=None reaches the cheaper
        # df32 path (a zero gamma array would route to the displaced df32
        # variant and pay the augmented-rhs solve for nothing)
        sub_gamma = gamma[idx_double] if loop else None
        prob = p_vac * torontonian(sub_mat, sub_gamma)
    return jnp.abs(jnp.real(prob))


from functools import lru_cache


@lru_cache(maxsize=64)
def _probs_fn(final_states: tuple, detector: str, purity: bool, loop: bool):
    """Jitted all-states probability program for one basis table."""
    def fn(cov, mean):
        a_mat, o_mat, gamma, p_vac = _q_mats(cov, mean)
        out = [_prob_one_state(fs, a_mat, o_mat, gamma, p_vac, detector, purity, loop)
               for fs in final_states]
        return jnp.stack(out)
    return jax.jit(fn)


def probs_gaussian_helper(final_states, cov, mean, detector='pnrd', purity=None, loop=None):
    """Probabilities of given final states for one (cov, mean)."""
    from ..utils.compat import to_numpy
    mean_np = to_numpy(mean)
    if purity is None:
        from .state import GaussianState
        purity = GaussianState([to_numpy(cov).real, mean_np.real]).is_pure
    if loop is None:
        loop = bool(np.any(mean_np != 0))
    fn = _probs_fn(tuple(tuple(int(x) for x in fs) for fs in final_states),
                   detector, bool(purity), bool(loop))
    return fn(jnp.asarray(cov), jnp.asarray(mean))


def fock_probs_gaussian(cov, mean, cutoff: int, detector: str = 'pnrd'):
    """All-outcome probabilities (basis table static).

    pnrd: every Fock state with per-mode occupation < cutoff;
    threshold: every binary click pattern.
    Returns (probs[..., nstates], basis list of tuples).
    """
    cov = jnp.asarray(cov)
    mean = jnp.asarray(mean)
    nmode = cov.shape[-1] // 2
    if detector == 'pnrd':
        basis = []
        max_photon = nmode * (cutoff - 1)
        for n in range(max_photon + 1):
            basis += [tuple(s) for s in fock_combinations(nmode, n, cutoff)]
    else:
        import itertools
        basis = [tuple(s) for s in itertools.product((0, 1), repeat=nmode)]
    single = cov.ndim == 2
    covs = cov.reshape(-1, 2 * nmode, 2 * nmode)
    means = mean.reshape(-1, 2 * nmode, 1)
    all_probs = []
    for i in range(covs.shape[0]):
        all_probs.append(probs_gaussian_helper(basis, covs[i], means[i], detector))
    probs = jnp.stack(all_probs)
    if single:
        probs = probs[0]
    return probs, basis
