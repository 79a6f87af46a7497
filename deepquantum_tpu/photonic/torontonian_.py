"""Torontonian (Bristol thesis Eq.3.54), incl. the loop variant.

TPU-native counterpart of reference src/deepquantum/photonic/torontonian_.py:
powerset grouped by size on host, det+solve vmapped per group on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import cdtype
from .hafnian_ import subset_index_groups

__all__ = ['torontonian', 'torontonian_batch']


def _tor_helper(submat, sub_gamma):
    size = submat.shape[-1]
    cov_q_inv = jnp.eye(size, dtype=submat.dtype) - submat
    exp_term = sub_gamma @ jnp.linalg.solve(cov_q_inv, jnp.conj(sub_gamma)) / 2
    return jnp.exp(exp_term) / jnp.sqrt(jnp.linalg.det(cov_q_inv))


def torontonian(o_mat, gamma=None) -> jnp.ndarray:
    """Torontonian of a 2m x 2m matrix (reference torontonian_.py:27)."""
    o_mat = jnp.asarray(o_mat, dtype=cdtype())
    size = o_mat.shape[-1]
    if gamma is None:
        gamma = jnp.zeros(size, dtype=o_mat.dtype)
    else:
        gamma = jnp.asarray(gamma, dtype=o_mat.dtype)
    m = size // 2
    tor = jnp.asarray((-1) ** m, o_mat.dtype)
    groups = subset_index_groups(m)
    for k, y_sets in groups.items():
        idx = np.sort(np.concatenate([y_sets, y_sets + m], axis=1), axis=1)
        submats = o_mat[idx[:, :, None], idx[:, None, :]]
        subgammas = gamma[idx]
        coeffs = jax.vmap(_tor_helper)(submats, subgammas)
        tor = tor + (-1) ** (m - k) * jnp.sum(coeffs)
    return tor


def torontonian_batch(o_mat, gamma=None) -> jnp.ndarray:
    """Batched torontonian (reference torontonian_.py:49)."""
    o_mat = jnp.asarray(o_mat)
    if gamma is None:
        return jax.vmap(lambda m: torontonian(m, None))(o_mat)
    return jax.vmap(torontonian)(o_mat, jnp.asarray(gamma))
