"""Hafnian via the eigenvalue-trace method (arXiv:2108.01622 Eq.B3).

TPU-native counterpart of reference src/deepquantum/photonic/hafnian_.py:
the powerset is precomputed on host as static index arrays grouped by subset
size; each group is one vmapped trace-power computation on device.
"""

from __future__ import annotations

import itertools
from collections import Counter
from functools import lru_cache
from math import factorial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import cdtype

__all__ = ['hafnian', 'hafnian_batch']


@lru_cache(maxsize=None)
def integer_partition(remaining: int, max_num: int):
    """All integer partitions of ``remaining`` with parts <= max_num (reference hafnian_.py:14)."""
    if remaining == 0:
        return [[]]
    if remaining < 0 or max_num == 0:
        return []
    result = []
    if remaining >= max_num:
        for part in integer_partition(remaining - max_num, max_num):
            result.append([max_num] + part)
    result.extend(integer_partition(remaining, max_num - 1))
    return result


def _count_unique_permutations(nums) -> float:
    total = factorial(len(nums))
    rep = 1
    for c in Counter(nums).values():
        rep *= factorial(c)
    return total // rep


@lru_cache(maxsize=None)
def _subsets_by_size(n: int):
    """Nonempty subsets of range(n), grouped by size, as numpy index arrays."""
    groups = {}
    for k in range(1, n + 1):
        groups[k] = np.array(list(itertools.combinations(range(n), k)), dtype=np.int64)
    return groups


def _poly_lambda(submat, partitions, power: int, loop: bool):
    """Polynomial coefficient from trace powers (reference hafnian_.py:52)."""
    size = submat.shape[-1]
    eye = jnp.eye(size, dtype=submat.dtype)
    x_mat = eye.reshape(size // 2, 2, size)[:, ::-1].reshape(size, size)
    xaz = x_mat @ submat
    traces = [jnp.trace(eye)]
    x = eye
    for _ in range(power):
        x = x @ xaz
        traces.append(jnp.trace(x))
    trace_list = jnp.stack(traces)
    if loop:
        v = jnp.diagonal(submat)
        xv = x_mat @ v / 2
        diag_terms = []
        x = eye
        diag_terms.append(v @ x @ xv)
        for _ in range(power - 1):
            x = x @ xaz
            diag_terms.append(v @ x @ xv)
        diag_list = jnp.stack(diag_terms)
    coeff = jnp.zeros((), submat.dtype)
    for orders in partitions:
        ncount = _count_unique_permutations(tuple(orders))
        idx = np.asarray(orders, dtype=np.int64)
        poly = trace_list[idx] / (2 * idx)
        if loop:
            poly = poly + diag_list[idx - 1]
        coeff = coeff + (ncount / factorial(len(orders))) * jnp.prod(poly)
    return coeff


def hafnian(matrix, loop: bool = False) -> jnp.ndarray:
    """Hafnian of a symmetric matrix (reference hafnian_.py:93)."""
    matrix = jnp.asarray(matrix, dtype=cdtype())
    size = matrix.shape[-1]
    if size % 2 == 1:
        if loop:
            pad = jnp.zeros((size + 1, size + 1), matrix.dtype).at[0, 0].set(1)
            matrix = pad.at[1:, 1:].set(matrix)
            size = size + 1
        else:
            return jnp.zeros((), matrix.dtype)
    if size == 0:
        return jnp.ones((), matrix.dtype)
    if size == 2:
        if loop:
            return matrix[0, 1] + matrix[0, 0] * matrix[1, 1]
        return matrix[0, 1]
    power = size // 2
    partitions = tuple(tuple(p) for p in integer_partition(power, power))
    groups = _subsets_by_size(power)
    haf = jnp.zeros((), matrix.dtype)
    for k, z_sets in groups.items():
        # submatrix row/col indices: interleaved 2z, 2z+1 sorted
        idx = np.sort(np.concatenate([2 * z_sets, 2 * z_sets + 1], axis=1), axis=1)
        submats = matrix[idx[:, :, None], idx[:, None, :]]
        coeffs = jax.vmap(lambda m: _poly_lambda(m, partitions, power, loop))(submats)
        haf = haf + (-1) ** (power - k) * jnp.sum(coeffs)
    return haf


def hafnian_batch(matrix, loop: bool = False) -> jnp.ndarray:
    """Batched hafnian (reference hafnian_.py:126)."""
    return jax.vmap(lambda m: hafnian(m, loop))(jnp.asarray(matrix))
