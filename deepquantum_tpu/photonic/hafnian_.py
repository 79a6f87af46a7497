"""Hafnian via the power-trace method (Björklund et al., arXiv:2108.01622 Eq.B3).

Same published algorithm family as reference src/deepquantum/photonic/hafnian_.py
(cited for parity), but an independent TPU-first formulation:

  haf(A) = sum over subsets Z of the m mode pairs of
           (-1)^(m-|Z|) * [z^m] exp(P_Z(z)),
  P_Z(z) = sum_{j=1..m} p_j z^j,
  p_j    = tr((X A_Z)^j) / (2j)  (+ v^T (X A_Z)^{j-1} X v / 2 for loop hafnians,
                                  v = diag(A_Z)),

where X swaps the two rows of each mode pair. Instead of enumerating integer
partitions of m and summing multinomial trace products per partition (the
reference's poly_lambda), the z^m coefficient of exp(P_Z) is computed with the
standard power-series exponential recurrence

  e_0 = 1,   e_k = (1/k) * sum_{j=1..k} j * p_j * e_{k-j},

which is O(m^2) arithmetic instead of O(#partitions(m)) products and maps to a
short unrolled dot-product chain on device. The powerset is precomputed on
host as static index arrays grouped by subset size; each group is one vmapped
trace-power computation on device, so XLA sees m fixed-shape batched matmul
chains regardless of matrix size.
"""

from __future__ import annotations

import itertools
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..config import cdtype

__all__ = ['hafnian', 'hafnian_batch']


@lru_cache(maxsize=None)
def subset_index_groups(n: int):
    """Nonempty subsets of range(n) grouped by size, as numpy index arrays
    (size k -> array of shape (C(n,k), k)). Shared with the torontonian."""
    return {k: np.array(list(itertools.combinations(range(n), k)), dtype=np.int64)
            for k in range(1, n + 1)}


# backward-compatible alias used by torontonian_.py
_subsets_by_size = subset_index_groups


def _exp_series_coeff(p):
    """[z^m] of exp(sum_j p[j-1] z^j) for p of static length m.

    Power-series exponential recurrence; m is small (<= ~14) so the loop is
    unrolled at trace time into m fused dot products.
    """
    m = p.shape[0]
    jp = p * jnp.arange(1, m + 1, dtype=p.real.dtype)   # j * p_j
    e = [jnp.ones((), p.dtype)]
    for k in range(1, m + 1):
        acc = jnp.zeros((), p.dtype)
        for j in range(1, k + 1):
            acc = acc + jp[j - 1] * e[k - j]
        e.append(acc / k)
    return e[m]


def _pair_swap_rows(a):
    """Left-multiply by X = direct sum of [[0,1],[1,0]] blocks: swap the two
    rows of every interleaved mode pair."""
    s = a.shape[-2]
    perm = np.arange(s).reshape(-1, 2)[:, ::-1].reshape(-1)
    return a[..., perm, :]


def _subset_coeff(sub, m: int, loop: bool):
    """[z^m] exp(P_Z) for one subset submatrix ``sub`` (interleaved indices)."""
    xa = _pair_swap_rows(sub)
    pw = xa
    if loop:
        v = jnp.diagonal(sub)
        xv = _pair_swap_rows(v[:, None])[:, 0] / 2
        u = v
    terms = []
    for j in range(1, m + 1):
        t = jnp.trace(pw) / (2 * j)
        if loop:
            t = t + u @ xv
            u = u @ xa
        terms.append(t)
        if j < m:
            pw = pw @ xa
    return _exp_series_coeff(jnp.stack(terms))


def hafnian(matrix, loop: bool = False) -> jnp.ndarray:
    """(Loop) hafnian of a symmetric matrix (parity target: reference
    src/deepquantum/photonic/hafnian_.py:93)."""
    matrix = jnp.asarray(matrix, dtype=cdtype())
    size = matrix.shape[-1]
    if size % 2 == 1:
        if not loop:
            return jnp.zeros((), matrix.dtype)
        # odd loop hafnian: border with a unit diagonal entry
        padded = jnp.zeros((size + 1, size + 1), matrix.dtype).at[0, 0].set(1)
        matrix = padded.at[1:, 1:].set(matrix)
        size += 1
    if size == 0:
        return jnp.ones((), matrix.dtype)
    m = size // 2
    pair_groups = subset_index_groups(m)
    total = jnp.zeros((), matrix.dtype)
    for k, pair_sets in pair_groups.items():
        # mode pair p -> interleaved rows/cols (2p, 2p+1)
        rows = np.stack([2 * pair_sets, 2 * pair_sets + 1], axis=2).reshape(len(pair_sets), 2 * k)
        subs = matrix[rows[:, :, None], rows[:, None, :]]
        coeffs = jax.vmap(lambda s: _subset_coeff(s, m, loop))(subs)
        sign = 1 if (m - k) % 2 == 0 else -1
        total = total + sign * jnp.sum(coeffs)
    return total


def hafnian_batch(matrix, loop: bool = False) -> jnp.ndarray:
    """Batched hafnian over a stack of equal-size matrices (parity target:
    reference hafnian_.py:126)."""
    return jax.vmap(lambda m: hafnian(m, loop))(jnp.asarray(matrix))
