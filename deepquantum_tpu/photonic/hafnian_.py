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

import functools
import itertools
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..config import cdtype

__all__ = ['hafnian', 'hafnian_batch']


# --------------------------------------------------------- df32 (c64 only)
# TPUs have no f64; plain f32 trace powers + the alternating subset sum lose
# ~1.9e-5 relative at n=16 (round-2 recorded artifact). Under the complex64
# policy the whole evaluation runs in double-single arithmetic (~2^-48 per
# op) from ops/df32.py; the final rounding to complex64 is then the only
# f32-level step. Private aliases kept for the unit tests.
from ..ops.df32 import (
    cdf_add as _cdf_add,
    cdf_lift as _cdf_lift,
    cdf_matmul as _cdf_matmul,
    cdf_mul as _cdf_mul,
    cdf_reduce0 as _cdf_reduce0,
    cdf_scale_const as _cdf_scale_const,
    cdf_scale_int as _cdf_scale_int,
    cdf_to_complex as _cdf_to_complex,
    cdf_trace as _cdf_trace,
    const_split as _const_split,
)


def _subset_coeff_df32(sub_re, sub_im, m: int, loop: bool):
    """[z^m] exp(P_Z) for one (zero-padded) subset, every step in df32.

    The power iteration is a lax.scan over j so the traced graph is O(1) in
    m; trailing zero rows/cols contribute nothing to traces or products, so
    padded subsets evaluate to exactly their unpadded coefficient."""
    xa = _cdf_lift(_pair_swap_rows(sub_re), _pair_swap_rows(sub_im))
    if loop:
        v = _cdf_lift(jnp.diagonal(sub_re)[:, None], jnp.diagonal(sub_im)[:, None])
        xv = tuple(tuple(_pair_swap_rows(x) * 0.5 for x in comp) for comp in v)
        u0 = tuple(tuple(jnp.swapaxes(x, -1, -2) for x in comp) for comp in v)
    else:
        u0 = None
    inv2j = [_const_split(1.0 / (2 * j)) for j in range(1, m + 1)]
    ch = jnp.stack([c[0] for c in inv2j])
    cl = jnp.stack([c[1] for c in inv2j])

    def step(carry, consts):
        pw, u = carry
        h, lo = consts
        from ..ops.df32 import df_mul as _df_mul
        tr = _cdf_trace(pw)
        t = (_df_mul(tr[0][0], tr[0][1], h, lo),
             _df_mul(tr[1][0], tr[1][1], h, lo))
        if loop:
            dot = _cdf_matmul(u, xv)      # (1, 1)
            dot = tuple(tuple(x[..., 0, 0] for x in comp) for comp in dot)
            t = _cdf_add(t, dot)
            u = _cdf_matmul(u, xa)
        pw = _cdf_matmul(pw, xa)
        return (pw, u), t

    # scan only m-1 advance steps: the m-th matmul (pw = xa^m's advance,
    # and u's) would be dead work — its trace is taken from the carry
    (pw_f, u_f), terms = jax.lax.scan(step, (xa, u0), (ch[:m - 1], cl[:m - 1]))
    from ..ops.df32 import df_mul as _df_mul
    tr = _cdf_trace(pw_f)
    last = (_df_mul(tr[0][0], tr[0][1], ch[m - 1], cl[m - 1]),
            _df_mul(tr[1][0], tr[1][1], ch[m - 1], cl[m - 1]))
    if loop:
        dot = _cdf_matmul(u_f, xv)
        dot = tuple(tuple(x[..., 0, 0] for x in comp) for comp in dot)
        last = _cdf_add(last, dot)
    # power-series exponential recurrence on the m stacked df32 traces;
    # O(m^2) scalar df ops, unrolled (m <= ~14)
    term_list = [tuple(tuple(x[j] for x in comp) for comp in terms)
                 for j in range(m - 1)] + [last]
    one = _cdf_lift(jnp.ones((), jnp.float32), jnp.zeros((), jnp.float32))
    e = [one]
    for k in range(1, m + 1):
        acc = None
        for j in range(1, k + 1):
            contrib = _cdf_mul(_cdf_scale_int(term_list[j - 1], j), e[k - j])
            acc = contrib if acc is None else _cdf_add(acc, contrib)
        e.append(_cdf_scale_const(acc, 1.0 / k))
    return e[m]


def padded_powerset_indices(m: int, rows_builder):
    """Shared powerset scaffold for the df32 hafnian AND torontonian: row
    indices for EVERY nonempty subset of m modes, zero-padded to a common
    length 2m, plus the (2m, 1) validity column mask and the
    inclusion-exclusion sign of each subset. One vmapped fixed-shape body
    then covers all subset sizes (per-size bodies made compile time
    explode). ``rows_builder(pair_sets, k)`` maps a (S_k, k) array of mode
    subsets to their (S_k, 2k) matrix row indices — interleaved (2p, 2p+1)
    for the hafnian, sorted (y, y+m) for the torontonian."""
    subsets = subset_index_groups(m)
    count = (1 << m) - 1
    idx = np.zeros((count, 2 * m), np.int64)
    sign = np.zeros(count, np.float32)
    mask = np.zeros((count, 2 * m, 1), np.float32)
    s = 0
    for k, pair_sets in subsets.items():
        rows = rows_builder(pair_sets, k)
        e = s + len(rows)
        idx[s:e, :2 * k] = rows
        sign[s:e] = 1.0 if (m - k) % 2 == 0 else -1.0
        mask[s:e, :2 * k] = 1.0
        s = e
    return idx, mask, sign


@lru_cache(maxsize=None)
def _padded_subset_indices(m: int):
    """Interleaved (2p, 2p+1) rows per subset; zeroed padding keeps the
    hafnian trace powers exact."""
    return padded_powerset_indices(
        m, lambda pair_sets, k: np.stack(
            [2 * pair_sets, 2 * pair_sets + 1], axis=2).reshape(len(pair_sets), 2 * k))


@functools.partial(jax.custom_jvp, nondiff_argnums=(1,))
def _hafnian_df32(matrix, loop: bool):
    """df32 hafnian of an even-size complex64 matrix (see module header)."""
    size = matrix.shape[-1]
    m = size // 2
    re = jnp.real(matrix).astype(jnp.float32)
    im = jnp.imag(matrix).astype(jnp.float32)
    idx, mask, sign = _padded_subset_indices(m)
    full = mask * np.swapaxes(mask, -1, -2)          # (S, 2m, 2m)
    sub_re = re[idx[:, :, None], idx[:, None, :]] * full
    sub_im = im[idx[:, :, None], idx[:, None, :]] * full
    coeffs = jax.vmap(lambda r, i: _subset_coeff_df32(r, i, m, loop))(
        sub_re, sub_im)
    signed = tuple(tuple(x * sign for x in comp) for comp in coeffs)
    return _cdf_to_complex(_cdf_reduce0(signed))


@_hafnian_df32.defjvp
def _hafnian_df32_jvp(loop, primals, tangents):
    # bitmask splits are not differentiable; tangents ride the plain-f32
    # formulation (accuracy of the PRIMAL is what the df32 path is for)
    (matrix,), (dm,) = primals, tangents
    primal = _hafnian_df32(matrix, loop)
    _, tangent = jax.jvp(lambda a: _hafnian_plain(a, loop), (matrix,), (dm,))
    return primal, tangent.astype(primal.dtype)


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


def _hafnian_plain(matrix, loop: bool) -> jnp.ndarray:
    """Power-trace hafnian at the matrix's native complex precision."""
    size = matrix.shape[-1]
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


def hafnian(matrix, loop: bool = False) -> jnp.ndarray:
    """(Loop) hafnian of a symmetric matrix (parity target: reference
    src/deepquantum/photonic/hafnian_.py:93).

    Under the complex64 policy the whole evaluation runs in df32
    double-single arithmetic (module header): plain f32 trace powers lose
    ~1.9e-5 relative to cancellation at n=16, df32 restores the 1e-6
    parity bar of tests/test_with_xanadu.py."""
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
    if matrix.dtype == jnp.complex64 and size >= 6:
        return _hafnian_df32(matrix, loop)
    return _hafnian_plain(matrix, loop)


def hafnian_batch(matrix, loop: bool = False) -> jnp.ndarray:
    """Batched hafnian over a stack of equal-size matrices (parity target:
    reference hafnian_.py:126)."""
    return jax.vmap(lambda m: hafnian(m, loop))(jnp.asarray(matrix))
