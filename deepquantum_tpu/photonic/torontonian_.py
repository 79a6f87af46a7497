"""Torontonian (Bristol thesis Eq.3.54), incl. the loop variant.

TPU-native counterpart of reference src/deepquantum/photonic/torontonian_.py:
powerset grouped by size on host, det+solve vmapped per group on device.

The inclusion-exclusion sum over 2^m subsets cancels catastrophically: on
the benchmark covariances the final value is ~1e5-1e7x smaller than the
individual 1/sqrt(det) terms, so plain complex64 loses everything (measured
rel err 0.75 at 2n=12). Under the complex64 policy BOTH paths therefore run
fully in df32 (ops/df32.py, ~2^-48 per op): every determinant through a
pivot-free Gauss-Jordan LU over identity-padded subsets — one vmapped
fixed-shape body for the whole powerset, with multipliers taken from the
pivot COLUMN because the circuit's threshold o_mat is NOT symmetric — and
I - O_Z formed by an exact two_sum (a plain f32 subtraction rounds the
diagonal at 2^-24, which was the measured accuracy floor of the whole
function), with the alternating sum reduced in df32. The displaced (loop)
variant carries conj(gamma_Z) as an augmented rhs of the same pass (full
Jordan elimination leaves d_k x_k per row) and exponentiates with the df32
cdf_exp, holding ~1e-8 where plain c64 returned 3e-3. The reference leans
on torch float64 for the same cancellation reason; TPUs have no f64, df32
is the native answer.
"""

from __future__ import annotations

import functools
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..config import cdtype
from ..ops.pallas_kernels import _two_sum
from ..ops.df32 import (
    cdf_add,
    cdf_div,
    cdf_exp,
    cdf_lift,
    cdf_mul,
    cdf_neg,
    cdf_reduce0,
    cdf_scale_const,
    cdf_sqrt,
    cdf_sum_axis,
    cdf_to_complex,
)
from .hafnian_ import subset_index_groups

__all__ = ['torontonian', 'torontonian_batch']


def _tor_helper(submat, sub_gamma):
    size = submat.shape[-1]
    cov_q_inv = jnp.eye(size, dtype=submat.dtype) - submat
    exp_term = sub_gamma @ jnp.linalg.solve(cov_q_inv, jnp.conj(sub_gamma)) / 2
    return jnp.exp(exp_term) / jnp.sqrt(jnp.linalg.det(cov_q_inv))


def _torontonian_plain(o_mat, gamma) -> jnp.ndarray:
    """Subset det+solve at the matrix's native complex precision."""
    size = o_mat.shape[-1]
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


# ------------------------------------------------------------- df32 path
@lru_cache(maxsize=None)
def _padded_tor_indices(m: int):
    """Sorted (y, y+m) row indices per subset via the shared powerset
    scaffold (hafnian_.py::padded_powerset_indices). Padded rows/cols are
    filled with identity (det unchanged), so one vmapped fixed-shape
    Gauss-Jordan LU covers the powerset."""
    from .hafnian_ import padded_powerset_indices
    return padded_powerset_indices(
        m, lambda y_sets, k: np.sort(
            np.concatenate([y_sets, y_sets + m], axis=1), axis=1))


def _cdf_lu_det(a_re, a_im, nrhs: int = 0, a_re_lo=None):
    """Determinants of a batch of GENERAL complex matrices (S, p, p) via
    pivot-free LU elimination in df32 (multipliers from the current pivot
    COLUMN — an earlier LDL^T variant took them from the row, which is only
    valid for complex SYMMETRIC inputs; the circuit's own threshold o_mat
    is NOT symmetric and every >= 3-click probability silently came out
    up to ~10x wrong). cov_q_inv spectra are bounded away from zero (Q is
    positive definite), so pivoting is unnecessary; a singular input yields
    inf/nan exactly as the reference's det would.

    With ``nrhs`` > 0 the input is augmented (S, p, p + nrhs); the full
    Gauss-Jordan elimination leaves each rhs row as d_k x_k with
    x = A^{-1} b, so quadratic forms come out as sum_k b1_k rhs_k / d_k in
    ONE pass — used by the displaced (loop) torontonian. Returns
    (det, w, ds) in that case.

    ``a_re_lo``: optional low plane of the real part. The diagonal of
    I - O_Z rounds at 2^-24 when formed in plain f32 (1 - x is only exact
    for x in [0.5, 2]), which was the measured accuracy floor of the whole
    torontonian — callers two_sum the subtraction and pass the residual."""
    p = a_re.shape[-1] - nrhs
    a = cdf_lift(a_re, a_im)
    if a_re_lo is not None:
        a = ((a[0][0], a_re_lo), a[1])
    iota_r = jnp.arange(p, dtype=jnp.float32)

    def step(a, j):
        row = tuple(tuple(
            jax.lax.dynamic_slice_in_dim(x, j, 1, axis=-2) for x in comp)
            for comp in a)                                   # (S, 1, p+nrhs)
        col = tuple(tuple(
            jax.lax.dynamic_slice_in_dim(x[..., :, :p], j, 1, axis=-1)
            for x in comp) for comp in a)                    # (S, p, 1)
        d = tuple(tuple(
            jax.lax.dynamic_slice_in_dim(x, j, 1, axis=-1) for x in comp)
            for comp in row)                                 # (S, 1, 1)
        mult = cdf_div(col, d)                               # (S, p, 1)
        outer = cdf_mul(mult, row)                           # (S, p, p+nrhs)
        # FULL Gauss-Jordan: clear pivot column j from every other row
        # (matrix part and rhs). Pivots equal the LU pivots (row j' is only
        # ever updated by earlier pivots), the matrix ends diagonal, and
        # each rhs row ends as d_k x_k. A below-only rhs update is NOT
        # equivalent for p >= 3 (rhs_j keeps changing after step j).
        others = (iota_r != j).astype(jnp.float32)
        gate = others[:, None] * jnp.ones((1, p + nrhs), jnp.float32)
        sub = tuple(tuple(x * gate for x in comp) for comp in outer)
        a = cdf_add(a, cdf_neg(sub))
        dj = tuple(tuple(x[..., 0, 0] for x in comp) for comp in d)
        return a, dj

    a_fin, ds = jax.lax.scan(step, a, jnp.arange(p))

    one = jnp.ones(a_re.shape[0], jnp.float32)
    det0 = cdf_lift(one, jnp.zeros_like(one))

    def mul_step(acc, dj):
        return cdf_mul(acc, dj), None

    det, _ = jax.lax.scan(mul_step, det0, ds)
    if nrhs == 0:
        return det
    w = tuple(tuple(x[..., :, p:] for x in comp) for comp in a_fin)
    return det, w, ds


def _use_tor_pallas(m: int) -> bool:
    """The lane-major Pallas LU kernel (tor_kernel.py) is the TPU path up to
    m=14 modes (input planes stay under ~200 MB); the jnp df32 Gauss-Jordan
    remains the portable fallback. DQ_TOR_PALLAS=0 forces the jnp path
    (ablations)."""
    import os
    if os.environ.get('DQ_TOR_PALLAS', '1') == '0':
        return False
    return m <= 14 and jax.default_backend() == 'tpu'


def _cdf_tree_sum(z):
    """Complex df32 sum over axis 0 via a log-depth two-sum fold. Safe here
    (unlike inside large fusions — see ops/df32.py header): the inputs are
    materialized kernel outputs, so no producer duplication can happen."""
    from ..ops.pallas_kernels import _two_sum as two_sum

    def fold(hi, lo):
        while hi.shape[0] > 1:
            half = hi.shape[0] // 2
            rest_h, rest_l = hi[2 * half:], lo[2 * half:]
            s, e = two_sum(hi[:half], hi[half:2 * half])
            hi, lo = s, e + (lo[:half] + lo[half:2 * half])
            if rest_h.shape[0]:
                hi = jnp.concatenate([hi, rest_h])
                lo = jnp.concatenate([lo, rest_l])
        return hi[0], lo[0]

    return (fold(*z[0]), fold(*z[1]))


def _tor_epilogue(det, sign, m: int, quad=None):
    """Signed inclusion-exclusion sum over per-subset (det, quad) planes:
    sum sign * exp(quad/2) / sqrt(det) + (-1)^m, all in df32."""
    ones = jnp.ones(det[0][0].shape, jnp.float32)
    term = cdf_div(cdf_lift(ones, jnp.zeros_like(ones)), cdf_sqrt(det))
    if quad is not None:
        term = cdf_mul(cdf_exp(cdf_scale_const(quad, 0.5)), term)
    signed = tuple(tuple(x * sign for x in comp) for comp in term)
    total = _cdf_tree_sum(signed)
    lead = float((-1) ** m)
    total = cdf_add(total, cdf_lift(jnp.float32(lead), jnp.float32(0)))
    return cdf_to_complex(total)




@jax.custom_jvp
def _torontonian_df32(o_mat):
    """df32 click-probability torontonian of a complex64 matrix."""
    size = o_mat.shape[-1]
    m = size // 2
    idx, valid, sign = _padded_tor_indices(m)
    if _use_tor_pallas(m):
        from .tor_kernel import tor_dets_pallas
        det, psign = tor_dets_pallas(o_mat, idx, valid, sign)
        return _tor_epilogue(det, psign, m)
    re = jnp.real(o_mat).astype(jnp.float32)
    im = jnp.imag(o_mat).astype(jnp.float32)
    mask2 = valid * np.swapaxes(valid, -1, -2)               # (S, p, p)
    eye = np.eye(2 * m, dtype=np.float32)
    sub_re = re[idx[:, :, None], idx[:, None, :]] * mask2
    a_re, a_re_lo = _two_sum(eye, -sub_re)       # exact I - O_Z (see helper)
    a_im = -im[idx[:, :, None], idx[:, None, :]] * mask2
    det = _cdf_lu_det(a_re, a_im, a_re_lo=a_re_lo)
    return _tor_epilogue(det, sign, m)


@_torontonian_df32.defjvp
def _torontonian_df32_jvp(primals, tangents):
    # bitmask splits are not differentiable; tangents ride the plain-f32
    # formulation (accuracy of the PRIMAL is what the df32 path is for)
    (o_mat,), (dm,) = primals, tangents
    primal = _torontonian_df32(o_mat)
    zero_gamma = jnp.zeros(o_mat.shape[-1], o_mat.dtype)
    _, tangent = jax.jvp(lambda a: _torontonian_plain(a, zero_gamma),
                         (o_mat,), (dm,))
    return primal, tangent.astype(primal.dtype)


@jax.custom_jvp
def _torontonian_loop_df32(o_mat, gamma):
    """df32 displaced (loop) torontonian: one augmented LU pass per subset
    gives det AND the quadratic form gamma_Z^T (I-O_Z)^{-1} conj(gamma_Z)
    (Gauss-Jordan rhs: final rhs row k = d_k x_k with x = A^{-1} conj(g),
    so the form is sum_k g_k rhs_k / d_k — valid for GENERAL matrices, the
    circuit's o_mat is not symmetric), then exp in df32
    (ops/df32.py::cdf_exp) so the inclusion-exclusion cancellation
    (~1e4-1e7x) doesn't eat the c64 result."""
    size = o_mat.shape[-1]
    m = size // 2
    idx, valid, sign = _padded_tor_indices(m)
    if _use_tor_pallas(m):
        from .tor_kernel import tor_dets_quads_pallas
        det, quad, psign = tor_dets_quads_pallas(o_mat, gamma, idx, valid,
                                                 sign)
        return _tor_epilogue(det, psign, m, quad=quad)
    re = jnp.real(o_mat).astype(jnp.float32)
    im = jnp.imag(o_mat).astype(jnp.float32)
    gre = jnp.real(gamma).astype(jnp.float32)
    gim = jnp.imag(gamma).astype(jnp.float32)
    mask2 = valid * np.swapaxes(valid, -1, -2)
    eye = np.eye(2 * m, dtype=np.float32)
    sub_re = re[idx[:, :, None], idx[:, None, :]] * mask2
    a_re, a_re_lo = _two_sum(eye, -sub_re)       # exact I - O_Z (see helper)
    a_im = -im[idx[:, :, None], idx[:, None, :]] * mask2
    v = valid[..., 0]
    g_re = gre[idx] * v
    g_im = gim[idx] * v
    zcol = jnp.zeros_like(g_re)[..., None]
    # single rhs = conj(gamma_Z); the left gamma enters at the dot below
    aug_re = jnp.concatenate([a_re, g_re[..., None]], -1)
    aug_lo = jnp.concatenate([a_re_lo, zcol], -1)
    aug_im = jnp.concatenate([a_im, -g_im[..., None]], -1)
    det, w, ds = _cdf_lu_det(aug_re, aug_im, nrhs=1, a_re_lo=aug_lo)
    rhs = tuple(tuple(x[..., 0] for x in comp) for comp in w)    # (S, p)
    dsm = tuple(tuple(jnp.moveaxis(x, 0, -1) for x in comp) for comp in ds)
    g_df = cdf_lift(g_re, g_im)
    e = cdf_sum_axis(cdf_div(cdf_mul(g_df, rhs), dsm), -1)
    expe = cdf_exp(cdf_scale_const(e, 0.5))
    ones = jnp.ones(det[0][0].shape, jnp.float32)
    inv_sqrt = cdf_div(cdf_lift(ones, jnp.zeros_like(ones)), cdf_sqrt(det))
    term = cdf_mul(expe, inv_sqrt)
    signed = tuple(tuple(x * sign for x in comp) for comp in term)
    total = cdf_reduce0(signed)
    lead = float((-1) ** m)
    total = cdf_add(total, cdf_lift(jnp.float32(lead), jnp.float32(0)))
    return cdf_to_complex(total)


@_torontonian_loop_df32.defjvp
def _torontonian_loop_df32_jvp(primals, tangents):
    # same policy as the click path: df32 primal, plain-f32 tangent
    (o_mat, gamma), (dm, dg) = primals, tangents
    primal = _torontonian_loop_df32(o_mat, gamma)
    _, tangent = jax.jvp(_torontonian_plain, (o_mat, gamma), (dm, dg))
    return primal, tangent.astype(primal.dtype)


def torontonian(o_mat, gamma=None) -> jnp.ndarray:
    """Torontonian of a 2m x 2m matrix (reference torontonian_.py:27).

    Under the complex64 policy both the gamma=None (threshold click
    probability) case and the displaced (loop) case run fully in df32 —
    see the module header."""
    o_mat = jnp.asarray(o_mat, dtype=cdtype())
    size = o_mat.shape[-1]
    if o_mat.dtype == jnp.complex64 and size >= 6:
        if gamma is None:
            return _torontonian_df32(o_mat)
        return _torontonian_loop_df32(o_mat, jnp.asarray(gamma, o_mat.dtype))
    if gamma is None:
        gamma = jnp.zeros(size, dtype=o_mat.dtype)
    else:
        gamma = jnp.asarray(gamma, dtype=o_mat.dtype)
    return _torontonian_plain(o_mat, gamma)


def torontonian_batch(o_mat, gamma=None) -> jnp.ndarray:
    """Batched torontonian (reference torontonian_.py:49)."""
    o_mat = jnp.asarray(o_mat)
    if gamma is None:
        return jax.vmap(lambda m: torontonian(m, None))(o_mat)
    return jax.vmap(torontonian)(o_mat, jnp.asarray(gamma))
