"""Double-single ("df32") arithmetic at the jnp level.

TPUs have no float64; complex64 alone loses 1e-5-level relative accuracy in
cancellation-heavy photonic matrix functions (hafnian trace powers,
torontonian inclusion-exclusion determinant sums). This module provides
~2^-48-per-op arithmetic built from the same Dekker split / two-prod /
two-sum primitives as the Pallas permanent kernel (ops/pallas_kernels.py),
expressed in plain jnp so it runs on TPU, on the CPU complex64 policy, and
inside vmap/scan bodies.

Representations
  - real df32:    an (hi, lo) pair of float32 arrays, value = hi + lo
  - complex df32: ((re_hi, re_lo), (im_hi, im_lo))

Graph-size rules learned the hard way (see git history of
photonic/hafnian_.py): contractions and reductions must be lax.scan based.
An unrolled or halving-tree reduction that slices a large fused producer
makes XLA duplicate the producer into every branch — measured 24k HLO ops
and a 60 s (!) n=10 hafnian on a 1-vCPU host, where the scan form is 7.6k
ops and 4 ms — and ``optimization_barrier`` does not prevent it.

No analog in the reference (it relies on torch float64 throughout, e.g.
src/deepquantum/photonic/hafnian_.py); this is TPU-native machinery.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# two-sum / split primitives shared with the Pallas permanent kernel (adds
# and exact-by-construction products only — safe under FMA contraction)
from .pallas_kernels import _df_add, _fast_two_sum, _two_sum, _vsplit

# FMA-contraction hazard (measured, XLA:CPU): when a rounded product
# ``p = a * b`` is CSE-duplicated into a consumer fusion, the backend
# contracts ``p + e`` into ``fma(a, b, e)`` — which re-derives the EXACT
# product and double-counts the captured rounding error (verified in HLO:
# the hafnian leaked at ~2^-26 instead of ~2^-48 because of exactly this;
# ``optimization_barrier`` does NOT survive to stop it). The primitives
# below therefore never place a ROUNDED product where an add can contract
# it: every multiply is exact by construction (12-bit split halves, error
# magnitudes, +-1 signs, masks, powers of two), for which fma(a, b, x) and
# add(a*b, x) are bit-identical.


def _two_prod(a, b):
    """a * b = p + e (|e| <= ulp(p)/2-level), contraction-proof: the four
    12x12-bit split sub-products are each exactly representable in f32, and
    p is assembled from them with two-sum chains (adds only)."""
    ah, al = _vsplit(a)
    bh, bl = _vsplit(b)
    hh = ah * bh
    hl = ah * bl
    lh = al * bh
    ll = al * bl
    t1, q1 = _two_sum(hh, hl)
    t2, q2 = _two_sum(t1, lh)
    t3, q3 = _two_sum(t2, ll)
    return _fast_two_sum(t3, (q3 + q2) + q1)


def _df_mul(ah, al, bh, bl):
    p, e = _two_prod(ah, bh)
    e = e + (ah * bl + al * bh)
    return _fast_two_sum(p, e)


def _df_cmul(pr, pi, cr, ci):
    """Complex df32 multiply; operands/results are (hi, lo) pairs."""
    rr = _df_mul(*pr, *cr)
    ii = _df_mul(*pi, *ci)
    ri = _df_mul(*pr, *ci)
    ir = _df_mul(*pi, *cr)
    re = _df_add(rr[0], rr[1], -ii[0], -ii[1])
    im = _df_add(ri[0], ri[1], ir[0], ir[1])
    return re, im

__all__ = [
    'const_split', 'df_add', 'df_mul', 'df_div', 'df_sqrt',
    'df_exp', 'df_sincos',
    'cdf_lift', 'cdf_add', 'cdf_neg', 'cdf_mul', 'cdf_div', 'cdf_sqrt',
    'cdf_exp',
    'cdf_scale_int', 'cdf_scale_const', 'cdf_reduce0', 'cdf_sum_axis',
    'cdf_matmul', 'cdf_trace', 'cdf_to_complex',
]

df_add = _df_add
df_mul = _df_mul


def const_split(c: float):
    """Host split of a python double into an (hi, lo) f32 pair."""
    hi = np.float32(c)
    return jnp.float32(hi), jnp.float32(np.float64(c) - np.float64(hi))


def df_div(ah, al, bh, bl):
    """df32 division: one f32 quotient plus one exact-residual correction
    (error ~2^-47)."""
    q0 = ah / bh
    p, e = _two_prod(q0, bh)
    p2, _ = _two_prod(q0, bl)   # contraction-proof (a bare q0*bl would be
    e = e + p2                  # silently fma-contracted, ~2^-36 leak)
    rh, rl = _df_add(ah, al, -p, -e)
    return _fast_two_sum(q0, (rh + rl) / bh)


def df_sqrt(ah, al):
    """df32 square root of a nonnegative real df value: f32 seed + one
    Newton correction s += (a - s^2) / (2 s). Zero-safe."""
    s0 = jnp.sqrt(ah)
    safe = jnp.where(s0 > 0, s0, jnp.float32(1))
    p, e = _two_prod(s0, s0)
    rh, rl = _df_add(ah, al, -p, -e)
    corr = jnp.where(s0 > 0, (rh + rl) / (2 * safe), jnp.float32(0))
    return _fast_two_sum(s0, corr)


# -------------------------------------------------------- transcendentals
def _df_horner(uh, ul, coeffs):
    """Polynomial sum c_j u^j in df32 (coeffs: python doubles, highest first)."""
    ah, al = const_split(coeffs[0])
    ah = jnp.broadcast_to(ah, uh.shape)
    al = jnp.broadcast_to(al, uh.shape)
    for c in coeffs[1:]:
        ch, cl = const_split(c)
        ah, al = _df_mul(ah, al, uh, ul)
        ah, al = _df_add(ah, al, ch, cl)
    return ah, al


def _df_reduce_const(ah, al, k, c: float):
    """a - k * c with c a split double and k integer-valued f32: both
    products are exact two-prods, so the reduction keeps ~2^-48 even when
    k * c_hi is not representable."""
    ch, cl = const_split(c)
    p1, e1 = _two_prod(k, ch)
    p2, e2 = _two_prod(k, cl)
    th, tl = _df_add(ah, al, -p1, -e1)
    return _df_add(th, tl, -p2, -e2)


import math as _math

_LN2 = float(np.log(np.float64(2.0)))
_HALFPI = float(np.pi / 2)
_EXP_COEFFS = [1.0 / _math.factorial(j) for j in range(13, -1, -1)]
_SIN_COEFFS = [(-1.0) ** j / _math.factorial(2 * j + 1)
               for j in range(7, -1, -1)]
_COS_COEFFS = [(-1.0) ** j / _math.factorial(2 * j)
               for j in range(8, -1, -1)]


def df_exp(ah, al):
    """df32 real exponential: round-to-nearest power-of-two reduction
    a = k ln2 + t (|t| <= ln2/2, exact two-prod reduction), degree-13
    Taylor in df32 Horner form, exact 2^k rescale. ~1e-14 relative."""
    k = jnp.round((ah + al) * np.float32(1.0 / _LN2))
    th, tl = _df_reduce_const(ah, al, k, _LN2)
    eh, el = _df_horner(th, tl, _EXP_COEFFS)
    # 2^k must be EXACT — jnp.exp2 is a polynomial approximation (~2^-20
    # rel err, measured 1.1e-6 at a=23.7), so build the power of two from
    # the exponent bits. Split k across two factors so the edge octaves
    # (e.g. exp(88.5): k = 128, representable result) don't clip to inf —
    # a single bitcast covers only k in [-126, 127]; the split covers
    # [-252, 254], beyond which f32 is inf/0 anyway.
    ki = k.astype(jnp.int32)
    k1 = jnp.clip(ki // 2, -126, 127)
    k2 = jnp.clip(ki - k1, -126, 127)

    def pow2(e):
        return jax.lax.bitcast_convert_type(
            ((e + 127) << 23).astype(jnp.int32), jnp.float32)

    scale1 = pow2(k1)
    scale2 = pow2(k2)
    return eh * scale1 * scale2, el * scale1 * scale2


def df_sincos(ah, al):
    """df32 (sin, cos): quadrant reduction a = k pi/2 + t (|t| <= pi/4),
    Taylor in u = t^2, branch-free quadrant selection. Returns
    ((sin_hi, sin_lo), (cos_hi, cos_lo))."""
    k = jnp.round((ah + al) * np.float32(1.0 / _HALFPI))
    th, tl = _df_reduce_const(ah, al, k, _HALFPI)
    uh, ul = _df_mul(th, tl, th, tl)
    ph, pl = _df_horner(uh, ul, _SIN_COEFFS)
    sh, sl = _df_mul(th, tl, ph, pl)         # sin(t) = t * P(t^2)
    ch, cl = _df_horner(uh, ul, _COS_COEFFS)
    q = k - 4.0 * jnp.floor(k * 0.25)        # k mod 4, integer-valued f32

    def pick(q0, q1, q2, q3):
        return (jnp.where(q == 0, q0[0], jnp.where(q == 1, q1[0],
                jnp.where(q == 2, q2[0], q3[0]))),
                jnp.where(q == 0, q0[1], jnp.where(q == 1, q1[1],
                jnp.where(q == 2, q2[1], q3[1]))))

    s = (sh, sl)
    c = (ch, cl)
    ns = (-sh, -sl)
    nc = (-ch, -cl)
    return pick(s, c, ns, nc), pick(c, ns, nc, s)


def cdf_exp(z):
    """Complex df32 exponential exp(x + iy) = e^x (cos y + i sin y)."""
    m = df_exp(*z[0])
    s, c = df_sincos(*z[1])
    return (_df_mul(*m, *c), _df_mul(*m, *s))


# ------------------------------------------------------------------ complex
def cdf_lift(re, im):
    z = jnp.zeros_like(re)
    return ((re, z), (im, z))


def cdf_add(z, w):
    return (_df_add(*z[0], *w[0]), _df_add(*z[1], *w[1]))


def cdf_neg(z):
    return tuple(tuple(-x for x in comp) for comp in z)


def cdf_mul(z, w):
    return _df_cmul(z[0], z[1], w[0], w[1])


def cdf_div(z, w):
    """Complex df32 division z / w via z * conj(w) / |w|^2."""
    den = _df_add(*_df_mul(*w[0], *w[0]), *_df_mul(*w[1], *w[1]))
    num = cdf_mul(z, (w[0], (-w[1][0], -w[1][1])))
    return (df_div(*num[0], *den), df_div(*num[1], *den))


def cdf_sqrt(z):
    """Principal complex df32 square root (elementwise, branch-free via
    where, zero-safe)."""
    x, y = z
    r = df_sqrt(*_df_add(*_df_mul(*x, *x), *_df_mul(*y, *y)))
    pos = x[0] >= 0
    # u = sqrt((r + |x|) / 2) on the dominant side (always well-conditioned),
    # partner component = |y| / (2 u)
    rpx = _df_add(*r, *x)
    rmx = _df_add(*r, -x[0], -x[1])
    big = (jnp.where(pos, rpx[0], rmx[0]) * 0.5,
           jnp.where(pos, rpx[1], rmx[1]) * 0.5)
    u = df_sqrt(*big)
    safe_u = (jnp.where(u[0] > 0, u[0], jnp.float32(1)), u[1])
    sign_y = jnp.where(y[0] < 0, jnp.float32(-1), jnp.float32(1))
    abs_y_half = (sign_y * y[0] * 0.5, sign_y * y[1] * 0.5)
    q = df_div(*abs_y_half, *safe_u)
    q = (jnp.where(u[0] > 0, q[0], jnp.float32(0)),
         jnp.where(u[0] > 0, q[1], jnp.float32(0)))
    # x >= 0: sqrt = u + i sign(y) q;   x < 0: sqrt = q + i sign(y) u
    re = (jnp.where(pos, u[0], q[0]), jnp.where(pos, u[1], q[1]))
    im = (sign_y * jnp.where(pos, q[0], u[0]),
          sign_y * jnp.where(pos, q[1], u[1]))
    return (re, im)


def cdf_scale_int(z, k: int):
    """Integer scale via the exact two-prod chain. A bare ``hi * k`` would
    round the full 24-bit mantissa (k=5 needs 27 bits) and leak ~2^-25
    error per term — measured 2.4e-8 at the hafnian subset level."""
    return cdf_scale_const(z, float(k))


def cdf_scale_const(z, c: float):
    ch, cl = const_split(c)
    return (_df_mul(z[0][0], z[0][1], ch, cl),
            _df_mul(z[1][0], z[1][1], ch, cl))


def cdf_reduce0(z):
    """Complex df32 sum over axis 0 via lax.scan (sequential two-sum
    accumulation, ~n * 2^-48). See module header for why not a tree."""
    shape = z[0][0].shape[1:]
    zero = jnp.zeros(shape, jnp.float32)
    acc0 = ((zero, zero), (zero, zero))

    def step(acc, c):
        return cdf_add(acc, c), None

    total, _ = jax.lax.scan(step, acc0, z)
    return total


def cdf_sum_axis(z, axis: int):
    """Complex df32 sum over one axis (moveaxis + scan)."""
    zz = tuple(tuple(jnp.moveaxis(x, axis, 0) for x in comp) for comp in z)
    return cdf_reduce0(zz)


def cdf_matmul(a, b):
    """Complex df32 matmul (..., p, q) @ (..., q, r): lax.scan over the
    contraction axis — exact two-prods, ~2^-48 sequential accumulation,
    O(1)-in-q graph."""
    a_t = tuple(tuple(jnp.moveaxis(x, -1, 0)[..., None] for x in comp)
                for comp in a)                       # (q, ..., p, 1)
    b_t = tuple(tuple(jnp.moveaxis(x, -2, 0)[..., None, :]
                      for x in comp) for comp in b)  # (q, ..., 1, r)
    p = a[0][0].shape[-2]
    r = b[0][0].shape[-1]
    batch = jnp.broadcast_shapes(a[0][0].shape[:-2], b[0][0].shape[:-2])
    zero = jnp.zeros(batch + (p, r), jnp.float32)
    acc0 = ((zero, zero), (zero, zero))

    def step(acc, slabs):
        sa, sb = slabs
        return cdf_add(acc, cdf_mul(sa, sb)), None

    acc, _ = jax.lax.scan(step, acc0, (a_t, b_t))
    return acc


def cdf_trace(m):
    d = tuple(tuple(jnp.diagonal(x, axis1=-2, axis2=-1) for x in comp)
              for comp in m)
    return cdf_sum_axis(d, -1)


def cdf_to_complex(z):
    """Round a complex df32 value to complex64 (the only f32-level step)."""
    return jax.lax.complex(z[0][0] + z[0][1],
                           z[1][0] + z[1][1]).astype(jnp.complex64)
