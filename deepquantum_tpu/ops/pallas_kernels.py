"""Pallas TPU kernels for the hot combinatorial reductions.

The permanent is the #1 photonic kernel (SURVEY §2.2: reference
photonic/qmath.py:121-146 vmapped Ryser). A TPU has no f64 hardware and plain
f32 Ryser is useless beyond ~12 modes: the alternating-sign subset sum
cancels catastrophically (measured 2.6e-2 relative error at n=20 vs f64).
This kernel therefore evaluates every term in *double-single* ("df32")
arithmetic — ~2^-48 per-op relative error — entirely in VMEM:

- **Exact column sums.** Each matrix column is pre-split (outside the kernel)
  into four 12-bit fixed-point planes scaled by a power of two. A Ryser row
  subset then sums at most n <= 26 integers of <= 12 bits per plane — exact in
  f32 — and the planes recombine into a df32 value with one two-sum. No
  compensated accumulation is needed where it matters most.
- **df32 product chain.** The per-subset column product runs in two-float
  complex arithmetic (bitmasked Veltkamp splits + two-prod/two-sum), immune
  to fast-math reassociation because the splits go through integer bitcasts.
- **df32 subset accumulation** into a per-lane (hi, lo) vector accumulator;
  the final 1024-lane reduction happens in a tiny jnp epilogue, also in df32.

Accuracy: ~n * 2^-48 per term, so even with cancellation amplification ~1e5
at n=22 the result lands near 1e-9 relative — validated against the f64
reference at <= 1e-6 (tests/test_photonic.py). One kernel launch per
permanent, zero HBM traffic beyond the 8 n x n input planes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import cdtype

__all__ = ['permanent_pallas', 'permanent_pallas_batch']

_SUB = 8          # sublanes per chunk tile
_LANES = 128
_CHUNK = _SUB * _LANES

_TW12 = np.float32(2.0 ** -12)
_TW24 = np.float32(2.0 ** -24)
_TW36 = np.float32(2.0 ** -36)


# ------------------------------------------------------------ df32 primitives
def _two_sum(a, b):
    """Knuth two-sum: a + b = s + e exactly (adds only, fast-math safe)."""
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _fast_two_sum(a, b):
    """Dekker quick two-sum, valid when |a| >= |b|."""
    s = a + b
    return s, b - (s - a)


def _vsplit(a):
    """Veltkamp split via mantissa bitmask (opaque to reassociation):
    a = hi + lo with hi carrying 12 significant bits."""
    ai = jax.lax.bitcast_convert_type(a, jnp.int32)
    hi = jax.lax.bitcast_convert_type(
        jnp.bitwise_and(ai, jnp.int32(-4096)), jnp.float32)   # 0xFFFFF000
    return hi, a - hi


def _two_prod(a, b):
    """a * b = p + e exactly (split-based, no FMA requirement)."""
    p = a * b
    ah, al = _vsplit(a)
    bh, bl = _vsplit(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def _df_mul(ah, al, bh, bl):
    p, e = _two_prod(ah, bh)
    e = e + (ah * bl + al * bh)
    return _fast_two_sum(p, e)


def _df_add(ah, al, bh, bl):
    s, e = _two_sum(ah, bh)
    return _fast_two_sum(s, e + (al + bl))


def _df_cmul(pr, pi, cr, ci):
    """Complex df32 multiply: (pr + i pi) * (cr + i ci); operands/results are
    (hi, lo) pairs."""
    rr = _df_mul(*pr, *cr)
    ii = _df_mul(*pi, *ci)
    ri = _df_mul(*pr, *ci)
    ir = _df_mul(*pi, *cr)
    re = _df_add(rr[0], rr[1], -ii[0], -ii[1])
    im = _df_add(ri[0], ri[1], ir[0], ir[1])
    return re, im


# ------------------------------------------------------------ plane splitting
def _split_planes(mat):
    """Split an (..., n, n) complex matrix into 12-bit fixed-point planes.

    Returns planes (..., 8, n, n) f32 — [re a, re b, re c, re d, im a..d] with
    entry = (a + b 2^-12 + c 2^-24 + d 2^-36) * scale_j — and per-column
    power-of-two scales (..., n) f32 chosen so each column's max magnitude
    lands in [2^11, 2^12).
    """
    re = jnp.real(mat).astype(jnp.float32)
    im = jnp.imag(mat).astype(jnp.float32)
    colmax = jnp.maximum(jnp.max(jnp.abs(re), axis=-2), jnp.max(jnp.abs(im), axis=-2))
    colmax = jnp.maximum(colmax, jnp.float32(1e-30))
    # scale = 2^(floor(log2(colmax)) - 11): built EXACTLY by exponent-field
    # bitcast — jnp.exp2 lowers to exp(x ln2) and is NOT exact at integers,
    # which would silently re-quantize every entry at the f32 level.
    expo = jnp.clip(jnp.floor(jnp.log2(colmax)).astype(jnp.int32), -100, 100)

    def pow2(e):
        return jax.lax.bitcast_convert_type(
            jnp.left_shift(e + jnp.int32(127), 23), jnp.float32)

    inv_scale = pow2(jnp.int32(11) - expo)                  # applied to entries
    scale = pow2(expo - jnp.int32(11))                      # restored per column

    def planes_of(x):
        xs = x * inv_scale[..., None, :]
        p0 = jnp.round(xs)
        r0 = xs - p0
        p1 = jnp.round(r0 * np.float32(4096.0))
        r1 = r0 - p1 * _TW12
        p2 = jnp.round(r1 * np.float32(4096.0 ** 2))
        r2 = r1 - p2 * _TW24
        p3 = jnp.round(r2 * np.float32(4096.0 ** 3))
        return p0, p1, p2, p3

    planes = jnp.stack(list(planes_of(re)) + list(planes_of(im)), axis=-3)
    return planes, scale


# ----------------------------------------------------------------- the kernel
def _ryser_df32_kernel(planes_ref, scale_ref, out_ref, *, n: int, nchunk: int):
    """df32 Ryser sweep: grid element = one matrix; VMEM-resident throughout."""
    row_id = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANES), 0)
    lane_id = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANES), 1)
    base = row_id * _LANES + lane_id
    nvalid = jnp.int32(1 << n)
    zeros = jnp.zeros((_SUB, _LANES), jnp.float32)

    def body(c_idx, acc):
        idx = base + c_idx * _CHUNK
        valid = (idx < nvalid).astype(jnp.float32)
        bits = [((idx >> i) & 1).astype(jnp.float32) for i in range(n)]
        parity = bits[0]
        for i in range(1, n):
            parity = parity + bits[i]
        signs = (1.0 - 2.0 * (parity.astype(jnp.int32) & 1).astype(jnp.float32)) * valid

        pr = (jnp.full((_SUB, _LANES), 1.0, jnp.float32), zeros)
        pi = (zeros, zeros)
        for j in range(n):
            sums = []
            for k in range(8):                       # 4 re planes, 4 im planes
                s = bits[0] * planes_ref[0, k, 0, j]
                for i in range(1, n):
                    s = s + bits[i] * planes_ref[0, k, i, j]  # exact: 12-bit ints
                sums.append(s)
            sc = scale_ref[0, 0, j]
            # recombine planes -> df32, restore the column scale (pow2: exact)
            ch, ce = _two_sum(sums[0], sums[1] * _TW12)
            cr = ((ch) * sc, (ce + (sums[2] * _TW24 + sums[3] * _TW36)) * sc)
            ch, ce = _two_sum(sums[4], sums[5] * _TW12)
            ci = ((ch) * sc, (ce + (sums[6] * _TW24 + sums[7] * _TW36)) * sc)
            pr, pi = _df_cmul(pr, pi, cr, ci)

        ar = _df_add(acc[0], acc[1], pr[0] * signs, pr[1] * signs)
        ai = _df_add(acc[2], acc[3], pi[0] * signs, pi[1] * signs)
        return (ar[0], ar[1], ai[0], ai[1])

    acc = jax.lax.fori_loop(0, nchunk, body, (zeros, zeros, zeros, zeros))
    out_ref[0, 0] = acc[0]
    out_ref[0, 1] = acc[1]
    out_ref[0, 2] = acc[2]
    out_ref[0, 3] = acc[3]


def _df32_tree_reduce(acc):
    """jnp epilogue: df32 reduction of the (4, SUB, LANES) accumulator planes
    down to one complex value (log-depth two-sum tree, reassociation-safe)."""
    hi_r = acc[0].reshape(-1)
    lo_r = acc[1].reshape(-1)
    hi_i = acc[2].reshape(-1)
    lo_i = acc[3].reshape(-1)

    def fold(hi, lo):
        while hi.shape[0] > 1:
            m = hi.shape[0] // 2
            s, e = _two_sum(hi[:m], hi[m:])
            hi, lo = s, e + (lo[:m] + lo[m:])
        return hi[0], lo[0]

    rh, rl = fold(hi_r, lo_r)
    ih, il = fold(hi_i, lo_i)
    return rh, rl, ih, il


@functools.partial(jax.jit, static_argnames=('interpret',))
def permanent_pallas_batch(mats, interpret: bool = False):
    """Ryser permanents of a (B, n, n) complex batch — one df32 Pallas launch.

    Replaces the reference's chunked vmap (photonic/qmath.py:121-146,
    mem_to_chunksize) with a VMEM-resident grid: program b sweeps all 2^n
    subsets for matrix b. ``interpret=True`` runs the kernel through the
    Pallas interpreter (any backend; used by the CPU parity tests).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    mats = jnp.asarray(mats)
    assert mats.ndim == 3 and mats.shape[-1] == mats.shape[-2]
    b, n, _ = mats.shape
    assert 4 <= n <= 26, 'permanent_pallas supports 4 <= n <= 26'
    nchunk = max((1 << n) // _CHUNK, 1)
    planes, scale = _split_planes(mats.astype(jnp.complex64))
    kernel = functools.partial(_ryser_df32_kernel, n=n, nchunk=nchunk)
    acc = pl.pallas_call(
        kernel,
        grid=(b,),
        out_shape=jax.ShapeDtypeStruct((b, 4, _SUB, _LANES), jnp.float32),
        in_specs=[pl.BlockSpec((1, 8, n, n), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 4, _SUB, _LANES), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(planes.reshape(b, 8, n, n), scale.reshape(b, 1, n))
    sign_n = 1.0 if n % 2 == 0 else -1.0
    rh, rl, ih, il = jax.vmap(_df32_tree_reduce)(acc)
    rt = jnp.real(jnp.zeros((), cdtype())).dtype     # f64 keeps the low word
    out = (rh.astype(rt) + rl.astype(rt)) + 1j * (ih.astype(rt) + il.astype(rt))
    return (sign_n * out).astype(cdtype())


def permanent_pallas(mat, interpret: bool = False):
    """df32 Ryser permanent of one matrix as a single Pallas kernel."""
    return permanent_pallas_batch(jnp.asarray(mat)[None], interpret=interpret)[0]
