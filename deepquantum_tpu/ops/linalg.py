"""Numerically-safe linear algebra with custom gradients.

jax's native SVD JVP divides by differences of singular values and NaNs on
(near-)degenerate spectra — exactly the situation truncated MPS sweeps
produce. ``svd_safe`` replaces the backward with the tensorgrad-style
regularized formula the reference uses (reference qmath.py:159-223,
safe_inverse eps regularization), expressed as a jax.custom_vjp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ['svd_safe', 'safe_inverse', 'qr_stable']


def qr_stable(mat):
    """Reduced QR-like factorization differentiable for any aspect ratio.

    jax's QR JVP only covers m >= n; for wide matrices fall back to
    U, (S Vh) from the safe SVD — same role as the reference's custom QR
    gradient (reference qmath.py:236-306, adapted from TensorCircuit).
    """
    m, n = mat.shape[-2], mat.shape[-1]
    if m >= n:
        return jnp.linalg.qr(mat)
    u, s, vh = svd_safe(mat)
    return u, s[..., :, None].astype(u.dtype) * vh


def safe_inverse(x, epsilon: float = 1e-12):
    """x / (x^2 + eps): bounded inverse (reference qmath.py:159)."""
    return x / (x ** 2 + epsilon)


@jax.custom_vjp
def svd_safe(a):
    """SVD (reduced) with numerically-stable backward; s returned real."""
    u, s, vh = jnp.linalg.svd(a, full_matrices=False)
    return u, s, vh


def _svd_fwd(a):
    u, s, vh = jnp.linalg.svd(a, full_matrices=False)
    return (u, s, vh), (u, s, vh)


def _svd_bwd(res, cotangents):
    u, s, vh = res
    du, ds, dvh = (jnp.conj(c) for c in cotangents)
    s_c = s.astype(u.dtype)
    uh = jnp.conj(jnp.swapaxes(u, -1, -2))
    v = jnp.conj(jnp.swapaxes(vh, -1, -2))
    dv = jnp.conj(jnp.swapaxes(dvh, -1, -2))
    m = u.shape[-2]
    n = v.shape[-2]
    ns = s.shape[-1]

    f = s[..., None, :] ** 2 - s[..., :, None] ** 2
    f = safe_inverse(f).astype(u.dtype)
    eye = jnp.eye(ns, dtype=u.dtype)
    f = f * (1 - eye)

    j = f * (uh @ du)
    k = f * (vh @ dv)
    vhdv = vh @ dv
    l = jnp.diagonal(vhdv, axis1=-2, axis2=-1)
    l = jnp.zeros_like(vhdv) + l[..., None, :] * eye
    s_inv = safe_inverse(s).astype(u.dtype)
    s_inv_mat = jnp.zeros_like(vhdv) + s_inv[..., None, :] * eye
    mat_s = jnp.zeros_like(vhdv) + s_c[..., None, :] * eye
    jh = jnp.conj(jnp.swapaxes(j, -1, -2))
    kh = jnp.conj(jnp.swapaxes(k, -1, -2))
    lh = jnp.conj(jnp.swapaxes(l, -1, -2))
    ds_mat = jnp.zeros_like(vhdv) + ds.astype(u.dtype)[..., None, :] * eye
    da = u @ (ds_mat + (j + jh) @ mat_s + mat_s @ (k + kh) + s_inv_mat @ (lh - l) / 2) @ vh
    if m > ns:
        da = da + (jnp.eye(m, dtype=u.dtype) - u @ uh) @ du @ s_inv_mat @ vh
    if n > ns:
        da = da + u @ s_inv_mat @ dvh @ (jnp.eye(n, dtype=u.dtype) - v @ vh)
    # torch autograd hands backward() the conjugated Wirtinger cotangent;
    # jax's VJP convention is the unconjugated one — conjugate in and out.
    return (jnp.conj(da),)


svd_safe.defvjp(_svd_fwd, _svd_bwd)
