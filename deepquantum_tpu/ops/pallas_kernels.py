"""Pallas TPU kernels for the hot combinatorial reductions.

The permanent is the #1 photonic kernel (SURVEY §2.2): 2^n Ryser subsets,
each a row-combination + column product. The jnp path scans MXU matmuls over
HBM-staged chunks; this kernel keeps the matrix and the running accumulator
in VMEM across the whole powerset sweep — one kernel launch, zero HBM traffic
beyond the n x n input (split into real/imag planes: Mosaic has no complex
dtype).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import cdtype

__all__ = ['permanent_pallas']


def _permanent_kernel(mr_ref, mi_ref, out_ref, *, n: int, rows: int, nchunk: int):
    """One VMEM-resident Ryser sweep. All tensors live as (rows, 128) tiles."""
    chunk = rows * 128
    row_id = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
    lane_id = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    base = row_id * 128 + lane_id                          # 0..chunk-1

    def body(c_idx, acc):
        idx = base + c_idx * chunk
        # per-mode subset bits, reused across all n columns
        bits = [((idx >> i) & 1).astype(jnp.float32) for i in range(n)]
        parity = bits[0]
        for i in range(1, n):
            parity = parity + bits[i]
        signs = 1.0 - 2.0 * (parity.astype(jnp.int32) & 1).astype(jnp.float32)
        prod_r = None
        prod_i = None
        for j in range(n):
            col_r = bits[0] * mr_ref[0, j]
            col_i = bits[0] * mi_ref[0, j]
            for i in range(1, n):
                col_r = col_r + bits[i] * mr_ref[i, j]
                col_i = col_i + bits[i] * mi_ref[i, j]
            if prod_r is None:
                prod_r, prod_i = col_r, col_i
            else:
                new_r = prod_r * col_r - prod_i * col_i
                prod_i = prod_r * col_i + prod_i * col_r
                prod_r = new_r
        acc_r, acc_i = acc
        return (acc_r + jnp.sum(prod_r * signs), acc_i + jnp.sum(prod_i * signs))

    tot_r, tot_i = jax.lax.fori_loop(
        0, nchunk, body, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)))
    sign_n = 1.0 if n % 2 == 0 else -1.0
    out_ref[:] = sign_n * jnp.concatenate(
        [tot_r.reshape(1, 1), tot_i.reshape(1, 1)], axis=1)


@functools.partial(jax.jit, static_argnames=('chunk_size',))
def permanent_pallas(mat, chunk_size: int = 1 << 13):
    """Ryser permanent as a single Pallas kernel (VMEM-resident sweep)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    mat = jnp.asarray(mat, cdtype())
    n = mat.shape[-1]
    assert n >= 4, 'use photonic.qmath.permanent for n < 4'
    chunk = min(chunk_size, 1 << n)
    rows = max(chunk // 128, 1)
    chunk = rows * 128
    nchunk = max((1 << n) // chunk, 1)
    kernel = functools.partial(_permanent_kernel, n=n, rows=rows, nchunk=nchunk)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 2), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.real(mat).astype(jnp.float32), jnp.imag(mat).astype(jnp.float32))
    return (out[0, 0] + 1j * out[0, 1]).astype(cdtype())
