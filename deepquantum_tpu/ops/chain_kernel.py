"""VMEM-resident fused window-chain kernel — the small-n latency engine.

At n <= 19 the whole planar state is 2 x 2^n x 4 B <= 4 MB — a fraction of a
TPU core's ~16 MB VMEM — yet the per-gate kernel architecture still pays one
HBM read+write per pass. Measured consequence at the n18_l5 headline
(window_ablation_ms, r5): collapsing 224 per-gate passes into 86 window/rot
passes moved the grad step NOT AT ALL (5.21 -> 5.36 ms) — per-pass HBM
round trips, not pass count, were the bound.

This module executes an ENTIRE scheduled window sequence (the ('win', w) /
('rot', d) stream produced by ops/window_gate.py::schedule_window_seq) as
ONE Pallas launch with the state held in VMEM scratch that persists across
sequential grid iterations.

Architecture — every choice below was forced by a measured Mosaic
compile-time cliff on the attached toolchain:

- **Grid over steps, uniform body.** An unrolled body is hopeless: Mosaic
  takes minutes per HIGHEST-precision dot (74-177 s for ONE window at
  (128, 2048)), so 86 unrolled steps would take hours. The grid is
  (n_steps,); compile cost is ONE body regardless of sequence length.
- **Step tables ride in SMEM, not scalar prefetch.**
  `PrefetchScalarGridSpec` with a table-driven index map never finished
  compiling (>18 min for an 8-step toy vs 1.3 s for the same kernel with
  plain SMEM tables); the tables are ordinary SMEM inputs indexed by
  `program_id`, and the window stack is expanded to one (2^w, 2^w) entry
  PER STEP so its block index is just `g` (zero blocks at rot steps — the
  wasted DMA is ~128 KB/step, microseconds against HBM bandwidth).
- **Matmuls are manual bf16x6.** `Precision.HIGHEST` inside a Mosaic kernel
  is the compile-time killer (it is exactly this 6-pass decomposition, but
  Mosaic schedules it catastrophically slowly); emitting the six
  default-precision bf16 MXU passes by hand compiles in seconds and keeps
  ~f32 accuracy (terms below 2^-24 dropped; measured 1.4e-7 vs f64, BETTER
  than a plain f32 matmul's 3.5e-7).
- ('rot', d): the cyclic wire-relabel transpose as an in-VMEM reshape +
  swapaxes. Legal deltas are 7 <= d <= n-7 (planar_gate._rot_legal), so a
  sequence contains at most n-13 distinct deltas — each compiles once as a
  static `pl.when` branch selected by the SMEM delta-index table.

HBM traffic for a whole forward: one state read, one state write, one
streamed read of the per-step window stack — versus 86 full 2 x 2^n
sweeps. The backward mirrors it: one launch walks the sequence in reverse
carrying (y, g) in VMEM scratch, emitting per-step cotangent blocks
dW = g x^H (zeros at rot steps) and the propagated state cotangent (same
adjoint recurrence as planar_chain's _chain_bwd).

Second-order note: these kernels carry no AD rules — planar_chain's bwd
uses them only when fused mode is on (DQ_CHAIN_FUSED, default on) and the
sequence qualifies; QubitCircuit.hessian pins the flag off around its
rev-over-rev trace.

No analog in the reference (its hot loop is one torch einsum per gate,
reference qmath.py:485); VMEM residency is TPU-native machinery.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['chain_fused_ok', 'window_chain_fwd', 'window_chain_bwd']

# planes cap: fwd carries 2 state planes in VMEM scratch; bwd carries 4
# (y and g). n=19 planes are 2 MB each -> bwd scratch 8 MB, inside the
# ~16 MB VMEM alongside the double-buffered window blocks.
_MAX_N = 19
_MIN_N = 14


def _use_chain_fused() -> bool:
    return os.environ.get('DQ_CHAIN_FUSED', '1') != '0'


def chain_fused_ok(wires_seq, n: int, mres) -> bool:
    """A sequence qualifies when every step is ('rot', d) or ('win', w) with
    one common w, there is at least one window, the state fits VMEM, and the
    planes are unbatched f32."""
    if not _use_chain_fused() or not (_MIN_N <= n <= _MAX_N):
        return False
    ws = {s[1] for s in wires_seq if s[0] == 'win'}
    if len(ws) != 1:
        return False
    if any(s[0] not in ('rot', 'win') for s in wires_seq):
        return False
    return all(m.ndim == 2 for m in mres)


def _dot_x6(a, b, dims):
    """~f32-accurate matmul as six default-precision bf16 MXU passes
    (the HIGHEST decomposition, hand-emitted — see module header).
    a, b: f32; returns f32. Terms of relative weight < 2^-24 are dropped."""
    # precision must be EXPLICIT: config.py sets jax_default_matmul_precision
    # to 'highest' globally, which stamps contract_precision<fp32> onto these
    # bf16 dots — an op Mosaic rejects ("Bad lhs type"). DEFAULT on bf16
    # operands is the native single MXU pass, exactly what we emit six of.
    dot = functools.partial(jax.lax.dot_general, dimension_numbers=dims,
                            precision=jax.lax.Precision.DEFAULT,
                            preferred_element_type=jnp.float32)
    ah = a.astype(jnp.bfloat16)
    ar = a - ah.astype(jnp.float32)
    am = ar.astype(jnp.bfloat16)
    al = (ar - am.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    br = b - bh.astype(jnp.float32)
    bm = br.astype(jnp.bfloat16)
    bl = (br - bm.astype(jnp.float32)).astype(jnp.bfloat16)
    return (dot(ah, bl) + dot(am, bm) + dot(al, bh)) + (
        (dot(ah, bm) + dot(am, bh)) + dot(ah, bh))


def _dot_x3(a, b, dims):
    """3-pass variant (~2^-16 relative, no cross-step compounding) for the
    per-window cotangents dW = g x^H: each dW is one local outer product, so
    the dropped 2^-16 terms never accumulate through the chain, and grads
    only need ~1e-4. Cuts the backward's window work by a third."""
    dot = functools.partial(jax.lax.dot_general, dimension_numbers=dims,
                            precision=jax.lax.Precision.DEFAULT,
                            preferred_element_type=jnp.float32)
    ah = a.astype(jnp.bfloat16)
    am = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bm = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
    return (dot(ah, bm) + dot(am, bh)) + dot(ah, bh)


_DIMS_MV = (((1,), (0,)), ((), ()))     # (W, W) @ (W, R)
_DIMS_TV = (((0,), (0,)), ((), ()))     # (W, W)^T @ (W, R)
_DIMS_OUT = (((1,), (1,)), ((), ()))    # (W, R) @ (W, R)^T -> (W, W)


def _rot2(v, d: int, n: int, w: int):
    """In-VMEM wire relabel of one (2^w, 2^(n-w)) plane."""
    x = v.reshape(1 << d, 1 << (n - d))
    return jnp.swapaxes(x, 0, 1).reshape(1 << w, 1 << (n - w))


def _step_tables(wires_seq, n: int, backward: bool):
    """Per-step SMEM tables (kind, delta-index) plus the static
    distinct-delta list. For the backward walk the sequence is reversed and
    every delta inverted (n - d, also legal)."""
    seq = list(wires_seq)[::-1] if backward else list(wires_seq)
    deltas = []
    kinds = np.zeros(len(seq), np.int32)
    didx = np.zeros(len(seq), np.int32)
    for i, st in enumerate(seq):
        if st[0] == 'win':
            kinds[i] = 1
        else:
            d = (n - st[1]) % n if backward else st[1] % n
            if d not in deltas:
                deltas.append(d)
            didx[i] = deltas.index(d)
    return kinds, didx, tuple(deltas)


def _step_stacks(mres, mims, wires_seq, w: int, backward: bool):
    """Per-STEP window stacks (S, 2^w, 2^w): real windows at win steps,
    zero blocks at rot steps (block index = program_id needs no table)."""
    W = 1 << w
    z = jnp.zeros((W, W), jnp.float32)
    seq = list(zip(wires_seq, mres, mims))
    if backward:
        seq = seq[::-1]
    wre = jnp.stack([m if s[0] == 'win' else z for s, m, _ in seq])
    wim = jnp.stack([m if s[0] == 'win' else z for s, _, m in seq])
    return wre, wim


def _copy(src, dst, sem):
    """Synchronous HBM<->VMEM copy (the big state planes ride memory_space
    ANY: a const-index VMEM block would stay RESIDENT for the whole grid —
    measured 17.25 MB scoped-vmem OOM at the n18 backward with 4 in + 4 out
    planes pinned alongside the 4 scratch planes)."""
    from jax.experimental.pallas import tpu as pltpu
    cp = pltpu.make_async_copy(src, dst, sem)
    cp.start()
    cp.wait()


def _fwd_kernel(kind_ref, didx_ref, xr_ref, xi_ref, wre_ref, wim_ref,
                yr_ref, yi_ref, vr_scr, vi_scr, sem,
                *, n: int, w: int, deltas, nstep: int):
    import jax.experimental.pallas as pl

    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        _copy(xr_ref, vr_scr, sem)
        _copy(xi_ref, vi_scr, sem)

    @pl.when(kind_ref[g] == 1)
    def _():
        mr = wre_ref[0]
        mi = wim_ref[0]
        vr = vr_scr[...]
        vi = vi_scr[...]
        vr_scr[...] = _dot_x6(mr, vr, _DIMS_MV) - _dot_x6(mi, vi, _DIMS_MV)
        vi_scr[...] = _dot_x6(mr, vi, _DIMS_MV) + _dot_x6(mi, vr, _DIMS_MV)

    for j, d in enumerate(deltas):
        @pl.when((kind_ref[g] == 0) & (didx_ref[g] == j))
        def _(d=d):
            vr_scr[...] = _rot2(vr_scr[...], d, n, w)
            vi_scr[...] = _rot2(vi_scr[...], d, n, w)

    @pl.when(g == nstep - 1)
    def _():
        _copy(vr_scr, yr_ref, sem)
        _copy(vi_scr, yi_ref, sem)


def _bwd_kernel(kind_ref, didx_ref, yr_ref, yi_ref, gr_ref, gi_ref,
                wre_ref, wim_ref,
                xr_ref, xi_ref, gor_ref, goi_ref, dwre_ref, dwim_ref,
                yr_scr, yi_scr, gr_scr, gi_scr, sem,
                *, n: int, w: int, deltas, nstep: int):
    """Reverse walk carrying (y, g) in VMEM scratch: x = W^H y, dW = g x^H,
    g = W^H g (the planar_chain adjoint recurrence, planar_gate.py:1069)."""
    import jax.experimental.pallas as pl

    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        _copy(yr_ref, yr_scr, sem)
        _copy(yi_ref, yi_scr, sem)
        _copy(gr_ref, gr_scr, sem)
        _copy(gi_ref, gi_scr, sem)

    @pl.when(kind_ref[g] == 1)
    def _():
        # x = W^H y: conj-transpose apply = contract dim 0, negated im plane
        mr = wre_ref[0]
        mi = wim_ref[0]
        xr = (_dot_x6(mr, yr_scr[...], _DIMS_TV)
              + _dot_x6(mi, yi_scr[...], _DIMS_TV))
        xi = (_dot_x6(mr, yi_scr[...], _DIMS_TV)
              - _dot_x6(mi, yr_scr[...], _DIMS_TV))
        yr_scr[...] = xr
        yi_scr[...] = xi
        # dW = g x^H in split planes (window_gate.py::window_grad algebra)
        dwre_ref[0] = (_dot_x3(gr_scr[...], xr, _DIMS_OUT)
                       + _dot_x3(gi_scr[...], xi, _DIMS_OUT))
        dwim_ref[0] = (_dot_x3(gi_scr[...], xr, _DIMS_OUT)
                       - _dot_x3(gr_scr[...], xi, _DIMS_OUT))
        gr2 = (_dot_x6(mr, gr_scr[...], _DIMS_TV)
               + _dot_x6(mi, gi_scr[...], _DIMS_TV))
        gi2 = (_dot_x6(mr, gi_scr[...], _DIMS_TV)
               - _dot_x6(mi, gr_scr[...], _DIMS_TV))
        gr_scr[...] = gr2
        gi_scr[...] = gi2

    @pl.when(kind_ref[g] == 0)
    def _():
        dwre_ref[0] = jnp.zeros_like(dwre_ref[0])
        dwim_ref[0] = jnp.zeros_like(dwim_ref[0])

    for j, d in enumerate(deltas):
        @pl.when((kind_ref[g] == 0) & (didx_ref[g] == j))
        def _(d=d):
            yr_scr[...] = _rot2(yr_scr[...], d, n, w)
            yi_scr[...] = _rot2(yi_scr[...], d, n, w)
            gr_scr[...] = _rot2(gr_scr[...], d, n, w)
            gi_scr[...] = _rot2(gi_scr[...], d, n, w)

    @pl.when(g == nstep - 1)
    def _():
        _copy(yr_scr, xr_ref, sem)
        _copy(yi_scr, xi_ref, sem)
        _copy(gr_scr, gor_ref, sem)
        _copy(gi_scr, goi_ref, sem)


def window_chain_fwd(x, mres, mims, n: int, wires_seq, interpret: bool = False):
    """One-launch forward over a qualifying scheduled sequence. x: (2, 2^n)
    f32 planes."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    w = next(s[1] for s in wires_seq if s[0] == 'win')
    W, R = 1 << w, 1 << (n - w)
    wre, wim = _step_stacks(mres, mims, wires_seq, w, backward=False)
    kinds, didx, deltas = _step_tables(wires_seq, n, backward=False)
    S = len(wires_seq)
    xv = x.reshape(2, W, R)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.ANY)
    wspec = pl.BlockSpec((1, W, W), lambda g: (g, 0, 0))
    yr, yi = pl.pallas_call(
        functools.partial(_fwd_kernel, n=n, w=w, deltas=deltas, nstep=S),
        grid=(S,),
        in_specs=[smem, smem, hbm, hbm, wspec, wspec],
        out_specs=(hbm, hbm),
        scratch_shapes=[pltpu.VMEM((W, R), jnp.float32)] * 2
        + [pltpu.SemaphoreType.DMA],
        out_shape=(jax.ShapeDtypeStruct((W, R), jnp.float32),) * 2,
        interpret=interpret,
    )(jnp.asarray(kinds), jnp.asarray(didx), xv[0], xv[1], wre, wim)
    return jnp.stack([yr, yi]).reshape(x.shape)


def window_chain_bwd(y, g, mres, mims, n: int, wires_seq,
                     interpret: bool = False):
    """One-launch backward: returns (x, g_in, dres, dims) with dres/dims
    aligned to the full step list (zeros at rot slots)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    w = next(s[1] for s in wires_seq if s[0] == 'win')
    W, R = 1 << w, 1 << (n - w)
    wre, wim = _step_stacks(mres, mims, wires_seq, w, backward=True)
    kinds, didx, deltas = _step_tables(wires_seq, n, backward=True)
    S = len(wires_seq)
    yv = y.reshape(2, W, R)
    gv = g.reshape(2, W, R)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.ANY)
    wspec = pl.BlockSpec((1, W, W), lambda gg: (gg, 0, 0))
    xr, xi, gor, goi, dwre, dwim = pl.pallas_call(
        functools.partial(_bwd_kernel, n=n, w=w, deltas=deltas, nstep=S),
        grid=(S,),
        in_specs=[smem, smem, hbm, hbm, hbm, hbm, wspec, wspec],
        out_specs=(hbm, hbm, hbm, hbm, wspec, wspec),
        scratch_shapes=[pltpu.VMEM((W, R), jnp.float32)] * 4
        + [pltpu.SemaphoreType.DMA],
        out_shape=((jax.ShapeDtypeStruct((W, R), jnp.float32),) * 4
                   + (jax.ShapeDtypeStruct((S, W, W), jnp.float32),) * 2),
        interpret=interpret,
    )(jnp.asarray(kinds), jnp.asarray(didx),
      yv[0], yv[1], gv[0], gv[1], wre, wim)
    # the per-step dW stacks are REVERSED (bwd walk order); step i of the
    # forward list sits at stack slot S-1-i
    dres, dims = [], []
    for i, (st, mre, mim) in enumerate(zip(wires_seq, mres, mims)):
        if st[0] == 'win':
            dres.append(dwre[S - 1 - i])
            dims.append(dwim[S - 1 - i])
        else:
            dres.append(jnp.zeros_like(mre))
            dims.append(jnp.zeros_like(mim))
    return (jnp.stack([xr, xi]).reshape(y.shape),
            jnp.stack([gor, goi]).reshape(g.shape),
            tuple(dres), tuple(dims))
