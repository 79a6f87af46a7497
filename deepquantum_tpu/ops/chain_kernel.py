"""VMEM-resident fused window-chain kernel — the small-n latency engine.

At n <= 19 the whole planar state is 2 x 2^n x 4 B <= 4 MB — a fraction of a
TPU core's ~16 MB VMEM — yet the per-gate kernel architecture still pays one
HBM read+write per pass. Measured consequence at the n18_l5 headline
(window_ablation_ms, r5): collapsing 224 per-gate passes into 86 window/rot
passes moved the grad step NOT AT ALL (5.21 -> 5.36 ms) — per-pass HBM
round trips, not pass count, were the bound.

This module executes an ENTIRE scheduled window sequence (the ('win', w) /
('rot', d) stream produced by ops/window_gate.py::schedule_window_seq) as
ONE Pallas launch with the state held in VMEM/vregs throughout:

- ('win', w): four (2^w, 2^w) @ (2^w, 2^(n-w)) MXU matmuls (split-plane
  complex algebra, f32 HIGHEST precision), reading the stacked window
  planes from VMEM.
- ('rot', d): the cyclic wire-relabel transpose as an in-VMEM reshape +
  swapaxes — no HBM round trip, where the per-pass engine paid a full
  2 x 2^n sweep per relabel (53 of the 86 headline passes were rots).

HBM traffic for a whole forward: one state read, one state write, one read
of the stacked windows — versus 86 full sweeps. The backward mirrors it:
one launch walks the sequence in reverse carrying (y, g) in VMEM, emitting
the per-window cotangents dW = g x^H and the propagated state cotangent
(same adjoint recurrence as planar_chain's _chain_bwd).

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

__all__ = ['chain_fused_ok', 'window_chain_fwd', 'window_chain_bwd']

# planes cap: fwd carries 1 state buffer (aliased) + the window stack;
# bwd carries y and g. n=19 planes are 4 MB; n=20 would put bwd at ~20 MB.
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


def _dot(a, b):
    return jax.lax.dot_general(a, b, dimension_numbers=(((1,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


def _rot_val(v, d: int, n: int, w: int):
    """In-VMEM wire relabel: (2, 2^w, 2^(n-w)) viewed (2, 2^d, 2^(n-d)),
    last two dims swapped, back to the window view."""
    x = v.reshape(2, 1 << d, 1 << (n - d))
    x = jnp.swapaxes(x, 1, 2)
    return x.reshape(2, 1 << w, 1 << (n - w))


def _win_val(v, wre, wim):
    yr = _dot(wre, v[0]) - _dot(wim, v[1])
    yi = _dot(wre, v[1]) + _dot(wim, v[0])
    return jnp.stack([yr, yi])


def _fwd_kernel(x_ref, wre_ref, wim_ref, y_ref, *, n: int, w: int, seq):
    v = x_ref[...]                                   # (2, 2^w, 2^(n-w))
    k = 0
    for st in seq:
        if st[0] == 'rot':
            v = _rot_val(v, st[1], n, w)
        else:
            v = _win_val(v, wre_ref[k], wim_ref[k])
            k += 1
    y_ref[...] = v


def _bwd_kernel(y_ref, g_ref, wre_ref, wim_ref,
                x_ref, go_ref, dwre_ref, dwim_ref, *, n: int, w: int, seq):
    """Reverse walk carrying (y, g) in VMEM: x = W^H y, dW = g x^H,
    g = W^H g (the planar_chain adjoint recurrence, planar_gate.py:1069)."""
    y = y_ref[...]
    g = g_ref[...]
    k = sum(1 for st in seq if st[0] == 'win')
    for st in reversed(seq):
        if st[0] == 'rot':
            y = _rot_val(y, (-st[1]) % n, n, w)
            g = _rot_val(g, (-st[1]) % n, n, w)
            continue
        k -= 1
        wre_t = wre_ref[k].T
        wim_t = -wim_ref[k].T
        y = _win_val(y, wre_t, wim_t)                # x = W^H y
        # dW = g x^H in split planes (window_gate.py::window_grad algebra)
        ct = functools.partial(jax.lax.dot_general,
                               dimension_numbers=(((1,), (1,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)
        dwre_ref[k] = ct(g[0], y[0]) + ct(g[1], y[1])
        dwim_ref[k] = ct(g[1], y[0]) - ct(g[0], y[1])
        g = _win_val(g, wre_t, wim_t)
    x_ref[...] = y
    go_ref[...] = g


def _stack_windows(mres, mims, wires_seq):
    wre = jnp.stack([m for m, s in zip(mres, wires_seq) if s[0] == 'win'])
    wim = jnp.stack([m for m, s in zip(mims, wires_seq) if s[0] == 'win'])
    return wre, wim


def window_chain_fwd(x, mres, mims, n: int, wires_seq, interpret: bool = False):
    """One-launch forward over a qualifying scheduled sequence. x: (2, 2^n)
    f32 planes (aliased in place)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    w = next(s[1] for s in wires_seq if s[0] == 'win')
    wre, wim = _stack_windows(mres, mims, wires_seq)
    xv = x.reshape(2, 1 << w, 1 << (n - w))
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, n=n, w=w, seq=tuple(wires_seq)),
        out_shape=jax.ShapeDtypeStruct(xv.shape, jnp.float32),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        input_output_aliases={0: 0},
        interpret=interpret,
    )(xv, wre, wim)
    return y.reshape(x.shape)


def window_chain_bwd(y, g, mres, mims, n: int, wires_seq,
                     interpret: bool = False):
    """One-launch backward: returns (x, g_in, dres, dims) with dres/dims
    aligned to the full step list (zeros at rot slots)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    w = next(s[1] for s in wires_seq if s[0] == 'win')
    wre, wim = _stack_windows(mres, mims, wires_seq)
    nw = wre.shape[0]
    W = 1 << w
    R = 1 << (n - w)
    yv = y.reshape(2, W, R)
    gv = g.reshape(2, W, R)
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    x, g_in, dwre, dwim = pl.pallas_call(
        functools.partial(_bwd_kernel, n=n, w=w, seq=tuple(wires_seq)),
        out_shape=(jax.ShapeDtypeStruct((2, W, R), jnp.float32),
                   jax.ShapeDtypeStruct((2, W, R), jnp.float32),
                   jax.ShapeDtypeStruct((nw, W, W), jnp.float32),
                   jax.ShapeDtypeStruct((nw, W, W), jnp.float32)),
        in_specs=[spec] * 4,
        out_specs=(spec,) * 4,
        input_output_aliases={0: 0, 1: 1},
        interpret=interpret,
    )(yv, gv, wre, wim)
    dres, dims = [], []
    k = 0
    for st, mre, mim in zip(wires_seq, mres, mims):
        if st[0] == 'win':
            dres.append(dwre[k])
            dims.append(dwim[k])
            k += 1
        else:
            dres.append(jnp.zeros_like(mre))
            dims.append(jnp.zeros_like(mim))
    return (x.reshape(y.shape), g_in.reshape(g.shape),
            tuple(dres), tuple(dims))
