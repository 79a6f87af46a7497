"""MXU window engine: dense multi-qubit unitaries as one-matmul-sweep passes.

The planar Pallas kernel (ops/planar_gate.py) already runs every <= 3-wire
gate pass at the HBM roofline, so the remaining single-chip lever is FEWER
PASSES, not faster ones. This module fuses whole RUNS of gates into one
dense 2^w x 2^w unitary ("window") on the TOP w qubit positions and applies
it as a single in-place matmul sweep:

    state (2, 2^n) viewed as (2, 2^w, 2^(n-w))  ->  W @ columns   (MXU)

Arithmetic intensity of the window apply is 2^w/2 f32 FLOPs per HBM byte;
at w = 7 (128 x 128) that sits at the v5e ridge point, i.e. an arbitrarily
long run of fused gates rides ONE memory sweep with the MXU hidden under
it. Gate runs whose wires drift out of the top-w positions are brought back
with the cyclic relabel transposes of ops/planar_gate.py (schedule_rotations
machinery; legal deltas keep both transpose runs >= 128 elements). Gates no
legal rotation can window (cyclic wire span > w) fall back to the per-gate
planar kernel inside the same chain.

Differentiation: the window planes are built at trace time as a product of
kron-embedded gate planes (all jnp ops), so the chain-level custom VJP of
planar_chain only needs the window-level cotangent —

    x  = W^H y                     (one aliased matmul sweep)
    dW = g x^H   (plane algebra)   (two (2^w, R) @ (R, 2^w) MXU matmuls)
    g  = W^H g                     (one aliased matmul sweep)

— and JAX autodiff carries dW back through the embedding product to the
per-gate parameters.

Reference semantics matched: qmath.py:485 evolve_state wire order (wire 0 =
most significant); the reference has no analog of this engine (its gate
fusion stops at torch einsums, circuit.py:232).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['window_apply', 'schedule_window_seq', 'plan_windows']

_MIN_COLS = 7          # keep the matmul column run >= 128 lanes: w <= n - 7


def _use_window() -> bool:
    return os.environ.get('DQ_WINDOW', '1') != '0'


def window_width(n: int) -> int:
    """Window width: 128-row matmuls when the column run allows (w = 7),
    overridable for ablations with DQ_WINDOW_W."""
    w = int(os.environ.get('DQ_WINDOW_W', '7'))
    return max(1, min(w, n - _MIN_COLS))


# ------------------------------------------------------------------- kernel
def _window_kernel(x_ref, mre_ref, mim_ref, y_ref):
    """One column tile: y = W x in split-plane algebra, all four products on
    the MXU (f32 inputs, HIGHEST precision — bf16-pass decomposition keeps
    ~24 mantissa bits, matching the VPU kernel's unitary-chain drift)."""
    dot = functools.partial(jax.lax.dot_general,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
    xr = x_ref[0]
    xi = x_ref[1]
    mr = mre_ref[...]
    mi = mim_ref[...]
    y_ref[0, :, :] = dot(mr, xr) - dot(mi, xi)
    y_ref[1, :, :] = dot(mr, xi) + dot(mi, xr)


def window_apply(x, mre, mim, n: int, w: int, interpret: bool = False):
    """Apply the dense unitary (planes mre/mim, (2^w, 2^w) f32) to the TOP w
    wires of the planar state x = (2, 2^n) f32, in place (aliased).

    NOT wrapped in an inner jit (same donation rule as _planar_apply:
    an inner jit boundary re-introduces a 2^n copy per pass)."""
    from jax.experimental import pallas as pl

    W = 1 << w
    R = 1 << (n - w)
    C = min(R, 512)
    xv = x.reshape(2, W, R)
    spec = pl.BlockSpec((2, W, C), lambda c: (0, 0, c))
    mspec = pl.BlockSpec((W, W), lambda c: (0, 0))
    y = pl.pallas_call(
        _window_kernel,
        grid=(R // C,),
        out_shape=jax.ShapeDtypeStruct((2, W, R), jnp.float32),
        in_specs=[spec, mspec, mspec],
        out_specs=spec,
        input_output_aliases={0: 0},
        interpret=interpret,
    )(xv, mre, mim)
    return y.reshape(x.shape)


def window_grad(g, x, n: int, w: int):
    """Window-plane cotangents (dmre, dmim) from output cotangent g and
    recomputed input x: dmre = gr xr^T + gi xi^T, dmim = gi xr^T - gr xi^T
    (same plane algebra as ops/planar_gate.py::_bwd). Two MXU matmuls, pure
    reads — no pallas needed."""
    W = 1 << w
    gv = g.reshape(2, W, -1)
    xv = x.reshape(2, W, -1)
    dot = functools.partial(jax.lax.dot_general,
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
    dmre = dot(gv[0], xv[0]) + dot(gv[1], xv[1])
    dmim = dot(gv[1], xv[0]) - dot(gv[0], xv[1])
    return dmre, dmim


# ---------------------------------------------------------------- embedding
@functools.lru_cache(maxsize=None)
def _embed_src(pos, w: int):
    """Index map embedding a k-wire gate at window positions `pos` (order =
    the gate matrix's qubit order, values in [0, w)): window basis index ->
    kron(gate, I_rest) basis index."""
    k = len(pos)
    rest = [p for p in range(w) if p not in pos]
    W = 1 << w

    def bits_at(i, positions):
        out = 0
        for p in positions:
            out = (out << 1) | ((i >> (w - 1 - p)) & 1)
        return out

    return np.array([(bits_at(i, pos) << (w - k)) | bits_at(i, rest)
                     for i in range(W)])


def _embed_window(mre, mim, pos, w: int):
    """kron-embed (2^k, 2^k) gate planes into (2^w, 2^w) window planes at
    positions `pos` (differentiable: gather of a kron)."""
    src = _embed_src(tuple(pos), w)
    eye = jnp.eye(1 << (w - len(pos)), dtype=jnp.float32)
    big_re = jnp.kron(mre.astype(jnp.float32), eye)
    big_im = jnp.kron(mim.astype(jnp.float32), eye)
    return big_re[src][:, src], big_im[src][:, src]


def _window_product(members, mres, mims, wseq, rot, n: int, w: int):
    """Accumulate member gates (program order) into one (2^w, 2^w) unitary:
    U = E_m ... E_1 with E_i the embedded planes of gate i at its physical
    positions under labeling `rot`."""
    ur = jnp.eye(1 << w, dtype=jnp.float32)
    ui = jnp.zeros((1 << w, 1 << w), jnp.float32)
    hi = jax.lax.Precision.HIGHEST
    for idx in members:
        pos = tuple((x - rot) % n for x in wseq[idx])
        er, ei = _embed_window(mres[idx], mims[idx], pos, w)
        ur, ui = (jnp.matmul(er, ur, precision=hi)
                  - jnp.matmul(ei, ui, precision=hi),
                  jnp.matmul(er, ui, precision=hi)
                  + jnp.matmul(ei, ur, precision=hi))
    return ur, ui


# ---------------------------------------------------------------- scheduler
def plan_windows(wseq, n: int, w: int):
    """Greedy in-order window plan over a gate stream.

    wseq: tuple of sorted logical wire tuples. Returns (plan, n_windowed):
    plan entries are ('rot', delta), ('win', members, rot) with members a
    tuple of gate indices applied under labeling `rot`, or ('gate', idx,
    rot) for gates no legal rotation can bring into the top-w positions.
    The plan closes back to the identity labeling."""
    from .planar_gate import _rot_path

    rot = 0
    plan = []
    open_members = []
    open_rot = 0
    n_windowed = 0

    def fits(ws, r):
        return all((x - r) % n < w for x in ws)

    def flush():
        nonlocal open_members
        if open_members:
            plan.append(('win', tuple(open_members), open_rot))
        open_members = []

    def lookahead(r, start):
        c = 0
        for ws in wseq[start:start + 48]:
            if not fits(ws, r):
                break
            c += 1
        return c

    for idx, ws in enumerate(wseq):
        if fits(ws, rot):
            if not open_members:
                open_rot = rot
            open_members.append(idx)
            n_windowed += 1
            continue
        # candidate relabelings put one of the gate's wires at position 0
        # (circuits sweep upward, so the rest of the window catches the
        # following gates); scored by how many subsequent gates fit
        best = None
        for base in {x % n for x in ws}:
            if not fits(ws, base):
                continue
            path = _rot_path(rot, base, n)
            if path is None:
                continue
            if _rot_path(base, 0, n) is None:
                # unclosable labeling (sparse legal deltas at small odd n)
                # would trip the closing assert — never move there
                continue
            score = lookahead(base, idx) - 0.5 * len(path)
            if best is None or score > best[0]:
                best = (score, base, path)
        flush()
        if best is None:
            # cyclic wire span exceeds the window (e.g. cnot(0, n/2)) or no
            # reachable labeling — per-gate planar kernel at current labeling
            plan.append(('gate', idx, rot))
            continue
        _, base, path = best
        for d in path:
            plan.append(('rot', d))
        rot = base
        open_rot = rot
        open_members.append(idx)
        n_windowed += 1
    flush()
    closing = _rot_path(rot, 0, n)
    assert closing is not None, f'no legal closing rotation from {rot} (n={n})'
    for d in closing:
        plan.append(('rot', d))
    return plan, n_windowed


def schedule_window_seq(mres, mims, wseq, n: int):
    """Compile an already-sorted planar chain spec (planes in sorted-logical-
    wire order + sorted wire tuples, as schedule_planar_seq receives) into a
    window plan: (mres', mims', wseq') whose wseq' entries are ('rot', delta)
    relabels, ('win', w) dense windows, or plain sorted physical wire tuples
    for fallback gates. Returns None when the window engine should not
    engage (too few qubits for legal rotations, batched planes, or nothing
    gained)."""
    w = window_width(n)
    if n < 14 or w < 4 or not mres or any(m.ndim != 2 for m in mres):
        return None
    plan, n_windowed = plan_windows(tuple(wseq), n, w)
    if n_windowed == 0:
        return None
    from .apply import permute_matrix_wires

    out_r, out_i, out_w = [], [], []
    dummy = jnp.zeros((1, 1), jnp.float32)
    for ent in plan:
        if ent[0] == 'rot':
            out_r.append(dummy)
            out_i.append(dummy)
            out_w.append(('rot', ent[1]))
        elif ent[0] == 'win':
            _, members, rot = ent
            ur, ui = _window_product(members, mres, mims, wseq, rot, n, w)
            out_r.append(ur)
            out_i.append(ui)
            out_w.append(('win', w))
        else:
            _, idx, rot = ent
            pw = [(x - rot) % n for x in wseq[idx]]
            order = sorted(range(len(pw)), key=lambda j: pw[j])
            mre, mim = mres[idx], mims[idx]
            if order != list(range(len(pw))):
                mre = permute_matrix_wires(mre, order)
                mim = permute_matrix_wires(mim, order)
            out_r.append(mre)
            out_i.append(mim)
            out_w.append(tuple(sorted(pw)))
    return tuple(out_r), tuple(out_i), tuple(out_w)
