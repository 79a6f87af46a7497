"""Adjoint differentiation: O(1)-memory gradients for statevector circuits.

Counterpart of reference src/deepquantum/adjoint.py (AdjointExpectation,
arXiv:2009.02823): instead of storing per-gate activations, the backward pass
re-applies inverse gates to both the state and the observable-projected state
and reads each parameter's gradient off a small inner product.

TPU-native structure (this is NOT a translation of the reference's per-rank
Python loop): the circuit is compiled into a *uniform gate table* —

  - ``U``     (T, D, D) complex   per-step unitary, controls embedded
                                  block-diagonally and padded to K wires,
  - ``dU``    (T, P, D, D)        analytic/per-kind jacfwd derivative matrices
                                  (zero rows for non-parametric steps),
  - ``W``     (T, K) int32        wire ids per step (dummy wires pad),
  - ``pj``    (T, P) int32        destination slots in the gradient vector,

and both passes are a single ``jax.lax.scan`` over that table, so the
compiled program size is O(1) in circuit depth (the round-1 unrolled version
took >580 s to compile at 360 gates; this compiles in seconds). Gate
application inside the scan uses a gather formulation that supports *dynamic*
wire indices: for each of the D matrix columns, amplitudes are gathered at the
index obtained by overwriting the wire bits, multiplied by the matrix entry
selected by the row bits, and summed — 2^K reads + 1 write of the state per
step, all fused by XLA.

Table construction is grouped by gate kind and vmapped, so trace cost is
O(#distinct kinds), not O(depth). For a DistributedQubitCircuit the initial
state is pinned to the circuit's mesh sharding (init_psi below), so both
scan passes stay sharded and the per-parameter inner products lower to psum
(reference circuit.py:1706 + adjoint.py:19-83 do this with one explicit
all_reduce per parameter); verified on the 8-device mesh by
tests/test_distributed.py::test_distributed_adjoint_expectation_on_mesh.

Role: this path is the API-parity + O(1)-compile exhibit for
``expectation(adjoint=True)``. Its dynamic-wire gather formulation is ~2
orders slower per step than the planar Pallas chain VJP (results.json
``gradient_adjoint_ms`` vs ``gradient_ms``) — training workloads should use
the default AD paths (planar chain single-chip, shard_map chain multi-chip).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .config import cdtype, rdtype

__all__ = ['make_adjoint_expectation']


def _apply_table_gate(psi, u, wires, n, K):
    """Apply a (D, D) matrix on K dynamically-indexed wires of a flat state.

    ``psi``: (2^n,) complex. ``wires``: (K,) int32 wire ids (distinct).
    Matrix row/col ordering follows the wires list, wire 0 of the list being
    the most significant bit — identical to ops.apply.evolve_state semantics.
    """
    D = 1 << K
    shifts = (n - 1 - wires).astype(jnp.int32)                      # bit position per wire
    wire_bit = jnp.left_shift(jnp.int32(1), shifts)                 # (K,)
    idx = jnp.arange(1 << n, dtype=jnp.int32)
    base = idx & ~jnp.sum(wire_bit)                                 # wire bits cleared
    bits = jnp.right_shift(idx[:, None], shifts[None, :]) & 1       # (2^n, K)
    pows = jnp.left_shift(jnp.int32(1), jnp.arange(K - 1, -1, -1, dtype=jnp.int32))
    row = jnp.sum(bits * pows[None, :], axis=1)                     # (2^n,)
    out = jnp.zeros_like(psi)
    for col in range(D):                                            # static loop, D <= 8
        sel = [k for k in range(K) if (col >> (K - 1 - k)) & 1]
        offset = sum((wire_bit[k] for k in sel), jnp.int32(0))
        out = out + jnp.take(u[:, col], row) * jnp.take(psi, base + offset)
    return out


def _embed_controlled(mats, nc, fill_identity):
    """Block-embed (..., b, b) matrices into the all-ones control block of a
    2^nc-times larger matrix; identity (gates) or zero (derivatives) elsewhere.
    Matches reference operation.py:265-272 / distributed.py:41-44."""
    if nc == 0:
        return mats
    blk = mats.shape[-1]
    dim = (1 << nc) * blk
    shape = mats.shape[:-2] + (dim, dim)
    if fill_identity:
        base = jnp.broadcast_to(jnp.eye(dim, dtype=mats.dtype), shape)
    else:
        base = jnp.zeros(shape, mats.dtype)
    return base.at[..., dim - blk:, dim - blk:].set(mats)


def _pad_kron_identity(mats, pad):
    """kron(M, I_{2^pad}) on (..., d, d) stacks — appends dummy wires."""
    if pad == 0:
        return mats
    m = 1 << pad
    d = mats.shape[-1]
    eye = jnp.eye(m, dtype=mats.dtype)
    out = mats[..., :, None, :, None] * eye[None, :, None, :]
    return out.reshape(mats.shape[:-2] + (d * m, d * m))


def _pick_pad_wires(used, need, n):
    free = [w for w in range(n) if w not in used]
    return free[:need]


def _group_key(op):
    fn = op.matrix_fn
    return (id(fn) if fn is not None else ('static', id(op.static_matrix)),
            len(op.controls), len(op.all_wires), op.inv, op.npara)


def make_adjoint_expectation(cir, observable_idx: int = 0):
    """Build fn(params) -> expval with an adjoint-method custom VJP.

    ``cir``: a QubitCircuit (local or mesh-sharded). Parameters are the
    trainable vector; data encoding is not supported on this path (matching
    the reference's distributed expectation, circuit.py:1706).
    """
    n = cir.nqubit
    ops = [op for op in cir.operators if op.kind == 'gate']
    obs = cir.observables[observable_idx]
    T = len(ops)
    K = max((len(op.all_wires) for op in ops), default=1)
    assert K <= 3, f'adjoint scan supports gates on at most 3 wires, got {K}'
    D = 1 << K
    P = max((op.npara for op in ops), default=1) or 1

    train_idx = np.asarray(cir._train_idx, np.int64)
    pvals = np.asarray(cir._pvals, np.float64)
    nfull = len(pvals)

    # --- static tables (host side) ---
    W = np.zeros((T, K), np.int32)
    PJ = np.full((T, P), nfull, np.int32)        # nfull = dummy gradient slot
    for t, op in enumerate(ops):
        aw = list(op.all_wires)
        aw += _pick_pad_wires(set(aw), K - len(aw), n)
        W[t] = aw
        for j, pi in enumerate(op.pidx[:P] if op.npara else ()):
            PJ[t, j] = pi

    def full_params(params):
        full = jnp.asarray(pvals, rdtype())
        return full.at[jnp.asarray(train_idx, jnp.int32)].set(params)

    def build_tables(full, want_derivs):
        """(T, D, D) unitary table and, optionally, (T, P, D, D) derivative
        table. Grouped by gate kind and vmapped: trace cost O(#kinds)."""
        U = jnp.zeros((T, D, D), cdtype())
        dU = jnp.zeros((T, P, D, D), cdtype()) if want_derivs else None
        groups: dict = {}
        for t, op in enumerate(ops):
            groups.setdefault(_group_key(op), []).append(t)
        for key, ts in groups.items():
            op0 = ops[ts[0]]
            nc = len(op0.controls)
            pad = K - len(op0.all_wires)
            if op0.npara and op0.matrix_fn is not None:
                pidx = jnp.asarray(np.asarray([ops[t].pidx for t in ts], np.int32))
                p = full[pidx]                                        # (B, npara)
                mats = jax.vmap(op0.matrix_fn)(p).astype(cdtype())    # (B, b, b)
                if op0.inv:
                    mats = jnp.conj(jnp.swapaxes(mats, -1, -2))
                u = _pad_kron_identity(_embed_controlled(mats, nc, True), pad)
                U = U.at[jnp.asarray(ts)].set(u)
                if want_derivs:
                    dm = jax.vmap(jax.jacfwd(
                        lambda q: op0.matrix_fn(q).astype(cdtype())))(p)  # (B, b, b, npara)
                    dm = jnp.moveaxis(dm, -1, 1)                          # (B, npara, b, b)
                    if op0.inv:
                        # applied matrix is fn(p)^H, so d/dp is (d fn/dp)^H
                        dm = jnp.conj(jnp.swapaxes(dm, -1, -2))
                    d = _pad_kron_identity(_embed_controlled(dm, nc, False), pad)
                    if op0.npara < P:
                        d = jnp.pad(d, ((0, 0), (0, P - op0.npara), (0, 0), (0, 0)))
                    dU = dU.at[jnp.asarray(ts)].set(d)
            else:
                mat = np.asarray(op0.matrix(None) if op0.matrix_fn is None
                                 else op0.matrix_fn(None), dtype=cdtype())
                if op0.inv:
                    mat = mat.conj().T
                u1 = _pad_kron_identity(_embed_controlled(jnp.asarray(mat), nc, True), pad)
                U = U.at[jnp.asarray(ts)].set(jnp.broadcast_to(u1, (len(ts), D, D)))
        return U, dU

    Wj = jnp.asarray(W)
    PJj = jnp.asarray(PJ)

    # mesh-sharded circuits (DistributedQubitCircuit) carry their sharding in
    # sim.sharding; constraining the initial state pins the whole scan chain
    # (both passes) to the mesh so inner products lower to psum
    sharding = getattr(getattr(cir, 'sim', None), 'sharding', None)

    def init_psi():
        init = np.asarray(cir.init_state.state).reshape(-1)
        psi = jnp.asarray(init, cdtype())
        if sharding is not None:
            psi = jax.lax.with_sharding_constraint(psi, sharding)
        return psi

    def run_forward(U):
        def step(psi, xs):
            u, w = xs
            return _apply_table_gate(psi, u, w, n, K), None
        return jax.lax.scan(step, init_psi(), (U, Wj))[0]

    def apply_obs(x):
        return obs.apply(x.reshape([2] * n), den_mat=False).reshape(-1)

    @jax.custom_vjp
    def expectation(params):
        U, _ = build_tables(full_params(params), want_derivs=False)
        psi = run_forward(U)
        return jnp.real(jnp.vdot(psi, apply_obs(psi)))

    def fwd(params):
        U, _ = build_tables(full_params(params), want_derivs=False)
        psi = run_forward(U)
        lam = apply_obs(psi)
        return jnp.real(jnp.vdot(psi, lam)), (params, psi, lam)

    def bwd(res, g):
        params, psi, lam = res
        U, dU = build_tables(full_params(params), want_derivs=True)
        grad0 = jnp.zeros(nfull + 1, rdtype())    # last slot = dummy sink

        def step(carry, xs):
            psi, lam, grad = carry
            u, du, w, pj = xs
            uh = jnp.conj(u).T
            psi = _apply_table_gate(psi, uh, w, n, K)
            for j in range(P):                    # static small loop
                mu = _apply_table_gate(psi, du[j], w, n, K)
                gj = 2.0 * jnp.real(jnp.vdot(lam, mu))
                grad = grad.at[pj[j]].add(gj.astype(rdtype()))
            lam = _apply_table_gate(lam, uh, w, n, K)
            return (psi, lam, grad), None

        (_, _, grad_full), _ = jax.lax.scan(
            step, (psi, lam, grad0), (U, dU, Wj, PJj), reverse=True)
        return (g * grad_full[jnp.asarray(train_idx, jnp.int32)],)

    expectation.defvjp(fwd, bwd)
    return expectation
