"""State-evolution kernels: apply a k-qudit matrix to an n-qudit state tensor.

TPU-native counterpart of the reference's evolve_state / evolve_den_mat /
op_state_control (reference: src/deepquantum/qmath.py:485-541,
operation.py:191-263).

Instead of the reference's full n-axis permute (which emits one O(n)-rank
transpose per gate and blows up program size at 20+ qubits), a gate on k
wires reshapes the flat state into the 2k+1 segments around the target axes
and contracts with a single einsum — constant-size IR per gate, and XLA maps
the contraction onto the MXU/VPU and fuses neighbouring gates. Controlled
gates are embedded as block-diagonal unitaries on (controls + wires)
(reference operation.py:265-272 uses the same embedding for the distributed
path). All functions operate on a single (unbatched) state tensor of shape
(d,)*n — batching is ``jax.vmap`` at the circuit level.
"""

from __future__ import annotations

import string

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    'evolve_state', 'evolve_state_controlled', 'evolve_den_mat', 'evolve_den_mat_controlled',
    'controlled_matrix', 'permute_matrix_wires',
]

_LETTERS = string.ascii_lowercase + string.ascii_uppercase


def permute_matrix_wires(matrix, order, qudit: int = 2):
    """Reorder the qudit axes of a (d^k, d^k) matrix.

    ``order[j]`` gives, for the j-th output qudit, its position in the
    matrix's original qudit ordering.
    """
    k = len(order)
    if list(order) == list(range(k)):
        return matrix
    t = matrix.reshape((qudit,) * (2 * k))
    axes = list(order) + [p + k for p in order]
    t = jnp.transpose(t, axes)
    return t.reshape(qudit ** k, qudit ** k)


def _apply_sorted(state, matrix, nqudit, wires_sorted, qudit):
    """Apply a (d^k, d^k) matrix to strictly-increasing wires of a (d,)*n tensor."""
    k = len(wires_sorted)
    d = qudit
    shape = []
    prev = -1
    for w in wires_sorted:
        shape.append(d ** (w - prev - 1))
        shape.append(d)
        prev = w
    shape.append(d ** (nqudit - 1 - prev))
    x = state.reshape(shape)
    m = matrix.reshape((d,) * (2 * k))
    # einsum: m[o1..ok, i1..ik] * x[g0, i1, g1, i2, ..., gk] -> x[g0, o1, ...]
    outs = _LETTERS[:k]
    ins = _LETTERS[k:2 * k]
    gaps = _LETTERS[2 * k:3 * k + 1]
    x_sub = gaps[0] + ''.join(i + g for i, g in zip(ins, gaps[1:]))
    y_sub = gaps[0] + ''.join(o + g for o, g in zip(outs, gaps[1:]))
    # HIGHEST: quantum amplitudes need true f32 accumulation — the MXU's
    # default bf16 passes drift unitarity by ~1e-2 over tens of gates.
    y = jnp.einsum(f'{outs}{ins},{x_sub}->{y_sub}', m, x,
                   precision=jax.lax.Precision.HIGHEST)
    return y.reshape([d] * nqudit)


#: minimum size of the state tensor's trailing axis. TPU tiles the last two
#: dims of every temp to (8, 128); a gate whose last wire sits near the end of
#: the qudit order leaves a trailing gap of 1-4, which the tiler pads up to
#: 64x — measured 4 GB/s vs 141 GB/s for the expanded form at n=24 on a v5e.
_TAIL_MIN = 128


def _expand_tail(matrix, wires, nqudit, qudit):
    """Fold tail-touching wires into an expanded matrix over the last ``c``
    qudits so the einsum keeps a >= _TAIL_MIN trailing axis.

    Returns (matrix', head_wires, c): matrix' acts on head_wires + the whole
    d^c tail block. The extra MACs ride the MXU and stay below the
    bytes:flops roofline, so the pass remains bandwidth-bound — the point is
    to never materialize a tiny-minor-dim temp.
    """
    d = qudit
    c = 1
    while d ** c < _TAIL_MIN:
        c += 1
    first_tail = nqudit - c
    head = sorted(w for w in wires if w < first_tail)
    tail = sorted(w for w in wires if w >= first_tail)
    kt = len(tail)
    # permute the gate so its axes run [head..., tail...] in wire order
    m = permute_matrix_wires(matrix, [wires.index(w) for w in head + tail], d)
    # expand over the full tail: axes become [head..., tail_gate..., tail_rest...]
    rest = c - kt
    if rest:
        m = jnp.kron(m, jnp.eye(d ** rest, dtype=m.dtype))
    # reorder the c tail axes into physical order
    kh = len(head)
    tail_pos = [w - first_tail for w in tail]
    rest_pos = [p for p in range(c) if p not in tail_pos]
    cur = list(range(kh)) + [kh + tail_pos.index(p) if p in tail_pos
                             else kh + kt + rest_pos.index(p) for p in range(c)]
    m = permute_matrix_wires(m, cur, d)
    return m, head, c


def _apply_tail_expanded(state, matrix, nqudit, wires, qudit):
    """Tail-touching gate: contract head axes + the whole d^c tail in one
    einsum, keeping the trailing axis >= _TAIL_MIN."""
    d = qudit
    m, head, c = _expand_tail(matrix, wires, nqudit, qudit)
    kh = len(head)
    T = d ** c
    shape = []
    prev = -1
    for w in head:
        shape.append(d ** (w - prev - 1))
        shape.append(d)
        prev = w
    shape.append(d ** (nqudit - c - 1 - prev))
    shape.append(T)
    x = state.reshape(shape)
    mt = m.reshape((d,) * kh + (T,) + (d,) * kh + (T,))
    outs = _LETTERS[:kh]
    ins = _LETTERS[kh:2 * kh]
    gaps = _LETTERS[2 * kh:3 * kh + 1]
    x_sub = gaps[0] + ''.join(i + g for i, g in zip(ins, gaps[1:])) + 'T'
    y_sub = gaps[0] + ''.join(o + g for o, g in zip(outs, gaps[1:])) + 'S'
    y = jnp.einsum(f'{outs}S{ins}T,{x_sub}->{y_sub}', mt, x,
                   precision=jax.lax.Precision.HIGHEST)
    return y.reshape([d] * nqudit)


def evolve_state(state: jnp.ndarray, matrix: jnp.ndarray, nqudit: int, wires, qudit: int = 2) -> jnp.ndarray:
    """Apply ``matrix`` (d^k x d^k) to ``wires`` of a (d,)*n state tensor.

    Semantics match reference qmath.py:485 (wire 0 = leftmost tensor axis;
    matrix row/col ordering follows the ``wires`` list order). Gates whose
    trailing gap is smaller than _TAIL_MIN are applied through the
    tail-expanded path (see _expand_tail) to keep TPU tile padding away.
    """
    wires = list(wires)
    d = qudit
    c = 1
    while d ** c < _TAIL_MIN:
        c += 1
    kh = sum(1 for w in wires if w < nqudit - c)
    if wires and d ** (nqudit - 1 - max(wires)) < _TAIL_MIN \
            and nqudit > c + kh and d ** (kh + c) <= 2048:
        return _apply_tail_expanded(state, matrix, nqudit, wires, qudit)
    order = sorted(range(len(wires)), key=lambda i: wires[i])
    if order != list(range(len(wires))):
        # move the axis permutation into the small matrix, not the big state
        matrix = permute_matrix_wires(matrix, order, qudit)
        wires = sorted(wires)
    return _apply_sorted(state, matrix, nqudit, wires, qudit)


def controlled_matrix(matrix, n_controls: int, qudit: int = 2):
    """Block-diagonal embedding: identity except the all-ones control block.

    Matches reference operation.py:265-272. Result acts on
    (controls..., wires...) in that qubit order.
    """
    if n_controls == 0:
        return matrix
    blk = matrix.shape[-1]
    dim = qudit ** n_controls * blk
    u = jnp.eye(dim, dtype=matrix.dtype)
    return u.at[dim - blk:, dim - blk:].set(matrix)


def evolve_state_controlled(
    state: jnp.ndarray, matrix: jnp.ndarray, nqudit: int, wires, controls, qudit: int = 2
) -> jnp.ndarray:
    """Apply ``matrix`` to ``wires`` on the slice where all ``controls`` are 1."""
    controls = list(controls)
    if not controls:
        return evolve_state(state, matrix, nqudit, list(wires), qudit)
    u = controlled_matrix(matrix, len(controls), qudit)
    return evolve_state(state, u, nqudit, controls + list(wires), qudit)


def evolve_den_mat(state: jnp.ndarray, matrix: jnp.ndarray, nqudit: int, wires, qudit: int = 2) -> jnp.ndarray:
    """rho -> U rho U^dagger on a (d,)*2n density-matrix tensor (reference qmath.py:509)."""
    wires = list(wires)
    state = evolve_state(state, matrix, 2 * nqudit, wires, qudit)
    wires2 = [w + nqudit for w in wires]
    return evolve_state(state, matrix.conj(), 2 * nqudit, wires2, qudit)


def evolve_den_mat_controlled(
    state: jnp.ndarray, matrix: jnp.ndarray, nqudit: int, wires, controls, qudit: int = 2
) -> jnp.ndarray:
    """Controlled gate on a density matrix (reference operation.py:229-263)."""
    controls = list(controls)
    if not controls:
        return evolve_den_mat(state, matrix, nqudit, wires, qudit)
    u = controlled_matrix(matrix, len(controls), qudit)
    return evolve_den_mat(state, u, nqudit, controls + list(wires), qudit)
