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


def evolve_state(state: jnp.ndarray, matrix: jnp.ndarray, nqudit: int, wires, qudit: int = 2) -> jnp.ndarray:
    """Apply ``matrix`` (d^k x d^k) to ``wires`` of a (d,)*n state tensor.

    Semantics match reference qmath.py:485 (wire 0 = leftmost tensor axis;
    matrix row/col ordering follows the ``wires`` list order).
    """
    wires = list(wires)
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
