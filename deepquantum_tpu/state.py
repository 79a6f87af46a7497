"""Qubit state containers.

Functional counterpart of reference src/deepquantum/state.py:14-80. States are
plain jnp arrays wrapped in a light container (a pytree), not nn.Modules:
dtype/device placement is handled by the global config and jax.device_put.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

import numpy as np

from .config import cdtype

__all__ = ['QubitState']


def _amplitude_encoding_np(data, nqubit: int) -> np.ndarray:
    """Host-side amplitude encoding (semantics of reference qmath.py:439)."""
    data = np.asarray(data)
    is_single = data.ndim == 1 or (data.ndim == 2 and data.shape[-1] == 1)
    batch = 1 if is_single else data.shape[0]
    data = data.reshape(batch, -1).astype(cdtype())
    size = data.shape[1]
    n = 2 ** nqubit
    data = data[:, :n]
    norm = np.linalg.norm(data, axis=-1, keepdims=True)
    data = data / np.where(norm == 0, 1, norm)
    state = np.zeros((batch, n), dtype=cdtype())
    state[:, :min(size, n)] = data
    state = state[..., None]
    if is_single:
        state = state[0]
    return state


class QubitState:
    """A pure state (2^n, 1) or density matrix (2^n, 2^n), optionally batched.

    init options match reference state.py:14: 'zeros', 'equal',
    'entangle'/'GHZ'/'ghz', or an explicit array (amplitude-encoded if needed).
    The array is kept on host (numpy): it crosses into jitted programs as an
    argument, never as a device-resident closure constant (complex
    device->host reads are unsupported over the axon TPU tunnel).
    """

    def __init__(self, nqubit: int = 1, state: Any = 'zeros', den_mat: bool = False) -> None:
        self.nqubit = nqubit
        self.den_mat = den_mat
        # remember symbolic init kinds so traced programs can rebuild the
        # state on-device instead of inlining a 2^n dense constant (a 'zeros'
        # state at n=22 is a 33 MB MLIR constant otherwise)
        self.kind = state if isinstance(state, str) else None
        dim = 2 ** nqubit
        if isinstance(state, str):
            s = np.zeros((dim, 1), dtype=cdtype())
            if state == 'zeros':
                s[0, 0] = 1
            elif state == 'equal':
                s[:] = dim ** -0.5
            elif state in ('entangle', 'GHZ', 'ghz'):
                s[0, 0] = 2 ** -0.5
                s[-1, 0] = 2 ** -0.5
            else:
                raise ValueError(f'Unknown init state: {state}')
            if den_mat:
                s = s @ s.conj().T
            self.state = s
        else:
            if isinstance(state, jnp.ndarray) and not isinstance(state, np.ndarray):
                self.state = state.astype(cdtype())  # already a device array: keep as-is
                return
            s = np.asarray(state)
            if den_mat and s.ndim >= 2 and s.shape[-1] == dim and s.shape[-2] == dim:
                self.state = s.astype(cdtype())
            else:
                ndim = s.ndim
                s = _amplitude_encoding_np(s, nqubit)
                if s.ndim > ndim:
                    s = s[0] if s.shape[0] == 1 and ndim <= 2 else s
                if den_mat:
                    s = s @ np.conj(np.swapaxes(s, -1, -2))
                self.state = s

    def to(self, dtype) -> 'QubitState':
        self.state = self.state.astype(dtype)
        return self

    @property
    def shape(self):
        return self.state.shape


jax.tree_util.register_pytree_node(
    QubitState,
    lambda qs: ((qs.state,), (qs.nqubit, qs.den_mat)),
    lambda aux, children: _unflatten_qubitstate(aux, children),
)


def _unflatten_qubitstate(aux, children):
    qs = object.__new__(QubitState)
    qs.nqubit, qs.den_mat = aux
    qs.state = children[0]
    return qs
