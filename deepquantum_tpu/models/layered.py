"""Scan-compiled layered ansatze for deep/wide circuits.

Unrolled IRs grow linearly with depth and can exhaust AOT compiler memory at
25+ qubits; identical layers should compile ONCE and run under ``lax.scan``.
This builder returns pure functions for the standard hardware-efficient
ansatz (the reference's gradient-benchmark circuit,
examples/benchmarks/benchmark_v420/gradient/gradient_deepquantum.py:24).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import cdtype, rdtype
from ..ops import gates as G
from ..ops.apply import evolve_state

__all__ = ['make_layered_vqe']


def make_layered_vqe(nqubit: int, nlayer: int, basis: str = 'x'):
    """Rx-Rz-Rx + CNOT-ring layers, scanned over depth.

    Returns (expectation_fn, init_params) with params shape (nlayer, nqubit, 3).
    The per-layer body compiles once; program size is O(nqubit), not
    O(nqubit * nlayer).
    """
    cnot = G.cnot_matrix()  # numpy: inline constant, no device round-trip
    pauli = {'x': G.paulix_matrix, 'y': G.pauliy_matrix, 'z': G.pauliz_matrix}[basis]

    @jax.checkpoint
    def layer(state, theta):
        # state carried FLAT (2^n,): rank-n carries get 64x tile padding at
        # scan boundaries. jax.checkpoint: AD saves only layer boundaries and
        # recomputes intra-layer states — O(nlayer) state residuals.
        for i in range(nqubit):
            m = (G.rx_matrix(theta[i, 2]) @ G.rz_matrix(theta[i, 1])
                 @ G.rx_matrix(theta[i, 0]))
            state = evolve_state(state, m, nqubit, [i]).reshape(-1)
        for i in range(nqubit):
            state = evolve_state(state, cnot, nqubit, [i, (i + 1) % nqubit]).reshape(-1)
        return state, None

    def expectation(params):
        params = params.reshape(nlayer, nqubit, 3)
        init = jnp.zeros(2 ** nqubit, cdtype()).at[0].set(1)
        final, _ = jax.lax.scan(layer, init, params)
        ox = final
        for i in range(nqubit):
            ox = evolve_state(ox, pauli(), nqubit, [i]).reshape(-1)
        return jnp.real(jnp.vdot(final, ox))

    init_params = jnp.asarray(
        np.random.rand(nlayer, nqubit, 3) * 2 * np.pi, rdtype())
    return expectation, init_params
