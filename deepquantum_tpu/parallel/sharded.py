"""Sharded statevector simulation over a device mesh (GSPMD).

TPU-native replacement for the reference's rank-explicit distributed engine
(reference: src/deepquantum/distributed.py, communication.py, arXiv:2311.01512
algorithms). Instead of hand-written pairwise exchanges, the 2^n amplitude
axis is sharded over the mesh with ``jax.sharding.NamedSharding``; gates on
"global" (sharded) qubits compile to XLA collectives (all-to-all / ppermute)
over ICI, chosen by GSPMD. Gates on local qubits are free. Expectation values
reduce with a compiler-inserted psum; world_size=1 degenerates to the local
engine bit-for-bit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import cdtype

__all__ = ['make_mesh', 'ShardedSimulator', 'DistributedQubitState',
           'setup_distributed', 'cleanup_distributed']


def make_mesh(n_devices: int | None = None, axis_name: str = 'sv', devices=None) -> Mesh:
    """1-D device mesh over the statevector axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    import numpy as np
    return Mesh(np.array(devices), (axis_name,))


class ShardedSimulator:
    """Applies a circuit IR to an amplitude-sharded flat statevector.

    The state stays flat (2^n,) with sharding P(axis) re-constrained after
    every gate; XLA propagates the sharding through the
    reshape/transpose/matmul of each gate and inserts the minimal collective
    when a sharded qubit axis participates in a contraction.
    """

    def __init__(self, nqubit: int, mesh: Mesh, axis_name: str = 'sv') -> None:
        self.nqubit = nqubit
        self.mesh = mesh
        self.axis_name = axis_name
        self.sharding = NamedSharding(mesh, P(axis_name))

    def init_state(self) -> jax.Array:
        dim = 2 ** self.nqubit
        zeros = jnp.zeros((dim,), dtype=cdtype()).at[0].set(1)
        return jax.device_put(zeros, self.sharding)

    def init_state_traced(self) -> jax.Array:
        """|0...0> built inside a traced program (sharding via constraint)."""
        dim = 2 ** self.nqubit
        zeros = jnp.zeros((dim,), dtype=cdtype()).at[0].set(1)
        return self.constrain(zeros)

    def constrain(self, x: jax.Array) -> jax.Array:
        return jax.lax.with_sharding_constraint(x, self.sharding)

    def apply_gate(self, state_flat: jax.Array, matrix: jax.Array, wires, controls=()) -> jax.Array:
        """One gate on the flat sharded state."""
        from ..ops.apply import evolve_state_controlled
        n = self.nqubit
        x = state_flat.reshape([2] * n)
        x = evolve_state_controlled(x, matrix, n, list(wires), list(controls))
        return self.constrain(x.reshape(-1))

    def run(self, circuit, full_params: jnp.ndarray, state_flat: jax.Array) -> jax.Array:
        """Apply every op of a QubitCircuit IR."""
        x = state_flat
        for op in circuit.operators:
            if op.kind == 'barrier':
                continue
            assert op.kind == 'gate', 'sharded engine supports unitary gates'
            mat = op.matrix(full_params)
            x = self.apply_gate(x, mat, op.wires, op.controls)
        return x

    def expectation(self, circuit, full_params: jnp.ndarray, state_flat: jax.Array) -> jnp.ndarray:
        """<psi|O|psi> for every observable; psum inserted by GSPMD."""
        final = self.run(circuit, full_params, state_flat)
        out = []
        for obs in circuit.observables:
            ox = final
            for wire, b in zip(obs.wires, obs.basis):
                from ..circuit import _PAULI_FNS
                ox = self.apply_gate(ox, _PAULI_FNS[b](), [wire[0]])
            out.append(jnp.vdot(final, ox).real)
        return jnp.stack(out, axis=-1)

    def probs(self, state_flat: jax.Array) -> jax.Array:
        return self.constrain(jnp.abs(state_flat) ** 2)


class DistributedQubitState:
    """An amplitude-sharded |0...0> statevector container
    (reference distributed.py:22 DistributedQubitState, which splits 2^n
    amplitudes across ranks; here the split is a NamedSharding over the mesh
    and collectives are compiled by GSPMD)."""

    def __init__(self, nqubit: int, mesh: Mesh | None = None, axis_name: str = 'sv') -> None:
        self.nqubit = nqubit
        self.mesh = mesh if mesh is not None else make_mesh(axis_name=axis_name)
        self.simulator = ShardedSimulator(nqubit, self.mesh, axis_name)
        self.state = self.simulator.init_state()
        self.world_size = self.mesh.size
        self.rank = 0  # single-controller SPMD: every shard is driven here

    def reset(self) -> None:
        self.state = self.simulator.init_state()

    @property
    def amps(self) -> jax.Array:
        return self.state


def setup_distributed(backend: str | None = None, port: str = '29500'):
    """Initialize multi-host JAX (reference communication.py:9, which wires up
    ``torch.distributed``; under jax the runtime is discovered from the
    cluster environment and collectives ride ICI/DCN automatically).

    Returns (rank, world_size, local_device_count). Safe no-op on one host.
    """
    import jax as _jax
    try:
        _jax.distributed.initialize()
    except (ValueError, RuntimeError):
        pass  # single-process / already initialized
    return (_jax.process_index(), _jax.process_count(), _jax.local_device_count())


def cleanup_distributed() -> None:
    """Tear down multi-host JAX (reference communication.py:39)."""
    import jax as _jax
    try:
        _jax.distributed.shutdown()
    except (ValueError, RuntimeError):
        pass
