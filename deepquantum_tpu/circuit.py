"""QubitCircuit: the main qubit-circuit API.

TPU-native redesign of reference src/deepquantum/circuit.py:81-1624. The
circuit is a *builder* that records an immutable op list (the IR) plus one
flat parameter vector. Execution is a pure jitted function
``(params, data, state) -> state`` unrolled over the IR; batching is
``jax.vmap`` over data and/or state; gradients are ``jax.grad`` through the
whole program. Stateful conveniences (``cir(data)`` then ``cir.expectation()``)
are kept for API parity with the reference.
"""

from __future__ import annotations

import copy as _copy
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .config import cdtype, rdtype
from .gate import GATE_REGISTRY, GateOp
from .ops import gates as G
from .ops.apply import (
    evolve_den_mat_controlled,
    evolve_state,
    evolve_state_controlled,
)
from .ops.planar_gate import fwd_ad_active as _fwd_ad
from .ops.qmath import (
    amplitude_encoding,
    expectation_pauli,
    measure as qmeasure,
    slice_state_vector,
)
from .state import QubitState

__all__ = ['QubitCircuit', 'Observable']

_PAULI_FNS = {'x': G.paulix_matrix, 'y': G.pauliy_matrix, 'z': G.pauliz_matrix}


class Observable:
    """A Pauli-string observable (reference layer.py:127-166)."""

    def __init__(self, nqubit: int, wires=None, basis: str = 'z') -> None:
        self.nqubit = nqubit
        if wires is None:
            wires = list(range(nqubit))
        if isinstance(wires, int):
            wires = [wires]
        self.wires = [[w] if isinstance(w, int) else list(w) for w in wires]
        basis = basis.lower()
        if len(basis) == 1:
            basis = basis * len(self.wires)
        assert len(self.wires) == len(basis), 'The number of wires is not equal to the number of bases'
        self.basis = basis

    def apply(self, x: jnp.ndarray, den_mat: bool = False) -> jnp.ndarray:
        """Apply the Pauli string to a state tensor (2,)*n or den-mat tensor (2,)*2n."""
        n = self.nqubit
        for wire, b in zip(self.wires, self.basis):
            mat = _PAULI_FNS[b]()
            if den_mat:
                # left-multiply only: used for tr(O rho)
                x = evolve_state(x, mat, 2 * n, [wire[0]])
            else:
                x = evolve_state(x, mat, n, [wire[0]])
        return x


def _flat_wires(wires):
    if isinstance(wires, int):
        return [wires]
    return list(wires)


def _apply_reset(x, wires, postselect, n):
    """Project each wire onto |postselect>, renormalize, move it to |0>
    (reference gate.py:3047-3065; the sign-mask keeps it vmap-safe when the
    postselected branch has zero probability)."""
    if len(wires) == n:
        flat = jnp.zeros(2 ** n, dtype=x.dtype).at[0].set(1)
        return flat.reshape([2] * n)
    for wire in wires:
        xt = jnp.moveaxis(x, wire, 0)
        sel = xt[postselect]
        prob = jnp.sum(jnp.abs(sel) ** 2)
        mask = 1 - jnp.sign(prob)
        alt = xt[1 - postselect]
        state0 = ((1 - mask) * sel + mask * alt) / jnp.sqrt(prob + mask)
        xt = jnp.stack([state0, jnp.zeros_like(state0)])
        x = jnp.moveaxis(xt, 0, wire)
    return x


def _eager() -> bool:
    """True outside any jit/vmap trace."""
    try:
        return type(jax.core.trace_ctx.trace).__name__ == 'EvalTrace'
    except AttributeError:
        return True


_ENV_FLAGS = ('DQ_PLANAR', 'DQ_WINDOW', 'DQ_WINDOW_W', 'DQ_FUSED_BWD',
              'DQ_GRAD_MXU', 'DQ_CHAIN_FUSED')


def _env_sig() -> tuple:
    """Perf-flag signature folded into jit cache keys. The engine-selection
    flags are read at TRACE time; a cached jitted closure would otherwise
    pin the flag values from its first trace (pjit caches jaxprs on avals
    only), silently ignoring later toggles — e.g. QubitCircuit.hessian
    pinning DQ_CHAIN_FUSED=0 around its rev-over-rev trace."""
    import os
    return tuple(os.environ.get(f, '') for f in _ENV_FLAGS)


_PAULI_NP = {'x': np.array([[0, 1], [1, 0]], np.complex64),
             'y': np.array([[0, -1j], [1j, 0]], np.complex64),
             'z': np.array([[1, 0], [0, -1]], np.complex64)}


def _pauli_obs_blocks(obs):
    """Compile a Pauli-string observable into <=3-wire constant blocks for
    the planar engine: [(np (2^k, 2^k) complex64, sorted wire tuple), ...].
    Shared by the single-state and batched expectation paths — keep them in
    lockstep."""
    pairs = sorted((w[0], b) for w, b in zip(obs.wires, obs.basis))
    blocks = []
    for i in range(0, len(pairs), 3):
        chunk = pairs[i:i + 3]
        mat = np.array([[1]], np.complex64)
        for _, b in chunk:
            mat = np.kron(mat, _PAULI_NP[b])
        blocks.append((mat, tuple(w for w, _ in chunk)))
    return blocks


def _symbolic_init_state(nqubit: int, kind: str, den_mat: bool):
    """Traced construction of the string init states (no dense constants)."""
    dim = 2 ** nqubit
    if kind == 'zeros':
        s = jnp.zeros((dim, 1), cdtype()).at[0, 0].set(1)
    elif kind == 'equal':
        s = jnp.full((dim, 1), dim ** -0.5, cdtype())
    elif kind in ('entangle', 'GHZ', 'ghz'):
        s = jnp.zeros((dim, 1), cdtype()).at[0, 0].set(2 ** -0.5).at[-1, 0].set(2 ** -0.5)
    else:
        raise ValueError(f'Unknown init state: {kind}')
    if den_mat:
        s = s @ s.conj().T
    return s




class QubitCircuit:
    """Quantum circuit for qubits (API surface mirrors reference circuit.py:81).

    Args:
        nqubit: number of qubits.
        init_state: 'zeros' | 'equal' | 'entangle'/'GHZ' | array | QubitState.
        den_mat: density-matrix simulation.
        reupload: data re-uploading for encoders.
        mps: matrix-product-state simulation (see mps.py).
        chi: MPS bond dimension.
        shots: default measurement shots.
    """

    def __init__(
        self,
        nqubit: int,
        init_state: Any = 'zeros',
        name: str | None = None,
        den_mat: bool = False,
        reupload: bool = False,
        mps: bool = False,
        chi: int | None = None,
        shots: int = 1024,
    ) -> None:
        self.nqubit = nqubit
        self.name = name
        self.den_mat = den_mat
        self.reupload = reupload
        self.mps = mps
        self.chi = chi
        self.shots = shots
        self.operators: list[GateOp] = []
        self.observables: list[Observable] = []
        self.encoders: list[GateOp] = []
        self._pvals: list[float] = []       # all parameter values (host-side master copy)
        self._enc_pidx: list[int] = []      # param indices fed by data, in encoder order
        self._train_mask: list[bool] = []   # per-param trainability
        self.state = None
        self.npara = 0
        self.ndata = 0
        self.depth = np.zeros(nqubit, dtype=np.int64)
        self._cut_lst: list[tuple] = []
        self.wires_measure: list[int] = []
        self.wires_condition: list[int] = []
        self._version = 0
        self._cache: dict = {}
        self.set_init_state(init_state)

    # ------------------------------------------------------------------ state
    def set_init_state(self, init_state: Any) -> None:
        if self.mps:
            from .mps import MatrixProductState
            if isinstance(init_state, MatrixProductState):
                assert self.nqubit == init_state.nsite
                self.init_state = init_state
                self.chi = init_state.chi
            else:
                self.init_state = MatrixProductState(nsite=self.nqubit, state=init_state, chi=self.chi)
                self.chi = self.init_state.chi
        elif isinstance(init_state, QubitState):
            assert self.nqubit == init_state.nqubit
            self.den_mat = init_state.den_mat
            self.init_state = init_state
        else:
            self.init_state = QubitState(nqubit=self.nqubit, state=init_state, den_mat=self.den_mat)

    def reset_circuit(self, init_state: Any = 'zeros') -> None:
        """Clear all operators/parameters and reset the initial state
        (reference circuit.py:305)."""
        self.set_init_state(init_state)
        self.operators = []
        self.observables = []
        self.encoders = []
        self._pvals = []
        self._enc_pidx = []
        self._train_mask = []
        self.state = None
        self.npara = 0
        self.ndata = 0
        self.depth = np.zeros(self.nqubit, dtype=np.int64)
        self._cut_lst = []
        self.wires_measure = []
        self.wires_condition = []
        self._version += 1
        self._cache.clear()

    def set_nqubit(self, nqubit: int) -> None:
        """Resize the circuit (reference operation.py:73); only valid before
        operators are added."""
        assert not self.operators, 'set_nqubit before adding operators'
        self.nqubit = nqubit
        self.depth = np.zeros(nqubit, dtype=np.int64)
        self.set_init_state('zeros')

    def set_wires(self, wires) -> None:
        """Parity setter (reference operation.py:77); circuits themselves act
        on all qubits, so this only records the attribute."""
        self.wires = _flat_wires(wires)

    # ------------------------------------------------------ state reshapers
    def tensor_rep(self, x) -> jnp.ndarray:
        """State as a (batch, 2, ..., 2) tensor (reference operation.py:45)."""
        n = self.nqubit
        x = jnp.asarray(x)
        return x.reshape([-1] + [2] * (2 * n if self.den_mat else n))

    def vector_rep(self, x) -> jnp.ndarray:
        """State as a (batch, 2^n, 1) column vector (reference operation.py:57)."""
        return jnp.asarray(x).reshape(-1, 2 ** self.nqubit, 1)

    def matrix_rep(self, x) -> jnp.ndarray:
        """State as a (batch, 2^n, 2^n) density matrix (reference operation.py:61)."""
        return jnp.asarray(x).reshape(-1, 2 ** self.nqubit, 2 ** self.nqubit)

    # ----------------------------------------------- stateful parameter API
    def encode(self, data) -> None:
        """Write data into the stored encoder parameter values (stateful
        parity API, reference circuit.py:265; the functional path passes data
        to forward() instead). Supports re-uploading."""
        if data is None:
            return
        data = np.asarray(data, dtype=np.float64).reshape(-1)
        if not self.reupload:
            assert len(data) >= self.ndata, \
                'The circuit needs more data, or consider data re-uploading'
        if self.reupload and len(data) < self.ndata:
            reps = int(np.ceil(self.ndata / len(data)))
            data = np.tile(data, reps)
        for k, pidx in enumerate(self._enc_pidx):
            self._pvals[pidx] = float(data[k])
        self._version += 1
        self._cache.clear()

    def init_para(self) -> None:
        """Re-randomize all trainable parameters (reference circuit.py:295)."""
        for i, trainable in enumerate(self._train_mask):
            if trainable:
                self._pvals[i] = float(np.random.rand() * 2 * np.pi)
        self._version += 1
        self._cache.clear()

    def init_encoder(self) -> None:
        """Re-randomize the encoder parameters (reference circuit.py:300)."""
        for pidx in self._enc_pidx:
            self._pvals[pidx] = float(np.random.rand() * 2 * np.pi)
        self._version += 1
        self._cache.clear()

    def transform_cut2move(self) -> 'QubitCircuit':
        """Rewrite wire cuts into Move operations on an enlarged register
        (reference circuit.py:729); the result simulates the cut circuit
        directly (no QPD sampling)."""
        from .cutting import _IROp, _cut_marker, transform_cut2move
        ops = [(_IROp(op, self._pvals) if op.kind != 'cut' else _cut_marker(op))
               for op in self.operators]
        observables = [(sum(o.wires, []), o.basis) for o in self.observables] or None
        new_ops, new_obs, new_nq = transform_cut2move(
            ops, self._cut_lst, self.nqubit, observables, qpd_form=False)
        cir = QubitCircuit(new_nq, den_mat=self.den_mat, reupload=self.reupload,
                           shots=self.shots)
        for op in new_ops:
            op.add_to(cir)
        for w, b in (new_obs or []):
            cir.observable([[x] for x in w], basis=b)
        return cir

    # ------------------------------------------------------------- parameters
    @property
    def params(self) -> jnp.ndarray:
        """Trainable parameter vector (the leaves users feed to jax.grad/optax)."""
        idx = [i for i, t in enumerate(self._train_mask) if t]
        return jnp.asarray(np.asarray(self._pvals, dtype=np.float64)[idx], dtype=rdtype())

    @params.setter
    def params(self, values) -> None:
        idx = [i for i, t in enumerate(self._train_mask) if t]
        values = np.asarray(values, dtype=np.float64).reshape(-1)
        assert len(values) == len(idx)
        for i, v in zip(idx, values):
            self._pvals[i] = float(v)

    @property
    def _train_idx(self) -> list[int]:
        return [i for i, t in enumerate(self._train_mask) if t]

    def _full_params(self, params=None, data=None, data_idx=None) -> jnp.ndarray:
        """Assemble the full parameter vector functionally.

        Replaces the reference's encode-by-mutating-buffers (circuit.py:265-293)
        with scatter updates, so it traces under jit/vmap/grad.
        """
        full = jnp.asarray(np.asarray(self._pvals, dtype=np.float64), dtype=rdtype())
        if params is not None:
            ti = self._train_idx
            params = jnp.asarray(params, dtype=rdtype()).reshape(-1)
            full = full.at[jnp.array(ti, dtype=jnp.int32)].set(params)
        if data is not None and self._enc_pidx:
            data = jnp.asarray(data, dtype=rdtype()).reshape(-1)
            full = full.at[jnp.array(self._enc_pidx, dtype=jnp.int32)].set(data[jnp.array(data_idx, jnp.int32)])
        return full

    def _data_indices(self, data_len: int) -> list[int]:
        """Static map: encoder-param position -> index into the data vector."""
        if self.reupload:
            return [i % data_len for i in range(self.ndata)]
        assert data_len >= self.ndata, 'The circuit needs more data, or consider data re-uploading'
        return list(range(self.ndata))

    def init_para(self, seed: int | None = None) -> None:
        """Re-randomize all trainable parameters."""
        rng = np.random.default_rng(seed)
        for i, t in enumerate(self._train_mask):
            if t:
                self._pvals[i] = float(rng.random() * 2 * np.pi)

    # ------------------------------------------------------------------- add
    def _new_params(self, values, encode: bool, requires_grad: bool) -> tuple:
        start = len(self._pvals)
        idx = tuple(range(start, start + len(values)))
        self._pvals.extend(float(v) for v in values)
        self._train_mask.extend([requires_grad and not encode] * len(values))
        return idx

    def add_gate(
        self,
        name: str,
        wires,
        controls=None,
        inputs=None,
        encode: bool = False,
        condition: bool = False,
        requires_grad: bool | None = None,
        matrix_fn=None,
        static_matrix=None,
        npara: int | None = None,
        extra: dict | None = None,
    ) -> GateOp:
        """Append a gate to the IR, registering its parameters."""
        wires = tuple(_flat_wires(wires))
        controls = tuple(_flat_wires(controls)) if controls is not None else ()
        assert len(set(wires)) == len(wires), 'Use repeated wires'
        assert len(set(controls)) == len(controls), 'Use repeated controls'
        for w in wires:
            assert w not in controls, 'Use repeated wires'
        for w in wires + controls:
            assert 0 <= w < self.nqubit, f'wire {w} out of range for {self.nqubit} qubits'
        if condition:
            assert len(controls) > 0
        reg = GATE_REGISTRY.get(name)
        if matrix_fn is None and static_matrix is None:
            assert reg is not None, f'Unknown gate: {name}'
            matrix_fn = reg['fn']
            npara = reg['npara']
            assert len(wires) == reg['nwires'], \
                f'{name} acts on {reg["nwires"]} wire(s), got {wires} ' \
                f'(did you pass a control as a wire? e.g. swap takes a LIST)'
        if npara is None:
            npara = 0
        if requires_grad is None:
            requires_grad = inputs is None and npara > 0 and not encode
        if npara > 0:
            if inputs is None:
                values = [float(np.random.rand() * 2 * np.pi) for _ in range(npara)]
            else:
                values = np.asarray(inputs, dtype=np.float64).reshape(-1)
                assert len(values) == npara, f'{name} expects {npara} parameters'
            pidx = self._new_params(values, encode, requires_grad)
        else:
            pidx = ()
        op = GateOp(
            name=name, wires=wires, controls=controls, matrix_fn=matrix_fn,
            static_matrix=static_matrix, pidx=pidx, npara=npara, kind='gate',
            condition=condition, requires_grad=requires_grad, extra=extra or {},
        )
        self.operators.append(op)
        for i in wires + controls:
            self.depth[i] += 1
        if condition:
            self.wires_condition = sorted(set(self.wires_condition) | set(controls))
        if encode:
            self.encoders.append(op)
            self._enc_pidx.extend(pidx)
            self.ndata += npara
        else:
            self.npara += npara
        self._version += 1
        self._cache.clear()
        return op

    def add(self, op, encode: bool = False, wires=None, controls=None) -> None:
        """Add a GateOp / Observable / QubitCircuit (reference circuit.py:820)."""
        if isinstance(op, QubitCircuit):
            assert self.nqubit == op.nqubit
            offset = len(self._pvals)
            self._pvals.extend(op._pvals)
            self._train_mask.extend(op._train_mask)
            for g in op.operators:
                g2 = _copy.copy(g)
                g2.pidx = tuple(i + offset for i in g.pidx)
                self.operators.append(g2)
                if g in op.encoders:
                    self.encoders.append(g2)
                    self._enc_pidx.extend(g2.pidx)
            self.observables = list(op.observables)
            self.npara += op.npara
            self.ndata += op.ndata
            self.depth += op.depth
            self.wires_measure = op.wires_measure
            self.wires_condition = sorted(set(self.wires_condition) | set(op.wires_condition))
            self._version += 1
            self._cache.clear()
            return
        if isinstance(op, Observable):
            self.observables.append(op)
            return
        assert isinstance(op, GateOp)
        if op.kind == 'channel':
            assert self.den_mat, 'Channels act on density matrices; build the circuit with den_mat=True'
        shared = op.npara > 0 and op.extra.get('_owner') is self and bool(op.pidx)
        if op.npara > 0 and not shared:
            # assign the slice on the ORIGINAL descriptor so re-adding the
            # same op shares parameters (torch shared-module semantics,
            # reference circuit.py:830 'parameters of gates are shared')
            values = op.extra.get('inputs')
            if values is None:
                values = [float(np.random.rand() * 2 * np.pi) for _ in range(op.npara)]
            op.pidx = self._new_params(np.asarray(values).reshape(-1), encode, op.requires_grad)
            op.extra['_owner'] = self
        g = _copy.copy(op)
        if wires is not None:
            g.wires = tuple(_flat_wires(wires))
            g.controls = tuple(_flat_wires(controls)) if controls is not None else ()
        self.operators.append(g)
        for i in g.wires + g.controls:
            self.depth[i] += 1
        if shared:
            pass  # parameters already counted on first registration
        elif encode:
            self.encoders.append(g)
            self._enc_pidx.extend(g.pidx)
            self.ndata += g.npara
        else:
            self.npara += g.npara
        self._version += 1
        self._cache.clear()

    # ---------------------------------------------------------------- fusion
    #: max combined wire support of one fused gate group. Each group costs one
    #: full read+write pass over the state. Forward-only, bigger K wins (fewer
    #: passes); under training the backward's matrix-cotangent reduction costs
    #: ~4^K VPU work per group, and the measured optimum on the n=22/l=5 TPU
    #: grad step is K=2 (103.3/102.3/126.7 ms for K=1/2/3 — benchmarks
    #: results.json fusion_ablation_ms).
    fuse_max_support: int = 2

    def _fused_plan(self):
        """Trace-time gate fusion: greedy wire-support grouping.

        Consecutive gates merge into a group while their combined wire support
        stays within ``fuse_max_support`` (controlled gates included — controls
        embed block-diagonally). Groups touching disjoint wires commute, so a
        group only closes when a later op needs more support than K allows or
        a non-unitary op touches its wires. Each group costs ONE state pass:
        on the layered rx/rz/rx + cnot-ring ansatz, K=3 replaces ~4n gate
        passes per layer with ~n/2 group passes.
        """
        key = ('fuseplan', self._version, self.fuse_max_support)
        plan = self._cache.get(key)
        if plan is not None:
            return plan
        K = max(1, int(self.fuse_max_support))
        plan = []       # entries: ('op', op) | ('group', [ops], wires_tuple)
        groups: list[dict] = []            # open groups, creation order
        owner: dict[int, dict] = {}        # wire -> open group

        def close(group):
            if group.get('closed'):
                return
            group['closed'] = True
            for w in group['wires']:
                if owner.get(w) is group:
                    del owner[w]
            if len(group['ops']) == 1:
                op = group['ops'][0]
                if not op.controls and len(op.wires) == len(group['wires']):
                    plan.append(('op', op))
                    return
            plan.append(('group', group['ops'], tuple(sorted(group['wires']))))

        for op in self.operators:
            if op.kind in ('barrier', 'cut'):
                continue
            fusable = op.kind == 'gate' and not op.condition
            wires = set(op.wires) | set(op.controls)
            touching = []
            for w in wires:
                g = owner.get(w)
                if g is not None and g not in touching:
                    touching.append(g)
            if fusable:
                union = set(wires)
                for g in touching:
                    union |= g['wires']
                if len(union) <= K:
                    if touching:
                        tgt = touching[0]
                        for g in touching[1:]:
                            # groups are wire-disjoint: op order between them
                            # is free; keep creation order
                            tgt['ops'].extend(g['ops'])
                            tgt['wires'] |= g['wires']
                            g['closed'] = True
                            groups.remove(g)
                    else:
                        tgt = {'ops': [], 'wires': set(), 'closed': False}
                        groups.append(tgt)
                    tgt['ops'].append(op)
                    tgt['wires'] = set(union)
                    for w in tgt['wires']:
                        owner[w] = tgt
                    continue
            # close whatever this op touches, in creation order
            for g in [g for g in groups if g in touching]:
                close(g)
            groups = [g for g in groups if not g.get('closed')]
            if fusable:
                g = {'ops': [op], 'wires': set(wires), 'closed': False}
                groups.append(g)
                for w in g['wires']:
                    owner[w] = g
            else:
                plan.append(('op', op))
        for g in groups:
            close(g)
        self._cache[key] = plan
        return plan

    def _fused_matrix(self, entry, full_params):
        """Compose one group's 2^k unitary (k = |group wires|)."""
        from .ops.apply import controlled_matrix, permute_matrix_wires
        _, ops, wires = entry
        k = len(wires)
        pos = {w: i for i, w in enumerate(wires)}
        mat = None
        for op in ops:
            m = controlled_matrix(jnp.asarray(op.matrix(full_params), cdtype()),
                                  len(op.controls))
            aw = list(op.controls) + list(op.wires)
            pad = k - len(aw)
            if pad:
                m = jnp.kron(m, jnp.eye(1 << pad, dtype=cdtype()))
            # current wire order of m: aw + leftover group wires
            order = aw + [w for w in wires if w not in aw]
            # permute so m's axes follow the group's sorted wire list
            perm = [order.index(w) for w in wires]
            m = permute_matrix_wires(m, perm)
            mat = m if mat is None else m @ mat
        return mat, wires

    # -------------------------------------------------------------- simulate
    def _apply_op(self, op: GateOp, full_params: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        n = self.nqubit
        if op.kind in ('barrier', 'cut'):
            return x
        if op.kind == 'reset':
            assert not self.den_mat, 'Reset acts on state vectors'
            return _apply_reset(x, op.wires, op.extra.get('postselect', 0), n)
        if op.kind == 'move':
            assert not self.den_mat, 'Move acts on state vectors'
            x = _apply_reset(x, (op.wires[1],), op.extra.get('postselect', 0), n)
            return evolve_state(x, G.swap_matrix(), n, list(op.wires))
        if op.kind == 'channel':
            kraus = op.matrix(full_params)  # (K, 2^k, 2^k)
            def apply_k(k):
                from .ops.apply import evolve_den_mat
                return evolve_den_mat(x, k, n, list(op.wires))
            return jax.vmap(apply_k)(kraus).sum(0)
        mat = op.matrix(full_params)
        if self.den_mat:
            return evolve_den_mat_controlled(x, mat, n, list(op.wires), list(op.controls))
        return evolve_state_controlled(x, mat, n, list(op.wires), list(op.controls))

    def _planar_ok(self) -> bool:
        """Route through the Pallas planar-f32 engine (ops/planar_gate.py)?

        TPU only, statevector only, complex64 policy, n >= 10, and every
        fused-plan entry a plain unitary on <= 3 wires. The planar kernel
        runs gate apply at ~650 GB/s (near the HBM roofline) vs ~140 GB/s
        for the complex einsum path.
        """
        if getattr(self, '_planar_block', False):
            return False        # vmapped traces: pallas blocks don't batch
        key = ('planar_ok', self._version, self.fuse_max_support, _env_sig())
        ok = self._cache.get(key)
        if ok is None:
            import os
            flag = os.environ.get('DQ_PLANAR', '')
            if flag == '0':
                backend_ok = False
            elif flag == '1':
                backend_ok = True        # forced (CPU tests run in interpret mode)
            else:
                backend_ok = jax.default_backend() == 'tpu'
            eff_n = 2 * self.nqubit if self.den_mat else self.nqubit
            ok = (backend_ok and not self.mps
                  and eff_n >= 10 and cdtype() == jnp.complex64)
            if ok:
                for entry in self._fused_plan():
                    if entry[0] == 'group':
                        if len(entry[2]) > 3:
                            ok = False
                            break
                    else:
                        op = entry[1]
                        if self.den_mat and op.kind == 'channel':
                            continue    # channels flush the planar chain
                        if (op.kind != 'gate' or op.condition
                                or len(set(op.wires) | set(op.controls)) > 3):
                            ok = False
                            break
            self._cache[key] = ok
        return ok

    def _sim_planar(self, full_params: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        from .ops.apply import controlled_matrix
        from .ops.planar_gate import from_planar, planar_chain_matrices, to_planar
        n = self.nqubit
        interp = jax.default_backend() != 'tpu'
        mats, wlists = [], []
        for entry in self._fused_plan():
            if entry[0] == 'op':
                op = entry[1]
                mat = controlled_matrix(jnp.asarray(op.matrix(full_params), cdtype()),
                                        len(op.controls))
                wires = list(op.controls) + list(op.wires)
            else:
                mat, wires = self._fused_matrix(entry, full_params)
            mats.append(mat)
            wlists.append(list(wires))
        p = planar_chain_matrices(to_planar(x.reshape(-1)), mats, wlists, n,
                                  interpret=interp)
        return from_planar(p).reshape([2] * n)

    def _sim_planar_batched(self, fulls: jnp.ndarray, states: jnp.ndarray) -> jnp.ndarray:
        """Batched planar engine: states (B, dim) complex, fulls (B, P) per-
        sample full parameters. The batch is a KERNEL GRID axis
        (ops/planar_gate.py), not a jax.vmap axis — pallas_call does not
        vmap, and falling back to the complex engine costs 4-6x. This is the
        reference's batched-QML use case (circuit.py:232-240) on the TPU
        hot path."""
        from .ops.apply import controlled_matrix
        from .ops.planar_gate import (_sorted_mat_planes, from_planar,
                                      planar_chain, schedule_planar_seq,
                                      to_planar_batched)
        n = self.nqubit
        interp = jax.default_backend() != 'tpu'
        mres, mims, wseq = [], [], []
        for entry in self._fused_plan():
            if entry[0] == 'op':
                op = entry[1]
                wires = list(op.controls) + list(op.wires)
                mats = jax.vmap(lambda fp: controlled_matrix(
                    jnp.asarray(op.matrix(fp), cdtype()), len(op.controls)))(fulls)
            else:
                wires = list(entry[2])
                mats = jax.vmap(lambda fp: self._fused_matrix(entry, fp)[0])(fulls)
            mre, mim = _sorted_mat_planes(mats, wires)
            mres.append(mre)
            mims.append(mim)
            wseq.append(tuple(sorted(wires)))
        mres, mims, wseq = schedule_planar_seq(tuple(mres), tuple(mims),
                                               tuple(wseq), n)
        p = planar_chain(to_planar_batched(states), tuple(mres), tuple(mims),
                         n, tuple(wseq), interp)
        return from_planar(p)

    def _sim_planar_dm(self, full_params: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        """Density-matrix circuits on the planar kernel: rho (2^n x 2^n) is a
        2n-qubit planar state; each unitary U on wires w becomes U on w (row
        side) and conj(U) on w + n (column side) in ONE chain — row/col ops
        commute, so U rho U^dag per gate interleaves freely. Kraus channels
        are not unitary (the chain VJP un-applies by inversion), so each
        channel flushes the current chain and runs through the dense Kraus
        path; gradients keep O(#channels) residual states instead of
        O(#gates). No reference analog (torch den_mat einsum throughout)."""
        from .ops.apply import controlled_matrix
        from .ops.planar_gate import from_planar, planar_chain_matrices, to_planar
        n = self.nqubit
        nn = 2 * n
        interp = jax.default_backend() != 'tpu'
        mats: list = []
        wlists: list = []
        p = to_planar(x.reshape(-1))

        def flush(p):
            if mats:
                p = planar_chain_matrices(p, list(mats), list(wlists), nn,
                                          interpret=interp)
                mats.clear()
                wlists.clear()
            return p

        for entry in self._fused_plan():
            if entry[0] == 'op' and entry[1].kind == 'channel':
                op = entry[1]
                p = flush(p)
                if 2 * len(op.wires) <= 3:
                    # rho' = sum_k K rho K^dag is LINEAR in rho: one 4^k
                    # superoperator M = sum_k K (x) conj(K) on the planar
                    # wire pair (w, w+n), applied as a single (non-unitary)
                    # aliased kernel — no 2n-d dense transposes, which kill
                    # the TPU compile helper at nn >= 24
                    from .ops.planar_gate import planar_superop_matrix
                    kraus = jnp.asarray(op.matrix(full_params), cdtype())
                    k = len(op.wires)
                    sop = jnp.einsum('zab,zcd->acbd', kraus, jnp.conj(kraus))
                    sop = sop.reshape(2 ** (2 * k), 2 ** (2 * k))
                    swires = list(op.wires) + [w + n for w in op.wires]
                    p = planar_superop_matrix(p, sop, nn, swires, interp)
                else:
                    rho = from_planar(p).reshape([2] * nn)
                    rho = self._apply_op(op, full_params, rho)
                    p = to_planar(rho.reshape(-1))
                continue
            if entry[0] == 'op':
                op = entry[1]
                mat = controlled_matrix(jnp.asarray(op.matrix(full_params), cdtype()),
                                        len(op.controls))
                wires = list(op.controls) + list(op.wires)
            else:
                mat, wires = self._fused_matrix(entry, full_params)
            mats.append(mat)
            wlists.append(list(wires))
            mats.append(jnp.conj(mat))
            wlists.append([w + n for w in wires])
        p = flush(p)
        return from_planar(p).reshape([2] * nn)

    def _sim_planar_dm_batched(self, fulls: jnp.ndarray, states: jnp.ndarray) -> jnp.ndarray:
        """Batched density-matrix circuits on the planar kernel: the batch is
        a KERNEL GRID axis (like _sim_planar_batched), each unitary applies
        per-sample (B, K, K) planes on the row wires and their conjugates on
        the column wires, and channels flush the chain through a vmapped
        dense Kraus step. states: (B, 4^n) complex; returns (B, 4^n)."""
        from .ops.apply import controlled_matrix
        from .ops.planar_gate import (_sorted_mat_planes, from_planar,
                                      planar_chain, schedule_planar_seq,
                                      to_planar_batched)
        n = self.nqubit
        nn = 2 * n
        interp = jax.default_backend() != 'tpu'
        bsz = states.shape[0]
        p = to_planar_batched(states)
        mres: list = []
        mims: list = []
        wseq: list = []

        def flush(p):
            if mres:
                r, i, w = schedule_planar_seq(tuple(mres), tuple(mims),
                                              tuple(wseq), nn)
                p = planar_chain(p, r, i, nn, w, interp)
                mres.clear()
                mims.clear()
                wseq.clear()
            return p

        for entry in self._fused_plan():
            if entry[0] == 'op' and entry[1].kind == 'channel':
                op = entry[1]
                p = flush(p)
                if 2 * len(op.wires) <= 3:
                    # per-sample 4^k superoperators on (w, w+n), batch on
                    # the kernel grid axis (same as the unitary chain)
                    from .ops.planar_gate import planar_superop
                    kraus = jax.vmap(lambda fp: jnp.asarray(
                        op.matrix(fp), cdtype()))(fulls)
                    k = len(op.wires)
                    sop = jnp.einsum('Bzab,Bzcd->Bacbd', kraus,
                                     jnp.conj(kraus))
                    sop = sop.reshape(bsz, 2 ** (2 * k), 2 ** (2 * k))
                    swires = list(op.wires) + [w + n for w in op.wires]
                    sre, sim = _sorted_mat_planes(sop, swires)
                    p = planar_superop(p, sre, sim, nn,
                                       tuple(sorted(swires)), interp)
                else:
                    rho = from_planar(p).reshape((bsz,) + (2,) * nn)
                    rho = jax.vmap(lambda fp, r: self._apply_op(op, fp, r))(fulls, rho)
                    p = to_planar_batched(rho.reshape(bsz, -1))
                continue
            if entry[0] == 'op':
                op = entry[1]
                wires = list(op.controls) + list(op.wires)
                mats = jax.vmap(lambda fp: controlled_matrix(
                    jnp.asarray(op.matrix(fp), cdtype()), len(op.controls)))(fulls)
            else:
                wires = list(entry[2])
                mats = jax.vmap(lambda fp: self._fused_matrix(entry, fp)[0])(fulls)
            mre, mim = _sorted_mat_planes(mats, wires)
            cre, cim = _sorted_mat_planes(jnp.conj(mats), wires)
            mres.append(mre)
            mims.append(mim)
            wseq.append(tuple(sorted(wires)))
            mres.append(cre)
            mims.append(cim)
            wseq.append(tuple(sorted(w + n for w in wires)))
        p = flush(p)
        return from_planar(p)

    def _sim_tensor(self, full_params: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        """Pure simulation over a state tensor (2,)*n (or (2,)*2n for den_mat)."""
        n = self.nqubit
        if self._planar_ok() and not _fwd_ad(full_params, x):
            if self.den_mat:
                return self._sim_planar_dm(full_params, x)
            return self._sim_planar(full_params, x)
        for entry in self._fused_plan():
            if entry[0] == 'op':
                x = self._apply_op(entry[1], full_params, x)
            else:
                mat, wires = self._fused_matrix(entry, full_params)
                if self.den_mat:
                    from .ops.apply import evolve_den_mat
                    x = evolve_den_mat(x, mat, n, list(wires))
                else:
                    x = evolve_state(x, mat, n, list(wires))
        return x

    def _run_flat(self, full_params: jnp.ndarray, state_flat: jnp.ndarray) -> jnp.ndarray:
        n = self.nqubit
        if self.mps:
            raise RuntimeError('use _run_mps for MPS circuits')
        shape = [2] * (2 * n) if self.den_mat else [2] * n
        x = self._sim_tensor(full_params, state_flat.reshape(shape))
        if self.den_mat:
            return x.reshape(2 ** n, 2 ** n)
        return x.reshape(2 ** n, 1)

    def _run_mps(self, full_params, tensors):
        from .mps import apply_gate_mps
        from .ops.apply import controlled_matrix, permute_matrix_wires
        normalize = getattr(self.init_state, 'normalize', True)
        state = (list(tensors), -1)
        for op in self.operators:
            if op.kind == 'barrier':
                continue
            assert op.kind == 'gate', 'MPS supports unitary gates only'
            mat = op.matrix(full_params)
            all_wires = list(op.controls) + list(op.wires)
            mat = controlled_matrix(mat, len(op.controls))
            order = sorted(range(len(all_wires)), key=lambda i: all_wires[i])
            mat = permute_matrix_wires(mat, order)
            state = apply_gate_mps(state, mat, sorted(all_wires), self.chi, normalize)
        return state[0]

    # --------------------------------------------------------------- forward
    def __call__(self, data=None, state=None, params=None):
        return self.forward(data, state, params)

    def forward(self, data=None, state=None, params=None):
        """Run the circuit; returns and stores the final state.

        data: optional (ndata,) or (batch, ndata) encoder data.
        state: optional initial state (array or QubitState); defaults to init_state.
        params: optional trainable-parameter vector (pure-functional override).
        """
        if self.mps:
            return self._forward_mps(data, state, params)
        if state is None:
            state = self.init_state
        if isinstance(state, QubitState):
            if state.kind is not None and not _eager():
                # under an outer trace: rebuild the init state symbolically so
                # no 2^n dense constant lands in the program (33 MB at n=22)
                state = _symbolic_init_state(self.nqubit, state.kind, self.den_mat)
            else:
                state = state.state
        if isinstance(state, np.ndarray):
            state = state.astype(cdtype())
        elif not isinstance(state, jax.Array):
            state = np.asarray(state, dtype=cdtype())
        if isinstance(state, np.ndarray) and _eager():
            # complex host->device transfers are not universally supported
            # (axon tunnel): ship as two real buffers. Under an outer trace
            # the numpy array embeds as an inline constant instead.
            from .utils.compat import to_device
            state = to_device(state)
        n = self.nqubit
        dim = 2 ** n
        # normalize state shape: flat (dim*?,) per sample
        if self.den_mat:
            single = state.ndim == 2
        else:
            single = state.ndim == 1 or (state.ndim == 2 and state.shape[-1] == 1)
        if self.ndata == 0:
            data = None
        # forward-mode transforms (jax.hessian = jacfwd(jacrev)) cannot cross
        # the planar chain's custom_vjp; the check must happen HERE, at the
        # Python call boundary, because inside jax.jit the function is traced
        # abstractly once and the jvp is applied at the jaxpr level — inner
        # code never sees a JVPTracer (ops/planar_gate.py::fwd_ad_active)
        fwd_mode = _fwd_ad(params, data, state)
        key = ('fwd', self._version, None if data is None else jnp.shape(data),
               single, fwd_mode, _env_sig())
        fn = self._cache.get(key)
        if fn is None:
            def run(params_, data_, state_):
                if data_ is None:
                    full = self._full_params(params_)
                    return self._run_flat(full, state_)
                data_idx = self._data_indices(data_.shape[-1])
                def one(d, s):
                    full = self._full_params(params_, d, data_idx)
                    return self._run_flat(full, s)
                if data_.ndim == 1:
                    return one(data_, state_)
                if self._planar_ok():
                    # batched planar path: the batch rides the kernel grid
                    fulls = jax.vmap(lambda d: self._full_params(
                        params_, d, data_idx))(data_)
                    dim = 4 ** self.nqubit if self.den_mat else 2 ** self.nqubit
                    if single:
                        states = jnp.broadcast_to(state_.reshape(-1)[None, :],
                                                  (data_.shape[0], dim))
                    else:
                        states = state_.reshape(data_.shape[0], dim)
                    if self.den_mat:
                        out = self._sim_planar_dm_batched(fulls, states)
                        half = 2 ** self.nqubit
                        return out.reshape(data_.shape[0], half, half)
                    out = self._sim_planar_batched(fulls, states)
                    return out.reshape(data_.shape[0], dim, 1)
                in_axes = (0, None) if single else (0, 0)
                prev_ = getattr(self, '_planar_block', False)
                self._planar_block = True      # pallas kernels don't vmap
                try:
                    return jax.vmap(one, in_axes=in_axes)(data_, state_)
                finally:
                    self._planar_block = prev_
            fn = jax.jit(run, static_argnames=())
            self._cache[key] = fn
        ptree = None if params is None else jnp.asarray(params, dtype=rdtype())
        prev = getattr(self, '_planar_block', False)
        self._planar_block = prev or fwd_mode   # seen by run() at trace time
        try:
            self.state = fn(ptree, data, state)
        finally:
            self._planar_block = prev
        return self.state

    def _forward_mps(self, data=None, state=None, params=None):
        from .mps import MatrixProductState
        if state is None:
            state = self.init_state
        if isinstance(state, MatrixProductState):
            tensors = state.tensors
        else:
            tensors = state
        if _eager():
            from .utils.compat import to_device
            tensors = [to_device(t) if isinstance(t, np.ndarray) else t for t in tensors]
        key = ('fwd_mps', self._version, None if data is None else jnp.shape(data),
               _env_sig())
        fn = self._cache.get(key)
        if fn is None:
            def run(params_, data_, tensors_):
                if data_ is None:
                    full = self._full_params(params_)
                    return self._run_mps(full, tensors_)
                if data_.ndim == 1:
                    full = self._full_params(params_, data_, self._data_indices(data_.shape[-1]))
                    return self._run_mps(full, tensors_)
                didx = self._data_indices(data_.shape[-1])
                return jax.vmap(lambda d: self._run_mps(self._full_params(params_, d, didx), tensors_))(data_)
            fn = jax.jit(run)
            self._cache[key] = fn
        ptree = None if params is None else jnp.asarray(params, dtype=rdtype())
        out = fn(ptree, data, tensors)
        if _eager():
            from .utils.compat import normalize_layout
            out = [normalize_layout(t) for t in out]
        self.state = out
        return self.state

    # ------------------------------------------------------------ observables
    def observable(self, wires=None, basis: str = 'z') -> None:
        self.observables.append(Observable(nqubit=self.nqubit, wires=wires, basis=basis))

    def reset_observable(self) -> None:
        self.observables = []

    def expectation(self, data=None, state=None, params=None, shots: int | None = None) -> jnp.ndarray:
        """Expectation values of all observables.

        With no arguments, uses the stored final state (reference semantics).
        With data/params, recomputes the state purely (differentiable path).
        shots: sampling-based estimate via basis rotation (reference circuit.py:381).
        """
        assert len(self.observables) > 0, 'There is no observable'
        if data is not None or params is not None or state is not None or self.state is None:
            state = self.forward(data, state, params)
        else:
            state = self.state
        if shots is not None:
            return self._expectation_shots(state, shots)
        n = self.nqubit
        if self.mps:
            from .ops.qmath import inner_product_mps
            out = []
            for obs in self.observables:
                t2 = list(state)
                for wire, b in zip(obs.wires, obs.basis):
                    mat = _PAULI_FNS[b]()
                    t2[wire[0]] = jnp.einsum('ab,ibj->iaj', mat, t2[wire[0]])
                out.append(inner_product_mps(state, t2).real)
            return jnp.stack(out, axis=-1)
        den = self.den_mat
        def one_state_expvals(s):
            if den:
                if self._planar_ok() and not _fwd_ad(s):
                    # tr(O rho): apply the Pauli blocks to the ROW wires of
                    # the 2n-qubit planar rho (one kernel chain), then sum
                    # the real-plane diagonal — no 2n-d dense transposes
                    # (those kill the TPU compile helper at nn >= 24)
                    from .ops.planar_gate import (planar_chain,
                                                  schedule_planar_seq,
                                                  to_planar)
                    nn = 2 * n
                    interp = jax.default_backend() != 'tpu'
                    xp = to_planar(s.reshape(-1))
                    dim = 2 ** n
                    vals = []
                    for obs in self.observables:
                        mres, mims, wseq = [], [], []
                        for mat, wires in _pauli_obs_blocks(obs):
                            mres.append(jnp.asarray(mat.real, jnp.float32))
                            mims.append(jnp.asarray(mat.imag, jnp.float32))
                            wseq.append(wires)
                        mres, mims, wseq = schedule_planar_seq(
                            tuple(mres), tuple(mims), tuple(wseq), nn)
                        y = planar_chain(xp, tuple(mres), tuple(mims), nn,
                                         tuple(wseq), interp)
                        vals.append(jnp.trace(y[0].reshape(dim, dim)))
                    return jnp.stack(vals, axis=-1)
                x = s.reshape([2] * (2 * n))
                vals = []
                for obs in self.observables:
                    ox = obs.apply(x, den_mat=True)
                    vals.append(jnp.trace(ox.reshape(2 ** n, 2 ** n)).real)
            elif self._planar_ok() and not _fwd_ad(s):
                # Pauli strings grouped into <=3-wire constant blocks, run
                # through the planar engine: fwd = one kernel chain (Px),
                # bwd = one elementwise pass (2*Px) — no complex einsums
                from .ops.planar_gate import (planar_pauli_expectation,
                                              schedule_planar_seq, to_planar)
                interp = jax.default_backend() != 'tpu'
                xp = to_planar(s)
                vals = []
                for obs in self.observables:
                    mres, mims, wseq = [], [], []
                    for mat, wires in _pauli_obs_blocks(obs):
                        mres.append(jnp.asarray(mat.real, jnp.float32))
                        mims.append(jnp.asarray(mat.imag, jnp.float32))
                        wseq.append(wires)
                    mres, mims, wseq = schedule_planar_seq(
                        tuple(mres), tuple(mims), tuple(wseq), n)
                    vals.append(planar_pauli_expectation(
                        xp, tuple(mres), tuple(mims), n, tuple(wseq), interp))
            else:
                x = s.reshape([2] * n)
                vals = []
                for obs in self.observables:
                    ox = obs.apply(x, den_mat=False)
                    vals.append(expectation_pauli(x, ox))
            return jnp.stack(vals, axis=-1)
        batched = (state.ndim == 3)
        if batched and not den and self._planar_ok() and not _fwd_ad(state):
            # batched planar Pauli expectation: batch on the kernel grid
            # (pallas does not vmap); obs planes broadcast across the batch
            def fn(states):
                from .ops.planar_gate import (planar_pauli_expectation,
                                              schedule_planar_seq,
                                              to_planar_batched)
                interp = jax.default_backend() != 'tpu'
                bsz = states.shape[0]
                xp = to_planar_batched(states.reshape(bsz, -1))
                vals = []
                for obs in self.observables:
                    mres, mims, wseq = [], [], []
                    for mat, wires in _pauli_obs_blocks(obs):
                        kk = mat.shape[0]
                        mres.append(jnp.broadcast_to(
                            jnp.asarray(mat.real, jnp.float32), (bsz, kk, kk)))
                        mims.append(jnp.broadcast_to(
                            jnp.asarray(mat.imag, jnp.float32), (bsz, kk, kk)))
                        wseq.append(wires)
                    mres, mims, wseq = schedule_planar_seq(
                        tuple(mres), tuple(mims), tuple(wseq), n)
                    vals.append(planar_pauli_expectation(
                        xp, tuple(mres), tuple(mims), n, tuple(wseq), interp))
                return jnp.stack(vals, axis=-1)
        elif batched:
            def fn(states, _one=one_state_expvals):
                prev = getattr(self, '_planar_block', False)
                self._planar_block = True      # pallas kernels don't vmap
                try:
                    return jax.vmap(_one)(states)
                finally:
                    self._planar_block = prev
        else:
            fn = one_state_expvals
        if _eager():
            key = ('expval', self._version, len(self.observables),
                   tuple(tuple(map(tuple, o.wires)) + (o.basis,) for o in self.observables),
                   jnp.shape(state), _env_sig())
            jfn = self._cache.get(key)
            if jfn is None:
                jfn = jax.jit(fn)
                self._cache[key] = jfn
            fn = jfn
        return fn(state)

    def hessian(self, params=None, data=None, obs_index: int = 0) -> jnp.ndarray:
        """Full Hessian of ``expectation()[obs_index]`` w.r.t. params, on the
        planar TPU engine (reference metric:
        benchmark_v420/hessian/hessian_deepquantum.py, which calls
        torch.autograd.functional.hessian on the same scalar).

        ``jax.hessian`` is jacfwd(jacrev(f)): its forward-mode outer
        transform cannot cross the planar chain's custom_vjp, so calling it
        on this circuit falls back to the XLA einsum engine — whose compile
        time grows superlinearly with the parameter count (minutes at
        ~500 params). This method instead computes REVERSE-over-reverse
        Hessian-vector products — the chain VJP's own backward graph is
        reverse-differentiable (ops/planar_gate.py::_applyd and friends) —
        and maps them over basis columns with lax.map, so exactly ONE hvp
        body is compiled regardless of the parameter count and every pass
        rides the planar/window kernels. The Hessian of a C^2 scalar is
        symmetric, which the column-wise hvp construction preserves up to
        f32 roundoff.
        """
        p = self.params if params is None else jnp.asarray(params)

        def f(q):
            return self.expectation(data=data, params=q)[obs_index]

        grad_f = jax.grad(f)

        def hvp(v):
            return jax.grad(lambda q: jnp.vdot(grad_f(q), v))(p)

        basis = jnp.eye(p.size, dtype=p.dtype)
        fn = jax.jit(lambda b: jax.lax.map(hvp, b)) if _eager() else (
            lambda b: jax.lax.map(hvp, b))
        # the one-launch VMEM chain kernels (ops/chain_kernel.py) carry no AD
        # rules, so rev-over-rev must see the per-step differentiable path
        import os
        prev = os.environ.get('DQ_CHAIN_FUSED')
        os.environ['DQ_CHAIN_FUSED'] = '0'
        try:
            return fn(basis).reshape(p.size, p.size)
        finally:
            if prev is None:
                os.environ.pop('DQ_CHAIN_FUSED', None)
            else:
                os.environ['DQ_CHAIN_FUSED'] = prev

    def _expectation_shots(self, state, shots: int):
        from .ops.qmath import sample2expval
        out = []
        for obs in self.observables:
            cir_basis = QubitCircuit(nqubit=self.nqubit, den_mat=self.den_mat)
            for wire, basis in zip(obs.wires, obs.basis):
                if basis == 'x':
                    cir_basis.h(wire[0])
                elif basis == 'y':
                    cir_basis.sdg(wire[0])
                    cir_basis.h(wire[0])
            rotated = cir_basis.forward(state=state)
            wires = sum(obs.wires, [])
            samples = cir_basis.measure(shots=shots, wires=wires)
            if isinstance(samples, list):
                out.append(jnp.asarray([sample2expval(s) for s in samples], dtype=rdtype()))
            else:
                out.append(jnp.asarray(sample2expval(samples), dtype=rdtype()))
        return jnp.stack(out, axis=-1)

    def expval_fn(self):
        """Pure function (params, data=None) -> expvals, for jax.grad/optax loops."""
        def fn(params, data=None):
            state = self.forward(data=data, params=params)
            return self.expectation(state=state) if False else self._expect_of_state(state)
        return fn

    def _expect_of_state(self, state):
        saved = self.state
        self.state = state
        try:
            return self.expectation()
        finally:
            self.state = saved

    # ------------------------------------------------------------ measurement
    def measure(self, shots: int | None = None, with_prob: bool = False, wires=None,
                key=None, block_size: int = 2 ** 24):
        if shots is None:
            shots = self.shots
        else:
            self.shots = shots
        if wires is None:
            wires = list(range(self.nqubit))
        self.wires_measure = _flat_wires(wires)
        if self.mps:
            from .mps import measure_mps
            return measure_mps(self.state, shots=shots, wires=self.wires_measure,
                               with_prob=with_prob, key=key)
        if self.state is None:
            return None
        return qmeasure(self.state, shots=shots, with_prob=with_prob,
                        wires=self.wires_measure, den_mat=self.den_mat, key=key)

    def defer_measure(self, with_prob: bool = False, key=None):
        """Measure condition wires once and slice the state (reference circuit.py:430)."""
        assert not self.den_mat and not self.mps
        rst = self.measure(shots=1, with_prob=with_prob, wires=self.wires_condition, key=key)
        if isinstance(rst, dict):
            bit = next(iter(rst))
            state = slice_state_vector(self.state.reshape(1, -1), self.nqubit,
                                       self.wires_condition, bit)[0][:, None]
            if with_prob:
                return state, bit, rst[bit][1]
            return state
        states, bits, probs = [], [], []
        for i, d in enumerate(rst):
            bit = next(iter(d))
            states.append(slice_state_vector(self.state[i].reshape(1, -1), self.nqubit,
                                             self.wires_condition, bit)[0][:, None])
            bits.append(bit)
            if with_prob:
                probs.append(d[bit][1])
        out = jnp.stack(states)
        if with_prob:
            return out, bits, probs
        return out

    def post_select(self, bits: str) -> jnp.ndarray:
        assert not self.den_mat and not self.mps
        state = self.state
        single = state.ndim == 2
        out = slice_state_vector(state.reshape(1 if single else state.shape[0], -1),
                                 self.nqubit, self.wires_condition, bits)
        return out[0][:, None] if single else out[..., None]

    # ------------------------------------------------------------- inspection
    def get_unitary(self, params=None) -> jnp.ndarray:
        """Full 2^n x 2^n unitary of the circuit."""
        n = self.nqubit
        full = self._full_params(params)
        eye = jnp.eye(2 ** n, dtype=cdtype())
        saved_den = self.den_mat
        self.den_mat = False
        def col(c):
            x = c.reshape([2] * n)
            for op in self.operators:
                if op.kind in ('barrier', 'cut'):
                    continue
                x = evolve_state_controlled(x, op.matrix(full), n, list(op.wires), list(op.controls))
            return x.reshape(-1)
        try:
            u = jax.vmap(col, in_axes=1, out_axes=1)(eye)
        finally:
            self.den_mat = saved_den
        return u

    def get_amplitude(self, bits: str) -> jnp.ndarray:
        assert not self.den_mat
        assert len(bits) == self.nqubit
        if self.mps:
            from .mps import bitstring_amplitude
            return bitstring_amplitude(self.state, jnp.array([int(b) for b in bits]))
        state = self.state.reshape([-1] + [2] * self.nqubit)
        for b in bits:
            state = state[:, int(b)].reshape([state.shape[0]] + [2] * (state.ndim - 2))
        return state.squeeze()

    def get_prob(self, bits: str, wires=None) -> jnp.ndarray:
        if wires is not None:
            wires = _flat_wires(wires)
            if len(wires) != self.nqubit:
                state = self.state.reshape(1, -1) if self.state.ndim == 2 else self.state.reshape(self.state.shape[0], -1)
                sliced = slice_state_vector(state, self.nqubit, wires, bits, normalize=False)
                return (jnp.abs(sliced) ** 2).sum(-1).squeeze()
        amp = self.get_amplitude(bits)
        return jnp.abs(amp) ** 2

    def amplitude_encoding(self, data) -> jnp.ndarray:
        return amplitude_encoding(data, self.nqubit)

    @property
    def max_depth(self) -> int:
        return int(max(self.depth))

    def inverse(self, encode: bool = False) -> 'QubitCircuit':
        """Inverted circuit (parameters copied; reference circuit.py:530)."""
        cir = QubitCircuit(nqubit=self.nqubit, name=(self.name or '') + '_inverse',
                           den_mat=self.den_mat, reupload=self.reupload, mps=self.mps, chi=self.chi)
        cir._pvals = list(self._pvals)
        cir._train_mask = list(self._train_mask)
        for op in reversed(self.operators):
            g = _copy.copy(op)
            if g.kind == 'gate':
                g.inv = not g.inv
            cir.operators.append(g)
            if encode and op in self.encoders:
                cir.encoders.append(g)
                cir._enc_pidx.extend(g.pidx)
        cir.wires_condition = list(self.wires_condition)
        if encode:
            cir.npara = self.npara
            cir.ndata = self.ndata
        else:
            cir.npara = self.npara + self.ndata
            cir.ndata = 0
        return cir

    def __add__(self, rhs: 'QubitCircuit') -> 'QubitCircuit':
        assert self.nqubit == rhs.nqubit
        cir = QubitCircuit(nqubit=self.nqubit, init_state=self.init_state, name=self.name,
                           den_mat=self.den_mat, reupload=self.reupload, mps=self.mps, chi=self.chi)
        cir.add(self)
        cir.add(rhs)
        cir.observables = list(rhs.observables)
        return cir

    # ------------------------------------------------------------- gate sugar
    def u3(self, wires, inputs=None, controls=None, condition=False, encode=False):
        self.add_gate('U3Gate', wires, controls, inputs, encode, condition)

    def cu(self, control, target, inputs=None, encode=False):
        self.add_gate('U3Gate', target, control, inputs, encode)

    def p(self, wires, inputs=None, controls=None, condition=False, encode=False):
        self.add_gate('PhaseShift', wires, controls, inputs, encode, condition)

    def cp(self, control, target, inputs=None, encode=False):
        self.add_gate('PhaseShift', target, control, inputs, encode)

    def x(self, wires, controls=None, condition=False):
        self.add_gate('PauliX', wires, controls, condition=condition)

    def y(self, wires, controls=None, condition=False):
        self.add_gate('PauliY', wires, controls, condition=condition)

    def z(self, wires, controls=None, condition=False):
        self.add_gate('PauliZ', wires, controls, condition=condition)

    def h(self, wires, controls=None, condition=False):
        self.add_gate('Hadamard', wires, controls, condition=condition)

    def s(self, wires, controls=None, condition=False):
        self.add_gate('SGate', wires, controls, condition=condition)

    def sdg(self, wires, controls=None, condition=False):
        self.add_gate('SDaggerGate', wires, controls, condition=condition)

    def t(self, wires, controls=None, condition=False):
        self.add_gate('TGate', wires, controls, condition=condition)

    def tdg(self, wires, controls=None, condition=False):
        self.add_gate('TDaggerGate', wires, controls, condition=condition)

    def ch(self, control, target):
        self.add_gate('Hadamard', target, control)

    def cs(self, control, target):
        self.add_gate('SGate', target, control)

    def csdg(self, control, target):
        self.add_gate('SDaggerGate', target, control)

    def ct(self, control, target):
        self.add_gate('TGate', target, control)

    def ctdg(self, control, target):
        self.add_gate('TDaggerGate', target, control)

    def rx(self, wires, inputs=None, controls=None, condition=False, encode=False):
        self.add_gate('Rx', wires, controls, inputs, encode, condition)

    def ry(self, wires, inputs=None, controls=None, condition=False, encode=False):
        self.add_gate('Ry', wires, controls, inputs, encode, condition)

    def rz(self, wires, inputs=None, controls=None, condition=False, encode=False):
        self.add_gate('Rz', wires, controls, inputs, encode, condition)

    def crx(self, control, target, inputs=None, encode=False):
        self.add_gate('Rx', target, control, inputs, encode)

    def cry(self, control, target, inputs=None, encode=False):
        self.add_gate('Ry', target, control, inputs, encode)

    def crz(self, control, target, inputs=None, encode=False):
        self.add_gate('Rz', target, control, inputs, encode)

    def j(self, wires, inputs=None, plane='xy', controls=None, condition=False, encode=False):
        self.add_gate('ProjectionJ', wires, controls, inputs, encode, condition,
                      matrix_fn=lambda p, _pl=plane: G.projection_j_matrix(p[0], _pl),
                      npara=1, extra={'plane': plane})

    def cnot(self, control, target):
        self.add_gate('CNOT', [control, target])

    def cx(self, control, target):
        self.add_gate('PauliX', target, control)

    def cy(self, control, target):
        self.add_gate('PauliY', target, control)

    def cz(self, control, target):
        self.add_gate('PauliZ', target, control)

    def swap(self, wires, controls=None, condition=False):
        self.add_gate('Swap', wires, controls, condition=condition)

    def iswap(self, wires, controls=None, condition=False):
        self.add_gate('ImaginarySwap', wires, controls, condition=condition)

    def rxx(self, wires, inputs=None, controls=None, condition=False, encode=False):
        self.add_gate('Rxx', wires, controls, inputs, encode, condition)

    def ryy(self, wires, inputs=None, controls=None, condition=False, encode=False):
        self.add_gate('Ryy', wires, controls, inputs, encode, condition)

    def rzz(self, wires, inputs=None, controls=None, condition=False, encode=False):
        self.add_gate('Rzz', wires, controls, inputs, encode, condition)

    def rxy(self, wires, inputs=None, controls=None, condition=False, encode=False):
        self.add_gate('Rxy', wires, controls, inputs, encode, condition)

    def rbs(self, wires, inputs=None, controls=None, condition=False, encode=False):
        self.add_gate('ReconfigurableBeamSplitter', wires, controls, inputs, encode, condition)

    def crxx(self, control, target1, target2, inputs=None, encode=False):
        self.add_gate('Rxx', [target1, target2], control, inputs, encode)

    def cryy(self, control, target1, target2, inputs=None, encode=False):
        self.add_gate('Ryy', [target1, target2], control, inputs, encode)

    def crzz(self, control, target1, target2, inputs=None, encode=False):
        self.add_gate('Rzz', [target1, target2], control, inputs, encode)

    def crxy(self, control, target1, target2, inputs=None, encode=False):
        self.add_gate('Rxy', [target1, target2], control, inputs, encode)

    def toffoli(self, control1, control2, target):
        self.add_gate('Toffoli', [control1, control2, target])

    def ccx(self, control1, control2, target):
        self.add_gate('PauliX', target, [control1, control2])

    def fredkin(self, control, target1, target2):
        self.add_gate('Fredkin', [control, target1, target2])

    def cswap(self, control, target1, target2):
        self.add_gate('Swap', [target1, target2], control)

    def any(self, unitary, wires=None, minmax=None, controls=None, name='uany'):
        """Arbitrary unitary gate (reference gate.py:2745 UAnyGate)."""
        if wires is None:
            if minmax is None:
                minmax = [0, self.nqubit - 1]
            wires = list(range(minmax[0], minmax[1] + 1))
        unitary = np.asarray(unitary, dtype=cdtype())
        self.add_gate(name, wires, controls, static_matrix=unitary, npara=0)

    def latent(self, wires=None, inputs=None, minmax=None, controls=None, encode=False):
        """Latent gate: polar projection of a latent matrix (reference gate.py:2791)."""
        if wires is None:
            if minmax is None:
                minmax = [0, self.nqubit - 1]
            wires = list(range(minmax[0], minmax[1] + 1))
        wires = _flat_wires(wires)
        dim = 2 ** len(wires)
        if inputs is None:
            inputs = np.random.randn(dim, dim)
        inputs = np.asarray(inputs, dtype=np.float64).reshape(-1)
        self.add_gate('LatentGate', wires, controls, inputs, encode,
                      matrix_fn=lambda p, _d=dim: G.latent_matrix(p.reshape(_d, _d)),
                      npara=dim * dim)

    def hamiltonian(self, hamiltonian, t=None, wires=None, minmax=None, controls=None, encode=False):
        """exp(-i H t) gate (reference gate.py:2867)."""
        if wires is None:
            if minmax is None:
                minmax = [0, self.nqubit - 1]
            wires = list(range(minmax[0], minmax[1] + 1))
        ham = np.asarray(hamiltonian, dtype=cdtype())
        self.add_gate('HamiltonianGate', wires, controls, t, encode,
                      matrix_fn=lambda p, _h=ham: G.hamiltonian_matrix(_h, p[0]),
                      npara=1, extra={'ham': ham})

    def xlayer(self, wires=None):
        for w in self._layer_wires(wires):
            self.x(w)

    def ylayer(self, wires=None):
        for w in self._layer_wires(wires):
            self.y(w)

    def zlayer(self, wires=None):
        for w in self._layer_wires(wires):
            self.z(w)

    def hlayer(self, wires=None):
        for w in self._layer_wires(wires):
            self.h(w)

    def rxlayer(self, wires=None, inputs=None, encode=False):
        self._rot_layer('rx', wires, inputs, encode)

    def rylayer(self, wires=None, inputs=None, encode=False):
        self._rot_layer('ry', wires, inputs, encode)

    def rzlayer(self, wires=None, inputs=None, encode=False):
        self._rot_layer('rz', wires, inputs, encode)

    def u3layer(self, wires=None, inputs=None, encode=False):
        ws = self._layer_wires(wires)
        for i, w in enumerate(ws):
            ins = None if inputs is None else jnp.asarray(inputs).reshape(-1)[3 * i:3 * i + 3]
            self.u3(w, ins, encode=encode)

    def cxlayer(self, wires=None):
        if wires is None:
            wires = [[i, i + 1] for i in range(0, self.nqubit - 1, 2)]
        for c, t in wires:
            self.cx(c, t)

    def cnot_ring(self, minmax=None, step: int = 1, reverse: bool = False):
        """Ring of CNOTs (reference layer.py:446 CnotRing)."""
        if minmax is None:
            minmax = [0, self.nqubit - 1]
        wires = list(range(minmax[0], minmax[1] + 1))
        nw = len(wires)
        if reverse:
            pairs = [(wires[(i + step) % nw], wires[i]) for i in reversed(range(nw))]
        else:
            pairs = [(wires[i], wires[(i + step) % nw]) for i in range(nw)]
        for c, t in pairs:
            self.cnot(c, t)

    def _layer_wires(self, wires):
        if wires is None:
            return list(range(self.nqubit))
        return _flat_wires(wires)

    def _rot_layer(self, kind, wires, inputs, encode):
        ws = self._layer_wires(wires)
        for i, w in enumerate(ws):
            ins = None if inputs is None else jnp.asarray(inputs).reshape(-1)[i:i + 1]
            getattr(self, kind)(w, ins, encode=encode)

    # channels (density matrix only)
    def bit_flip(self, wires, inputs=None, encode=False):
        self._add_channel('BitFlip', wires, inputs, encode)

    def phase_flip(self, wires, inputs=None, encode=False):
        self._add_channel('PhaseFlip', wires, inputs, encode)

    def depolarizing(self, wires, inputs=None, encode=False):
        self._add_channel('Depolarizing', wires, inputs, encode)

    def pauli(self, wires, inputs=None, encode=False):
        self._add_channel('Pauli', wires, inputs, encode)

    def amp_damp(self, wires, inputs=None, encode=False):
        self._add_channel('AmplitudeDamping', wires, inputs, encode)

    def phase_damp(self, wires, inputs=None, encode=False):
        self._add_channel('PhaseDamping', wires, inputs, encode)

    def gen_amp_damp(self, wires, inputs=None, encode=False):
        self._add_channel('GeneralizedAmplitudeDamping', wires, inputs, encode)

    def _add_channel(self, name, wires, inputs, encode):
        assert self.den_mat, 'Channels act on density matrices; build the circuit with den_mat=True'
        from .channel import CHANNEL_REGISTRY
        reg = CHANNEL_REGISTRY[name]
        npara = reg['npara']
        wires = tuple(_flat_wires(wires))
        if inputs is None:
            values = [float(np.random.rand() * np.pi) for _ in range(npara)]
        else:
            values = np.asarray(inputs, dtype=np.float64).reshape(-1)
        pidx = self._new_params(values, encode, requires_grad=False)
        op = GateOp(name=name, wires=wires, matrix_fn=reg['fn'], pidx=pidx,
                    npara=npara, kind='channel', requires_grad=False)
        self.operators.append(op)
        if encode:
            self.encoders.append(op)
            self._enc_pidx.extend(pidx)
            self.ndata += npara
        else:
            self.npara += npara
        self._version += 1
        self._cache.clear()

    def barrier(self, wires=None):
        wires = self._layer_wires(wires)
        op = GateOp(name='Barrier', wires=tuple(wires), kind='barrier')
        self.operators.append(op)
        self._version += 1
        self._cache.clear()

    def reset(self, wires=None, postselect: int | None = 0):
        """Reset wires to |0> with postselection (reference gate.py:3027)."""
        wires = self._layer_wires(wires)
        assert postselect in (0, 1), 'vmap-compatible reset requires postselect 0 or 1'
        op = GateOp(name='Reset', wires=tuple(wires), kind='reset',
                    extra={'postselect': postselect})
        self.operators.append(op)
        self._version += 1
        self._cache.clear()

    def move(self, wire1: int, wire2: int, postselect: int | None = 0):
        """Reset wire2 then swap (reference gate.py:3141 Move)."""
        op = GateOp(name='Move', wires=(wire1, wire2), kind='move',
                    extra={'postselect': postselect})
        self.operators.append(op)
        self._version += 1
        self._cache.clear()

    def cut(self, wires):
        for w in _flat_wires(wires):
            op = GateOp(name='WireCut', wires=(w,), kind='cut')
            self._cut_lst.append((len(self.operators), w))
            self.operators.append(op)
        self._version += 1
        self._cache.clear()

    def pattern(self):
        """Transpile the circuit to an MBQC pattern (reference circuit.py:653).

        Each supported gate expands to its command template; a wire->node map
        tracks the logical wire as measurements consume nodes.
        """
        assert not self.den_mat and not self.mps, 'Currently NOT supported'
        from .mbqc import Pattern
        from .mbqc.templates import MBQC_TEMPLATES

        wire2node = {i: i for i in range(self.nqubit)}
        init = np.asarray(self.init_state.state).reshape(-1)
        zeros = np.zeros_like(init)
        zeros[0] = 1
        if np.allclose(init, zeros):
            pattern = Pattern()
            for i in range(self.nqubit):
                pattern.add_graph(nodes_state=[i], state='zero')
        else:
            pattern = Pattern(nodes_state=self.nqubit, state=init)
        pattern.reupload = self.reupload
        node_next = self.nqubit
        for op in self.operators:
            if op.kind == 'barrier':
                continue
            assert op.kind == 'gate', f'{op.name} is NOT supported for MBQC pattern transpiler'
            assert not op.controls, 'Control bits are NOT supported for MBQC pattern transpiler'
            assert not op.condition, 'Conditional mode is NOT supported for MBQC pattern transpiler'
            entry = MBQC_TEMPLATES.get(op.name)
            assert entry is not None, f'{op.name} is NOT supported for MBQC pattern transpiler'
            template, nanc = entry
            nodes = [wire2node[w] for w in op.wires]
            ancilla = [node_next + i for i in range(nanc)]
            angle = self._pvals[op.pidx[0]] if op.npara else None
            if op.inv and angle is not None:
                angle = -angle
            encode = op in self.encoders
            cmds, out_nodes, enc_idx = template(nodes if len(nodes) > 1 else nodes[0],
                                                ancilla, angle, op.requires_grad)
            base = len(pattern.commands)
            pattern.commands.extend(cmds)
            if encode:
                for i in enc_idx:
                    pattern.encoders.append(pattern.commands[base + i])
                pattern.npara += nanc - len(enc_idx)
                pattern.ndata += len(enc_idx)
            else:
                pattern.npara += nanc
            node_next += nanc
            for wire, node in zip(op.wires, out_nodes):
                wire2node[wire] = node
        pattern.set_nodes_out_seq([wire2node[i] for i in range(self.nqubit)])
        return pattern

    def draw(self, output: str = 'text', **kwargs):
        """Draw the circuit (text-based; the reference uses qiskit, circuit.py:815)."""
        from .draw import draw_circuit_text
        text = draw_circuit_text(self)
        if output in ('text', 'mpl'):
            print(text)
        return text

    def get_subexperiments(self, qubit_labels=None):
        """Cutting subexperiments + quasiprobability coefficients (reference circuit.py:748)."""
        from .cutting import get_subexperiments
        return get_subexperiments(self, qubit_labels)

    def qasm(self) -> str:
        from .qasm import cir_to_qasm2
        return cir_to_qasm2(self)

    def qasm3(self) -> str:
        from .qasm import cir_to_qasm3
        return cir_to_qasm3(self)
