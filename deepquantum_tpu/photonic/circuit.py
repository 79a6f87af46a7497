"""QumodeCircuit: the photonic circuit API (Fock / Gaussian / Bosonic backends).

TPU-native redesign of reference src/deepquantum/photonic/circuit.py:77-2860.
Like the qubit stack, a circuit is an IR of gate descriptors plus a flat
parameter vector; each backend is a pure jitted program:

- Fock basis mode: final amplitudes as ONE dense vector over a static basis
  table (vmapped permanents on the MXU) — the reference's dict-of-FockState is
  kept as a host-side view (reference circuit.py:375-403 builds dicts inside
  the hot loop, which cannot jit).
- Fock tensor mode: (cutoff,)*nmode state evolution reusing the qudit
  evolve_state kernel.
- Gaussian/Bosonic: affine symplectic folds on (cov, mean[, weight]).
"""

from __future__ import annotations

import copy as _copy
import itertools
from collections import defaultdict
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from ..config import cdtype, rdtype
from ..ops.apply import evolve_den_mat, evolve_state
from . import gates as PG
from .gates import PHOTONIC_REGISTRY, passive_xp_from_unitary, uany_fock_np
from .qmath import (
    fock_combinations,
    ladder_to_quadrature,
    permanent,
    permanent_batch,
    photon_number_mean_var,
    quadrature_to_ladder,
    sub_matrix,
    xpxp_to_xxpp,
    xxpp_to_xpxp,
)
from .state import BosonicState, FockState, GaussianState

__all__ = ['QumodeCircuit', 'PhotonicOp']


def _eager() -> bool:
    try:
        return type(jax.core.trace_ctx.trace).__name__ == 'EvalTrace'
    except AttributeError:
        return True


def _delay_subgates(op, wire1: int, wire2: int) -> list:
    """Expand a delay descriptor into its loop sub-gates on concurrent modes.

    DelayBS (reference photonic/gate.py:2486) couples the delay line into the
    spatial mode with BeamSplitterTheta — i.e. BS(theta, phi=pi/2) — and then
    rotates the DELAY mode with PhaseShift(phi); DelayMZI (reference
    gate.py:2573) is one MZI with ``phi_first=False``. wire1 = delay-line
    mode, wire2 = spatial mode (reference circuit.py:726-748).
    """
    conv = op.extra['convention']
    if conv == 'bs':
        def fn_bs(p):
            return PG.bs_unitary(jnp.stack([p[0], jnp.asarray(np.pi / 2, rdtype())]))
        bs = PhotonicOp(op.name, [wire1, wire2], op.pidx[:1], 1, 'gate',
                        unitary_fn=fn_bs,
                        xp_fn=lambda p, _f=fn_bs: passive_xp_from_unitary(_f(p)),
                        fock_fn=lambda p, c, _f=fn_bs: PG.bs_fock_from_unitary(_f(p), c))
        ps = PhotonicOp(op.name + '_ps', [wire1], op.pidx[1:2], 1, 'gate',
                        unitary_fn=PG.ps_unitary, xp_fn=PG.ps_xp, fock_fn=PG.ps_fock)
        return [bs, ps]

    def fn_mzi(p):
        return PG.mzi_unitary(p, phi_first=False)
    mzi = PhotonicOp(op.name, [wire1, wire2], op.pidx, 2, 'gate',
                     unitary_fn=fn_mzi,
                     xp_fn=lambda p, _f=fn_mzi: passive_xp_from_unitary(_f(p)),
                     fock_fn=lambda p, c, _f=fn_mzi: PG.bs_fock_from_unitary(_f(p), c))
    return [mzi]


class PhotonicOp:
    """One photonic operation in the IR."""

    def __init__(self, name, wires, pidx=(), npara=0, kind='gate',
                 unitary_fn=None, xp_fn=None, fock_fn=None,
                 static_unitary=None, extra=None):
        self.name = name
        self.wires = tuple(wires)
        self.pidx = tuple(pidx)
        self.npara = npara
        self.kind = kind
        self.unitary_fn = unitary_fn
        self.xp_fn = xp_fn
        self.fock_fn = fock_fn
        self.static_unitary = static_unitary
        self.extra = extra or {}

    def params(self, full):
        if not self.npara:
            return None
        return full[jnp.array(self.pidx, jnp.int32)]

    def unitary(self, full):
        """k x k creation-op unitary (passive gates)."""
        if self.static_unitary is not None:
            return np.asarray(self.static_unitary, dtype=cdtype())
        assert self.unitary_fn is not None, f'{self.name} is not a passive linear-optical gate'
        return self.unitary_fn(self.params(full))

    def xp(self, full):
        assert self.xp_fn is not None, f'{self.name} has no symplectic representation'
        return self.xp_fn(self.params(full))

    def fock(self, full, cutoff):
        if 'static_fock' in self.extra:
            return self.extra['static_fock']
        assert self.fock_fn is not None, f'{self.name} has no Fock representation'
        return self.fock_fn(self.params(full), cutoff)


class _CVStateView:
    """Light wrapper over already-built (cov, mean[, weight]) arrays."""

    def __init__(self, cov, mean, weight=None):
        self.cov = cov
        self.mean = mean
        # numpy: eager creation of a complex device constant is an
        # UNIMPLEMENTED host->device transfer on some TPU attachment paths
        self.weight = weight if weight is not None else np.ones(1, complex)


class QumodeCircuit:
    """Photonic quantum circuit (API mirrors reference photonic/circuit.py:77).

    Args:
        nmode: number of modes.
        init_state: Fock basis ints / dense tensor / 'vac' / [cov, mean] / state object.
        cutoff: Fock truncation.
        backend: 'fock' | 'gaussian' | 'bosonic'.
        basis: Fock-basis mode (permanent-based) vs tensor mode.
        detector: 'pnrd' | 'threshold' (Gaussian probabilities).
        den_mat: density-matrix Fock simulation.
        noise / mu / sigma: Gaussian parameter noise. By default sampled once
            at build time; with ``noise_per_forward=True`` fresh jitter is
            sampled on EVERY forward instead, matching the reference's
            ``init_para`` semantics (reference photonic/gate.py:326-330,
            where encode/forward re-converts parameters and re-samples).
        noise_per_forward: sample the Gaussian jitter per forward call. Pass
            ``noise_key=jax.random.key(...)`` to forward() for traced,
            jit-stable sampling; without a key the jitter is drawn host-side
            per call (stateful like torch — a user-jitted closure would
            freeze it, so pass a key when jitting).
    """

    def __init__(self, nmode: int, init_state: Any = None, cutoff: int | None = None,
                 backend: str = 'fock', basis: bool = True, detector: str = 'pnrd',
                 name: str | None = None, den_mat: bool = False, mps: bool = False,
                 chi: int | None = None, noise: bool = False, mu: float = 0,
                 sigma: float = 0.1, noise_per_forward: bool = False) -> None:
        self.nmode = nmode
        self.backend = backend
        self.basis = basis if backend == 'fock' else False
        self.detector = detector.lower()
        self.name = name
        self.den_mat = den_mat
        self.mps = mps
        self.chi = chi
        self.noise = noise
        self.mu = mu
        self.sigma = sigma
        self.noise_per_forward = noise_per_forward
        self._noise_pidx: list[int] = []
        self.operators: list[PhotonicOp] = []
        self.encoders: list[PhotonicOp] = []
        self._pvals: list[float] = []
        self._train_mask: list[bool] = []
        self._enc_pidx: list[int] = []
        self.npara = 0
        self.ndata = 0
        self.state = None
        self._basis_table = None   # list of FockState int tuples for basis mode output
        self._custom_out_basis = None  # user override via set_fock_basis
        self._version = 0
        self._cache: dict = {}
        self.measurements: list = []
        self.wires_homodyne: list = []
        self._bosonic_states = None  # per-mode Bosonic initial states (cat/gkp sugar)
        # TDM bookkeeping (reference photonic/circuit.py:145-161)
        self._with_delay = False
        self._nmode_tdm = nmode
        self._ntau_dict = defaultdict(list)
        self._unroll_dict = None
        self._operators_tdm = None
        self._measurements_tdm = None
        if cutoff is None:
            cutoff = 2 if backend == 'fock' else 5
        self.cutoff = cutoff
        self.set_init_state(init_state)

    # ---------------------------------------------------------------- state
    def set_init_state(self, init_state: Any) -> None:
        if self.backend == 'fock':
            if init_state is None:
                init_state = [0] * self.nmode
            if self.mps:
                from ..mps import MatrixProductState
                assert not self.basis, 'MPS requires basis=False'
                if isinstance(init_state, MatrixProductState):
                    self.init_state = init_state
                    self.chi = init_state.chi
                else:
                    ints = list(np.asarray(init_state, np.int64).reshape(-1))
                    self.init_state = MatrixProductState(nsite=self.nmode, state=ints,
                                                         chi=self.chi, qudit=self.cutoff)
                    self.chi = self.init_state.chi
                return
            if isinstance(init_state, FockState):
                self.init_state = init_state
            else:
                self.init_state = FockState(init_state, self.nmode, self.cutoff,
                                            self.basis, self.den_mat)
            self.cutoff = self.init_state.cutoff
        elif self.backend == 'gaussian':
            if init_state is None:
                init_state = 'vac'
            if isinstance(init_state, GaussianState):
                self.init_state = init_state
            else:
                self.init_state = GaussianState(init_state, self.nmode, self.cutoff)
        elif self.backend == 'bosonic':
            if init_state is None:
                init_state = 'vac'
            if isinstance(init_state, BosonicState):
                self.init_state = init_state
            else:
                self.init_state = BosonicState(init_state, self.nmode, self.cutoff)
        else:
            raise ValueError(f'Unknown backend {self.backend}')

    # ---------------------------------------------------------- parameters
    @property
    def params(self) -> jnp.ndarray:
        idx = [i for i, t in enumerate(self._train_mask) if t]
        return jnp.asarray(np.asarray(self._pvals, np.float64)[idx], dtype=rdtype())

    @params.setter
    def params(self, values) -> None:
        idx = [i for i, t in enumerate(self._train_mask) if t]
        values = np.asarray(values, np.float64).reshape(-1)
        for i, v in zip(idx, values):
            self._pvals[i] = float(v)

    def _full_params(self, params=None, data=None, data_idx=None, jitter=None) -> jnp.ndarray:
        full = jnp.asarray(np.asarray(self._pvals, np.float64), dtype=rdtype())
        if params is not None:
            ti = [i for i, t in enumerate(self._train_mask) if t]
            full = full.at[jnp.array(ti, jnp.int32)].set(jnp.asarray(params, rdtype()).reshape(-1))
        if data is not None and self._enc_pidx:
            data = jnp.asarray(data, rdtype()).reshape(-1)
            full = full.at[jnp.array(self._enc_pidx, jnp.int32)].set(data[jnp.array(data_idx, jnp.int32)])
        if jitter is not None:
            # per-forward noise (applied AFTER params/data, like the
            # reference's inputs_to_tensor which jitters the final values)
            full = full + jitter
        return full

    def _data_indices(self, data_len: int) -> list[int]:
        assert data_len >= self.ndata, 'The circuit needs more data'
        return list(range(self.ndata))

    def _new_params(self, values, encode, requires_grad):
        start = len(self._pvals)
        if self.noise:
            if self.noise_per_forward:
                self._noise_pidx.extend(range(start, start + len(values)))
            else:
                values = [v + np.random.normal(self.mu, self.sigma) for v in values]
        idx = tuple(range(start, start + len(values)))
        self._pvals.extend(float(v) for v in values)
        self._train_mask.extend([requires_grad and not encode] * len(values))
        return idx

    def _noise_jitter(self, key=None):
        """Fresh per-forward Gaussian jitter over the noisy parameter slots
        (None when per-forward noise is off). With a PRNG key the jitter is
        traced (jit-stable); without one it is drawn host-side per call,
        matching the reference's stateful torch.normal."""
        if not (self.noise and self.noise_per_forward and self._noise_pidx):
            return None
        pidx = np.asarray(self._noise_pidx, np.int32)
        n = len(self._pvals)
        if key is None:
            vec = np.zeros(n, np.float64)
            vec[pidx] = np.random.normal(self.mu, self.sigma, len(pidx))
            return jnp.asarray(vec, rdtype())
        eps = self.mu + self.sigma * jax.random.normal(key, (len(pidx),), rdtype())
        return jnp.zeros(n, rdtype()).at[pidx].add(eps)

    # ------------------------------------------------------------------ add
    def add_op(self, name: str, wires, inputs=None, encode=False, requires_grad=None,
               unitary_fn=None, xp_fn=None, fock_fn=None, npara=None,
               static_unitary=None, kind='gate', extra=None) -> PhotonicOp:
        wires = [wires] if isinstance(wires, int) else list(wires)
        reg = PHOTONIC_REGISTRY.get(name)
        if unitary_fn is None and fock_fn is None and xp_fn is None and static_unitary is None:
            assert reg is not None, f'Unknown photonic gate {name}'
            unitary_fn, xp_fn, fock_fn = reg['unitary'], reg['xp'], reg['fock']
            npara = reg['npara']
        npara = npara or 0
        if requires_grad is None:
            requires_grad = inputs is None and npara > 0 and not encode
        if npara:
            if inputs is None:
                values = [float(np.random.rand() * 2 * np.pi) for _ in range(npara)]
            else:
                values = list(np.asarray(inputs, np.float64).reshape(-1))
                assert len(values) == npara
            pidx = self._new_params(values, encode, requires_grad)
        else:
            pidx = ()
        op = PhotonicOp(name, wires, pidx, npara, kind, unitary_fn, xp_fn, fock_fn,
                        static_unitary, extra)
        self.operators.append(op)
        if encode:
            self.encoders.append(op)
            self._enc_pidx.extend(pidx)
            self.ndata += npara
        else:
            self.npara += npara
        self._version += 1
        self._cache.clear()
        self._basis_table = None
        return op

    def add(self, op, encode: bool = False, wires=None) -> None:
        if isinstance(op, QumodeCircuit):
            assert self.nmode == op.nmode
            offset = len(self._pvals)
            self._pvals.extend(op._pvals)
            self._train_mask.extend(op._train_mask)
            # the sub-circuit's per-forward-noise slots keep jittering after
            # composition (reference: noise lives on the gate objects)
            self._noise_pidx.extend(i + offset for i in op._noise_pidx)
            for g in op.operators:
                g2 = _copy.copy(g)
                g2.pidx = tuple(i + offset for i in g.pidx)
                self.operators.append(g2)
                if g in op.encoders:
                    self.encoders.append(g2)
                    self._enc_pidx.extend(g2.pidx)
            self.npara += op.npara
            self.ndata += op.ndata
            self._version += 1
            self._cache.clear()
            self._basis_table = None
            return
        assert isinstance(op, PhotonicOp)
        shared = op.npara > 0 and op.extra.get('_owner') is self and bool(op.pidx)
        if op.npara > 0 and not shared:
            # standalone class-style descriptor: register its values in the
            # flat vector ON the original op, so re-adding shares parameters
            # (torch shared-module semantics, reference circuit.py:830)
            values = op.extra.get('inputs')
            if values is None:
                values = [float(np.random.rand() * 2 * np.pi) for _ in range(op.npara)]
            op.pidx = self._new_params(list(values), encode,
                                       op.extra.get('requires_grad', False))
            op.extra['_owner'] = self
        if wires is not None:
            op = _copy.copy(op)
            op.wires = tuple([wires] if isinstance(wires, int) else wires)
        self.operators.append(op)
        if shared:
            pass  # parameters already counted on first registration
        elif encode:
            self.encoders.append(op)
            self._enc_pidx.extend(op.pidx)
            self.ndata += op.npara
        else:
            self.npara += op.npara
        if op.kind == 'delay':
            wire = op.wires[0]
            ntau = op.extra['ntau']
            self._with_delay = True
            self._ntau_dict[wire].append(ntau)
            self._nmode_tdm += ntau
            self._unroll_dict = None
            self._operators_tdm = None
            self._measurements_tdm = None
        self._version += 1
        self._cache.clear()
        self._basis_table = None

    # ----------------------------------------------------------- global ops
    def get_unitary(self, params=None, data=None, jitter=None) -> jnp.ndarray:
        """Global nmode x nmode creation-op unitary (reference circuit.py:868)."""
        didx = None if data is None else self._data_indices(np.shape(data)[-1])
        full = self._full_params(params, data, didx, jitter)
        return self._get_unitary_traced(full)

    def _get_unitary_traced(self, full) -> jnp.ndarray:
        u = jnp.eye(self.nmode, dtype=cdtype())
        for op in self.operators:
            if op.kind != 'gate':
                continue
            mat = op.unitary(full)
            ix = np.ix_(op.wires, op.wires)
            u_op = jnp.eye(self.nmode, dtype=cdtype()).at[ix].set(jnp.asarray(mat, cdtype()))
            u = u_op @ u
        return u

    def get_symplectic(self, params=None) -> jnp.ndarray:
        """Global symplectic matrix in xxpp (reference circuit.py:907).

        TDM circuits report the symplectic of one unrolled step over the
        concurrent modes (delay loops included)."""
        full = self._full_params(params)
        if self._with_delay:
            self._prepare_unroll_dict()
            self._unroll_circuit()
            operators, n = self._operators_tdm, self._nmode_tdm
        else:
            operators, n = self.operators, self.nmode
        s = jnp.eye(2 * n, dtype=rdtype())
        for op in operators:
            if op.kind != 'gate':
                continue
            s = self._global_xp(op, full, n)[0] @ s
        return s

    def _global_xp(self, op: PhotonicOp, full, nmode: int | None = None):
        if nmode is None:
            nmode = self._nmode_tdm if self._with_delay else self.nmode
        if op.xp_fn is None and (op.unitary_fn is not None or op.static_unitary is not None):
            m, v = passive_xp_from_unitary(jnp.asarray(op.unitary(full)))
        else:
            m, v = op.xp(full)
        wires = list(op.wires) + [w + nmode for w in op.wires]
        ix = np.ix_(wires, wires)
        s = jnp.eye(2 * nmode, dtype=rdtype()).at[ix].set(m.astype(rdtype()))
        d = jnp.zeros((2 * nmode, 1), rdtype()).at[np.asarray(wires)].set(v.astype(rdtype()))
        return s, d

    def get_displacement(self, init_mean, params=None) -> jnp.ndarray:
        """Final mean vector after all ops (reference circuit.py:924)."""
        full = self._full_params(params)
        mean = jnp.asarray(init_mean, rdtype())
        if self._with_delay:
            self._prepare_unroll_dict()
            self._unroll_circuit()
            operators, n = self._operators_tdm, self._nmode_tdm
        else:
            operators, n = self.operators, self.nmode
        for op in operators:
            if op.kind != 'gate':
                continue
            s, d = self._global_xp(op, full, n)
            mean = s @ mean + d
        return mean

    # --------------------------------------------------------------- forward
    def __call__(self, data=None, state=None, is_prob=None, detector=None,
                 sort=True, stepwise=False, params=None, noise_key=None):
        return self.forward(data, state, is_prob, detector, sort, stepwise,
                            params, noise_key)

    def forward(self, data=None, state=None, is_prob=None, detector=None,
                sort=True, stepwise=False, params=None, noise_key=None):
        jitter = self._noise_jitter(noise_key)
        if self.backend == 'fock':
            return self._forward_fock(data, state, is_prob, sort, params, jitter)
        return self._forward_cv(data, state, is_prob, detector, params, jitter)

    # Fock-basis helpers ----------------------------------------------------
    def _basis_input(self, state) -> np.ndarray:
        if state is None:
            state = self.init_state
        if isinstance(state, FockState):
            state = state.state
        return np.asarray(state, dtype=np.int64)

    def _output_basis(self, in_state: np.ndarray) -> list:
        if self._custom_out_basis is not None:
            return list(self._custom_out_basis)
        nphoton = int(np.sum(in_state))
        return [tuple(s) for s in fock_combinations(self.nmode, nphoton, self.cutoff)]

    def set_fock_basis(self, state=None, reset_in_forward: bool = False) -> None:
        """Override the output Fock basis states (reference circuit.py:604);
        ``None`` restores the default (all states with the input photon number)."""
        if state is None:
            self._custom_out_basis = None
        else:
            rows = np.asarray([s.state if isinstance(s, FockState) else s for s in state],
                              dtype=np.int64).reshape(-1, self.nmode)
            self._custom_out_basis = [tuple(int(v) for v in r) for r in rows]
        self._basis_table = None
        self._version += 1
        self._cache.clear()

    def get_fock_basis(self) -> np.ndarray:
        """Current output Fock basis states (reference circuit.py:632)."""
        if self._custom_out_basis is not None:
            return np.asarray(self._custom_out_basis, dtype=np.int64)
        return np.asarray(self._output_basis(self._basis_input(None)), dtype=np.int64)

    def tensor_rep(self, x) -> jnp.ndarray:
        """State as a (batch, cutoff, ..., cutoff) tensor (reference photonic/operation.py)."""
        n = self.nmode
        return jnp.asarray(x).reshape([-1] + [self.cutoff] * (2 * n if self.den_mat else n))

    def encode(self, data) -> None:
        """Write data into the stored encoder parameter values (stateful
        parity API, reference circuit.py:265; the functional path passes data
        to forward() instead)."""
        if data is None:
            return
        data = np.asarray(data, dtype=np.float64).reshape(-1)
        assert len(data) >= self.ndata, 'The circuit needs more data'
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

    def global_circuit(self, nstep: int) -> 'QumodeCircuit':
        """Unrolled spatial circuit over nstep TDM time steps
        (reference circuit.py:762). The initial state is always vacuum;
        trainable parameters are shared across steps, encoders are fresh per
        step (matching the reference's copy-vs-deepcopy semantics)."""
        self._prepare_unroll_dict()
        nmode = self._nmode_tdm + (nstep - 1) * self.nmode
        cir = QumodeCircuit(nmode, init_state='vac', cutoff=self.cutoff,
                            backend=self.backend, basis=self.basis,
                            den_mat=self.den_mat, detector=self.detector,
                            name=self.name, mps=self.mps, chi=self.chi)

        def proto_of(op):
            """Per-op list of proto gates (delay ops expand to sub-gates) with
            their host-side parameter values stashed for re-registration."""
            if op.kind == 'delay':
                subs = _delay_subgates(op, 0, 1)
                out = []
                for sub in subs:
                    vals = [self._pvals[j] for j in sub.pidx]
                    sub.pidx = ()
                    sub.extra = dict(op.extra)
                    sub.extra.pop('_owner', None)
                    sub.extra['inputs'] = vals
                    out.append(sub)
                return out
            g = _copy.copy(op)
            g.pidx = ()
            g.extra = dict(op.extra)
            g.extra.pop('_owner', None)
            g.extra['inputs'] = [self._pvals[j] for j in op.pidx]
            return [g]

        protos = {id(op): proto_of(op) for op in self.operators
                  if op not in self.encoders}
        for i in range(nstep):
            ndelay = np.zeros(self.nmode, np.int64)
            for op in self.operators:
                encode = op in self.encoders
                # shared across steps unless an encoder (fresh data per step)
                gs = proto_of(op) if encode else protos[id(op)]
                if op.kind == 'delay':
                    wire = op.wires[0]
                    ndelay[wire] += 1
                    idx_delay = -int(ndelay[wire]) - 1
                    ntau = op.extra['ntau']
                    wire1 = self._unroll_dict[wire][idx_delay][i % ntau]
                    wire2 = (self._unroll_dict[wire][-1] if i == 0
                             else self._nmode_tdm + self.nmode * (i - 1) + wire)
                    wire_lists = [[wire1, wire2]] + [[wire1]] * (len(gs) - 1)
                else:
                    wires = ([self._unroll_dict[w][-1] for w in op.wires] if i == 0
                             else [self._nmode_tdm + self.nmode * (i - 1) + w
                                   for w in op.wires])
                    wire_lists = [wires]
                for g, ws in zip(gs, wire_lists):
                    cir.add(g, encode=encode, wires=ws)
            for op_m in self.measurements:
                m2 = _copy.copy(op_m)
                m2.nmode = nmode
                m2.wires = ([self._unroll_dict[w][-1] for w in op_m.wires] if i == 0
                            else [self._nmode_tdm + self.nmode * (i - 1) + w
                                  for w in op_m.wires])
                cir.measurements.append(m2)
        return cir

    def _forward_fock(self, data, state, is_prob, sort, params=None, jitter=None):
        if not self.basis:
            return self._forward_fock_tensor(data, state, is_prob, params, jitter)
        in_state = self._basis_input(state)
        if in_state.ndim == 2:
            # batched basis inputs: host loop over rows (reference vmaps the
            # same helper, circuit.py:341-368); outputs merge per state
            outs = [self._forward_fock(data, row, is_prob, sort, params, jitter)
                    for row in in_state]
            self.state = outs
            return outs
        if is_prob is None and data is None and params is None and jitter is None:
            self.state = self.get_unitary()
            return self.state
        out_basis = self._output_basis(in_state)
        self._basis_table = out_basis
        if is_prob is None:
            self.state = self.get_unitary(params, data, jitter)
            return self.state
        amps = self._fock_basis_amps(data, in_state, out_basis, params, jitter)
        if is_prob:
            vals = jnp.abs(amps) ** 2 if amps.ndim == 1 else jnp.abs(amps) ** 2
        else:
            vals = amps
        out = {}
        batched = vals.ndim == 2
        for i, b in enumerate(out_basis):
            fs = FockState(list(b), self.nmode, self.cutoff, basis=True)
            out[fs] = vals[..., i]
        if sort and is_prob is not None:
            key_fn = (lambda kv: -float(jnp.sum(jnp.abs(kv[1])))) if not batched else \
                     (lambda kv: -float(jnp.sum(jnp.abs(kv[1]))))
            out = dict(sorted(out.items(), key=key_fn))
        self.state = out
        return out

    def _fock_basis_amps(self, data, in_state, out_basis, params=None,
                         jitter=None) -> jnp.ndarray:
        """Dense amplitude vector over the static output-basis table."""
        key = ('fock_amps', self._version, tuple(in_state), tuple(out_basis),
               None if data is None else jnp.shape(data), jitter is None)
        fn = self._cache.get(key)
        if fn is None:
            nphoton = int(np.sum(in_state))
            col_idx = np.repeat(np.arange(self.nmode), in_state)
            row_idx = np.stack([np.repeat(np.arange(self.nmode), b) for b in out_basis])
            from math import factorial
            norms = np.array([
                np.sqrt(np.prod([factorial(int(x)) for x in in_state])
                        * np.prod([factorial(int(x)) for x in b]))
                for b in out_basis])

            def amps_fn(params_, data_, jitter_):
                didx = None if data_ is None else self._data_indices(data_.shape[-1])
                def one(d):
                    full = self._full_params(params_, d, didx, jitter_)
                    u = self._get_unitary_traced(full)
                    sub = u[row_idx[:, :, None], col_idx[None, None, :]]  # (nout, k, k)
                    perms = permanent_batch(sub)   # one Pallas grid on TPU
                    return perms / jnp.asarray(norms, cdtype())
                if data_ is None:
                    return one(None)
                if data_.ndim == 1:
                    return one(data_)
                return jax.vmap(one)(data_)
            fn = jax.jit(amps_fn)
            self._cache[key] = fn
        p = None if params is None else jnp.asarray(params, rdtype())
        return fn(p, data, jitter)

    # Fock-tensor helpers ---------------------------------------------------
    def _forward_fock_tensor(self, data, state, is_prob, params=None, jitter=None):
        if self.mps:
            return self._forward_fock_mps(data, state, params, jitter)
        if state is None:
            state = self.init_state
        if isinstance(state, FockState):
            state = state.state
        state = np.asarray(state) if isinstance(state, (list, np.ndarray)) else state
        if isinstance(state, np.ndarray):
            state = state.astype(cdtype())
            if _eager():
                from ..utils.compat import to_device
                state = to_device(state)
        key = ('fock_tensor', self._version, None if data is None else jnp.shape(data),
               bool(is_prob), jitter is None)
        fn = self._cache.get(key)
        if fn is None:
            def run(params_, data_, state_, jitter_):
                didx = None if data_ is None else self._data_indices(data_.shape[-1])
                def one(d, s):
                    full = self._full_params(params_, d, didx, jitter_)
                    return self._run_fock_tensor(full, s, is_prob)
                if data_ is None:
                    return one(None, state_)
                if data_.ndim == 1:
                    return one(data_, state_)
                return jax.vmap(one, in_axes=(0, None))(data_, state_)
            fn = jax.jit(run)
            self._cache[key] = fn
        p = None if params is None else jnp.asarray(params, rdtype())
        self.state = fn(p, data, state, jitter)
        return self.state

    def _forward_fock_mps(self, data, state, params=None, jitter=None):
        from ..mps import MatrixProductState, apply_gate_mps
        if state is None:
            state = self.init_state
        tensors = state.tensors if isinstance(state, MatrixProductState) else state
        if _eager():
            from ..utils.compat import to_device
            tensors = [to_device(t) if isinstance(t, np.ndarray) else t for t in tensors]
        key = ('fock_mps', self._version, None if data is None else jnp.shape(data),
               jitter is None)
        fn = self._cache.get(key)
        if fn is None:
            def run(params_, data_, tensors_, jitter_):
                didx = None if data_ is None else self._data_indices(data_.shape[-1])
                full = self._full_params(params_, data_, didx, jitter_)
                st = (list(tensors_), -1)
                for op in self.operators:
                    if op.kind != 'gate':
                        continue
                    mat = jnp.asarray(op.fock(full, self.cutoff), cdtype())
                    k = len(op.wires)
                    mat = mat.reshape(self.cutoff ** k, self.cutoff ** k)
                    st = apply_gate_mps(st, mat, sorted(op.wires), self.chi,
                                        normalize=True, qudit=self.cutoff)
                return st[0]
            fn = jax.jit(run)
            self._cache[key] = fn
        p = None if params is None else jnp.asarray(params, rdtype())
        out = fn(p, data, tensors, jitter)
        if _eager():
            from ..utils.compat import normalize_layout
            out = [normalize_layout(t) for t in out]
        self.state = out
        return self.state

    def _run_fock_tensor(self, full, x, is_prob=None):
        c = self.cutoff
        n = self.nmode
        shape = [c] * (2 * n) if self.den_mat else [c] * n
        x = x.reshape(shape)
        for op in self.operators:
            if op.kind == 'loss':
                assert self.den_mat, 'PhotonLoss on Fock tensors requires den_mat=True'
                from .channel import loss_kraus
                kraus = loss_kraus(op.params(full), c)
                def apply_k(kmat, _x=x, _w=list(op.wires)):
                    return evolve_den_mat(_x, kmat, n, _w, qudit=c)
                x = jax.vmap(apply_k)(kraus).sum(0)
                continue
            if op.kind != 'gate':
                continue
            k = len(op.wires)
            mat = op.fock(full, c)
            mat = jnp.asarray(mat, cdtype()).reshape(c ** k, c ** k)
            if self.den_mat:
                x = evolve_den_mat(x, mat, n, list(op.wires), qudit=c)
            else:
                x = evolve_state(x, mat, n, list(op.wires), qudit=c)
        if is_prob:
            if self.den_mat:
                diag = jnp.diagonal(x.reshape(c ** n, c ** n))
                return jnp.abs(diag).reshape([c] * n)
            return jnp.abs(x) ** 2
        return x

    # CV helpers ------------------------------------------------------------
    def _forward_cv(self, data, state, is_prob, detector, params=None, jitter=None):
        if state is None:
            if self.backend == 'bosonic' and self._bosonic_states is not None:
                from .state import combine_bosonic_states
                state = combine_bosonic_states(self._bosonic_states, self.cutoff)
            else:
                state = self.init_state
        elif not isinstance(state, (GaussianState, BosonicState)):
            nmode = self.nmode
            if (isinstance(state, (list, tuple)) and len(state) >= 2
                    and jnp.ndim(state[0]) >= 2
                    and jnp.shape(state[0])[-1] == 2 * self._nmode_tdm):
                nmode = self._nmode_tdm  # TDM feedback state on concurrent modes
            if self.backend == 'gaussian':
                state = GaussianState(state, nmode, self.cutoff) \
                    if isinstance(state, (np.ndarray, str)) or not isinstance(state, (list, tuple)) \
                    else _CVStateView(state[0], state[1])
            else:
                state = BosonicState(state, nmode, self.cutoff) \
                    if isinstance(state, str) else _CVStateView(state[0], state[1],
                                                                state[2] if len(state) > 2 else None)
        # to_device: bosonic mean/weight are complex — ship real/imag pairs
        # (complex host->device transfers are UNIMPLEMENTED on some TPU paths).
        from ..utils.compat import to_device
        cov = jnp.asarray(state.cov, rdtype())
        mean_in = state.mean
        if self.backend == 'bosonic':
            weight = jnp.asarray(to_device(state.weight), cdtype())
            mean = jnp.asarray(to_device(mean_in), cdtype())
        else:
            weight = None
            mean = jnp.asarray(mean_in, rdtype())
        if self._with_delay:
            self._prepare_unroll_dict()
            self._unroll_circuit()
            cov, mean = self._unroll_init_state(cov, mean)
        key = ('cv', self._version, None if data is None else jnp.shape(data),
               jnp.shape(cov), self.backend, jitter is None)
        fn = self._cache.get(key)
        if fn is None:
            def run(params_, data_, cov_, mean_, jitter_):
                didx = None if data_ is None else self._data_indices(data_.shape[-1])
                def one(d, c_, m_):
                    full = self._full_params(params_, d, didx, jitter_)
                    return self._run_cv(full, c_, m_)
                if data_ is None:
                    return one(None, cov_, mean_)
                if data_.ndim == 1:
                    return one(data_, cov_, mean_)
                # batched data: replicate a size-1 state batch, or zip a real
                # one (reference circuit.py:484-486 in_dims dispatch)
                if cov_.ndim > 2 and cov_.shape[0] == data_.shape[0] and cov_.shape[0] > 1:
                    return jax.vmap(one, in_axes=(0, 0, 0))(data_, cov_, mean_)
                c0 = cov_[0] if cov_.ndim > 2 else cov_
                m0 = mean_[0] if mean_.ndim > 2 else mean_
                return jax.vmap(one, in_axes=(0, None, None))(data_, c0, m0)
            fn = jax.jit(run)
            self._cache[key] = fn
        p = None if params is None else jnp.asarray(params, rdtype())
        cov, mean = fn(p, data, cov, mean, jitter)
        self._cv_state = [cov, mean] if weight is None else [cov, mean, weight]
        if is_prob:
            self.state = self._forward_cv_prob(cov, mean, weight, detector)
        else:
            if self._with_delay:
                # the returned TDM state is already advanced one time step
                # (reference circuit.py:491-493 shifts before measurement)
                cov, mean = self._shift_state(cov, mean)
            if self.backend == 'bosonic':
                self.state = [cov, mean, weight]
            else:
                self.state = [cov, mean]
        return self.state

    def _run_cv(self, full, cov, mean):
        """Fold the affine symplectic (and loss X/Y) ops over (cov, mean)."""
        from .channel import loss_xy
        n = self._nmode_tdm if self._with_delay else self.nmode
        operators = self._operators_tdm if self._with_delay else self.operators
        for op in operators:
            if op.kind == 'loss':
                x_loc, y_loc = loss_xy(op.params(full))
                wires = list(op.wires) + [w + n for w in op.wires]
                ix = np.ix_(wires, wires)
                x_full = jnp.eye(2 * n, dtype=cov.dtype).at[ix].set(x_loc.astype(cov.dtype))
                y_full = jnp.zeros((2 * n, 2 * n), cov.dtype).at[ix].set(y_loc.astype(cov.dtype))
                cov = x_full @ cov @ x_full.T + y_full
                mean = x_full.astype(mean.dtype) @ mean
                continue
            if op.kind != 'gate':
                continue
            s, d = self._global_xp(op, full)
            cov = s @ cov @ s.T
            mean = s.astype(mean.dtype) @ mean + d.astype(mean.dtype)
        return cov, mean

    def _forward_cv_prob(self, cov, mean, weight=None, detector=None):
        from .gaussian_prob import fock_probs_gaussian
        detector = (detector or self.detector).lower()
        probs, basis = fock_probs_gaussian(cov, mean, self.cutoff, detector)
        out = {}
        for i, b in enumerate(basis):
            fs = FockState(list(b), self.nmode, self.cutoff, basis=True)
            out[fs] = probs[..., i]
        return dict(sorted(out.items(), key=lambda kv: -float(jnp.sum(jnp.abs(kv[1])))))

    # ------------------------------------------------------------- measure
    def measure(self, shots: int = 1024, with_prob: bool = False, wires=None,
                detector=None, key=None, mcmc: bool = False):
        """Sample Fock-basis outcomes from the final state (reference circuit.py:1198)."""
        from ..ops.qmath import next_key, sample_probs
        from collections import Counter
        assert self.state is not None, 'Run the circuit forward before measurement'
        if key is None:
            key = next_key()
        if self.backend == 'fock' and self.basis:
            basis = list(self.state.keys())
            vals = jnp.stack([jnp.asarray(self.state[b]) for b in basis], -1)
            probs = jnp.abs(vals) ** 2 if jnp.iscomplexobj(vals) else vals
            probs_np = np.asarray(probs, np.float64)
            single = probs_np.ndim == 1
            probs_np = probs_np.reshape(-1, probs_np.shape[-1])
            results = []
            for row in probs_np:
                samples = Counter(sample_probs(jnp.asarray(row / row.sum()), shots, key).tolist())
                res = {basis[i]: (v, row[i]) if with_prob else v for i, v in samples.items()}
                results.append(res)
            return results[0] if single else results
        if self.backend == 'fock' and not self.basis and self.mps:
            from ..mps import measure_mps
            res_raw = measure_mps(self.state, shots=shots, key=key)
            out = {}
            for bits, v in res_raw.items():
                fs = FockState([int(c) for c in bits], self.nmode, self.cutoff, basis=True)
                out[fs] = v
            return out
        if self.backend == 'fock' and not self.basis:
            x = self.state
            c, n = self.cutoff, self.nmode
            if self.den_mat:
                probs = jnp.abs(jnp.diagonal(x.reshape(-1, c ** n, c ** n), axis1=-2, axis2=-1))
            else:
                probs = (jnp.abs(x) ** 2).reshape(-1, c ** n)
            single = (x.ndim == n) or (self.den_mat and x.ndim == 2 * n)
            probs_np = np.asarray(probs, np.float64)
            results = []
            for row in probs_np:
                samples = Counter(sample_probs(jnp.asarray(row / row.sum()), shots, key).tolist())
                res = {}
                for idx, v in samples.items():
                    b = np.unravel_index(idx, [c] * n)
                    fs = FockState(list(b), n, c, basis=True)
                    res[fs] = (v, row[idx]) if with_prob else v
                results.append(res)
            return results[0] if single else results
        if self.backend in ('gaussian', 'bosonic'):
            if isinstance(self.state, dict):  # forward already computed probabilities
                probs_dict = self.state
            else:
                probs_dict = self._forward_cv_prob(self.state[0], self.state[1],
                                                   self.state[2] if len(self.state) > 2 else None,
                                                   detector)
            basis = list(probs_dict.keys())
            probs = np.asarray(jnp.stack([jnp.asarray(probs_dict[b]).real for b in basis], -1), np.float64)
            single = probs.ndim == 1 or probs.shape[0] == 1
            probs = probs.reshape(-1, probs.shape[-1])
            results = []
            for row in probs:
                row = np.clip(row, 0, None)
                samples = Counter(sample_probs(jnp.asarray(row / row.sum()), shots, key).tolist())
                res = {basis[i]: (v, row[i]) if with_prob else v for i, v in samples.items()}
                results.append(res)
            return results[0] if single else results
        raise NotImplementedError(
            f'measure: no sampling path for backend={self.backend!r} with '
            f'basis={self.basis}, mps={self.mps}, den_mat={self.den_mat} — '
            'supported combinations are Fock basis-mode dicts, Fock tensors '
            '(dense/MPS/den_mat), and gaussian/bosonic via Fock-basis '
            'probabilities; run forward() first or use measure_homodyne for '
            'CV quadrature samples')

    def photon_number_mean_var(self, wires=None):
        """Photon-number statistics (reference circuit.py:1645)."""
        if wires is None:
            wires = list(range(self.nmode))
        wires = [wires] if isinstance(wires, int) else list(wires)
        if self.backend == 'fock':
            from .wigner import photon_number_mean_var_fock
            assert not self.basis, 'Use Fock tensor mode for photon statistics'
            return photon_number_mean_var_fock(self.state, self.nmode, self.cutoff,
                                               wires, self.den_mat)
        state = self._cv_state if isinstance(self.state, dict) else self.state
        cov, mean = state[0], state[1]
        exp, var = photon_number_mean_var(cov, mean)
        exp = exp[..., jnp.array(wires)]
        var = var[..., jnp.array(wires)]
        return exp, var

    def quadrature_mean(self, wires=None):
        """<x> per wire (reference circuit.py:1695)."""
        if wires is None:
            wires = list(range(self.nmode))
        wires = [wires] if isinstance(wires, int) else list(wires)
        if self.backend == 'fock':
            from .wigner import quadrature_mean_fock
            assert not self.basis
            return quadrature_mean_fock(self.state, self.nmode, self.cutoff, wires, self.den_mat)
        state = self._cv_state if isinstance(self.state, dict) else self.state
        mean = jnp.asarray(state[1])
        return jnp.real(mean[..., jnp.array(wires), 0])

    def wigner(self, wire: int, **kwargs):
        """Wigner function of one mode of the final state."""
        if self.backend == 'fock':
            from .wigner import fock_to_wigner
            assert not self.basis
            return fock_to_wigner(self.state, wire, self.nmode, self.cutoff,
                                  self.den_mat, **kwargs)
        from .wigner import cv_to_wigner
        state = self._cv_state if isinstance(self.state, dict) else self.state
        return cv_to_wigner(state, wire, **kwargs)

    def get_amplitude(self, final_state, init_state=None, unitary=None) -> jnp.ndarray:
        """Transfer amplitude <final|U|init> for the Fock-basis backend."""
        assert self.backend == 'fock'
        final_state = np.asarray(final_state, np.int64)
        in_state = self._basis_input(init_state)
        if unitary is None:
            unitary = self.get_unitary()
        if int(final_state.sum()) != int(in_state.sum()):
            return jnp.zeros((), cdtype())
        sub = sub_matrix(unitary, in_state, final_state)
        from math import factorial
        norm = np.sqrt(np.prod([factorial(int(x)) for x in in_state])
                       * np.prod([factorial(int(x)) for x in final_state]))
        return permanent(sub) / norm

    def get_prob(self, final_state, refer_state=None, unitary=None) -> jnp.ndarray:
        """Probability of one Fock outcome (reference circuit.py:1005)."""
        if self.backend == 'fock':
            amp = self.get_amplitude(final_state, refer_state, unitary)
            return jnp.abs(amp) ** 2
        # Gaussian/Bosonic: hafnian/torontonian probability of one outcome
        from .gaussian_prob import probs_gaussian_helper
        state = self._cv_state if isinstance(self.state, dict) else self.state
        assert state is not None, 'Run the circuit forward first'
        cov = jnp.asarray(state[0]).reshape(-1, 2 * self.nmode, 2 * self.nmode)
        mean = jnp.asarray(state[1]).reshape(-1, 2 * self.nmode, 1)
        fs = tuple(int(x) for x in np.asarray(final_state).reshape(-1))
        probs = [probs_gaussian_helper([fs], cov[i], mean[i], self.detector)[0]
                 for i in range(cov.shape[0])]
        out = jnp.stack(probs)
        return out[0] if out.shape[0] == 1 else out

    @property
    def max_depth(self) -> int:
        depth = np.zeros(self.nmode, np.int64)
        for op in self.operators:
            for w in op.wires:
                depth[w] += 1
        return int(depth.max())

    # ------------------------------------------------------------ gate sugar
    def ps(self, wires, inputs=None, encode=False, mu=None, sigma=None):
        self.add_op('PhaseShift', wires, inputs, encode)

    def bs(self, wires, inputs=None, encode=False, mu=None, sigma=None):
        self.add_op('BeamSplitter', wires, inputs, encode)

    def mzi(self, wires, inputs=None, phi_first=True, encode=False, mu=None, sigma=None):
        self.add_op('MZI', wires, inputs, encode,
                    unitary_fn=lambda p, _pf=phi_first: PG.mzi_unitary(p, _pf),
                    xp_fn=lambda p, _pf=phi_first: passive_xp_from_unitary(PG.mzi_unitary(p, _pf)),
                    fock_fn=lambda p, c, _pf=phi_first: PG.mzi_fock(p, c, _pf), npara=2)

    def bs_theta(self, wires, inputs=None, encode=False, mu=None, sigma=None):
        # reference BeamSplitterTheta fixes phi at pi/2 (photonic/gate.py:519)
        self._bs_fixed_phi(wires, inputs, encode, phi=np.pi / 2, name='BeamSplitterTheta')

    def bs_phi(self, wires, inputs=None, encode=False, mu=None, sigma=None):
        self._bs_fixed_theta(wires, inputs, encode, theta=np.pi / 4, name='BeamSplitterPhi')

    def _bs_fixed_phi(self, wires, inputs, encode, phi, name):
        fn_u = lambda p: PG.bs_unitary(jnp.stack([p[0], jnp.asarray(phi, rdtype())]))
        self.add_op(name, wires, inputs, encode, unitary_fn=fn_u,
                    xp_fn=lambda p: passive_xp_from_unitary(fn_u(p)),
                    fock_fn=lambda p, c: PG.bs_fock_from_unitary(fn_u(p), c), npara=1)

    def _bs_fixed_theta(self, wires, inputs, encode, theta, name):
        fn_u = lambda p: PG.bs_unitary(jnp.stack([jnp.asarray(theta, rdtype()), p[0]]))
        self.add_op(name, wires, inputs, encode, unitary_fn=fn_u,
                    xp_fn=lambda p: passive_xp_from_unitary(fn_u(p)),
                    fock_fn=lambda p, c: PG.bs_fock_from_unitary(fn_u(p), c), npara=1)

    def bs_rx(self, wires, inputs=None, encode=False, mu=None, sigma=None):
        self._bs_single(wires, inputs, encode, 'rx')

    def bs_ry(self, wires, inputs=None, encode=False, mu=None, sigma=None):
        self._bs_single(wires, inputs, encode, 'ry')

    def bs_h(self, wires, inputs=None, encode=False, mu=None, sigma=None):
        self._bs_single(wires, inputs, encode, 'h')

    def _bs_single(self, wires, inputs, encode, conv):
        fn_u = lambda p, _c=conv: PG.bs_single_unitary(p, _c)
        self.add_op(f'BeamSplitterSingle_{conv}', wires, inputs, encode, unitary_fn=fn_u,
                    xp_fn=lambda p: passive_xp_from_unitary(fn_u(p)),
                    fock_fn=lambda p, c: PG.bs_fock_from_unitary(fn_u(p), c), npara=1)

    def dc(self, wires, mu=None, sigma=None):
        self._bs_single(wires, [np.pi / 2], False, 'rx')

    def h(self, wires, mu=None, sigma=None):
        self._bs_single(wires, [np.pi / 2], False, 'h')

    def any(self, unitary, wires=None, minmax=None, name='uany'):
        if wires is None:
            if minmax is None:
                minmax = [0, self.nmode - 1]
            wires = list(range(minmax[0], minmax[1] + 1))
        wires = [wires] if isinstance(wires, int) else list(wires)
        u = np.asarray(unitary, dtype=np.complex128)
        extra = {}
        if self.backend == 'fock' and not self.basis:
            extra['static_fock'] = uany_fock_np(u, len(wires), self.cutoff).astype(cdtype())
        self.add_op(name, wires, None, False, static_unitary=u.astype(cdtype()),
                    xp_fn=None, npara=0, extra=extra)

    def clements(self, unitary, wires=None, minmax=None, mu=None, sigma=None):
        """Decompose a unitary into an MZI mesh and add it (reference circuit.py:2262).

        Equivalent to ``any`` with the 'cssr' Clements decomposition; MZIs are
        placed in the physical interleaved-column order.
        """
        from .decompose import UnitaryDecomposer
        if wires is None:
            if minmax is None:
                minmax = [0, self.nmode - 1]
            wires = list(range(minmax[0], minmax[1] + 1))
        wires = sorted([wires] if isinstance(wires, int) else list(wires))
        unitary = np.asarray(unitary, dtype=np.complex128)
        ud = UnitaryDecomposer(unitary, 'cssr')
        mzi_info = ud.decomp()
        dic_mzi = mzi_info[1]
        phase_angle = mzi_info[0]['phase_angle']
        assert len(phase_angle) == len(wires), 'Please check wires'
        wires1 = wires[1::2]
        wires2 = wires[2::2]
        shift = wires[0]
        for i in range(len(wires)):
            if i % 2 == 0:
                idx = i // 2
                for w in wires1:
                    pair = dic_mzi[(w - 1 - shift, w - shift)]
                    if idx < len(pair):
                        phi, theta = pair[idx]
                        self.mzi(wires=[w - 1, w], inputs=[theta, phi])
            else:
                idx = (i - 1) // 2
                for w in wires2:
                    pair = dic_mzi[(w - 1 - shift, w - shift)]
                    if idx < len(pair):
                        phi, theta = pair[idx]
                        self.mzi(wires=[w - 1, w], inputs=[theta, phi])
        for wire in wires:
            self.ps(wires=wire, inputs=phase_angle[wire - shift])

    def s(self, wires, r=None, theta=None, encode=False, mu=None, sigma=None):
        inputs = self._rt_inputs(r, theta)
        self.add_op('Squeezing', wires, inputs, encode)

    def s2(self, wires, r=None, theta=None, encode=False, mu=None, sigma=None):
        inputs = self._rt_inputs(r, theta)
        self.add_op('Squeezing2', wires, inputs, encode)

    def d(self, wires, r=None, theta=None, encode=False, mu=None, sigma=None):
        inputs = self._rt_inputs(r, theta)
        self.add_op('Displacement', wires, inputs, encode)

    def _rt_inputs(self, r, theta):
        if r is None and theta is None:
            return None
        if r is None:
            return [float(np.random.rand()), theta]
        if theta is None:
            return [r, 0]
        return [r, theta]

    def x(self, wires, inputs=None, encode=False, mu=None, sigma=None):
        self.add_op('DisplacementPosition', wires, inputs, encode)

    def z(self, wires, inputs=None, encode=False, mu=None, sigma=None):
        self.add_op('DisplacementMomentum', wires, inputs, encode)

    def r(self, wires, inputs=None, encode=False, inv_mode=False, mu=None, sigma=None):
        if inv_mode:
            fn_u = lambda p: PG.ps_unitary(-p)
            self.add_op('PhaseShiftInv', wires, inputs, encode, unitary_fn=fn_u,
                        xp_fn=lambda p: PG.ps_xp(-p),
                        fock_fn=lambda p, c: PG.ps_fock(-p, c), npara=1)
        else:
            self.add_op('PhaseShift', wires, inputs, encode)

    def f(self, wires, mu=None, sigma=None):
        self.add_op('PhaseShift', wires, [np.pi / 2], False)

    def qp(self, wires, inputs=None, encode=False, mu=None, sigma=None):
        self.add_op('QuadraticPhase', wires, inputs, encode)

    def cx(self, wires, inputs=None, encode=False, mu=None, sigma=None):
        self.add_op('ControlledX', wires, inputs, encode)

    def cz(self, wires, inputs=None, encode=False, mu=None, sigma=None):
        self.add_op('ControlledZ', wires, inputs, encode)

    def cp(self, wires, inputs=None, encode=False, mu=None, sigma=None):
        self.add_op('CubicPhase', wires, inputs, encode)

    def k(self, wires, inputs=None, encode=False, mu=None, sigma=None):
        self.add_op('Kerr', wires, inputs, encode)

    def ck(self, wires, inputs=None, encode=False, mu=None, sigma=None):
        self.add_op('CrossKerr', wires, inputs, encode)

    def delay(self, wires, ntau: int = 1, inputs=None, convention: str = 'bs',
              encode: bool = False, loop_gates=None, mu=None, sigma=None):
        """Add a delay loop of ntau modes (reference circuit.py:2681).

        'bs': BeamSplitterTheta coupling; 'mzi': MZI coupling.
        """
        assert convention in ('bs', 'mzi')
        # both conventions carry 2 params: BS-theta + loop PS-phi, or MZI
        # theta/phi (reference DelayBS/DelayMZI, photonic/gate.py:2486/2573)
        npara = 2
        if inputs is None:
            values = [float(np.random.rand() * 2 * np.pi) for _ in range(npara)]
        else:
            values = list(np.asarray(inputs, np.float64).reshape(-1))
            assert len(values) == npara, \
                f'delay expects {npara} params (theta, phi), got {len(values)}'
        pidx = self._new_params(values, encode, inputs is None and not encode)
        wire = wires if isinstance(wires, int) else wires[0]
        op = PhotonicOp(f'Delay_{convention}', [wire], pidx, npara, kind='delay',
                        extra={'ntau': ntau, 'convention': convention})
        self.operators.append(op)
        if encode:
            self.encoders.append(op)
            self._enc_pidx.extend(pidx)
            self.ndata += npara
        else:
            self.npara += npara
        self._with_delay = True
        self._ntau_dict[wire].append(ntau)
        self._nmode_tdm += ntau
        self._unroll_dict = None
        self._operators_tdm = None
        self._measurements_tdm = None
        self._version += 1
        self._cache.clear()

    def _prepare_unroll_dict(self):
        """Spatial mode -> concurrent-mode blocks (reference circuit.py:696)."""
        if self._unroll_dict is None:
            self._unroll_dict = defaultdict(list)
            wires = list(range(self._nmode_tdm))
            start = 0
            for i in range(self.nmode):
                for ntau in reversed(self._ntau_dict[i]):
                    self._unroll_dict[i].append(wires[start:start + ntau])
                    start += ntau
                self._unroll_dict[i].append(wires[start])
                start += 1
        return self._unroll_dict

    def _unroll_init_state(self, cov, mean):
        """Embed the spatial-mode state into the concurrent modes (reference circuit.py:710)."""
        idx = np.array([v[-1] for v in self._unroll_dict.values()])
        idx = np.concatenate([idx, idx + self._nmode_tdm])
        nt = 2 * self._nmode_tdm
        if cov.shape[-1] == nt:
            return cov, mean
        cov_tdm = jnp.broadcast_to(jnp.eye(nt, dtype=cov.dtype),
                                   cov.shape[:-2] + (nt, nt)).copy() * (config.HBAR / (4 * config.KAPPA ** 2))
        mean_tdm = jnp.zeros(mean.shape[:-2] + (nt, 1), mean.dtype)
        cov_tdm = cov_tdm.at[..., idx[:, None], idx].set(cov)
        mean_tdm = mean_tdm.at[..., idx, :].set(mean)
        return cov_tdm, mean_tdm

    def _unroll_circuit(self):
        """Remap ops/measurements onto concurrent modes (reference circuit.py:726)."""
        from .measurement import Homodyne
        nmode = self._nmode_tdm
        if self._operators_tdm is None:
            ops = []
            ndelay = np.zeros(self.nmode, np.int64)
            for op in self.operators:
                if op.kind == 'delay':
                    wire = op.wires[0]
                    ndelay[wire] += 1
                    idx_delay = -int(ndelay[wire]) - 1
                    wires = [self._unroll_dict[wire][idx_delay][0], self._unroll_dict[wire][-1]]
                    ops.extend(_delay_subgates(op, wires[0], wires[1]))
                else:
                    g = _copy.copy(op)
                    g.wires = tuple(self._unroll_dict[w][-1] for w in op.wires)
                    ops.append(g)
            self._operators_tdm = ops
        if self._measurements_tdm is None:
            ms = []
            for op_m in self.measurements:
                m2 = _copy.copy(op_m)
                m2.nmode = nmode
                m2.wires = [self._unroll_dict[w][-1] for w in op_m.wires]
                ms.append(m2)
            self._measurements_tdm = ms

    def _shift_state(self, cov, mean, nstep: int = 1, reverse: bool = False):
        """Cycle the delay-line modes by nstep (reference circuit.py:831)."""
        from .qmath import shift_func
        idx_shift = []
        for wire in self._unroll_dict:
            for idx in self._unroll_dict[wire]:
                if isinstance(idx, int):
                    idx_shift.append(idx)
                else:
                    idx_shift.extend(shift_func(list(idx), -nstep if reverse else nstep))
        idx_shift = np.asarray(idx_shift)
        idx_shift = np.concatenate([idx_shift, idx_shift + self._nmode_tdm])
        cov = cov[..., idx_shift[:, None], idx_shift]
        mean = mean[..., idx_shift, :]
        return cov, mean

    def homodyne(self, wires, phi: float = 0.0, eps: float = 2e-4, mu=None, sigma=None):
        """Add a conditional homodyne measurement (reference circuit.py:2730)."""
        from .measurement import Homodyne
        m = Homodyne(phi=phi, nmode=self.nmode, wires=wires, cutoff=self.cutoff,
                     den_mat=self.den_mat, eps=eps)
        self.measurements.append(m)
        self.wires_homodyne.append(m.wires[0])

    def homodyne_x(self, wires, eps: float = 2e-4, mu=None, sigma=None):
        self.homodyne(wires, phi=0.0, eps=eps)

    def homodyne_p(self, wires, eps: float = 2e-4, mu=None, sigma=None):
        self.homodyne(wires, phi=np.pi / 2, eps=eps)

    def loss(self, wires, inputs=None, encode=False):
        """Photon loss channel, theta parameter with T=cos^2(theta/2) (reference circuit.py:2794)."""
        if inputs is None:
            inputs = [float(np.random.rand() * np.pi)]
        pidx = self._new_params(list(np.asarray(inputs, np.float64).reshape(-1)), encode, False)
        op = PhotonicOp('PhotonLoss', [wires] if isinstance(wires, int) else wires,
                        pidx, 1, kind='loss')
        self.operators.append(op)
        if encode:
            self.encoders.append(op)
            self._enc_pidx.extend(pidx)
            self.ndata += 1
        else:
            self.npara += 1
        self._version += 1
        self._cache.clear()

    def loss_t(self, wires, inputs=None, encode=False):
        """Loss with transmittance input (reference circuit.py:2809)."""
        from .channel import transmittance_to_theta
        theta = None if inputs is None else [transmittance_to_theta(float(np.asarray(inputs).reshape(-1)[0]))]
        self.loss(wires, theta, encode)

    def loss_db(self, wires, inputs=None, encode=False):
        """Loss in dB: T = 10^(-db/10) (reference circuit.py:2827)."""
        from .channel import transmittance_to_theta
        theta = None if inputs is None else [transmittance_to_theta(10 ** (-float(np.asarray(inputs).reshape(-1)[0]) / 10))]
        self.loss(wires, theta, encode)

    def measure_homodyne(self, shots: int = 10, wires=None, key=None):
        """Homodyne results; conditional if measurements were added (reference circuit.py:1786).

        Returns samples of shape (batch, shots, nwire), squeezed.
        The post-measurement states are stored in ``self.state_measured``.
        """
        from ..ops.qmath import next_key
        assert self.state is not None and not isinstance(self.state, dict), \
            'Run forward first (without is_prob)'
        if key is None:
            key = next_key()
        measurements = self._measurements_tdm if self._with_delay else self.measurements
        if measurements:
            if self.backend == 'fock':
                state = jnp.asarray(self.state)
                batch_shape = () if state.ndim == self.nmode * (2 if self.den_mat else 1) else state.shape[:1]
                batch = 1 if not batch_shape else int(batch_shape[0])
                core = state.reshape((batch,) + state.shape[len(batch_shape):])
                self.state_measured = jnp.concatenate([core] * shots, axis=0)
            else:
                parts = []
                for s in self.state:
                    s = jnp.asarray(s)
                    batch = s.shape[0]
                    parts.append(jnp.concatenate([s] * shots, axis=0))
                self.state_measured = parts
            samples = []
            for i, op_m in enumerate(measurements):
                self.state_measured = op_m(self.state_measured, key=jax.random.fold_in(key, i))
                nwire = len(op_m.wires)
                s = jnp.asarray(op_m.samples).reshape(shots, batch, -1)[..., :nwire]
                samples.append(jnp.transpose(s, (1, 0, 2)))  # (batch, shots, nwire)
            return jnp.concatenate(samples, axis=-1).squeeze()
        # ideal homodyne on the final state
        if wires is None:
            wires = list(range(self.nmode))
        wires = np.asarray(sorted([wires] if isinstance(wires, int) else list(wires)))
        if self.backend == 'fock':
            from .measurement import _sample_homodyne_fock
            assert not self.basis and len(wires) == 1
            vals = [_sample_homodyne_fock(self.state, int(wires[0]), self.nmode, self.cutoff,
                                          jax.random.fold_in(key, k), self.den_mat)
                    for k in range(shots)]
            return jnp.asarray(vals)
        cov, mean = self.state[0], self.state[1]
        idx = np.concatenate([wires, wires + self.nmode])
        cov_sub = jnp.asarray(cov)[..., idx[:, None], idx]
        mean_sub = jnp.asarray(mean)[..., idx, :]
        from .measurement import _mvn_sample
        samples = _mvn_sample(key, jnp.real(mean_sub).squeeze(-1), cov_sub, (shots,))
        return samples.squeeze()

    def draw(self, filename: str | None = None, unroll: bool = False):
        """Render the circuit to SVG (reference circuit.py:1862)."""
        from .draw import DrawCircuit
        ops = self._operators_tdm if (unroll and self._with_delay) else self.operators
        drawer = DrawCircuit(self.name, self._nmode_tdm if (unroll and self._with_delay) else self.nmode,
                             ops, self.measurements,
                             params=np.asarray(self._pvals, np.float64))
        svg = drawer.draw()
        if filename:
            drawer.save(filename)
        return svg

    def cat(self, wires: int, r=None, theta=None, p: int = 1) -> None:
        """Prepare a cat state on one mode (reference circuit.py:1888)."""
        from .state import CatState
        if self._bosonic_states is None:
            self._bosonic_states = [BosonicState('vac', 1, self.cutoff) for _ in range(self.nmode)]
        self._bosonic_states[wires] = CatState(r=r, theta=theta, p=p, cutoff=self.cutoff)

    def gkp(self, wires: int, theta=None, phi=None, amp_cutoff: float = 0.1,
            epsilon: float = 0.05) -> None:
        """Prepare a GKP state on one mode (reference circuit.py:1899)."""
        from .state import GKPState
        if self._bosonic_states is None:
            self._bosonic_states = [BosonicState('vac', 1, self.cutoff) for _ in range(self.nmode)]
        self._bosonic_states[wires] = GKPState(theta=theta, phi=phi, amp_cutoff=amp_cutoff,
                                               epsilon=epsilon, cutoff=self.cutoff)

    def barrier(self, wires=None):
        wires = list(range(self.nmode)) if wires is None else wires
        op = PhotonicOp('Barrier', [wires] if isinstance(wires, int) else wires, kind='barrier')
        self.operators.append(op)
        self._version += 1
        self._cache.clear()
