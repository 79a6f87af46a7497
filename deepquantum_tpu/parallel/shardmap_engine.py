"""Explicit shard_map statevector engine: the pair-exchange algorithms of
arXiv:2311.01512 (reference src/deepquantum/distributed.py) on a jax mesh.

The GSPMD engine (parallel/sharded.py) lets XLA choose collectives; this
engine pins the exact communication pattern of the reference:

- gates on local qubits run with zero communication (dist_local, Alg.5);
- a single-qubit gate on a global (sharded) qubit is ONE ppermute pair
  exchange with the rank-bit partner (dist_one_targ_gate, Alg.6 —
  comm_exchange_arrays' all-to-all-with-one-peer trick maps 1:1 onto
  ppermute, reference communication.py:58);
- multi-qubit gates with global targets swap each global target with a free
  local qubit (half-shard ppermute), apply locally, and swap back
  (dist_swap_gate / dist_many_targ_gate, Alg.8-10);
- expectation values reduce with one psum (inner_product_dist,
  reference distributed.py:288).

Qubit 0..k-1 (most significant) are the global qubits on a 2^k-device mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..bitmath import flip_bit, get_bit, is_power_of_2, log_base2
from ..config import cdtype, rdtype
from ..ops.apply import controlled_matrix, evolve_state

__all__ = ['ShardMapSimulator']


class ShardMapSimulator:
    """Pair-exchange sharded statevector simulator over a 2^k-device mesh.

    ``planar=True`` runs every per-shard computation on f32 re/im planes:
    local gate groups go through the Pallas planar kernel
    (ops/planar_gate.py, ~650 GB/s per chip) and the Alg.6-10 exchanges
    (ppermute / half-shard swaps) move the planes directly. This is how the
    multi-chip path rides the same roofline kernel as the single-chip
    engine — shard_map gives Pallas the per-device shapes that GSPMD's
    automatic partitioner cannot. Default: auto (TPU + complex64 policy).
    """

    def __init__(self, nqubit: int, mesh: Mesh, axis_name: str = 'sv',
                 planar: bool | None = None) -> None:
        self.nqubit = nqubit
        self.mesh = mesh
        self.axis_name = axis_name
        self.ndev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        assert is_power_of_2(self.ndev), 'device count must be a power of 2'
        self.nglobal = log_base2(self.ndev)
        assert self.nglobal <= nqubit
        self.nlocal = nqubit - self.nglobal
        self.sharding = NamedSharding(mesh, P(axis_name))
        if planar is None:
            planar = (jax.default_backend() == 'tpu'
                      and cdtype() == jnp.complex64 and self.nlocal >= 4)
        self.planar = planar
        self._interp = jax.default_backend() != 'tpu'

    # ------------------------------------------------------------- primitives
    def _perm_pairs(self, gq: int):
        """Rank permutation flipping global-qubit gq's rank bit (Alg.6 partner rule)."""
        shift = self.nglobal - 1 - gq
        return [(r, flip_bit(r, shift)) for r in range(self.ndev)]

    def _gbit(self, gq: int):
        return get_bit(jax.lax.axis_index(self.axis_name), self.nglobal - 1 - gq)

    def _one_targ_global(self, local, mat, gq: int):
        """Single-qubit gate on global qubit gq: one full-shard pair exchange."""
        other = jax.lax.ppermute(local, self.axis_name, self._perm_pairs(gq))
        b = self._gbit(gq)
        mine = jnp.where(b == 0, mat[0, 0], mat[1, 1])
        theirs = jnp.where(b == 0, mat[0, 1], mat[1, 0])
        return mine * local + theirs * other

    def _swap_global_local(self, local, gq: int, lwire: int):
        """Swap global qubit gq with local qubit lwire: half-shard exchange (Alg.8)."""
        x = local.reshape([2] * self.nlocal)
        moved = jnp.moveaxis(x, lwire, 0)
        b = self._gbit(gq)
        keep = jnp.take(moved, b, axis=0)
        send = jnp.take(moved, 1 - b, axis=0)
        recv = jax.lax.ppermute(send, self.axis_name, self._perm_pairs(gq))
        stacked0 = jnp.stack([keep, recv])   # layout when b == 0
        stacked1 = jnp.stack([recv, keep])   # layout when b == 1
        moved_new = jnp.where(b == 0, stacked0, stacked1)
        return jnp.moveaxis(moved_new, 0, lwire).reshape(local.shape)

    # ------------------------------------------------- planar-plane primitives
    def _one_targ_global_planar(self, lp, mre, mim, gq: int):
        """Alg.6 pair exchange on (2, dim_local) f32 planes."""
        other = jax.lax.ppermute(lp, self.axis_name, self._perm_pairs(gq))
        b = self._gbit(gq)
        mr = jnp.where(b == 0, mre[0, 0], mre[1, 1])
        mi = jnp.where(b == 0, mim[0, 0], mim[1, 1])
        tr = jnp.where(b == 0, mre[0, 1], mre[1, 0])
        ti = jnp.where(b == 0, mim[0, 1], mim[1, 0])
        yr = mr * lp[0] - mi * lp[1] + tr * other[0] - ti * other[1]
        yi = mr * lp[1] + mi * lp[0] + tr * other[1] + ti * other[0]
        return jnp.stack([yr, yi])

    def _swap_global_local_planar(self, lp, gq: int, lwire: int):
        """Alg.8 half-shard exchange on planes (plane axis rides along)."""
        x = lp.reshape([2] + [2] * self.nlocal)
        moved = jnp.moveaxis(x, lwire + 1, 1)
        b = self._gbit(gq)
        keep = jnp.take(moved, b, axis=1)
        send = jnp.take(moved, 1 - b, axis=1)
        recv = jax.lax.ppermute(send, self.axis_name, self._perm_pairs(gq))
        stacked0 = jnp.stack([keep, recv], axis=1)
        stacked1 = jnp.stack([recv, keep], axis=1)
        moved_new = jnp.where(b == 0, stacked0, stacked1)
        return jnp.moveaxis(moved_new, 1, lwire + 1).reshape(lp.shape)

    def _apply_gate_planar(self, lp, mre, mim, wires):
        """Planar twin of _apply_gate; matrix planes in SORTED-wire order."""
        from ..ops.planar_gate import planar_evolve_any
        k = self.nglobal
        nl = self.nlocal
        global_targets = [w for w in wires if w < k]
        if not global_targets:
            return planar_evolve_any(lp, mre, mim, nl,
                                     tuple(w - k for w in wires), self._interp)
        if len(wires) == 1:
            return self._one_targ_global_planar(lp, mre, mim, wires[0])
        used_local = {w - k for w in wires if w >= k}
        free_local = [l for l in range(nl) if l not in used_local]
        assert len(free_local) >= len(global_targets), 'not enough local qubits for remap'
        remap = {}
        for g, l in zip(global_targets, free_local):
            lp = self._swap_global_local_planar(lp, g, l)
            remap[g] = l
        # the swap leaves wire ORDER intact (global slot g now holds local
        # qubit l's role and vice versa), so matrix stays sorted-wire
        new_wires = [remap[w] if w in remap else w - k for w in wires]
        order = sorted(range(len(new_wires)), key=lambda i: new_wires[i])
        if order != list(range(len(new_wires))):
            from ..ops.apply import permute_matrix_wires
            # planes permute independently (real linear op)
            mre = permute_matrix_wires(mre, order)
            mim = permute_matrix_wires(mim, order)
        lp = planar_evolve_any(lp, mre, mim, nl, tuple(sorted(new_wires)),
                               self._interp)
        for g, l in reversed(list(remap.items())):
            lp = self._swap_global_local_planar(lp, g, l)
        return lp

    # ------------------------------------------------------------------- gate
    def _apply_gate(self, local, mat, wires):
        """Apply a k-qubit unitary with the minimal exchange pattern."""
        k = self.nglobal
        nl = self.nlocal
        global_targets = [w for w in wires if w < k]
        if not global_targets:
            x = local.reshape([2] * nl)
            x = evolve_state(x, mat, nl, [w - k for w in wires])
            return x.reshape(local.shape)
        if len(wires) == 1:
            return self._one_targ_global(local, mat, wires[0])
        # swap global targets with free local qubits, apply locally, swap back
        used_local = {w - k for w in wires if w >= k}
        free_local = [l for l in range(nl) if l not in used_local]
        assert len(free_local) >= len(global_targets), 'not enough local qubits for remap'
        remap = {}
        for g, l in zip(global_targets, free_local):
            local = self._swap_global_local(local, g, l)
            remap[g] = l
        new_wires = [remap[w] if w in remap else w - k for w in wires]
        x = local.reshape([2] * nl)
        x = evolve_state(x, mat, nl, new_wires)
        local = x.reshape(local.shape)
        for g, l in reversed(list(remap.items())):
            local = self._swap_global_local(local, g, l)
        return local

    # ------------------------------------------------------------------- runs
    def init_state(self) -> jax.Array:
        dim = 2 ** self.nqubit
        zeros = np.zeros(dim, dtype=cdtype())
        zeros[0] = 1
        from ..utils.compat import to_device
        return jax.device_put(to_device(zeros), self.sharding)

    def _prepare_state(self, state):
        if state is None:
            return self.init_state()
        from ..utils.compat import to_device
        arr = to_device(np.asarray(state, dtype=cdtype()).reshape(-1)) \
            if isinstance(state, np.ndarray) else jnp.asarray(state, cdtype()).reshape(-1)
        return jax.device_put(arr, self.sharding)

    def _gate_list(self, circuit, full):
        # a k-wire gate needs k free local slots in the worst case (all
        # targets global), so cap the fusion support at nlocal (Alg.10's
        # applicability condition, reference distribured swap-in remap)
        old_k = circuit.fuse_max_support
        circuit.fuse_max_support = max(1, min(old_k, self.nlocal))
        try:
            gates = []
            for entry in circuit._fused_plan():
                if entry[0] == 'op':
                    op = entry[1]
                    assert op.kind == 'gate', 'shard_map engine supports unitary gates'
                    mat = controlled_matrix(jnp.asarray(op.matrix(full), cdtype()),
                                            len(op.controls))
                    gates.append((mat, list(op.controls) + list(op.wires)))
                else:
                    mat, wires = circuit._fused_matrix(entry, full)
                    gates.append((mat, list(wires)))
            return gates
        finally:
            circuit.fuse_max_support = old_k

    def _full(self, circuit, params, data):
        didx = None if data is None else circuit._data_indices(np.shape(data)[-1])
        return circuit._full_params(params, data, didx)

    def _planar_gates(self, gates):
        """Complex (mat, wires) list -> (mre, mim, sorted_wires) planes."""
        from ..ops.planar_gate import _sorted_mat_planes
        out = []
        for mat, wires in gates:
            mre, mim = _sorted_mat_planes(mat, wires)
            out.append((mre, mim, sorted(wires)))
        return out

    def run(self, circuit, params=None, data=None, state=None) -> jax.Array:
        """Execute a QubitCircuit IR under shard_map (data encoding and a
        custom initial state supported, matching DistributedQubitCircuit)."""
        from jax.experimental.shard_map import shard_map
        state = self._prepare_state(state)
        gates = self._gate_list(circuit, self._full(circuit, params, data))

        if self.planar:
            from ..ops.planar_gate import from_planar, to_planar
            pgates = self._planar_gates(gates)

            def program(local):
                lp = to_planar(local)
                for mre, mim, wires in pgates:
                    lp = self._apply_gate_planar(lp, mre, mim, wires)
                return from_planar(lp)
        else:
            def program(local):
                for mat, wires in gates:
                    local = self._apply_gate(local, mat, wires)
                return local

        # check_rep=False: pallas_call out_shapes carry no varying-mesh-axes
        # annotation, which the planar path trips over inside shard_map
        fn = shard_map(program, mesh=self.mesh, in_specs=P(self.axis_name),
                       out_specs=P(self.axis_name), check_rep=False)
        return jax.jit(fn)(state)

    def expectation(self, circuit, params=None, data=None, state=None) -> jnp.ndarray:
        """<psi|O|psi> per observable with one psum (Alg. inner_product_dist)."""
        from jax.experimental.shard_map import shard_map
        from ..circuit import _PAULI_FNS
        state = self._prepare_state(state)
        gates = self._gate_list(circuit, self._full(circuit, params, data))
        obs_gates = []
        for obs in circuit.observables:
            obs_gates.append([(jnp.asarray(_PAULI_FNS[b](), cdtype()), [w[0]])
                              for w, b in zip(obs.wires, obs.basis)])

        if self.planar:
            from ..ops.planar_gate import to_planar
            pgates = self._planar_gates(gates)
            pobs = [self._planar_gates(og) for og in obs_gates]

            def program(local):
                lp = to_planar(local)
                for mre, mim, wires in pgates:
                    lp = self._apply_gate_planar(lp, mre, mim, wires)
                outs = []
                for og in pobs:
                    ox = lp
                    for mre, mim, wires in og:
                        ox = self._apply_gate_planar(ox, mre, mim, wires)
                    e = jnp.sum(lp[0] * ox[0] + lp[1] * ox[1])
                    outs.append(jax.lax.psum(e, self.axis_name))
                return jnp.stack(outs)
        else:
            def program(local):
                for mat, wires in gates:
                    local = self._apply_gate(local, mat, wires)
                outs = []
                for og in obs_gates:
                    ox = local
                    for mat, wires in og:
                        ox = self._apply_gate(ox, mat, wires)
                    e = jnp.real(jnp.vdot(local, ox))
                    outs.append(jax.lax.psum(e, self.axis_name))
                return jnp.stack(outs)

        fn = shard_map(program, mesh=self.mesh, in_specs=P(self.axis_name),
                       out_specs=P(), check_rep=False)
        return jax.jit(fn)(state)

    def measure(self, circuit, shots: int = 1024, params=None, data=None,
                state=None, wires=None, key=None) -> dict:
        """Two-level hierarchical sampling (reference measure_dist,
        distributed.py:205-285): per-shard probability masses reduce with one
        psum, a host multinomial splits shots across shards, and each shard
        draws its share locally from its own amplitudes. Returns
        {bitstring: count} like QubitCircuit.measure."""
        from collections import Counter
        from jax.experimental.shard_map import shard_map
        from ..ops.qmath import next_key
        if key is None:
            key = next_key()
        psi = self.run(circuit, params=params, data=data, state=state)

        def shard_mass(local):
            return jnp.sum(jnp.abs(local) ** 2)[None]

        masses = jax.jit(shard_map(shard_mass, mesh=self.mesh,
                                   in_specs=P(self.axis_name),
                                   out_specs=P(self.axis_name)))(psi)
        masses = np.asarray(jnp.real(masses), np.float64)
        masses = np.maximum(masses, 0)
        masses /= masses.sum()
        rng = np.random.default_rng(int(jax.random.randint(key, (), 0, 2 ** 31 - 1)))
        per_shard = rng.multinomial(shots, masses)

        shard_len = (1 << self.nqubit) // self.ndev
        wires = list(range(self.nqubit)) if wires is None else (
            [wires] if isinstance(wires, int) else sorted(wires))
        counts: Counter = Counter()
        # per-shard categorical draw on the local probabilities (host drives
        # the loop; each shard's draw is one small device program)
        for r, k in enumerate(per_shard):
            if k == 0:
                continue
            local = jax.lax.dynamic_slice(psi, (r * shard_len,), (shard_len,))
            logp = jnp.log(jnp.maximum(jnp.abs(local) ** 2, 1e-38))
            draws = jax.random.categorical(jax.random.fold_in(key, r), logp, shape=(int(k),))
            for d in np.asarray(draws):
                g = r * shard_len + int(d)
                bits = format(g, f'0{self.nqubit}b')
                counts[''.join(bits[w] for w in wires)] += 1
        return dict(counts)
