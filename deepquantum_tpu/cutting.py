"""Circuit cutting: wire cuts -> quasiprobability decomposition -> subexperiments.

Mirrors reference src/deepquantum/cutting.py + qpd.py + circuit.py:748-813.
Host-side graph logic on the GateOp IR; the produced subexperiments are
independent QubitCircuits that dispatch as ordinary jitted runs.
"""

from __future__ import annotations

import bisect
from collections import defaultdict
from itertools import product

import numpy as np
from networkx import Graph, connected_components

__all__ = ['MoveQPD', 'transform_cut2move', 'partition_labels', 'partition_problem',
           'separate_operators', 'decompose_observables', 'get_subexperiments']


class _QPDOp:
    """A two-qubit (or decomposed single-qubit) QPD op in the IR.

    bases[i][j] = list of primitive actions on the j-th wire for term i; each
    action is 'h' | 'sdg' | 's' | 'x' | 'measure' (reference qpd.py:117-171).
    """

    def __init__(self, bases, coeffs, wires, label=None, name='MoveQPD'):
        self.bases = bases
        self.coeffs = coeffs
        self.wires = list(wires)
        self.controls = []
        self.label = label
        self.name = name
        self.kind = 'qpd'
        self.npara = 0

    def decompose(self):
        g1 = _QPDOp([[b[0]] for b in self.bases], self.coeffs, [self.wires[0]],
                    self.label, self.name + f'_label{self.label}_1')
        g2 = _QPDOp([[b[1]] for b in self.bases], self.coeffs, [self.wires[1]],
                    self.label, self.name + f'_label{self.label}_2')
        return g1, g2


def MoveQPD(wires, label=None) -> _QPDOp:
    """8-term measure/prepare QPD of the move operation (reference qpd.py:117)."""
    measure_i = []
    measure_x = ['h', 'measure']
    measure_y = ['sdg', 'h', 'measure']
    measure_z = ['measure']
    prep_0 = []
    prep_1 = ['x']
    prep_plus = ['h']
    prep_minus = ['x', 'h']
    prep_iplus = ['h', 's']
    prep_iminus = ['x', 'h', 's']
    bases = [
        [measure_i, prep_0],
        [measure_i, prep_1],
        [measure_x, prep_plus],
        [measure_x, prep_minus],
        [measure_y, prep_iplus],
        [measure_y, prep_iminus],
        [measure_z, prep_0],
        [measure_z, prep_1],
    ]
    coeffs = [0.5, 0.5, 0.5, -0.5, 0.5, -0.5, 0.5, -0.5]
    return _QPDOp(bases, coeffs, wires, label)


class _IROp:
    """Portable copy of a GateOp with inlined parameter values."""

    def __init__(self, op, pvals):
        self.name = op.name
        self.kind = op.kind
        self.wires = list(op.wires)
        self.controls = list(op.controls)
        self.values = [pvals[i] for i in op.pidx] if op.pidx else []
        self.inv = getattr(op, 'inv', False)
        self.matrix_fn = getattr(op, 'matrix_fn', None)
        self.static_matrix = getattr(op, 'static_matrix', None)
        self.npara = op.npara

    def add_to(self, cir, wire_map=None):
        from .circuit import QubitCircuit
        wires = [wire_map[w] if wire_map else w for w in self.wires]
        controls = [wire_map[w] if wire_map else w for w in self.controls]
        if self.kind == 'barrier':
            cir.barrier(wires)
            return
        if self.kind == 'move':
            cir.move(wires[0], wires[1])
            return
        op = cir.add_gate(self.name, wires, controls or None,
                          self.values if self.values else None,
                          matrix_fn=self.matrix_fn, static_matrix=self.static_matrix,
                          npara=self.npara)
        op.inv = self.inv


def transform_cut2move(ops, cut_lst, nqubit, observables=None, qpd_form: bool = False):
    """WireCut -> Move with qubit re-indexing (reference cutting.py:17).

    Returns (new_ops, new_observable_wires, new_nqubit). ops are _IROp or
    _QPDOp items; observables are (wires, basis) descriptors.
    """
    cuts_per_qubit = defaultdict(list)
    for idx, wire in cut_lst:
        cuts_per_qubit[wire].append(idx)
    ncut_cum = []
    ncut = 0
    for i in range(nqubit + 1):
        ncut_cum.append(ncut)
        ncut += len(cuts_per_qubit[i])
    new_nqubit = nqubit + ncut
    new_ops = []
    for i, op in enumerate(ops):
        def remap(wire):
            nb = bisect.bisect_left(cuts_per_qubit[wire], i)
            return wire + ncut_cum[wire] + nb
        op.wires = [remap(w) for w in op.wires]
        op.controls = [remap(w) for w in op.controls]
        if op.kind == 'cut':
            w = op.wires[0]
            new_ops.append(MoveQPD([w, w + 1]) if qpd_form else _move_ir(w, w + 1))
        else:
            new_ops.append(op)
    new_obs = None
    if observables is not None:
        new_obs = []
        for wires, basis in observables:
            new_wires = [w + ncut_cum[w + 1] for w in wires]
            new_obs.append((new_wires, basis))
    return new_ops, new_obs, new_nqubit


def _move_ir(w1, w2):
    """A Move descriptor: reset w2 then swap (direct, non-QPD simulation)."""
    m = _IROp.__new__(_IROp)
    m.name, m.kind = 'Move', 'move'
    m.wires, m.controls = [w1, w2], []
    m.values, m.inv, m.matrix_fn, m.static_matrix, m.npara = [], False, None, None, 0
    return m


def partition_labels(ops, nqubit, ignore=lambda op: False, keep_idle_wires: bool = False):
    """Connected components of the gate graph (reference cutting.py:57)."""
    graph = Graph()
    graph.add_nodes_from(range(nqubit))
    for op in ops:
        if ignore(op) or op.kind == 'barrier':
            continue
        wires = list(op.wires) + list(op.controls)
        for i, w1 in enumerate(wires):
            for w2 in wires[i + 1:]:
                graph.add_edge(w1, w2)
    subsets = sorted(connected_components(graph), key=min)
    if not keep_idle_wires:
        idle = set(range(nqubit))
        for op in ops:
            for w in list(op.wires) + list(op.controls):
                idle.discard(w)
        subsets = [s for s in subsets if not (len(s) == 1 and next(iter(s)) in idle)]
    labels = [None] * nqubit
    for i, subset in enumerate(subsets):
        for q in subset:
            labels[q] = i
    return labels


def map_qubit(labels):
    """(reference cutting.py:92)"""
    qubit_map = []
    label2qubits = defaultdict(list)
    for i, label in enumerate(labels):
        if label is None:
            qubit_map.append((None, None))
        else:
            qubits = label2qubits[label]
            qubit_map.append((label, len(qubits)))
            qubits.append(i)
    return qubit_map, dict(label2qubits)


def get_qpd_operators(ops, labels):
    """Replace cross-partition 2q gates with QPD gates (reference cutting.py:153)."""
    out = []
    for op in ops:
        if isinstance(op, _QPDOp) or op.kind == 'barrier':
            out.append(op)
            continue
        wires = list(op.wires) + list(op.controls)
        if len(wires) < 2 or len({labels[w] for w in wires}) == 1:
            out.append(op)
            continue
        raise ValueError('Only wire cuts (Move) are supported for gate decomposition here')
    return out


def separate_operators(ops, labels):
    """Split ops into per-partition lists with remapped wires (reference cutting.py:171)."""
    qubit_map, label2qubits = map_qubit(labels)
    label2sub = defaultdict(list)
    for op in ops:
        wires = list(op.wires) + list(op.controls)
        if op.kind == 'barrier':
            # split barrier across partitions
            for label, qubits in label2qubits.items():
                ws = [qubit_map[w][1] for w in wires if w in qubits]
                if ws:
                    b = _IROp.__new__(_IROp)
                    b.name, b.kind, b.wires, b.controls = 'Barrier', 'barrier', ws, []
                    b.values, b.inv, b.matrix_fn, b.static_matrix, b.npara = [], False, None, None, 0
                    label2sub[label].append(b)
            continue
        op_labels = {qubit_map[w][0] for w in wires}
        assert len(op_labels) == 1, 'Operator spans multiple partitions'
        label = op_labels.pop()
        op.wires = [qubit_map[w][1] for w in op.wires]
        op.controls = [qubit_map[w][1] for w in op.controls]
        label2sub[label].append(op)
    return dict(label2sub), label2qubits


def decompose_observables(observables, labels):
    """(reference cutting.py:196)"""
    if observables is None:
        return None
    qubit_map, label2qubits = map_qubit(labels)
    label2obs = {}
    for label, qubits in label2qubits.items():
        sub = []
        for wires, basis in observables:
            new_wires = []
            new_basis = ''
            for w, b in zip(wires, basis):
                if w in qubits:
                    new_wires.append(qubit_map[w][1])
                    new_basis += b
            sub.append((new_wires, new_basis))
        label2obs[label] = sub
    return label2obs


def partition_problem(ops, nqubit, labels=None, observables=None):
    """(reference cutting.py:221)"""
    if labels is None:
        labels = partition_labels(ops, nqubit, lambda op: isinstance(op, _QPDOp))
    ops = get_qpd_operators(ops, labels)
    expanded = []
    gate_label = 0
    for op in ops:
        if isinstance(op, _QPDOp) and len(op.wires) == 2:
            op.label = gate_label
            g1, g2 = op.decompose()
            expanded.extend([g1, g2])
            gate_label += 1
        else:
            expanded.append(op)
    label2sub, _ = separate_operators(expanded, labels)
    label2obs = decompose_observables(observables, labels)
    return label2sub, label2obs


_QPD_PRIMS = {'h': 'h', 'sdg': 'sdg', 's': 's', 'x': 'x'}


def get_subexperiments(cir, qubit_labels=None):
    """Generate subexperiments + coefficients (reference circuit.py:748)."""
    from .circuit import QubitCircuit

    ops = [(_IROp(op, cir._pvals) if op.kind != 'cut' else _cut_marker(op))
           for op in cir.operators]
    observables = [(sum(o.wires, []), o.basis) for o in cir.observables] or None
    ops, observables, new_nqubit = transform_cut2move(ops, cir._cut_lst, cir.nqubit,
                                                      observables, qpd_form=True)
    label2sub, label2obs = partition_problem(ops, new_nqubit, qubit_labels, observables)
    # collect QPD gates per label
    gate_labels, gate_coeffs, nbases = [], [], []
    for label, sub_ops in label2sub.items():
        for op in sub_ops:
            if isinstance(op, _QPDOp) and op.label is not None and op.label not in gate_labels:
                gate_labels.append(op.label)
                gate_coeffs.append(op.coeffs)
                nbases.append(len(op.bases))
    order = sorted(range(len(gate_labels)), key=lambda i: gate_labels[i])
    gate_labels = [gate_labels[i] for i in order]
    gate_coeffs = [gate_coeffs[i] for i in order]
    nbases = [nbases[i] for i in order]

    subexperiments = defaultdict(list)
    coefficients = []
    for combination in product(*[range(nb) for nb in nbases]):
        for label, sub_ops in label2sub.items():
            nq = max((max(list(o.wires) + list(o.controls), default=0) for o in sub_ops),
                     default=0) + 1
            cir_sub = QubitCircuit(nq, den_mat=cir.den_mat, shots=cir.shots)
            obs_ext = [(list(w), b) for w, b in (label2obs[label] if label2obs else [])]
            for op in sub_ops:
                if not isinstance(op, _QPDOp):
                    op.add_to(cir_sub)
                    continue
                idx = combination[gate_labels.index(op.label)]
                actions = op.bases[idx][0]
                measured = False
                for act in actions:
                    if act == 'measure':
                        measured = True
                        continue
                    getattr(cir_sub, _QPD_PRIMS[act])(op.wires[0])
                if measured and obs_ext:
                    # a QPD measurement contributes a Z factor to every observable
                    obs_ext = [(w + [op.wires[0]], b + 'z') for w, b in obs_ext]
            for w, b in obs_ext:
                if w:
                    cir_sub.observable([[x] for x in w], basis=b)
            subexperiments[label].append(cir_sub)
        coeff = 1.0
        for i, idx in enumerate(combination):
            coeff *= gate_coeffs[i][idx]
        coefficients.append(coeff)
    return dict(subexperiments), coefficients


def _cut_marker(op):
    m = _IROp.__new__(_IROp)
    m.name, m.kind = 'WireCut', 'cut'
    m.wires, m.controls = list(op.wires), []
    m.values, m.inv, m.matrix_fn, m.static_matrix, m.npara = [], False, None, None, 0
    return m
