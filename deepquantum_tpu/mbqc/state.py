"""MBQC graph states (reference src/deepquantum/mbqc/state.py).

SubGraphState = networkx graph + input-state array. Host-driven control flow
(measurement collapse changes graph structure dynamically, which cannot
trace); the heavy part — materializing ``full_state`` — is this repo's own
design: a single numpy kron + one CZ sign-vector pass instead of the
reference's per-edge QubitCircuit simulation (58 s -> 29 ms on transpile
parity tests, see mbqc/command.py).

Porting note: the graph-bookkeeping surface (set_graph/set_state/compose/
shift_labels/node2wire sequencing, reference mbqc/state.py:17-288) follows
the reference's semantics statement-for-statement where the semantics ARE
the statements — node ordering, cz-edge flags, and the nodes_state cycle
convention must match exactly for pattern-vs-circuit parity. The execution
path underneath (full_state, command runner) is independent.
"""

from __future__ import annotations

from collections import defaultdict
from functools import reduce
from typing import Any

import networkx as nx
import numpy as np

from ..circuit import QubitCircuit
from ..config import cdtype
from ..ops.qmath import inverse_permutation
from ..state import QubitState
from ..utils.compat import to_numpy

__all__ = ['SubGraphState', 'GraphState']


class SubGraphState:
    """A subgraph state: graph + input state on nodes_state (reference mbqc/state.py:17)."""

    def __init__(self, nodes_state=None, state: Any = 'plus', edges=None, nodes=None) -> None:
        self.nodes_out_seq = None
        self.set_graph(nodes_state, edges, nodes)
        self.set_state(state)
        self.measure_dict = defaultdict(list)

    @property
    def nodes(self):
        return self.graph.nodes

    @property
    def edges(self):
        return self.graph.edges

    @property
    def full_state(self):
        """Materialize: kron |+> for background nodes, run CZ edges (reference mbqc/state.py:65)."""
        nqubit = len(self.nodes)
        nodes_bg = [n for n in self.nodes if n not in self.nodes_state]
        nodes = self.nodes_state + nodes_bg
        wires = [0] + [self.node2wire_dict[node] + 1 for node in nodes]
        plus = np.array([[1], [1]], dtype=cdtype()) / 2 ** 0.5
        state = np.asarray(to_numpy(self.state)).reshape(-1, 1) if not isinstance(self.state, np.ndarray) else self.state.reshape(-1, 1)
        # host-side kron: multi_kron returns a device array and complex
        # device->host readback is UNIMPLEMENTED on some TPU attachment paths
        init = reduce(np.kron, [plus] * len(nodes_bg), np.asarray(state))
        init = np.asarray(init).reshape([-1] + [2] * nqubit)
        init = np.transpose(init, inverse_permutation(wires)).reshape(-1, 2 ** nqubit)
        # CZ edges as one numpy sign vector — patterns materialize thousands
        # of tiny states with ever-changing shapes, so host numpy beats a
        # per-shape jitted circuit by orders of magnitude
        dim = 2 ** nqubit
        ar = np.arange(dim)
        sign = np.ones(dim)
        for a, b, data in self.graph.edges(data=True):
            if data.get('cz'):
                ba = (ar >> (nqubit - 1 - self.node2wire_dict[a])) & 1
                bb = (ar >> (nqubit - 1 - self.node2wire_dict[b])) & 1
                sign *= 1.0 - 2.0 * (ba & bb)
        out = (init * sign).astype(cdtype())
        return out[0][:, None] if out.shape[0] == 1 else out[..., None]

    def set_graph(self, nodes_state=None, edges=None, nodes=None) -> None:
        if nodes_state is None:
            nodes_state = []
        elif isinstance(nodes_state, int):
            nodes_state = list(range(nodes_state))
        edges = edges or []
        if nodes is None:
            nodes = []
        elif isinstance(nodes, int):
            nodes = [nodes]
        graph = nx.Graph()
        if len(nodes_state) > 1:
            nx.add_cycle(graph, nodes_state, cz=False)
        else:
            graph.add_nodes_from(nodes_state)
        graph.add_edges_from(edges, cz=True)
        graph.add_nodes_from(nodes)
        self.graph = graph
        self.nodes_state = list(nodes_state)
        self.update_node2wire_dict()

    def set_state(self, state: Any = 'plus') -> None:
        nqubit = len(self.nodes_state)
        if isinstance(state, str):
            base = {
                'plus': np.array([1, 1], dtype=cdtype()) / 2 ** 0.5,
                'minus': np.array([1, -1], dtype=cdtype()) / 2 ** 0.5,
                'zero': np.array([1, 0], dtype=cdtype()),
                'one': np.array([0, 1], dtype=cdtype()),
            }[state]
            state = reduce(np.kron, [base] * nqubit) if nqubit > 0 else np.ones((), cdtype())
            self.state = np.asarray(state)
            return
        if nqubit > 0:
            if isinstance(state, np.ndarray) or not hasattr(state, 'devices'):
                self.state = QubitState(nqubit, np.asarray(state)).state
            else:
                self.state = state  # device array: keep as-is
        else:
            self.state = np.ones((), cdtype())

    def set_nodes_out_seq(self, nodes=None) -> None:
        if nodes is not None:
            assert len(nodes) == len(self.nodes)
            assert set(nodes) == set(self.nodes)
        self.nodes_out_seq = nodes
        self.update_node2wire_dict()

    def add_nodes(self, nodes) -> None:
        if isinstance(nodes, int):
            nodes = [nodes]
        self.graph.add_nodes_from(nodes)
        self.update_node2wire_dict()

    def add_edges(self, edges) -> None:
        self.graph.add_edges_from(edges, cz=True)
        self.update_node2wire_dict()

    def shift_labels(self, n: int) -> None:
        self.graph = nx.relabel_nodes(self.graph, lambda x: x + n)
        self.nodes_state = [s + n for s in self.nodes_state]
        self.measure_dict = defaultdict(list, {k + n: v for k, v in self.measure_dict.items()})
        self.update_node2wire_dict()

    def compose(self, other: 'SubGraphState', relabel: bool = True) -> 'SubGraphState':
        if relabel and (set(self.nodes) & set(other.nodes)):
            shift = max(self.nodes) - min(other.nodes) + 1
            other.shift_labels(shift)
        graph = nx.compose(self.graph, other.graph)
        for i in other.nodes_state:
            assert i not in self.nodes_state, 'Do NOT use repeated nodes for states'
        nodes_state = self.nodes_state + other.nodes_state
        s1 = np.asarray(to_numpy(self.state))
        s2 = np.asarray(to_numpy(other.state))
        state = np.kron(s1.reshape(-1, 1), s2.reshape(-1, 1))
        sgs = SubGraphState(nodes_state, state, list(graph.edges(data=True)), list(graph.nodes))
        sgs.measure_dict = defaultdict(list)
        sgs.measure_dict.update(self.measure_dict)
        sgs.measure_dict.update(other.measure_dict)
        return sgs

    def update_node2wire_dict(self) -> dict:
        if self.nodes_out_seq is None:
            nodes = list(self.nodes)
            wires = inverse_permutation(np.argsort(nodes).tolist())
            self.node2wire_dict = dict(zip(nodes, wires))
        else:
            self.node2wire_dict = {node: i for i, node in enumerate(self.nodes_out_seq)}
        return self.node2wire_dict

    def draw(self, **kwargs):
        nx.draw(self.graph, with_labels=True, **kwargs)

    def __repr__(self):
        return f'SubGraphState(nodes_state={self.nodes_state}, nodes={list(self.nodes)})'


class GraphState:
    """Graph state = list of SubGraphStates (reference mbqc/state.py:210)."""

    def __init__(self, nodes_state=None, state: Any = 'plus', edges=None, nodes=None) -> None:
        self.subgraphs = [SubGraphState(nodes_state, state, edges, nodes)]
        self.nodes_out_seq = None

    def add_subgraph(self, nodes_state=None, state='plus', edges=None, nodes=None,
                     measure_dict=None, index=None) -> None:
        sgs = SubGraphState(nodes_state, state, edges, nodes)
        if measure_dict is not None:
            sgs.measure_dict = measure_dict
        if index is None:
            self.subgraphs.append(sgs)
        else:
            self.subgraphs.insert(index, sgs)

    @property
    def graph(self) -> SubGraphState:
        graph = None
        for sg in self.subgraphs:
            graph = sg if graph is None else graph.compose(sg, relabel=True)
        graph.set_nodes_out_seq(self.nodes_out_seq)
        return graph

    @property
    def full_state(self):
        return self.graph.full_state

    @property
    def measure_dict(self) -> dict:
        return self.graph.measure_dict

    def set_nodes_out_seq(self, nodes=None) -> None:
        self.nodes_out_seq = nodes
