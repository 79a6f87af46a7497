"""MBQC graph states — native adjacency-dict representation.

Functional counterpart of reference src/deepquantum/mbqc/state.py (SubGraph
state container + GraphState list-of-subgraphs), redesigned around this
runner's execution profile instead of the reference's networkx objects:

- A pattern run touches its subgraphs THOUSANDS of times (one lookup or
  rebuild per command), so the graph is a plain insertion-ordered node dict
  plus an {edge: cz-flag} dict — no networkx construction per command
  (profiled: nx.Graph building dominated simulate latency at n=7; the nx
  view is built on demand only for drawing).
- ``full_state`` materializes the 2^k state in ONE numpy kron plus a single
  CZ sign-vector pass over the cz-flagged edges (the reference simulates
  every CZ through a QubitCircuit — 58 s vs 29 ms on the transpile parity
  suite).
- States stay host-numpy throughout: pattern execution is inherently
  sequential tiny-state work, the worst case for a (remote) accelerator.

Semantics pinned to the reference for pattern-vs-circuit parity: the
nodes_state cycle convention (cz=False ring), later edge flags overwriting
earlier ones on duplicate insertion, node2wire = rank in sorted node order,
and the compose/shift_labels relabeling rules (reference mbqc/state.py:
17-288).
"""

from __future__ import annotations

from collections import defaultdict
from functools import reduce
from typing import Any

import numpy as np

from ..config import cdtype
from ..ops.qmath import inverse_permutation
from ..state import QubitState
from ..utils.compat import to_numpy

__all__ = ['SubGraphState', 'GraphState']


def _ekey(a, b):
    return (a, b) if a <= b else (b, a)


class SubGraphState:
    """A subgraph state: adjacency dicts + input state on ``nodes_state``.

    Mirrors the reference SubGraphState API (reference mbqc/state.py:17)
    over native dict storage: ``_nodes`` is an insertion-ordered node set,
    ``_edges`` maps a normalized (a, b) pair to its cz flag.
    """

    def __init__(self, nodes_state=None, state: Any = 'plus', edges=None, nodes=None) -> None:
        self.nodes_out_seq = None
        self.set_graph(nodes_state, edges, nodes)
        self.set_state(state)
        self.measure_dict = defaultdict(list)

    @property
    def nodes(self):
        return self._nodes.keys()

    @property
    def edges(self):
        """Edge list with data dicts (networkx-shaped, for callers/tests)."""
        return [(a, b, {'cz': cz}) for (a, b), cz in self._edges.items()]

    @property
    def graph(self):
        """On-demand networkx view (drawing / external interop only — the
        runner itself never builds one)."""
        import networkx as nx
        g = nx.Graph()
        g.add_nodes_from(self._nodes)
        g.add_edges_from(self.edges)
        return g

    @property
    def full_state(self):
        """Materialize the subgraph: one kron of |+> onto the background
        nodes, then every cz-flagged edge as a sign mask on the index bits."""
        nqubit = len(self._nodes)
        n2w = self.node2wire_dict
        nodes_bg = [v for v in self._nodes if v not in self.nodes_state]
        wires = [0] + [n2w[v] + 1 for v in self.nodes_state + nodes_bg]
        plus = np.array([[1], [1]], dtype=cdtype()) / 2 ** 0.5
        state = np.asarray(to_numpy(self.state)).reshape(-1, 1)
        init = reduce(np.kron, [plus] * len(nodes_bg), state)
        init = init.reshape([-1] + [2] * nqubit)
        init = np.transpose(init, inverse_permutation(wires)).reshape(-1, 2 ** nqubit)
        ar = np.arange(2 ** nqubit)
        sign = np.ones(2 ** nqubit)
        for (a, b), cz in self._edges.items():
            if cz:
                ba = (ar >> (nqubit - 1 - n2w[a])) & 1
                bb = (ar >> (nqubit - 1 - n2w[b])) & 1
                sign = sign * (1.0 - 2.0 * (ba & bb))
        out = (init * sign).astype(cdtype())
        return out[0][:, None] if out.shape[0] == 1 else out[..., None]

    def set_graph(self, nodes_state=None, edges=None, nodes=None) -> None:
        if nodes_state is None:
            nodes_state = []
        elif isinstance(nodes_state, int):
            nodes_state = list(range(nodes_state))
        if nodes is None:
            nodes = []
        elif isinstance(nodes, int):
            nodes = [nodes]
        self.nodes_state = list(nodes_state)
        self._nodes: dict = {}
        self._edges: dict = {}
        for v in nodes_state:
            self._nodes.setdefault(v, None)
        if len(nodes_state) > 1:
            # input-state ring (cz=False), the reference's nodes_state cycle
            ring = list(nodes_state)
            for a, b in zip(ring, ring[1:] + ring[:1]):
                self._edges[_ekey(a, b)] = False
        for e in edges or []:
            # (a, b) pairs default cz=True; (a, b, data) triples carry their
            # flag; later insertions overwrite (networkx add_edges_from rule)
            a, b = e[0], e[1]
            cz = e[2].get('cz', True) if len(e) > 2 else True
            self._nodes.setdefault(a, None)
            self._nodes.setdefault(b, None)
            self._edges[_ekey(a, b)] = cz
        for v in nodes:
            self._nodes.setdefault(v, None)
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
            self.state = (reduce(np.kron, [base] * nqubit)
                          if nqubit > 0 else np.ones((), cdtype()))
            return
        if nqubit > 0:
            # QubitState keeps host numpy (state.py:41) — no device traffic
            self.state = QubitState(nqubit, np.asarray(to_numpy(state))).state
        else:
            self.state = np.ones((), cdtype())

    def set_nodes_out_seq(self, nodes=None) -> None:
        if nodes is not None:
            assert len(nodes) == len(self._nodes)
            assert set(nodes) == set(self._nodes)
        self.nodes_out_seq = nodes
        self.update_node2wire_dict()

    def add_nodes(self, nodes) -> None:
        if isinstance(nodes, int):
            nodes = [nodes]
        for v in nodes:
            self._nodes.setdefault(v, None)
        self.update_node2wire_dict()

    def add_edges(self, edges) -> None:
        for a, b in edges:
            self._nodes.setdefault(a, None)
            self._nodes.setdefault(b, None)
            self._edges[_ekey(a, b)] = True
        self.update_node2wire_dict()

    def shift_labels(self, n: int) -> None:
        self._nodes = {v + n: None for v in self._nodes}
        self._edges = {(a + n, b + n): cz for (a, b), cz in self._edges.items()}
        self.nodes_state = [s + n for s in self.nodes_state]
        self.measure_dict = defaultdict(
            list, {k + n: v for k, v in self.measure_dict.items()})
        self.update_node2wire_dict()

    def compose(self, other: 'SubGraphState', relabel: bool = True) -> 'SubGraphState':
        """Merge two subgraphs (kron of states; other's duplicate edge flags
        win, as in nx.compose)."""
        if relabel and (set(self._nodes) & set(other._nodes)):
            other.shift_labels(max(self._nodes) - min(other._nodes) + 1)
        for i in other.nodes_state:
            assert i not in self.nodes_state, 'Do NOT use repeated nodes for states'
        merged = {**self._edges, **other._edges}
        edges = [(a, b, {'cz': cz}) for (a, b), cz in merged.items()]
        nodes = list(self._nodes) + [v for v in other._nodes if v not in self._nodes]
        s1 = np.asarray(to_numpy(self.state))
        s2 = np.asarray(to_numpy(other.state))
        state = np.kron(s1.reshape(-1, 1), s2.reshape(-1, 1))
        sgs = SubGraphState(self.nodes_state + other.nodes_state, state, edges, nodes)
        sgs.measure_dict = defaultdict(list)
        sgs.measure_dict.update(self.measure_dict)
        sgs.measure_dict.update(other.measure_dict)
        return sgs

    def update_node2wire_dict(self) -> dict:
        if self.nodes_out_seq is None:
            nodes = list(self._nodes)
            wires = inverse_permutation(np.argsort(nodes).tolist())
            self.node2wire_dict = dict(zip(nodes, wires))
        else:
            self.node2wire_dict = {node: i for i, node in enumerate(self.nodes_out_seq)}
        return self.node2wire_dict

    def draw(self, **kwargs):
        import networkx as nx
        nx.draw(self.graph, with_labels=True, **kwargs)

    def __repr__(self):
        return f'SubGraphState(nodes_state={self.nodes_state}, nodes={list(self._nodes)})'


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

    def node_set(self) -> set:
        """Union of all subgraph node sets WITHOUT composing (composing krons
        every state vector — an O(2^k) copy just to answer membership)."""
        out: set = set()
        for sg in self.subgraphs:
            out.update(sg.nodes)
        return out

    def find_subgraph(self, node) -> int:
        """Index of the subgraph owning ``node`` (-1 when absent)."""
        for i, sg in enumerate(self.subgraphs):
            if node in sg.nodes:
                return i
        return -1

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
