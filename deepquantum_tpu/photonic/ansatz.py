"""Photonic ansatz circuits (reference src/deepquantum/photonic/ansatz.py).

Porting note: the Clements ``dict2data`` angle-ordering loops mirror the
reference exactly — the (column, mode) -> parameter-slot mapping is a fixed
hardware convention that decomposition parity tests pin bit-for-bit.
"""

from __future__ import annotations

import copy
from typing import Any

import networkx as nx
import numpy as np
from scipy.optimize import root

from .circuit import QumodeCircuit
from .qmath import takagi
from .state import FockState

__all__ = ['Clements', 'GaussianBosonSampling', 'GraphGBS']


class Clements(QumodeCircuit):
    """Trainable rectangular MZI mesh (reference photonic/ansatz.py:17)."""

    def __init__(self, nmode: int, init_state: Any, cutoff: int | None = None,
                 basis: bool = True, phi_first: bool = True, noise: bool = False,
                 mu: float = 0, sigma: float = 0.1) -> None:
        super().__init__(nmode=nmode, init_state=init_state, cutoff=cutoff, basis=basis,
                         name='Clements', noise=noise, mu=mu, sigma=sigma)
        self.phi_first = phi_first
        wires = list(range(nmode))
        self.wires = wires
        wires1 = wires[1::2]
        wires2 = wires[2::2]
        if not phi_first:
            for wire in wires:
                self.ps(wire, encode=True)
        for i in range(nmode):
            if i % 2 == 0:
                for w in wires1:
                    self.mzi([w - 1, w], phi_first=phi_first, encode=True)
            else:
                for w in wires2:
                    self.mzi([w - 1, w], phi_first=phi_first, encode=True)
        if phi_first:
            for wire in wires:
                self.ps(wire, encode=True)

    def dict2data(self, angle_dict: dict) -> np.ndarray:
        """Angle dict {(mode, column): angle} -> circuit input data (reference photonic/ansatz.py:58)."""
        angle_dict = {k: np.asarray(v).reshape(-1) for k, v in angle_dict.items()}
        data = []
        columns = np.zeros(self.nmode, dtype=np.int64)
        wires1 = self.wires[1::2]
        wires2 = self.wires[2::2]
        if not self.phi_first:
            for i in range(self.nmode):
                data.append(angle_dict[(i, columns[i])])
                columns[i] += 1
        for i in range(self.nmode):
            wires_col = wires1 if i % 2 == 0 else wires2
            for w in wires_col:
                wire = w - 1
                if self.phi_first:
                    phi = angle_dict[(wire, columns[wire])]
                    theta = angle_dict[(wire, columns[wire] + 1)]
                else:
                    theta = angle_dict[(wire, columns[wire])]
                    phi = angle_dict[(wire, columns[wire] + 1)]
                data.append(theta)
                data.append(phi)
                columns[wire] += 2
        if self.phi_first:
            for i in range(self.nmode):
                data.append(angle_dict[(i, columns[i])])
                columns[i] += 1
        return np.concatenate(data)


class GaussianBosonSampling(QumodeCircuit):
    """GBS: squeezers + Clements mesh (reference photonic/ansatz.py:106)."""

    def __init__(self, nmode: int, squeezing: Any, unitary: Any, cutoff: int | None = None,
                 backend: str = 'gaussian', basis: bool = True, detector: str = 'pnrd',
                 noise: bool = False, mu: float = 0, sigma: float = 0.1) -> None:
        squeezing = np.asarray(squeezing).reshape(-1)
        unitary = np.asarray(unitary, dtype=np.complex128).reshape(-1, nmode)
        assert unitary.shape[-1] == unitary.shape[-2] == nmode
        assert np.allclose(unitary @ unitary.conj().T, np.eye(nmode), atol=1e-4)
        if cutoff is None:
            cutoff = 3
        super().__init__(nmode=nmode, init_state='vac', cutoff=cutoff, backend=backend,
                         basis=basis, detector=detector, name='GBS', noise=noise,
                         mu=mu, sigma=sigma)
        for i in range(self.nmode):
            self.s(i, float(squeezing[i]))
        self.clements(unitary)


class GraphGBS(GaussianBosonSampling):
    """GBS encoding of a graph adjacency matrix (reference photonic/ansatz.py:148)."""

    def __init__(self, adj_mat: Any, cutoff: int | None = None,
                 mean_photon_num: int | None = None, detector: str = 'pnrd',
                 noise: bool = False, mu: float = 0, sigma: float = 0.1) -> None:
        adj_mat = np.asarray(adj_mat)
        assert np.allclose(adj_mat, adj_mat.T)
        self.adj_mat = adj_mat
        nmode = adj_mat.shape[-1]
        if mean_photon_num is None:
            mean_photon_num = nmode
        unitary, lambd = takagi(adj_mat)
        c = self.norm_factor_c(mean_photon_num, np.asarray(lambd))[0]
        self.c = c
        squeezing = np.arctanh(np.asarray(lambd) * c)
        super().__init__(nmode=nmode, squeezing=squeezing, unitary=np.asarray(unitary),
                         cutoff=cutoff, backend='gaussian', basis=False, detector=detector,
                         noise=noise, mu=mu, sigma=sigma)
        self.name = 'GraphGBS'

    @staticmethod
    def norm_factor_c(n_num, lambd, trials: int = 20):
        """Normalization c of squeezing for a target mean photon number
        (reference photonic/ansatz.py:191)."""
        lambd = np.array(lambd)

        def f(c, lambd, n_num):
            ave_n = (lambd * c) ** 2 / (1 - (lambd * c) ** 2)
            return sum(ave_n) - n_num

        sol = []
        for _ in range(trials):
            x0 = np.random.uniform(0, 1 / max(lambd), 1)[0]
            re = root(f, x0, (lambd, n_num))
            if 0 < re.x < 1 / max(lambd):
                sol.append(re.x[0])
        return sol

    @staticmethod
    def postselect(samples: dict, nodes_list: list) -> list:
        """Postselect samples by total photon number (reference photonic/ansatz.py:206)."""
        dic_list = [{} for _ in range(len(nodes_list))]
        for key in samples:
            tot = sum(key.state.tolist()) if isinstance(key, FockState) else sum(key)
            if tot in nodes_list:
                dic_list[nodes_list.index(tot)][key] = samples[key]
        return dic_list

    @staticmethod
    def graph_density(graph: nx.Graph, samples: dict) -> dict:
        """Subgraph densities of sampled patterns (reference photonic/ansatz.py:219)."""
        samples_ = copy.deepcopy(samples)
        out = {}
        for key in samples_:
            bits = key.state.tolist() if isinstance(key, FockState) else list(key)
            idx = [i for i, b in enumerate(bits) if b]
            density = nx.density(graph.subgraph(idx))
            out[key] = [samples_[key], density]
        return dict(sorted(out.items(), key=lambda kv: -kv[1][1]))
