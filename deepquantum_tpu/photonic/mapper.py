"""UnitaryMapper: solve for an optical unitary realizing a qubit gate under
dual-rail encoding with post-selection.

Functional counterpart of reference src/deepquantum/photonic/mapper.py:18-463.
The reference builds symbolic permanent equations (sympy) and roots them with
random restarts; here the same defining equations

    <out_i| U_optical |in_j>  =  success * U_gate[i, j]

are solved directly with scipy.optimize.least_squares over the (real or
complex) entries of the nmode x nmode matrix, with unitarity residuals.
"""

from __future__ import annotations

import itertools
from math import factorial

import numpy as np
from scipy.optimize import least_squares

__all__ = ['UnitaryMapper']


def _permanent_np(mat: np.ndarray) -> complex:
    n = mat.shape[0]
    if n == 0:
        return 1.0
    total = 0.0
    for idx in range(1, 1 << n):
        subset = [i for i in range(n) if (idx >> i) & 1]
        prod = np.prod(mat[subset].sum(axis=0))
        total += (-1) ** len(subset) * prod
    return (-1) ** n * total


class UnitaryMapper:
    """Map a qubit gate to an optical unitary (API parity with reference mapper.py:18)."""

    def __init__(self, nqubit: int, nmode: int, ugate, success: float,
                 aux: list | None = None, aux_pos: list | None = None) -> None:
        assert 2 * nqubit <= nmode, 'need more modes'
        self.nqubit = nqubit
        self.nmode = nmode
        self.ugate = np.asarray(ugate, dtype=complex)
        self.success = success
        self.aux = aux
        if aux_pos is None:
            aux_pos = [nmode - 2, nmode - 1]
        self.aux_position = aux_pos
        self.basis = self.create_basis(aux_pos if aux else [])

    def create_basis(self, aux_position) -> list[np.ndarray]:
        """Dual-rail computational basis states (reference mapper.py:90)."""
        main = [i for i in range(self.nmode) if i not in aux_position]
        out = []
        temp = [[1, 0], [0, 1]]
        for state in itertools.product([0, 1], repeat=self.nqubit):
            dual = []
            for s in state:
                dual.extend(temp[s])
            b = np.zeros(self.nmode, dtype=np.int64)
            if self.aux:
                b[np.asarray(aux_position)] = np.asarray(self.aux)
            b[np.asarray(main[:2 * self.nqubit])] = np.asarray(dual)
            out.append(b)
        return out

    @staticmethod
    def _sub_matrix(u, in_state, out_state):
        cols = np.repeat(np.arange(len(in_state)), in_state)
        rows = np.repeat(np.arange(len(out_state)), out_state)
        return u[np.ix_(rows, cols)]

    def get_transfer_mat(self, u: np.ndarray) -> np.ndarray:
        """Post-selected transfer amplitudes between dual-rail basis states
        (reference mapper.py:178)."""
        dim = len(self.basis)
        t = np.zeros((dim, dim), dtype=complex)
        for j, bin_ in enumerate(self.basis):
            norm_in = np.sqrt(np.prod([factorial(int(x)) for x in bin_]))
            for i, bout in enumerate(self.basis):
                norm_out = np.sqrt(np.prod([factorial(int(x)) for x in bout]))
                sub = self._sub_matrix(u, bin_, bout)
                t[i, j] = _permanent_np(sub) / (norm_in * norm_out)
        return t

    def _residuals(self, y: np.ndarray, complex_u: bool) -> np.ndarray:
        m = self.nmode
        if complex_u:
            u = (y[:m * m] + 1j * y[m * m:]).reshape(m, m)
        else:
            u = y.reshape(m, m).astype(complex)
        t = self.get_transfer_mat(u)
        target = self.success * self.ugate
        res = (t - target)
        unit = u @ u.conj().T - np.eye(m)
        parts = [res.real.ravel(), res.imag.ravel(), unit.real.ravel(), unit.imag.ravel()]
        return np.concatenate(parts)

    def solve_eqs_real(self, total_trials: int = 10, trials: int = 1000,
                       precision: float = 1e-6):
        """Random-restart least squares over real orthogonal candidates
        (reference mapper.py:281)."""
        return self._solve(total_trials, precision, complex_u=False)

    def solve_eqs_complex(self, total_trials: int = 10, trials: int = 1000,
                          precision: float = 1e-5):
        """Random-restart least squares over complex unitary candidates
        (reference mapper.py:304)."""
        return self._solve(total_trials, precision, complex_u=True)

    def _solve(self, total_trials, precision, complex_u):
        m = self.nmode
        solutions = []
        rng = np.random.default_rng(0)
        for _ in range(total_trials):
            y0 = rng.standard_normal(2 * m * m if complex_u else m * m) * 0.5
            sol = least_squares(self._residuals, y0, args=(complex_u,),
                                xtol=1e-14, ftol=1e-14, gtol=1e-14)
            if np.max(np.abs(sol.fun)) < precision:
                if complex_u:
                    u = (sol.x[:m * m] + 1j * sol.x[m * m:]).reshape(m, m)
                else:
                    u = sol.x.reshape(m, m).astype(complex)
                solutions.append(u)
        return solutions

    @staticmethod
    def is_unitary(u, atol: float = 1e-5) -> bool:
        u = np.asarray(u)
        return np.allclose(u @ u.conj().T, np.eye(u.shape[-1]), atol=atol)

    @staticmethod
    def plot_u(unitary, vmax=1, vmin=0, fs=20, len_ticks=5, cl='RdBu'):
        """Heatmap of |U| (reference mapper.py:417)."""
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots()
        im = ax.imshow(np.abs(np.asarray(unitary)), vmax=vmax, vmin=vmin, cmap=cl)
        fig.colorbar(im)
        return fig
