"""Gradient-free optimizers for on-chip training (reference src/deepquantum/optimizer.py).

Host-side numpy logic; the target function typically wraps a jitted circuit
evaluation. OptimizerBayesian requires the optional ``bayes_opt`` package and
degrades with a clear error when absent.
"""

from __future__ import annotations

import copy

import numpy as np

__all__ = ['Optimizer', 'OptimizerBayesian', 'OptimizerSPSA', 'OptimizerFourier']


class Optimizer:
    """Base class (reference optimizer.py:11)."""

    def __init__(self, target_func, param_init, random_state: int = 0):
        self.target_func = target_func
        if isinstance(param_init, dict):
            self.param_dict = copy.deepcopy(param_init)
        else:
            arr = np.asarray(param_init, dtype=float).reshape(-1)
            self.param_dict = {f'x_{i}': arr[i] for i in range(len(arr))}
        self.random_state = random_state

    def __str__(self) -> str:
        return 'Optimizer'


class OptimizerBayesian(Optimizer):
    """Bayesian optimization over [0, 2pi] bounds (reference optimizer.py:41)."""

    def __init__(self, target_func, param_init, random_state: int = 0):
        super().__init__(target_func, param_init, random_state)
        try:
            from bayes_opt import BayesianOptimization, UtilityFunction
        except ImportError as exc:  # pragma: no cover
            raise ImportError('OptimizerBayesian requires the bayes_opt package') from exc

        def func_to_maximize(**param_dict):
            return -self.target_func(**param_dict)

        self.pbounds = {k: (0, 2 * np.pi) for k in self.param_dict}
        self.optimizer = BayesianOptimization(f=func_to_maximize, pbounds=self.pbounds,
                                              random_state=self.random_state)
        self.util = UtilityFunction(kind='ucb', kappa=2.576, xi=0.0, kappa_decay=1,
                                    kappa_decay_delay=0)
        self.best_param_dict = copy.deepcopy(self.param_dict)
        self.best_target = -np.inf
        self.iter = 0

    def param_suggest(self) -> np.ndarray:
        self.util.update_params()
        x_probe = self.optimizer.suggest(self.util)
        x = self.optimizer._space._as_array(x_probe)
        return np.asarray(x).reshape(-1)

    def param_register(self, param_array, target) -> None:
        for i in range(len(param_array)):
            x = param_array[i]
            param_dict = dict(zip(self.param_dict.keys(), x, strict=True))
            self.optimizer._space.register(x, target[i])
            if target[i] > self.best_target:
                self.best_param_dict = copy.deepcopy(param_dict)
                self.best_target = target[i]
        self.iter += 1

    def run(self, nstep: int, if_print: bool = False) -> list:
        for step in range(nstep):
            p1 = self.param_suggest()
            f1 = -float(self.target_func(p1))
            if if_print:
                print(step, '|', -f1)
            self.param_register([p1], [f1])
        return list(self.best_param_dict.values())


class OptimizerSPSA(Optimizer):
    """Simultaneous perturbation stochastic approximation (reference optimizer.py:113)."""

    def __init__(self, target_func, param_init, random_state: int = 0):
        super().__init__(target_func, param_init, random_state)
        self.random_state_ori = np.random.get_state()
        np.random.seed(self.random_state)
        self.hyperparam = {'a': 1e-1, 'c': 1e-2, 'A': 200, 'nepoch': 2000,
                           'alpha': 0.602, 'gamma': 0.101}
        self.iter = 0
        self.nparam = len(self.param_dict)
        self.best_param_dict = copy.deepcopy(self.param_dict)
        self.best_target = np.inf

    def set_hyperparam(self, hyperparam: dict) -> None:
        self.hyperparam = hyperparam

    def param_suggest(self) -> np.ndarray:
        tmp = np.asarray(list(self.param_dict.values()))
        delta_lr = self.hyperparam['c'] / (1 + self.iter) ** self.hyperparam['gamma']
        delta = (np.random.randint(0, 2, self.nparam) * 2 - 1) * delta_lr
        return np.stack([tmp - delta, tmp + delta])

    def param_register(self, param_array, target) -> None:
        assert len(param_array) == 2 and len(target) == 2
        lr = self.hyperparam['a'] / (1 + self.iter + self.hyperparam['A']) ** self.hyperparam['alpha']
        p1, p2 = np.asarray(param_array[0]), np.asarray(param_array[1])
        t1, t2 = target
        grad = (t2 - t1) / (p2 - p1)
        new = 0.5 * (p1 + p2) - lr * grad
        self.param_dict = dict(zip(self.param_dict.keys(), new, strict=True))
        self.iter += 1
        if t1 < self.best_target:
            self.best_param_dict = dict(zip(self.param_dict.keys(), p1, strict=True))
            self.best_target = t1
        if t2 < self.best_target:
            self.best_param_dict = dict(zip(self.param_dict.keys(), p2, strict=True))
            self.best_target = t2

    def ori_random_state(self) -> None:
        np.random.set_state(self.random_state_ori)

    def run(self, nstep: int, if_print: bool = False) -> list:
        for step in range(nstep):
            p1, p2 = self.param_suggest()
            f1 = float(self.target_func(p1))
            f2 = float(self.target_func(p2))
            self.param_register([p1, p2], [f1, f2])
            if if_print:
                print(step, '|', f1, f2)
        return list(self.best_param_dict.values())


class OptimizerFourier(Optimizer):
    """Fourier-series gradient approximation (reference optimizer.py:191)."""

    def __init__(self, target_func, param_init, order: int = 5, lr: float = 0.1,
                 random_state: int = 0):
        super().__init__(target_func, param_init, random_state)
        self.iter = 0
        self.r = order
        self.nparam = len(self.param_dict)
        self.best_param_dict = copy.deepcopy(self.param_dict)
        self.best_target = np.inf
        self.lr = lr
        self.a = self.gen_a()
        self.u = np.zeros((2 * order + 1) * self.nparam)

    def gen_a(self) -> np.ndarray:
        r = self.r
        a = np.zeros((2 * r + 1, 2 * r + 1))
        mu = np.arange(2 * r + 1)
        x_mu = 2 * np.pi * (mu - r) / (2 * r + 1)
        a[:, 0] = 1
        a[:, 1:r + 1] = np.cos(x_mu.reshape(-1, 1) @ np.arange(1, r + 1).reshape(1, -1))
        a[:, r + 1:2 * r + 2] = np.sin(x_mu.reshape(-1, 1) @ np.arange(1, r + 1).reshape(1, -1))
        return a

    def param_suggest(self) -> np.ndarray:
        r = self.r
        tmp = np.asarray(list(self.param_dict.values()), dtype=float).reshape(1, -1)
        mu = np.arange(2 * r + 1)
        varied = 2 * np.pi * (mu - r) / (2 * r + 1)
        arr = np.repeat(tmp, self.nparam * (2 * r + 1), axis=0)
        for pid in range(self.nparam):
            arr[pid * (2 * r + 1):(pid + 1) * (2 * r + 1), pid] = varied
        return arr

    def param_register(self, param_array, target) -> None:
        r = self.r
        target = np.asarray(target)
        param = np.asarray(list(self.param_dict.values()))
        for pid in range(self.nparam):
            i1, i2 = pid * (2 * r + 1), (1 + pid) * (2 * r + 1)
            self.u[i1:i2] = np.linalg.solve(self.a, target[i1:i2])
        grad = np.zeros(self.nparam)
        for pid in range(self.nparam):
            theta = param[pid]
            idx = 1 + pid * (2 * r + 1)
            ks = np.arange(1, r + 1)
            grad[pid] = (-(ks * np.sin(theta * ks)) @ self.u[idx:r + idx]
                         + (ks * np.cos(theta * ks)) @ self.u[r + idx:2 * r + idx])
        new = param - self.lr * grad
        self.param_dict = dict(zip(self.param_dict.keys(), new, strict=True))
        if target.min() < self.best_target:
            self.best_target = target.min()
            self.best_param_dict = dict(zip(self.param_dict.keys(),
                                            param_array[target.argmin()], strict=True))
        self.iter += 1

    def run(self, nstep: int, if_print: bool = False) -> list:
        for step in range(nstep):
            arr = self.param_suggest()
            target = np.array([float(self.target_func(arr[i])) for i in range(len(arr))])
            self.param_register(arr, target)
            if if_print:
                print(step, '|', target.min())
        return list(self.best_param_dict.values())
