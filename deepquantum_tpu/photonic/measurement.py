"""Photonic mid-circuit measurements (reference src/deepquantum/photonic/measurement.py).

Generaldyne: Gaussian conditioning via the Schur complement (Serafini
Eq.5.143-144); Bosonic states additionally reweight their Gaussian components
(arXiv:2103.05530 Eq.35-37). Homodyne: eps-squeezed limit of Generaldyne; for
Fock tensors it projects onto a displaced infinitely-squeezed vacuum.
"""

from __future__ import annotations

from math import factorial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from ..config import cdtype, rdtype
from ..ops.apply import evolve_den_mat, evolve_state
from ..ops.qmath import next_key
from . import gates as PG

__all__ = ['Generaldyne', 'Homodyne', 'GeneralBosonic', 'PhotonNumberResolvingBosonic']


def _mvn_sample(key, mean, cov, shape=()):
    """Multivariate normal sampling via Cholesky (batched)."""
    chol = jnp.linalg.cholesky(cov)
    z = jax.random.normal(key, shape + mean.shape)
    return mean + jnp.einsum('...ij,...j->...i', chol, z)


class Generaldyne:
    """General-dyne measurement on a Gaussian/Bosonic state (reference measurement.py:19)."""

    def __init__(self, cov_m: Any, nmode: int = 1, wires=None, cutoff: int | None = None,
                 den_mat: bool = False, name: str = 'Generaldyne', noise: bool = False,
                 mu: float = 0, sigma: float = 0.1) -> None:
        self.nmode = nmode
        if wires is None:
            wires = list(range(nmode))
        self.wires = [wires] if isinstance(wires, int) else list(wires)
        self.cutoff = 2 if cutoff is None else cutoff
        self.den_mat = den_mat
        self.name = name
        nwire = len(self.wires)
        self.cov_m = np.asarray(cov_m, dtype=np.float64).reshape(2 * nwire, 2 * nwire)
        self.samples = None
        self.npara = 0
        self._jit_cache: dict = {}

    def forward(self, x: list, samples=None, key=None) -> list:
        # The full Schur conditioning runs under one jit: eager per-primitive
        # dispatch of complex/zero-size gathers is UNIMPLEMENTED on some TPU
        # attachment paths, and one compiled call is faster anyway.
        if key is None:
            key = next_key()
        bosonic = len(x) > 2
        have_samples = samples is not None
        samples_arr = None if samples is None else jnp.asarray(samples, rdtype())
        cache_key = (bosonic, have_samples, jnp.shape(x[0]), jnp.shape(x[1]),
                     None if samples_arr is None else samples_arr.shape)
        fn = self._jit_cache.get(cache_key)
        if fn is None:
            fn = jax.jit(self._conditioned)
            self._jit_cache[cache_key] = fn
        cov_out, mean_out, weight_out, mean_m = fn(
            jnp.asarray(x[0]), jnp.asarray(x[1]),
            jnp.asarray(x[2]) if bosonic else None, key, samples_arr)
        self.samples = mean_m
        return [cov_out, mean_out] if weight_out is None else [cov_out, mean_out, weight_out]

    def _conditioned(self, cov, mean, weight, key, samples_arr):
        n = self.nmode
        wires = np.asarray(self.wires)
        idx = np.concatenate([wires, wires + n])
        idx_rest = np.array([i for i in range(2 * n) if i not in idx], dtype=np.int64)
        cov_a = cov[..., idx_rest[:, None], idx_rest]
        cov_b = cov[..., idx[:, None], idx]
        cov_ab = cov[..., idx_rest[:, None], idx]
        mean_a = mean[..., idx_rest, :]
        mean_b = mean[..., idx, :]
        cov_t = cov_b + jnp.asarray(self.cov_m, cov.dtype)

        cov_a = cov_a - cov_ab @ jnp.linalg.solve(cov_t, jnp.swapaxes(cov_ab, -1, -2))
        eye = jnp.eye(2 * n, dtype=cov.dtype)
        cov_out = jnp.broadcast_to(eye, cov.shape)
        cov_out = cov_out.at[..., idx_rest[:, None], idx_rest].set(cov_a)

        if weight is None:  # Gaussian
            if samples_arr is None:
                mean_m = _mvn_sample(key, mean_b.squeeze(-1), cov_t)
            else:
                mean_m = samples_arr.astype(cov.dtype).reshape(mean_b.shape[:-2] + (2 * len(self.wires),))
            mean_a = mean_a + cov_ab @ jnp.linalg.solve(cov_t, mean_m[..., None] - mean_b)
            mean_out = jnp.zeros_like(mean).at[..., idx_rest, :].set(mean_a)
            return cov_out, mean_out, None, mean_m
        # Bosonic: reweight the Gaussian components (arXiv:2103.05530 Eq.35-37)
        if samples_arr is None:
            mean_m = self._sample_bosonic(key, cov_t, mean_b, weight)  # (batch, 2w)
        else:
            mean_m = samples_arr.reshape(1, -1)
        mean_m = mean_m.reshape(-1, mean_m.shape[-1])
        rm = mean_m[:, None, :, None].astype(mean_b.dtype)  # (batch, 1, 2w, 1)
        mb_im = jnp.imag(mean_b).astype(cov.dtype)
        mb_re = jnp.real(mean_b).astype(cov.dtype)
        exp_real = jnp.exp(jnp.swapaxes(mb_im, -1, -2) @ jnp.linalg.solve(cov_t, mb_im) / 2).squeeze((-1, -2))
        diff = jnp.real(rm).astype(cov.dtype) - mb_re
        quad = (jnp.swapaxes(diff, -1, -2) @ jnp.linalg.solve(cov_t, diff)).squeeze((-1, -2))
        det = jnp.linalg.det(2 * jnp.pi * cov_t)
        prob_g = jnp.exp(-quad / 2) / jnp.sqrt(det)
        exp_imag = jnp.exp(1j * (jnp.swapaxes(diff, -1, -2).astype(mean_b.dtype)
                                 @ jnp.linalg.solve(cov_t.astype(mean_b.dtype), 1j * mb_im.astype(mean_b.dtype)) / 1j
                                 ).squeeze((-1, -2)))
        weight = weight * exp_real * prob_g * exp_imag
        weight = weight / jnp.sum(weight, axis=-1, keepdims=True)
        mean_a = mean_a + cov_ab.astype(mean_b.dtype) @ jnp.linalg.solve(cov_t.astype(mean_b.dtype), rm - mean_b)
        mean_out = jnp.zeros_like(mean).at[..., idx_rest, :].set(mean_a)
        return cov_out, mean_out, weight, mean_m

    def _sample_bosonic(self, key, cov_t, mean_b, weight):
        """Rejection-free approximate sampling, one draw per batch row: pick a
        component by |weight|, then sample its real Gaussian (the reference
        uses rejection sampling, qmath.py:559)."""
        batch = mean_b.shape[0]
        ncomb = mean_b.shape[1]
        w = jnp.abs(jnp.real(weight))
        w = jnp.broadcast_to(w, (batch, ncomb))
        w = w / jnp.sum(w, axis=-1, keepdims=True)
        comps = jax.random.categorical(key, jnp.log(w + 1e-38), axis=-1)  # (batch,)
        mb = jnp.real(mean_b)[jnp.arange(batch), comps, :, 0]             # (batch, 2w)
        ct = jnp.broadcast_to(cov_t, (batch, ncomb) + cov_t.shape[-2:])
        ct = ct[jnp.arange(batch), comps]                                 # (batch, 2w, 2w)
        return _mvn_sample(jax.random.fold_in(key, 1), mb, ct)

    __call__ = forward


class Homodyne(Generaldyne):
    """Homodyne measurement (reference measurement.py:126)."""

    def __init__(self, phi: Any = None, nmode: int = 1, wires=None, cutoff: int | None = None,
                 den_mat: bool = False, eps: float = 2e-4, requires_grad: bool = False,
                 noise: bool = False, mu: float = 0, sigma: float = 0.1,
                 name: str = 'Homodyne') -> None:
        if wires is None:
            wires = [0]
        wires = [wires] if isinstance(wires, int) else list(wires)
        cov_m = np.diag(np.array([eps ** 2] * len(wires) + [1 / eps ** 2] * len(wires)))
        super().__init__(cov_m=cov_m, nmode=nmode, wires=wires, cutoff=cutoff,
                         den_mat=den_mat, name=name, noise=noise, mu=mu, sigma=sigma)
        assert len(self.wires) == 1, f'{self.name} must act on one mode'
        if phi is None:
            phi = float(np.random.rand() * 2 * np.pi)
        self.phi = float(np.asarray(phi).reshape(-1)[0])
        self.npara = 1

    def op_cv(self, x: list, samples=None, key=None) -> list:
        """Rotate by -phi then do the x-quadrature generaldyne (reference measurement.py:246)."""
        cov, mean = x[0], x[1]
        s, _ = PG.ps_xp(jnp.array([-self.phi]))
        n = self.nmode
        wires = list(self.wires) + [w + n for w in self.wires]
        ix = np.ix_(wires, wires)
        s_full = jnp.eye(2 * n, dtype=jnp.asarray(cov).dtype).at[ix].set(s.astype(jnp.asarray(cov).dtype))
        cov = s_full @ jnp.asarray(cov) @ s_full.T
        mean = s_full.astype(jnp.asarray(mean).dtype) @ jnp.asarray(mean)
        return super().forward([cov, mean] + list(x[2:]), samples, key)

    def op_fock(self, x: jnp.ndarray, samples=None, key=None) -> jnp.ndarray:
        """Fock-backend homodyne: project onto the displaced infinitely-squeezed
        vacuum eigenstate (reference measurement.py:199)."""
        c = self.cutoff
        n = self.nmode
        x = jnp.asarray(x)
        # rotate by -phi
        r_mat = PG.ps_fock(jnp.array([-self.phi]), c)
        rotated = evolve_state(x.reshape([c] * n), r_mat, n, self.wires, qudit=c) \
            if not self.den_mat else evolve_den_mat(x.reshape([c] * (2 * n)), r_mat, n, self.wires, qudit=c)
        if key is None:
            key = next_key()
        if samples is None:
            sample = _sample_homodyne_fock(rotated, self.wires[0], n, c, key, self.den_mat)
        else:
            sample = float(np.asarray(samples).reshape(-1)[0])
        self.samples = jnp.asarray([sample], rdtype())
        # eigenstate: R(phi) D(alpha) |inf-squeezed vac>
        vac = np.zeros(c, dtype=np.complex128)
        orders = np.arange(int(np.ceil(c / 2)))
        inf_sqz = np.zeros(c, dtype=np.complex128)
        inf_sqz[::2] = ((-0.5) ** orders * np.sqrt([factorial(2 * int(k)) for k in orders])
                        / [factorial(int(k)) for k in orders])
        alpha = sample * config.KAPPA / config.HBAR ** 0.5
        d_mat = PG.disp_fock(jnp.array([abs(alpha), 0.0 if alpha >= 0 else np.pi]), c)
        eigen = d_mat @ jnp.asarray(inf_sqz, cdtype())
        r_back = PG.ps_fock(jnp.array([self.phi]), c)
        eigen = r_back @ eigen
        vac_state = jnp.zeros(c, cdtype()).at[0].set(1)
        project_op = jnp.outer(vac_state, jnp.conj(eigen))
        if self.den_mat:
            out = evolve_den_mat(x.reshape([c] * (2 * n)), project_op, n, self.wires, qudit=c)
            norm = jnp.trace(out.reshape(c ** n, c ** n))
            return out / norm
        out = evolve_state(x.reshape([c] * n), project_op, n, self.wires, qudit=c)
        norm = jnp.sqrt(jnp.sum(jnp.abs(out) ** 2))
        return out / norm

    def forward(self, x, samples=None, key=None):
        if isinstance(x, (list, tuple)):
            return self.op_cv(list(x), samples, key)
        return self.op_fock(x, samples, key)

    __call__ = forward


def _sample_homodyne_fock(state, wire: int, nmode: int, cutoff: int, key, den_mat=False,
                          xrange: float = 10.0, npoints: int = 2000) -> float:
    """Sample the x-quadrature of one mode of a Fock tensor via the reduced
    density matrix and Hermite-function quadrature pdf (reference qmath.py:523)."""
    c = cutoff
    state = jnp.asarray(state)
    if den_mat:
        rho_full = state.reshape(c ** nmode, c ** nmode)
        perm = [wire] + [i for i in range(nmode) if i != wire]
        t = state.reshape([c] * (2 * nmode))
        t = jnp.transpose(t, perm + [p + nmode for p in perm])
        rho = jnp.trace(t.reshape(c, c ** (nmode - 1), c, c ** (nmode - 1)),
                        axis1=1, axis2=3)
    else:
        t = state.reshape([c] * nmode)
        perm = [wire] + [i for i in range(nmode) if i != wire]
        t = jnp.transpose(t, perm).reshape(c, -1)
        rho = t @ jnp.conj(t).T
    # quadrature grid (units sqrt(hbar m omega)); psi_n(x) Hermite functions
    xs = np.linspace(-xrange, xrange, npoints)
    scale = config.KAPPA / config.HBAR ** 0.5
    xi = xs * scale  # dimensionless
    psis = np.zeros((c, npoints))
    psis[0] = np.pi ** -0.25 * np.exp(-xi ** 2 / 2)
    if c > 1:
        psis[1] = np.sqrt(2.0) * xi * psis[0]
    for m in range(2, c):
        psis[m] = np.sqrt(2.0 / m) * xi * psis[m - 1] - np.sqrt((m - 1) / m) * psis[m - 2]
    psis = jnp.asarray(psis, cdtype())
    pdf = jnp.real(jnp.einsum('mx,mn,nx->x', jnp.conj(psis), rho, psis))
    pdf = jnp.clip(pdf, 0, None)
    pdf = pdf / jnp.sum(pdf)
    idx = jax.random.categorical(key, jnp.log(pdf + 1e-38))
    return float(xs[int(idx)])


class GeneralBosonic(Generaldyne):
    """General Bosonic measurement: condition on a Bosonic POVM element
    (reference measurement.py:257, arXiv:2103.05530 Eq.30-31/35-37).

    The measurement itself is a weighted combination of Gaussians
    (cov_j, weight_j); conditioning multiplies the component sets.
    """

    def __init__(self, cov, weight, nmode: int = 1, wires=None, cutoff: int | None = None,
                 name: str = 'GeneralBosonic') -> None:
        wires = list(range(nmode)) if wires is None else ([wires] if isinstance(wires, int) else list(wires))
        nwire = len(wires)
        cov = np.asarray(cov, np.float64).reshape(-1, 2 * nwire, 2 * nwire)
        super().__init__(cov_m=cov[0], nmode=nmode, wires=wires, cutoff=cutoff, name=name)
        self.cov_j = cov
        self.weight_j = np.asarray(weight, complex).reshape(-1)

    def forward(self, x: list, samples=None, key=None) -> list:
        cov, mean = jnp.asarray(x[0]), jnp.asarray(x[1])
        if cov.ndim == 3:
            cov = cov[:, None]
        if mean.ndim == 3:
            mean = mean[:, None]
        weight = jnp.asarray(x[2]) if len(x) > 2 else jnp.ones(cov.shape[:2], cdtype())
        if key is None:
            key = next_key()
        samples_arr = None if samples is None else jnp.asarray(samples, rdtype())
        cache_key = ('gb', samples is None, cov.shape, mean.shape,
                     None if samples_arr is None else samples_arr.shape)
        fn = self._jit_cache.get(cache_key)
        if fn is None:
            fn = jax.jit(self._gb_conditioned)
            self._jit_cache[cache_key] = fn
        cov_out, mean_out, weight_out, mean_m = fn(cov, mean, weight, key, samples_arr)
        self.samples = mean_m
        return [cov_out, mean_out, weight_out]

    def _gb_conditioned(self, cov, mean, weight, key, samples_arr):
        mean = mean.astype(cdtype())
        weight = weight.astype(cdtype())
        n = self.nmode
        wires = np.asarray(self.wires)
        idx = np.concatenate([wires, wires + n])
        idx_rest = np.array([i for i in range(2 * n) if i not in idx], dtype=np.int64)
        ncomb_j = len(self.weight_j)
        # expand components: (batch, ncomb, ncomb_j, ...)
        cov_e = cov[:, :, None]
        mean_e = mean[:, :, None]
        cov_a = cov_e[..., idx_rest[:, None], idx_rest]
        cov_b = cov_e[..., idx[:, None], idx]
        cov_ab = cov_e[..., idx_rest[:, None], idx]
        mean_a = mean_e[..., idx_rest, :]
        mean_b = mean_e[..., idx, :]
        cov_t = cov_b + jnp.asarray(self.cov_j, cov.dtype)[None, None]
        cov_a = cov_a - cov_ab @ jnp.linalg.solve(cov_t, jnp.swapaxes(cov_ab, -1, -2))
        batch = cov.shape[0]
        ncomb = cov.shape[1]
        def flat(z):
            return z.reshape((batch, ncomb * ncomb_j) + z.shape[3:])
        weight_new = flat(weight[:, :, None] * jnp.asarray(self.weight_j, cdtype())[None, None])
        cov_new = flat(cov_t)
        mean_new = flat(jnp.broadcast_to(mean_b, mean_b.shape[:2] + (ncomb_j,) + mean_b.shape[3:]))
        if samples_arr is None:
            mean_m = self._sample_bosonic(key, cov_new, mean_new, weight_new)
        else:
            mean_m = samples_arr.reshape(1, -1)
        mean_m = mean_m.reshape(-1, mean_m.shape[-1])
        rm = mean_m[:, None, :, None].astype(cdtype())
        mb_im = jnp.imag(mean_new).astype(cov.dtype)
        exp_real = jnp.exp(jnp.swapaxes(mb_im, -1, -2) @ jnp.linalg.solve(cov_new, mb_im) / 2).squeeze((-1, -2))
        diff = jnp.real(rm).astype(cov.dtype) - jnp.real(mean_new).astype(cov.dtype)
        quad = (jnp.swapaxes(diff, -1, -2) @ jnp.linalg.solve(cov_new, diff)).squeeze((-1, -2))
        det = jnp.linalg.det(2 * jnp.pi * cov_new)
        prob_g = jnp.exp(-quad / 2) / jnp.sqrt(det)
        exp_imag = jnp.exp(1j * (jnp.swapaxes(diff, -1, -2).astype(cdtype())
                                 @ jnp.linalg.solve(cov_new.astype(cdtype()), 1j * mb_im.astype(cdtype())) / 1j
                                 ).squeeze((-1, -2)))
        weight_out = weight_new * exp_real * prob_g * exp_imag
        weight_out = weight_out / jnp.sum(weight_out, axis=-1, keepdims=True)
        mean_a_new = flat(mean_a + cov_ab.astype(cdtype())
                          @ jnp.linalg.solve(cov_t.astype(cdtype()),
                                             rm[:, None] - mean_b))
        cov_a_new = flat(cov_a)
        nt = 2 * n
        eye = jnp.eye(nt, dtype=cov.dtype)
        cov_out = jnp.broadcast_to(eye, cov_a_new.shape[:2] + (nt, nt))
        cov_out = cov_out.at[..., idx_rest[:, None], idx_rest].set(cov_a_new)
        mean_out = jnp.zeros(mean_a_new.shape[:2] + (nt, 1), cdtype())
        mean_out = mean_out.at[..., idx_rest, :].set(mean_a_new)
        return cov_out, mean_out, weight_out, mean_m

    __call__ = forward


class PhotonNumberResolvingBosonic(GeneralBosonic):
    """PNR measurement on a Bosonic state via the Fock-state POVM
    (reference measurement.py:363)."""

    def __init__(self, n: int, r: float = 0.05, nmode: int = 1, wires=None,
                 cutoff: int | None = None, name: str = 'PhotonNumberResolvingBosonic') -> None:
        from .state import FockStateBosonic
        wires = [0] if wires is None else ([wires] if isinstance(wires, int) else list(wires))
        state = FockStateBosonic(n, r, cutoff)
        cov = np.asarray(state.cov)[0]
        weight = np.asarray(state.weight)[0]
        super().__init__(cov=cov, weight=weight, nmode=nmode, wires=wires,
                         cutoff=cutoff or state.cutoff, name=name)
        assert len(self.wires) == 1, f'{self.name} must act on one mode'

    def forward(self, x: list, samples=None, key=None) -> list:
        return super().forward(x, samples=np.zeros(2), key=key)

    __call__ = forward
