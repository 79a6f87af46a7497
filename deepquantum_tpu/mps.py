"""Matrix product state backend (TEBD).

TPU-native redesign of reference state.py:81-339 + operation.py:337-409. The
MPS is a plain list of (chi_l, d, chi_r) arrays plus a *static* orthogonality
center: because the gate sequence is known at trace time, every bond
dimension and every center move is a compile-time constant, so the whole
circuit lowers to one straight-line XLA program of QR/SVD/einsum calls (all
MXU work). Truncation uses the numerically-safe SVD (ops/linalg.py).

All core functions are pure: (tensors, center) in -> (tensors, center) out.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .config import cdtype
from .ops.linalg import qr_stable, svd_safe
from .ops.qmath import inner_product_mps

__all__ = ['MatrixProductState', 'apply_gate_mps', 'measure_mps']


def _norm(x):
    return jnp.sqrt(jnp.sum(jnp.abs(x) ** 2))


def orthogonalize_left2right(tensors: list, site: int, dc: int = -1, normalize: bool = False) -> list:
    """T_site = U R; tensor[site] <- U, tensor[site+1] <- R @ tensor[site+1].

    Mirrors reference state.py:238-271 (QR, or truncated safe-SVD when
    0 < dc < bond).
    """
    tensors = list(tensors)
    t = tensors[site]
    l, d, r = t.shape
    mat = t.reshape(l * d, r)
    if 0 < dc < r:
        u, s, vh = svd_safe(mat)
        u = u[:, :dc]
        rmat = s[:dc, None].astype(u.dtype) * vh[:dc, :]
    else:
        u, rmat = qr_stable(mat)
    tensors[site] = u.reshape(l, d, -1)
    if normalize:
        rmat = rmat / _norm(rmat)
    tensors[site + 1] = jnp.einsum('ab,bcd->acd', rmat, tensors[site + 1])
    return tensors


def orthogonalize_right2left(tensors: list, site: int, dc: int = -1, normalize: bool = False) -> list:
    """T_site = L Vh; tensor[site] <- Vh, tensor[site-1] <- tensor[site-1] @ L.

    Mirrors reference state.py:272-310.
    """
    tensors = list(tensors)
    t = tensors[site]
    l, d, r = t.shape
    mat = t.reshape(l, d * r)
    if 0 < dc < l:
        u, s, vh = svd_safe(mat)
        vh = vh[:dc, :]
        lmat = u[:, :dc] * s[None, :dc].astype(u.dtype)
    else:
        q, rmat = qr_stable(jnp.conj(mat).T)
        vh = jnp.conj(q).T
        lmat = jnp.conj(rmat).T
    tensors[site] = vh.reshape(-1, d, r)
    if normalize:
        lmat = lmat / _norm(lmat)
    tensors[site - 1] = jnp.einsum('abc,cd->abd', tensors[site - 1], lmat)
    return tensors


def center_orthogonalization(tensors: list, center: int, c: int, dc: int = -1,
                             normalize: bool = False) -> tuple[list, int]:
    """Move the orthogonality center to ``c`` (reference state.py:164-177)."""
    n = len(tensors)
    if c == -1:
        c = n - 1
    if center < 0:
        for site in range(0, c):
            tensors = orthogonalize_left2right(tensors, site, dc, normalize)
        for site in range(n - 1, c, -1):
            tensors = orthogonalize_right2left(tensors, site, dc, normalize)
    elif center < c:
        for site in range(center, c):
            tensors = orthogonalize_left2right(tensors, site, dc, normalize)
    elif center > c:
        for site in range(center, c, -1):
            tensors = orthogonalize_right2left(tensors, site, dc, normalize)
    if normalize:
        tensors = list(tensors)
        tensors[c] = tensors[c] / _norm(tensors[c])
    return tensors, c


def gate_to_mpo(matrix: jnp.ndarray, wires_sorted: list[int], qudit: int = 2) -> tuple[list, int]:
    """Factorize a k-site gate into MPO tensors (i, a, b, j), identity-filled gaps.

    Mirrors reference operation.py:337-388: reshape the unitary to interleaved
    (out, in) per-site axes, QR-factorize left to right, insert delta tensors
    for non-adjacent wires.
    """
    k = len(wires_sorted)
    d = qudit
    u = matrix.reshape([d] * (2 * k))
    order = list(np.arange(2 * k).reshape(2, k).T.flatten())
    u = jnp.transpose(u, order).reshape([d * d] * k)
    # factorize: state_to_tensors with qudit=d*d (reference qmath.py:350)
    main = []
    nleft = 1
    cur = u
    for _ in range(k - 1):
        mat = cur.reshape(nleft * d * d, -1)
        q, r = qr_stable(mat)
        main.append(q.reshape(nleft, d * d, -1))
        cur = r
        nleft = r.shape[0]
    main.append(cur.reshape(nleft, d * d, 1))
    tensors = []
    prev = None
    for w, t in zip(wires_sorted, main):
        if prev is not None:
            for _ in range(prev + 1, w):
                chi = tensors[-1].shape[-1]
                ident = jnp.eye(chi * d, dtype=matrix.dtype)
                tensors.append(ident.reshape(chi, d, chi, d).transpose(0, 1, 3, 2))
        nl, _, nr = t.shape
        tensors.append(t.reshape(nl, d, d, nr))
        prev = w
    return tensors, wires_sorted[0]


def apply_mpo(tensors: list, mpo: list, sites: list[int]) -> list:
    """Contract MPO tensors into the MPS (TEBD, reference state.py:311-330)."""
    tensors = list(tensors)
    for t_op, site in zip(mpo, sites):
        x = jnp.einsum('iabj,kbl->ikajl', t_op, tensors[site])
        s = x.shape
        tensors[site] = x.reshape(s[0] * s[1], s[2], s[3] * s[4])
    return tensors


def apply_gate_mps(state: tuple[list, int] | list, matrix: jnp.ndarray, wires_sorted: list[int],
                   chi: int, normalize: bool = True, qudit: int = 2) -> tuple[list, int]:
    """Apply a gate to the MPS: orth to near end, contract MPO, truncate back.

    Mirrors reference operation.py:389-409 (op_mps).
    """
    if isinstance(state, tuple):
        tensors, center = state
    else:
        tensors, center = state, -1
    mpo, left = gate_to_mpo(matrix, wires_sorted, qudit)
    right = left + len(mpo) - 1
    if center < 0:
        center_now = -1
        end1, end2 = left, right
    else:
        end1, end2 = (left, right) if abs(left - center) < abs(right - center) else (right, left)
        center_now = center
    sites = list(range(left, right + 1))
    tensors, c = center_orthogonalization(tensors, center_now, end1, dc=-1, normalize=normalize)
    tensors = apply_mpo(tensors, mpo, sites)
    tensors, c = center_orthogonalization(tensors, c, end2, dc=-1, normalize=normalize)
    tensors, c = center_orthogonalization(tensors, c, end1, dc=chi, normalize=normalize)
    return tensors, c


def full_tensor(tensors: list) -> jnp.ndarray:
    """Contract the MPS into the dense state tensor (reference state.py:208-216)."""
    psi = tensors[0]
    for t in tensors[1:]:
        psi = jnp.einsum('abc,cde->abde', psi, t)
        s = psi.shape
        psi = psi.reshape(s[0], s[1] * s[2], s[3])
    return psi.reshape(-1)


def bitstring_amplitude(tensors: list, bits: jnp.ndarray) -> jnp.ndarray:
    """<bits|mps> with bits a (n,) int array (traced-friendly)."""
    env = jnp.ones((1,), dtype=tensors[0].dtype)
    for i, t in enumerate(tensors):
        env = env @ t[:, bits[i], :]
    return env.reshape(())


def bitstring_prob(tensors: list, bits: jnp.ndarray) -> jnp.ndarray:
    """|<bits|mps>|^2 with bits a (n,) int array (traced-friendly)."""
    return jnp.abs(bitstring_amplitude(tensors, bits)) ** 2


class MatrixProductState:
    """MPS container (API parity with reference state.py:81).

    tensors: list of (chi_l, d, chi_r) arrays; center: orthogonality center
    (-1 = none). ``chi`` defaults to 10 * nsite like the reference.
    """

    def __init__(self, nsite: int = 1, state: Any = 'zeros', chi: int | None = None,
                 qudit: int = 2, normalize: bool = True) -> None:
        if chi is None:
            chi = 10 * nsite
        self.nsite = nsite
        self.chi = chi
        self.qudit = qudit
        self.normalize = normalize
        self.center = -1
        self.set_tensors(state)

    def set_tensors(self, state) -> None:
        if isinstance(state, str) and state in ('zeros', 'vac'):
            state = [0] * self.nsite
        assert isinstance(state, list), 'Invalid input type'
        state = list(state) + [0] * (self.nsite - len(state))
        tensors = []
        for s in state:
            if isinstance(s, (int, np.integer)):
                t = np.zeros((1, self.qudit, 1), dtype=cdtype())
                t[0, s, 0] = 1
                tensors.append(t)
            else:
                tensors.append(jnp.asarray(s, dtype=cdtype()))
        self.tensors = tensors

    def center_orthogonalization(self, c: int, dc: int = -1, normalize: bool = False) -> None:
        self.tensors, self.center = center_orthogonalization(self.tensors, self.center, c, dc, normalize)

    def orthogonalize_left2right(self, site: int, dc: int = -1, normalize: bool = False) -> None:
        """Left-orthogonalize site, absorbing R into site+1 (reference state.py:185)."""
        self.tensors = orthogonalize_left2right(self.tensors, site, dc, normalize)

    def orthogonalize_right2left(self, site: int, dc: int = -1, normalize: bool = False) -> None:
        """Right-orthogonalize site, absorbing L into site-1 (reference state.py:219)."""
        self.tensors = orthogonalize_right2left(self.tensors, site, dc, normalize)

    def orthogonalize_n1_n2(self, n1: int, n2: int, dc: int = -1, normalize: bool = False) -> None:
        """Sweep orthogonalization from site n1 towards n2 (reference state.py:253)."""
        if n1 < n2:
            for site in range(n1, n2):
                self.tensors = orthogonalize_left2right(self.tensors, site, dc, normalize)
        else:
            for site in range(n1, n2, -1):
                self.tensors = orthogonalize_right2left(self.tensors, site, dc, normalize)
        self.center = n2

    def normalize_central_tensor(self) -> None:
        """Normalize the tensor at the orthogonality center (reference state.py:170)."""
        if self.center < 0:
            return
        t = jnp.asarray(self.tensors[self.center])
        self.tensors = list(self.tensors)
        self.tensors[self.center] = t / jnp.linalg.norm(t.reshape(-1))

    def full_tensor(self) -> jnp.ndarray:
        return full_tensor(self.tensors).reshape([self.qudit] * self.nsite)

    def inner(self, other, form: str = 'norm'):
        other_t = other.tensors if isinstance(other, MatrixProductState) else other
        return inner_product_mps(self.tensors, other_t)

    def apply_mpo(self, mpo: list, sites: list[int]) -> None:
        self.tensors = apply_mpo(self.tensors, mpo, sites)

    def check_center_orthogonality(self, prt: bool = False):
        tensors = self.tensors
        if self.center < 0:
            return None
        err = [None] * self.nsite
        for i in range(self.center):
            l, d, r = tensors[i].shape
            m = tensors[i].reshape(-1, r)
            err[i] = float(jnp.abs(jnp.conj(m).T @ m - jnp.eye(r, dtype=m.dtype)).sum())
        for i in range(self.nsite - 1, self.center, -1):
            l, d, r = tensors[i].shape
            m = tensors[i].reshape(l, -1)
            err[i] = float(jnp.abs(m @ jnp.conj(m).T - jnp.eye(l, dtype=m.dtype)).sum())
        return err


def measure_mps(state, shots: int = 1024, wires=None, with_prob: bool = False, key=None,
                num_chain: int = 5) -> dict:
    """Sample bitstrings from an MPS by exact conditional sampling.

    Replaces the reference's MCMC chain (qmath.py:641 sample_sc_mcmc) with
    exact ancestral sampling: sweep left->right keeping the conditional
    environment, sampling each site from its marginal — O(n chi^2) per shot,
    no burn-in, embarrassingly vmappable on TPU.
    """
    from .ops.qmath import next_key
    if isinstance(state, tuple):
        tensors, _ = state
    elif isinstance(state, MatrixProductState):
        tensors = state.tensors
    else:
        tensors = state
    n = len(tensors)
    if key is None:
        key = next_key()

    # One jitted program: pad every site tensor to the max bond dimension,
    # stack to (n, chi, d, chi), then lax.scan over sites — program size is
    # O(1) in n (vs. an O(n)-unrolled loop, which takes minutes to compile on
    # remote AOT backends), and the uniform shapes map cleanly onto the VPU.
    chi_max = max(max(t.shape[0] for t in tensors), max(t.shape[2] for t in tensors))
    d = tensors[0].shape[1]

    def draw(tensors_, keys_):
        stacked = jnp.stack([
            jnp.zeros((chi_max, d, chi_max), tensors_[0].dtype)
               .at[:t.shape[0], :, :t.shape[2]].set(t)
            for t in tensors_
        ])  # (n, chi, d, chi)

        # right environments via reverse scan
        def renv_step(env, t):
            new = jnp.einsum('adb,be,cde->ac', t, env, jnp.conj(t))
            return new, env  # emit the env *to the right* of each site
        r0 = jnp.zeros((chi_max, chi_max), stacked.dtype).at[0, 0].set(1)
        _, renvs = jax.lax.scan(renv_step, r0, stacked, reverse=True)
        # renvs[i] = environment of sites i+1..n-1, shape (n, chi, chi)

        def sample_one(k):
            env0 = jnp.zeros((chi_max,), stacked.dtype).at[0].set(1)
            def site_step(carry, inputs):
                env, i = carry
                t, renv = inputs
                amp = jnp.einsum('a,adb->db', env, t)
                pd = jnp.einsum('db,bc,dc->d', amp, renv, jnp.conj(amp)).real
                pd = jnp.clip(pd, 0, None)
                pd = pd / jnp.sum(pd)
                b = jax.random.categorical(jax.random.fold_in(k, i), jnp.log(pd + 1e-38))
                return (amp[b], i + 1), b
            (_, _), bits = jax.lax.scan(site_step, (env0, 0), (stacked, renvs))
            return bits

        return jax.vmap(sample_one)(keys_)

    keys = jax.random.split(key, shots)
    samples = jax.jit(draw)(list(tensors), keys)
    samples = np.asarray(samples)
    if wires is not None:
        samples = samples[:, sorted(wires)]
    from collections import Counter
    counts = Counter(''.join(str(int(b)) for b in row) for row in samples)
    result = dict(counts)
    if with_prob:
        for bstr in result:
            bits = jnp.array([int(c) for c in bstr])
            if wires is None or len(wires) == len(tensors):
                p = bitstring_prob(tensors, bits)
            else:
                p = None
            result[bstr] = (result[bstr], None if p is None else float(p))
    return result
