"""Core qubit/qudit math: measurement, expectation, encodings, state utilities.

TPU-native counterpart of reference src/deepquantum/qmath.py. Sampling uses
``jax.random`` with explicit keys (a module-level key stream is provided for
torch-style implicit RNG); probabilities are computed on device and only the
final per-shot indices are pulled to host for the dict view.
"""

from __future__ import annotations

from collections import Counter
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import cdtype, rdtype

__all__ = [
    'evolve_state', 'evolve_den_mat', 'measure', 'expectation_pauli', 'amplitude_encoding',
    'partial_trace', 'multi_kron', 'slice_state_vector', 'sample2expval', 'meyer_wallach_measure',
    'inner_product_mps', 'inverse_permutation', 'sample_probs', 'marginal_probs',
]

from .apply import evolve_den_mat, evolve_state  # re-export for API parity

_global_key = [jax.random.PRNGKey(0)]


def set_seed(seed: int) -> None:
    """Seed the module-level key stream used when no explicit key is given."""
    _global_key[0] = jax.random.PRNGKey(seed)


def next_key() -> jax.Array:
    _global_key[0], sub = jax.random.split(_global_key[0])
    return sub


def inverse_permutation(perm):
    inv = [0] * len(perm)
    for i, p in enumerate(perm):
        inv[p] = i
    return inv


def multi_kron(lst) -> jnp.ndarray:
    """Kronecker product of a list of matrices (reference qmath.py:390)."""
    n = len(lst)
    if n == 1:
        return lst[0]
    mid = n // 2
    return jnp.kron(multi_kron(lst[:mid]), multi_kron(lst[mid:]))


def amplitude_encoding(data: Any, nqubit: int) -> jnp.ndarray:
    """Normalize data into state amplitudes, shape (batch, 2^n, 1) or (2^n, 1).

    Semantics match reference qmath.py:439: pad with zeros / truncate to 2^n
    and L2-normalize along the last axis.
    """
    data = jnp.asarray(data)
    is_single = data.ndim == 1 or (data.ndim == 2 and data.shape[-1] == 1)
    batch = 1 if is_single else data.shape[0]
    data = data.reshape(batch, -1).astype(cdtype())
    size = data.shape[1]
    n = 2 ** nqubit
    data = data[:, :n]
    norm = jnp.linalg.norm(data, axis=-1, keepdims=True)
    data = data / jnp.where(norm == 0, 1, norm)
    state = jnp.zeros((batch, n), dtype=cdtype())
    state = state.at[:, :min(size, n)].set(data)
    state = state[..., None]
    if is_single:
        state = state[0]
    return state


def partial_trace(rho: jnp.ndarray, nqudit: int, trace_lst, qudit: int = 2) -> jnp.ndarray:
    """Partial trace over ``trace_lst`` qudits (reference qmath.py:408)."""
    single = rho.ndim == 2
    if single:
        rho = rho[None]
    b = rho.shape[0]
    trace_lst = list(trace_lst)
    n = len(trace_lst)
    keep = [i for i in range(nqudit) if i not in trace_lst]
    perm = [0] + [i + 1 for i in keep] + [i + 1 + nqudit for i in keep] \
        + [i + 1 for i in trace_lst] + [i + 1 + nqudit for i in trace_lst]
    rho = rho.reshape([b] + [qudit] * (2 * nqudit)).transpose(perm)
    rho = rho.reshape(b, qudit ** (nqudit - n), qudit ** (nqudit - n), qudit ** n, qudit ** n)
    rho = jnp.trace(rho, axis1=-2, axis2=-1)
    if single:
        rho = rho[0]
    return rho


def slice_state_vector(state: jnp.ndarray, nqubit: int, wires, bits: str, normalize: bool = True) -> jnp.ndarray:
    """Project onto computational-basis ``bits`` of ``wires`` (reference qmath.py:365)."""
    wires = list(wires)
    if len(bits) == 1:
        bits = bits * len(wires)
    assert len(wires) == len(bits)
    state = state.reshape([-1] + [2] * nqubit)
    batch = state.shape[0]
    perm = [w + 1 for w in wires] + [0] + [i + 1 for i in range(nqubit) if i not in wires]
    state = jnp.transpose(state, perm)
    for b in bits:
        state = state[int(b)]
    state = state.reshape(batch, -1)
    if normalize:
        norm = jnp.linalg.norm(state, axis=-1, keepdims=True)
        state = state / jnp.where(norm == 0, 1, norm)
    return state


def marginal_probs(probs: jnp.ndarray, nqubit: int, wires) -> jnp.ndarray:
    """Marginalize a 2^n probability vector onto sorted ``wires``."""
    wires = sorted(wires)
    if list(wires) == list(range(nqubit)):
        return probs
    perm = list(wires) + [i for i in range(nqubit) if i not in wires]
    p = probs.reshape([2] * nqubit).transpose(perm)
    return p.reshape(2 ** len(wires), -1).sum(-1)


def sample_probs(probs: jnp.ndarray, shots: int, key: jax.Array | None = None) -> np.ndarray:
    """Draw ``shots`` categorical samples from a probability vector.

    On-device categorical sampling replaces the reference's blockwise
    multinomial (qmath.py:543) — XLA handles 2^24-sized categoricals natively.
    """
    if key is None:
        key = next_key()
    logits = jnp.log(jnp.clip(probs, 1e-38, None))
    samples = jax.random.categorical(key, logits, shape=(shots,))
    return np.asarray(samples)


def measure(
    state: jnp.ndarray,
    shots: int = 1024,
    with_prob: bool = False,
    wires=None,
    den_mat: bool = False,
    key: jax.Array | None = None,
    block_size: int = 2 ** 24,
) -> dict | list[dict]:
    """Sample measurement outcomes; returns {bitstring: count} dict(s).

    API-compatible with reference qmath.py:568 (``block_size`` kept for
    signature parity; sampling is a single fused categorical on TPU).
    """
    state = jnp.asarray(state)
    if den_mat:
        state = jnp.diagonal(state, axis1=-2, axis2=-1)
    is_single = state.ndim == 1 or (state.ndim == 2 and state.shape[-1] == 1)
    batch = 1 if is_single else state.shape[0]
    state = state.reshape(batch, -1)
    n = int(np.log2(state.shape[-1]))
    if wires is not None:
        if isinstance(wires, int):
            wires = [wires]
        wires = sorted(wires)
    num_bits = len(wires) if wires else n
    results_tot = []
    for i in range(batch):
        probs = jnp.abs(state[i]) if den_mat else jnp.abs(state[i]) ** 2
        if wires is not None:
            probs = marginal_probs(probs, n, wires)
        samples = Counter(sample_probs(probs, shots, key).tolist())
        results = {bin(k)[2:].zfill(num_bits): v for k, v in samples.items()}
        if with_prob:
            probs_np = np.asarray(probs)
            results = {k: (v, probs_np[int(k, 2)]) for k, v in results.items()}
        results_tot.append(results)
    return results_tot[0] if batch == 1 else results_tot


def expectation_pauli(state: jnp.ndarray, obs_state: jnp.ndarray, den_mat: bool = False) -> jnp.ndarray:
    """<psi|O|psi> given the state and O|psi> (or tr(O rho) given O rho diag).

    The observable application itself is done by the circuit layer with the
    same evolve_state kernel (reference qmath.py:830).
    """
    if den_mat:
        return jnp.trace(obs_state, axis1=-2, axis2=-1).real
    inner = jnp.sum(jnp.conj(state.reshape(-1)) * obs_state.reshape(-1))
    return inner.real


def sample2expval(sample: dict) -> float:
    """Measurement counts -> parity expectation value (reference qmath.py:863)."""
    total = 0
    exp = 0
    for bitstring, ncount in sample.items():
        coeff = (-1) ** (bitstring.count('1') % 2)
        exp += ncount * coeff
        total += ncount
    return exp / total


def meyer_wallach_measure(state_tsr: jnp.ndarray) -> jnp.ndarray:
    """Meyer-Wallach entanglement measure over (batch, 2, ..., 2) states (reference qmath.py:874)."""
    nqubit = state_tsr.ndim - 1
    batch = state_tsr.shape[0]
    rst = jnp.zeros(batch, dtype=rdtype())
    for i in range(nqubit):
        perm = [0, i + 1] + [j + 1 for j in range(nqubit) if j != i]
        x = jnp.transpose(state_tsr, perm).reshape(batch, 2, -1)
        s1, s2 = x[:, 0], x[:, 1]
        d = (jnp.sum(jnp.abs(s1) ** 2, -1) * jnp.sum(jnp.abs(s2) ** 2, -1)
             - jnp.abs(jnp.sum(jnp.conj(s1) * s2, -1)) ** 2)
        rst = rst + d.real
    return rst * 4 / nqubit


def inner_product_mps(tensors0, tensors1) -> jnp.ndarray:
    """<mps0|mps1> contraction left-to-right (reference qmath.py:775)."""
    # env: (chi0, chi1)
    env = jnp.ones((1, 1), dtype=cdtype())
    for a, b in zip(tensors0, tensors1):
        # a, b: (chi_l, d, chi_r)
        tmp = jnp.tensordot(env, b, axes=[[1], [0]])       # (chi0_l, d, chi1_r)
        env = jnp.tensordot(jnp.conj(a), tmp, axes=[[0, 1], [0, 1]])  # (chi0_r, chi1_r)
    return env.reshape(())


def is_unitary(u, atol: float = 1e-4) -> bool:
    """Check unitarity (reference qmath.py:117)."""
    u = np.asarray(u)
    return bool(np.allclose(u @ u.conj().T, np.eye(u.shape[-1]), atol=atol))


def is_density_matrix(rho, atol: float = 1e-5) -> bool:
    """Hermitian, unit-trace, PSD check (reference qmath.py:128)."""
    rho = np.asarray(rho)
    if rho.ndim == 2:
        rho = rho[None]
    herm = np.allclose(rho, np.conj(np.swapaxes(rho, -1, -2)), atol=atol)
    tr = np.allclose(np.trace(rho, axis1=-2, axis2=-1), 1, atol=atol)
    psd = all(np.linalg.eigvalsh(r).min() > -atol for r in rho)
    return bool(herm and tr and psd)


def int_to_bitstring(number: int, nbit: int, debug: bool = False) -> str:
    """Integer -> fixed-width bit string (reference qmath.py helper)."""
    from ..models.ansatz import int_to_bitstring as _f
    return _f(number, nbit, debug)


def sample_sc_mcmc(prob_func=None, proposal_sampler=None, shots: int = 1024,
                   num_chain: int = 5, state=None, key=None):
    """API-parity shim for the reference's MCMC MPS sampler (qmath.py:641).

    The TPU build samples MPS exactly (ancestral sampling, mps.measure_mps)
    — no burn-in, exact marginals — so this delegates when given a state and
    otherwise raises with guidance.
    """
    if state is not None:
        from ..mps import measure_mps
        return measure_mps(state, shots=shots, key=key)
    raise NotImplementedError('exact sampling replaces MCMC: use QubitCircuit.measure')
