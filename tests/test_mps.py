"""MPS backend: exact-vs-MPS parity (reference tests/test_mps.py strategy)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import deepquantum_tpu as dq
from deepquantum_tpu.mps import MatrixProductState, full_tensor


def _random_circuit(cir, n, seed=0):
    rng = np.random.default_rng(seed)
    for i in range(n):
        cir.h(i)
    for i in range(n):
        cir.rx(i, inputs=rng.random() * 2 * np.pi)
    for i in range(n - 1):
        cir.cnot(i, i + 1)
    for i in range(n):
        cir.ry(i, inputs=rng.random() * 2 * np.pi)
    cir.cnot(0, n - 1)
    cir.rzz([1, 3], inputs=0.4)
    cir.toffoli(0, 1, 2)


def test_mps_matches_statevector():
    n = 5
    sv = dq.QubitCircuit(n)
    mps = dq.QubitCircuit(n, mps=True, chi=64)
    _random_circuit(sv, n)
    _random_circuit(mps, n)
    psi = np.asarray(sv()).reshape(-1)
    tensors = mps()
    psi_mps = np.asarray(full_tensor(tensors))
    # global-phase-free comparison (normalization sweeps can introduce phase)
    k = np.argmax(np.abs(psi))
    np.testing.assert_allclose(np.abs(psi_mps), np.abs(psi), atol=1e-8)
    np.testing.assert_allclose(psi_mps * (psi[k] / psi_mps[k]), psi, atol=1e-8)


def test_mps_expectation_matches():
    n = 4
    sv = dq.QubitCircuit(n)
    mps = dq.QubitCircuit(n, mps=True, chi=32)
    for cir in (sv, mps):
        _random_circuit(cir, n, seed=3)
        cir.observable(0)
        cir.observable([1, 2], basis='xy')
    sv()
    mps()
    np.testing.assert_allclose(np.asarray(mps.expectation()),
                               np.asarray(sv.expectation()), atol=1e-8)


def test_mps_truncation_fidelity():
    """chi-truncated MPS stays close on a lightly-entangling circuit."""
    n = 8
    sv = dq.QubitCircuit(n)
    mps = dq.QubitCircuit(n, mps=True, chi=8)
    for cir in (sv, mps):
        for i in range(n):
            cir.ry(i, inputs=0.3 + 0.1 * i)
        for i in range(n - 1):
            cir.cnot(i, i + 1)
    psi = np.asarray(sv()).reshape(-1)
    psi_mps = np.asarray(full_tensor(mps()))
    fidelity = np.abs(np.vdot(psi, psi_mps)) ** 2
    assert fidelity > 1 - 1e-6


def test_mps_measure():
    n = 3
    cir = dq.QubitCircuit(n, mps=True, chi=16)
    cir.h(0)
    cir.cnot(0, 1)
    cir.cnot(1, 2)
    cir()
    res = cir.measure(shots=500)
    assert set(res.keys()) <= {'000', '111'}
    assert sum(res.values()) == 500


def test_mps_amplitude():
    n = 3
    cir = dq.QubitCircuit(n, mps=True, chi=16)
    cir.h(0)
    cir.cnot(0, 1)
    cir()
    amp = np.asarray(cir.get_amplitude('110'))
    np.testing.assert_allclose(abs(amp), 2 ** -0.5, atol=1e-8)


def test_mps_gradient():
    """Gradients flow through QR/SVD sweeps (trainability, tier-3 style)."""
    n = 4
    cir = dq.QubitCircuit(n, mps=True, chi=8)
    for i in range(n):
        cir.rx(i)
    for i in range(n - 1):
        cir.cnot(i, i + 1)
    cir.observable(0)
    p0 = cir.params

    def loss(p):
        tensors = cir.forward(params=p)
        return cir.expectation()[0]

    g = jax.grad(loss)(p0)
    assert np.all(np.isfinite(np.asarray(g)))
    # finite-difference check on one parameter
    eps = 1e-6
    lp = loss(p0.at[0].add(eps))
    lm = loss(p0.at[0].add(-eps))
    np.testing.assert_allclose(float(g[0]), float((lp - lm) / (2 * eps)), atol=1e-4)


def test_mps_100_qubits():
    """Scale: 100-qubit circuit via chi-truncated MPS (README claim parity)."""
    n = 100
    cir = dq.QubitCircuit(n, mps=True, chi=16)
    cir.h(0)
    for i in range(n - 1):
        cir.cnot(i, i + 1)
    tensors = cir()
    res = cir.measure(shots=64)
    for bits in res:
        assert bits in (('0' * n), ('1' * n))
