"""MBQC: pattern execution + circuit->pattern transpilation parity
(reference tests/test_mbqc_transpile.py strategy: compare the pattern's final
state with the direct statevector simulation up to global phase)."""

import numpy as np
import pytest

import deepquantum_tpu as dq
from deepquantum_tpu.mbqc import Pattern


def _max_overlap(psi, phi):
    psi = np.asarray(psi).reshape(-1)
    phi = np.asarray(phi).reshape(-1)
    return abs(np.vdot(psi, phi)) / (np.linalg.norm(psi) * np.linalg.norm(phi))


def _pattern_state(cir, data=None):
    pattern = cir.pattern()
    graph = pattern(data)
    sgs = graph.graph
    state = np.asarray(sgs.full_state).reshape(-1)
    return state


def _run_both(build, n, data=None, seed=0):
    np.random.seed(seed)
    cir = dq.QubitCircuit(n)
    build(cir)
    target = np.asarray(cir(data)).reshape(-1)
    state = _pattern_state(cir, data)
    return state, target


def test_single_qubit_gates_transpile():
    for build in [
        lambda c: c.h(0),
        lambda c: c.x(0),
        lambda c: c.y(0),
        lambda c: c.z(0),
        lambda c: c.s(0),
        lambda c: c.rx(0, inputs=0.3),
        lambda c: c.ry(0, inputs=0.7),
        lambda c: c.rz(0, inputs=1.1),
    ]:
        state, target = _run_both(build, 1)
        assert _max_overlap(state, target) > 1 - 1e-6, build


def test_cnot_transpile():
    def build(c):
        c.h(0)
        c.cnot(0, 1)
    state, target = _run_both(build, 2)
    assert _max_overlap(state, target) > 1 - 1e-6


def test_random_circuit_transpile():
    """Random 3-qubit circuits vs direct simulation (reference test_mbqc_transpile.py:8)."""
    rng = np.random.default_rng(5)
    for trial in range(3):
        def build(c):
            for i in range(3):
                c.rx(i, inputs=float(rng.random() * 2 * np.pi))
            c.cnot(0, 1)
            for i in range(3):
                c.rz(i, inputs=float(rng.random() * 2 * np.pi))
            c.cnot(1, 2)
            c.h(0)
        state, target = _run_both(build, 3, seed=trial)
        assert _max_overlap(state, target) > 1 - 1e-6


def test_pattern_manual_teleportation():
    """1-qubit teleportation: H via manual N/E/M/X commands."""
    pattern = Pattern(nodes_state=[0], state='zero')
    pattern.n(1)
    pattern.e(0, 1)
    pattern.m(0, angle=0.0)
    pattern.x(1, domain=0)
    graph = pattern()
    state = np.asarray(graph.full_state).reshape(-1)
    expected = np.array([1, 1]) / np.sqrt(2)  # H|0> = |+>
    assert _max_overlap(state, expected) > 1 - 1e-6


def test_standardize():
    pattern = Pattern(nodes_state=[0], state='plus')
    pattern.n(1)
    pattern.e(0, 1)
    pattern.m(0, angle=0.3)
    pattern.x(1, domain=0)
    pattern.n(2)
    pattern.e(1, 2)
    pattern.m(1, angle=0.1)
    pattern.x(2, domain=1)
    assert not pattern.is_standard()
    # outcomes are stochastic: compare distributions of |amplitudes| over many runs
    pattern.standardize()
    assert pattern.is_standard()
    graph = pattern()
    state = np.asarray(graph.full_state).reshape(-1)
    np.testing.assert_allclose(np.linalg.norm(state), 1.0, atol=1e-6)


def test_encode_data_transpile():
    def build(c):
        c.rx(0, encode=True)
        c.rz(0, encode=True)
    data = np.array([0.4, 0.9])
    state, target = _run_both(build, 1, data=data)
    assert _max_overlap(state, target) > 1 - 1e-6
