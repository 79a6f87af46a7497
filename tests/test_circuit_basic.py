"""Tier-1 self-consistency + tier-2 oracle tests for the qubit statevector engine."""

import numpy as np
import pytest

import deepquantum_tpu as dq
import jax
import jax.numpy as jnp


def test_bell_state():
    cir = dq.QubitCircuit(2)
    cir.h(0)
    cir.cnot(0, 1)
    state = cir()
    expected = np.zeros((4, 1), dtype=complex)
    expected[0, 0] = expected[3, 0] = 2 ** -0.5
    np.testing.assert_allclose(np.asarray(state), expected, atol=1e-12)


def test_ghz_and_measure():
    cir = dq.QubitCircuit(3)
    cir.h(0)
    cir.cnot(0, 1)
    cir.cnot(1, 2)
    cir()
    res = cir.measure(shots=2000)
    assert set(res.keys()) <= {'000', '111'}
    assert sum(res.values()) == 2000


def test_expectation_and_grad():
    cir = dq.QubitCircuit(2)
    cir.rx(0, inputs=0.3)
    cir.ry(1, inputs=0.5)
    cir.cnot(0, 1)
    cir.observable(0, basis='z')
    cir()
    ev = cir.expectation()
    np.testing.assert_allclose(float(ev[0]), np.cos(0.3), atol=1e-8)

    # gradient via jax through the pure path
    cir2 = dq.QubitCircuit(1)
    cir2.rx(0)  # trainable random init
    cir2.observable(0, basis='z')

    def loss(p):
        return cir2.expectation(params=p)[0]

    theta = jnp.array([0.7])
    g = jax.grad(loss)(theta)
    np.testing.assert_allclose(float(g[0]), -np.sin(0.7), atol=1e-8)


def test_controlled_gates_vs_unitary():
    cir = dq.QubitCircuit(3)
    cir.h(0)
    cir.crx(0, 2, inputs=0.4)
    cir.ccx(0, 1, 2)
    cir.cp(1, 0, inputs=0.9)
    state = cir().reshape(-1)
    u = cir.get_unitary()
    init = np.zeros(8, dtype=complex)
    init[0] = 1
    np.testing.assert_allclose(np.asarray(state), np.asarray(u) @ init, atol=1e-6)


def test_batched_data_vmap():
    cir = dq.QubitCircuit(2)
    cir.rx(0, encode=True)
    cir.ry(1, encode=True)
    cir.cnot(0, 1)
    cir.observable(1)
    data = jnp.array([[0.1, 0.2], [0.3, 0.4], [1.0, 2.0]])
    state = cir(data)
    assert state.shape == (3, 4, 1)
    evs = cir.expectation()
    assert evs.shape == (3, 1)
    # per-sample equality
    for i in range(3):
        cir(data[i])
        ev = cir.expectation()
        np.testing.assert_allclose(np.asarray(evs[i]), np.asarray(ev), atol=1e-9)


def test_reupload():
    cir = dq.QubitCircuit(1, reupload=True)
    for _ in range(3):
        cir.rx(0, encode=True)
    data = jnp.array([0.5])
    state = cir(data)
    ref = dq.QubitCircuit(1)
    ref.rx(0, inputs=1.5)
    np.testing.assert_allclose(np.asarray(state), np.asarray(ref()), atol=1e-9)


def test_inverse():
    cir = dq.QubitCircuit(2)
    cir.h(0)
    cir.rx(0, inputs=0.3)
    cir.cnot(0, 1)
    cir.rzz([0, 1], inputs=0.7)
    inv = cir.inverse()
    u = cir.get_unitary()
    uinv = inv.get_unitary()
    np.testing.assert_allclose(np.asarray(u @ uinv), np.eye(4), atol=1e-6)


def test_amplitude_and_prob():
    cir = dq.QubitCircuit(2)
    cir.h(0)
    cir.cnot(0, 1)
    cir()
    np.testing.assert_allclose(float(jnp.abs(cir.get_amplitude('00'))), 2 ** -0.5, atol=1e-9)
    np.testing.assert_allclose(float(cir.get_prob('11')), 0.5, atol=1e-9)
    np.testing.assert_allclose(float(cir.get_prob('1', wires=0)), 0.5, atol=1e-9)


def test_vs_reference_random_circuit():
    """Tier-2: bit-level comparison against the mounted PyTorch reference."""
    torch = pytest.importorskip('torch')
    import deepquantum as ref_dq

    np.random.seed(42)
    n = 4
    angles = np.random.rand(12) * 2 * np.pi

    def build(cir):
        cir.h(0)
        cir.rx(1, inputs=angles[0])
        cir.ry(2, inputs=angles[1])
        cir.rz(3, inputs=angles[2])
        cir.cnot(0, 1)
        cir.u3(2, inputs=angles[3:6])
        cir.rxx([0, 2], inputs=angles[6])
        cir.ryy([1, 3], inputs=angles[7])
        cir.rzz([0, 3], inputs=angles[8])
        cir.crx(1, 2, inputs=angles[9])
        cir.toffoli(0, 1, 3)
        cir.cp(2, 0, inputs=angles[10])
        cir.rbs([1, 2], inputs=angles[11])
        cir.swap([0, 3])
        cir.observable(0)
        cir.observable([1, 2], basis='xy')

    ours = dq.QubitCircuit(n)
    build(ours)
    theirs = ref_dq.QubitCircuit(n)
    build(theirs)
    theirs.to(torch.complex128)

    s_ours = np.asarray(ours()).reshape(-1)
    s_theirs = theirs().detach().numpy().reshape(-1)
    np.testing.assert_allclose(s_ours, s_theirs, atol=1e-6)

    e_ours = np.asarray(ours.expectation())
    e_theirs = theirs.expectation().detach().numpy()
    np.testing.assert_allclose(e_ours, e_theirs, atol=1e-6)

    u_ours = np.asarray(ours.get_unitary())
    u_theirs = theirs.get_unitary().detach().numpy()
    np.testing.assert_allclose(u_ours, u_theirs, atol=1e-6)


def test_defer_measure_and_condition():
    """Mid-circuit measurement via deferred-measurement principle
    (reference circuit.py:430, tests exercise condition + defer_measure)."""
    cir = dq.QubitCircuit(2)
    cir.h(0)
    cir.x(1, controls=0, condition=True)  # conditional X: same as deferred CNOT
    cir()
    assert cir.wires_condition == [0]
    state, bit, prob = cir.defer_measure(with_prob=True)
    # measured wire is sliced out: remaining qubit collapsed to |bit>
    dense = np.asarray(state).reshape(-1)
    np.testing.assert_allclose(abs(dense[int(bit)]), 1.0, atol=1e-6)
    np.testing.assert_allclose(prob, 0.5, atol=1e-6)
    post = cir.post_select('0')
    np.testing.assert_allclose(abs(np.asarray(post).reshape(-1)[0]), 1.0, atol=1e-6)


def test_distributed_adjoint_expectation():
    from deepquantum_tpu.parallel import DistributedQubitCircuit, make_mesh
    n = 4
    dist = DistributedQubitCircuit(n, mesh=make_mesh(4))
    local = dq.QubitCircuit(n)
    for c in (dist, local):
        for i in range(n):
            c.rx(i, inputs=0.2 + 0.1 * i)
        for i in range(n - 1):
            c.cnot(i, i + 1)
        c.observable(0)
        c._train_mask = [True] * len(c._pvals)
    p = local.params
    e_adj = dist.expectation(params=p, adjoint=True)
    e_ad = local.expectation(params=p)
    np.testing.assert_allclose(np.asarray(e_adj), np.asarray(e_ad), atol=1e-10)
    g_adj = jax.grad(lambda q: dist.expectation(params=q, adjoint=True)[0])(p)
    g_ad = jax.grad(lambda q: local.expectation(params=q)[0])(p)
    np.testing.assert_allclose(np.asarray(g_adj), np.asarray(g_ad), atol=1e-8)


def test_expectation_shots_matches_exact():
    """Sampled expectation (basis-rotation + bitstring sampling, reference
    circuit.py:400-426) converges to the exact value for a mixed X/Z/Y
    observable."""
    import deepquantum_tpu as dq
    cir = dq.QubitCircuit(3)
    cir.ry(0, inputs=0.7)
    cir.rx(1, inputs=1.1)
    cir.cnot(0, 1)
    cir.rz(2, inputs=0.4)
    cir.h(2)
    cir.observable([0], basis='x')
    cir.observable([1, 2], basis='zy')
    cir()
    exact = np.asarray(cir.expectation())
    import jax
    sampled = np.asarray(cir.expectation(shots=200_000))
    assert sampled.shape == exact.shape
    np.testing.assert_allclose(sampled, exact, atol=0.02)


def test_expectation_shots_matches_reference_rotation():
    """The shots path's basis rotation agrees with the reference's
    deterministic part: exact expectation of the rotated circuit in the
    computational basis equals the unrotated observable expectation."""
    import pytest
    torch = pytest.importorskip('torch')
    import deepquantum as ref_dq
    import deepquantum_tpu as dq
    ours = dq.QubitCircuit(2)
    theirs = ref_dq.QubitCircuit(2)
    for c in (ours, theirs):
        c.ry(0, inputs=0.6)
        c.cnot(0, 1)
        c.rx(1, inputs=0.3)
        c.observable([0, 1], basis='xy')
    ours()
    theirs()
    e_o = float(np.asarray(ours.expectation())[0])
    e_t = float(theirs.expectation().detach().reshape(-1)[0])
    np.testing.assert_allclose(e_o, e_t, atol=1e-6)
    s_o = float(np.asarray(ours.expectation(shots=400_000))[0])
    np.testing.assert_allclose(s_o, e_t, atol=0.02)
