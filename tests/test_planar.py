"""Planar Pallas gate-engine tests (interpret mode on CPU).

The planar engine (ops/planar_gate.py) is the TPU hot path: f32 re/im planes,
one in-place Pallas kernel per fused gate group, chain-level adjoint VJP.
These tests run the identical kernel arithmetic through the Pallas
interpreter against the complex einsum engine at complex64.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import deepquantum_tpu as dq
from deepquantum_tpu.ops.apply import evolve_state
from deepquantum_tpu.ops.planar_gate import (
    from_planar, planar_evolve_matrix, to_planar)


@pytest.fixture()
def c64():
    dq.set_dtype('complex64')
    os.environ['DQ_PLANAR'] = '1'
    yield
    os.environ.pop('DQ_PLANAR', None)
    dq.set_dtype('complex128')


def _haar(k, rng):
    z = rng.normal(size=(k, k)) + 1j * rng.normal(size=(k, k))
    q, r = np.linalg.qr(z)
    return (q * (np.diag(r) / np.abs(np.diag(r)))).astype(np.complex64)


@pytest.mark.parametrize('n,wires', [
    (14, (0,)), (14, (13,)), (14, (5,)),          # head / tail / mid singles
    (14, (0, 1, 2)), (14, (11, 12, 13)), (14, (4, 5, 6)),
    (14, (0, 6, 13)), (12, (3, 11)), (16, (1, 8, 15)),
])
def test_planar_kernel_matches_evolve_state(n, wires, c64):
    """Every wire regime (head axes, sublane rolls, lane rolls, mixed)
    against the complex einsum engine (reference qmath.py:485 semantics)."""
    rng = np.random.default_rng(n * 31 + len(wires))
    u = _haar(1 << len(wires), rng)
    psi = rng.normal(size=(1 << n)) + 1j * rng.normal(size=(1 << n))
    psi = (psi / np.linalg.norm(psi)).astype(np.complex64)
    ref = np.asarray(evolve_state(jnp.asarray(psi).reshape([2] * n),
                                  jnp.asarray(u), n, list(wires))).reshape(-1)
    y = planar_evolve_matrix(to_planar(jnp.asarray(psi)), jnp.asarray(u),
                             n, tuple(wires), interpret=True)
    np.testing.assert_allclose(np.asarray(from_planar(y)), ref, atol=2e-6)


def test_planar_circuit_expectation_and_grad(c64):
    """Full VQE circuit through the planar chain + planar Pauli expectation
    vs the complex engine: values and gradients."""
    n = 12

    def build():
        cir = dq.QubitCircuit(n)
        for _ in range(2):
            for i in range(n):
                cir.rx(i)
                cir.rz(i)
            cir.cnot_ring()
        cir.observable(list(range(n)), basis='x' * n)
        cir.observable(0, basis='z')
        return cir

    cir = build()
    assert cir._planar_ok()
    p = cir.params
    e_pl = np.asarray(cir.expectation(params=p))
    g_pl = np.asarray(jax.grad(lambda q: cir.expectation(params=q)[0])(p))

    os.environ['DQ_PLANAR'] = '0'
    cir2 = build()
    assert not cir2._planar_ok()
    e_ref = np.asarray(cir2.expectation(params=p))
    g_ref = np.asarray(jax.grad(lambda q: cir2.expectation(params=q)[0])(p))

    np.testing.assert_allclose(e_pl, e_ref, atol=1e-5)
    np.testing.assert_allclose(g_pl, g_ref, atol=1e-4)


def test_planar_disabled_paths(c64):
    """mps / small-n / x64 circuits never take the planar route."""
    assert not dq.QubitCircuit(8)._planar_ok()                  # n < 10
    assert not dq.QubitCircuit(4, den_mat=True)._planar_ok()    # 2n < 10
    dq.set_dtype('complex128')
    assert not dq.QubitCircuit(12)._planar_ok()                 # x64 policy


@pytest.mark.parametrize('fused', ['0', '1'])
def test_planar_density_matrix_with_channels(fused, c64):
    """Density-matrix circuits ride the planar kernel: rho is a 2n-qubit
    planar state (U on wires, conj(U) on wires + n, one chain); Kraus
    channels flush the chain and run dense. State, expectation, and
    gradients match the den-mat einsum engine — with both the 3-launch
    and the fused single-launch backward."""
    os.environ['DQ_FUSED_BWD'] = fused
    n = 6

    def build():
        cir = dq.QubitCircuit(n, den_mat=True)
        for i in range(n):
            cir.rx(i)
        cir.cnot_ring()
        cir.bit_flip(0, inputs=0.05)
        for i in range(n):
            cir.ry(i)
        cir.amp_damp(3, inputs=0.1)
        cir.cnot(0, 1)
        cir.observable(0)
        cir.observable([2, 3], basis='zx')
        return cir

    cir = build()
    assert cir._planar_ok()
    p = cir.params
    rho_p = np.asarray(cir(params=p))
    e_p = np.asarray(cir.expectation(params=p))
    g_p = np.asarray(jax.jit(jax.grad(
        lambda q: cir.expectation(params=q)[0]))(p))

    os.environ['DQ_PLANAR'] = '0'
    os.environ.pop('DQ_FUSED_BWD', None)
    cir2 = build()
    assert not cir2._planar_ok()
    rho_r = np.asarray(cir2(params=p))
    e_r = np.asarray(cir2.expectation(params=p))
    g_r = np.asarray(jax.jit(jax.grad(
        lambda q: cir2.expectation(params=q)[0]))(p))
    os.environ['DQ_PLANAR'] = '1'

    np.testing.assert_allclose(rho_p, rho_r, atol=1e-6)
    np.testing.assert_allclose(e_p, e_r, atol=1e-6)
    np.testing.assert_allclose(g_p, g_r, atol=1e-5)


def test_planar_density_matrix_batched(c64):
    """Batched noisy den-mat QML rides the planar kernel as a grid axis
    (per-sample matrix planes on row wires + conjugates on column wires;
    channels flush through a vmapped Kraus step): forward states,
    expectations, and parameter gradients match the vmapped einsum
    fallback."""
    n, B = 6, 3
    rng = np.random.default_rng(11)

    def build():
        cir = dq.QubitCircuit(n, den_mat=True)
        for i in range(n):
            cir.ry(i, encode=True)
        for i in range(n):
            cir.rz(i)
        cir.cnot_ring()
        cir.depolarizing(0, inputs=0.02)
        for i in range(n):
            cir.rx(i)
        cir.observable(0)
        cir.observable([1, 2], basis='xz')
        return cir

    cir = build()
    data = jnp.asarray(rng.random((B, n)), jnp.float32)
    p = cir.params
    rho_p = np.asarray(cir.forward(data=data, params=p))
    assert rho_p.shape == (B, 1 << n, 1 << n)
    e_p = np.asarray(cir.expectation())
    g_p = np.asarray(jax.jit(jax.grad(
        lambda q: jnp.sum(cir.expectation(data=data, params=q))))(p))

    os.environ['DQ_PLANAR'] = '0'
    cir2 = build()
    rho_r = np.asarray(cir2.forward(data=data, params=p))
    e_r = np.asarray(cir2.expectation())
    g_r = np.asarray(jax.jit(jax.grad(
        lambda q: jnp.sum(cir2.expectation(data=data, params=q))))(p))
    os.environ['DQ_PLANAR'] = '1'

    np.testing.assert_allclose(rho_p, rho_r, atol=1e-6)
    np.testing.assert_allclose(e_p, e_r, atol=1e-6)
    np.testing.assert_allclose(g_p, g_r, atol=1e-5)


def test_planar_shardmap_engine(c64):
    """Planar mode of the Alg.6-10 shard_map engine (pair exchanges move f32
    planes; local groups hit the Pallas kernel when nlocal >= 10) against
    the local circuit."""
    from deepquantum_tpu.parallel import make_mesh
    from deepquantum_tpu.parallel.shardmap_engine import ShardMapSimulator

    rng = np.random.default_rng(5)
    n = 6
    cir = dq.QubitCircuit(n)
    for i in range(n):
        cir.rx(i, encode=True)
    for i in range(n - 1):
        cir.cnot(i, i + 1)
    cir.observable(0)
    cir.observable(list(range(n)), basis='z' * n)
    data = rng.random(n)
    init = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
    init = (init / np.linalg.norm(init)).astype(np.complex64)

    s_local = np.asarray(cir(data=data, state=init)).reshape(-1)
    e_local = np.asarray(cir.expectation())
    sim = ShardMapSimulator(n, make_mesh(8), planar=True)
    np.testing.assert_allclose(np.asarray(sim.run(cir, data=data, state=init)).reshape(-1),
                               s_local, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sim.expectation(cir, data=data, state=init)),
                               e_local, atol=1e-5)


@pytest.mark.parametrize('mxu', ['0', '1'])
def test_planar_fused_backward_matches_unfused(mxu, c64):
    """DQ_FUSED_BWD=1 collapses the 3-launch backward (un-apply, reduce,
    propagate) into ONE pallas_call per gate (4 HBM units instead of 6).
    Full-circuit gradients must match the unfused path bit-for-bit-ish in
    interpret mode, for both cotangent-reduction variants, single and
    batched."""
    n, B = 11, 2

    def build():
        cir = dq.QubitCircuit(n)
        for i in range(n):
            cir.rx(i, encode=True)
        for i in range(n):
            cir.ry(i)
        cir.cnot_ring()
        cir.observable(0)
        return cir

    rng = np.random.default_rng(9)
    data = jnp.asarray(rng.random(n), jnp.float32)
    datab = jnp.asarray(rng.random((B, n)), jnp.float32)
    p = build().params

    def grads():
        # a FRESH circuit per call: the env flag is read at trace time, and
        # a shared circuit's cached grad trace would silently reuse the
        # previous engine (this test was once vacuous exactly that way)
        cir = build()
        g1 = jax.grad(lambda q: cir.expectation(data=data, params=q)[0])(p)
        gb = jax.grad(lambda q: jnp.sum(cir.expectation(data=datab, params=q)))(p)
        return np.asarray(g1), np.asarray(gb)

    from deepquantum_tpu.ops import planar_gate as pg
    calls = {'n': 0}
    orig = pg._planar_bwd_fused

    def counting(*a, **kw):
        calls['n'] += 1
        return orig(*a, **kw)

    os.environ['DQ_GRAD_MXU'] = mxu
    pg._planar_bwd_fused = counting
    try:
        g_ref, gb_ref = grads()
        assert calls['n'] == 0
        os.environ['DQ_FUSED_BWD'] = '1'
        g_fused, gb_fused = grads()
        assert calls['n'] > 0, 'fused path never engaged'
    finally:
        pg._planar_bwd_fused = orig
        os.environ.pop('DQ_FUSED_BWD', None)
        os.environ.pop('DQ_GRAD_MXU', None)
    np.testing.assert_allclose(g_fused, g_ref, atol=1e-6)
    np.testing.assert_allclose(gb_fused, gb_ref, atol=1e-6)


def test_planar_fused_backward_shardmap(c64):
    """The shard_map engine's chain backward rides the fused kernel per
    local group when DQ_FUSED_BWD=1: mesh gradients match the local
    circuit."""
    from deepquantum_tpu.parallel import make_mesh
    from deepquantum_tpu.parallel.shardmap_engine import ShardMapSimulator

    from deepquantum_tpu.ops import planar_gate as pg

    # n=12 on a 4-device mesh gives nlocal=10, the kernel's minimum — an
    # 8-device mesh would leave nlocal < 10 and silently test only the
    # 3-op fallback
    n = 12
    cir = dq.QubitCircuit(n)
    for i in range(n):
        cir.ry(i)
    for i in range(n - 1):
        cir.cnot(i, i + 1)
    cir.observable(0)
    p = cir.params
    g_local = np.asarray(jax.grad(lambda q: cir.expectation(params=q)[0])(p))

    calls = {'n': 0}
    orig = pg._planar_bwd_fused

    def counting(*a, **kw):
        calls['n'] += 1
        return orig(*a, **kw)

    os.environ['DQ_FUSED_BWD'] = '1'
    pg._planar_bwd_fused = counting
    try:
        sim = ShardMapSimulator(n, make_mesh(4), planar=True)
        g_mesh = np.asarray(jax.grad(
            lambda q: sim.expectation(cir, params=q)[0])(p))
    finally:
        pg._planar_bwd_fused = orig
        os.environ.pop('DQ_FUSED_BWD', None)
    assert calls['n'] > 0, 'fused path never engaged on the mesh'
    np.testing.assert_allclose(g_mesh, g_local, atol=1e-5)


@pytest.mark.parametrize('n,wires', [
    (10, (0,)), (10, (9,)), (10, (3, 7)), (12, (0, 5, 11)), (12, (10, 11)),
])
def test_planar_grad_mxu_matches_vpu(n, wires, c64):
    """DQ_GRAD_MXU=1 routes the matrix-cotangent reduction through the
    dot_general (MXU) kernel body; its version-space output gathered through
    _version_perm must equal the VPU scalar-store kernel on every wire
    regime (VERDICT r2 item 6)."""
    from deepquantum_tpu.ops.planar_gate import _planar_grad
    rng = np.random.default_rng(n + len(wires))
    g = jnp.asarray(rng.standard_normal((2, 1 << n)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((2, 1 << n)).astype(np.float32))
    os.environ['DQ_GRAD_MXU'] = '1'
    try:
        dre, dim = _planar_grad(g, x, n, tuple(wires), interpret=True)
    finally:
        os.environ.pop('DQ_GRAD_MXU', None)
    rre, rim = _planar_grad(g, x, n, tuple(wires), interpret=True)
    # both reduce 2^n f32 products per entry — tolerance is accumulation
    # order, not algorithm
    np.testing.assert_allclose(np.asarray(dre), np.asarray(rre), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dim), np.asarray(rim), atol=2e-4)


def test_planar_batched_forward_expectation_grad(c64):
    """Batched (vmapped-data) QML rides the planar kernel as a GRID axis
    (pallas_call does not vmap): forward states, expectation values, and
    parameter gradients match the complex-engine fallback (VERDICT r2
    weak #6 / next-round item 4). Reference use case: circuit.py:232-240."""
    n, B = 11, 3
    rng = np.random.default_rng(5)

    def build():
        cir = dq.QubitCircuit(n)
        for i in range(n):
            cir.rx(i, encode=True)
        for i in range(n):
            cir.ry(i)
        cir.cnot_ring()
        cir.observable(0)
        cir.observable(list(range(4)), basis='zxzx')
        return cir

    cir = build()
    data = jnp.asarray(rng.random((B, n)), jnp.float32)
    p = cir.params
    s_planar = np.asarray(cir.forward(data=data, params=p))
    assert s_planar.shape == (B, 1 << n, 1)
    e_planar = np.asarray(cir.expectation())
    g_planar = np.asarray(jax.grad(
        lambda q: jnp.sum(cir.expectation(data=data, params=q)))(p))

    os.environ['DQ_PLANAR'] = '0'
    cir2 = build()
    s_ref = np.asarray(cir2.forward(data=data, params=p))
    e_ref = np.asarray(cir2.expectation())
    g_ref = np.asarray(jax.grad(
        lambda q: jnp.sum(cir2.expectation(data=data, params=q)))(p))
    os.environ['DQ_PLANAR'] = '1'

    np.testing.assert_allclose(s_planar, s_ref, atol=2e-6)
    np.testing.assert_allclose(e_planar, e_ref, atol=2e-6)
    np.testing.assert_allclose(g_planar, g_ref, atol=2e-6)


def test_rotation_scheduler_plan():
    """schedule_rotations invariants: legal deltas only, closes back to the
    identity labeling, and every gate's physical wires are the rotated image
    of its logical wires."""
    from deepquantum_tpu.ops.planar_gate import (_rot_legal, _roll_count,
                                                 schedule_rotations)
    n = 16
    wlists = []
    for _ in range(2):
        for i in range(n):
            wlists.append((i,))
        for i in range(n):
            wlists.append(tuple(sorted((i, (i + 1) % n))))
    plan, changed = schedule_rotations(wlists, n)
    assert changed
    rot = 0
    gi = 0
    slow = 0
    for ent in plan:
        if ent[0] == 'rot':
            assert _rot_legal(ent[1], n), ent
            rot = (rot + ent[1]) % n
        else:
            _, idx, pw = ent
            assert idx == gi
            assert pw == tuple((w - rot) % n for w in wlists[idx])
            slow += _roll_count(pw, n) >= 2
            gi += 1
    assert gi == len(wlists)
    assert rot == 0, 'plan must close back to identity labeling'
    base_slow = sum(_roll_count(ws, n) >= 2 for ws in wlists)
    assert slow < base_slow / 2, (slow, base_slow)


def test_rotation_scheduler_circuit_parity(c64):
    """VQE circuit at n >= 16 (scheduler engaged) through the planar chain:
    state, expectation, and gradient match the einsum engine, and match the
    DQ_SCHED=0 planar path."""
    from deepquantum_tpu.ops.planar_gate import schedule_rotations
    n = 16

    def build():
        cir = dq.QubitCircuit(n)
        for i in range(n):
            cir.rx(i)
            cir.rz(i)
        cir.cnot_ring()
        cir.observable(list(range(n)), basis='x' * n)
        return cir

    cir = build()
    wlists = [e[2] if e[0] == 'group' else tuple(e[1].wires)
              for e in cir._fused_plan()]
    _, changed = schedule_rotations(list(wlists), n)
    assert changed, 'scheduler should engage on this plan'

    p = cir.params
    e_pl = np.asarray(cir.expectation(params=p))
    g_pl = np.asarray(jax.grad(lambda q: cir.expectation(params=q)[0])(p))
    s_pl = np.asarray(cir.forward(params=p)).reshape(-1)

    os.environ['DQ_SCHED'] = '0'
    try:
        cir1 = build()
        e_ns = np.asarray(cir1.expectation(params=p))
        g_ns = np.asarray(jax.grad(lambda q: cir1.expectation(params=q)[0])(p))
    finally:
        os.environ.pop('DQ_SCHED', None)

    os.environ['DQ_PLANAR'] = '0'
    cir2 = build()
    e_ref = np.asarray(cir2.expectation(params=p))
    g_ref = np.asarray(jax.grad(lambda q: cir2.expectation(params=q)[0])(p))
    s_ref = np.asarray(cir2.forward(params=p)).reshape(-1)
    os.environ['DQ_PLANAR'] = '1'

    np.testing.assert_allclose(e_pl, e_ref, atol=1e-5)
    np.testing.assert_allclose(g_pl, g_ref, atol=1e-4)
    np.testing.assert_allclose(s_pl, s_ref, atol=1e-5)
    np.testing.assert_allclose(e_pl, e_ns, atol=1e-5)
    np.testing.assert_allclose(g_pl, g_ns, atol=1e-4)


def test_window_plan():
    """Greedy window plan: every gate windowed or explicitly fallback, plan
    closes to identity labeling, and a nearest-neighbour sweep collapses to
    few windows."""
    from deepquantum_tpu.ops.window_gate import plan_windows
    n, w = 20, 7
    # nearest-neighbour ladder: (0,1), (1,2), ..., (18,19) — should window
    # in ~ceil(19/6) runs (each relabel exposes 6 fresh pair slots)
    wseq = [(i, i + 1) for i in range(n - 1)]
    plan, n_windowed = plan_windows(tuple(wseq), n, w)
    assert n_windowed == len(wseq)
    n_win = sum(1 for e in plan if e[0] == 'win')
    assert n_win <= 5, plan
    rot = 0
    seen = []
    for ent in plan:
        if ent[0] == 'rot':
            rot = (rot + ent[1]) % n
        elif ent[0] == 'win':
            seen.extend(ent[1])
    assert rot == 0
    assert seen == list(range(len(wseq)))
    # a full-span gate the window cannot hold falls back per-gate
    plan2, nw2 = plan_windows(((0, n // 2 - 1, n - 1),), n, w)
    assert nw2 == 0
    assert [e[0] for e in plan2 if e[0] != 'rot'] == ['gate']


def test_window_circuit_parity(c64):
    """VQE circuit at n = 14 (window engine engaged) — state, expectation,
    gradient parity vs DQ_WINDOW=0 planar and vs the einsum engine."""
    from deepquantum_tpu.ops.window_gate import plan_windows, window_width
    n = 14

    def build():
        cir = dq.QubitCircuit(n)
        for i in range(n):
            cir.rx(i)
            cir.ry(i)
        cir.cnot_ring()
        for i in range(0, n - 1, 2):
            cir.rzz([i, i + 1])
        cir.observable(list(range(n)), basis='x' * n)
        cir.observable(0, basis='z')
        return cir

    cir = build()
    assert cir._planar_ok()
    wlists = [e[2] if e[0] == 'group' else tuple(e[1].wires)
              for e in cir._fused_plan()]
    _, n_windowed = plan_windows(tuple(wlists), n, window_width(n))
    assert n_windowed > 0, 'window engine should engage on this plan'

    p = cir.params
    e_win = np.asarray(cir.expectation(params=p))
    g_win = np.asarray(jax.grad(lambda q: cir.expectation(params=q)[0])(p))
    s_win = np.asarray(cir.forward(params=p)).reshape(-1)

    os.environ['DQ_WINDOW'] = '0'
    try:
        cir1 = build()
        e_pl = np.asarray(cir1.expectation(params=p))
        g_pl = np.asarray(jax.grad(lambda q: cir1.expectation(params=q)[0])(p))
        s_pl = np.asarray(cir1.forward(params=p)).reshape(-1)
    finally:
        os.environ.pop('DQ_WINDOW', None)

    os.environ['DQ_PLANAR'] = '0'
    cir2 = build()
    e_ref = np.asarray(cir2.expectation(params=p))
    g_ref = np.asarray(jax.grad(lambda q: cir2.expectation(params=q)[0])(p))
    os.environ['DQ_PLANAR'] = '1'

    np.testing.assert_allclose(s_win, s_pl, atol=1e-5)
    np.testing.assert_allclose(e_win, e_pl, atol=1e-5)
    np.testing.assert_allclose(g_win, g_pl, atol=1e-4)
    np.testing.assert_allclose(e_win, e_ref, atol=1e-5)
    np.testing.assert_allclose(g_win, g_ref, atol=1e-4)


def test_planar_hessian_fwd_ad_fallback(c64):
    """jax.hessian (forward-over-reverse) cannot cross the planar chain's
    custom_vjp: the circuit must detect the JVP trace at the call boundary
    and fall back to the einsum path — while plain grad stays planar.
    Reference metric served: benchmark_v420/hessian/hessian_deepquantum.py."""
    n = 10
    cir = dq.QubitCircuit(n)
    for i in range(n):
        cir.rx(i)
    cir.cnot_ring()
    cir.observable(0, basis='z')
    assert cir._planar_ok()
    f = lambda q: cir.expectation(params=q)[0]
    p = cir.params
    h = np.asarray(jax.hessian(f)(p))
    assert h.shape == (n, n)
    # parity: hessian row vs finite difference of the (planar) gradient
    eps = 1e-3
    i = 3
    gp = np.asarray(jax.grad(f)(p.at[i].add(eps)))
    gm = np.asarray(jax.grad(f)(p.at[i].add(-eps)))
    np.testing.assert_allclose((gp - gm) / (2 * eps), h[i], atol=5e-3)
    # grad after hessian still routes planar and matches
    g1 = np.asarray(jax.grad(f)(p))
    os.environ['DQ_PLANAR'] = '0'
    cir2 = dq.QubitCircuit(n)
    for j in range(n):
        cir2.rx(j)
    cir2.cnot_ring()
    cir2.observable(0, basis='z')
    g2 = np.asarray(jax.grad(lambda q: cir2.expectation(params=q)[0])(p))
    os.environ['DQ_PLANAR'] = '1'
    np.testing.assert_allclose(g1, g2, atol=1e-4)


def _hessian_circuit(n):
    cir = dq.QubitCircuit(n)
    for i in range(n):
        cir.rx(i)
    cir.cnot_ring()
    cir.observable(0, basis='z')
    return cir


def test_planar_hessian_rev_over_rev(c64):
    """QubitCircuit.hessian: reverse-over-reverse HVP columns THROUGH the
    planar chain's custom VJP (ops/planar_gate.py::_applyd/_gradd close the
    derivative algebra over the apply/grad kernels). n=10 exercises the
    per-gate planar route; parity vs the einsum engine's rev-rev hessian
    and vs a finite difference of the planar gradient.
    Reference metric: benchmark_v420/hessian/hessian_deepquantum.py."""
    n = 10
    cir = _hessian_circuit(n)
    assert cir._planar_ok()
    p = cir.params
    h = np.asarray(cir.hessian())
    assert h.shape == (n, n)
    # symmetric up to f32 roundoff
    np.testing.assert_allclose(h, h.T, atol=1e-5)
    # vs the einsum engine's rev-over-rev hessian
    os.environ['DQ_PLANAR'] = '0'
    try:
        cir2 = _hessian_circuit(n)
        h2 = np.asarray(cir2.hessian(params=p))
    finally:
        os.environ['DQ_PLANAR'] = '1'
    np.testing.assert_allclose(h, h2, atol=1e-4)
    # vs finite difference of the planar gradient
    f = lambda q: cir.expectation(params=q)[0]
    eps = 1e-3
    i = 4
    gp = np.asarray(jax.grad(f)(p.at[i].add(eps)))
    gm = np.asarray(jax.grad(f)(p.at[i].add(-eps)))
    np.testing.assert_allclose((gp - gm) / (2 * eps), h[i], atol=5e-3)


def test_planar_hessian_window_route(c64):
    """Rev-over-rev hessian at n=14: the chain takes the MXU window engine
    route (('win', w) entries + relabel rotations), so this covers
    _winapplyd's second-order rule and the differentiability of the
    window-product embedding."""
    n = 14
    cir = _hessian_circuit(n)
    assert cir._planar_ok()
    p = cir.params
    h = np.asarray(cir.hessian())
    assert h.shape == (n, n)
    np.testing.assert_allclose(h, h.T, atol=1e-5)
    os.environ['DQ_PLANAR'] = '0'
    try:
        cir2 = _hessian_circuit(n)
        h2 = np.asarray(cir2.hessian(params=p))
    finally:
        os.environ['DQ_PLANAR'] = '1'
    np.testing.assert_allclose(h, h2, atol=1e-4)


def test_chain_fused_kernel_parity(c64):
    """The one-launch VMEM chain engine (ops/chain_kernel.py) against the
    per-step window path on a qualifying sequence: state, expectation and
    gradient parity with DQ_CHAIN_FUSED=1 vs 0, plus hessian still working
    (it pins the fused path off around its rev-over-rev trace)."""
    from deepquantum_tpu.ops.chain_kernel import chain_fused_ok
    from deepquantum_tpu.ops.planar_gate import schedule_planar_seq
    import jax.numpy as jnp
    n = 16  # smallest n whose scheduled VQE sequence is pure window/rot

    def build():
        cir = dq.QubitCircuit(n)
        for i in range(n):
            cir.rx(i)
            cir.rz(i)
        cir.cnot_ring()
        cir.observable(list(range(n)), basis='x' * n)
        return cir

    cir = build()
    # the scheduled sequence must be all-window/rot so the fused engine takes it
    full = cir._full_params(cir.params, None, None)
    mres, mims, wseq = [], [], []
    for entry in cir._fused_plan():
        mat, ws = cir._fused_matrix(entry, full) if entry[0] != 'op' else (None, None)
        if mat is None:
            op = entry[1]
            from deepquantum_tpu.ops.apply import controlled_matrix
            mat = controlled_matrix(jnp.asarray(op.matrix(full), jnp.complex64),
                                    len(op.controls))
            ws = sorted(list(op.controls) + list(op.wires))
        mres.append(jnp.real(mat).astype(jnp.float32))
        mims.append(jnp.imag(mat).astype(jnp.float32))
        wseq.append(tuple(sorted(ws)))
    r, i_, w = schedule_planar_seq(tuple(mres), tuple(mims), tuple(wseq), n)
    assert chain_fused_ok(w, n, r), {s if s[0] in ('rot', 'win') else 'gate'
                                     for s in w}

    p = cir.params
    e_f = np.asarray(cir.expectation(params=p))
    g_f = np.asarray(jax.grad(lambda q: cir.expectation(params=q)[0])(p))
    s_f = np.asarray(cir.forward(params=p)).reshape(-1)
    h_f = np.asarray(cir.hessian(params=p))

    os.environ['DQ_CHAIN_FUSED'] = '0'
    try:
        cir0 = build()
        e_s = np.asarray(cir0.expectation(params=p))
        g_s = np.asarray(jax.grad(lambda q: cir0.expectation(params=q)[0])(p))
        s_s = np.asarray(cir0.forward(params=p)).reshape(-1)
        h_s = np.asarray(cir0.hessian(params=p))
    finally:
        os.environ.pop('DQ_CHAIN_FUSED', None)

    np.testing.assert_allclose(s_f, s_s, atol=1e-5)
    np.testing.assert_allclose(e_f, e_s, atol=1e-5)
    np.testing.assert_allclose(g_f, g_s, atol=1e-4)
    np.testing.assert_allclose(h_f, h_s, atol=1e-3)
