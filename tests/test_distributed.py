"""Distributed (mesh-sharded) vs local engine — tier-1 parity tests.

Mirrors the reference strategy (tests/test_circuit.py:45-141): the sharded
engine on a virtual 8-device CPU mesh must agree with the local engine on
states, expectations AND gradients.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import deepquantum_tpu as dq
from deepquantum_tpu.parallel import DistributedQubitCircuit, make_mesh


def _build(cir, n, angles):
    k = 0
    for i in range(n):
        cir.rx(i, inputs=angles[k]); k += 1
    for i in range(n - 1):
        cir.cnot(i, i + 1)
    for i in range(n):
        cir.rz(i, inputs=angles[k]); k += 1
    cir.crx(0, n - 1, inputs=angles[k]); k += 1
    cir.ccx(1, 2, 0)
    cir.observable(0, basis='z')
    cir.observable(list(range(n)), basis='x' * n)


def test_sharded_matches_local():
    n = 5
    rng = np.random.default_rng(0)
    angles = rng.random(2 * n + 1) * 2 * np.pi

    local = dq.QubitCircuit(n)
    _build(local, n, angles)
    mesh = make_mesh(8)
    dist = DistributedQubitCircuit(n, mesh=mesh)
    _build(dist, n, angles)

    s_local = np.asarray(local()).reshape(-1)
    s_dist = np.asarray(dist()).reshape(-1)
    np.testing.assert_allclose(s_dist, s_local, atol=1e-10)

    e_local = np.asarray(local.expectation())
    e_dist = np.asarray(dist.expectation())
    np.testing.assert_allclose(e_dist, e_local, atol=1e-10)


def test_sharded_gradients_match_local():
    n = 4
    local = dq.QubitCircuit(n)
    dist = DistributedQubitCircuit(n, mesh=make_mesh(4))
    for cir in (local, dist):
        for i in range(n):
            cir.rx(i, inputs=0.3 + 0.1 * i)
        for i in range(n - 1):
            cir.cnot(i, i + 1)
        cir.observable(list(range(n)), basis='z' * n)
        # make params trainable
        cir._train_mask = [True] * len(cir._pvals)

    p = local.params
    g_local = jax.grad(lambda q: local.expectation(params=q)[0])(p)
    g_dist = jax.grad(lambda q: dist.expectation(params=q)[0])(p)
    np.testing.assert_allclose(np.asarray(g_dist), np.asarray(g_local), atol=1e-10)


def test_world_size_one_fallback():
    n = 3
    local = dq.QubitCircuit(n)
    dist = DistributedQubitCircuit(n, mesh=make_mesh(1))
    for cir in (local, dist):
        cir.h(0)
        cir.cnot(0, 1)
        cir.rzz([1, 2], inputs=0.4)
    np.testing.assert_allclose(np.asarray(dist()).reshape(-1),
                               np.asarray(local()).reshape(-1), atol=1e-12)


def test_dryrun_multichip():
    import sys
    sys.path.insert(0, '/root/repo')
    from __graft_entry__ import dryrun_multichip, entry
    dryrun_multichip(8)
    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()


def test_distributed_fock_matches_local():
    """Sharded Fock tensor engine vs local (reference tests/test_circuit.py:143)."""
    from deepquantum_tpu.photonic import QumodeCircuit
    from deepquantum_tpu.photonic.distributed import DistributedQumodeCircuit

    def build(c):
        c.ps(0, inputs=0.3)
        c.bs([0, 1], inputs=[0.4, 0.5])
        c.s(1, r=0.2, theta=0.1)
        c.d(2, r=0.3, theta=0.7)
        c.bs([1, 2], inputs=[0.8, 0.1])

    local = QumodeCircuit(nmode=3, init_state=[1, 0, 0], cutoff=3, backend='fock', basis=False)
    dist = DistributedQumodeCircuit(nmode=3, init_state=[1, 0, 0], cutoff=3, mesh=make_mesh(3))  # mesh size must divide cutoff**nmode
    build(local)
    build(dist)
    s_local = np.asarray(local()).reshape(-1)
    s_dist = np.asarray(dist()).reshape(-1)
    np.testing.assert_allclose(s_dist, s_local, atol=1e-10)
    res = dist.measure(shots=100)
    assert sum(res.values()) == 100


def test_adjoint_gradient_matches_autodiff():
    """Adjoint-method gradients equal plain AD (reference tests/test_circuit.py:45 strategy)."""
    from deepquantum_tpu.adjoint import make_adjoint_expectation
    n = 4
    cir = dq.QubitCircuit(n)
    for i in range(n):
        cir.rx(i, inputs=0.3 + 0.1 * i)
        cir.rz(i, inputs=0.2 + 0.05 * i)
    for i in range(n - 1):
        cir.cnot(i, i + 1)
    cir.crx(0, 3, inputs=0.4)
    cir.observable(list(range(n)), basis='z' * n)
    cir._train_mask = [True] * len(cir._pvals)

    p = cir.params
    e_adj_fn = make_adjoint_expectation(cir)
    e_ad = cir.expectation(params=p)[0]
    e_adj = e_adj_fn(p)
    np.testing.assert_allclose(float(e_adj), float(e_ad), atol=1e-10)

    g_ad = jax.grad(lambda q: cir.expectation(params=q)[0])(p)
    g_adj = jax.grad(e_adj_fn)(p)
    np.testing.assert_allclose(np.asarray(g_adj), np.asarray(g_ad), atol=1e-8)


def test_adjoint_scan_deep_circuit():
    """Scan-based adjoint at real depth (330 gates): compile is O(1) in depth
    and gradients match plain AD incl. U3/Toffoli/inverse ops."""
    import time
    from deepquantum_tpu.adjoint import make_adjoint_expectation
    n, nlayer = 10, 3
    rng = np.random.default_rng(11)
    cir = dq.QubitCircuit(n)
    for _ in range(nlayer):
        for i in range(n):
            cir.rx(i, inputs=float(rng.random()))
            cir.rz(i, inputs=float(rng.random()))
            cir.u3(i, inputs=rng.random(3).tolist())
        cir.cnot_ring()
        cir.toffoli(0, 1, 2)
    cir.observable(list(range(n)), basis='x')
    cir._train_mask = [True] * len(cir._pvals)
    p = cir.params

    t0 = time.time()
    fn = jax.jit(jax.value_and_grad(make_adjoint_expectation(cir)))
    e_adj, g_adj = fn(p)
    jax.block_until_ready(g_adj)
    compile_s = time.time() - t0
    e_ad, g_ad = jax.value_and_grad(lambda q: cir.expectation(params=q)[0])(p)
    np.testing.assert_allclose(float(e_adj), float(e_ad), atol=1e-8)
    np.testing.assert_allclose(np.asarray(g_adj), np.asarray(g_ad), atol=1e-7)
    assert compile_s < 120, f'adjoint compile took {compile_s:.0f}s — depth leaked into program size'


def test_adjoint_inverse_circuit_gradient():
    """Gradients through an inverted circuit (op.inv=True) on the adjoint path."""
    from deepquantum_tpu.adjoint import make_adjoint_expectation
    n = 4
    cir = dq.QubitCircuit(n)
    for i in range(n):
        cir.ry(i, inputs=0.3 + 0.2 * i)
    cir.cnot(0, 1)
    cir.cnot(2, 3)
    inv = cir.inverse()
    inv.observable(list(range(n)), basis='y' * n)
    inv._train_mask = [True] * len(inv._pvals)
    p = inv.params
    g_ad = jax.grad(lambda q: inv.expectation(params=q)[0])(p)
    g_adj = jax.grad(make_adjoint_expectation(inv))(p)
    np.testing.assert_allclose(np.asarray(g_adj), np.asarray(g_ad), atol=1e-8)


def test_shardmap_engine_matches_local():
    """Explicit pair-exchange engine (arXiv:2311.01512) vs local simulation."""
    from deepquantum_tpu.parallel.shardmap_engine import ShardMapSimulator
    n = 5
    rng = np.random.default_rng(7)
    cir = dq.QubitCircuit(n)
    for i in range(n):
        cir.rx(i, inputs=float(rng.random()))
    # gates on global qubits (0..2 with 8 devices), local qubits, and mixed
    cir.h(0)
    cir.cnot(0, 4)     # global control, local target
    cir.cnot(3, 4)     # purely local
    cir.cnot(0, 1)     # both global
    cir.rzz([1, 3], inputs=0.4)
    cir.crx(2, 0, inputs=0.7)
    cir.observable(0)
    cir.observable(list(range(n)), basis='x' * n)

    local_state = np.asarray(cir()).reshape(-1)
    sim = ShardMapSimulator(n, make_mesh(8))
    dist_state = np.asarray(sim.run(cir)).reshape(-1)
    np.testing.assert_allclose(dist_state, local_state, atol=1e-10)

    e_local = np.asarray(cir.expectation())
    e_dist = np.asarray(sim.expectation(cir))
    np.testing.assert_allclose(e_dist, e_local, atol=1e-10)


def _parity_suite(engine_run, engine_expect, engine_measure, n=5, seed=11):
    """One parity suite driven through BOTH distributed engines (GSPMD and
    explicit shard_map): data encoding, custom initial state, expectation,
    and sampling statistics vs the local circuit."""
    rng = np.random.default_rng(seed)
    cir = dq.QubitCircuit(n)
    for i in range(n):
        cir.rx(i, encode=True)
    for i in range(n - 1):
        cir.cnot(i, i + 1)
    for i in range(n):
        cir.ry(i, inputs=float(rng.random()))
    cir.observable(0)
    cir.observable(list(range(n)), basis='z' * n)

    data = rng.random(n)
    init = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
    init /= np.linalg.norm(init)

    s_local = np.asarray(cir(data=data, state=init)).reshape(-1)
    e_local = np.asarray(cir.expectation())
    s_dist = np.asarray(engine_run(cir, data, init)).reshape(-1)
    np.testing.assert_allclose(s_dist, s_local, atol=1e-10)
    np.testing.assert_allclose(np.asarray(engine_expect(cir, data, init)),
                               e_local, atol=1e-10)
    # sampling statistics: Z-string expectation from counts
    shots = 20000
    counts = engine_measure(cir, shots, data, init)
    assert sum(counts.values()) == shots
    z = sum(c * (-1) ** bin(int(b, 2)).count('1') for b, c in counts.items()) / shots
    np.testing.assert_allclose(z, e_local[1], atol=0.05)


def test_engine_parity_shardmap():
    from deepquantum_tpu.parallel.shardmap_engine import ShardMapSimulator
    sim = ShardMapSimulator(5, make_mesh(8))
    _parity_suite(
        lambda cir, data, init: sim.run(cir, data=data, state=init),
        lambda cir, data, init: sim.expectation(cir, data=data, state=init),
        lambda cir, shots, data, init: sim.measure(cir, shots, data=data, state=init),
    )


def test_engine_parity_gspmd():
    def run(cir, data, init):
        dist = DistributedQubitCircuit(5, mesh=make_mesh(8))
        dist.add(cir)
        dist.observables = cir.observables
        return dist.forward(data=data, state=init)

    holder = {}

    def expect(cir, data, init):
        dist = DistributedQubitCircuit(5, mesh=make_mesh(8))
        dist.add(cir)
        dist.observables = cir.observables
        dist.forward(data=data, state=init)
        holder['dist'] = dist
        return dist.expectation(data=data, state=init)

    def measure(cir, shots, data, init):
        dist = holder['dist']
        dist.forward(data=data, state=init)
        return dist.measure(shots=shots)

    _parity_suite(run, expect, measure)


def test_sharded_train_state_checkpoint_resume(tmp_path):
    """Orbax checkpoint of a sharded VQE training state: save mid-run,
    restore, continue — bit-identical to the uninterrupted run (closes
    VERDICT round-1 missing item 2; BASELINE.md resumable-training north
    star)."""
    import optax
    from deepquantum_tpu.utils import load_train_state, save_train_state

    n = 8
    mesh = make_mesh(8)
    cir = DistributedQubitCircuit(n, mesh=mesh)
    for i in range(n):
        cir.rx(i)          # trainable
        cir.rz(i)
    cir.cnot_ring()
    cir.observable(list(range(n)), basis='x' * n)

    opt = optax.adam(0.05)

    def init_state():
        import jax.numpy as jnp
        p = cir.params
        return dict(params=p, opt=opt.init(p), step=jnp.zeros((), jnp.int32))

    @jax.jit
    def step(ts):
        val, grads = jax.value_and_grad(lambda q: cir.expectation(params=q)[0])(ts['params'])
        updates, opt_state = opt.update(grads, ts['opt'])
        import optax as _ox
        return dict(params=_ox.apply_updates(ts['params'], updates),
                    opt=opt_state, step=ts['step'] + 1), val

    # uninterrupted: 4 steps
    ts_ref = init_state()
    for _ in range(4):
        ts_ref, val_ref = step(ts_ref)

    # interrupted: 2 steps, checkpoint, restore, 2 more
    ts = init_state()
    for _ in range(2):
        ts, _ = step(ts)
    ckpt = str(tmp_path / 'ckpt')
    save_train_state(ckpt, ts)
    restored = load_train_state(ckpt, jax.tree.map(lambda a: a, ts))
    # restored arrays keep their shardings and exact values
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(ts)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for _ in range(2):
        restored, val_res = step(restored)

    assert int(restored['step']) == 4
    np.testing.assert_allclose(np.asarray(restored['params']),
                               np.asarray(ts_ref['params']), atol=0)
    np.testing.assert_allclose(float(val_res), float(val_ref), atol=0)


def test_distributed_engine_shardmap_option():
    """DistributedQubitCircuit(engine='shardmap') matches the GSPMD engine
    (forward + expectation), pinning the Alg.6-10 pair-exchange path behind
    the same public API."""
    n = 6
    rng = np.random.default_rng(3)

    def build(engine):
        cir = DistributedQubitCircuit(n, mesh=make_mesh(8), engine=engine)
        for i in range(n):
            cir.rx(i, inputs=float(rng.random()))
        for i in range(n - 1):
            cir.cnot(i, i + 1)
        cir.observable(0)
        return cir

    rng = np.random.default_rng(3)
    g = build('gspmd')
    rng = np.random.default_rng(3)
    s = build('shardmap')
    np.testing.assert_allclose(np.asarray(s.forward()).reshape(-1),
                               np.asarray(g.forward()).reshape(-1), atol=1e-10)
    np.testing.assert_allclose(np.asarray(s.expectation()),
                               np.asarray(g.expectation()), atol=1e-10)
    counts = s.measure(shots=64)
    assert isinstance(counts, dict) and sum(counts.values()) == 64


def test_shardmap_gradient_parity():
    """Chain-level custom VJP through the shard_map engine (the multi-chip
    training path): parameter AND data gradients match the local circuit and
    the GSPMD engine at 1e-10 on the 8-device mesh. Covers all three step
    kinds (local apply, Alg.6 global single-qubit exchange, Alg.8-10
    swap-remap) under differentiation."""
    from deepquantum_tpu.parallel.shardmap_engine import ShardMapSimulator

    n = 5
    rng = np.random.default_rng(17)
    cir = dq.QubitCircuit(n)
    for i in range(n):
        cir.rx(i, encode=True)
    for i in range(n):
        cir.ry(i)
        cir.rz(i)
    cir.h(0)
    cir.cnot(0, 4)        # global control, local target (remap)
    cir.cnot(0, 1)        # both global (double remap)
    cir.cnot(3, 4)        # purely local
    cir.rzz([1, 3])       # trainable, mixed global/local
    cir.crx(2, 0)         # trainable, remap with permuted wires
    cir.observable(0)
    cir.observable(list(range(n)), basis='x' * n)

    data = jnp.asarray(rng.random(n))
    p = cir.params
    sim = ShardMapSimulator(n, make_mesh(8))

    dist = DistributedQubitCircuit(n, mesh=make_mesh(8), engine='gspmd')
    dist.add(cir)
    dist.observables = cir.observables

    for tgt in range(2):
        g_local = np.asarray(jax.grad(
            lambda q: cir.expectation(data=data, params=q)[tgt])(p))
        g_smap = np.asarray(jax.grad(
            lambda q: sim.expectation(cir, params=q, data=data)[tgt])(p))
        g_gspmd = np.asarray(jax.grad(
            lambda q: dist.expectation(data=data, params=q)[tgt])(p))
        np.testing.assert_allclose(g_smap, g_local, atol=1e-10)
        np.testing.assert_allclose(g_smap, g_gspmd, atol=1e-10)

    d_local = np.asarray(jax.grad(
        lambda d: cir.expectation(data=d, params=p)[1])(data))
    d_smap = np.asarray(jax.grad(
        lambda d: sim.expectation(cir, params=p, data=d)[1])(data))
    np.testing.assert_allclose(d_smap, d_local, atol=1e-10)


def test_shardmap_train_step():
    """One optimizer step through DistributedQubitCircuit(engine='shardmap')
    under an outer jit — the multi-chip training loop the driver dry-runs."""
    import optax

    n = 6
    cir = DistributedQubitCircuit(n, mesh=make_mesh(8), engine='shardmap')
    for i in range(n):
        cir.rx(i)
        cir.rz(i)
    cir.cnot_ring()
    cir.observable(list(range(n)), basis='x' * n)

    ref = dq.QubitCircuit(n)
    ref.add(cir)
    ref.observables = cir.observables

    params = cir.params
    opt = optax.sgd(0.05)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s):
        val, grads = jax.value_and_grad(lambda q: cir.expectation(params=q)[0])(p)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, val, grads

    p1, opt_state, val, grads = step(params, opt_state)
    g_ref = jax.grad(lambda q: ref.expectation(params=q)[0])(params)
    np.testing.assert_allclose(np.asarray(grads), np.asarray(g_ref), atol=1e-10)
    np.testing.assert_allclose(float(val), float(ref.expectation(params=params)[0]),
                               atol=1e-10)
    assert not np.allclose(np.asarray(p1), np.asarray(params))


def test_shardmap_gradient_pallas_interpret():
    """The SAME distributed chain VJP with the Pallas kernels engaged
    (interpret mode, complex64 policy): per-shard local groups go through
    _planar_apply/_planar_grad while exchanges ride ppermute — the exact
    program the TPU multi-chip path compiles."""
    import deepquantum_tpu as dqm
    from deepquantum_tpu.parallel.shardmap_engine import ShardMapSimulator

    dqm.set_dtype('complex64')
    try:
        n = 13                      # nlocal = 10 on 8 devices -> kernel engages
        cir = dq.QubitCircuit(n)
        for i in range(n):
            cir.rx(i)
        cir.cnot(0, 12)             # remap path with kernel local apply
        cir.cnot(5, 6)
        cir.observable(0)
        sim = ShardMapSimulator(n, make_mesh(8), planar=True)
        assert sim.cfg.use_pallas
        p = cir.params
        e = np.asarray(sim.expectation(cir, params=p))
        g = np.asarray(jax.grad(lambda q: sim.expectation(cir, params=q)[0])(p))
    finally:
        dqm.set_dtype('complex128')

    e_ref = np.asarray(cir.expectation(params=p))
    g_ref = np.asarray(jax.grad(lambda q: cir.expectation(params=q)[0])(p))
    np.testing.assert_allclose(e, e_ref, atol=1e-5)
    np.testing.assert_allclose(g, g_ref, atol=1e-5)


def test_distributed_adjoint_expectation_on_mesh():
    """DistributedQubitCircuit.expectation(adjoint=True) on the 8-device
    mesh: the initial state is pinned to the circuit's sharding
    (adjoint.py init_psi), values and gradients match the plain
    (autodiff) distributed expectation and the local circuit."""
    from deepquantum_tpu.adjoint import make_adjoint_expectation

    n = 5

    def build(c):
        for i in range(n):
            c.ry(i, inputs=0.2 + 0.1 * i)
        for i in range(n - 1):
            c.cnot(i, i + 1)
        for i in range(n):
            c.rz(i, inputs=0.1 * i)
        c.observable(0, basis='z')
        c.observable([1, 2], basis='xy')

    dist = DistributedQubitCircuit(n, mesh=make_mesh(8), engine='gspmd')
    build(dist)
    dist._train_mask = [True] * len(dist._pvals)
    local = dq.QubitCircuit(n)
    build(local)
    local._train_mask = [True] * len(local._pvals)

    p = dist.params
    e_adj = np.asarray(dist.expectation(params=p, adjoint=True))
    e_ad = np.asarray(dist.expectation(params=p))
    e_loc = np.asarray(local.expectation(params=p))
    np.testing.assert_allclose(e_adj, e_ad, atol=1e-8)
    np.testing.assert_allclose(e_adj, e_loc, atol=1e-8)

    g_adj = jax.grad(lambda q: make_adjoint_expectation(dist, 0)(q))(p)
    g_ad = jax.grad(lambda q: local.expectation(params=q)[0])(p)
    np.testing.assert_allclose(np.asarray(g_adj), np.asarray(g_ad), atol=1e-8)


def test_shardmap_scheduled_local_runs():
    """Local gate runs inside the shardmap program go through the same
    relabel scheduler + MXU window engine as the single-chip path
    (ShardMapSimulator._schedule_local_runs): at nlocal >= 14 the program
    must contain ('rot'/'win') steps, exchanges must still see the identity
    labeling, and values/gradients must match the local circuit. This is
    the fix for the r4 mesh=1 overhead finding (shardmap_grad_ms: 210.9 vs
    131.9 ms at n24 was exactly the scheduler+window win the engine lacked)."""
    import deepquantum_tpu as dqm
    from deepquantum_tpu.parallel.shardmap_engine import ShardMapSimulator

    dqm.set_dtype('complex64')
    try:
        n = 16                       # mesh=2 -> nlocal = 15: windows engage
        cir = dq.QubitCircuit(n)
        for i in range(n):
            cir.rx(i)
            cir.rz(i)
        for i in range(n - 1):
            cir.cnot(i, i + 1)       # cnot(0, 1) crosses the global qubit
        cir.observable(0)
        sim = ShardMapSimulator(n, make_mesh(2), planar=True)
        assert sim.cfg.use_pallas
        gates = sim._gate_list(cir, sim._full(cir, cir.params, None))
        program, _, _ = sim._build_program(gates)
        kinds = {p[0] for p in program}
        assert 'win' in kinds, kinds  # the window engine must have engaged
        p = cir.params
        e = np.asarray(sim.expectation(cir, params=p))
        g = np.asarray(jax.grad(lambda q: sim.expectation(cir, params=q)[0])(p))
    finally:
        dqm.set_dtype('complex128')

    e_ref = np.asarray(cir.expectation(params=p))
    g_ref = np.asarray(jax.grad(lambda q: cir.expectation(params=q)[0])(p))
    np.testing.assert_allclose(e, e_ref, atol=1e-5)
    np.testing.assert_allclose(g, g_ref, atol=1e-5)
