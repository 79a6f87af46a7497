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
