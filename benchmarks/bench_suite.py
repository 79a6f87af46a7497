"""Benchmark suite mirroring the reference harness
(reference examples/benchmarks/benchmark_v420): gradient step, permanent,
hafnian, torontonian throughput — ours on TPU vs the mounted PyTorch
reference on host CPU. Writes JSON results to benchmarks/results.json.

Usage: python benchmarks/bench_suite.py [gradient|permanent|hafnian|torontonian|all]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _chain_time(fn, x0, steps, advance):
    """Chained timing: each step consumes the previous output (cache-proof)."""
    import jax
    v = fn(x0)
    jax.block_until_ready(v)
    x = x0
    t0 = time.perf_counter()
    for _ in range(steps):
        v = fn(x)
        x = advance(x, v)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / steps * 1e3


def bench_gradient(ns=(6, 10, 14, 18), nlayer=5, steps=100):
    import jax
    import deepquantum_tpu as dq
    out = {}
    for n in ns:
        cir = dq.QubitCircuit(n)
        for _ in range(nlayer):
            for i in range(n):
                cir.rx(i); cir.rz(i); cir.rx(i)
            cir.cnot_ring()
        cir.observable(list(range(n)), basis='x' * n)
        params = cir.params
        grad_fn = jax.jit(jax.value_and_grad(lambda p: cir.expectation(params=p)[0]))
        ms = _chain_time(lambda p: grad_fn(p)[1], params, steps,
                         lambda p, g: p + 1e-4 * g)
        out[f'n{n}_l{nlayer}'] = ms
        print(f'gradient n={n} l={nlayer}: {ms:.3f} ms/step')
    return out


def bench_permanent(ns=(10, 14, 18, 20, 22), steps=10):
    import jax
    import jax.numpy as jnp
    from deepquantum_tpu.photonic.qmath import permanent
    from deepquantum_tpu.utils.compat import to_device
    rng = np.random.default_rng(0)
    out = {}
    for n in ns:
        m = to_device((rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n)))
                      .astype(np.complex64))
        fn = jax.jit(permanent)
        ms = _chain_time(fn, m, steps,
                         lambda x, v: x * (1 + 1e-9 * jnp.real(v) / (jnp.abs(v) + 1)))
        out[f'n{n}'] = ms
        print(f'permanent n={n}: {ms:.3f} ms')
    return out


def bench_hafnian(ns=(8, 10, 12), steps=10):
    import jax
    import jax.numpy as jnp
    from deepquantum_tpu.photonic.hafnian_ import hafnian
    from deepquantum_tpu.utils.compat import to_device
    rng = np.random.default_rng(1)
    out = {}
    for n in ns:
        a = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
        a = (a + a.T).astype(np.complex64)
        m = to_device(a)
        fn = jax.jit(lambda x: hafnian(x))
        ms = _chain_time(fn, m, steps,
                         lambda x, v: x * (1 + 1e-9 * jnp.real(v) / (jnp.abs(v) + 1)))
        out[f'n{n}'] = ms
        print(f'hafnian n={n}: {ms:.3f} ms')
    return out


def bench_torontonian(ns=(6, 8, 10), steps=10):
    import jax
    import jax.numpy as jnp
    from deepquantum_tpu.photonic.torontonian_ import torontonian
    from deepquantum_tpu.utils.compat import to_device
    rng = np.random.default_rng(2)
    out = {}
    for n in ns:
        m = rng.standard_normal((2 * n, 2 * n)) * 0.1
        o = np.eye(2 * n) - np.linalg.inv(np.eye(2 * n) + (m @ m.T))
        x = to_device(o.astype(np.complex64))
        fn = jax.jit(lambda y: torontonian(y))
        ms = _chain_time(fn, x, steps,
                         lambda z, v: z * (1 + 1e-9 * jnp.real(v) / (jnp.abs(v) + 1)))
        out[f'n{n}'] = ms
        print(f'torontonian 2n={2 * n}: {ms:.3f} ms')
    return out


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else 'all'
    results = {}
    if which in ('gradient', 'all'):
        results['gradient_ms'] = bench_gradient()
    if which in ('permanent', 'all'):
        results['permanent_ms'] = bench_permanent()
    if which in ('hafnian', 'all'):
        results['hafnian_ms'] = bench_hafnian()
    if which in ('torontonian', 'all'):
        results['torontonian_ms'] = bench_torontonian()
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'results.json')
    with open(path, 'w') as f:
        json.dump(results, f, indent=2)
    print(f'wrote {path}')


if __name__ == '__main__':
    main()
