"""On-chip A/B: relabel scheduler (DQ_SCHED) win on the real VQE grad step.

Times value_and_grad SGD steps for the headline workloads with the scheduler
on vs off IN THE SAME PROCESS (the flag is read at trace time; separate
circuit builds get separate jit caches via fresh circuits).

Usage: DQ_N=24 DQ_L=2 python benchmarks/probe_sched.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import deepquantum_tpu as dq

N = int(os.environ.get('DQ_N', 24))
L = int(os.environ.get('DQ_L', 2))
STEPS = int(os.environ.get('DQ_STEPS', 10))


def build():
    cir = dq.QubitCircuit(N)
    for _ in range(L):
        for i in range(N):
            cir.rx(i)
            cir.rz(i)
            cir.rx(i)
        cir.cnot_ring()
    cir.observable(list(range(N)), basis='x' * N)
    return cir


def rt_ms():
    f = jax.jit(lambda e: e * 2.0 + 1.0)
    float(f(jnp.asarray(0.5, jnp.float32)))
    ts = []
    for k in range(3):
        t0 = time.perf_counter()
        float(f(jnp.asarray(0.1 * k, jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[1] * 1e3


def bench(tag):
    cir = build()
    gfn = jax.value_and_grad(lambda p: cir.expectation(params=p)[0])

    @jax.jit
    def loop(p, eps):
        def body(p, _):
            _, g = gfn(p)
            return p - 1e-3 * g, None
        p = jax.lax.scan(body, p + eps, None, length=STEPS)[0]
        return jnp.sum(p)

    rt = rt_ms()
    float(loop(cir.params, jnp.zeros((), jnp.float32)))
    t0 = time.perf_counter()
    float(loop(cir.params, jnp.asarray(1e-4, jnp.float32)))
    ms = ((time.perf_counter() - t0) * 1e3 - rt) / STEPS
    print(f'{tag}: {ms:.3f} ms/grad-step (n={N}, l={L})')
    return ms


if __name__ == '__main__':
    os.environ['DQ_SCHED'] = '0'
    off = bench('sched OFF')
    os.environ['DQ_SCHED'] = '1'
    on = bench('sched ON ')
    print(f'speedup: {off / on:.2f}x')
