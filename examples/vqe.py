"""VQE on a transverse-field Ising chain (counterpart of reference examples/vqe_for_CRW.py).

H = -sum_i Z_i Z_{i+1} - g sum_i X_i, minimized with a hardware-efficient
ansatz, jitted optax training loop.
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import jax
import optax

import deepquantum_tpu as dq

N = 8
LAYERS = 3
G_FIELD = 1.0

cir = dq.QubitCircuit(N)
for _ in range(LAYERS):
    for i in range(N):
        cir.ry(i)
        cir.rz(i)
    for i in range(N - 1):
        cir.cnot(i, i + 1)
for i in range(N - 1):
    cir.observable([[i], [i + 1]], basis='zz')
for i in range(N):
    cir.observable(i, basis='x')


def energy(params):
    ev = cir.expectation(params=params)
    zz = ev[: N - 1].sum()
    x = ev[N - 1:].sum()
    return -(zz + G_FIELD * x)


def main():
    params = cir.params
    opt = optax.adam(0.05)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        val, grads = jax.value_and_grad(energy)(p)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, val

    for it in range(200):
        params, state, val = step(params, state)
        if it % 20 == 0:
            print(f'iter {it:4d}  E = {float(val):.6f}')
    print(f'final E = {float(val):.6f}')


if __name__ == '__main__':
    main()
