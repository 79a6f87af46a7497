"""30-qubit-scale VQE over a sharded statevector.

Run with N virtual devices for a dry run:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 python examples/distributed_vqe.py
On a TPU pod slice the same code shards over real chips via ICI.
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import jax
import optax

import deepquantum_tpu as dq
from deepquantum_tpu.parallel import DistributedQubitCircuit, make_mesh


def main(nqubit: int = 12, nlayer: int = 2):
    mesh = make_mesh()
    cir = DistributedQubitCircuit(nqubit, mesh=mesh)
    for _ in range(nlayer):
        for i in range(nqubit):
            cir.rx(i)
            cir.rz(i)
        cir.cnot_ring()
    cir.observable(list(range(nqubit)), basis='x' * nqubit)

    params = cir.params
    opt = optax.adam(0.05)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        val, grads = jax.value_and_grad(lambda q: cir.expectation(params=q)[0])(p)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, val

    for it in range(50):
        params, state, val = step(params, state)
    print(f'{len(jax.devices())} devices, final <X...X> = {float(val):.6f}')


if __name__ == '__main__':
    main()
