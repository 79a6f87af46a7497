"""30-qubit-scale VQE over a sharded statevector, with resumable checkpoints.

Run with N virtual devices for a dry run:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/distributed_vqe.py
On a TPU pod slice the same code shards over real chips via ICI; the orbax
checkpoint keeps every array's sharding, so a run resumes distributed
(BASELINE.md north star: resumable 30-qubit sharded VQE training).
"""

import os
import shutil
import sys
import tempfile
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import jax
import jax.numpy as jnp
import optax

import deepquantum_tpu as dq
from deepquantum_tpu.parallel import DistributedQubitCircuit, make_mesh
from deepquantum_tpu.utils import load_train_state, save_train_state


def build(nqubit: int, nlayer: int, mesh) -> DistributedQubitCircuit:
    cir = DistributedQubitCircuit(nqubit, mesh=mesh)
    for _ in range(nlayer):
        for i in range(nqubit):
            cir.rx(i)
            cir.rz(i)
        cir.cnot_ring()
    cir.observable(list(range(nqubit)), basis='x' * nqubit)
    return cir


def main(nqubit: int = 12, nlayer: int = 2, steps: int = 50, ckpt_every: int = 20):
    mesh = make_mesh()
    cir = build(nqubit, nlayer, mesh)

    opt = optax.adam(0.05)
    train_state = dict(params=cir.params, opt=opt.init(cir.params),
                       step=jnp.zeros((), jnp.int32))
    ckpt_dir = os.path.join(tempfile.mkdtemp(prefix='dq_vqe_'), 'ckpt')

    @jax.jit
    def step(ts):
        val, grads = jax.value_and_grad(lambda q: cir.expectation(params=q)[0])(ts['params'])
        updates, opt_state = opt.update(grads, ts['opt'])
        return dict(params=optax.apply_updates(ts['params'], updates),
                    opt=opt_state, step=ts['step'] + 1), val

    for it in range(steps):
        train_state, val = step(train_state)
        if (it + 1) % ckpt_every == 0:
            save_train_state(ckpt_dir, train_state)

    # ---- simulate a restart: rebuild from the checkpoint and keep training
    restored = load_train_state(ckpt_dir, train_state)
    for it in range(5):
        restored, val = step(restored)
    print(f'{len(jax.devices())} devices, resumed at step {int(restored["step"]) - 5}, '
          f'final <X...X> = {float(val):.6f}')
    shutil.rmtree(os.path.dirname(ckpt_dir), ignore_errors=True)


if __name__ == '__main__':
    main()
