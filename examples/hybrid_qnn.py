"""Hybrid classical-quantum classifier (counterpart of reference
examples/qresnets.py).

A linear layer feeds a data re-uploading quantum circuit; the Pauli-Z
expectation is the logit. The whole model (classical weights + circuit
parameters) trains end-to-end with one jax.value_and_grad through a batched
circuit forward — batches ride the planar kernel as a grid axis on TPU.
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import deepquantum_tpu as dq

N = 4          # qubits
LAYERS = 2     # re-uploading blocks
B = 64         # batch

rng = np.random.default_rng(0)

# two concentric rings (not linearly separable)
r = np.where(rng.random(2 * B) < 0.5, 0.5, 1.5) + rng.normal(0, 0.1, 2 * B)
phi = rng.random(2 * B) * 2 * np.pi
X = np.stack([r * np.cos(phi), r * np.sin(phi)], axis=1).astype(np.float32)
y = (r > 1.0).astype(np.float32)
X_train, y_train, X_test, y_test = X[:B], y[:B], X[B:], y[B:]

# circuit: LAYERS x (encode RY per qubit -> trainable RZ/RY -> CNOT ring)
cir = dq.QubitCircuit(N)
for _ in range(LAYERS):
    for i in range(N):
        cir.ry(i, encode=True)
    for i in range(N):
        cir.rz(i)
        cir.ry(i)
    cir.cnot_ring()
cir.observable(0, basis='z')

W = jnp.asarray(rng.normal(0, 0.5, (2, N * LAYERS)).astype(np.float32))
bias = jnp.zeros(N * LAYERS, jnp.float32)
params = {'w': W, 'b': bias, 'q': cir.params}


def logits(p, x):
    feats = x @ p['w'] + p['b']            # (B, N*LAYERS) encode angles
    return cir.expectation(data=feats, params=p['q'])[..., 0]


def loss_fn(p, x, t):
    z = logits(p, x)
    return jnp.mean(optax.sigmoid_binary_cross_entropy(2.0 * z, t))


opt = optax.adam(0.05)
opt_state = opt.init(params)


@jax.jit
def step(p, s, x, t):
    val, g = jax.value_and_grad(loss_fn)(p, x, t)
    updates, s = opt.update(g, s)
    return optax.apply_updates(p, updates), s, val


xb = jnp.asarray(X_train)
tb = jnp.asarray(y_train)
for epoch in range(60):
    params, opt_state, val = step(params, opt_state, xb, tb)
    if epoch % 15 == 0:
        print(f'epoch {epoch}: loss = {float(val):.4f}')

pred = np.asarray(logits(params, jnp.asarray(X_test))) > 0
acc = float(np.mean(pred == (y_test > 0.5)))
print(f'test accuracy = {acc:.3f}')
assert acc > 0.85, acc
print('PASS')
