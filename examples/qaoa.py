"""QAOA for MaxCut (counterpart of reference examples/qaoa.py)."""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import jax
import jax.numpy as jnp
import networkx as nx
import optax

import deepquantum_tpu as dq

N = 6
P_LAYERS = 3
graph = nx.random_regular_graph(3, N, seed=7)
edges = list(graph.edges)

cir = dq.QubitCircuit(N)
cir.hlayer()
for _ in range(P_LAYERS):
    for (a, b) in edges:
        cir.rzz([a, b], encode=False)
    for i in range(N):
        cir.rx(i)
for (a, b) in edges:
    cir.observable([[a], [b]], basis='zz')


def cost(params):
    # MaxCut objective: maximize sum (1 - <Z_a Z_b>)/2  -> minimize sum <ZZ>
    return cir.expectation(params=params).sum()


def main():
    params = cir.params
    opt = optax.adam(0.1)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        val, grads = jax.value_and_grad(cost)(p)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, val

    for it in range(150):
        params, state, val = step(params, state)
    cut = (len(edges) - float(val)) / 2
    print(f'approx MaxCut value: {cut:.3f} / {len(edges)} edges')
    cir.forward(params=params)
    print('top bitstrings:', dict(sorted(cir.measure(shots=500).items(),
                                         key=lambda kv: -kv[1])[:4]))


if __name__ == '__main__':
    main()
