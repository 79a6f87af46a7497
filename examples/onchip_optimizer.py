"""Gradient-free on-chip optimization of a photonic interferometer
(counterpart of reference examples/test_for_onchip_optimizer.py).

A physical photonic chip gives no gradients — only measured probabilities.
SPSA and Fourier-series optimizers (optimizer.py) tune the phase shifters
of an MZI mesh to route a single photon into a target output mode, using
only forward evaluations of the circuit.
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

import deepquantum_tpu as dq
from deepquantum_tpu.optimizer import OptimizerFourier, OptimizerSPSA

NMODE = 4
TARGET = 2            # route the photon |1,0,0,0> -> mode 2


def build(phases):
    cir = dq.photonic.QumodeCircuit(nmode=NMODE, init_state=[1, 0, 0, 0],
                                    cutoff=2, backend='fock', basis=True)
    k = 0
    for i in range(NMODE - 1):          # one triangular MZI layer
        for j in range(NMODE - 1 - i):
            cir.mzi([j, j + 1], inputs=[phases[k], phases[k + 1]])
            k += 2
    return cir


NPARAM = (NMODE - 1) * NMODE  # 2 phases per MZI


def neg_target_prob(phases):
    phases = np.asarray(phases, dtype=float).reshape(-1)
    cir = build(phases)
    cir()
    amp = cir.get_amplitude([0] * TARGET + [1] + [0] * (NMODE - 1 - TARGET))
    return -float(np.abs(np.asarray(amp)) ** 2)


x0 = np.full(NPARAM, 0.3)
print(f'initial target-mode probability: {-neg_target_prob(x0):.4f}')

spsa = OptimizerSPSA(neg_target_prob, x0, random_state=0)
# default hyperparameters are tuned for ~2000-step budgets; shorten the
# decay schedule for this small demo
spsa.set_hyperparam({'a': 0.5, 'c': 0.05, 'A': 20, 'nepoch': 300,
                     'alpha': 0.602, 'gamma': 0.101})

results = {}
for name, opt, nstep in [
    ('SPSA', spsa, 300),
    ('Fourier', OptimizerFourier(neg_target_prob, x0, order=3, lr=0.3), 6),
]:
    best_params = opt.run(nstep, if_print=False)
    best = -neg_target_prob(np.asarray(best_params))
    results[name] = best
    print(f'{name}: target-mode probability after {nstep} steps = {best:.4f}')

assert max(results.values()) > 0.9, results
print('PASS')
