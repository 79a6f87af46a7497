"""Basic gates in the measurement-based model (counterpart of reference
examples/basic_gate_MBQC.py).

Three views of the same computation:
1. a Hadamard as a hand-written 2-node N/E/M/X teleportation pattern,
2. an RZ(theta) teleportation pattern (measurement angle = -theta),
3. a small circuit (H + CNOT + rotations) transpiled to a pattern with
   QubitCircuit.pattern() and checked against direct statevector simulation.
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import deepquantum_tpu as dq
from deepquantum_tpu.mbqc import Pattern


def overlap(a, b):
    a = np.asarray(a).reshape(-1)
    b = np.asarray(b).reshape(-1)
    return abs(np.vdot(a, b)) / (np.linalg.norm(a) * np.linalg.norm(b))


# 1. Hadamard: measure the input node in the X basis, teleport to node 1
pattern = Pattern(nodes_state=[0], state='zero')
pattern.n(1)
pattern.e(0, 1)
pattern.m(0, angle=0.0)
pattern.x(1, domain=0)
state = np.asarray(pattern().full_state).reshape(-1)
assert overlap(state, np.array([1, 1]) / np.sqrt(2)) > 1 - 1e-6
print('H |0> -> |+> via 2-node teleportation: OK')

# 2. RZ(theta) |+>: measurement angle -theta, then the H from teleportation
theta = 0.7
pattern = Pattern(nodes_state=[0], state='plus')
pattern.n(1)
pattern.e(0, 1)
pattern.m(0, angle=-theta)
pattern.x(1, domain=0)
state = np.asarray(pattern().full_state).reshape(-1)
# J(theta) = H RZ(theta); on |+>: H (|0> + e^{i theta} |1>)/sqrt(2)
expected = np.array([1 + np.exp(1j * theta), 1 - np.exp(1j * theta)]) / 2
assert overlap(state, expected) > 1 - 1e-6
print(f'J({theta}) teleportation pattern: OK')

# 3. Transpile a circuit to a pattern and compare with the statevector
cir = dq.QubitCircuit(2)
cir.h(0)
cir.rx(1, inputs=0.3)
cir.cnot(0, 1)
cir.rz(0, inputs=1.1)
target = np.asarray(cir()).reshape(-1)

pat = cir.pattern()
pat.standardize()
pat.shift_signals()
state = np.asarray(pat().full_state).reshape(-1)
fid = overlap(state, target)
print(f'transpiled pattern vs statevector overlap = {fid:.8f}')
assert fid > 1 - 1e-6
print('PASS')
