"""Perfect quantum state transfer on a 1D spin chain (counterpart of
reference examples/quantum_state_transfer_1d.py).

An XY chain with engineered couplings J_i = sqrt(i (N - i)) transfers the
first qubit's state to the last qubit perfectly at t = pi/2. The evolution
exp(-i H t) with H = sum_i J_i (XX + YY)/2 is trotterized with RXX/RYY
gates; transfer fidelity is checked against the input state.
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import deepquantum_tpu as dq

N = 5
STEPS = 200                       # trotter steps
T = np.pi / 2

J = [np.sqrt((i + 1) * (N - 1 - i)) for i in range(N - 1)]

# arbitrary input state on qubit 0
alpha, beta = 0.6, 0.8j
psi_in = np.array([alpha, beta], dtype=np.complex128)

cir = dq.QubitCircuit(N)
dt = T / STEPS
for _ in range(STEPS):
    for i in range(N - 1):
        # exp(-i J dt (XX + YY)/2): rxx/ryy convention exp(-i theta XX / 2)
        cir.rxx([i, i + 1], inputs=J[i] * dt)
        cir.ryy([i, i + 1], inputs=J[i] * dt)

init = np.zeros(2 ** N, dtype=np.complex128)
init[0] = alpha                       # |0 0...0>
init[1 << (N - 1)] = beta             # |1 0...0> (qubit 0 = leftmost)
state = np.asarray(cir(state=init)).reshape(-1)

# target: qubit N-1 carries the state, others |0>
a_out = state[0]                      # |0...0 0>
b_out = state[1]                      # |0...0 1>
leak = 1.0 - (abs(a_out) ** 2 + abs(b_out) ** 2)
out = np.array([a_out, b_out])
# transfer phases are known (i^{N-1} on the excitation); compare up to phase
fid = abs(np.vdot(psi_in / np.linalg.norm(psi_in), out / np.linalg.norm(out)))
print(f'couplings J = {np.round(J, 3)}')
print(f'population outside the target qubit: {leak:.2e}')
print(f'transfer fidelity (up to phase)    : {fid:.6f}')
assert leak < 1e-3 and fid > 0.999, (leak, fid)
print('PASS')
