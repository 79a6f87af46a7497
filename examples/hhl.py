"""HHL linear-system solver (counterpart of reference examples/hhl.py).

Solves A x = b for a Hermitian 2x2 system with the HHL ansatz
(models/ansatz.py: QPE -> controlled eigenvalue-inversion rotations ->
inverse QPE) and compares the post-selected solution direction against
numpy.linalg.solve.
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import deepquantum_tpu as dq

# Hermitian system matrix and right-hand side. t0 is chosen so the QPE
# counting register resolves the eigenvalues (4/3, 2/3) exactly:
# lambda * t0 * 2^ncount / 2^ncount must land on register integers.
A = np.array([[1.0, -1 / 3], [-1 / 3, 1.0]])
b = np.array([0.0, 1.0])

NCOUNT = 3                       # QPE counting register width

cir = dq.HHL(ncount=NCOUNT, mat=A, t0=3 / 4)

# |b> goes into the target register (last qubit); ancilla + counting in |0>
init = np.zeros(2 ** cir.nqubit, dtype=np.complex64)
init[0] = b[0]
init[1] = b[1]

state = np.asarray(cir(state=init)).reshape(-1)

# Post-select ancilla = |1> and counting register = |0...0>:
# amplitudes of |1, 0...0, x> live at indices 2^(ncount+1) + {0, 1}
base = 1 << (NCOUNT + 1)
x_q = state[base:base + 2]
p_q = np.abs(x_q) ** 2
p_q = p_q / p_q.sum()

x_ref = np.linalg.solve(A, b)
p_ref = x_ref ** 2 / np.sum(x_ref ** 2)

# the reference example compares measurement DISTRIBUTIONS (the eigenvalue-
# inversion rotation leaves phase garbage on the counting register) —
# classical (Bhattacharyya) fidelity between |x_q|^2 and x_ref^2:
fidelity = float(np.sum(np.sqrt(p_q * p_ref)) ** 2)
print(f'HHL |solution|^2 (normalized): {p_q}')
print(f'Classical solution probs     : {p_ref}')
print(f'distribution fidelity = {fidelity:.6f}')
assert fidelity > 0.995, fidelity
print('PASS')
