"""Map qubit gates onto linear-optical unitaries (counterpart of reference
examples/unitary_mapper.py).

UnitaryMapper solves  <out_i| U_optical |in_j> = success * U_gate[i, j]
over dual-rail encoded basis states: a Hadamard on 2 modes (success 1,
deterministic — it is just a beamsplitter), and the canonical post-selected
CNOT on 6 modes with 2 ancilla vacuum modes at success 1/3 (KLM-style).
Solutions are verified by rebuilding the transfer matrix from permanents
and are disk-cached for repeat solves.
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from deepquantum_tpu.photonic.mapper import UnitaryMapper

# 1. Hadamard on a dual-rail qubit = 50:50 beamsplitter
h = np.array([[1, 1], [1, -1]]) / np.sqrt(2)
mapper = UnitaryMapper(nqubit=1, nmode=2, ugate=h, success=1.0)
sols = mapper.solve_eqs_real(total_trials=5)
assert sols, 'no Hadamard solution found'
u = sols[0]
assert mapper.is_unitary(u)
np.testing.assert_allclose(np.abs(mapper.get_transfer_mat(u)), np.abs(h),
                           atol=1e-5)
print('Hadamard -> 2-mode optical unitary:')
print(np.round(u, 4))

# 2. Post-selected CNOT: 6 modes (4 dual-rail + 2 ancilla), success 1/3
cnot = np.eye(4)[[0, 1, 3, 2]]
mapper = UnitaryMapper(nqubit=2, nmode=6, ugate=cnot, success=1 / 3,
                       aux=[0, 0], aux_pos=[4, 5])
sols = mapper.solve_eqs_real(total_trials=5)
assert sols, 'no CNOT solution found'
u = sols[0]
assert mapper.is_unitary(u)
transfer = mapper.get_transfer_mat(u)
np.testing.assert_allclose(np.abs(transfer), np.abs(cnot) / 3, atol=1e-4)
print('\npost-selected CNOT transfer matrix (success 1/3):')
print(np.round(np.real_if_close(transfer), 4))
print('PASS')
