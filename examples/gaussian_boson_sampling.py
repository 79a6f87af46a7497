"""Gaussian boson sampling with hafnian-based detector probabilities
(counterpart of reference examples GBS notebooks)."""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import numpy as np
from scipy.stats import unitary_group

from deepquantum_tpu.photonic.ansatz import GaussianBosonSampling


def main():
    nmode = 4
    squeezing = [0.5, 0.4, 0.3, 0.2]
    unitary = unitary_group.rvs(nmode, random_state=0)
    gbs = GaussianBosonSampling(nmode=nmode, squeezing=squeezing, unitary=unitary,
                                cutoff=3, backend='gaussian')
    probs = gbs(is_prob=True)
    print('top outcomes:')
    for fs, p in list(probs.items())[:6]:
        print(f'  {fs}: {float(np.asarray(p)):.5f}')
    samples = gbs.measure(shots=1000)
    print('samples:', {str(k): v for k, v in list(samples.items())[:6]})
    exp, var = gbs.photon_number_mean_var()
    print('photon number mean:', np.asarray(exp).round(4))

    # threshold (click) detectors: torontonian probabilities over all 2^n
    # click patterns — on TPU at complex64 these run in df32 double-single
    # arithmetic (the inclusion-exclusion sum cancels by ~1e4-1e7x and
    # plain c64 returns garbage)
    probs_click = gbs(is_prob=True, detector='threshold')
    total = sum(float(np.asarray(p)) for p in probs_click.values())
    print('threshold click-pattern probabilities (top 4):')
    for fs, p in list(probs_click.items())[:4]:
        print(f'  {fs}: {float(np.asarray(p)):.5f}')
    print(f'sum over all click patterns = {total:.6f}')
    assert abs(total - 1) < 1e-4, total
    print('PASS')


if __name__ == '__main__':
    main()
