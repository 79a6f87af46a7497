"""Time-domain multiplexing."""

import numpy as np

import deepquantum_tpu as dq
from deepquantum_tpu.photonic.tdm import QumodeCircuitTDM


def test_tdm_single_loop_runs():
    cir = QumodeCircuitTDM(nmode=1, init_state='vac', cutoff=3)
    cir.s(0, r=0.5)
    cir.delay(0, ntau=1, inputs=[0.4])
    cir.homodyne_x(0)
    state = cir(nstep=4)
    samples = cir.get_samples(0)
    assert np.asarray(samples).shape[-1] == 4
    assert np.isfinite(np.asarray(samples)).all()
    cov = np.asarray(state[0])
    assert cov.shape[-1] == 4  # 2 * (1 spatial + 1 delay)


def test_tdm_vs_global_circuit_first_step():
    """The first TDM step equals the unrolled concurrent-mode circuit."""
    cir = QumodeCircuitTDM(nmode=1, init_state='vac', cutoff=3)
    cir.s(0, r=0.3)
    cir.delay(0, ntau=2, inputs=[0.7])
    cir.homodyne_x(0)
    cir._prepare_unroll_dict()
    cir._unroll_circuit()
    assert cir._nmode_tdm == 3
    # manual: unrolled circuit on 3 modes, squeeze the spatial mode (index 2), BS on [0, 2]
    from deepquantum_tpu.photonic import QumodeCircuit
    manual = QumodeCircuit(nmode=3, init_state='vac', cutoff=3, backend='gaussian')
    manual.s(2, r=0.3)
    manual.bs_theta([0, 2], inputs=[0.7])
    cov_m, mean_m = manual()
    from deepquantum_tpu.photonic.circuit import QumodeCircuit as QC
    base = QC.forward(cir)  # one step, no measurement
    np.testing.assert_allclose(np.asarray(base[0]).squeeze(), np.asarray(cov_m).squeeze(), atol=1e-6)


def test_gaussian_get_prob_single_state():
    import pytest
    torch = pytest.importorskip('torch')
    import deepquantum as ref_dq
    from deepquantum_tpu.photonic import QumodeCircuit
    ours = QumodeCircuit(nmode=2, init_state='vac', cutoff=3, backend='gaussian')
    theirs = ref_dq.QumodeCircuit(nmode=2, init_state='vac', cutoff=3, backend='gaussian')
    for c in (ours, theirs):
        c.s(0, r=0.5)
        c.bs([0, 1], inputs=[0.4, 0.2])
    ours()
    theirs.to(torch.double)
    theirs()
    p_o = float(np.asarray(ours.get_prob([1, 1])))
    p_t = float(theirs.get_prob(torch.tensor([1, 1])).detach())
    np.testing.assert_allclose(p_o, p_t, atol=1e-6)
