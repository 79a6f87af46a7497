"""Time-domain multiplexing, pinned against the reference QumodeCircuitTDM.

The post-measurement covariance of a Gaussian homodyne is outcome-independent
(Schur-complement conditioning), so the multi-step covariance trajectory is a
deterministic oracle for the whole unroll + shift + feedback pipeline
(reference src/deepquantum/photonic/tdm.py:58-96).
"""

import numpy as np
import pytest

import deepquantum_tpu as dq
from deepquantum_tpu.photonic.tdm import QumodeCircuitTDM


def _ref_tdm(ntau, conv, r=0.8, inputs=(0.6, 0.3)):
    torch = pytest.importorskip('torch')
    import deepquantum as ref_dq
    cir = ref_dq.QumodeCircuitTDM(nmode=1, init_state='vac', cutoff=3)
    cir.s(0, r=r)
    cir.delay(0, ntau=ntau, inputs=list(inputs), convention=conv, encode=True)
    cir.homodyne_x(0)
    return cir


def _tpu_tdm(ntau, conv, r=0.8, inputs=(0.6, 0.3)):
    cir = QumodeCircuitTDM(nmode=1, init_state='vac', cutoff=3)
    cir.s(0, r=r)
    cir.delay(0, ntau=ntau, inputs=list(inputs), convention=conv, encode=True)
    cir.homodyne_x(0)
    return cir


def test_tdm_single_loop_runs():
    cir = QumodeCircuitTDM(nmode=1, init_state='vac', cutoff=3)
    cir.s(0, r=0.5)
    cir.delay(0, ntau=1, inputs=[0.4, 0.1])
    cir.homodyne_x(0)
    state = cir(nstep=4)
    samples = cir.get_samples(0)
    assert np.asarray(samples).shape[-1] == 4
    assert np.isfinite(np.asarray(samples)).all()
    cov = np.asarray(state[0])
    assert cov.shape[-1] == 4  # 2 * (1 spatial + 1 delay)


@pytest.mark.parametrize('conv', ['bs', 'mzi'])
@pytest.mark.parametrize('ntau', [1, 2])
def test_tdm_multistep_vs_reference(conv, ntau):
    """Multi-step covariance trajectory with per-step encoded data matches the
    reference TDM forward (delay unroll, BS/PS conventions, shift, feedback)."""
    torch = pytest.importorskip('torch')
    ref = _ref_tdm(ntau, conv)
    tpu = _tpu_tdm(ntau, conv)
    data = np.array([[[0.7, 0.2], [0.3, 1.1], [1.9, 0.5]]], np.float32)  # (1, 3, 2)
    sref = stpu = None
    for i in range(6):
        sref = ref(data=torch.tensor(data[:, i % 3:i % 3 + 1]), state=sref, nstep=1)
        stpu = tpu(data=data[:, i % 3:i % 3 + 1], state=stpu, nstep=1)
        a = sref[0].detach().numpy()
        b = np.asarray(stpu[0]).reshape(a.shape)
        np.testing.assert_allclose(b, a, atol=2e-6)


def test_tdm_batch_axis_in_samples():
    """Batched encoder data keeps the batch axis through measure_homodyne and
    the sample stack (reference tdm.py:93: samples are (batch, nwire, nstep),
    squeezed like torch)."""
    torch = pytest.importorskip('torch')
    ref = _ref_tdm(2, 'bs')
    tpu = _tpu_tdm(2, 'bs')
    data = np.random.RandomState(0).rand(2, 3, 2).astype(np.float32)
    ref(data=torch.tensor(data), nstep=5)
    tpu(data=data, nstep=5)
    assert tuple(np.asarray(tpu.samples).shape) == tuple(ref.samples.shape) == (2, 5)
    # covariances agree per batch element
    a = ref.state[0].detach().numpy()
    b = np.asarray(tpu.state[0]).reshape(a.shape)
    np.testing.assert_allclose(b, a, atol=2e-6)


def test_tdm_vs_global_circuit_first_step():
    """The first TDM step equals the unrolled concurrent-mode circuit
    (modulo the delay-line shift applied at the end of the TDM forward)."""
    cir = QumodeCircuitTDM(nmode=1, init_state='vac', cutoff=3)
    cir.s(0, r=0.3)
    cir.delay(0, ntau=2, inputs=[0.7, 0.2])
    cir.homodyne_x(0)
    cir._prepare_unroll_dict()
    cir._unroll_circuit()
    assert cir._nmode_tdm == 3
    # manual: 3 concurrent modes, squeeze spatial mode 2, DelayBS =
    # BS(theta, pi/2) on [delay0, spatial] then PS(phi) on delay0
    from deepquantum_tpu.photonic import QumodeCircuit
    manual = QumodeCircuit(nmode=3, init_state='vac', cutoff=3, backend='gaussian')
    manual.s(2, r=0.3)
    manual.bs([0, 2], inputs=[0.7, np.pi / 2])
    manual.ps(0, inputs=[0.2])
    cov_m, mean_m = manual()
    from deepquantum_tpu.photonic.circuit import QumodeCircuit as QC
    base = QC.forward(cir)  # one step; TDM forward shifts the delay lines
    cov_shift = np.asarray(base[0]).squeeze()
    # undo the shift to compare against the unshifted manual circuit
    cov_unshift, _ = cir._shift_state(cov_shift, np.asarray(base[1]).squeeze(-1)[..., None],
                                      reverse=True)
    np.testing.assert_allclose(np.asarray(cov_unshift).squeeze(),
                               np.asarray(cov_m).squeeze(), atol=1e-6)


def test_gaussian_get_prob_single_state():
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
