"""Bosonic backend: cat/GKP states vs reference (reference tests/test_photonic_bosonic.py style)."""

import numpy as np
import pytest

import deepquantum_tpu as dq
from deepquantum_tpu.photonic import QumodeCircuit
from deepquantum_tpu.photonic.state import CatState, GKPState, combine_bosonic_states

torch = pytest.importorskip('torch')
import deepquantum as ref_dq  # noqa: E402


def test_cat_state_vs_reference():
    ours = CatState(r=0.8, theta=0.3, p=1)
    theirs = ref_dq.CatState(r=0.8, theta=0.3, p=1)
    np.testing.assert_allclose(np.asarray(ours.mean).squeeze(), theirs.mean.numpy().squeeze(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours.weight).squeeze(), theirs.weight.numpy().squeeze(), atol=1e-6)


def test_gkp_state_vs_reference():
    ours = GKPState(theta=0.5, phi=0.7)
    theirs = ref_dq.GKPState(theta=0.5, phi=0.7)
    assert ours.ncomb == theirs.weight.shape[-1]
    np.testing.assert_allclose(np.sort(np.asarray(ours.weight).real.squeeze()),
                               np.sort(theirs.weight.numpy().real.squeeze()), atol=1e-5)


def test_bosonic_forward_vs_reference():
    def build(c):
        c.cat(0, r=0.7, theta=0.2, p=0)
        c.s(0, r=0.1)
        c.bs([0, 1], inputs=[0.5, 0.3])
    ours = QumodeCircuit(nmode=2, init_state='vac', cutoff=4, backend='bosonic')
    theirs = ref_dq.QumodeCircuit(nmode=2, init_state='vac', cutoff=4, backend='bosonic')
    build(ours)
    build(theirs)
    theirs.to(torch.double)
    cov_o, mean_o, w_o = ours()
    cov_t, mean_t, w_t = theirs()
    np.testing.assert_allclose(np.sort(np.asarray(w_o).real.reshape(-1)),
                               np.sort(w_t.detach().numpy().real.reshape(-1)), atol=1e-6)
    # covariance blocks: compare sums (component order may differ)
    cov_o = np.asarray(cov_o)
    cov_o_mean = cov_o.mean(axis=tuple(range(cov_o.ndim - 2)))
    cov_t_np = cov_t.detach().numpy()
    cov_t_mean = cov_t_np.mean(axis=tuple(range(cov_t_np.ndim - 2)))
    np.testing.assert_allclose(cov_o_mean, cov_t_mean, atol=1e-4)
    # means: compare as sorted multisets (component order may differ)
    m_o = np.sort_complex(np.asarray(mean_o).reshape(-1))
    m_t = np.sort_complex(mean_t.detach().numpy().reshape(-1))
    np.testing.assert_allclose(m_o, m_t, atol=1e-4)


def test_bosonic_homodyne_runs():
    cir = QumodeCircuit(nmode=1, init_state='vac', cutoff=4, backend='bosonic')
    cir.cat(0, r=1.0, theta=0.0, p=0)
    cir.homodyne_x(0)
    cir()
    samples = np.asarray(cir.measure_homodyne(shots=3))
    assert np.isfinite(samples).all()


def test_fock_state_bosonic_vs_reference():
    from deepquantum_tpu.photonic.state import FockStateBosonic
    ours = FockStateBosonic(2, r=0.05)
    theirs = ref_dq.FockStateBosonic(2, r=0.05)
    np.testing.assert_allclose(np.asarray(ours.weight).squeeze(),
                               theirs.weight.numpy().squeeze(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours.cov).squeeze(),
                               theirs.cov.numpy().squeeze(), atol=1e-6)


def test_pnrd_bosonic_measurement_runs():
    from deepquantum_tpu.photonic.measurement import PhotonNumberResolvingBosonic
    cir = QumodeCircuit(nmode=2, init_state='vac', cutoff=4, backend='bosonic')
    cir.cat(0, r=1.0, theta=0.0, p=0)
    cir.bs([0, 1], inputs=[0.5, 0.1])
    state = cir()
    m = PhotonNumberResolvingBosonic(n=1, nmode=2, wires=1)
    out = m(state)
    w = np.asarray(out[2])
    np.testing.assert_allclose(np.abs(w.sum(-1)), 1.0, atol=1e-5)
    assert np.isfinite(np.asarray(out[0])).all()
