"""Homodyne/Generaldyne conditioning + photon loss vs the reference oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

import deepquantum_tpu as dq
from deepquantum_tpu.photonic import QumodeCircuit

torch = pytest.importorskip('torch')
import deepquantum as ref_dq  # noqa: E402


def test_homodyne_conditioning_vs_reference():
    """Conditioned cov + mean update match for a fixed measurement sample."""
    def build(c):
        c.s(0, r=0.5)
        c.s(1, r=0.3)
        c.bs([0, 1], inputs=[0.7, 0.2])
        c.homodyne(0, phi=0.0)
    ours = QumodeCircuit(nmode=2, init_state='vac', cutoff=4, backend='gaussian')
    theirs = ref_dq.QumodeCircuit(nmode=2, init_state='vac', cutoff=4, backend='gaussian')
    build(ours)
    build(theirs)
    theirs.to(torch.double)
    ours()
    theirs()
    sample = [0.37, 0.0]
    from deepquantum_tpu.photonic.measurement import Homodyne
    m_ours = ours.measurements[0]
    state_o = m_ours([jnp.asarray(ours.state[0]), jnp.asarray(ours.state[1])], samples=sample)
    m_theirs = theirs.measurements[0]
    m_theirs.to(torch.double)
    state_t = m_theirs([theirs.state[0], theirs.state[1]], samples=torch.tensor(sample, dtype=torch.double))
    np.testing.assert_allclose(np.asarray(state_o[0]).squeeze(), state_t[0].numpy().squeeze(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(state_o[1]).squeeze(), state_t[1].numpy().squeeze(), atol=1e-4)


def test_photon_loss_gaussian_vs_reference():
    def build(c):
        c.s(0, r=0.6)
        c.bs([0, 1], inputs=[0.4, 0.1])
        c.loss_t(0, inputs=0.7)
        c.loss_db(1, inputs=1.5)
    ours = QumodeCircuit(nmode=2, init_state='vac', cutoff=4, backend='gaussian')
    theirs = ref_dq.QumodeCircuit(nmode=2, init_state='vac', cutoff=4, backend='gaussian')
    build(ours)
    build(theirs)
    theirs.to(torch.double)
    cov_o, mean_o = ours()
    cov_t, mean_t = theirs()
    np.testing.assert_allclose(np.asarray(cov_o).squeeze(), cov_t.detach().numpy().squeeze(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mean_o).squeeze(), mean_t.detach().numpy().squeeze(), atol=1e-5)


def test_photon_loss_fock_den_mat_trace():
    cir = QumodeCircuit(nmode=2, init_state=[1, 0], cutoff=3, backend='fock',
                        basis=False, den_mat=True)
    cir.bs([0, 1], inputs=[0.5, 0.1])
    cir.loss_t(0, inputs=0.5)
    rho = np.asarray(cir())
    tr = np.trace(rho.reshape(9, 9))
    np.testing.assert_allclose(tr.real, 1.0, atol=1e-6)
    # photon number decreased by loss
    probs = np.abs(np.diag(rho.reshape(9, 9)))
    n_op = np.array([sum(divmod(i, 3)) for i in range(9)])
    mean_n = (probs * n_op).sum()
    assert mean_n < 1.0


def test_measure_homodyne_ideal_stats():
    cir = QumodeCircuit(nmode=1, init_state='vac', cutoff=4, backend='gaussian')
    cir.s(0, r=0.5)
    cir()
    samples = np.asarray(cir.measure_homodyne(shots=2000, wires=0))
    # squeezed vacuum: x variance = e^{-2r} * hbar/(4 kappa^2) * ... -> check var < vacuum var
    xs = samples[..., 0] if samples.ndim > 1 else samples
    var = xs.var()
    from deepquantum_tpu import config
    vac_var = config.HBAR / (4 * config.KAPPA ** 2)
    assert var < vac_var  # squeezed below vacuum


def test_conditional_homodyne_runs():
    cir = QumodeCircuit(nmode=2, init_state='vac', cutoff=4, backend='gaussian')
    cir.s(0, r=0.4)
    cir.bs([0, 1], inputs=[0.6, 0.3])
    cir.homodyne(0, phi=0.0)
    cir()
    samples = np.asarray(cir.measure_homodyne(shots=5))
    assert samples.shape == (5,)
    assert np.isfinite(samples).all()
