"""Density-matrix engine + Kraus channels vs the reference oracle."""

import numpy as np
import pytest

import deepquantum_tpu as dq


def test_den_mat_pure_gates_match_statevector():
    n = 3
    sv = dq.QubitCircuit(n)
    dm = dq.QubitCircuit(n, den_mat=True)
    for cir in (sv, dm):
        cir.h(0)
        cir.cnot(0, 1)
        cir.rx(2, inputs=0.7)
        cir.crz(1, 2, inputs=0.3)
    psi = np.asarray(sv()).reshape(-1, 1)
    rho = np.asarray(dm())
    np.testing.assert_allclose(rho, psi @ psi.conj().T, atol=1e-10)


def test_channels_vs_reference():
    torch = pytest.importorskip('torch')
    import deepquantum as ref_dq

    n = 2
    theta = 0.37

    def build(cir):
        cir.h(0)
        cir.cnot(0, 1)
        cir.bit_flip(0, inputs=theta)
        cir.phase_flip(1, inputs=0.5)
        cir.depolarizing(0, inputs=0.8)
        cir.amp_damp(1, inputs=0.6)
        cir.phase_damp(0, inputs=0.4)
        cir.gen_amp_damp(1, inputs=[0.3, 0.9])
        cir.pauli(0, inputs=[0.1, 0.2, 0.3, 0.4])
        cir.observable(0)

    ours = dq.QubitCircuit(n, den_mat=True)
    build(ours)
    theirs = ref_dq.QubitCircuit(n, den_mat=True)
    build(theirs)
    theirs.to(torch.complex128)

    rho_ours = np.asarray(ours())
    rho_theirs = theirs().detach().numpy()
    np.testing.assert_allclose(rho_ours, rho_theirs, atol=1e-6)

    np.testing.assert_allclose(np.asarray(ours.expectation()),
                               theirs.expectation().detach().numpy(), atol=1e-6)


def test_den_mat_measure():
    cir = dq.QubitCircuit(2, den_mat=True)
    cir.h(0)
    cir.cnot(0, 1)
    cir.bit_flip(0, inputs=np.pi / 2)  # prob = 1 -> flips qubit 0
    cir()
    res = cir.measure(shots=500)
    assert set(res.keys()) <= {'01', '10'}


def test_channel_trace_preserved():
    cir = dq.QubitCircuit(3, den_mat=True)
    cir.h(0)
    cir.cnot(0, 2)
    cir.depolarizing(1, inputs=0.3)
    cir.gen_amp_damp(2, inputs=[0.2, 0.4])
    rho = np.asarray(cir())
    np.testing.assert_allclose(np.trace(rho).real, 1.0, atol=1e-10)
