"""Algorithm circuits: functional assertions + reference oracle (reference tests/test_ansatz.py style)."""

import numpy as np
import pytest

import jax.numpy as jnp

import deepquantum_tpu as dq
from deepquantum_tpu.models import (
    HHL,
    QuantumConvolutionalNeuralNetwork,
    QuantumFourierTransform,
    QuantumPhaseEstimation,
    QuantumPhaseEstimationSingleQubit,
    RandomCircuitG3,
    ShorCircuitFor15,
)


def test_qft_unitary():
    n = 3
    qft = QuantumFourierTransform(nqubit=n)
    u = np.asarray(qft.get_unitary())
    dim = 2 ** n
    omega = np.exp(2j * np.pi / dim)
    expected = np.array([[omega ** (j * k) for k in range(dim)] for j in range(dim)]) / np.sqrt(dim)
    np.testing.assert_allclose(u, expected, atol=1e-8)


def test_qpe_single_qubit():
    t = 4
    phase = 1 / 8
    qpe = QuantumPhaseEstimationSingleQubit(t=t, phase=phase)
    qpe()
    res = qpe.measure(shots=512, wires=list(range(t)))
    top = max(res, key=res.get)
    estimated = int(top, 2) / 2 ** t
    assert abs(estimated - phase) < 1 / 2 ** t


def test_qpe_arbitrary_unitary():
    ncount = 4
    phase = 3 / 16
    u = np.diag([1, np.exp(2j * np.pi * phase)])
    qpe = QuantumPhaseEstimation(nqubit=ncount + 1, ncount=ncount, unitary=u)
    # eigenvector |1> on the target register
    init = np.zeros(2 ** (ncount + 1), dtype=complex)
    init[1] = 1
    qpe(state=init)
    res = qpe.measure(shots=512, wires=list(range(ncount)))
    top = max(res, key=res.get)
    assert int(top, 2) / 2 ** ncount == phase


def test_shor_15():
    ncount = 8
    cir = ShorCircuitFor15(ncount=ncount, a=7)
    cir()
    res = cir.measure(shots=256, wires=list(range(ncount)))
    # phases should cluster at multiples of 1/4 (order r=4)
    top_phases = sorted(res, key=res.get, reverse=True)[:4]
    phases = {int(b, 2) / 2 ** ncount for b in top_phases}
    assert phases <= {0.0, 0.25, 0.5, 0.75}


def test_hhl_solves_linear_system():
    a_mat = np.array([[1.0, -1 / 3], [-1 / 3, 1.0]])
    b_vec = np.array([0.0, 1.0])
    hhl = HHL(ncount=3, mat=a_mat, t0=3 / 4)
    init = np.zeros(2 ** hhl.nqubit, dtype=complex)
    init[int('0' * (hhl.nqubit - 1) + '0', 2)] = b_vec[0]
    init[1] = b_vec[1]
    state = np.asarray(hhl(state=init)).reshape(-1)
    # post-select ancilla (qubit 0) == 1: amplitudes at indices 1xxxx
    dim = 2 ** hhl.nqubit
    sol = state[dim // 2:][:2]  # counting register |000>, target register
    x_expected = np.linalg.solve(a_mat, b_vec)
    x_expected = x_expected / np.linalg.norm(x_expected)
    sol = sol / np.linalg.norm(sol)
    phase = sol[np.argmax(np.abs(sol))] / x_expected[np.argmax(np.abs(sol))]
    np.testing.assert_allclose(np.abs(sol), np.abs(x_expected), atol=0.05)


def test_qcnn_runs_and_shares_params():
    cir = QuantumConvolutionalNeuralNetwork(nqubit=4, nlayer=1)
    cir.observable(0)
    cir()
    ev = cir.expectation()
    assert np.isfinite(np.asarray(ev)).all()


def test_shor_full_arithmetic_order_finding():
    """The uncompiled ShorCircuit (Beauregard arithmetic: PhiAdder ->
    PhiModularAdder -> ControlledMultiplier -> ControlledUa) finds the
    order r=2 of a=2 mod 3: counting-register phases at multiples of 1/2."""
    from deepquantum_tpu.models.ansatz import ShorCircuit
    cir = ShorCircuit(mod=3, ncount=3, a=2)
    cir()
    res = cir.measure(shots=512, wires=list(range(3)))
    top = sorted(res, key=res.get, reverse=True)[:2]
    phases = {int(b, 2) / 8 for b in top}
    assert phases <= {0.0, 0.5}, phases


def test_random_g3_vs_statevector_norm():
    cir = RandomCircuitG3(nqubit=4, ngate=30)
    state = np.asarray(cir()).reshape(-1)
    np.testing.assert_allclose(np.linalg.norm(state), 1.0, atol=1e-8)


def test_qft_vs_reference():
    torch = pytest.importorskip('torch')
    import deepquantum as ref_dq
    n = 4
    ours = QuantumFourierTransform(nqubit=n)
    theirs = ref_dq.QuantumFourierTransform(nqubit=n)
    theirs.to(torch.complex128)
    np.testing.assert_allclose(np.asarray(ours.get_unitary()),
                               theirs.get_unitary().detach().numpy(), atol=1e-6)


def test_layered_scan_ansatz_matches_ir():
    """Scan-compiled layered VQE equals the unrolled IR engine."""
    from deepquantum_tpu.models.layered import make_layered_vqe
    np.random.seed(3)
    n, layers = 5, 3
    fn, params = make_layered_vqe(n, layers)
    e_scan = float(fn(params))
    cir = dq.QubitCircuit(n)
    p = np.asarray(params).reshape(layers, n, 3)
    for l in range(layers):
        for i in range(n):
            cir.rx(i, inputs=float(p[l, i, 0]))
            cir.rz(i, inputs=float(p[l, i, 1]))
            cir.rx(i, inputs=float(p[l, i, 2]))
        cir.cnot_ring()
    cir.observable(list(range(n)), basis='x' * n)
    e_ir = float(cir.expectation()[0])
    np.testing.assert_allclose(e_scan, e_ir, atol=1e-8)
    # gradients flow through scan + remat
    import jax
    g = jax.grad(fn)(params)
    assert np.isfinite(np.asarray(g)).all()
