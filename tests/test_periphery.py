"""QASM interop + gradient-free optimizers."""

import numpy as np

import jax.numpy as jnp

import deepquantum_tpu as dq
from deepquantum_tpu.optimizer import OptimizerFourier, OptimizerSPSA
from deepquantum_tpu.qasm import cir_to_qasm2, cir_to_qasm3, qasm3_to_cir


def _build(cir):
    cir.h(0)
    cir.rx(1, inputs=0.3)
    cir.u3(2, inputs=[0.1, 0.2, 0.3])
    cir.cnot(0, 1)
    cir.cp(1, 2, inputs=0.5)
    cir.crz(0, 2, inputs=0.7)
    cir.rzz([0, 1], inputs=0.4)
    cir.toffoli(0, 1, 2)
    cir.swap([1, 2])


def test_qasm3_roundtrip():
    cir = dq.QubitCircuit(3)
    _build(cir)
    qasm = cir.qasm3()
    assert 'OPENQASM 3.0' in qasm
    cir2 = qasm3_to_cir(qasm)
    u1 = np.asarray(cir.get_unitary())
    u2 = np.asarray(cir2.get_unitary())
    np.testing.assert_allclose(u1, u2, atol=1e-8)


def test_qasm3_roundtrip_fuzz():
    """Randomized circuits over the whole exportable gate pool survive
    export -> import with identical unitaries (robustness sweep beyond the
    fixed-circuit roundtrips)."""
    rng = np.random.default_rng(17)
    n = 4
    one_q = ['h', 'x', 'y', 'z', 's', 't', 'sdg', 'tdg']
    rot_1q = ['rx', 'ry', 'rz', 'p']
    two_q = ['cnot', 'cz', 'cy', 'ch', 'swap']
    rot_2q = ['rxx', 'ryy', 'rzz']
    for trial in range(4):
        cir = dq.QubitCircuit(n)
        for _ in range(12):
            kind = rng.integers(0, 6)
            if kind == 0:
                getattr(cir, str(rng.choice(one_q)))(int(rng.integers(n)))
            elif kind == 1:
                getattr(cir, str(rng.choice(rot_1q)))(
                    int(rng.integers(n)), inputs=float(rng.random() * 2 * np.pi))
            elif kind == 2:
                a, b = rng.choice(n, 2, replace=False)
                g = str(rng.choice(two_q))
                if g == 'swap':
                    cir.swap([int(a), int(b)])
                else:
                    getattr(cir, g)(int(a), int(b))
            elif kind == 3:
                a, b = rng.choice(n, 2, replace=False)
                getattr(cir, str(rng.choice(rot_2q)))(
                    [int(a), int(b)], inputs=float(rng.random()))
            elif kind == 4:
                a, b, c = rng.choice(n, 3, replace=False)
                cir.toffoli(int(a), int(b), int(c))
            else:
                cir.u3(int(rng.integers(n)),
                       inputs=list(rng.random(3) * np.pi))
        qasm = cir.qasm3()
        cir2 = qasm3_to_cir(qasm)
        np.testing.assert_allclose(np.asarray(cir.get_unitary()),
                                   np.asarray(cir2.get_unitary()),
                                   atol=1e-8, err_msg=f'trial {trial}')


def test_qasm2_export():
    cir = dq.QubitCircuit(2)
    cir.h(0)
    cir.cnot(0, 1)
    cir.rx(1, inputs=0.5)
    q = cir.qasm()
    assert q.startswith('OPENQASM 2.0;')
    assert 'h q[0];' in q
    assert 'cx q[0],q[1];' in q
    assert 'rx(0.5) q[1];' in q


def test_qasm2_matches_reference():
    import pytest
    torch = pytest.importorskip('torch')
    import deepquantum as ref_dq
    ours = dq.QubitCircuit(3)
    theirs = ref_dq.QubitCircuit(3)
    for c in (ours, theirs):
        c.h(0)
        c.cnot(0, 1)
        c.rx(2, inputs=0.25)
        c.crz(0, 2, inputs=0.125)
    assert ours.qasm() == theirs.qasm()


def test_spsa_optimizer_converges():
    cir = dq.QubitCircuit(1)
    cir.rx(0)
    cir.observable(0)

    def target(params):
        return float(cir.expectation(params=np.asarray(params))[0])

    opt = OptimizerSPSA(target, [2.0], random_state=0)
    best = opt.run(400)
    assert target(best) < -0.9


def test_fourier_optimizer_converges():
    cir = dq.QubitCircuit(1)
    cir.ry(0)
    cir.observable(0)

    def target(params):
        return float(cir.expectation(params=np.asarray(params))[0])

    opt = OptimizerFourier(target, [1.0], order=2, lr=0.2)
    opt.run(30)
    # the descent iterate converges to theta = pi (run() returns the best
    # probe-grid point, reference semantics)
    final = list(opt.param_dict.values())
    assert target(final) < -0.95


def test_draw_text():
    cir = dq.QubitCircuit(3)
    cir.h(0)
    cir.cnot(0, 2)
    cir.rx(1, inputs=0.3)
    text = cir.draw()
    assert 'q0' in text and 'H' in text and 'CX' in text


def test_photonic_draw_svg(tmp_path):
    from deepquantum_tpu.photonic import QumodeCircuit
    cir = QumodeCircuit(nmode=3, init_state='vac', cutoff=3, backend='gaussian')
    cir.s(0, r=0.4)
    cir.bs([0, 1], inputs=[0.5, 0.1])
    cir.homodyne_x(2)
    svg = cir.draw(filename=str(tmp_path / 'c.svg'))
    assert svg.startswith('<svg') and (tmp_path / 'c.svg').exists()


def test_unitary_mapper_single_qubit():
    from deepquantum_tpu.photonic.mapper import UnitaryMapper
    h = np.array([[1, 1], [1, -1]]) / np.sqrt(2)
    mapper = UnitaryMapper(nqubit=1, nmode=2, ugate=h, success=1.0)
    sols = mapper.solve_eqs_real(total_trials=5)
    assert sols, 'no solution found'
    u = sols[0]
    assert mapper.is_unitary(u)
    np.testing.assert_allclose(np.abs(mapper.get_transfer_mat(u)), np.abs(h), atol=1e-5)


def test_save_load_params(tmp_path):
    from deepquantum_tpu.utils import save_params, load_params
    cir = dq.QubitCircuit(2)
    cir.rx(0)
    cir.ry(1)
    cir.observable(0)
    e1 = float(cir.expectation()[0])
    fn = str(tmp_path / 'p.npz')
    save_params(cir, fn)
    cir.params = np.zeros(2)
    load_params(cir, fn)
    e2 = float(cir.expectation()[0])
    np.testing.assert_allclose(e1, e2, atol=1e-12)


def test_qasm3_gate_definitions():
    """Custom gate definitions with params, nesting, and modifiers
    (reference qasm3.py:159-472)."""
    qasm = '''
    OPENQASM 3.0;
    include "stdgates.inc";
    qubit[3] q;
    gate my_rot(theta, phi) a { rx(theta) a; rz(phi) a; }
    gate bell a, b { h a; cx a, b; }
    gate nested(ang) a, b { my_rot(ang, ang/2) a; bell a, b; }
    my_rot(0.3, 0.7) q[0];
    bell q[0], q[1];
    ctrl @ my_rot(0.5, 0.1) q[2], q[1];
    inv @ bell q[1], q[2];
    nested(pi/4) q[0], q[2];
    pow(2) @ my_rot(0.2, 0.4) q[1];
    '''
    cir = qasm3_to_cir(qasm)
    # same program written directly
    ref = dq.QubitCircuit(3)
    ref.rx(0, inputs=0.3)
    ref.rz(0, inputs=0.7)
    ref.h(0)
    ref.cnot(0, 1)
    ref.rx(1, inputs=0.5, controls=[2])
    ref.rz(1, inputs=0.1, controls=[2])
    ref.cnot(1, 2)      # inv bell: reversed, both self-inverse
    ref.h(1)
    ref.rx(0, inputs=np.pi / 4)
    ref.rz(0, inputs=np.pi / 8)
    ref.h(0)
    ref.cnot(0, 2)
    ref.rx(1, inputs=0.2)
    ref.rz(1, inputs=0.4)
    ref.rx(1, inputs=0.2)
    ref.rz(1, inputs=0.4)
    np.testing.assert_allclose(np.asarray(cir.get_unitary()),
                               np.asarray(ref.get_unitary()), atol=1e-8)


def test_qasm3_pow_noninteger():
    """Non-integer pow lowers to an eigendecomposed arbitrary gate."""
    qasm = '''
    OPENQASM 3.0;
    qubit[1] q;
    pow(0.5) @ x q[0];
    pow(0.5) @ x q[0];
    '''
    cir = qasm3_to_cir(qasm)
    x = np.array([[0, 1], [1, 0]], complex)
    np.testing.assert_allclose(np.asarray(cir.get_unitary()), x, atol=1e-8)


def test_qasm3_roundtrip_ansatz():
    """Export -> import -> statevector parity for QFT / QPE / HHL
    (VERDICT round-1 item 8)."""
    from deepquantum_tpu.models import (
        QuantumFourierTransform, QuantumPhaseEstimationSingleQubit, HHL,
    )
    mat = np.array([[2.0, 1.0], [1.0, 2.0]])
    circuits = [
        QuantumFourierTransform(4),
        QuantumPhaseEstimationSingleQubit(3, 0.375),
        HHL(2, mat),
    ]
    for cir in circuits:
        cir2 = qasm3_to_cir(cir.qasm3())
        s1 = np.asarray(cir()).reshape(-1)
        s2 = np.asarray(cir2()).reshape(-1)
        np.testing.assert_allclose(s2, s1, atol=1e-6)


def test_unitary_mapper_two_qubit_cnot():
    """2-qubit CNOT with two ancilla modes — the reference mapper's primary
    use case (reference photonic/mapper.py:18-86). Post-selected transfer
    matrix must equal success * CNOT with success = 1/3."""
    from deepquantum_tpu.photonic.mapper import UnitaryMapper
    np.random.seed(7)
    cnot = np.eye(4)
    cnot[2:, 2:] = [[0, 1], [1, 0]]
    mapper = UnitaryMapper(nqubit=2, nmode=6, ugate=cnot, success=1 / 3,
                           aux=[0, 0], aux_pos=[4, 5])
    sols = mapper.solve_eqs_real(total_trials=10)
    assert sols, 'no optical realization found in 10 trials'
    u = sols[0]
    assert mapper.is_unitary(u)
    np.testing.assert_allclose(np.asarray(mapper.get_transfer_mat(u)),
                               cnot / 3, atol=1e-5)
