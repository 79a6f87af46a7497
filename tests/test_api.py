"""Class-style API + export parity with the reference package surface."""

import numpy as np
import pytest

import deepquantum_tpu as dq
from deepquantum_tpu import api


def _public(mod):
    import types
    return {n for n in dir(mod) if not n.startswith('_')
            and not isinstance(getattr(mod, n), types.ModuleType)}


def test_top_level_exports_cover_reference():
    ref = pytest.importorskip('deepquantum')
    missing = sorted(_public(ref) - _public(dq))
    assert not missing, f'top-level names missing vs reference: {missing}'


def test_photonic_exports_cover_reference():
    ref = pytest.importorskip('deepquantum')
    import deepquantum.photonic as ref_ph
    import deepquantum_tpu.photonic as ours_ph
    missing = sorted(_public(ref_ph) - _public(ours_ph))
    assert not missing, f'photonic names missing vs reference: {missing}'


def test_all_exports_resolve():
    import deepquantum_tpu.photonic as ours_ph
    for mod in (dq, ours_ph):
        for n in _public(mod):
            getattr(mod, n)  # must not raise


def test_class_style_gate_matches_sugar():
    cir = dq.QubitCircuit(2)
    rx = api.Rx(inputs=0.3, wires=0)
    cir.add(rx)
    cir.add(api.CNOT(wires=[0, 1]))
    cir.add(rx)  # re-adding shares the parameter slice
    assert cir.npara == 1
    ref = dq.QubitCircuit(2)
    ref.rx(0, inputs=0.3)
    ref.cnot(0, 1)
    ref.rx(0, inputs=0.3)
    np.testing.assert_allclose(np.asarray(cir()).reshape(-1),
                               np.asarray(ref()).reshape(-1), atol=1e-10)


def test_standalone_gate_call_and_matrix():
    h = api.Hadamard(wires=0, nqubit=1)
    out = np.asarray(h(np.array([1, 0], complex)))
    np.testing.assert_allclose(out, [2 ** -0.5, 2 ** -0.5], atol=1e-8)
    rx = api.Rx(inputs=0.7, wires=0)
    m = np.asarray(rx.matrix())
    expected = np.array([[np.cos(0.35), -1j * np.sin(0.35)],
                         [-1j * np.sin(0.35), np.cos(0.35)]])
    np.testing.assert_allclose(m, expected, atol=1e-8)


def test_combined_single_gate():
    comb = api.CombinedSingleGate([api.Rx(inputs=0.2, wires=0),
                                   api.Rz(inputs=0.5, wires=0)], wires=0)
    m = np.asarray(comb.matrix())
    exp = (np.asarray(api.Rz(inputs=0.5, wires=0).matrix())
           @ np.asarray(api.Rx(inputs=0.2, wires=0).matrix()))
    np.testing.assert_allclose(m, exp, atol=1e-10)


def test_layers_and_channels():
    cir = dq.QubitCircuit(3)
    cir.add(api.RxLayer(nqubit=3, inputs=[0.1, 0.2, 0.3]))
    cir.add(api.CnotRing(nqubit=3))
    state = np.asarray(cir()).reshape(-1)
    np.testing.assert_allclose(np.linalg.norm(state), 1.0, atol=1e-8)

    dm = dq.QubitCircuit(1, den_mat=True)
    dm.add(api.BitFlip(inputs=[0.2], wires=0))
    rho = np.asarray(dm()).reshape(2, 2)
    np.testing.assert_allclose(np.trace(rho).real, 1.0, atol=1e-8)
    with pytest.raises(AssertionError):
        dq.QubitCircuit(1).add(api.BitFlip(inputs=[0.2], wires=0))


def test_expectation_function():
    cir = dq.QubitCircuit(2)
    cir.h(0)
    cir.cnot(0, 1)
    st = cir()
    obs = dq.Observable(2, wires=[0, 1], basis='zz')
    assert abs(float(api.expectation(st, obs)) - 1.0) < 1e-6
    # density matrix path
    dm = dq.QubitCircuit(2, den_mat=True)
    dm.h(0)
    dm.cnot(0, 1)
    rho = dm()
    assert abs(float(api.expectation(rho, obs, den_mat=True)) - 1.0) < 1e-6


def test_photonic_class_style_matches_sugar():
    from deepquantum_tpu.photonic import api as pa
    from deepquantum_tpu.photonic import QumodeCircuit
    cir = QumodeCircuit(nmode=2, init_state=[1, 0], cutoff=3, backend='fock', basis=True)
    cir.add(pa.PhaseShift(inputs=0.3, wires=0))
    cir.add(pa.BeamSplitter(inputs=[0.4, 0.5], wires=[0, 1]))
    ref = QumodeCircuit(nmode=2, init_state=[1, 0], cutoff=3, backend='fock', basis=True)
    ref.ps(0, inputs=0.3)
    ref.bs([0, 1], inputs=[0.4, 0.5])
    p1 = cir(is_prob=True)
    p2 = ref(is_prob=True)
    for k in p2:
        np.testing.assert_allclose(np.asarray(p1[k]), np.asarray(p2[k]), atol=1e-10)


def test_photonic_delay_class_matches_sugar():
    from deepquantum_tpu.photonic import api as pa
    from deepquantum_tpu.photonic.tdm import QumodeCircuitTDM
    t1 = QumodeCircuitTDM(nmode=1, init_state='vac', cutoff=3)
    t1.s(0, r=0.5)
    t1.add(pa.DelayBS(inputs=[0.4, 0.2], wires=0, ntau=1))
    t1.homodyne_x(0)
    t2 = QumodeCircuitTDM(nmode=1, init_state='vac', cutoff=3)
    t2.s(0, r=0.5)
    t2.delay(0, ntau=1, inputs=(0.4, 0.2))
    t2.homodyne_x(0)
    s1 = t1.get_symplectic()
    s2 = t2.get_symplectic()
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-10)


def test_schur_anti_symm_even():
    from deepquantum_tpu.photonic.qmath import schur_anti_symm_even
    rng = np.random.default_rng(1)
    a = rng.normal(size=(6, 6))
    a = a - a.T
    t, o = schur_anti_symm_even(a)
    t, o = np.asarray(t), np.asarray(o)
    np.testing.assert_allclose(o @ t @ o.T, a, atol=1e-8)
    np.testing.assert_allclose(o @ o.T, np.eye(6), atol=1e-8)


def test_stateful_parameter_api():
    cir = dq.QubitCircuit(2)
    cir.rx(0, encode=True)
    cir.ry(1)
    cir.encode(np.array([0.7]))
    ref = dq.QubitCircuit(2)
    ref.rx(0, inputs=0.7)
    ref.ry(1, inputs=float(cir._pvals[1]))
    np.testing.assert_allclose(np.asarray(cir()).reshape(-1),
                               np.asarray(ref()).reshape(-1), atol=1e-10)
    cir.init_para()
    cir.init_encoder()
    assert np.isfinite(np.asarray(cir())).all()
    cir.reset_circuit()
    assert cir.npara == 0 and not cir.operators


def test_state_reshapers():
    cir = dq.QubitCircuit(2)
    x = np.ones(4) / 2
    assert cir.vector_rep(x).shape == (1, 4, 1)
    assert cir.tensor_rep(x).shape == (1, 2, 2)
    assert cir.matrix_rep(np.eye(4) / 4).shape == (1, 4, 4)


def test_transform_cut2move_simulates_cut():
    cut = dq.QubitCircuit(2)
    cut.rx(0, inputs=0.3)
    cut.cnot(0, 1)
    cut.cut(1)
    cut.ry(1, inputs=0.7)
    cut.observable(1)
    moved = cut.transform_cut2move()
    assert moved.nqubit == 3
    assert any(o.kind == 'move' for o in moved.operators)
    moved()
    np.testing.assert_allclose(float(moved.expectation()[0]),
                               float(cut.expectation()[0]), atol=1e-8)


def test_set_fock_basis():
    from deepquantum_tpu.photonic import QumodeCircuit
    q = QumodeCircuit(nmode=2, init_state=[1, 1], cutoff=3)
    q.bs([0, 1], inputs=[0.4, 0.5])
    q.set_fock_basis([[2, 0], [0, 2]])
    probs = q(is_prob=True)
    assert len(probs) == 2
    np.testing.assert_array_equal(q.get_fock_basis(), [[2, 0], [0, 2]])
    q.set_fock_basis(None)
    assert len(q(is_prob=True)) == 3  # |20>, |11>, |02>


def test_global_circuit_matches_unrolled_symplectic():
    from deepquantum_tpu.photonic.tdm import QumodeCircuitTDM
    t = QumodeCircuitTDM(nmode=1, init_state='vac', cutoff=3)
    t.s(0, r=0.5)
    t.delay(0, ntau=1, inputs=(0.4, 0.2))
    g1 = t.global_circuit(1)
    np.testing.assert_allclose(np.asarray(g1.get_symplectic()),
                               np.asarray(t.get_symplectic()), atol=1e-10)
    g3 = t.global_circuit(3)
    assert g3.nmode == 2 + 2 * 1
    assert g3.npara == 4  # r + delay theta/phi shared across steps
    cov, mean = g3()
    assert np.isfinite(np.asarray(cov)).all()


def test_mps_orthogonalization_methods():
    mps = dq.MatrixProductState(nsite=4, state=[0, 1, 0, 1], chi=8)
    full_before = np.asarray(mps.full_tensor()).reshape(-1)
    mps.orthogonalize_n1_n2(0, 3, -1, True)
    mps.normalize_central_tensor()
    err = mps.check_center_orthogonality()
    assert all(e is None or e < 1e-6 for e in err)
    full_after = np.asarray(mps.full_tensor()).reshape(-1)
    np.testing.assert_allclose(np.abs(full_after), np.abs(full_before), atol=1e-8)


def test_expectation_function_mps():
    cir = dq.QubitCircuit(4, mps=True, chi=16)
    cir.h(0)
    for i in range(3):
        cir.cnot(i, i + 1)
    tensors = cir()
    obs = dq.Observable(4, wires=[0, 3], basis='zz')
    e_mps = float(api.expectation(list(tensors), obs))
    sv = dq.QubitCircuit(4)
    sv.h(0)
    for i in range(3):
        sv.cnot(i, i + 1)
    sv.observable([0, 3], basis='zz')
    e_sv = float(sv.expectation()[0])
    np.testing.assert_allclose(e_mps, e_sv, atol=1e-8)
