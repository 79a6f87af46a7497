"""Circuit cutting: reconstructed expectations equal the uncut circuit."""

import numpy as np

import deepquantum_tpu as dq


def _reconstruct(subexperiments, coefficients):
    """sum_k coeff_k * prod_labels <obs>_k per observable."""
    nexp = len(coefficients)
    labels = list(subexperiments.keys())
    total = None
    for k in range(nexp):
        prod = None
        for label in labels:
            cir = subexperiments[label][k]
            if not cir.observables:
                continue
            cir()
            ev = np.asarray(cir.expectation())
            ev = np.prod(ev)  # product of Z-factors within the partition
            prod = ev if prod is None else prod * ev
        if prod is None:
            prod = 1.0
        term = coefficients[k] * prod
        total = term if total is None else total + term
    return total


def test_cut_reconstruction_matches_uncut():
    # uncut: 2 qubits, entangle, cut wire 0, more gates, measure <Z0>, <Z1>
    def build_main(c):
        c.rx(0, inputs=0.3)
        c.ry(1, inputs=0.8)
        c.cnot(0, 1)
        c.cut(1)
        c.rz(1, inputs=0.5)
        c.rx(1, inputs=0.2)

    uncut = dq.QubitCircuit(2)
    build_main(uncut)
    uncut.observable(1, basis='z')
    uncut()
    expected = float(uncut.expectation()[0])

    cut_cir = dq.QubitCircuit(2)
    build_main(cut_cir)
    cut_cir.observable(1, basis='z')
    subexps, coeffs = cut_cir.get_subexperiments()
    assert len(coeffs) == 8
    result = _reconstruct(subexps, coeffs)
    np.testing.assert_allclose(float(np.real(result)), expected, atol=1e-6)


def test_cut_two_observables():
    def build_main(c):
        c.h(0)
        c.cnot(0, 1)
        c.cut(1)
        c.ry(1, inputs=0.7)

    uncut = dq.QubitCircuit(2)
    build_main(uncut)
    uncut.observable(0, basis='z')
    uncut()
    expected = float(uncut.expectation()[0])

    cut_cir = dq.QubitCircuit(2)
    build_main(cut_cir)
    cut_cir.observable(0, basis='z')
    subexps, coeffs = cut_cir.get_subexperiments()
    result = _reconstruct(subexps, coeffs)
    np.testing.assert_allclose(float(np.real(result)), expected, atol=1e-6)


def test_partition_labels():
    from deepquantum_tpu.cutting import partition_labels, _IROp
    cir = dq.QubitCircuit(4)
    cir.cnot(0, 1)
    cir.cnot(2, 3)
    ops = [_IROp(op, cir._pvals) for op in cir.operators]
    labels = partition_labels(ops, 4)
    assert labels[0] == labels[1]
    assert labels[2] == labels[3]
    assert labels[0] != labels[2]


def test_reset_and_move():
    import pytest
    torch = pytest.importorskip('torch')
    import deepquantum as ref_dq
    ours = dq.QubitCircuit(2)
    theirs = ref_dq.QubitCircuit(2)
    for c in (ours, theirs):
        c.h(0)
        c.cnot(0, 1)
        c.reset(1)
        c.rx(1, inputs=0.4)
        c.move(0, 1)
    s_o = np.asarray(ours()).reshape(-1)
    s_t = theirs().detach().numpy().reshape(-1)
    np.testing.assert_allclose(s_o, s_t, atol=1e-6)
