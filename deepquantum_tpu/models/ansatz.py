"""Algorithm circuit library (reference src/deepquantum/ansatz.py).

All circuits are built on the QubitCircuit IR; sub-circuits compose by
``add`` (parameters copied), and gate sharing uses descriptor re-adding.

Porting note: the gate sequences here (QFT, QPE, HHL, the Beauregard/Vedral
Shor arithmetic blocks) are the canonical textbook constructions and follow
the reference's class surface and argument conventions (ansatz.py:14-763)
for API parity; the simulation/execution machinery underneath is this
repo's own (circuit.py planar/XLA engines, descriptor IR).
"""

from __future__ import annotations

import random
from typing import Any

import numpy as np

from ..circuit import QubitCircuit
from ..config import cdtype
from ..gate import GATE_REGISTRY, GateOp

__all__ = [
    'Ansatz', 'ControlledMultiplier', 'ControlledUa', 'HHL', 'NumberEncoder', 'PhiAdder',
    'PhiModularAdder', 'QuantumConvolutionalNeuralNetwork', 'QuantumFourierTransform',
    'QuantumPhaseEstimation', 'QuantumPhaseEstimationSingleQubit', 'RandomCircuitG3',
    'ShorCircuit', 'ShorCircuitFor15',
]


def int_to_bitstring(number: int, nbit: int, debug: bool = False) -> str:
    """Integer -> bit string of length nbit (reference qmath.py helper)."""
    assert isinstance(number, int)
    bits = bin(number)[2:]
    if len(bits) > nbit:
        if debug:
            print(f'The number {number} exceeds {nbit} bits and is truncated.')
        bits = bits[-nbit:]
    return bits.zfill(nbit)


def is_unitary(u, atol: float = 1e-4) -> bool:
    u = np.asarray(u)
    return np.allclose(u @ u.conj().T, np.eye(u.shape[-1]), atol=atol)


def make_gate(name: str, inputs=None, requires_grad: bool = True) -> GateOp:
    """Standalone gate descriptor; re-adding it to one circuit shares parameters."""
    reg = GATE_REGISTRY[name]
    return GateOp(name=name, wires=(0,), matrix_fn=reg['fn'], npara=reg['npara'],
                  requires_grad=requires_grad, extra={'inputs': inputs})


class Ansatz(QubitCircuit):
    """Base class for algorithm circuits (reference ansatz.py:14)."""

    def __init__(self, nqubit: int, wires=None, minmax=None, ancilla=None, controls=None,
                 init_state: Any = 'zeros', name: str | None = None, den_mat: bool = False,
                 reupload: bool = False, mps: bool = False, chi: int | None = None) -> None:
        super().__init__(nqubit=nqubit, init_state=init_state, name=name, den_mat=den_mat,
                         reupload=reupload, mps=mps, chi=chi)
        if wires is None:
            if minmax is None:
                minmax = [0, nqubit - 1]
            wires = list(range(minmax[0], minmax[1] + 1))
        if isinstance(wires, int):
            wires = [wires]
        ancilla = [] if ancilla is None else ([ancilla] if isinstance(ancilla, int) else list(ancilla))
        controls = [] if controls is None else ([controls] if isinstance(controls, int) else list(controls))
        for wire in wires:
            assert wire not in ancilla and wire not in controls, 'wires must not overlap ancilla or controls'
        self.wires = sorted(wires)
        self.minmax = [min(wires), max(wires)]
        self.ancilla = ancilla
        self.controls = controls


class QuantumFourierTransform(Ansatz):
    """QFT (reference ansatz.py:565)."""

    def __init__(self, nqubit: int, minmax=None, reverse: bool = False, init_state='zeros',
                 den_mat=False, mps=False, chi=None, show_barrier: bool = False) -> None:
        super().__init__(nqubit=nqubit, minmax=minmax, init_state=init_state,
                         name='QuantumFourierTransform', den_mat=den_mat, mps=mps, chi=chi)
        self.reverse = reverse
        for i in self.wires:
            self.qft_block(i)
            if show_barrier:
                self.barrier(self.wires)
        if not reverse:
            for i in range(len(self.wires) // 2):
                self.swap([self.wires[i], self.wires[-1 - i]])

    def qft_block(self, n: int) -> None:
        self.h(n)
        k = 2
        for i in range(n, self.minmax[1]):
            self.cp(i + 1, n, np.pi / 2 ** (k - 1))
            k += 1


class QuantumPhaseEstimation(Ansatz):
    """QPE for an arbitrary unitary (reference ansatz.py:621)."""

    def __init__(self, nqubit: int, ncount: int, unitary, minmax=None, den_mat=False,
                 mps=False, chi=None, show_barrier: bool = False) -> None:
        unitary = np.asarray(unitary, dtype=np.complex128)
        assert is_unitary(unitary)
        n_target = int(np.log2(len(unitary)))
        if minmax is None:
            minmax = [0, ncount + n_target - 1]
        assert minmax[1] - minmax[0] == ncount + n_target - 1
        self.unitary = unitary
        super().__init__(nqubit=nqubit, minmax=minmax, name='QuantumPhaseEstimation',
                         den_mat=den_mat, mps=mps, chi=chi)
        count_wires = list(range(minmax[0], minmax[0] + ncount))
        target_wires = list(range(minmax[0] + ncount, minmax[1] + 1))
        self.hlayer(count_wires)
        if show_barrier:
            self.barrier()
        for i, wire in enumerate(count_wires):
            u = np.linalg.matrix_power(self.unitary, 2 ** (ncount - 1 - i))
            self.any(unitary=u, wires=target_wires, controls=wire)
        if show_barrier:
            self.barrier()
        iqft = QuantumFourierTransform(nqubit=nqubit, minmax=[count_wires[0], count_wires[-1]],
                                       den_mat=den_mat, mps=mps, chi=chi).inverse()
        self.add(iqft)


class QuantumPhaseEstimationSingleQubit(Ansatz):
    """QPE for a single-qubit phase gate (reference ansatz.py:687)."""

    def __init__(self, t: int, phase, den_mat=False, mps=False, chi=None) -> None:
        nqubit = t + 1
        self.phase = phase
        super().__init__(nqubit=nqubit, name='QuantumPhaseEstimationSingleQubit',
                         den_mat=den_mat, mps=mps, chi=chi)
        self.hlayer(list(range(t)))
        self.x(t)
        for i in range(t):
            self.cp(i, t, np.pi * phase * (2 ** (t - i)))
        iqft = QuantumFourierTransform(nqubit=nqubit, minmax=[0, t - 1],
                                       den_mat=den_mat, mps=mps, chi=chi).inverse()
        self.add(iqft)


class HHL(Ansatz):
    """HHL linear-system circuit (reference ansatz.py:236)."""

    def __init__(self, ncount: int, mat, t0: float = 1, den_mat=False, mps=False,
                 chi=None, show_barrier: bool = False) -> None:
        mat = np.asarray(mat, dtype=np.complex128)
        t0 = t0 * 2 * np.pi
        from scipy.linalg import expm
        unitary = expm(1j * mat * t0 / 2 ** ncount)
        assert is_unitary(unitary)
        n_target = int(np.log2(len(unitary)))
        nqubit = 1 + ncount + n_target
        self.unitary = unitary
        super().__init__(nqubit=nqubit, name='HHL', den_mat=den_mat, mps=mps, chi=chi)
        qpe = QuantumPhaseEstimation(nqubit=nqubit, ncount=ncount, unitary=unitary,
                                     minmax=[1, nqubit - 1], den_mat=den_mat, mps=mps,
                                     chi=chi, show_barrier=show_barrier)
        self.add(qpe)
        if show_barrier:
            self.barrier()
        for i in range(2 ** ncount):
            bits = format(i, '0' + str(ncount) + 'b')
            flips = [1 + j for j in range(ncount) if bits[ncount - j - 1] == '0']
            for w in flips:
                self.x(w)
            theta = 2 * np.pi * i / 2 ** ncount
            self.ry(0, inputs=theta, controls=list(range(1, ncount + 1)))
            for w in flips:
                self.x(w)
            if show_barrier:
                self.barrier()
        self.add(qpe.inverse())
        if show_barrier:
            self.barrier()


class NumberEncoder(Ansatz):
    """Basis-state encoder for an integer (reference ansatz.py:311)."""

    def __init__(self, nqubit: int, number: int, minmax=None, den_mat=False,
                 mps=False, chi=None) -> None:
        super().__init__(nqubit=nqubit, minmax=minmax, name='NumberEncoder',
                         den_mat=den_mat, mps=mps, chi=chi)
        bits = int_to_bitstring(number, len(self.wires))
        for i, wire in enumerate(self.wires):
            if bits[i] == '1':
                self.x(wire)


class PhiAdder(Ansatz):
    """Fourier-space adder (reference ansatz.py:350, arXiv:quant-ph/0205095 Fig.2-3)."""

    def __init__(self, nqubit: int, number: int, minmax=None, controls=None,
                 den_mat=False, mps=False, chi=None, debug: bool = False) -> None:
        super().__init__(nqubit=nqubit, minmax=minmax, controls=controls, name='PhiAdder',
                         den_mat=den_mat, mps=mps, chi=chi)
        bits = int_to_bitstring(number, len(self.wires), debug=debug)
        for i, wire in enumerate(self.wires):
            phi = 0.0
            for k, j in enumerate(range(i, len(bits))):
                if bits[j] == '1':
                    phi += np.pi / 2 ** k
            if phi != 0:
                self.p(wires=wire, inputs=phi, controls=self.controls if self.controls else None)


class PhiModularAdder(Ansatz):
    """Fourier-space modular adder (reference ansatz.py:399, Fig.5)."""

    def __init__(self, nqubit: int, number: int, mod: int, minmax=None, ancilla=None,
                 controls=None, den_mat=False, mps=False, chi=None, debug: bool = False) -> None:
        if minmax is None:
            minmax = [0, nqubit - 2]
        if ancilla is None:
            ancilla = [minmax[1] + 1]
        super().__init__(nqubit=nqubit, minmax=minmax, ancilla=ancilla, controls=controls,
                         name='PhiModularAdder', den_mat=den_mat, mps=mps, chi=chi)
        if debug and number >= 2 * mod:
            print(f'The number {number} in {self.name} is too large.')
        kw = dict(den_mat=den_mat, mps=mps, chi=chi, debug=debug)
        phi_add_number = PhiAdder(nqubit, number, self.minmax, self.controls, **kw)
        phi_sub_number = phi_add_number.inverse()
        phi_add_mod = PhiAdder(nqubit, mod, self.minmax, self.ancilla, **kw)
        phi_sub_mod = PhiAdder(nqubit, mod, self.minmax, None, **kw).inverse()
        qft = QuantumFourierTransform(nqubit=nqubit, minmax=self.minmax, reverse=True,
                                      den_mat=den_mat, mps=mps, chi=chi)
        iqft = qft.inverse()
        self.add(phi_add_number)
        self.add(phi_sub_mod)
        self.add(iqft)
        self.cnot(self.minmax[0], self.ancilla[0])
        self.add(qft)
        self.add(phi_add_mod)
        self.add(phi_sub_number)
        self.add(iqft)
        self.x(self.minmax[0])
        self.cnot(self.minmax[0], self.ancilla[0])
        self.x(self.minmax[0])
        self.add(qft)
        self.add(phi_add_number)


class ControlledMultiplier(Ansatz):
    """Controlled multiplier (reference ansatz.py:69, Fig.6)."""

    def __init__(self, nqubit: int, a: int, mod: int, minmax=None, nqubitx=None,
                 ancilla=None, controls=None, den_mat=False, mps=False, chi=None,
                 debug: bool = False) -> None:
        assert isinstance(a, int) and isinstance(mod, int)
        if minmax is None:
            minmax = [0, nqubit - 2]
        if nqubitx is None:
            nqubitx = len(bin(mod)) - 2
        if ancilla is None:
            ancilla = [minmax[1] + 1]
        super().__init__(nqubit=nqubit, minmax=minmax, ancilla=ancilla, controls=controls,
                         name='ControlledMultiplier', den_mat=den_mat, mps=mps, chi=chi)
        assert len(self.wires) >= nqubitx + len(bin(mod)) - 1, 'Quantum register is not enough.'
        minmax1 = [self.minmax[0], self.minmax[0] + nqubitx - 1]
        minmax2 = [minmax1[1] + 1, minmax[1]]
        qft = QuantumFourierTransform(nqubit=nqubit, minmax=minmax2, reverse=True,
                                      den_mat=den_mat, mps=mps, chi=chi)
        iqft = qft.inverse()
        self.add(qft)
        for k, i in enumerate(range(minmax1[1], minmax1[0] - 1, -1)):
            if debug and 2 ** k * a >= 2 * mod:
                print(f'The number 2^{k}*{a} in {self.name} may be too large, '
                      f'unless the control qubit {i} is 0.')
            pma = PhiModularAdder(nqubit=nqubit, number=2 ** k * a, mod=mod, minmax=minmax2,
                                  ancilla=self.ancilla, controls=self.controls + [i],
                                  den_mat=den_mat, mps=mps, chi=chi, debug=debug)
            self.add(pma)
        self.add(iqft)


class ControlledUa(Ansatz):
    """Controlled a*x mod N (reference ansatz.py:150, Fig.7)."""

    def __init__(self, nqubit: int, a: int, mod: int, minmax=None, ancilla=None,
                 controls=None, den_mat=False, mps=False, chi=None, debug: bool = False) -> None:
        nregister = len(bin(mod)) - 2
        nancilla = len(bin(mod))
        if minmax is None:
            minmax = [0, nregister - 1]
        if ancilla is None:
            ancilla = list(range(minmax[1] + 1, minmax[1] + 1 + nancilla))
        super().__init__(nqubit=nqubit, minmax=minmax, ancilla=ancilla, controls=controls,
                         name='ControlledUa', den_mat=den_mat, mps=mps, chi=chi)
        assert len(self.wires) == nregister
        assert len(self.ancilla) == nancilla
        cmult = ControlledMultiplier(nqubit=nqubit, a=a, mod=mod,
                                     minmax=[self.minmax[0], self.ancilla[-2]],
                                     nqubitx=nregister, ancilla=self.ancilla[-1],
                                     controls=self.controls, den_mat=den_mat, mps=mps,
                                     chi=chi, debug=debug)
        self.add(cmult)
        for i in range(len(self.wires)):
            self.swap([self.wires[i], self.ancilla[i + 1]],
                      controls=self.controls if self.controls else None)
        a_inv = pow(a, -1, mod)
        cmult_inv = ControlledMultiplier(nqubit=nqubit, a=a_inv, mod=mod,
                                         minmax=[self.minmax[0], self.ancilla[-2]],
                                         nqubitx=nregister, ancilla=self.ancilla[-1],
                                         controls=self.controls, den_mat=den_mat, mps=mps,
                                         chi=chi, debug=debug).inverse()
        self.add(cmult_inv)


class QuantumConvolutionalNeuralNetwork(Ansatz):
    """QCNN ansatz with shared conv/pool parameters (reference ansatz.py:491)."""

    def __init__(self, nqubit: int, nlayer: int, minmax=None, init_state='zeros',
                 den_mat=False, requires_grad: bool = True, mps=False, chi=None) -> None:
        super().__init__(nqubit=nqubit, minmax=minmax, init_state=init_state,
                         name='QuantumConvolutionalNeuralNetwork', den_mat=den_mat,
                         mps=mps, chi=chi)
        wires = self.wires
        self.requires_grad = requires_grad
        u1 = make_gate('U3Gate', requires_grad=requires_grad)
        u2 = make_gate('U3Gate', requires_grad=requires_grad)
        for i, wire in enumerate(wires[1::2]):
            self.add(u1, wires=wires[2 * i])
            self.add(u2, wires=wire)
        for _ in range(nlayer):
            self.conv(wires)
            self.pool(wires)
            wires = wires[::2]
        self.latent(wires=wires)

    def conv(self, wires):
        rxx = make_gate('Rxx', requires_grad=self.requires_grad)
        ryy = make_gate('Ryy', requires_grad=self.requires_grad)
        rzz = make_gate('Rzz', requires_grad=self.requires_grad)
        u1 = make_gate('U3Gate', requires_grad=self.requires_grad)
        u2 = make_gate('U3Gate', requires_grad=self.requires_grad)
        for start in (1, 2):
            for i, wire in enumerate(wires[start::2]):
                self.add(rxx, wires=[wires[2 * i + start - 1], wire])
                self.add(ryy, wires=[wires[2 * i + start - 1], wire])
                self.add(rzz, wires=[wires[2 * i + start - 1], wire])
                self.add(u1, wires=wires[2 * i + start - 1])
                self.add(u2, wires=wire)

    def pool(self, wires):
        cu = make_gate('U3Gate', requires_grad=self.requires_grad)
        for i, wire in enumerate(wires[1::2]):
            self.add(cu, wires=wires[2 * i], controls=wire)


class RandomCircuitG3(Ansatz):
    """Random {CNOT, H, T} circuit (reference ansatz.py:723)."""

    def __init__(self, nqubit: int, ngate: int, wires=None, minmax=None,
                 init_state='zeros', den_mat=False, mps=False, chi=None) -> None:
        super().__init__(nqubit=nqubit, wires=wires, minmax=minmax, init_state=init_state,
                         name='RandomCircuitG3', den_mat=den_mat, mps=mps, chi=chi)
        self.ngate = ngate
        self.gate_set = ['CNOT', 'H', 'T']
        for _ in range(ngate):
            gate = random.sample(self.gate_set, 1)[0]
            wire = random.sample(self.wires, 2) if gate == 'CNOT' else random.sample(self.wires, 1)
            if gate == 'CNOT':
                self.cnot(wire[0], wire[1])
            elif gate == 'H':
                self.h(wire[0])
            elif gate == 'T':
                self.t(wire[0])


class ShorCircuit(Ansatz):
    """Shor's algorithm circuit (reference ansatz.py:774)."""

    def __init__(self, mod: int, ncount: int, a: int, den_mat=False, mps=False,
                 chi=None, debug: bool = False) -> None:
        nreg = len(bin(mod)) - 2
        nqubit = ncount + 2 * nreg + 2
        super().__init__(nqubit=nqubit, name='ShorCircuit', den_mat=den_mat, mps=mps, chi=chi)
        minmax1 = [0, ncount - 1]
        minmax2 = [ncount, ncount + nreg - 1]
        ancilla = list(range(ncount + nreg, nqubit))
        self.hlayer(list(range(ncount)))
        self.x(ncount + nreg - 1)
        for n, i in enumerate(range(ncount - 1, -1, -1)):
            an = a
            for _ in range(n):
                an = an ** 2 % mod
            cua = ControlledUa(nqubit=nqubit, a=an, mod=mod, minmax=minmax2, ancilla=ancilla,
                               controls=[i], den_mat=den_mat, mps=mps, chi=chi, debug=debug)
            self.add(cua)
        iqft = QuantumFourierTransform(nqubit=nqubit, minmax=minmax1, den_mat=den_mat,
                                       mps=mps, chi=chi).inverse()
        self.add(iqft)


class ShorCircuitFor15(Ansatz):
    """Compiled Shor circuit for N=15 (reference ansatz.py:840)."""

    def __init__(self, ncount: int, a: int, den_mat=False, mps=False, chi=None) -> None:
        mod = 15
        nreg = len(bin(mod)) - 2
        nqubit = ncount + nreg
        self.ncount = ncount
        super().__init__(nqubit=nqubit, name='ShorCircuitFor15', den_mat=den_mat,
                         mps=mps, chi=chi)
        minmax = [0, ncount - 1]
        self.hlayer(list(range(ncount)))
        self.x(ncount + nreg - 1)
        for n, i in enumerate(range(ncount - 1, -1, -1)):
            self.cua(a, 2 ** n, i)
        iqft = QuantumFourierTransform(nqubit=nqubit, minmax=minmax, den_mat=den_mat,
                                       mps=mps, chi=chi).inverse()
        self.add(iqft)

    def cua(self, a: int, power: int, controls) -> None:
        assert a in [2, 4, 7, 8, 11, 13]
        for _ in range(power):
            if a in [2, 13]:
                self.swap([self.ncount + 2, self.ncount + 3], controls)
                self.swap([self.ncount + 1, self.ncount + 2], controls)
                self.swap([self.ncount + 0, self.ncount + 1], controls)
            if a in [7, 8]:
                self.swap([self.ncount + 0, self.ncount + 1], controls)
                self.swap([self.ncount + 1, self.ncount + 2], controls)
                self.swap([self.ncount + 2, self.ncount + 3], controls)
            if a in [4, 11]:
                self.swap([self.ncount + 1, self.ncount + 3], controls)
                self.swap([self.ncount + 0, self.ncount + 2], controls)
            if a in [7, 11, 13]:
                for q in range(4):
                    self.x(self.ncount + q, controls)
