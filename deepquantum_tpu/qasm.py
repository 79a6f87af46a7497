"""OpenQASM 2 export and OpenQASM 3 export/import for QubitCircuit.

Mirrors reference circuit.py:570-643 (QASM 2) and qasm3.py (QASM 3). Works on
the GateOp IR: parameter values come from the circuit's host-side parameter
list, so export never touches the device.
"""

from __future__ import annotations

import re

import numpy as np

__all__ = ['cir_to_qasm2', 'cir_to_qasm3', 'qasm3_to_cir']

# op name -> (qasm name, controlled-prefix names per #controls)
_Q2_NAMES = {
    'U3Gate': 'u3', 'PhaseShift': 'p', 'PauliX': 'x', 'PauliY': 'y', 'PauliZ': 'z',
    'Hadamard': 'h', 'SGate': 's', 'SDaggerGate': 'sdg', 'TGate': 't', 'TDaggerGate': 'tdg',
    'Rx': 'rx', 'Ry': 'ry', 'Rz': 'rz', 'CNOT': 'cx', 'Swap': 'swap',
    'Rxx': 'rxx', 'Ryy': 'ryy', 'Rzz': 'rzz', 'Toffoli': 'ccx', 'Fredkin': 'cswap',
}
_Q2_CONTROLLED = {
    'u3': 'cu3', 'p': 'cp', 'x': {1: 'cx', 2: 'ccx', 3: 'c3x', 4: 'c4x'},
    'y': 'cy', 'z': 'cz', 'h': 'ch', 's': 'cs', 'sdg': 'csdg',
    'rx': 'crx', 'ry': 'cry', 'rz': 'crz', 'swap': 'cswap',
}


def _op_params(cir, op):
    if not op.pidx:
        return []
    vals = [cir._pvals[i] for i in op.pidx]
    if op.inv:
        vals = [-v for v in vals]
    return vals


def _fmt_params(vals):
    if not vals:
        return ''
    return '(' + ','.join(repr(float(v)) for v in vals) + ')'


def _fmt_qubits(wires):
    return ','.join(f'q[{w}]' for w in wires)


def cir_to_qasm2(cir) -> str:
    """QubitCircuit -> OpenQASM 2 (reference circuit.py:570)."""
    lines = ['OPENQASM 2.0;\ninclude "qelib1.inc";\n']
    if cir.wires_measure or cir.wires_condition:
        lines.append(f'qreg q[{cir.nqubit}];\ncreg c[{cir.nqubit}];\n')
    else:
        lines.append(f'qreg q[{cir.nqubit}];\n')
    for op in cir.operators:
        if op.kind == 'barrier':
            lines.append(f'barrier {_fmt_qubits(op.wires)};\n')
            continue
        if op.kind != 'gate':
            raise ValueError(f'{op.name} is NOT supported')
        if op.condition:
            raise ValueError(f'Conditional mode is NOT supported for {op.name}')
        name = _Q2_NAMES.get(op.name)
        if name is None:
            raise ValueError(f'{op.name} is NOT supported')
        nc = len(op.controls)
        if nc:
            mapped = _Q2_CONTROLLED.get(name)
            if isinstance(mapped, dict):
                mapped = mapped.get(nc)
            elif nc > 1:
                mapped = None
            if mapped is None:
                raise ValueError(f'Too many control bits for {op.name}')
            name = mapped
        params = _fmt_params(_op_params(cir, op))
        lines.append(f'{name}{params} {_fmt_qubits(list(op.controls) + list(op.wires))};\n')
    for wire in cir.wires_measure:
        lines.append(f'measure q[{wire}] -> c[{wire}];\n')
    return ''.join(lines)


_Q3_NAMES = {
    'U3Gate': 'u', 'PhaseShift': 'p', 'PauliX': 'x', 'PauliY': 'y', 'PauliZ': 'z',
    'Hadamard': 'h', 'SGate': 's', 'SDaggerGate': 'sdg', 'TGate': 't', 'TDaggerGate': 'tdg',
    'Rx': 'rx', 'Ry': 'ry', 'Rz': 'rz', 'Swap': 'swap', 'CNOT': 'cx',
    'Toffoli': 'ccx', 'Fredkin': 'cswap', 'Rxx': 'rxx', 'Ryy': 'ryy', 'Rzz': 'rzz',
}


def cir_to_qasm3(cir) -> str:
    """QubitCircuit -> OpenQASM 3 (reference qasm3.py:117)."""
    parts = ['OPENQASM 3.0;', 'include "stdgates.inc";', f'qubit[{cir.nqubit}] q;']
    if cir.wires_measure:
        parts.append(f'bit[{max(cir.wires_measure) + 1}] c;')
    for op in cir.operators:
        if op.kind == 'barrier':
            parts.append('barrier ' + ', '.join(f'q[{w}]' for w in op.wires) + ';')
            continue
        if op.kind == 'channel':
            parts.append(f'// Quantum channels like {op.name} are not part of the OpenQASM 3.0 core specification.')
            continue
        name = _Q3_NAMES.get(op.name)
        if name is None:
            parts.append(f'// Unsupported gate: {op.name}')
            continue
        vals = _op_params(cir, op)
        param_str = f'({", ".join(map(str, vals))})' if vals else ''
        qubits = ', '.join(f'q[{w}]' for w in list(op.controls) + list(op.wires))
        ctrl = 'ctrl @ ' * len(op.controls)
        parts.append(f'{ctrl}{name}{param_str} {qubits};')
    if cir.wires_measure:
        parts.append('')
        for wire in sorted(cir.wires_measure):
            parts.append(f'c[{wire}] = measure q[{wire}];')
    return '\n'.join(parts)


_Q3_TO_METHOD = {
    'u': 'u3', 'u3': 'u3', 'p': 'p', 'phase': 'p', 'x': 'x', 'y': 'y', 'z': 'z', 'h': 'h',
    's': 's', 'sdg': 'sdg', 't': 't', 'tdg': 'tdg', 'rx': 'rx', 'ry': 'ry', 'rz': 'rz',
    'swap': 'swap', 'cx': 'cnot', 'cnot': 'cnot', 'cz': 'cz', 'cy': 'cy', 'ch': 'ch',
    'ccx': 'ccx', 'cswap': 'cswap', 'rxx': 'rxx', 'ryy': 'ryy', 'rzz': 'rzz',
    'cp': 'cp', 'crx': 'crx', 'cry': 'cry', 'crz': 'crz', 'id': None, 'barrier': None,
}


def _eval_expr(expr: str) -> float:
    expr = expr.strip().replace('pi', repr(np.pi)).replace('π', repr(np.pi))
    allowed = set('0123456789.+-*/e() ')
    assert set(expr) <= allowed, f'Disallowed token in QASM expression: {expr}'
    return float(eval(expr, {'__builtins__': {}}))  # noqa: S307 — sanitized arithmetic only


def qasm3_to_cir(qasm: str):
    """OpenQASM 3 (subset) -> QubitCircuit (reference qasm3.py:166)."""
    from .circuit import QubitCircuit

    lines = []
    for raw in qasm.splitlines():
        line = raw.split('//')[0].strip()
        if line:
            lines.append(line)
    text = ' '.join(lines)
    stmts = [s.strip() for s in text.split(';') if s.strip()]

    nqubit = None
    for s in stmts:
        m = re.match(r'qubit\[(\d+)\]\s+(\w+)', s)
        if m:
            nqubit = int(m.group(1))
            qreg = m.group(2)
            break
        m = re.match(r'qreg\s+(\w+)\[(\d+)\]', s)
        if m:
            nqubit = int(m.group(2))
            qreg = m.group(1)
            break
    assert nqubit is not None, 'No qubit register found'
    cir = QubitCircuit(nqubit)

    gate_re = re.compile(
        r'^(?P<ctrl>(?:ctrl\s*@\s*)*)(?P<name>\w+)\s*(?:\((?P<params>[^)]*)\))?\s+(?P<qubits>.+)$')
    for s in stmts:
        if s.startswith(('OPENQASM', 'include', 'qubit', 'qreg', 'bit', 'creg')):
            continue
        if re.match(r'^\w+\[\d+\]\s*=\s*measure', s) or s.startswith('measure'):
            m = re.search(r'measure\s+\w+\[(\d+)\]', s)
            if m:
                w = int(m.group(1))
                if w not in cir.wires_measure:
                    cir.wires_measure.append(w)
            continue
        m = gate_re.match(s)
        if not m:
            continue
        nctrl = m.group('ctrl').count('@')
        name = m.group('name').lower()
        params = [_eval_expr(p) for p in m.group('params').split(',')] if m.group('params') else []
        qubits = [int(q) for q in re.findall(r'\w+\[(\d+)\]', m.group('qubits'))]
        if name == 'barrier':
            cir.barrier(qubits)
            continue
        method = _Q3_TO_METHOD.get(name)
        if method is None:
            if name == 'id':
                continue
            raise ValueError(f'Unsupported QASM gate: {name}')
        controls = qubits[:nctrl]
        targets = qubits[nctrl:]
        _apply_parsed(cir, method, targets, controls, params)
    return cir


def _apply_parsed(cir, method, targets, controls, params):
    if method == 'u3':
        cir.u3(targets, inputs=params, controls=controls or None)
    elif method in ('rx', 'ry', 'rz', 'p'):
        getattr(cir, method)(targets[0] if len(targets) == 1 else targets,
                             inputs=params[0], controls=controls or None)
    elif method in ('rxx', 'ryy', 'rzz'):
        getattr(cir, method)(targets, inputs=params[0], controls=controls or None)
    elif method in ('x', 'y', 'z', 'h', 's', 'sdg', 't', 'tdg'):
        getattr(cir, method)(targets[0], controls=controls or None)
    elif method == 'swap':
        cir.swap(targets, controls=controls or None)
    elif method == 'cnot':
        if controls:
            cir.ccx(controls[0], targets[0], targets[1]) if len(targets) == 2 else None
        else:
            cir.cnot(targets[0], targets[1])
    elif method in ('cz', 'cy', 'ch'):
        getattr(cir, method)(targets[0], targets[1])
    elif method == 'ccx':
        cir.ccx(targets[0], targets[1], targets[2])
    elif method == 'cswap':
        cir.cswap(targets[0], targets[1], targets[2])
    elif method == 'cp':
        cir.cp(targets[0], targets[1], inputs=params[0])
    elif method in ('crx', 'cry', 'crz'):
        getattr(cir, method)(targets[0], targets[1], inputs=params[0])
    else:
        raise ValueError(f'Unhandled method {method}')
