"""Circuit visualization (reference src/deepquantum/photonic/draw.py).

DrawCircuit renders a QumodeCircuit to SVG with a minimal inline SVG writer
(the reference uses the svgwrite package, which is not a hard dependency
here). DrawClements plots the MZI mesh with matplotlib.
"""

from __future__ import annotations

import numpy as np

__all__ = ['DrawCircuit', 'DrawClements']


class _SVG:
    """Tiny stand-in for svgwrite.Drawing."""

    def __init__(self):
        self.elements = []
        self.width = 0
        self.height = 0

    def line(self, x1, y1, x2, y2, color='black', width=2):
        self.elements.append(
            f'<line x1="{x1}" y1="{y1}" x2="{x2}" y2="{y2}" '
            f'stroke="{color}" stroke-width="{width}"/>')

    def rect(self, x, y, w, h, color='#1f77b4'):
        self.elements.append(
            f'<rect x="{x}" y="{y}" width="{w}" height="{h}" fill="{color}" rx="3"/>')

    def text(self, x, y, s, size=11, color='black'):
        self.elements.append(
            f'<text x="{x}" y="{y}" font-size="{size}" fill="{color}" '
            f'font-family="monospace">{s}</text>')

    def render(self) -> str:
        return (f'<svg xmlns="http://www.w3.org/2000/svg" width="{self.width}" '
                f'height="{self.height}">' + ''.join(self.elements) + '</svg>')


_GATE_COLORS = {
    'PhaseShift': '#fdae61', 'BeamSplitter': '#2c7bb6', 'MZI': '#2c7bb6',
    'Squeezing': '#abdda4', 'Squeezing2': '#abdda4', 'Displacement': '#d7191c',
    'Kerr': '#984ea3', 'CrossKerr': '#984ea3', 'PhotonLoss': '#999999',
}


class DrawCircuit:
    """SVG renderer for QumodeCircuit (reference photonic/draw.py:30)."""

    def __init__(self, circuit_name: str | None, nmode: int, operators, measurements=None):
        self.name = circuit_name or 'circuit'
        self.nmode = nmode
        self.operators = operators
        self.measurements = measurements or []
        self.svg = None

    def draw(self) -> str:
        svg = _SVG()
        x0, dy, dx = 60, 40, 70
        depth = np.zeros(self.nmode, np.int64)
        for op in self.operators:
            if op.kind == 'barrier':
                continue
            wires = list(op.wires)
            col = int(max(depth[w] for w in wires))
            x = x0 + col * dx
            y_top = 20 + min(wires) * dy
            y_bot = 20 + max(wires) * dy
            color = _GATE_COLORS.get(op.name.split('_')[0], '#66c2a5')
            svg.rect(x, y_top - 12, 44, (y_bot - y_top) + 24, color)
            svg.text(x + 2, (y_top + y_bot) / 2 + 4, op.name[:6], size=9, color='white')
            for w in wires:
                depth[w] = col + 1
        ncol = int(depth.max()) + 1 if len(self.operators) else 1
        for m in self.measurements:
            for w in m.wires:
                x = x0 + ncol * dx
                svg.rect(x, 20 + w * dy - 12, 30, 24, '#333333')
                svg.text(x + 4, 20 + w * dy + 4, 'M', size=11, color='white')
        width = x0 + (ncol + 2) * dx
        for i in range(self.nmode):
            y = 20 + i * dy
            svg.elements.insert(0, f'<line x1="20" y1="{y}" x2="{width - 20}" y2="{y}" '
                                   f'stroke="black" stroke-width="1.5"/>')
            svg.text(2, y + 4, f'q{i}')
        svg.width = width
        svg.height = 40 + self.nmode * dy
        self.svg = svg.render()
        return self.svg

    def save(self, filename: str) -> None:
        if self.svg is None:
            self.draw()
        with open(filename, 'w') as f:
            f.write(self.svg)


class DrawClements:
    """Matplotlib plot of a Clements MZI mesh (reference photonic/draw.py:505)."""

    def __init__(self, nmode: int, mzi_info, cl: str = 'dodgerblue', method: str = 'cssr'):
        self.nmode = nmode
        self.method = method
        self.color = cl
        self.mzi_info = mzi_info
        self.dic_mzi = mzi_info[1] if isinstance(mzi_info, tuple) else mzi_info

    def plot(self, filename: str | None = None):
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(1.2 * self.nmode, 0.8 * self.nmode))
        for i in range(self.nmode):
            ax.plot([0, self.nmode + 1], [-i, -i], color='gray', lw=1)
            ax.text(-0.4, -i, f'{i}', va='center')
        col_count = {}
        for (a, b), angles in self.dic_mzi.items():
            for k in range(len(angles)):
                col = col_count.get((a, b), 0)
                x = 1 + 2 * col + (a % 2)
                ax.plot([x, x + 1], [-a, -b], color=self.color, lw=2)
                ax.plot([x, x + 1], [-b, -a], color=self.color, lw=2)
                col_count[(a, b)] = col + 1
        ax.axis('off')
        if filename:
            fig.savefig(filename, bbox_inches='tight')
        return fig
