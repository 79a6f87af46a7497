"""Time-domain multiplexing (reference src/deepquantum/photonic/tdm.py).

QumodeCircuitTDM evolves a delay-looped circuit over time steps with homodyne
feedback: each step runs the unrolled concurrent-mode circuit, measures the
spatial modes, feeds the post-measurement state back, and shifts the
delay-line modes.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from .circuit import QumodeCircuit

__all__ = ['QumodeCircuitTDM']


class QumodeCircuitTDM(QumodeCircuit):
    """TDM photonic circuit (reference tdm.py:10)."""

    def __init__(self, nmode: int, init_state: Any, cutoff: int | None = None,
                 backend: str = 'gaussian', name: str | None = None, noise: bool = False,
                 mu: float = 0, sigma: float = 0.1) -> None:
        assert backend in ('gaussian', 'bosonic')
        super().__init__(nmode=nmode, init_state=init_state, cutoff=cutoff, backend=backend,
                         basis=False, detector='pnrd', name=name, noise=noise, mu=mu, sigma=sigma)
        self.samples = None
        self.state_measured = None

    def __call__(self, data=None, state: Any = None, nstep: int | None = None):
        return self.forward(data, state, nstep)

    def forward(self, data=None, state: Any = None, nstep: int | None = None):
        """Evolve nstep time steps with homodyne feedback (reference tdm.py:58).

        data: (batch, ntimes, nfeat) or None. Returns the final measured state.
        """
        assert self._with_delay, 'No delay loop.'
        for i in range(self.nmode):
            assert i in self.wires_homodyne, 'Homodyne must cover all spatial modes'
        if data is None:
            nstep = nstep or 1
        else:
            data = jnp.asarray(data)
            if data.ndim == 2:
                data = data[None]
            assert data.ndim == 3
            if nstep is None:
                nstep = data.shape[1]
        self.state = state
        samples = []
        for i in range(nstep):
            if data is None:
                self.state = super().forward(state=self.state)
            else:
                # keep the batch axis through the forward (reference tdm.py:90)
                self.state = super().forward(data[:, i % data.shape[1], :], self.state)
            samples.append(self.measure_homodyne(shots=1))
            # the forward already shifted the delay lines; feed back the
            # post-measurement state directly (reference tdm.py:92)
            self.state = list(self.state_measured)
        self.samples = jnp.stack([jnp.atleast_1d(s) for s in samples], axis=-1)  # (batch, nwire, nstep) squeezed
        return self.state

    def get_samples(self, wires=None):
        """Measured samples on the given wires (reference tdm.py:97)."""
        if wires is None:
            wires = list(range(self.nmode))
        wires = sorted([wires] if isinstance(wires, int) else list(wires))
        return self.samples[..., wires, :] if self.samples.ndim > 1 else self.samples
