"""Photonic channels: photon loss (reference src/deepquantum/photonic/channel.py).

PhotonLoss couples the target mode to a vacuum ancilla through a BS:
a_out = sqrt(T) a_in + sqrt(1-T) b_vac, parameterized by theta with
T = cos^2(theta/2). Gaussian states use the X/Y CPTP update
(arXiv:quant-ph/0503237 Eq.4.19-4.20); Fock density matrices use the Kraus
set from the BS Fock tensor sliced at the vacuum ancilla input.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import config
from ..config import cdtype, rdtype
from . import gates as PG

__all__ = ['loss_xy', 'loss_kraus', 'transmittance_to_theta']


def transmittance_to_theta(t) -> float:
    """T = cos^2(theta/2) -> theta."""
    return float(2 * np.arccos(np.sqrt(t)))


def loss_xy(p):
    """Single-mode X, Y matrices in xxpp for loss theta=p[0] (reference channel.py:80)."""
    theta = jnp.asarray(p[0], rdtype())
    cos = jnp.cos(theta / 2)
    x = jnp.eye(2, dtype=rdtype()) * cos
    sigma_h = jnp.eye(2, dtype=rdtype()) * config.HBAR / (4 * config.KAPPA ** 2)
    y = (jnp.eye(2, dtype=rdtype()) - jnp.eye(2, dtype=rdtype()) * cos ** 2) @ sigma_h
    return x, y


def loss_kraus(p, cutoff: int):
    """Kraus operators on Fock density matrices (reference channel.py:66, arXiv:1012.4266 Eq.2.4)."""
    theta = jnp.asarray(p[0], rdtype())
    u = PG.bs_single_unitary(jnp.stack([theta]), 'h')
    t4 = PG.bs_fock_from_unitary(u, cutoff)   # (m_out1, k_out2, n_in1, 0_in2)
    kraus = t4[..., 0]                         # (m, k, n): ancilla input = vacuum
    return jnp.transpose(kraus, (1, 0, 2))     # (k, m, n): Kraus index first
