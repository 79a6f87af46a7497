"""Qubit Kraus channels (density-matrix only).

Pure-function Kraus sets matching reference src/deepquantum/channel.py. All
channels use the sin^2(theta) probability parametrization of the reference
(operation.py:560-563): the stored parameter is theta, prob = sin(theta)^2.
Each function maps the packed parameter vector to a stacked (K, 2, 2) complex
array; application is a vmapped evolve_den_mat sum in the circuit engine.
"""

from __future__ import annotations

import jax.numpy as jnp

from .config import cdtype
from .ops import gates as G

__all__ = ['CHANNEL_REGISTRY', 'channel_prob']


def _probs(theta):
    return jnp.sin(theta) ** 2


def bit_flip_kraus(p):
    prob = _probs(p[0])
    return jnp.stack([
        jnp.sqrt(1 - prob).astype(cdtype()) * G.identity_matrix(),
        jnp.sqrt(prob).astype(cdtype()) * G.paulix_matrix(),
    ])


def phase_flip_kraus(p):
    prob = _probs(p[0])
    return jnp.stack([
        jnp.sqrt(1 - prob).astype(cdtype()) * G.identity_matrix(),
        jnp.sqrt(prob).astype(cdtype()) * G.pauliz_matrix(),
    ])


def depolarizing_kraus(p):
    prob = _probs(p[0])
    return jnp.stack([
        jnp.sqrt(1 - prob).astype(cdtype()) * G.identity_matrix(),
        jnp.sqrt(prob / 3).astype(cdtype()) * G.paulix_matrix(),
        jnp.sqrt(prob / 3).astype(cdtype()) * G.pauliy_matrix(),
        jnp.sqrt(prob / 3).astype(cdtype()) * G.pauliz_matrix(),
    ])


def pauli_kraus(p):
    prob = _probs(p)
    prob = prob / prob.sum()
    return jnp.stack([
        jnp.sqrt(prob[0]).astype(cdtype()) * G.identity_matrix(),
        jnp.sqrt(prob[1]).astype(cdtype()) * G.paulix_matrix(),
        jnp.sqrt(prob[2]).astype(cdtype()) * G.pauliy_matrix(),
        jnp.sqrt(prob[3]).astype(cdtype()) * G.pauliz_matrix(),
    ])


def amplitude_damping_kraus(p):
    prob = _probs(p[0])
    z = jnp.zeros((), prob.dtype)
    o = jnp.ones((), prob.dtype)
    k0 = jnp.stack([o, z, z, jnp.sqrt(1 - prob)]).reshape(2, 2).astype(cdtype())
    k1 = jnp.stack([z, jnp.sqrt(prob), z, z]).reshape(2, 2).astype(cdtype())
    return jnp.stack([k0, k1])


def phase_damping_kraus(p):
    prob = _probs(p[0])
    z = jnp.zeros((), prob.dtype)
    o = jnp.ones((), prob.dtype)
    k0 = jnp.stack([o, z, z, jnp.sqrt(1 - prob)]).reshape(2, 2).astype(cdtype())
    k1 = jnp.stack([z, z, z, jnp.sqrt(prob)]).reshape(2, 2).astype(cdtype())
    return jnp.stack([k0, k1])


def generalized_amplitude_damping_kraus(p):
    prob = _probs(p)
    pr, gamma = prob[0], prob[1]
    z = jnp.zeros((), pr.dtype)
    o = jnp.ones((), pr.dtype)
    k0 = jnp.sqrt(pr) * jnp.stack([o, z, z, jnp.sqrt(1 - gamma)]).reshape(2, 2)
    k1 = jnp.sqrt(pr) * jnp.stack([z, jnp.sqrt(gamma), z, z]).reshape(2, 2)
    k2 = jnp.sqrt(1 - pr) * jnp.stack([jnp.sqrt(1 - gamma), z, z, o]).reshape(2, 2)
    k3 = jnp.sqrt(1 - pr) * jnp.stack([z, z, jnp.sqrt(gamma), z]).reshape(2, 2)
    return jnp.stack([k0, k1, k2, k3]).astype(cdtype())


CHANNEL_REGISTRY = {
    'BitFlip': dict(npara=1, fn=bit_flip_kraus),
    'PhaseFlip': dict(npara=1, fn=phase_flip_kraus),
    'Depolarizing': dict(npara=1, fn=depolarizing_kraus),
    'Pauli': dict(npara=4, fn=pauli_kraus),
    'AmplitudeDamping': dict(npara=1, fn=amplitude_damping_kraus),
    'PhaseDamping': dict(npara=1, fn=phase_damping_kraus),
    'GeneralizedAmplitudeDamping': dict(npara=2, fn=generalized_amplitude_damping_kraus),
}


def channel_prob(name: str, theta) -> jnp.ndarray:
    """Error probability from the sin^2 parametrization."""
    theta = jnp.asarray(theta)
    prob = jnp.sin(theta) ** 2
    if name == 'Pauli':
        return prob / prob.sum()
    return prob
