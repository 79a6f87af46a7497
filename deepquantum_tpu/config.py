"""Global configuration for deepquantum_tpu.

TPU-native dtype policy: complex64 by default (maps to two float32 lanes on
the VPU/MXU), switchable to complex128 (requires ``jax.config.update('jax_enable_x64', True)``,
mainly for CPU-hosted oracle tests).

Replaces the reference's module-global ``dtype_map`` / ``apply_complex_fix``
machinery (reference: src/deepquantum/__init__.py:115-118, utils.py:45) with a
single explicit policy object.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Quantum amplitudes need true f32 matmuls everywhere: the MXU's default
# bf16 passes break unitarity at the 1e-3 level over ~100 gates (each small
# gate-matrix product contributes). This covers the fusion products, kron
# pre-multiplies, MPO contractions, and covariance folds uniformly.
jax.config.update('jax_default_matmul_precision', 'highest')

_COMPLEX = jnp.complex64
_REAL = jnp.float32

# Photonic conventions (reference: src/deepquantum/photonic/__init__.py:71-72)
HBAR = 2.0
KAPPA = 2 ** (-0.5)


def set_dtype(dtype) -> None:
    """Set the global complex dtype ('complex64' or 'complex128')."""
    global _COMPLEX, _REAL
    dtype = jnp.dtype(dtype)
    if dtype == jnp.complex64:
        _COMPLEX, _REAL = jnp.complex64, jnp.float32
    elif dtype == jnp.complex128:
        jax.config.update('jax_enable_x64', True)
        _COMPLEX, _REAL = jnp.complex128, jnp.float64
    else:
        raise ValueError(f'Unsupported complex dtype: {dtype}')


def cdtype():
    """Current complex dtype."""
    return _COMPLEX


def rdtype():
    """Current real dtype."""
    return _REAL


def set_hbar(hbar: float) -> None:
    """Set the global reduced Planck constant (reference: photonic/utils.py:13)."""
    global HBAR
    HBAR = hbar


def set_kappa(kappa: float) -> None:
    """Set the global kappa convention (reference: photonic/utils.py:18)."""
    global KAPPA
    KAPPA = kappa
