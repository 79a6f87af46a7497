"""Transfer-safe host<->device conversion.

Some TPU attachment paths (e.g. the axon remote tunnel) do not implement
host<->device transfers of complex dtypes, while complex compute on device is
fully supported. These helpers split complex arrays into real/imag pairs at
the boundary, so the framework never ships a complex buffer across the wire.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['to_device', 'to_numpy', 'normalize_layout']


def normalize_layout(x):
    """Re-materialize a device array with the default row-major layout.

    Linalg custom-calls (QR/SVD) can leave outputs in layouts that make every
    downstream jit dispatch recompile pathologically (minutes on remote AOT
    backends). A device_put with an explicit default Layout restores the fast
    path; on CPU it is a no-op copy.
    """
    if isinstance(x, jax.Array) and not isinstance(x, np.ndarray):
        try:
            from jax.experimental.layout import Format, Layout
            return jax.device_put(x, Format(Layout(tuple(range(x.ndim))), x.sharding))
        except Exception:  # noqa: BLE001 — layout API absent: keep as-is
            return x
    return x


@jax.jit
def _combine(re, im):
    return re + 1j * im


def to_device(x) -> jax.Array:
    """Move a host array to device; complex goes as two real transfers."""
    if isinstance(x, jax.Array) and not isinstance(x, np.ndarray):
        return x
    x = np.asarray(x)
    if np.issubdtype(x.dtype, np.complexfloating):
        re = np.ascontiguousarray(x.real)
        im = np.ascontiguousarray(x.imag)
        return _combine(re, im)
    return jnp.asarray(x)


def to_numpy(x) -> np.ndarray:
    """Read a device array back to host; complex comes as two real reads."""
    if isinstance(x, np.ndarray):
        return x
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        return np.asarray(jnp.real(x)) + 1j * np.asarray(jnp.imag(x))
    return np.asarray(x)
