"""Photonic utilities (reference src/deepquantum/photonic/utils.py)."""

from __future__ import annotations

import pickle

from ..config import set_hbar, set_kappa  # noqa: F401 — re-export (reference utils.py:13-21)

__all__ = ['set_hbar', 'set_kappa', 'save_sample', 'load_sample', 'mem_to_chunksize',
           'set_perm_chunksize']

_PERM_CHUNKSIZE = {}


def save_sample(sample: dict, filename: str) -> None:
    """Persist measurement samples (reference photonic/utils.py:23)."""
    with open(filename, 'wb') as f:
        pickle.dump({repr(k): v for k, v in sample.items()}, f)


def load_sample(filename: str) -> dict:
    """Load measurement samples (reference photonic/utils.py:36)."""
    with open(filename, 'rb') as f:
        return pickle.load(f)


def mem_to_chunksize(device: str = 'tpu', dtype=None) -> int:
    """Subset-chunk size for the Ryser permanent (reference photonic/utils.py:49).

    On TPU the chunk is HBM-resident and scanned, so a fixed 2^16 default
    saturates the MXU; override with set_perm_chunksize.
    """
    return _PERM_CHUNKSIZE.get((device, dtype), 1 << 16)


def set_perm_chunksize(device: str, dtype, size: int) -> None:
    """Override the permanent chunk size (reference photonic/utils.py:98)."""
    _PERM_CHUNKSIZE[(device, dtype)] = size
