"""Checkpointing: save/load circuit parameters.

The reference inherits torch state_dict (reference SURVEY: checkpoint via
nn.Module buffers); here parameters are one flat vector, saved as npz (or via
orbax for sharded training states).
"""

from __future__ import annotations

import numpy as np

__all__ = ['save_params', 'load_params']


def save_params(cir, filename: str) -> None:
    """Save a circuit's full parameter state."""
    np.savez(filename,
             pvals=np.asarray(cir._pvals, np.float64),
             train_mask=np.asarray(cir._train_mask, bool),
             enc_pidx=np.asarray(cir._enc_pidx, np.int64))


def load_params(cir, filename: str) -> None:
    """Restore a circuit's parameter state (structure must match)."""
    data = np.load(filename)
    assert len(data['pvals']) == len(cir._pvals), 'parameter count mismatch'
    cir._pvals = [float(v) for v in data['pvals']]
    cir._train_mask = [bool(v) for v in data['train_mask']]
    cir._cache.clear()
