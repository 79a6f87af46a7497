"""Checkpointing.

Two levels (the reference gets torch ``state_dict()`` for free; SURVEY §5):

- ``save_params`` / ``load_params``: a circuit's flat host-side parameter
  state as npz — cheap, single-host.
- ``save_train_state`` / ``load_train_state``: a full training state pytree
  (params, optimizer state, step counters) through orbax — GSPMD-sharded
  arrays are written and restored distributed with their shardings intact,
  which is what a resumable 30-qubit sharded VQE run needs (BASELINE.md
  north star).
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ['save_params', 'load_params', 'save_train_state', 'load_train_state']


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


def save_train_state(path: str, state) -> None:
    """Write a training-state pytree (params, opt_state, step, ...) to an
    orbax checkpoint directory. Sharded arrays are saved distributed."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(str(path))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def load_train_state(path: str, like):
    """Restore a training-state pytree saved by ``save_train_state``.

    ``like`` is a pytree with the target structure — concrete arrays (their
    shardings are reused, so a mesh-sharded state restores sharded) or
    jax.ShapeDtypeStruct leaves.
    """
    import orbax.checkpoint as ocp
    path = os.path.abspath(str(path))
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, like)
