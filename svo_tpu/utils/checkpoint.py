"""Checkpoint / resume for the VO pipeline state.

The reference has no persistence at all — poses, map and trajectory exist
only in memory and die with the process (SURVEY.md §5: "no output files
anywhere"); start_frame only skips input frames without restoring state.
Here the full device-resident VoState (features, map, observation ring,
trajectory, RNG) serializes to one .npz, so a run can resume mid-sequence
with identical downstream behavior, and crashed distributed jobs can restart
from the last consistent frame.
"""

from __future__ import annotations

import jax
import numpy as np


def save_state(path: str, state) -> None:
    """Serialize a VoState pytree to an .npz archive."""
    leaves = jax.tree.leaves(state)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    np.savez_compressed(path, **arrays)


def load_state(path: str, example_state):
    """Restore a VoState saved by save_state. `example_state` supplies the
    pytree structure (build it with the same Config via the bootstrap or
    __graft_entry__._example_state)."""
    data = np.load(path)
    leaves, treedef = jax.tree.flatten(example_state)
    restored = []
    for i, ex in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        if arr.shape != ex.shape:
            raise ValueError(
                f"checkpoint leaf {i} shape {arr.shape} != expected {ex.shape}; "
                "was the Config (capacities/image size) changed?"
            )
        restored.append(jax.numpy.asarray(arr, dtype=ex.dtype))
    return jax.tree.unflatten(treedef, restored)
