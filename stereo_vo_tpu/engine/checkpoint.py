"""Checkpoint / resume.

The reference loses all state on a crash (SURVEY.md §5 "Checkpoint / resume"):
window, landmark table and tracker live only in process memory
(``bundle_adjuster.hpp:134-149``). Here the whole VO state is one pytree, so a
checkpoint is a flat ``np.savez`` of its leaves; resume restores the pytree and
continues replay at the saved frame index.
"""

from __future__ import annotations

from typing import Tuple

import jax
import numpy as np


def save_state(path: str, state, next_frame_index: int) -> None:
    leaves = jax.tree.leaves(state)
    np.savez(
        path,
        __next_frame__=np.asarray(next_frame_index),
        **{f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)},
    )


def load_state(path: str, engine) -> Tuple[object, int]:
    """Returns ``(state, next_frame_index)``; the engine provides the pytree
    structure (shapes must match the engine's config/camera geometry)."""
    data = np.load(path)
    template = engine.init_state()
    treedef = jax.tree.structure(template)
    t_leaves = jax.tree.leaves(template)
    leaves = []
    for i, tmpl in enumerate(t_leaves):
        arr = data[f"leaf_{i}"]
        if tuple(arr.shape) != tuple(tmpl.shape):
            raise ValueError(
                f"checkpoint leaf {i} shape {arr.shape} != engine state {tmpl.shape}"
            )
        leaves.append(jax.numpy.asarray(arr, tmpl.dtype))
    state = jax.tree.unflatten(treedef, leaves)
    return state, int(data["__next_frame__"])
