"""Checkpoint/resume — the OpenFOAM Time-driven field I/O equivalent.

The reference checkpoints by writing every AUTO_WRITE field at
`runTime.write()` on the controlDict schedule and resumes from the
`latestTime` directory because prognostic fields are MUST_READ at
construction (QGDFoam_8C_source.html:158; SURVEY.md §5).  Here a checkpoint
is the full solver-state pytree (prognostic fields + t + dt, exactly the
resume contract) written as an .npz per step directory; `restore_latest`
reproduces the resume-from-latestTime semantics.
"""
from __future__ import annotations

import json
import os
import re

import numpy as np
import jax


def save(state, directory: str, step: int) -> str:
    """Write state pytree to `directory/step_<n>.npz` (atomic rename)."""
    os.makedirs(directory, exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(state)
    path = os.path.join(directory, f"step_{step:012d}.npz")
    tmp = path + ".tmp"
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)
    # sidecar with metadata (structure is supplied by the caller on restore,
    # like OpenFOAM's createFields re-constructing fields before reading)
    meta = {"step": step, "n_leaves": len(leaves)}
    with open(os.path.join(directory, f"step_{step:012d}.json"), "w") as f:
        json.dump(meta, f)
    return path


def latest_step(directory: str):
    """Largest checkpointed step number, or None."""
    if not os.path.isdir(directory):
        return None
    steps = [
        int(m.group(1))
        for fn in os.listdir(directory)
        if (m := re.match(r"step_(\d+)\.npz$", fn))
    ]
    return max(steps) if steps else None


def restore(template_state, directory: str, step: int):
    """Load the checkpoint at `step` into the structure of template_state."""
    leaves, treedef = jax.tree_util.tree_flatten(template_state)
    path = os.path.join(directory, f"step_{step:012d}.npz")
    data = np.load(path)
    new_leaves = [
        jax.numpy.asarray(data[f"leaf_{i}"]) for i in range(len(leaves))
    ]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def restore_latest(template_state, directory: str):
    """Resume-from-latestTime: (state, step) or (template_state, None)."""
    step = latest_step(directory)
    if step is None:
        return template_state, None
    return restore(template_state, directory, step), step
