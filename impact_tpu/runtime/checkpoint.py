"""Simulation state checkpoint/resume.

The reference has no simulation-state checkpointing (SURVEY.md §5 — only
screenshots, drag-map caches, and world reset); with the state as one pytree
this is trivial and first-class here: the full SimState (bodies, voxel grids,
meshes, solver cache, render history, RNG) serializes to one compressed npz
and restores bit-exactly, giving deterministic resume (the elastic-recovery
primitive for long pod-scale runs).
"""

from __future__ import annotations

import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np


def _flatten_with_names(tree):
    import jax.tree_util as jtu

    flat = jtu.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in flat:
        key = "/".join(
            str(getattr(p, "name", getattr(p, "idx", getattr(p, "key", p))))
            for p in path
        )
        out[key] = np.asarray(leaf)
    assert len(out) == len(flat), (
        "pytree paths collide when stringified; checkpoint keys must be unique"
    )
    return out


def save_checkpoint(path, sim, metadata: dict | None = None):
    """Write SimState (or any pytree of arrays) to ``path`` (.npz)."""
    path = pathlib.Path(path)
    arrays = _flatten_with_names(sim)
    meta = json.dumps(metadata or {})
    np.savez_compressed(path, __metadata__=np.frombuffer(meta.encode(), np.uint8), **arrays)
    return path


def load_checkpoint(path, template):
    """Restore a pytree saved by :func:`save_checkpoint` into the structure of
    ``template`` (same shapes/dtypes required). Returns (pytree, metadata)."""
    import jax.tree_util as jtu

    with np.load(path) as data:
        meta = json.loads(bytes(data["__metadata__"]).decode()) if "__metadata__" in data else {}
        names = _flatten_with_names(template)
        leaves = []
        for key, tmpl in names.items():
            arr = data[key]
            assert arr.shape == tmpl.shape, (key, arr.shape, tmpl.shape)
            assert arr.dtype == tmpl.dtype, (key, arr.dtype, tmpl.dtype)
            leaves.append(jnp.asarray(arr))
    treedef = jtu.tree_structure(template)
    return jtu.tree_unflatten(treedef, leaves), meta
