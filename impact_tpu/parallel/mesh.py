"""Device meshes and state sharding.

The scaling recipe (SURVEY.md §5, §7.1 step 7): pick a mesh, annotate
shardings on the state pytree, let XLA insert collectives.

Axes:
  * ``objects`` — data-parallel over the voxel-object pool (and its bodies):
    grids, meshes, and probes shard along the pool axis; the all-pairs
    narrow phase becomes an all-gather + local pair block, which rides ICI.
  * ``space``  — spatial decomposition of the voxel grids along x: stencil
    ops (surface nets, CCL propagation, absorption) read 1-voxel halos that
    XLA materializes as collective-permutes (see halo.py for the explicit
    Pallas-ready variant).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_device_mesh(n_objects_axis: int | None = None, n_space_axis: int = 1, devices=None):
    """Build a 2D ('objects', 'space') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_objects_axis is None:
        n_objects_axis = n // n_space_axis
    assert n_objects_axis * n_space_axis == n, (n_objects_axis, n_space_axis, n)
    arr = np.asarray(devices).reshape(n_objects_axis, n_space_axis)
    return Mesh(arr, ("objects", "space"))


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree across the mesh."""
    s = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def sim_state_shardings(mesh: Mesh, sim):
    """Sharding pytree for a SimState: voxel pools shard over 'objects' (and
    grid-x over 'space'); bodies/render state replicate (they are small and
    touched by cross-object reductions every step)."""
    rep = NamedSharding(mesh, P())

    def spec_for_path(path, leaf):
        name = "/".join(str(p) for p in path)
        if "voxels/sdf" in name or "voxels/vtype" in name:
            return NamedSharding(mesh, P("objects", "space"))
        if name.startswith("voxels/") and getattr(leaf, "ndim", 0) >= 1:
            return NamedSharding(mesh, P("objects"))
        if name.startswith("meshes/") or name.startswith("probes/"):
            return NamedSharding(mesh, P("objects"))
        return rep

    import jax.tree_util as jtu

    paths = jtu.tree_flatten_with_path(sim)[0]

    def norm(kp):
        out = []
        for k in kp:
            if hasattr(k, "name"):
                out.append(k.name)
            elif hasattr(k, "idx"):
                out.append(str(k.idx))
            else:
                out.append(str(k))
        return out

    flat = [spec_for_path(norm(kp), leaf) for kp, leaf in paths]
    treedef = jtu.tree_structure(sim)
    return jtu.tree_unflatten(treedef, flat)


def shard_sim_state(mesh: Mesh, sim):
    """Place a SimState on the mesh with the standard shardings."""
    shardings = sim_state_shardings(mesh, sim)
    return jax.tree.map(jax.device_put, sim, shardings)
