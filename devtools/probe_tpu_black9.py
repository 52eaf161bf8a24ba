"""Bisect inside build_render_scene on TPU: parts separate vs concatenated."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apps.parity_snapshots import build_runtime  # noqa: E402
from impact_tpu.scene.assembly import (  # noqa: E402
    _mesh_instance_corners,
    _rotate9,
)

name = os.environ.get("SCENE", "ShadowCubeMapping")
rt = build_runtime(name, backend="xla")
sim = rt.sim
params = rt.params
rc = rt.render_config
cpu = jax.devices("cpu")[0]
k = rt.config.tpu.render_tris_per_object


def parts_fn(sim):
    pool = sim.voxels
    meshes = sim.meshes
    mpos = meshes.tri_pos[:, :k] if 0 < k < meshes.tri_pos.shape[1] else meshes.tri_pos
    local9 = (
        mpos * pool.voxel_extent[:, None, None]
        + jnp.tile(pool.origin, (1, 3))[:, None, :]
    )
    q = sim.phys.bodies.orientation[pool.body_index][:, None, :]
    x = jnp.tile(sim.phys.bodies.position[pool.body_index], (1, 3))[:, None, :]
    world9 = _rotate9(q, local9) + x
    vox = world9.reshape(-1, 9)
    mi = _mesh_instance_corners(
        params.mesh_instances,
        sim.phys.bodies.position, sim.phys.bodies.orientation,
        sim.prev_position, sim.prev_orientation,
    )["tri_pos"]
    cat = jnp.concatenate([vox, mi])
    return vox, mi, cat


dev = jax.jit(parts_fn)(sim)
with jax.default_device(cpu):
    host = jax.jit(parts_fn)(jax.device_put(sim, cpu))
for label, a, b in zip(("vox", "mesh", "concat"), dev, host):
    d = np.abs(np.asarray(a) - np.asarray(b))
    print(f"[black9] {label}: shape={a.shape} maxdiff={d.max():.6g} "
          f"badrows={(d.max(axis=1) > 1e-4).sum()}", flush=True)
