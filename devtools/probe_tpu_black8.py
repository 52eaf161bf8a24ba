"""Is compact_scene_triangles (argsort gather) the corruption point on TPU?"""
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
from impact_tpu.scene.assembly import build_render_scene  # noqa: E402
from impact_tpu.render.pipeline import compact_scene_triangles  # noqa: E402

name = os.environ.get("SCENE", "ShadowCubeMapping")
rt = build_runtime(name, backend="xla")
sim = rt.sim
params = rt.params
rc = rt.render_config
cpu = jax.devices("cpu")[0]
tris_per_object = rt.config.tpu.render_tris_per_object


def raw_scene(sim):
    return build_render_scene(
        sim.voxels, sim.meshes,
        sim.phys.bodies.position, sim.phys.bodies.orientation,
        sim.prev_position, sim.prev_orientation,
        params.static_geometry, params.mesh_instances,
        tris_per_object=tris_per_object,
        voxel_texture_layers=rc.textured,
    )


def compacted(sim):
    return compact_scene_triangles(raw_scene(sim), rc.max_triangles)


for label, fn in (("raw", raw_scene), ("compacted", compacted)):
    dev = jax.jit(fn)(sim)
    with jax.default_device(cpu):
        host = jax.jit(fn)(jax.device_put(sim, cpu))
    d = np.abs(np.asarray(dev.tri_pos) - np.asarray(host.tri_pos))
    act_ok = np.array_equal(np.asarray(dev.tri_active), np.asarray(host.tri_active))
    print(f"[black8] {label}: shape={dev.tri_pos.shape} maxdiff={d.max():.6g} "
          f"badrows={(d.max(axis=1) > 1e-4).sum()} act_agree={act_ok}", flush=True)
