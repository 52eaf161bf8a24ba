"""Narrow the TPU scene-corruption: run static_geometry_corners and
_mesh_instance_corners standalone on TPU vs CPU with the real runtime data."""
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
    static_geometry_corners,
)

name = os.environ.get("SCENE", "ShadowCubeMapping")
rt = build_runtime(name, backend="xla")
sim = rt.sim
params = rt.params
cpu = jax.devices("cpu")[0]


def compare(label, fn, *args):
    dev = jax.jit(fn)(*args)
    with jax.default_device(cpu):
        host = jax.jit(fn)(*jax.device_put(args, cpu))
    d = np.abs(np.asarray(dev["tri_pos"]) - np.asarray(host["tri_pos"]))
    bad = (d.max(axis=1) > 1e-4).sum()
    print(f"[black7] {label}: tri_pos maxdiff={d.max():.6g} badrows={bad}",
          flush=True)
    return dev, host


if params.static_geometry.tri_active.shape[0] > 0:
    dev, host = compare("static_geometry", static_geometry_corners,
                        params.static_geometry)
    if np.abs(np.asarray(dev["tri_pos"]) - np.asarray(host["tri_pos"])).max() > 1e-4:
        print("[black7] sg.vert_pos =", np.asarray(params.static_geometry.vert_pos),
              flush=True)
        print("[black7] sg.tri_indices =",
              np.asarray(params.static_geometry.tri_indices), flush=True)
        print("[black7] dev rows:", np.asarray(dev["tri_pos"])[:4], flush=True)
        print("[black7] host rows:", np.asarray(host["tri_pos"])[:4], flush=True)

mi = params.mesh_instances
if mi is not None and mi.alive.shape[0] > 0:
    b = sim.phys.bodies
    compare(
        "mesh_instances", _mesh_instance_corners,
        mi, b.position, b.orientation, sim.prev_position, sim.prev_orientation,
    )
