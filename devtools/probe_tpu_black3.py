"""Bisect the all-black TPU frame upstream of the raster: is the frustum
cull (shared by both backends) killing every triangle on TPU?"""
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
from impact_tpu.render.camera import projection_matrix, view_matrix  # noqa: E402
from impact_tpu.render.pipeline import (  # noqa: E402
    cull_scene_to_frustum,
    project_corners,
    triangle_bounding_spheres,
)
from impact_tpu.geometry.frustum import (  # noqa: E402
    frustum_planes_from_view_proj,
    sphere_inside_frustum,
)

name = os.environ.get("SCENE", "ShadowCubeMapping")
rt = build_runtime(name, backend="xla")
sim = rt.sim
rc = rt.render_config
cam = rt.params.camera

print(f"[black3] platform={jax.devices()[0].platform}", flush=True)

scene = rt._scene_of(sim)
n0 = int(np.asarray(jnp.sum(scene.tri_active)))
print(f"[black3] active before cull: {n0}", flush=True)

h, w = rc.height, rc.width
fi = sim.render.frame_index
jitter = fi if rc.taa_enabled else None


@jax.jit
def probe(scene, fi):
    vm = view_matrix(cam)
    pm = projection_matrix(cam, w, h, fi if rc.taa_enabled else None,
                           orthographic=rc.orthographic)
    vp = pm @ vm
    normals, disp = frustum_planes_from_view_proj(vp)
    center, rad = triangle_bounding_spheres(scene.tri_pos)
    vis = sphere_inside_frustum(normals, disp, center, rad)
    clip = project_corners(scene.tri_pos, vp)
    return vm, pm, vp, normals, disp, vis, scene.tri_active & vis, clip


vm, pm, vp, normals, disp, vis, act, clip = probe(scene, fi)
print(f"[black3] vm=\n{np.asarray(vm)}", flush=True)
print(f"[black3] pm=\n{np.asarray(pm)}", flush=True)
print(f"[black3] vp=\n{np.asarray(vp)}", flush=True)
print(f"[black3] normals=\n{np.asarray(normals)}", flush=True)
print(f"[black3] disp={np.asarray(disp)}", flush=True)
print(f"[black3] vis sum = {int(np.asarray(jnp.sum(vis)))}", flush=True)
print(f"[black3] active after cull = {int(np.asarray(jnp.sum(act)))}", flush=True)
c = np.asarray(clip)
a = np.asarray(scene.tri_active)
print(f"[black3] clip w range (active): "
      f"{c[a][..., 3].min():.4g}..{c[a][..., 3].max():.4g}", flush=True)
print(f"[black3] clip z/w range (active): "
      f"{(c[a][..., 2] / np.maximum(c[a][..., 3], 1e-9)).min():.4g}.."
      f"{(c[a][..., 2] / np.maximum(c[a][..., 3], 1e-9)).max():.4g}", flush=True)
