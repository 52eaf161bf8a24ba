"""Print per-corner screen coords of a few active triangles on TPU, with
default vs highest matmul precision in project_corners."""
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
from impact_tpu.render import raster as rasterlib  # noqa: E402

name = os.environ.get("SCENE", "ShadowCubeMapping")
rt = build_runtime(name, backend="xla")
sim = rt.sim
rc = rt.render_config
cam = rt.params.camera
h, w = rc.height, rc.width

scene = rt._scene_of(sim)


def project(tri_pos9, vp, precision):
    cols = []
    for c in range(3):
        p = tri_pos9[:, 3 * c : 3 * c + 3]
        cols.append(
            jnp.matmul(p, vp[:, :3].T, precision=precision) + vp[None, :, 3]
        )
    return jnp.stack(cols, axis=1)


@jax.jit
def probe(scene):
    vm = view_matrix(cam)
    pm = projection_matrix(cam, w, h, None, orthographic=rc.orthographic)
    vp = pm @ vm
    out = {}
    for label, prec in (("default", None), ("highest", jax.lax.Precision.HIGHEST)):
        clip = project(scene.tri_pos, vp, prec)
        sx, sy, z, valid = rasterlib._screen_coords(clip, h, w)
        area = rasterlib._edge(
            sx[:, 0], sy[:, 0], sx[:, 1], sy[:, 1], sx[:, 2], sy[:, 2]
        )
        out[f"{label}_sx"] = sx
        out[f"{label}_sy"] = sy
        out[f"{label}_area"] = area
    return out


out = {k: np.asarray(v) for k, v in probe(scene).items()}
act = np.asarray(scene.tri_active)
ids = np.nonzero(act)[0][:5]
for label in ("default", "highest"):
    area = out[f"{label}_area"]
    nz = int((np.abs(area[act]) > 1e-12).sum())
    print(f"[black5] {label}: nonzero-area actives = {nz}/{act.sum()}", flush=True)
    for i in ids:
        print(
            f"[black5]   tri {i}: sx={out[f'{label}_sx'][i]} sy={out[f'{label}_sy'][i]}"
            f" area={area[i]:.6g}",
            flush=True,
        )
