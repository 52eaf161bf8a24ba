"""Bisect inside the XLA tiled raster on TPU: where does coverage vanish?"""
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
from impact_tpu.render.pipeline import project_corners  # noqa: E402

name = os.environ.get("SCENE", "ShadowCubeMapping")
rt = build_runtime(name, backend="xla")
sim = rt.sim
rc = rt.render_config
cam = rt.params.camera
h, w = rc.height, rc.width

scene = rt._scene_of(sim)


@jax.jit
def probe(scene):
    vm = view_matrix(cam)
    pm = projection_matrix(cam, w, h, None, orthographic=rc.orthographic)
    vp = pm @ vm
    clip_pos = project_corners(scene.tri_pos, vp)
    clip2, bary2, act2 = rasterlib.clip_triangles_near(clip_pos, scene.tri_active)
    sx, sy, z, valid = rasterlib._screen_coords(clip2, h, w)
    act = act2 & jnp.all(valid, axis=-1)
    area = rasterlib._edge(sx[:, 0], sy[:, 0], sx[:, 1], sy[:, 1], sx[:, 2], sy[:, 2])
    act_bf = act & (area < -1e-12)
    xmin = jnp.min(sx, axis=-1)
    xmax = jnp.max(sx, axis=-1)
    ymin = jnp.min(sy, axis=-1)
    ymax = jnp.max(sy, axis=-1)
    on_screen = (xmax >= 0) & (xmin < w) & (ymax >= 0) & (ymin < h)
    act_os = act_bf & on_screen
    target = rasterlib._rasterize_clipped_tiled(clip2, act2, h, w)
    return dict(
        n_act2=jnp.sum(act2), n_valid=jnp.sum(act), n_bf=jnp.sum(act_bf),
        n_os=jnp.sum(act_os), area_min=jnp.min(jnp.where(act, area, 0.0)),
        area_max=jnp.max(jnp.where(act, area, 0.0)),
        sx_rng=jnp.stack([jnp.min(jnp.where(act[:, None], sx, 0.0)),
                          jnp.max(jnp.where(act[:, None], sx, 0.0))]),
        sy_rng=jnp.stack([jnp.min(jnp.where(act[:, None], sy, 0.0)),
                          jnp.max(jnp.where(act[:, None], sy, 0.0))]),
        z_rng=jnp.stack([jnp.min(jnp.where(act[:, None], z, 1.0)),
                         jnp.max(jnp.where(act[:, None], z, 0.0))]),
        n_covered=jnp.sum(target.tri_id >= 0),
        depth_min=jnp.min(target.depth),
    )


out = {k: np.asarray(v) for k, v in probe(scene).items()}
for k, v in out.items():
    print(f"[black4] {k} = {v}", flush=True)
