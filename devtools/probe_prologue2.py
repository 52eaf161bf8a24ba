"""Ablate the Pallas raster prologue on the REAL bench scene: which of
clip / plane-coeffs / sort / big-argsort / blocking dominates the ~23 ms
per-shadow-view cost."""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp
import numpy as np

from impact_tpu.render import raster_pallas as rp
from impact_tpu.render.raster import clip_triangles_near


def readback(x):
    return float(
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0])).ravel()[0]
    )


def bench(name, fn, *args, n=10):
    f = jax.jit(fn)
    out = f(*args)
    readback(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [f(*args) for _ in range(n)]
        readback(outs[-1])
        ts.append((time.perf_counter() - t0) * 1e3 / n)
    print(f"[pro] {name:50s} {min(ts):8.2f} ms", flush=True)


def main():
    from impact_tpu.ecs import components as C
    from impact_tpu.models import voxel_box_tumbler
    from impact_tpu.runtime import HeadlessRuntime, compile_scene
    from impact_tpu.utils.config import EngineConfig

    n_objects = 64
    cfg = EngineConfig()
    cfg.tpu.max_voxel_objects = n_objects
    cfg.tpu.max_bodies = n_objects + 16
    cfg.tpu.max_contacts = 1024
    cfg.tpu.voxel_grid_size = 32
    cfg.tpu.render_width = 1920
    cfg.tpu.render_height = 1080
    cfg.tpu.solver_mode = "jacobi"
    cfg.rendering.shadow_mapping.omnidirectional_light_shadow_map_resolution = 512
    cfg.tpu.max_render_triangles = 1 << 19
    cfg.tpu.sdf_encoding = "i8"
    world = voxel_box_tumbler(n_boxes=n_objects - 2, seed=3)
    for eid in world.entities_with(C.VoxelBox):
        world.set_field(eid, C.VoxelBox, "extent_x", 26.0)
        world.set_field(eid, C.VoxelBox, "extent_y", 26.0)
        world.set_field(eid, C.VoxelBox, "extent_z", 26.0)
    build = compile_scene(world, cfg)
    rt = HeadlessRuntime(build, cfg, enable_fracturing=False)
    rt.step(2)
    scene = jax.block_until_ready(rt._scene_of(rt.sim))
    print("[pro] scene ready", flush=True)

    # one shadow view's clip positions
    from impact_tpu.render.lights import _look_view_matrix, CUBE_FACE_DIRS, CUBE_FACE_UPS
    from impact_tpu.geometry.projection import perspective_projection_matrix
    from impact_tpu.render.pipeline import project_corners

    light_pos = jnp.asarray([0.0, 30.0, 0.0])
    view = _look_view_matrix(
        light_pos, jnp.asarray(CUBE_FACE_DIRS[3]), jnp.asarray(CUBE_FACE_UPS[3])
    )
    proj = perspective_projection_matrix(1.0, jnp.pi / 2, 0.05, 100.0)
    vp = proj @ view
    tri_pos9 = scene.tri_pos
    act = scene.tri_active & scene.tri_shadow
    S = 512
    T = tri_pos9.shape[0]

    bench("project_corners only",
          lambda p: project_corners(p, vp), tri_pos9)

    def full_depth(p, a):
        clip = project_corners(p, vp)
        return rp.rasterize_depth(clip, a, S, S, cull_backfaces=False)

    bench("project + rasterize_depth 512²", full_depth, tri_pos9, act)

    def prologue(p, a):
        clip = project_corners(p, vp)
        clip2, _, act2 = clip_triangles_near(clip, a)
        return rp._bin(clip2, act2, S, S, 16, 256, 128, False, None, T)[:5]

    bench("prologue total", prologue, tri_pos9, act)

    def to_planes(p, a):
        clip = project_corners(p, vp)
        clip2, _, act2 = clip_triangles_near(clip, a)
        return rp._plane_coefficients(clip2, act2, S, S, False)

    bench("clip + plane_coefficients", to_planes, tri_pos9, act)

    def sort_only(p, a):
        clip = project_corners(p, vp)
        clip2, _, act2 = clip_triangles_near(clip, a)
        geom, act3, bbox, near_z = rp._plane_coefficients(clip2, act2, S, S, False)
        key = jnp.arange(T, dtype=jnp.int32)[::-1]
        return jax.lax.sort((key, *[g[:T] for g in geom]), num_keys=1)[0]

    bench("clip + planes + 13-op sort", sort_only, tri_pos9, act)

    def sort2_gather(p, a):
        clip = project_corners(p, vp)
        clip2, _, act2 = clip_triangles_near(clip, a)
        geom, act3, bbox, near_z = rp._plane_coefficients(clip2, act2, S, S, False)
        key = jnp.arange(T, dtype=jnp.int32)[::-1]
        key_s, order = jax.lax.sort(
            (key, jnp.arange(T, dtype=jnp.int32)), num_keys=1)
        payload = jnp.stack(geom, axis=-1)[:T][order].T
        return payload

    bench("clip + planes + 2-op sort + row gather", sort2_gather, tri_pos9, act)

    def big_argsort(p, a):
        clip = project_corners(p, vp)
        clip2, _, act2 = clip_triangles_near(clip, a)
        geom, act3, bbox, near_z = rp._plane_coefficients(clip2, act2, S, S, False)
        return jnp.argsort(near_z)[:128]

    bench("clip + planes + big argsort (T2)", big_argsort, tri_pos9, act)

    def big_topk(p, a):
        clip = project_corners(p, vp)
        clip2, _, act2 = clip_triangles_near(clip, a)
        geom, act3, bbox, near_z = rp._plane_coefficients(clip2, act2, S, S, False)
        _, idx = jax.lax.top_k(-near_z, 128)
        return idx

    bench("clip + planes + big top_k 128", big_topk, tri_pos9, act)

    # attribute-path pieces at 1080p
    H, W = 1080, 1920
    vpq = jnp.eye(4)

    def attr_full(scene_pos, a):
        from impact_tpu.render.pipeline import project_corners as pc
        clip = pc(scene_pos, vp)
        packed = jnp.concatenate(
            [scene.tri_albedo, scene.tri_f0, scene.tri_normal,
             scene.tri_emissive, scene.tri_pos, scene.tri_rough[:, 0:1],
             scene.tri_rough[:, 1:2], scene.tri_rough[:, 2:3],
             scene.tri_pos_prev], axis=-1)[:, :60]
        return rp.rasterize_attributes(
            clip, a, None, packed, H, W, corner_major=True)

    bench("attr: full raster 1080p (real scene)", attr_full, tri_pos9,
          scene.tri_active)


if __name__ == "__main__":
    main()
