"""Where do the ~27 ms of geometry_pass OUTSIDE rasterize_attributes_pos go?

Times: (a) cull+attr-pack prologue, (b) G-buffer unpack + motion tail,
(c) full geometry_pass, (d) standalone raster — at bench conditions.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf.reshape(-1)[:1]))


def timeit(name, fn, *args, n=20):
    f = jax.jit(fn)
    _fetch(f(*args))
    t0 = time.perf_counter()
    for _ in range(5):
        _fetch(jnp.ones((4,)))
    fc = (time.perf_counter() - t0) / 5
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    _fetch(out)
    dt = max(time.perf_counter() - t0 - fc, 0.0) / n * 1e3
    print(f"[go] {name:52s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    from impact_tpu.ecs import components as C
    from impact_tpu.models import voxel_box_tumbler
    from impact_tpu.runtime import HeadlessRuntime, compile_scene
    from impact_tpu.render import pipeline as pl
    from impact_tpu.render import raster_pallas as rp
    from impact_tpu.render.camera import projection_matrix, view_matrix
    from impact_tpu.utils.config import EngineConfig

    H, W = 1080, 1920
    n_objects = 64
    cfg = EngineConfig()
    cfg.tpu.max_voxel_objects = n_objects
    cfg.tpu.max_bodies = n_objects + 16
    cfg.tpu.max_contacts = 1024
    cfg.tpu.voxel_grid_size = 32
    cfg.tpu.render_width = W
    cfg.tpu.render_height = H
    cfg.tpu.solver_mode = "jacobi"
    cfg.tpu.render_tris_per_object = 4096
    cfg.tpu.max_render_triangles = n_objects * 4096 + 64
    cfg.tpu.sdf_encoding = "i8"

    world = voxel_box_tumbler(n_boxes=n_objects - 2, seed=3)
    for eid in world.entities_with(C.VoxelBox):
        world.set_field(eid, C.VoxelBox, "extent_x", 26.0)
        world.set_field(eid, C.VoxelBox, "extent_y", 26.0)
        world.set_field(eid, C.VoxelBox, "extent_z", 26.0)
    t0 = time.perf_counter()
    build = compile_scene(world, cfg)
    print(f"[go] compile_scene {time.perf_counter() - t0:.0f}s", flush=True)
    rt = HeadlessRuntime(build, cfg, enable_fracturing=False)
    rt.step(2)
    sim = rt.sim

    scene = jax.jit(rt._scene_of)(sim)
    jax.block_until_ready(scene)
    rcfg = rt.render_config
    cam = rt.params.camera

    timeit("full _geometry", lambda s: rt._geometry(s, sim.render.frame_index),
           scene)

    vm = view_matrix(cam)
    pm = projection_matrix(cam, W, H, 0)
    vp = pm @ vm

    def front(s):
        sc = pl.cull_scene_to_frustum(s, vp)

        def corner_attrs(c):
            return jnp.concatenate(
                [
                    sc.tri_pos[:, 3 * c : 3 * c + 3],
                    sc.tri_pos_prev[:, 3 * c : 3 * c + 3],
                    sc.tri_normal[:, 3 * c : 3 * c + 3],
                    sc.tri_albedo[:, 3 * c : 3 * c + 3],
                    sc.tri_f0[:, 3 * c : 3 * c + 3],
                    sc.tri_roughness[:, c : c + 1],
                    sc.tri_emissive[:, 3 * c : 3 * c + 3],
                    sc.tri_material[:, c : c + 1].astype(jnp.float32),
                ],
                axis=-1,
            )

        return (
            jnp.concatenate([corner_attrs(c) for c in range(3)], axis=-1),
            sc.tri_pos, sc.tri_active,
        )

    timeit("front: cull + attr pack", front, scene)

    packed, tri_pos, tri_active = jax.jit(front)(scene)
    jax.block_until_ready((packed, tri_pos, tri_active))

    def raster(tp, ta, pk):
        return rp.rasterize_attributes_pos(
            tp, ta, pk, vp, H, W, tile=32, k_per_range=256, return_drops=True
        )

    timeit("raster standalone", raster, tri_pos, tri_active, packed)

    out, near, valid, _ = jax.jit(raster)(tri_pos, tri_active, packed)
    jax.block_until_ready((out, near, valid))

    def tail(o, nr, v):
        world_pos = o[..., 0:3]
        world_pos_prev = o[..., 3:6]
        normal = o[..., 6:9]
        normal = normal / jnp.maximum(
            jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-9
        )
        material = jnp.round(nr[..., 19]).astype(jnp.int32)
        material = jnp.where(v, material, -1)
        vp_prev = vp
        vp_cur = vp

        def ndc_xy(wp, m):
            x, y, z = wp[..., 0], wp[..., 1], wp[..., 2]
            cx = m[0, 0] * x + m[0, 1] * y + m[0, 2] * z + m[0, 3]
            cy = m[1, 0] * x + m[1, 1] * y + m[1, 2] * z + m[1, 3]
            cw = m[3, 0] * x + m[3, 1] * y + m[3, 2] * z + m[3, 3]
            iw = 1.0 / jnp.maximum(cw, 1e-8)
            return cx * iw, cy * iw

        px_prev, py_prev = ndc_xy(world_pos_prev, vp_prev)
        px_cur, py_cur = ndc_xy(world_pos, vp_cur)
        motion = jnp.stack(
            [(px_prev - px_cur) * 0.5, (py_prev - py_cur) * -0.5], axis=-1
        )
        motion = jnp.where(v[..., None], motion, 0.0)
        rough = o[..., 15] * o[..., 15]
        return world_pos, normal, motion, material, rough

    timeit("tail: unpack + motion", tail, out, near, valid)


if __name__ == "__main__":
    main()
