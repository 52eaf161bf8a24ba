"""Bisect the fused one-dispatch frame: compile variants with stages nulled
out and compare sustained times. Standalone stage timings are inflated by
output-buffer allocation through the tunnel; differences between fused
variants are the only clean in-context measurement."""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[:1])


def main():
    from impact_tpu.ecs import components as C
    from impact_tpu.models import voxel_box_tumbler
    from impact_tpu.runtime import HeadlessRuntime, compile_scene
    from impact_tpu.runtime.engine import make_engine_step
    from impact_tpu.runtime.setup import render_config_from_engine_config
    from impact_tpu.scene.assembly import build_render_scene
    from impact_tpu.render.pipeline import (
        compact_scene_triangles, deferred_shade, geometry_pass, postprocess,
        shadow_pass,
    )
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
    cfg.physics.simulator.initial_time_step_duration = 0.005
    cfg.rendering.shadow_mapping.omnidirectional_light_shadow_map_resolution = 512
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
    print(f"[bi] compile_scene {time.perf_counter() - t0:.0f}s", flush=True)
    rt = HeadlessRuntime(build, cfg, enable_fracturing=False)
    params = rt.params
    rc = render_config_from_engine_config(cfg)
    step_fn = make_engine_step(
        params, cfg, rt.info["mesh_vert_cap"], rt.info["mesh_tri_cap"],
        enable_fracturing=False,
    )
    tris_per_object = cfg.tpu.render_tris_per_object

    def make_frame(do_step, do_geom, do_shadows, do_shade, do_post):
        def frame(sim, tex):
            if do_step:
                sim = step_fn(sim, params)
            scene = build_render_scene(
                sim.voxels, sim.meshes,
                sim.phys.bodies.position, sim.phys.bodies.orientation,
                sim.prev_position, sim.prev_orientation,
                params.static_geometry, params.mesh_instances,
                tris_per_object=tris_per_object,
            )
            scene = compact_scene_triangles(scene, rc.max_triangles)
            if do_geom:
                gb, _ = geometry_pass(
                    scene, params.camera, params.camera,
                    sim.render.frame_index, rc,
                )
            else:
                h, w = rc.height, rc.width
                from impact_tpu.render.pipeline import GBuffer
                z3 = jnp.zeros((h, w, 3))
                gb = GBuffer(
                    world_pos=z3, normal=z3.at[..., 1].set(1.0), albedo=z3,
                    f0=z3, roughness=jnp.zeros((h, w)), emissive=z3,
                    material=jnp.full((h, w), -1, jnp.int32),
                    motion=jnp.zeros((h, w, 2)),
                    valid=jnp.ones((h, w), bool),
                )
            if do_shadows:
                omni, uni, _ = shadow_pass(scene, params.lights, params.camera, rc)
            else:
                omni = uni = None
            if do_shade:
                lum = deferred_shade(
                    gb, params.lights, params.camera, omni, uni, rc, tex
                )
            else:
                lum = gb.albedo + 1.0
            if do_post:
                img, hdr, rstate = postprocess(lum, gb.motion, sim.render, rc)
            else:
                img = (lum[..., :3] * 255).astype(jnp.uint8)
                rstate = sim.render
            return img, sim._replace(render=rstate)

        return jax.jit(frame)

    variants = [
        ("full frame", (True, True, True, True, True)),
        ("no shade (flat lum)", (True, True, True, False, True)),
        ("no post", (True, True, True, True, False)),
        ("no shadows+shade", (True, True, False, False, True)),
        ("no geometry (flat gb)", (True, False, True, True, True)),
        ("no step", (False, True, True, True, True)),
    ]
    for name, flags in variants:
        f = make_frame(*flags)
        sim = rt.sim
        img, sim2 = f(sim, rt._textures)
        _fetch(img)
        t0 = time.perf_counter()
        n = 15
        for _ in range(n):
            img, sim = f(sim, rt._textures)
        _fetch(img)
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"[bi] {name:32s} {dt:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
