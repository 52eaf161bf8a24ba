"""Bisect INSIDE shade and post within the fused frame: shadow-map rasters
vs PCF lookups vs AO vs BRDF, and TAA vs bloom vs exposure/tonemap."""

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
    print(f"[sb] compile_scene {time.perf_counter() - t0:.0f}s", flush=True)
    rt = HeadlessRuntime(build, cfg, enable_fracturing=False)
    params = rt.params
    step_fn = make_engine_step(
        params, cfg, rt.info["mesh_vert_cap"], rt.info["mesh_tri_cap"],
        enable_fracturing=False,
    )

    def make_frame(rc_over=None, shadow_mode="full"):
        rc = render_config_from_engine_config(cfg)
        if rc_over:
            rc = rc._replace(**rc_over)
        lights = params.lights

        def frame(sim, tex):
            sim = step_fn(sim, params)
            scene = build_render_scene(
                sim.voxels, sim.meshes,
                sim.phys.bodies.position, sim.phys.bodies.orientation,
                sim.prev_position, sim.prev_orientation,
                params.static_geometry, params.mesh_instances,
                tris_per_object=cfg.tpu.render_tris_per_object,
            )
            scene = compact_scene_triangles(scene, rc.max_triangles)
            gb, _ = geometry_pass(
                scene, params.camera, params.camera, sim.render.frame_index,
                rc,
            )
            eps = 0.0
            if shadow_mode == "none":
                omni = uni = None
            else:
                omni, uni, _ = shadow_pass(scene, lights, params.camera, rc)
                if shadow_mode == "maps_only":
                    # keep the map rasters alive but skip all PCF lookups
                    eps = 1e-20 * (jnp.mean(omni[0]) + jnp.mean(uni[0]))
                    omni = uni = None
            lum = deferred_shade(
                gb, lights, params.camera, omni, uni, rc, tex
            ) + eps
            img, hdr, rstate = postprocess(lum, gb.motion, sim.render, rc)
            return img, sim._replace(render=rstate)

        return jax.jit(frame)

    variants = [
        ("full", None, "full"),
        ("maps rendered, PCF skipped", None, "maps_only"),
        ("no shadow maps at all", None, "none"),
        ("AO off", dict(ao_enabled=False), "full"),
        ("TAA off", dict(taa_enabled=False), "full"),
        ("bloom off", dict(bloom_enabled=False), "full"),
    ]
    for name, rc_over, sh in variants:
        f = make_frame(rc_over, sh)
        sim = rt.sim
        img, sim = f(sim, rt._textures)
        _fetch(img)
        n = 15
        t0 = time.perf_counter()
        for _ in range(n):
            img, sim = f(sim, rt._textures)
        _fetch(img)
        print(f"[sb] {name:38s} {(time.perf_counter()-t0)/n*1e3:8.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
