"""Sustained frame timing at bench conditions + output-buffer effects:
donated step, fused render halves, single fused frame. The axon tunnel
streams jit OUTPUT buffers at ~1 ms/MB (devtools/probe_layout.py), so
dispatch outputs — not device compute — can dominate stage timings."""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf.reshape(-1)[:1]))


def main():
    from impact_tpu.ecs import components as C
    from impact_tpu.models import voxel_box_tumbler
    from impact_tpu.runtime import HeadlessRuntime, compile_scene
    from impact_tpu.utils.config import EngineConfig

    n_objects = int(os.environ.get("BENCH_OBJECTS", "64"))
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

    world = voxel_box_tumbler(n_boxes=max(1, n_objects - 2), seed=3)
    for eid in world.entities_with(C.VoxelBox):
        world.set_field(eid, C.VoxelBox, "extent_x", 26.0)
        world.set_field(eid, C.VoxelBox, "extent_y", 26.0)
        world.set_field(eid, C.VoxelBox, "extent_z", 26.0)
    t0 = time.perf_counter()
    build = compile_scene(world, cfg)
    print(f"[fr] compile_scene {time.perf_counter() - t0:.0f}s", flush=True)
    rt = HeadlessRuntime(build, cfg, enable_fracturing=False)
    rt.step(2)
    rt.render()
    rt.render()
    print("[fr] warm", flush=True)

    def timed(name, fn, n=20):
        fn()
        _fetch(rt.sim.phys.bodies.position)
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        _fetch(rt.sim.phys.bodies.position)
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"[fr] {name:40s} {dt:8.1f} ms", flush=True)
        return dt

    timed("step (runtime, 1/dispatch)", lambda: rt.step(1))
    timed("step x8 scan batch", lambda: rt.step(8))
    timed("render (fused halves)", rt.render)

    def frame():
        rt.step(1)
        rt.render()

    timed("frame as step+render dispatches", frame)

    rt.step_and_render()
    timed("frame as ONE dispatch (step_and_render)", rt.step_and_render)


if __name__ == "__main__":
    main()
