"""Quick: sustained one-dispatch frame timing, plus a donated-state variant.
One compile each."""

import os
import time

import jax
import numpy as np


def _fetch(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[:1])


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
    cfg.physics.simulator.initial_time_step_duration = 0.005
    cfg.rendering.shadow_mapping.omnidirectional_light_shadow_map_resolution = 512
    cfg.tpu.render_tris_per_object = int(
        os.environ.get("BENCH_TRIS_PER_OBJ", "4096"))
    cfg.tpu.max_render_triangles = (
        n_objects * cfg.tpu.render_tris_per_object + 64)
    cfg.tpu.sdf_encoding = "i8"
    if os.environ.get("MERGE_LEVELS"):
        cfg.tpu.mesh_merge_levels = int(os.environ["MERGE_LEVELS"])

    world = voxel_box_tumbler(n_boxes=n_objects - 2, seed=3)
    for eid in world.entities_with(C.VoxelBox):
        world.set_field(eid, C.VoxelBox, "extent_x", 26.0)
        world.set_field(eid, C.VoxelBox, "extent_y", 26.0)
        world.set_field(eid, C.VoxelBox, "extent_z", 26.0)
    t0 = time.perf_counter()
    build = compile_scene(world, cfg)
    print(f"[fq] compile_scene {time.perf_counter() - t0:.0f}s", flush=True)
    rt = HeadlessRuntime(build, cfg, enable_fracturing=False)

    import jax.numpy as jnp
    n_act = int(np.asarray(jnp.sum(rt.sim.meshes.tri_active)))
    dv, dt_ = rt.dropped_mesh_elements()
    print(f"[fq] active tris {n_act}, drops {dv}/{dt_}", flush=True)

    t0 = time.perf_counter()
    rt.step_and_render()
    print(f"[fq] frame compile {time.perf_counter() - t0:.0f}s", flush=True)
    _fetch(rt.sim.phys.bodies.position)
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        rt.step_and_render()
    _fetch(rt.sim.phys.bodies.position)
    print(f"[fq] frame sustained {(time.perf_counter()-t0)/n*1e3:.1f} ms",
          flush=True)

    if os.environ.get("DONATE", "1") == "1":
        fd = jax.jit(rt._frame._fun if hasattr(rt._frame, "_fun") else None) \
            if False else None
        frame_fn = rt._frame.__wrapped__
        fdon = jax.jit(frame_fn, donate_argnums=0)
        sim = rt.sim
        img, sim = fdon(sim, rt._textures)
        _fetch(img)
        t0 = time.perf_counter()
        for _ in range(n):
            img, sim = fdon(sim, rt._textures)
        _fetch(img)
        print(f"[fq] frame donated {(time.perf_counter()-t0)/n*1e3:.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
