"""Break the 23 ms engine step into sub-costs at bench conditions:
voxel contact generation, constraint solve, integration, remesh cond.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf.reshape(-1)[:1]))


def timeit(name, fn, n=30):
    f = jax.jit(fn)
    _fetch(f())
    t0 = time.perf_counter()
    for _ in range(5):
        _fetch(jnp.ones((4,)))
    fc = (time.perf_counter() - t0) / 5
    t0 = time.perf_counter()
    for _ in range(n):
        out = f()
    _fetch(out)
    dt = max(time.perf_counter() - t0 - fc, 0.0) / n * 1e3
    print(f"[step] {name:48s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    from impact_tpu.ecs import components as C
    from impact_tpu.models import voxel_box_tumbler
    from impact_tpu.runtime import HeadlessRuntime, compile_scene
    from impact_tpu.utils.config import EngineConfig
    from impact_tpu.physics.step import physics_step
    from impact_tpu.voxel.collision import voxel_contacts, merge_contact_buffers
    from impact_tpu.physics.solver import solve_contacts

    n_objects = int(os.environ.get("BENCH_OBJECTS", "64"))
    cfg = EngineConfig()
    cfg.tpu.max_voxel_objects = n_objects
    cfg.tpu.max_bodies = n_objects + 16
    cfg.tpu.max_contacts = 1024
    cfg.tpu.voxel_grid_size = 32
    cfg.tpu.render_width = 320
    cfg.tpu.render_height = 200
    cfg.tpu.solver_mode = "jacobi"
    cfg.physics.simulator.initial_time_step_duration = 0.005
    cfg.tpu.sdf_encoding = "i8"

    world = voxel_box_tumbler(n_boxes=max(1, n_objects - 2), seed=3)
    for eid in world.entities_with(C.VoxelBox):
        world.set_field(eid, C.VoxelBox, "extent_x", 26.0)
        world.set_field(eid, C.VoxelBox, "extent_y", 26.0)
        world.set_field(eid, C.VoxelBox, "extent_z", 26.0)
    t0 = time.perf_counter()
    build = compile_scene(world, cfg)
    print(f"[step] compile_scene {time.perf_counter() - t0:.0f}s", flush=True)
    rt = HeadlessRuntime(build, cfg, enable_fracturing=False)
    rt.step(3)
    sim = rt.sim
    params = rt.params

    timeit("full engine step", lambda: rt._step(sim, params), n=20)

    pool, probes = sim.voxels, sim.probes
    pp = params.phys_params
    bodies = sim.phys.bodies

    timeit("voxel_contacts", lambda: voxel_contacts(
        pool, probes, pp.collidables, bodies.position, bodies.orientation,
        cfg.tpu.max_contacts))

    vc = jax.jit(lambda: voxel_contacts(
        pool, probes, pp.collidables, bodies.position, bodies.orientation,
        cfg.tpu.max_contacts))()

    timeit("physics_step (incl contacts+solver)", lambda: physics_step(
        sim.phys, pp, 0.005, 1, cfg.physics.constraint_solver,
        cfg.tpu.max_contacts, "jacobi",
        extra_contacts_fn=lambda b, c: merge_contact_buffers(
            c, vc, cfg.tpu.max_contacts)), n=20)

    timeit("physics_step (no voxel contacts)", lambda: physics_step(
        sim.phys, pp, 0.005, 1, cfg.physics.constraint_solver,
        cfg.tpu.max_contacts, "jacobi"), n=20)


if __name__ == "__main__":
    main()
