"""Benchmark: physics steps/sec at ~1M active voxels (step + render cadence).

Run on the real chip: ``python bench.py``. Prints ONE JSON line.

Baseline context (BASELINE.md): the reference publishes no numbers; its only
measured datapoint is ~33 ms/frame (~30 FPS ≈ 30 physics steps/sec, 1 substep
per frame) for a 1000-small-voxel-object scene on a desktop GPU
(docs/voxel_gpu_buffer_pooling.md:1-13). vs_baseline uses that 30 steps/sec
figure as the reference wall-clock rate.
"""

from __future__ import annotations

import json
import os
import time

BASELINE_STEPS_PER_SEC = 30.0


def main():
    import jax
    import numpy as np

    from impact_tpu.models import voxel_box_tumbler
    from impact_tpu.runtime import HeadlessRuntime, compile_scene
    from impact_tpu.utils.config import EngineConfig

    # ~1M active voxels: 32 objects × (10-voxel boxes in 32³ grids) is sparse;
    # use 16 objects of 26³ solid boxes ≈ 280k solid voxels in 32³ grids
    # (1.05M more voxel cells processed per step: 32 objects × 32³ grid cells).
    n_objects = int(os.environ.get("BENCH_OBJECTS", "48"))
    cfg = EngineConfig()
    cfg.tpu.max_voxel_objects = n_objects
    cfg.tpu.max_bodies = n_objects + 16
    cfg.tpu.max_contacts = 1024
    cfg.tpu.voxel_grid_size = 32
    cfg.tpu.render_width = int(os.environ.get("BENCH_WIDTH", "320"))
    cfg.tpu.render_height = int(os.environ.get("BENCH_HEIGHT", "180"))
    cfg.tpu.solver_mode = "jacobi"
    cfg.physics.simulator.initial_time_step_duration = 0.005
    cfg.rendering.shadow_mapping.omnidirectional_light_shadow_map_resolution = 128
    cfg.rendering.shadow_mapping.unidirectional_light_shadow_map_resolution = 128

    world = voxel_box_tumbler(n_boxes=max(1, n_objects - 2), seed=3)
    # scale the boxes up to fill the 32³ grids (~22k solid voxels each) so the
    # active-voxel count approaches the 1M north-star figure
    from impact_tpu.ecs import components as C

    for eid in world.entities_with(C.VoxelBox):
        world.set_field(eid, C.VoxelBox, "extent_x", 26.0)
        world.set_field(eid, C.VoxelBox, "extent_y", 26.0)
        world.set_field(eid, C.VoxelBox, "extent_z", 26.0)
    build = compile_scene(world, cfg)
    rt = HeadlessRuntime(build, cfg, enable_fracturing=False)

    # active voxel count for the record
    from impact_tpu.voxel.object import nonempty_counts

    n_active = int(np.sum(np.asarray(nonempty_counts(rt.sim.voxels))))

    # warm up (compile)
    rt.step(2)
    rt.render()

    # measure pure stepping
    n_steps = int(os.environ.get("BENCH_STEPS", "200"))
    t0 = time.perf_counter()
    rt.step(n_steps)
    dt_step = (time.perf_counter() - t0) / n_steps

    # measure step+render frame
    t0 = time.perf_counter()
    n_frames = 10
    for _ in range(n_frames):
        rt.step(1)
        rt.render()
    dt_frame = (time.perf_counter() - t0) / n_frames

    steps_per_sec = 1.0 / dt_step
    result = {
        "metric": (
            f"physics steps/sec, {n_objects} deformable voxel objects "
            f"({n_active} active voxels, {n_objects * 32**3} grid cells); "
            f"step+render {dt_frame * 1e3:.1f} ms/frame @ "
            f"{cfg.tpu.render_width}x{cfg.tpu.render_height}"
        ),
        "value": round(steps_per_sec, 2),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
