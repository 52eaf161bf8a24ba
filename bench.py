"""Benchmark: the north-star condition (BASELINE.json) on the real chip.

Measures physics steps/sec with >=1M active deformable voxels and the
step+render frame time for the full PBR pipeline (shadows + AO + TAA + bloom
+ auto-exposure + tone mapping) at 1920x1080. Prints ONE JSON line.

Baseline context (BASELINE.md): the reference publishes no numbers; its only
measured datapoint is ~33 ms/frame (~30 FPS = 30 physics steps/sec at 1
substep/frame) for a 1000-small-voxel-object scene on a desktop GPU
(docs/voxel_gpu_buffer_pooling.md:1-13). vs_baseline divides by that
30 steps/sec wall-clock rate; the scenes differ (the reference scene has more
objects, this one has ~25x more active voxels), so treat it as an
order-of-magnitude anchor, not an apples-to-apples ratio.

Robustness: TPU backend init is retried with backoff (the tunnel flakes); on
persistent failure the script still exits 0 and emits a JSON line with an
"error" field so the driver records the condition instead of an rc=1.
"""

from __future__ import annotations

import json
import os
import time
import traceback

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

BASELINE_STEPS_PER_SEC = 30.0


def _emit(result: dict) -> None:
    print(json.dumps(result))


def _log(msg: str) -> None:
    import sys

    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _init_devices(n_attempts: int = 4):
    """Initialize the default jax backend with retry/backoff; returns the
    device list. Raises after the final attempt."""
    import jax

    delay = 5.0
    for attempt in range(n_attempts):
        try:
            return jax.devices()
        except Exception:
            if attempt == n_attempts - 1:
                raise
            time.sleep(delay)
            delay *= 2


def main() -> dict:
    devices = _init_devices()
    import numpy as np

    from impact_tpu.ecs import components as C
    from impact_tpu.models import voxel_box_tumbler
    from impact_tpu.runtime import HeadlessRuntime, compile_scene
    from impact_tpu.utils.config import EngineConfig
    from impact_tpu.voxel.object import nonempty_counts

    # 64 objects x 26^3-voxel solid boxes in 32^3 grids ~= 1.12M active voxels
    n_objects = int(os.environ.get("BENCH_OBJECTS", "64"))
    width = int(os.environ.get("BENCH_WIDTH", "1920"))
    height = int(os.environ.get("BENCH_HEIGHT", "1080"))
    cfg = EngineConfig()
    cfg.tpu.max_voxel_objects = n_objects
    cfg.tpu.max_bodies = n_objects + 16
    cfg.tpu.max_contacts = 1024
    cfg.tpu.voxel_grid_size = 32
    cfg.tpu.render_width = width
    cfg.tpu.render_height = height
    cfg.tpu.solver_mode = "jacobi"
    cfg.physics.simulator.initial_time_step_duration = 0.005
    cfg.rendering.shadow_mapping.omnidirectional_light_shadow_map_resolution = int(
        os.environ.get("BENCH_SHADOW_RES", "512")
    )
    # quad merging collapses the 26³ boxes' flat faces ~3×: ~2.9k active tris
    # per object. The per-object render slice (free compaction) takes 4096
    # leading slots; the budget covers all sliced slots so the argsort
    # compaction is skipped entirely. Drops are logged below (must be 0).
    cfg.tpu.render_tris_per_object = int(
        os.environ.get("BENCH_TRIS_PER_OBJ", "4096")
    )
    cfg.tpu.max_render_triangles = int(
        os.environ.get(
            "BENCH_TRIS",
            str(n_objects * cfg.tpu.render_tris_per_object + 64),
        )
    )
    # i8 SDF storage (ref VoxelSignedDistance semantics): ~35% faster stepping
    cfg.tpu.sdf_encoding = os.environ.get("BENCH_SDF", "i8")

    world = voxel_box_tumbler(n_boxes=max(1, n_objects - 2), seed=3)
    for eid in world.entities_with(C.VoxelBox):
        world.set_field(eid, C.VoxelBox, "extent_x", 26.0)
        world.set_field(eid, C.VoxelBox, "extent_y", 26.0)
        world.set_field(eid, C.VoxelBox, "extent_z", 26.0)
    t0 = time.perf_counter()
    build = compile_scene(world, cfg)
    _log(f"compile_scene {time.perf_counter() - t0:.0f}s")
    rt = HeadlessRuntime(build, cfg, enable_fracturing=False)

    n_active = int(np.sum(np.asarray(nonempty_counts(rt.sim.voxels))))
    _log(f"{n_active} active voxels")
    dv, dt_drop = rt.dropped_mesh_elements()
    _log(f"mesh compaction drops: {dv} verts, {dt_drop} tris (must be 0)")

    # warm up (compile step + all render stages). rt.step(n) dispatches the
    # k-step lax.scan batch whenever n >= k, so warming with 2*k compiles BOTH
    # the single-step and the scan path — the timed loop below must never pay
    # one-time XLA compile (VERDICT r03: a 2-step warmup left the k=8 scan
    # cold and the 100-step loop swallowed ~40 s of compile).
    k = rt._step_batch_size
    t0 = time.perf_counter()
    rt.step(2 * k)
    _log(f"step warmup ({2 * k} steps, both paths) {time.perf_counter() - t0:.0f}s")
    t0 = time.perf_counter()
    rt.render()
    rt.render()
    _log(f"render warmup {time.perf_counter() - t0:.0f}s")

    import jax
    import jax.numpy as jnp

    def _sync():
        # host fetch = the only true sync through the tunnel
        np.asarray(
            jax.device_get(rt.sim.phys.bodies.position.reshape(-1)[:1])
        )

    _sync()
    t0 = time.perf_counter()
    for _ in range(3):
        _sync()
    sync_cost = (time.perf_counter() - t0) / 3

    # measure pure stepping (sustained loop, one sync)
    n_steps = int(os.environ.get("BENCH_STEPS", "100"))
    t0 = time.perf_counter()
    rt.step(n_steps)
    _sync()
    dt_step = max(time.perf_counter() - t0 - sync_cost, 1e-9) / n_steps

    # measure step+render frames: ONE fused dispatch per frame (the tunnel's
    # per-dispatch floor is ~30 ms for a full-SimState program)
    rt.step_and_render()
    _sync()
    n_frames = int(os.environ.get("BENCH_FRAMES", "20"))
    t0 = time.perf_counter()
    for _ in range(n_frames):
        rt.step_and_render()
    _sync()
    dt_frame = max(time.perf_counter() - t0 - sync_cost, 1e-9) / n_frames

    # per-stage device times (host-fetch sync: block_until_ready does not
    # block through the axon tunnel) + FLOP/MFU accounting from XLA's own
    # cost analysis of the compiled engine step
    import jax
    import jax.numpy as jnp

    def _fetch(out):
        # host fetch = the only true sync through the tunnel (and it costs
        # tens of ms round-trip — time long loops, subtract one fetch)
        leaf = jax.tree.leaves(out)[0]
        np.asarray(jax.device_get(leaf.reshape(-1)[:1]))

    _fetch(jnp.ones((8,)))
    t0 = time.perf_counter()
    for _ in range(5):
        _fetch(jnp.ones((8,)))
    fetch_cost = (time.perf_counter() - t0) / 5

    def _time_stage(fn, n=20):
        _fetch(fn())
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        _fetch(out)
        return max(time.perf_counter() - t0 - fetch_cost, 0.0) / n * 1e3

    sim = rt.sim
    stages = {}
    geometry_ms = None
    try:
        scene = rt._scene_of(sim)
        stages["scene_of"] = _time_stage(lambda: rt._scene_of(sim))
        gb, _gd = rt._geometry(scene, sim.render.frame_index)
        geometry_ms = _time_stage(
            lambda: rt._geometry(scene, sim.render.frame_index)
        )
        stages["geometry"] = geometry_ms
        sh = rt._shadows(scene)
        stages["shadows"] = _time_stage(lambda: rt._shadows(scene))
        omni, uni, _sd = sh
        stages["shade"] = _time_stage(
            lambda: rt._shade(gb, omni, uni, rt._textures)
        )
        lum = rt._shade(gb, omni, uni, rt._textures)
        stages["post"] = _time_stage(
            lambda: rt._post(lum, gb.motion, sim.render)
        )
        stages["step"] = _time_stage(lambda: rt._step(sim, rt.params))
        stages = {k: round(v, 1) for k, v in stages.items()}
    except Exception as exc:  # stage probing must never sink the bench
        stages = {"error": str(exc)[:200]}

    def _cost_of(jitted, *args):
        """(flops, bytes accessed) from XLA's own cost analysis."""
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return (
            float(cost.get("flops", 0.0)),
            float(cost.get("bytes accessed", 0.0)),
        )

    flops = 0.0
    geometry_roofline = {}
    try:
        flops, _ = _cost_of(rt._step, sim, rt.params)
    except Exception:
        pass
    try:
        # roofline for the frame's wall (the geometry pass): is it DMA-bound
        # (GB/s vs ~819 GB/s v5e HBM) or eval-bound (GFLOP/s vs ~98e3 f32)?
        gf, gbytes = _cost_of(rt._geometry, scene, sim.render.frame_index)
        if geometry_ms:
            geometry_roofline = {
                "flops": gf,
                "hbm_bytes": gbytes,
                "achieved_gbps": round(gbytes / (geometry_ms * 1e-3) / 1e9, 1),
                "achieved_gflops": round(gf / (geometry_ms * 1e-3) / 1e9, 1),
            }
    except Exception:
        pass
    # v5e peak ≈ 197 TFLOP/s bf16 / ~98 TFLOP/s f32; the step is mostly f32
    mfu = flops / dt_step / 98e12 if flops else 0.0

    fracture = {}
    if os.environ.get("BENCH_FRACTURE", "1") != "0":
        try:
            fracture = bench_fracture()
        except Exception as exc:
            fracture = {"fracture_error": str(exc)[:300]}
    if os.environ.get("BENCH_CHUNKED", "1") != "0":
        try:
            fracture.update(bench_chunked_64())
        except Exception as exc:
            fracture["chunked64_error"] = str(exc)[:300]

    steps_per_sec = 1.0 / dt_step
    return {
        "metric": (
            f"physics steps/sec, {n_objects} deformable voxel objects, "
            f"{n_active} active voxels ({n_objects * 32**3} grid cells); "
            f"step+render(PBR shadows+AO+TAA+bloom) {dt_frame * 1e3:.1f} ms/frame "
            f"@ {width}x{height} on {devices[0].device_kind}; baseline anchor: "
            f"~30 steps/s for the reference's 1000-small-object desktop-GPU scene"
        ),
        "value": round(steps_per_sec, 2),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 2),
        "vs_baseline_caveat": (
            "anchor is the reference's 1000-small-object desktop-GPU scene "
            "(~30 steps/s wall rate inferred from its ~33 ms frame profile); "
            "this scene is 64 objects x ~17.5k active voxels (~25x the active "
            "voxel count) — treat as order-of-magnitude, not apples-to-apples"
        ),
        "frame_ms": round(dt_frame * 1e3, 1),
        "stages_ms": stages,
        "step_flops": flops,
        "step_mfu_f32": round(mfu, 4),
        "geometry_roofline": geometry_roofline,
        "dropped_mesh_elements": list(rt.dropped_mesh_elements()),
        "dropped_raster_candidates": rt.dropped_raster_candidates(),
        **fracture,
    }


def bench_fracture() -> dict:
    """Reference-scale fracture event (ref: engine_config_no_assets.ron
    max_fragment_count 512, fracturing.rs:338-371,508): a projectile
    shatters a fracturable box into ≥128 Voronoi fragments. The event's
    FULL pipeline — impulse trigger → seed sampling → carve → remesh of
    every fragment → fresh collision probes — runs inside ONE engine step,
    so the reported latency is (event-step wall time − steady-step wall
    time), one dispatch each."""
    import numpy as np

    from impact_tpu.ecs import components as C
    from impact_tpu.models import fracturing
    from impact_tpu.runtime import HeadlessRuntime, compile_scene
    from impact_tpu.utils.config import EngineConfig

    n_frag = int(os.environ.get("BENCH_FRACTURE_FRAGMENTS", "128"))
    cfg = EngineConfig()
    cfg.tpu.max_voxel_objects = n_frag + 16
    cfg.tpu.max_bodies = n_frag + 32
    cfg.tpu.max_contacts = 1024
    cfg.tpu.voxel_grid_size = 32
    cfg.tpu.render_width = 320
    cfg.tpu.render_height = 200
    cfg.tpu.solver_mode = "jacobi"
    cfg.tpu.sdf_encoding = os.environ.get("BENCH_SDF", "i8")
    cfg.tpu.max_fracture_fragments = n_frag
    cfg.tpu.max_fracture_events = 1
    cfg.physics.simulator.initial_time_step_duration = 0.005

    world = fracturing()
    for eid in world.entities_with(C.FracturingProperties):
        # fragment most of the box: radius spans it, threshold hits early
        world.set_field(eid, C.FracturingProperties, "fracture_radius", 4.0)
        world.set_field(eid, C.FracturingProperties, "impulse_threshold", 5.0)

    t0 = time.perf_counter()
    build = compile_scene(world, cfg)
    _log(f"fracture compile_scene {time.perf_counter() - t0:.0f}s")
    rt = HeadlessRuntime(build, cfg)
    t0 = time.perf_counter()
    rt.step(1)  # compile the single-step path (incl. fracture + remesh)
    _log(f"fracture step compile {time.perf_counter() - t0:.0f}s")

    # find the (deterministic) event step
    alive0 = int(np.asarray(rt.sim.voxels.alive).sum())
    k_event = None
    for i in range(1, 401):
        rt.step(1)
        a = int(np.asarray(rt.sim.voxels.alive).sum())
        if a > alive0:
            k_event = i
            n_fragments = a - alive0
            break
    if k_event is None:
        return {"fracture_error": "no fracture event within 400 steps"}
    _log(f"fracture event at step {k_event}: {n_fragments} fragments")

    # replay: steady-state single-step baseline just before the event,
    # then the timed event step (same compiled program, one dispatch each)
    rt.reset_world()
    rt.step(max(k_event - 6, 0))

    def timed_step():
        t0 = time.perf_counter()
        rt.step(1)
        np.asarray(jax.device_get(rt.sim.voxels.alive))
        return time.perf_counter() - t0

    import jax

    pre = sorted(timed_step() for _ in range(5))
    baseline = pre[len(pre) // 2]
    event_s = timed_step()
    a = int(np.asarray(rt.sim.voxels.alive).sum())
    # the event can shift ±1 step vs discovery (warmup steps differ); walk
    # forward until it fires
    while a == alive0:
        event_s = timed_step()
        a = int(np.asarray(rt.sim.voxels.alive).sum())
    dirty_after = int(np.asarray(rt.sim.voxels.mesh_dirty).sum())
    dv, dt_drop = rt.dropped_mesh_elements()
    return {
        "fracture_event_ms": round(max(event_s - baseline, 0.0) * 1e3, 1),
        "fracture_fragments": int(a - alive0),
        "fracture_steady_step_ms": round(baseline * 1e3, 1),
        "fracture_mesh_dirty_after_event": dirty_after,
        "fracture_dropped_mesh_elements": [int(dv), int(dt_drop)],
    }


def bench_chunked_64() -> dict:
    """64³ objects via chunk-gated meshing (ref: object.rs:75-101 chunked
    grids + mesh.rs:360 incremental remesh — VERDICT-r3 item 4): an
    Asteroid-scale 64³ object under CONTINUOUS absorption, where every step
    re-meshes dirty chunks. Logs the per-step cost together with the
    surface-chunk count it should track."""
    import numpy as np

    from impact_tpu.ecs import components as C
    from impact_tpu.models import asteroid
    from impact_tpu.runtime import HeadlessRuntime, compile_scene
    from impact_tpu.utils.config import EngineConfig
    from impact_tpu.voxel.object import (
        nonempty_counts,
        surface_chunk_counts,
    )

    cfg = EngineConfig()
    cfg.tpu.max_voxel_objects = 4
    cfg.tpu.max_bodies = 12
    cfg.tpu.max_contacts = 256
    cfg.tpu.voxel_grid_size = 64
    cfg.tpu.render_width = 320
    cfg.tpu.render_height = 200
    cfg.tpu.solver_mode = "jacobi"
    cfg.tpu.sdf_encoding = os.environ.get("BENCH_SDF", "i8")
    cfg.tpu.chunked_remesh = True
    cfg.tpu.chunk_submesh_slots = 512
    cfg.tpu.chunk_remesh_budget = int(
        os.environ.get("BENCH_CHUNK_BUDGET", "16")
    )
    cfg.physics.simulator.initial_time_step_duration = 0.005

    world = asteroid()
    for eid in world.entities_with(C.VoxelSphere):
        # fill the 64³ grid: radius 28 voxels of extent 0.3
        world.set_field(eid, C.VoxelSphere, "radius", 8.4)
    # a continuous absorber keeps chunks dirty so the remesh path is IN the
    # measured loop
    world.create_entity(
        C.ReferenceFrame(position=(4.0, 4.0, 0.0)),
        C.VoxelAbsorbingSphere(offset=(0.0, 0.0, 0.0), radius=3.0, rate=2.0),
    )
    t0 = time.perf_counter()
    build = compile_scene(world, cfg)
    _log(f"chunked64 compile_scene {time.perf_counter() - t0:.0f}s")
    rt = HeadlessRuntime(build, cfg, enable_fracturing=False)
    k = rt._step_batch_size
    t0 = time.perf_counter()
    rt.step(2 * k)
    _log(f"chunked64 warmup {time.perf_counter() - t0:.0f}s")

    import jax

    def _sync():
        np.asarray(jax.device_get(rt.sim.voxels.alive))

    _sync()
    n = 50
    t0 = time.perf_counter()
    rt.step(n)
    _sync()
    step_ms = (time.perf_counter() - t0) / n * 1e3

    n_vox = int(np.sum(np.asarray(nonempty_counts(rt.sim.voxels))))
    n_surf = int(np.sum(np.asarray(surface_chunk_counts(rt.sim.voxels))))
    dv, dt_drop = rt.dropped_mesh_elements()
    return {
        "chunked64_step_ms": round(step_ms, 1),
        "chunked64_active_voxels": n_vox,
        "chunked64_surface_chunks": n_surf,
        "chunked64_total_chunks": 4 * 64,
        "chunked64_remesh_budget": cfg.tpu.chunk_remesh_budget,
        "chunked64_dropped_mesh_elements": [int(dv), int(dt_drop)],
    }


if __name__ == "__main__":
    try:
        result = main()
    except Exception as exc:  # emit the failure as data, never rc!=0
        result = {
            "metric": "physics steps/sec at >=1M active voxels (FAILED)",
            "value": 0.0,
            "unit": "steps/s",
            "vs_baseline": 0.0,
            "error": "".join(
                traceback.format_exception_only(type(exc), exc)
            ).strip()[:500],
        }
    _emit(result)
