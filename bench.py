"""Benchmark: the north-star condition (BASELINE.json) on the real chip.

Measures physics steps/sec with >=1M active deformable voxels and the
step+render frame time for the full PBR pipeline (shadows + AO + TAA + bloom
+ auto-exposure + tone mapping) at 1920x1080.

Baseline context (BASELINE.md): the reference publishes no numbers; its only
measured datapoint is ~33 ms/frame (~30 FPS = 30 physics steps/sec at 1
substep/frame) for a 1000-small-voxel-object scene on a desktop GPU
(docs/voxel_gpu_buffer_pooling.md:1-13). vs_baseline divides by that
30 steps/sec wall-clock rate; the scenes differ (the reference scene has more
objects, this one has ~25x more active voxels), so treat it as an
order-of-magnitude anchor, not an apples-to-apples ratio.

Un-killable emit discipline (VERDICT r4 item 1 — BENCH_r04 timed out with
everything measured and nothing emitted): the result dict is emitted as a
complete JSON line the moment the headline numbers exist, then RE-emitted
after every optional phase with the new fields merged in. The driver parses
the last JSON line of the tail, so a timeout mid-phase loses only that
phase. A SIGTERM/SIGALRM handler emits the latest result and exits 0, and
every optional phase is gated on the remaining wall-clock budget
(BENCH_BUDGET_S, default 1050 s — the driver's own timeout killed r4 at
roughly 1200 s).

Robustness: TPU backend init is retried with backoff (the tunnel flakes); on
persistent failure the script still exits 0 and emits a JSON line with an
"error" field so the driver records the condition instead of an rc=1.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time
import traceback

import jax

# Persistent compilation cache, pointed at a REPO-COMMITTED directory: the
# TPU programs this bench compiles (fused frame, step scan, render stages)
# cost 10+ minutes of XLA compile through the tunnel, which is what timed
# out BENCH_r04 before it could emit. The repo ships the cache entries from
# the final pre-round run, so the driver's run compiles (almost) nothing.
# NOTE: set via jax.config.update — the harness pre-imports jax via
# sitecustomize, so the usual env vars are read before we can set them.
# CPU-backend work (compile_scene) bypasses the cache: CPU cache entries are
# AOT-compiled for the build host's CPU features and may SIGILL elsewhere.
_REPO_CACHE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".jax_cache"
)


def _cache_on() -> None:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("BENCH_JAX_CACHE", _REPO_CACHE),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def _cache_off() -> None:
    jax.config.update("jax_compilation_cache_dir", None)


_cache_on()

BASELINE_STEPS_PER_SEC = 30.0
_T_START = time.monotonic()
_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1050"))

# the latest merged result; signal handlers emit this on forced shutdown
RESULT: dict = {
    "metric": "physics steps/sec at >=1M active voxels (NOT MEASURED YET)",
    "value": 0.0,
    "unit": "steps/s",
    "vs_baseline": 0.0,
}


def _remaining() -> float:
    return _BUDGET_S - (time.monotonic() - _T_START)


def _emit() -> None:
    """Print the CURRENT result as one complete JSON line (repeatable —
    each line supersedes the previous; the driver keeps the last one)."""
    print(json.dumps(RESULT), flush=True)


def _log(msg: str) -> None:
    print(f"[bench] {msg} (t={time.monotonic() - _T_START:.0f}s)",
          file=sys.stderr, flush=True)


def _on_signal(signum, frame):  # noqa: ARG001
    RESULT.setdefault("bench_truncated", signal.Signals(signum).name)
    _emit()
    os._exit(0)


signal.signal(signal.SIGTERM, _on_signal)
signal.signal(signal.SIGALRM, _on_signal)
# hard backstop ~90 s before the presumed driver timeout: even if a device
# call blocks past the soft budget, we emit and exit under our own power
signal.alarm(int(_BUDGET_S + 90))


def _compile_scene_nocache(world, cfg):
    """compile_scene with the repo cache suspended: its programs run on the
    CPU backend, and CPU cache entries are machine-specific AOT code."""
    from impact_tpu.runtime import compile_scene

    _cache_off()
    try:
        return compile_scene(world, cfg)
    finally:
        _cache_on()


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


def _bench_config(n_objects: int, width: int, height: int):
    from impact_tpu.utils.config import EngineConfig

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
    return cfg


def main() -> None:
    devices = _init_devices()
    import numpy as np

    from impact_tpu.ecs import components as C
    from impact_tpu.models import voxel_box_tumbler
    from impact_tpu.runtime import HeadlessRuntime
    from impact_tpu.voxel.object import nonempty_counts

    # 64 objects x 26^3-voxel solid boxes in 32^3 grids ~= 1.12M active voxels
    n_objects = int(os.environ.get("BENCH_OBJECTS", "64"))
    width = int(os.environ.get("BENCH_WIDTH", "1920"))
    height = int(os.environ.get("BENCH_HEIGHT", "1080"))
    cfg = _bench_config(n_objects, width, height)

    world = voxel_box_tumbler(n_boxes=max(1, n_objects - 2), seed=3)
    for eid in world.entities_with(C.VoxelBox):
        world.set_field(eid, C.VoxelBox, "extent_x", 26.0)
        world.set_field(eid, C.VoxelBox, "extent_y", 26.0)
        world.set_field(eid, C.VoxelBox, "extent_z", 26.0)
    t0 = time.perf_counter()
    build = _compile_scene_nocache(world, cfg)
    _log(f"compile_scene {time.perf_counter() - t0:.0f}s")
    rt = HeadlessRuntime(build, cfg, enable_fracturing=False)

    n_active = int(np.sum(np.asarray(nonempty_counts(rt.sim.voxels))))
    _log(f"{n_active} active voxels")

    # warm up step paths only. rt.step(n) dispatches the k-step lax.scan
    # batch while n >= k and SINGLE steps for the remainder, so warming with
    # 2*k+1 compiles BOTH the scan path and the single-step path — the timed
    # loop below must never pay one-time XLA compile. (VERDICT r03: a 2-step
    # warmup left the k=8 scan cold; in r5 a 2*k warmup left the SINGLE step
    # cold and rt.step(100)'s 4 trailing single steps swallowed ~80 s of
    # compile — "sustained 1.2 steps/s" while the honest step was 6.2 ms.)
    # The render stages warm lazily where first used (VERDICT r04: a 217 s
    # rt.render() warmup compiled stage programs the frame loop never
    # dispatches).
    k = rt._step_batch_size
    t0 = time.perf_counter()
    rt.step(2 * k + 1)
    _log(f"step warmup ({2 * k + 1} steps, both paths) {time.perf_counter() - t0:.0f}s")

    import jax

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
    steps_per_sec = 1.0 / dt_step
    _log(f"sustained {steps_per_sec:.1f} steps/s")

    # measure step+render frames: ONE fused dispatch per frame (the tunnel's
    # per-dispatch floor is ~30 ms for a full-SimState program)
    t0 = time.perf_counter()
    rt.step_and_render()
    _sync()
    _log(f"frame warmup(compile) {time.perf_counter() - t0:.0f}s")
    n_frames = int(os.environ.get("BENCH_FRAMES", "20"))
    t0 = time.perf_counter()
    for _ in range(n_frames):
        rt.step_and_render()
    _sync()
    dt_frame = max(time.perf_counter() - t0 - sync_cost, 1e-9) / n_frames

    dv, dt_drop = rt.dropped_mesh_elements()
    _log(f"mesh compaction drops: {dv} verts, {dt_drop} tris (must be 0)")

    RESULT.update(
        {
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
            "dropped_mesh_elements": [int(dv), int(dt_drop)],
            "dropped_raster_candidates": rt.dropped_raster_candidates(),
        }
    )
    _emit()  # headline numbers are now on the record, whatever happens next

    # ---- optional phases, budget-gated, each re-emitting on completion ----
    if _remaining() > 120 and os.environ.get("BENCH_STAGES", "1") != "0":
        try:
            RESULT.update(bench_stage_table(rt))
        except Exception as exc:
            RESULT["stages_error"] = str(exc)[:300]
        _emit()
    else:
        _log(f"skipping stage table ({_remaining():.0f}s left)")

    if _remaining() > 240 and os.environ.get("BENCH_PARITY", "1") != "0":
        try:
            RESULT.update(bench_tpu_parity())
        except Exception as exc:
            RESULT["tpu_parity_error"] = str(exc)[:300]
        _emit()
    else:
        _log(f"skipping tpu parity ({_remaining():.0f}s left)")

    if _remaining() > 300 and os.environ.get("BENCH_FRACTURE", "1") != "0":
        try:
            RESULT.update(bench_fracture())
        except Exception as exc:
            RESULT["fracture_error"] = str(exc)[:300]
        _emit()
    else:
        _log(f"skipping fracture phase ({_remaining():.0f}s left)")

    if _remaining() > 240 and os.environ.get("BENCH_CHUNKED", "1") != "0":
        try:
            RESULT.update(bench_chunked(64))
        except Exception as exc:
            RESULT["chunked64_error"] = str(exc)[:300]
        _emit()
    else:
        _log(f"skipping chunked64 phase ({_remaining():.0f}s left)")

    # 128³: the grid-volume-independence proof point — 8× the voxels of the
    # 64³ phase, step cost tracking surface chunks instead (VERDICT-r4
    # item 4's chunked128 demo)
    if _remaining() > 300 and os.environ.get("BENCH_CHUNKED", "1") != "0":
        try:
            RESULT.update(bench_chunked(128))
        except Exception as exc:
            RESULT["chunked128_error"] = str(exc)[:300]
        _emit()
    else:
        _log(f"skipping chunked128 phase ({_remaining():.0f}s left)")


def bench_stage_table(rt) -> dict:
    """Per-stage device times (host-fetch sync: block_until_ready does not
    block through the axon tunnel) + FLOP/MFU accounting from XLA's own
    cost analysis of the compiled engine step."""
    import jax
    import jax.numpy as jnp
    import numpy as np

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
    scene = rt._scene_of(sim)
    stages["scene_of"] = _time_stage(lambda: rt._scene_of(sim))
    gb, _gd = rt._geometry(scene, sim.render.frame_index)
    geometry_ms = _time_stage(
        lambda: rt._geometry(scene, sim.render.frame_index)
    )
    stages["geometry"] = geometry_ms
    sh = rt._shadows(scene)
    stages["shadows"] = _time_stage(lambda: rt._shadows(scene))
    # attribute the cumulative drop counter: geometry-pass drops can lose
    # nearest-z geometry; shadow-pass drops evict a depth-min raster's
    # FARTHEST candidates (cannot change the min up to z-quantization) —
    # the split says which kind the headline counter is made of
    drops_split = {
        "frame_geometry_drops": int(np.asarray(_gd)),
        "frame_shadow_drops": int(np.asarray(sh[2])),
    }
    omni, uni, _sd = sh
    stages["shade"] = _time_stage(
        lambda: rt._shade(gb, omni, uni, rt._textures)
    )
    lum = rt._shade(gb, omni, uni, rt._textures)
    stages["post"] = _time_stage(lambda: rt._post(lum, gb.motion, sim.render))
    stages["step"] = _time_stage(lambda: rt._step(sim, rt.params))
    stages = {k: round(v, 1) for k, v in stages.items()}
    out = {"stages_ms": stages}
    out.update(drops_split)

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
    try:
        flops, _ = _cost_of(rt._step, sim, rt.params)
    except Exception:
        pass
    try:
        # roofline for the frame's wall (the geometry pass): is it DMA-bound
        # (GB/s vs ~819 GB/s v5e HBM) or eval-bound (GFLOP/s vs ~98e3 f32)?
        gf, gbytes = _cost_of(rt._geometry, scene, sim.render.frame_index)
        if geometry_ms:
            out["geometry_roofline"] = {
                "flops": gf,
                "hbm_bytes": gbytes,
                "achieved_gbps": round(gbytes / (geometry_ms * 1e-3) / 1e9, 1),
                "achieved_gflops": round(gf / (geometry_ms * 1e-3) / 1e9, 1),
            }
    except Exception:
        pass
    # v5e peak ≈ 197 TFLOP/s bf16 / ~98 TFLOP/s f32; the step is mostly f32
    if flops and stages.get("step"):
        out["step_flops"] = flops
        out["step_mfu_f32"] = round(
            flops / (stages["step"] * 1e-3) / 98e12, 6
        )
    return out


def bench_tpu_parity() -> dict:
    """Score ONE reference golden on-device with the Pallas raster (VERDICT
    r4 weak 3: the parity suite runs the CPU/XLA raster; the actual TPU
    kernel output was never scored against the reference's own goldens).
    Uses the same scene + scoring as apps/parity_snapshots.py at the
    reference's native 768×512."""
    from apps.parity_snapshots import score_reference_scene

    name = os.environ.get("BENCH_PARITY_SCENE", "ShadowCubeMapping")
    t0 = time.perf_counter()
    res = score_reference_scene(name, backend="pallas")
    _log(
        f"tpu parity [{name}] score {res['score']:.3f} "
        f"({time.perf_counter() - t0:.0f}s)"
    )
    return {
        "tpu_parity_scene": name,
        "tpu_parity_score": round(float(res["score"]), 4),
        "tpu_parity_raster_drops": int(res.get("raster_drops", -1)),
    }


def bench_fracture() -> dict:
    """Reference-scale fracture event (ref: engine_config_no_assets.ron
    max_fragment_count 512, fracturing.rs:338-371,508): a projectile
    shatters a fracturable box into ≥128 Voronoi fragments. The event's
    FULL pipeline — impulse trigger → seed sampling → carve → remesh of
    every fragment → fresh collision probes — runs inside ONE engine step,
    so the reported latency is (event-step wall time − steady-step wall
    time), one dispatch each."""
    import jax
    import numpy as np

    from impact_tpu.ecs import components as C
    from impact_tpu.models import fracturing
    from impact_tpu.runtime import HeadlessRuntime
    from impact_tpu.utils.config import EngineConfig

    n_frag = int(os.environ.get("BENCH_FRACTURE_FRAGMENTS", "192"))
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
        # radius matched to the 14-voxel box (half-extent 1.75): keeps the
        # radial-falloff seed cloud inside the box so nearly every Voronoi
        # cell contains voxels (probe_frag_yield.py: r=2.5 → ~162 actual
        # fragments of 191 seeds; the old r=4.0 left ~40% of cells empty)
        world.set_field(eid, C.FracturingProperties, "fracture_radius", 2.5)
        world.set_field(eid, C.FracturingProperties, "impulse_threshold", 5.0)

    t0 = time.perf_counter()
    build = _compile_scene_nocache(world, cfg)
    _log(f"fracture compile_scene {time.perf_counter() - t0:.0f}s")
    rt = HeadlessRuntime(build, cfg)
    t0 = time.perf_counter()
    rt.step(1)  # compile the single-step path (incl. fracture + remesh)
    _log(f"fracture step compile {time.perf_counter() - t0:.0f}s")

    # find the (deterministic) event step — stepping in batches between
    # fetches (VERDICT r4 weak 1c: 400 per-step device_get round-trips
    # through the tunnel)
    alive0 = int(np.asarray(rt.sim.voxels.alive).sum())
    batch = 10
    k_hi = None
    for i in range(batch, 401, batch):
        rt.step(batch)
        a = int(np.asarray(rt.sim.voxels.alive).sum())
        if a > alive0:
            k_hi = i
            break
    if k_hi is None:
        return {"fracture_error": "no fracture event within 400 steps"}
    # narrow to the exact step inside (k_hi - batch, k_hi]
    rt.reset_world()
    rt.step(k_hi - batch)
    k_event = k_hi - batch
    a = alive0
    while a == alive0:
        rt.step(1)
        k_event += 1
        a = int(np.asarray(rt.sim.voxels.alive).sum())
    n_fragments = a - alive0
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


def bench_chunked(grid_size: int) -> dict:
    """Chunk-gated objects at ``grid_size``³ (ref: object.rs:75-101 chunked
    grids + mesh.rs:360 incremental remesh — VERDICT-r3 item 4 / r4 item 4):
    an Asteroid-scale object under CONTINUOUS absorption, where every step
    carves absorber-overlapped chunk windows and re-meshes the dirty chunks.
    Logs the per-step cost together with the surface-chunk count it should
    track — per-step work is O(budget·18³) remesh + O(B·16³) carve,
    independent of grid volume, so step_ms between the 64³ and 128³ phases
    should track surface-chunk counts, not the 8× volume ratio."""
    import jax
    import numpy as np

    from impact_tpu.ecs import components as C
    from impact_tpu.models import asteroid
    from impact_tpu.runtime import HeadlessRuntime
    from impact_tpu.utils.config import EngineConfig
    from impact_tpu.voxel.object import (
        nonempty_counts,
        surface_chunk_counts,
    )

    g = grid_size
    n_obj = 4 if g <= 64 else 2
    tag = f"chunked{g}"
    cfg = EngineConfig()
    cfg.tpu.max_voxel_objects = n_obj
    cfg.tpu.max_bodies = n_obj + 8
    cfg.tpu.max_contacts = 256
    cfg.tpu.voxel_grid_size = g
    cfg.tpu.render_width = 320
    cfg.tpu.render_height = 200
    cfg.tpu.solver_mode = "jacobi"
    cfg.tpu.sdf_encoding = os.environ.get("BENCH_SDF", "i8")
    cfg.tpu.chunked_remesh = True
    # 2 objects × ~180 surface chunks at 128³ fit 512 slots; the slot pool's
    # HBM footprint scales with slots × chunk_tri_cap, so keep it right-sized
    cfg.tpu.chunk_submesh_slots = 512
    cfg.tpu.chunk_remesh_budget = int(
        os.environ.get("BENCH_CHUNK_BUDGET", "16")
    )
    cfg.physics.simulator.initial_time_step_duration = 0.005

    world = asteroid()
    for eid in world.entities_with(C.VoxelSphere):
        # fill the grid: radius (g/2 − 4) voxels of extent 0.3
        world.set_field(
            eid, C.VoxelSphere, "radius", (g / 2 - 4) * 0.3
        )
    # a continuous absorber keeps chunks dirty so the carve + remesh paths
    # are IN the measured loop
    world.create_entity(
        C.ReferenceFrame(position=(4.0, 4.0, 0.0)),
        C.VoxelAbsorbingSphere(offset=(0.0, 0.0, 0.0), radius=3.0, rate=2.0),
    )
    t0 = time.perf_counter()
    build = _compile_scene_nocache(world, cfg)
    _log(f"{tag} compile_scene {time.perf_counter() - t0:.0f}s")
    rt = HeadlessRuntime(build, cfg, enable_fracturing=False)
    k = rt._step_batch_size
    t0 = time.perf_counter()
    rt.step(2 * k + 1)  # 2*k+1: warm the scan path AND the single-step path
    _log(f"{tag} warmup {time.perf_counter() - t0:.0f}s")

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
        f"{tag}_step_ms": round(step_ms, 1),
        f"{tag}_active_voxels": n_vox,
        f"{tag}_surface_chunks": n_surf,
        f"{tag}_total_chunks": n_obj * (g // 16) ** 3,
        f"{tag}_remesh_budget": cfg.tpu.chunk_remesh_budget,
        f"{tag}_deferred_chunk_carves": rt.deferred_absorptions(),
        f"{tag}_dropped_mesh_elements": [int(dv), int(dt_drop)],
    }


if __name__ == "__main__":
    try:
        main()
    except Exception as exc:  # emit the failure as data, never rc!=0
        if RESULT.get("value", 0.0) == 0.0:
            RESULT["metric"] = "physics steps/sec at >=1M active voxels (FAILED)"
        RESULT["error"] = "".join(
            traceback.format_exception_only(type(exc), exc)
        ).strip()[:500]
        _emit()
    else:
        _emit()
