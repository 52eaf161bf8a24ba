"""Per-stage device-time breakdown of the bench frame on the real TPU.

Builds the same scene as bench.py and times each jitted stage separately:
step, scene_of, geometry, shadows, shade, post. Prints a JSON dict of
per-stage ms (block_until_ready around each call).
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(out):
    """True synchronization: under the axon tunnel block_until_ready does not
    block — only a host fetch does. The fetch itself costs tens of ms of
    round-trip, so timings use LONG dispatch loops with ONE fetch at the end,
    minus the measured fetch cost."""
    leaf = jax.tree.leaves(out)[0]
    flat = leaf.reshape(-1)
    np.asarray(jax.device_get(flat[:1]))


_FETCH_COST = None


def _fetch_cost():
    global _FETCH_COST
    if _FETCH_COST is None:
        x = jnp.ones((8,), jnp.float32)
        _fetch(x)
        t0 = time.perf_counter()
        for _ in range(5):
            _fetch(x)
        _FETCH_COST = (time.perf_counter() - t0) / 5
        print(f"[prof] fetch cost {_FETCH_COST*1e3:.0f} ms", flush=True)
    return _FETCH_COST


def timeit(fn, n=25):
    _fetch(fn())  # warm
    f = _fetch_cost()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    _fetch(out)
    return max(time.perf_counter() - t0 - f, 0.0) / n * 1e3


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
    cfg.tpu.render_width = int(os.environ.get("BENCH_WIDTH", "1920"))
    cfg.tpu.render_height = int(os.environ.get("BENCH_HEIGHT", "1080"))
    cfg.tpu.solver_mode = "jacobi"
    cfg.physics.simulator.initial_time_step_duration = 0.005
    cfg.rendering.shadow_mapping.omnidirectional_light_shadow_map_resolution = int(
        os.environ.get("BENCH_SHADOW_RES", "512")
    )
    cfg.tpu.render_tris_per_object = int(
        os.environ.get("BENCH_TRIS_PER_OBJ", "4096")
    )
    cfg.tpu.max_render_triangles = int(
        os.environ.get(
            "BENCH_TRIS",
            str(n_objects * cfg.tpu.render_tris_per_object + 64),
        )
    )
    cfg.tpu.sdf_encoding = "i8"

    world = voxel_box_tumbler(n_boxes=max(1, n_objects - 2), seed=3)
    for eid in world.entities_with(C.VoxelBox):
        world.set_field(eid, C.VoxelBox, "extent_x", 26.0)
        world.set_field(eid, C.VoxelBox, "extent_y", 26.0)
        world.set_field(eid, C.VoxelBox, "extent_z", 26.0)
    t0 = time.perf_counter()
    build = compile_scene(world, cfg)
    print(f"[prof] compile_scene {time.perf_counter() - t0:.0f}s", flush=True)
    rt = HeadlessRuntime(build, cfg, enable_fracturing=False)

    rt.step(2)
    print("[prof] step warm", flush=True)

    sim = rt.sim
    res = {}

    scene = rt._scene_of(sim)
    jax.block_until_ready(scene)
    res["scene_of"] = timeit(lambda: rt._scene_of(sim))
    print(f"[prof] scene_of {res['scene_of']:.1f}ms", flush=True)

    n_act = int(np.asarray(scene.tri_active.sum()))
    print(f"[prof] active tris after compaction: {n_act} / {scene.tri_active.shape[0]}", flush=True)

    gb, _geo_drops = rt._geometry(scene, sim.render.frame_index)
    jax.block_until_ready(gb)
    res["geometry"] = timeit(lambda: rt._geometry(scene, sim.render.frame_index))
    print(f"[prof] geometry {res['geometry']:.1f}ms", flush=True)

    sh = rt._shadows(scene)
    jax.block_until_ready(sh)
    res["shadows"] = timeit(lambda: rt._shadows(scene))
    print(f"[prof] shadows {res['shadows']:.1f}ms", flush=True)

    omni, uni, _shadow_drops = sh
    lum = rt._shade(gb, omni, uni, rt._textures)
    jax.block_until_ready(lum)
    res["shade"] = timeit(lambda: rt._shade(gb, omni, uni, rt._textures))
    print(f"[prof] shade {res['shade']:.1f}ms", flush=True)

    out = rt._post(lum, gb.motion, sim.render)
    jax.block_until_ready(out)
    res["post"] = timeit(lambda: rt._post(lum, gb.motion, sim.render))
    print(f"[prof] post {res['post']:.1f}ms", flush=True)

    res["step"] = timeit(lambda: rt._step(sim, rt.params), n=10)
    print(f"[prof] step {res['step']:.1f}ms", flush=True)

    res["total_render"] = sum(
        res[k] for k in ("scene_of", "geometry", "shadows", "shade", "post")
    )
    print(json.dumps({k: round(v, 1) for k, v in res.items()}), flush=True)


if __name__ == "__main__":
    main()
