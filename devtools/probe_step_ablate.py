"""Ablate the engine step's feature stages at bench conditions to find where
the time goes: voxel contacts, splitting (CCL fixpoint cond), remesh cond,
solver. Also times the k-step scan batch per step (what bench's rt.step(100)
actually runs) and larger batch sizes (dispatch amortization).
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
# sitecustomize pre-imports jax, so env vars alone never reach the config
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def _fetch(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf.reshape(-1)[:1]))


def main():
    from impact_tpu.ecs import components as C
    from impact_tpu.models import voxel_box_tumbler
    from impact_tpu.runtime import HeadlessRuntime, compile_scene
    from impact_tpu.runtime.engine import make_engine_step
    from impact_tpu.utils.config import EngineConfig

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
    print(f"[ablate] compile_scene {time.perf_counter() - t0:.0f}s", flush=True)
    rt = HeadlessRuntime(build, cfg, enable_fracturing=False)
    rt.step(3)
    sim = rt.sim
    params = rt.params

    _fetch(jnp.ones((4,)))
    t0 = time.perf_counter()
    for _ in range(5):
        _fetch(jnp.ones((4,)))
    fc = (time.perf_counter() - t0) / 5
    print(f"[ablate] fetch/dispatch floor {fc * 1e3:.1f} ms", flush=True)

    def timeit(name, fn, n=20):
        t0 = time.perf_counter()
        _fetch(fn())
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        _fetch(out)
        dt = max(time.perf_counter() - t0 - fc, 0.0) / n * 1e3
        print(
            f"[ablate] {name:44s} {dt:8.2f} ms   (compile {compile_s:.0f}s)",
            flush=True,
        )
        return dt

    variants = {
        "full": {},
        "no voxel contacts": dict(enable_voxel_contacts=False),
        "no splitting": dict(enable_splitting=False),
        "no split+contacts": dict(
            enable_voxel_contacts=False, enable_splitting=False
        ),
    }
    for name, kw in variants.items():
        feat = dict(
            enable_absorption=True, enable_splitting=True,
            enable_fracturing=False,
        )
        feat.update(kw)
        fn = jax.jit(
            make_engine_step(
                params, cfg, rt.info["mesh_vert_cap"],
                rt.info["mesh_tri_cap"], **feat,
            )
        )
        timeit(f"step [{name}]", lambda fn=fn: fn(sim, params))

    # solver iteration cost: halve iterations
    import copy

    cfg2 = copy.deepcopy(cfg)
    cfg2.physics.constraint_solver.n_iterations = 1
    cfg2.physics.constraint_solver.n_positional_correction_iterations = 0
    fn = jax.jit(
        make_engine_step(
            params, cfg2, rt.info["mesh_vert_cap"], rt.info["mesh_tri_cap"],
            enable_absorption=True, enable_splitting=True,
            enable_fracturing=False,
        )
    )
    timeit("step [solver 1 iter, 0 poscorr]", lambda: fn(sim, params))

    # scan-batched stepping at several k (per-step cost incl. dispatch)
    step_fn = make_engine_step(
        params, cfg, rt.info["mesh_vert_cap"], rt.info["mesh_tri_cap"],
        enable_absorption=True, enable_splitting=True, enable_fracturing=False,
    )
    for k in (8, 32):
        def step_k(sim, params, k=k):
            def body(s, _):
                return step_fn(s, params), None

            s, _ = jax.lax.scan(body, sim, None, length=k)
            return s

        f = jax.jit(step_k)
        dt = timeit(f"scan k={k} (whole batch)", lambda f=f: f(sim, params), n=5)
        print(f"[ablate]   -> per step {dt / k:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
