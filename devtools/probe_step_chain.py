"""Reproduce the bench's sustained-loop pathology: rt.step(100) measures
~830 ms/step while the identical scan program probes at ~4 ms/step with a
constant input. Times the REAL bench runtime's _step_k under (a) constant
input, (b) chained output->input, (c) rt.step(100) itself.
"""
import os, time
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import _bench_config

from impact_tpu.ecs import components as C
from impact_tpu.models import voxel_box_tumbler
from impact_tpu.runtime import HeadlessRuntime, compile_scene
from impact_tpu.voxel.object import nonempty_counts


def fetch(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.reshape(-1)[:1]))


def main():
    cfg = _bench_config(64, 1920, 1080)
    world = voxel_box_tumbler(n_boxes=62, seed=3)
    for eid in world.entities_with(C.VoxelBox):
        world.set_field(eid, C.VoxelBox, "extent_x", 26.0)
        world.set_field(eid, C.VoxelBox, "extent_y", 26.0)
        world.set_field(eid, C.VoxelBox, "extent_z", 26.0)
    t0 = time.perf_counter()
    build = compile_scene(world, cfg)
    print(f"[chain] compile_scene {time.perf_counter()-t0:.0f}s", flush=True)
    rt = HeadlessRuntime(build, cfg, enable_fracturing=False)
    t0 = time.perf_counter()
    rt.step(2 * rt._step_batch_size)
    print(f"[chain] warmup {time.perf_counter()-t0:.0f}s", flush=True)

    sim = rt.sim
    params = rt.params

    def t(name, fn, n=1):
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"[chain] {name:44s} {dt:9.1f} ms", flush=True)

    t0 = time.perf_counter(); fetch(sim); print(f"[chain] fetch {time.perf_counter()-t0:.3f}s", flush=True)

    def const12():
        for _ in range(12):
            out = rt._step_k(sim, params)
        fetch(out)
    t("12 x _step_k CONST input (96 steps)", const12)

    def chain12():
        s = sim
        for _ in range(12):
            s = rt._step_k(s, params)
        fetch(s)
    t("12 x _step_k CHAINED (96 steps)", chain12)

    def single4():
        s = sim
        for _ in range(4):
            s = rt._step(s, params)
        fetch(s)
    t0 = time.perf_counter(); single4()
    print(f"[chain] 4 x _step single incl compile {time.perf_counter()-t0:.0f}s", flush=True)
    t("4 x _step single CHAINED", single4)

    t0 = time.perf_counter()
    rt.step(100)
    fetch(rt.sim)
    dt = time.perf_counter() - t0
    print(f"[chain] rt.step(100) {dt*1e3:.0f} ms ({dt*10:.1f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
