"""Break down voxel_contacts' cost at bench shapes on the real chip.

Methodology: each piece runs K times inside ONE jitted lax.fori_loop whose
body perturbs an input by i*1e-20 (prevents loop-invariant hoisting/CSE) and
accumulates a scalar of the output (prevents dead-code elimination). One
dispatch per measurement — per-call tunnel overhead (~15-30 ms) otherwise
swamps ms-scale kernels. Closed-over arrays are fine here because the loop
body still executes K times.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

K = 32


def _scalar_of(tree):
    leaves = jax.tree.leaves(tree)
    acc = jnp.float32(0)
    for x in leaves:
        acc = acc + jnp.sum(x.reshape(-1)[:1].astype(jnp.float32))
    return acc


def main():
    from impact_tpu.ecs import components as C
    from impact_tpu.models import voxel_box_tumbler
    from impact_tpu.runtime import HeadlessRuntime, compile_scene
    from impact_tpu.utils.config import EngineConfig
    from impact_tpu.voxel.collision import (
        voxel_contacts,
        separating_contacts_for_interlocked,
        sample_sdf_trilinear_with_gradient,
    )
    from impact_tpu.physics.collision import compact_contacts

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
    print(f"[vc] compile_scene {time.perf_counter() - t0:.0f}s", flush=True)
    rt = HeadlessRuntime(build, cfg, enable_fracturing=False)
    rt.step(3)
    sim = rt.sim

    pool = sim.voxels
    probes = sim.probes
    coll = rt.params.phys_params.collidables
    pos = sim.phys.bodies.position
    ori = sim.phys.bodies.orientation
    o, p = probes.active.shape
    npl = coll.pln_mask.shape[0]
    ns = coll.sph_mask.shape[0]
    mp = min(o * o, max(16, 4 * o))
    n_cand = o * p * npl + o * p * ns + mp * p + mp
    print(f"[vc] O={o} P={p} Npl={npl} Ns={ns} MP={mp}  candidates={n_cand}",
          flush=True)

    def timeit(name, body):
        """body(i) -> output tree; runs K times in one jit."""

        @jax.jit
        def loop():
            def step(i, acc):
                return acc + _scalar_of(body(i))

            return jax.lax.fori_loop(0, K, step, jnp.float32(0))

        t0 = time.perf_counter()
        loop().block_until_ready()
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        loop().block_until_ready()
        dt = (time.perf_counter() - t0) / K * 1e3
        print(f"[vc] {name:44s} {dt:8.2f} ms   (compile {compile_s:.0f}s)",
              flush=True)
        return dt

    eps = 1e-20

    timeit(
        "voxel_contacts full",
        lambda i: voxel_contacts(
            pool, probes, coll, pos + i * eps, ori, 1024
        ),
    )

    # compaction alone over the full candidate count
    key = np.random.default_rng(0)
    rnd_active = jnp.asarray(key.random(n_cand) < 2e-4)
    rnd_key = jnp.arange(n_cand, dtype=jnp.uint32)
    rnd_pos = jnp.asarray(key.random((n_cand, 3)), jnp.float32)
    rnd_dep = jnp.asarray(key.random(n_cand), jnp.float32)
    rnd_bod = jnp.zeros((n_cand,), jnp.int32)
    rnd_resp = jnp.asarray(key.random((n_cand, 3)), jnp.float32)

    timeit(
        f"compact_contacts argsort N={n_cand}",
        lambda i: compact_contacts(
            rnd_key, rnd_active, rnd_bod, rnd_bod, rnd_pos + i * eps, rnd_pos,
            rnd_dep, rnd_resp, 1024,
        ),
    )

    from impact_tpu.math import quaternion as quat

    body_idx = pool.body_index
    q_b = ori[body_idx]
    x_b = pos[body_idx]
    probe_world0 = quat.rotate(q_b[:, None, :], probes.pos_local) + x_b[:, None, :]
    q_inv = quat.conjugate(q_b)
    pair_a = jnp.arange(mp, dtype=jnp.int32) % o
    pair_b = (jnp.arange(mp, dtype=jnp.int32) + 1) % o

    def vv_body(i):
        probe_world = probe_world0 + i * eps

        def sample_pair(a_obj, b_obj):
            local = quat.rotate(
                q_inv[b_obj][None], probe_world[a_obj] - x_b[b_obj][None]
            )
            pts = (local - pool.origin[b_obj][None]) / pool.voxel_extent[b_obj]
            d, g_local = sample_sdf_trilinear_with_gradient(pool.sdf[b_obj], pts)
            return d, quat.rotate(q_b[b_obj][None], g_local)

        return jax.vmap(sample_pair)(pair_a, pair_b)

    timeit(f"vv SDF sampling pointwise [{mp},{p}]", vv_body)

    from impact_tpu.voxel.collision import (
        pack_cell_corners_i8,
        sample_packed_sdf_pairs,
    )
    from impact_tpu.voxel.encoding import is_encoded

    if is_encoded(pool.sdf):
        grid = pool.sdf.shape[-1]

        def vv_packed(i):
            probe_world = probe_world0 + i * eps
            packed_flat = pack_cell_corners_i8(pool.sdf).reshape(-1, 2)

            def sample_pair(a_obj, b_obj):
                local = quat.rotate(
                    q_inv[b_obj][None], probe_world[a_obj] - x_b[b_obj][None]
                )
                pts = (local - pool.origin[b_obj][None]) / pool.voxel_extent[b_obj]
                d, g_local = sample_packed_sdf_pairs(
                    packed_flat, b_obj, pts, grid
                )
                return d, quat.rotate(q_b[b_obj][None], g_local)

            return jax.vmap(sample_pair)(pair_a, pair_b)

        timeit(f"vv SDF sampling packed [{mp},{p}]", vv_packed)

    rng = np.random.default_rng(1)
    il_pos = jnp.asarray(rng.random((mp, p, 3)), jnp.float32)
    il_nrm = jnp.asarray(rng.random((mp, p, 3)), jnp.float32)
    il_dep = jnp.asarray(rng.random((mp, p)), jnp.float32)
    il_act = jnp.asarray(rng.random((mp, p)) < 0.05)
    timeit(
        "interlock analysis",
        lambda i: separating_contacts_for_interlocked(
            il_pos + i * eps, il_nrm, il_dep, il_act, x_b[pair_a], x_b[pair_b]
        ),
    )

    def sphere_body(i):
        probe_world = probe_world0 + i * eps
        sc = pos[coll.sph_body] + quat.rotate(ori[coll.sph_body], coll.sph_center)
        disp = probe_world[:, :, None, :] - sc[None, None, :, :]
        dist = jnp.linalg.norm(disp, axis=-1)
        nrm = disp / jnp.maximum(dist, 1e-9)[..., None]
        dep = coll.sph_radius[None, None, :] + 0.5 * pool.voxel_extent[:, None, None] - dist
        cpos = sc[None, None] + coll.sph_radius[None, None, :, None] * nrm
        return dep, cpos

    timeit(f"sphere candidates [O,P,Ns]={o}x{p}x{ns}", sphere_body)

    def topk_body(i):
        score = jnp.where(
            rnd_active, -jnp.arange(n_cand, dtype=jnp.int32),
            jnp.int32(-2**31 + 1),
        ) + (i * 0)
        _, idx = jax.lax.top_k(score, 1024)
        return rnd_key[idx], (rnd_pos + i * eps)[idx]

    timeit(f"top_k compaction N={n_cand}", topk_body)


if __name__ == "__main__":
    main()
