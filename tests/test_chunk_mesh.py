"""Chunk-gated incremental meshing (ref: object/sdf.rs 18³ padded chunk
windows + mesh.rs ChunkSubmeshManager per-chunk submeshes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from impact_tpu.scene.materials import default_registry, material_corner_table
from impact_tpu.voxel import empty_voxel_object_pool, generate_sdf_grid
from impact_tpu.voxel import sdf as sdflib
from impact_tpu.voxel.chunk_mesh import (
    ChunkMeshPool,
    empty_chunk_mesh_pool,
    mark_objects_dirty,
    remesh_chunks,
    reset_objects,
)
from impact_tpu.voxel.mesh import (
    bake_mesh_materials,
    compact_mesh_batched,
    make_surface_nets_batched,
)

G = 32
TABLE = material_corner_table(default_registry())


def sphere_pool(radius=10.0, n_objects=2, extent=1.0):
    pool = empty_voxel_object_pool(n_objects, G)
    s, origin = generate_sdf_grid(sdflib.sphere(radius), G, extent)
    return pool._replace(
        sdf=pool.sdf.at[0].set(s),
        origin=pool.origin.at[0].set(origin),
        alive=pool.alive.at[0].set(True),
    )


def mesh_all(cpool, pool, budget=16, vert_cap=1024, merge=0, max_rounds=64):
    for _ in range(max_rounds):
        if not bool(jnp.any(cpool.chunk_dirty & pool.alive[:, None])):
            break
        cpool = remesh_chunks(cpool, pool, TABLE, budget, vert_cap,
                              merge_levels=merge)
    return cpool


def tri_multiset(tri_pos9, tri_active, decimals=3):
    """Canonical multiset of active triangles by rounded corner coords."""
    tris = np.asarray(tri_pos9)[np.asarray(tri_active)]
    out = set()
    for t in tris.round(decimals):
        corners = sorted(map(tuple, t.reshape(3, 3)))
        out.add(tuple(map(tuple, corners)))
    return out


def dense_mesh(pool, merge=0):
    full = make_surface_nets_batched(merge)(pool.sdf, pool.vtype)
    cm = compact_mesh_batched(full, 4096, 8192)
    return bake_mesh_materials(cm, TABLE)


class TestChunkedMeshing:
    def test_matches_dense_mesh_exactly(self):
        pool = sphere_pool()
        cpool = empty_chunk_mesh_pool(16, 2048, pool.n_objects, G)
        cpool = mark_objects_dirty(cpool, pool.alive)
        cpool = mesh_all(cpool, pool)
        assert not bool(jnp.any(cpool.chunk_dirty[0]))
        assert int(cpool.n_dropped_tris) == 0
        assert int(cpool.n_dropped_chunks) == 0

        dense = dense_mesh(pool)
        got = tri_multiset(
            cpool.tri_pos.reshape(-1, 9), cpool.tri_active.reshape(-1)
        )
        want = tri_multiset(dense.tri_pos[0], dense.tri_active[0])
        assert got == want

    def test_merge_levels_preserve_surface_area(self):
        # quad merging is chunk-local (dense may merge across borders), so
        # compare total area, which merging preserves exactly
        pool = sphere_pool()
        cpool = empty_chunk_mesh_pool(16, 2048, pool.n_objects, G)
        cpool = mark_objects_dirty(cpool, pool.alive)
        cpool = mesh_all(cpool, pool, merge=2)

        def area(tri_pos9, act):
            t = np.asarray(tri_pos9)[np.asarray(act)]
            a, b, c = t[:, 0:3], t[:, 3:6], t[:, 6:9]
            return float(
                0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=-1).sum()
            )

        dense = dense_mesh(pool, merge=2)
        a_chunk = area(cpool.tri_pos.reshape(-1, 9), cpool.tri_active.reshape(-1))
        a_dense = area(dense.tri_pos[0], dense.tri_active[0])
        assert abs(a_chunk - a_dense) / a_dense < 1e-4
        # merging collapses flat quads: a box's faces shrink the active
        # triangle count substantially even with chunk-local merging
        box = empty_voxel_object_pool(1, G)
        s, origin = generate_sdf_grid(sdflib.box((24.0, 24.0, 24.0)), G, 1.0)
        box = box._replace(
            sdf=box.sdf.at[0].set(s),
            origin=box.origin.at[0].set(origin),
            alive=box.alive.at[0].set(True),
        )
        def count(merge):
            cp = empty_chunk_mesh_pool(16, 4096, 1, G)
            cp = mark_objects_dirty(cp, box.alive)
            cp = mesh_all(cp, box, vert_cap=2048, merge=merge)
            assert int(cp.n_dropped_tris) == 0
            return int(cp.tri_active.sum())

        assert count(2) < 0.6 * count(0)

    def test_only_surface_chunks_take_slots(self):
        pool = sphere_pool(radius=10.0)
        cpool = empty_chunk_mesh_pool(16, 2048, pool.n_objects, G)
        cpool = mark_objects_dirty(cpool, pool.alive)
        cpool = mesh_all(cpool, pool)
        # a radius-10 sphere centered in 32³: all 8 chunks cross the surface
        assert int(cpool.active.sum()) == 8
        # dead object's chunks never allocate
        assert not bool(jnp.any(cpool.slot_of[1] >= 0))

    def test_incremental_update_edits_one_chunk(self):
        pool = sphere_pool()
        cpool = empty_chunk_mesh_pool(16, 2048, pool.n_objects, G)
        cpool = mark_objects_dirty(cpool, pool.alive)
        cpool = mesh_all(cpool, pool)
        slots_before = np.asarray(cpool.slot_of[0]).copy()

        # carve a notch inside chunk (1,1,1)'s interior, re-mark, remesh
        sdf = pool.sdf.at[0, 20:24, 20:24, 20:24].set(2.0)
        pool2 = pool._replace(sdf=sdf)
        cpool = mark_objects_dirty(cpool, pool2.alive)
        cpool2 = mesh_all(cpool, pool2)
        # result equals a fresh full remesh of the edited pool
        fresh = empty_chunk_mesh_pool(16, 2048, pool2.n_objects, G)
        fresh = mark_objects_dirty(fresh, pool2.alive)
        fresh = mesh_all(fresh, pool2)
        assert tri_multiset(
            cpool2.tri_pos.reshape(-1, 9), cpool2.tri_active.reshape(-1)
        ) == tri_multiset(
            fresh.tri_pos.reshape(-1, 9), fresh.tri_active.reshape(-1)
        )
        # unedited chunks kept their slots
        same = slots_before == np.asarray(cpool2.slot_of[0])
        assert same.sum() >= 4

    def test_slot_exhaustion_counts_and_retries(self):
        pool = sphere_pool()
        cpool = empty_chunk_mesh_pool(4, 2048, pool.n_objects, G)  # too few
        cpool = mark_objects_dirty(cpool, pool.alive)
        cpool = remesh_chunks(cpool, pool, TABLE, 16, 1024)
        assert int(cpool.n_dropped_chunks) > 0
        # blocked chunks stay dirty for retry
        assert bool(jnp.any(cpool.chunk_dirty[0]))

    def test_reset_objects_frees_slots(self):
        pool = sphere_pool()
        cpool = empty_chunk_mesh_pool(16, 2048, pool.n_objects, G)
        cpool = mark_objects_dirty(cpool, pool.alive)
        cpool = mesh_all(cpool, pool)
        n_active = int(cpool.active.sum())
        assert n_active > 0
        cpool2 = reset_objects(cpool, jnp.asarray([True, False]))
        assert int(cpool2.active.sum()) == 0
        assert not bool(jnp.any(cpool2.slot_of[0] >= 0))
        assert bool(jnp.all(cpool2.chunk_dirty[0]))


class TestChunkedEngine:
    def _runtime(self, chunked, absorb=False):
        from impact_tpu.ecs import components as C
        from impact_tpu.models import voxel_box_tumbler
        from impact_tpu.runtime import HeadlessRuntime, compile_scene
        from impact_tpu.utils.config import EngineConfig

        cfg = EngineConfig()
        cfg.tpu.max_voxel_objects = 4
        cfg.tpu.max_bodies = 16
        cfg.tpu.max_contacts = 128
        cfg.tpu.voxel_grid_size = 32
        cfg.tpu.render_width = 96
        cfg.tpu.render_height = 64
        cfg.tpu.chunked_remesh = chunked
        cfg.tpu.chunk_remesh_budget = 8
        cfg.rendering.shadow_mapping.enabled = False
        cfg.physics.simulator.initial_time_step_duration = 0.01
        world = voxel_box_tumbler(n_boxes=2)
        for eid in world.entities_with(C.VoxelBox):
            world.set_field(eid, C.VoxelBox, "extent_x", 10.0)
            world.set_field(eid, C.VoxelBox, "extent_y", 10.0)
            world.set_field(eid, C.VoxelBox, "extent_z", 10.0)
        if absorb:
            world.create_entity(
                C.ReferenceFrame(position=(0.0, 6.0, 0.0)),
                C.VoxelAbsorbingSphere(offset=(0, 0, 0), radius=6.0,
                                       rate=50.0),
            )
        return HeadlessRuntime(compile_scene(world, cfg), cfg,
                               enable_fracturing=False)

    def test_chunked_render_matches_dense(self):
        rt_d = self._runtime(chunked=False)
        rt_c = self._runtime(chunked=True)
        img_d = np.asarray(rt_d.render())
        img_c = np.asarray(rt_c.render())
        # identical triangles (proven above) → identical frames
        np.testing.assert_array_equal(img_d, img_c)

    def test_chunked_step_trajectories_match_dense(self):
        rt_d = self._runtime(chunked=False)
        rt_c = self._runtime(chunked=True)
        rt_d.step(30)
        rt_c.step(30)
        np.testing.assert_allclose(
            np.asarray(rt_d.sim.phys.bodies.position),
            np.asarray(rt_c.sim.phys.bodies.position),
            atol=1e-5,
        )
        assert rt_c.dropped_mesh_elements() == (0, 0)

    def test_chunked_absorption_remeshes_incrementally(self):
        rt = self._runtime(chunked=True, absorb=True)
        before = int(jnp.sum(rt.sim.meshes.tri_active))
        total0 = int(np.sum(np.asarray(
            __import__("impact_tpu.voxel.object", fromlist=["nonempty_counts"])
            .nonempty_counts(rt.sim.voxels)
        )))
        rt.step(40)
        from impact_tpu.voxel.object import nonempty_counts

        total1 = int(np.sum(np.asarray(nonempty_counts(rt.sim.voxels))))
        assert total1 < total0  # absorber ate voxels
        # the absorber is STILL eating, so fresh dirt appears each step —
        # the backlog must stay bounded by the budget, not run away
        n_dirty = int(jnp.sum(
            rt.sim.meshes.chunk_dirty & rt.sim.voxels.alive[:, None]
        ))
        assert n_dirty <= 2 * rt.config.tpu.chunk_remesh_budget, n_dirty
        after = int(jnp.sum(rt.sim.meshes.tri_active))
        assert after != before  # surface updated
        assert int(rt.sim.meshes.n_dropped_chunks) == 0
