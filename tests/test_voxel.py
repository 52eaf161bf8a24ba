"""Voxel subsystem tests — mirror impact_voxel unit/fuzz coverage
(object/meshing/inertia/absorption/split/fracture)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast gate

from impact_tpu.voxel import (
    empty_voxel_object_pool,
    generate_sdf_grid,
    surface_nets,
)
from impact_tpu.voxel import sdf as sdflib
from impact_tpu.voxel import inertia as vinertia
from impact_tpu.voxel.interaction import (
    apply_absorption,
    connected_component_labels,
    empty_absorber_pools,
    fracture_object,
    split_off_disconnected_region,
)
from impact_tpu.voxel.object import chunk_codes, occupancy, nonempty_counts, surface_mask

G = 32


def make_sphere_pool(radius=6.0, extent=1.0, n_objects=4):
    pool = empty_voxel_object_pool(n_objects, G)
    s, origin = generate_sdf_grid(sdflib.sphere(radius), G, extent)
    pool = pool._replace(
        sdf=pool.sdf.at[0].set(s),
        origin=pool.origin.at[0].set(origin),
        voxel_extent=pool.voxel_extent.at[0].set(extent),
        alive=pool.alive.at[0].set(True),
    )
    return pool


class TestSdf:
    def test_smooth_union_limits(self):
        d1, d2 = jnp.asarray(1.0), jnp.asarray(3.0)
        assert float(sdflib.sdf_union(d1, d2)) == 1.0
        # smooth union never exceeds hard min and only blends near equality
        assert float(sdflib.sdf_union(d1, d2, 0.5)) == 1.0
        assert float(sdflib.sdf_union(d1, jnp.asarray(1.1), 0.5)) < 1.0

    def test_subtraction_and_intersection(self):
        a, b = jnp.asarray(-1.0), jnp.asarray(-0.5)
        assert float(sdflib.sdf_subtraction(a, b)) == 0.5  # max(a, -b)
        assert float(sdflib.sdf_intersection(a, b)) == -0.5

    def test_graph_evaluate_sphere(self):
        g = sdflib.sphere(2.0)
        p = jnp.array([[0.0, 0.0, 0.0], [3.0, 0.0, 0.0]])
        d = sdflib.evaluate(g, p)
        np.testing.assert_allclose(d, [-2.0, 1.0], atol=1e-6)

    def test_graph_transforms(self):
        g = sdflib.translation(sdflib.sphere(1.0), (5.0, 0.0, 0.0))
        assert float(sdflib.evaluate(g, jnp.array([5.0, 0.0, 0.0]))) == pytest.approx(-1.0)
        g2 = sdflib.scaling(sdflib.sphere(1.0), 3.0)
        assert float(sdflib.evaluate(g2, jnp.array([0.0, 0.0, 0.0]))) == pytest.approx(-3.0)

    def test_union_of_translated_spheres(self):
        g = sdflib.union(
            sdflib.translation(sdflib.sphere(1.0), (-2.0, 0, 0)),
            sdflib.translation(sdflib.sphere(1.0), (2.0, 0, 0)),
        )
        d = sdflib.evaluate(g, jnp.array([[-2.0, 0, 0], [2.0, 0, 0], [0.0, 0, 0]]))
        np.testing.assert_allclose(d, [-1.0, -1.0, 1.0], atol=1e-6)

    def test_noise_bounded_and_deterministic(self):
        p = jax.random.uniform(jax.random.PRNGKey(0), (100, 3)) * 10
        n1 = sdflib.multifractal_noise(p, octaves=3, seed=7)
        n2 = sdflib.multifractal_noise(p, octaves=3, seed=7)
        np.testing.assert_array_equal(n1, n2)
        assert float(jnp.max(jnp.abs(n1))) <= 1.5
        n3 = sdflib.multifractal_noise(p, octaves=3, seed=8)
        assert not np.allclose(n1, n3)


class TestVoxelObject:
    def test_generated_sphere_occupancy(self):
        pool = make_sphere_pool(radius=6.0)
        count = int(nonempty_counts(pool)[0])
        expected = 4.0 / 3.0 * np.pi * 6.0**3
        assert abs(count - expected) / expected < 0.1
        assert int(nonempty_counts(pool)[1]) == 0  # dead object empty

    def test_chunk_codes(self):
        pool = make_sphere_pool(radius=10.0)
        codes = chunk_codes(pool)
        assert codes.shape == (4, 2, 2, 2)
        # a radius-10 sphere centered in a 32³ grid crosses every 16³ chunk
        assert int(jnp.max(codes[0])) == 2  # NON_UNIFORM present

    def test_surface_mask_is_shell(self):
        pool = make_sphere_pool(radius=6.0)
        occ = occupancy(pool)
        surf = surface_mask(occ)
        n_surf = int(jnp.sum(surf[0]))
        n_occ = int(jnp.sum(occ[0]))
        assert 0 < n_surf < n_occ
        # shell ≈ 4πr² voxels
        assert abs(n_surf - 4 * np.pi * 36) / (4 * np.pi * 36) < 0.5


class TestSurfaceNets:
    def test_sphere_mesh_statistics(self):
        s, _ = generate_sdf_grid(sdflib.sphere(6.0), G, 1.0)
        mesh = surface_nets(s, jnp.zeros((G, G, G), jnp.int32))
        nv = int(jnp.sum(mesh.vert_active))
        nt = int(jnp.sum(mesh.tri_active))
        assert nv > 100 and nt > 100
        # Euler characteristic of a sphere mesh: V - E + F = 2; quads → F = T/2…
        # just sanity-check T ≈ 2V (closed quad mesh)
        assert 1.5 < nt / nv < 2.5

    def test_material_blending_at_type_boundary(self):
        """Vertices on a two-type boundary carry both types with nonzero blend
        (ref: surface_nets.rs:39-50 ≤7-material vertex weights)."""
        s, _ = generate_sdf_grid(sdflib.sphere(6.0), G, 1.0)
        vt = jnp.where(
            jnp.arange(G)[:, None, None] < G // 2, 0, 1
        ) * jnp.ones((G, G, G), jnp.int32)
        mesh = surface_nets(s, vt)
        act = np.asarray(mesh.vert_active)
        t1 = np.asarray(mesh.vert_type)[act]
        t2 = np.asarray(mesh.vert_type2)[act]
        blend = np.asarray(mesh.vert_blend)[act]
        # both pure regions exist
        assert set(np.unique(t1)) == {0, 1}
        # boundary vertices blend the two types
        mixed = t1 != t2
        assert mixed.any()
        assert (blend[mixed] > 0.0).all() and (blend[mixed] <= 0.5 + 1e-6).all()
        # pure vertices do not blend
        assert np.allclose(blend[~mixed], 0.0)

    def test_exact_census_bake_at_three_material_junction(self):
        """The remesh-time bake blends ALL materials adjacent to a vertex
        with their census weights (VERDICT-r4 item 9; ref surface_nets.rs:
        39-50 ≤7 weighted vertex materials — here exact over ≤8). At a
        3-material junction the baked color is the exact weighted average,
        which the top-2 reduction cannot represent."""
        from impact_tpu.voxel.mesh import bake_mesh_materials, compact_mesh

        s, _ = generate_sdf_grid(sdflib.sphere(6.0), G, 1.0)
        # three material sectors meeting along the x-axis-ish junction
        i = jnp.arange(G)
        vt = jnp.zeros((G, G, G), jnp.int32)
        vt = jnp.where(i[None, :, None] >= G // 2, 1, vt)
        vt = jnp.where(
            (i[None, None, :] >= G // 2) & (i[None, :, None] >= G // 2),
            2, vt,
        )
        mesh = surface_nets(s, vt)
        act = np.asarray(mesh.vert_active)
        ct = np.asarray(mesh.vert_ctype)
        cw = np.asarray(mesh.vert_cweight)
        # census weights are a partition of unity on active vertices
        np.testing.assert_allclose(cw[act].sum(axis=-1), 1.0, atol=1e-5)
        # some vertex sees all three materials
        n_distinct = np.array([
            len(np.unique(ct[v][cw[v] > 1e-6])) for v in np.where(act)[0]
        ])
        assert (n_distinct >= 3).any()

        # exact bake == census-weighted table average at every active corner
        table = jnp.asarray(
            np.linspace(0.1, 1.0, 3 * 10, dtype=np.float32).reshape(3, 10)
        )
        cm = bake_mesh_materials(compact_mesh(mesh, 2048, 4096), table)
        tidx = np.asarray(cm.tri_indices)
        tact = np.asarray(cm.tri_active)
        got_albedo = np.asarray(cm.tri_albedo).reshape(-1, 3, 3)
        vct = np.asarray(cm.vert_ctype)
        vcw = np.asarray(cm.vert_cweight)
        tbl = np.asarray(table)
        t_sel = np.where(tact)[0][:40]
        for t in t_sel:
            for c in range(3):
                v = tidx[t, c]
                want = (vcw[v][:, None] * tbl[vct[v]][:, 0:3]).sum(axis=0)
                np.testing.assert_allclose(
                    got_albedo[t, c], want, atol=1e-5
                )

    def test_vertices_near_surface(self):
        r = 6.0
        s, origin = generate_sdf_grid(sdflib.sphere(r), G, 1.0)
        mesh = surface_nets(s, jnp.zeros((G, G, G), jnp.int32))
        pos = mesh.vert_pos + origin  # grid units == world units (extent 1)
        dist = jnp.abs(jnp.linalg.norm(pos, axis=-1) - r)
        max_err = float(jnp.max(jnp.where(mesh.vert_active, dist, 0.0)))
        assert max_err < 0.9  # within one voxel of the true surface

    def test_normals_point_outward(self):
        s, origin = generate_sdf_grid(sdflib.sphere(6.0), G, 1.0)
        mesh = surface_nets(s, jnp.zeros((G, G, G), jnp.int32))
        pos = mesh.vert_pos + origin
        radial = pos / jnp.maximum(jnp.linalg.norm(pos, axis=-1, keepdims=True), 1e-9)
        dots = jnp.sum(radial * mesh.vert_normal, axis=-1)
        active_dots = jnp.where(mesh.vert_active, dots, 1.0)
        assert float(jnp.min(active_dots)) > 0.5

    def test_triangles_reference_active_vertices(self):
        s, _ = generate_sdf_grid(sdflib.sphere(6.0), G, 1.0)
        mesh = surface_nets(s, jnp.zeros((G, G, G), jnp.int32))
        tri_verts = mesh.vert_active[mesh.tri_indices]  # [T,3]
        ok = jnp.all(tri_verts, axis=-1) | ~mesh.tri_active
        assert bool(jnp.all(ok))

    def test_winding_consistent(self):
        # signed volume of the closed mesh should be ≈ +sphere volume
        r = 6.0
        s, origin = generate_sdf_grid(sdflib.sphere(r), G, 1.0)
        mesh = surface_nets(s, jnp.zeros((G, G, G), jnp.int32))
        v = mesh.vert_pos + origin
        a = v[mesh.tri_indices[:, 0]]
        b = v[mesh.tri_indices[:, 1]]
        c = v[mesh.tri_indices[:, 2]]
        vol6 = jnp.sum(jnp.where(mesh.tri_active, jnp.einsum("td,td->t", a, jnp.cross(b, c)), 0.0))
        vol = float(vol6 / 6.0)
        expected = 4.0 / 3.0 * np.pi * r**3
        assert abs(vol - expected) / expected < 0.15, vol


class TestVoxelInertia:
    def test_sphere_inertia_matches_analytic(self):
        pool = make_sphere_pool(radius=8.0)
        dens = jnp.array([2.0])
        mass, com, inertia = vinertia.inertial_properties(pool, dens)
        r = 8.0
        m_expected = 2.0 * 4 / 3 * np.pi * r**3
        assert abs(float(mass[0]) - m_expected) / m_expected < 0.1
        np.testing.assert_allclose(com[0], 0.0, atol=0.1)
        i_expected = 0.4 * m_expected * r**2
        np.testing.assert_allclose(jnp.diag(inertia[0]), i_expected, rtol=0.1)
        # off-diagonals ≈ 0
        assert abs(float(inertia[0, 0, 1])) < 0.01 * i_expected


class TestDeformation:
    def test_absorption_removes_voxels(self):
        pool = make_sphere_pool(radius=6.0)
        absorbers = empty_absorber_pools()
        absorbers = absorbers._replace(
            sph_body=absorbers.sph_body.at[0].set(1),  # body 1 at origin
            sph_offset=absorbers.sph_offset.at[0].set(jnp.array([7.0, 0.0, 0.0])),
            sph_radius=absorbers.sph_radius.at[0].set(3.0),
            sph_mask=absorbers.sph_mask.at[0].set(True),
        )
        n_bodies = 4
        pos = jnp.zeros((n_bodies, 3))
        ori = jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (n_bodies, 1))
        before = int(nonempty_counts(pool)[0])
        pool2 = apply_absorption(pool, absorbers, pos, ori)
        after = int(nonempty_counts(pool2)[0])
        assert after < before
        assert bool(pool2.mesh_dirty[0])

    def test_gated_absorption_matches_dense(self):
        """Object-gated absorption (bounding-sphere prefilter + gathered
        sub-pool) is exact vs the dense pass when the cap suffices, and
        leaves non-overlapping objects untouched (VERDICT-r2 weak item 10)."""
        n_obj = 6
        pool = empty_voxel_object_pool(n_obj, G)
        s, origin = generate_sdf_grid(sdflib.sphere(6.0), G, 1.0)
        for i in range(n_obj):
            pool = pool._replace(
                sdf=pool.sdf.at[i].set(s),
                origin=pool.origin.at[i].set(origin),
                voxel_extent=pool.voxel_extent.at[i].set(1.0),
                alive=pool.alive.at[i].set(True),
                body_index=pool.body_index.at[i].set(i),
            )
        absorbers = empty_absorber_pools()
        absorbers = absorbers._replace(
            sph_body=absorbers.sph_body.at[0].set(n_obj),
            sph_offset=absorbers.sph_offset.at[0].set(
                jnp.array([7.0, 0.0, 0.0])),
            sph_radius=absorbers.sph_radius.at[0].set(3.0),
            sph_mask=absorbers.sph_mask.at[0].set(True),
        )
        # objects 0,1 near the absorber; the rest far away
        pos = jnp.zeros((n_obj + 1, 3))
        pos = pos.at[1].set(jnp.array([2.0, 0.0, 0.0]))
        for i in range(2, n_obj):
            pos = pos.at[i].set(jnp.array([500.0 * i, 0.0, 0.0]))
        ori = jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (n_obj + 1, 1))

        dense = apply_absorption(pool, absorbers, pos, ori)
        gated = apply_absorption(pool, absorbers, pos, ori, gate_cap=3)
        np.testing.assert_array_equal(np.asarray(dense.sdf),
                                      np.asarray(gated.sdf))
        np.testing.assert_array_equal(np.asarray(dense.mesh_dirty),
                                      np.asarray(gated.mesh_dirty))
        assert bool(gated.mesh_dirty[0]) and bool(gated.mesh_dirty[1])
        assert not bool(gated.mesh_dirty[2])
        # far objects' SDFs are bit-identical (never gathered)
        np.testing.assert_array_equal(np.asarray(pool.sdf[2:]),
                                      np.asarray(gated.sdf[2:]))

    def test_chunk_gated_absorption_matches_dense(self):
        """Chunk-gated absorption (VERDICT-r4 item 4: carve only
        absorber-overlapped chunk windows, ref absorption.rs:434) carves
        exactly the dense result when the pair budget suffices, and its
        dirty-chunk mask covers the 18³ mesh window of every changed
        voxel (conservative invalidation — an unmarked chunk's submesh can
        never depend on a changed voxel)."""
        from impact_tpu.voxel.interaction import (
            apply_absorption_chunk_gated,
        )
        from impact_tpu.voxel.object import CHUNK_SIZE

        n_obj = 4
        pool = empty_voxel_object_pool(n_obj, G)
        s, origin = generate_sdf_grid(sdflib.sphere(6.0), G, 1.0)
        for i in range(n_obj):
            pool = pool._replace(
                sdf=pool.sdf.at[i].set(s),
                origin=pool.origin.at[i].set(origin),
                voxel_extent=pool.voxel_extent.at[i].set(1.0),
                alive=pool.alive.at[i].set(True),
                body_index=pool.body_index.at[i].set(i),
            )
        absorbers = empty_absorber_pools()
        absorbers = absorbers._replace(
            sph_body=absorbers.sph_body.at[0].set(n_obj),
            sph_offset=absorbers.sph_offset.at[0].set(
                jnp.array([7.0, 0.0, 0.0])),
            sph_radius=absorbers.sph_radius.at[0].set(3.0),
            sph_mask=absorbers.sph_mask.at[0].set(True),
        )
        pos = jnp.zeros((n_obj + 1, 3))
        pos = pos.at[1].set(jnp.array([2.0, 0.0, 0.0]))
        pos = pos.at[2].set(jnp.array([500.0, 0.0, 0.0]))  # far
        ori = jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (n_obj + 1, 1))

        dense = apply_absorption(pool, absorbers, pos, ori)
        nc = G // CHUNK_SIZE
        carved, changed, dirty, deferred = apply_absorption_chunk_gated(
            pool, absorbers, pos, ori, pair_budget=n_obj * nc**3
        )
        np.testing.assert_array_equal(
            np.asarray(dense.sdf), np.asarray(carved.sdf)
        )
        np.testing.assert_array_equal(
            np.asarray(dense.mesh_dirty), np.asarray(changed)
        )
        assert int(deferred) == 0
        # conservative dirt: every chunk whose 18³ window contains a changed
        # voxel is marked
        diff = np.asarray(dense.sdf != pool.sdf)  # [O,G,G,G]
        dirty_np = np.asarray(dirty).reshape(n_obj, nc, nc, nc)
        ch_x, ch_y, ch_z = np.where(
            np.ones((nc, nc, nc), bool)
        )
        for o in range(n_obj):
            pts = np.argwhere(diff[o])
            for x, y, z in pts[:: max(1, len(pts) // 50)]:
                for cx in range(nc):
                    for cy in range(nc):
                        for cz in range(nc):
                            lo = np.array([cx, cy, cz]) * CHUNK_SIZE - 1
                            hi = lo + CHUNK_SIZE + 2
                            if np.all((x, y, z) >= lo) and np.all(
                                (x, y, z) < hi
                            ):
                                assert dirty_np[o, cx, cy, cz], (
                                    o, cx, cy, cz, x, y, z
                                )

    def test_chunk_gated_absorption_budget_defers(self):
        """A pair budget below the overlap count carves a subset, counts the
        deferral, and later calls finish the job (lag, not loss)."""
        from impact_tpu.voxel.interaction import (
            apply_absorption_chunk_gated,
        )

        pool = make_sphere_pool(radius=6.0)
        absorbers = empty_absorber_pools()
        absorbers = absorbers._replace(
            sph_body=absorbers.sph_body.at[0].set(1),
            sph_offset=absorbers.sph_offset.at[0].set(
                jnp.array([7.0, 0.0, 0.0])),
            sph_radius=absorbers.sph_radius.at[0].set(3.0),
            sph_mask=absorbers.sph_mask.at[0].set(True),
        )
        pos = jnp.zeros((4, 3))
        ori = jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (4, 1))
        dense = apply_absorption(pool, absorbers, pos, ori)
        p, changed, _, deferred = apply_absorption_chunk_gated(
            pool, absorbers, pos, ori, pair_budget=1
        )
        assert int(deferred) > 0
        # keep carving with the tiny budget until the deferral drains (the
        # rotation round-robins the selection like the engine's step count
        # does — without it a static absorber would re-pick the same chunk)
        for i in range(64):
            p, _, _, deferred = apply_absorption_chunk_gated(
                p, absorbers, pos, ori, pair_budget=1, rotation=i + 1
            )
        # one carve step of the dense pass == the drained chunked carves
        np.testing.assert_array_equal(
            np.asarray(dense.sdf), np.asarray(p.sdf)
        )

    def test_deferred_absorption_count(self):
        """Gate-cap overflow is counted, not silent: with more overlapping
        objects than the cap, the deferred count is hits − cap; with a cap
        covering the pool it is 0 (VERDICT-r3 weak item 6)."""
        from impact_tpu.voxel.interaction import deferred_absorption_count

        n_obj = 6
        pool = empty_voxel_object_pool(n_obj, G)
        s, origin = generate_sdf_grid(sdflib.sphere(6.0), G, 1.0)
        for i in range(n_obj):
            pool = pool._replace(
                sdf=pool.sdf.at[i].set(s),
                origin=pool.origin.at[i].set(origin),
                voxel_extent=pool.voxel_extent.at[i].set(1.0),
                alive=pool.alive.at[i].set(True),
                body_index=pool.body_index.at[i].set(i),
            )
        absorbers = empty_absorber_pools()
        absorbers = absorbers._replace(
            sph_body=absorbers.sph_body.at[0].set(n_obj),
            sph_radius=absorbers.sph_radius.at[0].set(3.0),
            sph_mask=absorbers.sph_mask.at[0].set(True),
        )
        # 5 objects stacked on the absorber, one far away
        pos = jnp.zeros((n_obj + 1, 3))
        pos = pos.at[5].set(jnp.array([500.0, 0.0, 0.0]))
        ori = jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (n_obj + 1, 1))
        assert int(deferred_absorption_count(
            pool, absorbers, pos, ori, gate_cap=3)) == 2
        assert int(deferred_absorption_count(
            pool, absorbers, pos, ori, gate_cap=5)) == 0
        assert int(deferred_absorption_count(
            pool, absorbers, pos, ori, gate_cap=n_obj)) == 0

    def test_ccl_single_component(self):
        pool = make_sphere_pool(radius=6.0)
        occ = occupancy(pool)[0]
        labels = connected_component_labels(occ)
        uniq = np.unique(np.asarray(labels))
        assert len(uniq[uniq >= 0]) == 1

    def test_ccl_two_components(self):
        g = sdflib.union(
            sdflib.translation(sdflib.sphere(3.0), (-6.0, 0, 0)),
            sdflib.translation(sdflib.sphere(3.0), (6.0, 0, 0)),
        )
        s, _ = generate_sdf_grid(g, G, 1.0)
        occ = s < 0
        labels = connected_component_labels(occ)
        uniq = np.unique(np.asarray(labels))
        assert len(uniq[uniq >= 0]) == 2

    def test_ccl_two_level_matches_dense(self):
        """The two-level CCL (per-chunk labels + chunk-boundary label-graph
        contraction, ref split_detection.rs:15-35) produces EXACTLY the
        dense labeler's labels — component min linear index — on random
        64³ occupancies and on a cross-chunk serpentine worst case
        (VERDICT-r4 item 4: chunk-gate CCL/split)."""
        from impact_tpu.voxel.interaction import (
            connected_component_labels_two_level,
        )

        g64 = 64
        rng = np.random.default_rng(7)
        # random blobs: threshold smoothed noise for chunky components
        noise = rng.random((g64, g64, g64)) < 0.08
        occ = jnp.asarray(noise)
        lin = jnp.arange(g64**3, dtype=jnp.int32).reshape(g64, g64, g64)
        big = jnp.int32(g64**3)

        def dense_labels(o):
            # reference implementation: full-grid min-label propagation to
            # the provable fixpoint (the pre-two-level labeler semantics)
            labels = jnp.where(o, lin, big)

            def prop(lab):
                m = lab
                for axis in range(3):
                    fwd = jnp.concatenate(
                        [
                            jnp.take(lab, jnp.arange(1, g64), axis=axis),
                            jnp.take(lab, jnp.arange(g64 - 1, g64), axis=axis)
                            * 0 + big,
                        ], axis=axis)
                    bwd = jnp.concatenate(
                        [
                            jnp.take(lab, jnp.arange(0, 1), axis=axis) * 0
                            + big,
                            jnp.take(lab, jnp.arange(0, g64 - 1), axis=axis),
                        ], axis=axis)
                    m = jnp.minimum(m, jnp.minimum(fwd, bwd))
                return jnp.where(o, m, big)

            def cond(s):
                lab, ch = s
                return ch

            def body(s):
                lab, _ = s
                new = prop(lab)
                return new, jnp.any(new != lab)

            lab, _ = jax.lax.while_loop(cond, body, (labels, jnp.asarray(True)))
            return jnp.where(o, lab, -1)

        got = np.asarray(connected_component_labels_two_level(occ))
        want = np.asarray(dense_labels(occ))
        np.testing.assert_array_equal(got, want)

        # serpentine: one component snaking through every chunk layer — the
        # long-path worst case for propagation-based labeling
        serp = np.zeros((g64, g64, g64), bool)
        for i in range(g64):
            if i % 2 == 0:
                serp[i, :, 8] = True
            else:
                serp[i, g64 - 1, 8] = serp[i, 0, 8] = True
        serp[1::2, :, 8] = False
        serp[1::2, 0, 8] = serp[1::2, g64 - 1, 8] = False
        # connect rows alternately at each end
        for i in range(0, g64 - 1):
            end = g64 - 1 if i % 2 == 0 else 0
            serp[i : i + 2, end, 8] = True
        occ_s = jnp.asarray(serp)
        got_s = np.asarray(connected_component_labels_two_level(occ_s))
        uniq = np.unique(got_s[got_s >= 0])
        assert len(uniq) == 1, len(uniq)

    def test_split_off_disconnected(self):
        g = sdflib.union(
            sdflib.translation(sdflib.sphere(4.0), (-7.0, 0, 0)),
            sdflib.translation(sdflib.sphere(3.0), (7.0, 0, 0)),
        )
        pool = empty_voxel_object_pool(4, G)
        s, origin = generate_sdf_grid(g, G, 1.0)
        pool = pool._replace(
            sdf=pool.sdf.at[0].set(s),
            origin=pool.origin.at[0].set(origin),
            alive=pool.alive.at[0].set(True),
        )
        total = int(nonempty_counts(pool)[0])
        pool2, did, disconnected = split_off_disconnected_region(
            pool, jnp.asarray(0), jnp.asarray(1)
        )
        assert bool(did)
        assert bool(disconnected)
        counts = nonempty_counts(pool2)
        assert int(counts[0]) + int(counts[1]) == total
        assert 0 < int(counts[1]) < int(counts[0])  # smaller part moved out
        assert bool(pool2.alive[1])

    def test_split_noop_when_connected(self):
        pool = make_sphere_pool(radius=6.0)
        pool2, did, disconnected = split_off_disconnected_region(
            pool, jnp.asarray(0), jnp.asarray(1)
        )
        assert not bool(did)
        assert not bool(disconnected)
        assert not bool(pool2.alive[1])

    def test_split_off_multiple_regions_one_pass(self):
        # 4 disconnected spheres: one labeling pass extracts 3 regions into
        # 3 free slots, source keeps the 4th (ref: extraction.rs:78 extracts
        # regions as found)
        from impact_tpu.voxel.interaction import (
            split_off_disconnected_regions,
        )

        g = sdflib.union(
            sdflib.union(
                sdflib.translation(sdflib.sphere(3.0), (-8.0, -8.0, 0)),
                sdflib.translation(sdflib.sphere(3.0), (8.0, -8.0, 0)),
            ),
            sdflib.union(
                sdflib.translation(sdflib.sphere(3.0), (-8.0, 8.0, 0)),
                sdflib.translation(sdflib.sphere(3.0), (8.0, 8.0, 0)),
            ),
        )
        pool = empty_voxel_object_pool(8, G)
        s, origin = generate_sdf_grid(g, G, 1.0)
        pool = pool._replace(
            sdf=pool.sdf.at[0].set(s),
            origin=pool.origin.at[0].set(origin),
            alive=pool.alive.at[0].set(True),
            split_pending=pool.split_pending.at[0].set(True),
        )
        total = int(nonempty_counts(pool)[0])
        slots = jnp.asarray([2, 3, 5], jnp.int32)
        pool2, n_split, disconnected = split_off_disconnected_regions(
            pool, jnp.asarray(0), slots
        )
        assert int(n_split) == 3
        assert not bool(disconnected)  # source now one component
        counts = np.asarray(nonempty_counts(pool2))
        assert counts[[0, 2, 3, 5]].sum() == total
        assert (counts[[0, 2, 3, 5]] > 0).all()
        assert list(np.asarray(pool2.alive[:6])) == [
            True, False, True, True, False, True,
        ]
        # extracted regions are single components — not re-pending
        assert not bool(pool2.split_pending[2])
        assert not bool(pool2.split_pending[0])

    def test_split_off_regions_blocked_on_slots_stays_pending(self):
        from impact_tpu.voxel.interaction import (
            split_off_disconnected_regions,
        )

        g = sdflib.union(
            sdflib.union(
                sdflib.translation(sdflib.sphere(3.0), (-8.0, -8.0, 0)),
                sdflib.translation(sdflib.sphere(3.0), (8.0, -8.0, 0)),
            ),
            sdflib.translation(sdflib.sphere(3.0), (0.0, 8.0, 0)),
        )
        pool = empty_voxel_object_pool(4, G)
        s, origin = generate_sdf_grid(g, G, 1.0)
        pool = pool._replace(
            sdf=pool.sdf.at[0].set(s),
            origin=pool.origin.at[0].set(origin),
            alive=pool.alive.at[0].set(True),
        )
        # only ONE free slot offered for a 3-component object
        pool2, n_split, disconnected = split_off_disconnected_regions(
            pool, jnp.asarray(0), jnp.asarray([1, -1], jnp.int32)
        )
        assert int(n_split) == 1
        assert bool(disconnected)  # 2 components still in the source

    def test_fracture_many_fragments_one_event(self):
        """One event can shatter into >10 fragments with voxels conserved
        (ref: fracturing.rs ≤512 fragments/event, seed grids + falloff)."""
        n_seeds = 16
        pool = make_sphere_pool(radius=10.0, n_objects=24)
        total = int(nonempty_counts(pool)[0])
        free = jnp.arange(1, n_seeds, dtype=jnp.int32)
        pool2 = fracture_object(
            pool,
            jnp.asarray(0),
            jnp.array([10.0, 0.0, 0.0]),
            jax.random.PRNGKey(7),
            free,
            fracture_radius=9.0,
            n_seeds=n_seeds,
        )
        counts = np.asarray(nonempty_counts(pool2))
        assert counts.sum() == total  # voxel (mass) conservation
        n_fragments = int((counts[:n_seeds] > 0).sum())
        assert n_fragments > 10, n_fragments

    def test_fracture_reference_scale_event(self):
        """A single event at the reference's fragment cap (fracturing.rs
        max_fragment_count: 512; engine_config_no_assets.ron:104) — the
        vectorized [S-1,G,G,G] carve scales to the full 512 seeds, bounded
        only by pool slots (memory: ≈[511,G³] bool regions + [G³,512] f32
        distances — ~90 MB at G=32; at G=64 use chunked seeds or more HBM).
        Voxels conserved, >128 distinct fragments actually materialize."""
        n_seeds = 512
        pool = make_sphere_pool(radius=12.0, n_objects=n_seeds + 4)
        total = int(nonempty_counts(pool)[0])
        free = jnp.arange(1, n_seeds, dtype=jnp.int32)
        pool2 = fracture_object(
            pool,
            jnp.asarray(0),
            jnp.array([12.0, 0.0, 0.0]),
            jax.random.PRNGKey(3),
            free,
            fracture_radius=11.0,
            n_seeds=n_seeds,
        )
        counts = np.asarray(nonempty_counts(pool2))
        assert counts.sum() == total
        n_fragments = int((counts[:n_seeds] > 0).sum())
        assert n_fragments > 128, n_fragments

    def test_fracture_conserves_voxels(self):
        pool = make_sphere_pool(radius=8.0, n_objects=8)
        total = int(nonempty_counts(pool)[0])
        free = jnp.array([1, 2, 3], jnp.int32)
        pool2 = fracture_object(
            pool,
            jnp.asarray(0),
            jnp.array([8.0, 0.0, 0.0]),  # impact at +x surface
            jax.random.PRNGKey(0),
            free,
            fracture_radius=5.0,
            n_seeds=4,
        )
        counts = np.asarray(nonempty_counts(pool2))
        assert counts[:4].sum() == total
        assert (counts[1:4] > 0).sum() >= 1  # at least one fragment created
        assert counts[0] > 0  # source retains the out-of-radius bulk


class TestMetaSdf:
    def test_stratified_grid_lowers_and_evaluates(self):
        from impact_tpu.voxel import meta_sdf as meta

        g = meta.stratified_grid_transforms(
            meta.meta_spheres(radius=meta.uniform(0.5, 1.0)),
            shape=(2, 2, 2), cell_size=3.0, jitter=0.3,
        )
        graph = meta.lower(g, seed=1)
        s, _ = generate_sdf_grid(graph, G, 0.5)
        n = int((s < 0).sum())
        assert n > 100  # eight spheres materialized

    def test_deterministic_by_seed(self):
        from impact_tpu.voxel import meta_sdf as meta

        g = meta.sphere_surface_transforms(
            meta.meta_boxes(extent=meta.uniform(0.4, 1.2)),
            count=12, sphere_radius=5.0, jitter=0.2,
        )
        a = meta.lower(g, seed=7)
        b = meta.lower(g, seed=7)
        c = meta.lower(g, seed=8)
        assert a == b
        assert a != c

    def test_stochastic_selection_drops_instances(self):
        from impact_tpu.voxel import meta_sdf as meta

        inner = meta.stratified_grid_transforms(
            meta.meta_spheres(radius=0.6), shape=(3, 3, 3), cell_size=2.0, jitter=0.0
        )
        full = meta.lower(inner, seed=0)
        sel = meta.lower(meta.stochastic_selection(inner, keep_probability=0.4), seed=0)
        n_full = len(meta._flatten_union(full))
        n_sel = len(meta._flatten_union(sel))
        assert n_sel < n_full

    def test_group_union_mixes_meta_and_atomic(self):
        from impact_tpu.voxel import meta_sdf as meta

        g = meta.group_union(
            [sdflib.sphere(4.0),
             meta.sphere_surface_transforms(meta.meta_spheres(radius=1.0),
                                            count=6, sphere_radius=4.0)],
            smoothness=1.0,
        )
        graph = meta.lower(g, seed=0)
        s, _ = generate_sdf_grid(graph, G, 0.5)
        # bumpy sphere: more voxels than the plain radius-4 sphere
        plain, _ = generate_sdf_grid(sdflib.sphere(4.0), G, 0.5)
        assert int((s < 0).sum()) > int((plain < 0).sum())


class TestMetaSdfReferenceNodes:
    """Round-3 meta-SDF completeness (VERDICT item 8): surface-relative
    placement, parameter distributions with inter-parameter dependencies,
    meta-level noise. Ref: impact_voxel/src/generation/sdf/meta.rs:149-674,
    meta/params.rs."""

    def test_param_dependency_and_distributions(self):
        from impact_tpu.voxel import meta_sdf as meta

        rng = np.random.default_rng(0)
        for _ in range(20):
            v = meta.sample_params(
                {"r": meta.uniform(1.0, 2.0),
                 "len": meta.from_param("r", scale=3.0, offset=0.5),
                 "ang": meta.uniform_cos_angle(10.0, 80.0),
                 "p": meta.power_law(1.0, 10.0, -2.0),
                 "n": meta.discrete_uniform(2, 5)}, rng)
            assert abs(v["len"] - (0.5 + 3.0 * v["r"])) < 1e-12
            assert 10.0 - 1e-6 <= v["ang"] <= 80.0 + 1e-6
            assert 1.0 <= v["p"] <= 10.0
            assert v["n"] in (2.0, 3.0, 4.0, 5.0)

    def test_param_cycle_detected(self):
        from impact_tpu.voxel import meta_sdf as meta

        rng = np.random.default_rng(0)
        with pytest.raises(ValueError, match="circular"):
            meta.sample_params(
                {"a": meta.from_param("b"), "b": meta.from_param("a")}, rng)

    def test_per_instance_sampling_varies_radii(self):
        from impact_tpu.voxel import meta_sdf as meta

        g = meta.stratified_grid_transforms(
            meta.meta_spheres(radius=meta.uniform(0.5, 1.0)),
            shape=(2, 2, 2), cell_size=3.0, jitter=0.0)
        graph = meta.lower(g, seed=1)
        radii = set()

        def walk(node):
            if node.get("kind") == "sphere":
                radii.add(round(node["radius"], 9))
            for key in ("a", "b", "child"):
                if key in node:
                    walk(node[key])
            for c in node.get("children", []):
                walk(c)

        walk(graph)
        assert len(radii) >= 4  # independently sampled, not one shared draw

    def test_closest_translation_to_surface(self):
        from impact_tpu.voxel import meta_sdf as meta

        surface = meta.sdf_instantiation(meta.meta_spheres(radius=4.0))
        boulders = meta.sphere_surface_transforms(
            meta.meta_boxes(extent=0.5), count=8, sphere_radius=7.0, jitter=0.0)
        snapped = meta.closest_translation_to_surface(surface, boulders)
        graph = meta.lower(meta.sdf_instantiation(snapped), seed=3)
        dists = []

        def walk(node):
            if node.get("kind") == "translation":
                d = float(np.linalg.norm(node["offset"]))
                if d > 1.0:
                    dists.append(d)
            for key in ("a", "b", "child"):
                if key in node:
                    walk(node[key])
            for c in node.get("children", []):
                walk(c)

        walk(graph)
        assert len(dists) == 8
        # Newton-snapped from r=7 onto the r=4 sphere surface
        assert all(abs(d - 4.0) < 0.2 for d in dists)

    def test_ray_translation_and_rotation_to_gradient(self):
        from impact_tpu.voxel import meta_sdf as meta

        surface = meta.sdf_instantiation(meta.meta_spheres(radius=4.0))
        rocks = meta.ray_translation_to_surface(
            surface,
            meta.sphere_surface_transforms(
                meta.meta_capsules(radius=0.3,
                                   segment_length=meta.from_param("radius",
                                                                  scale=3.0)),
                count=6, sphere_radius=8.0, rotation="radial_inwards"),
            anchor="shape_boundary")
        oriented = meta.rotation_to_gradient(surface, rocks)
        graph = meta.lower(
            meta.group_union([surface, meta.sdf_instantiation(oriented)],
                             smoothness=0.2), seed=5)
        s, _ = generate_sdf_grid(graph, G, 0.4)
        plain, _ = generate_sdf_grid(sdflib.sphere(4.0 / 0.4 * 0.4), G, 0.4)
        assert int((s < 0).sum()) > 0

    def test_meta_noise_modifier_roughens_surface(self):
        from impact_tpu.voxel import meta_sdf as meta

        base = meta.sdf_instantiation(meta.meta_spheres(radius=6.0))
        noisy = meta.noise_modifier(base, octaves=3, frequency=0.6,
                                    amplitude=1.2)
        g0 = meta.lower(base, seed=1)
        g1 = meta.lower(noisy, seed=1)
        s0, _ = generate_sdf_grid(g0, G, 0.5)
        s1, _ = generate_sdf_grid(g1, G, 0.5)
        assert not np.allclose(np.asarray(s0), np.asarray(s1))

    def test_np_evaluator_matches_jax(self):
        from impact_tpu.voxel import meta_sdf as meta

        g = meta.lower(meta.noise_modifier(
            meta.sdf_instantiation(meta.meta_boxes(extent=1.5, count=3)),
            octaves=3, frequency=0.7, amplitude=0.4), seed=9)
        P = np.random.default_rng(0).uniform(-3, 3, (256, 3)).astype(np.float32)
        d_np = sdflib.evaluate_np(g, P)
        d_jx = np.asarray(sdflib.evaluate(g, jnp.asarray(P)))
        assert np.abs(d_np - d_jx).max() < 1e-4


class TestCompactionDropCounters:
    """'No silent caps': compact_mesh must COUNT overflowed actives
    (VERDICT-r2 weak item 3)."""

    def test_no_drops_when_capacity_suffices(self):
        from impact_tpu.voxel.mesh import compact_mesh, surface_nets

        s, _ = generate_sdf_grid(sdflib.sphere(6.0), G, 1.0)
        mesh = surface_nets(s, jnp.zeros((G, G, G), jnp.int32))
        cm = compact_mesh(mesh, (G - 1) ** 3, 6 * (G - 1) ** 3)
        assert int(cm.n_dropped_verts) == 0
        assert int(cm.n_dropped_tris) == 0

    def test_drops_counted_on_overflow(self):
        from impact_tpu.voxel.mesh import compact_mesh, surface_nets

        s, _ = generate_sdf_grid(sdflib.sphere(6.0), G, 1.0)
        mesh = surface_nets(s, jnp.zeros((G, G, G), jnp.int32))
        n_v = int(jnp.sum(mesh.vert_active))
        n_t = int(jnp.sum(mesh.tri_active))
        cap_v, cap_t = n_v // 2, n_t // 2
        cm = compact_mesh(mesh, cap_v, cap_t)
        assert int(cm.n_dropped_verts) == n_v - cap_v
        # triangles drop both from the cap and from overflowed vertex refs
        assert int(cm.n_dropped_tris) >= n_t - cap_t
        assert int(jnp.sum(cm.tri_active)) + int(cm.n_dropped_tris) == n_t


class TestLargeGrid:
    """G=64 objects: the pooled dense design is not ceilinged at 32³
    (VERDICT-r2 item 1). Per-step cost tracks surface/occupied chunks
    (probes, compacted meshes), not grid volume; chunk accounting below."""

    pytestmark = pytest.mark.slow

    def test_g64_asteroid_end_to_end(self):
        from impact_tpu.ecs import components as C
        from impact_tpu.models.scenes import asteroid
        from impact_tpu.runtime import HeadlessRuntime, compile_scene
        from impact_tpu.utils.config import EngineConfig
        from impact_tpu.voxel.object import (
            occupied_chunk_counts,
            surface_chunk_counts,
        )

        cfg = EngineConfig()
        cfg.tpu.max_voxel_objects = 2
        cfg.tpu.max_bodies = 6
        cfg.tpu.max_contacts = 64
        cfg.tpu.voxel_grid_size = 64
        cfg.tpu.render_width = 96
        cfg.tpu.render_height = 72
        cfg.tpu.mesh_vert_cap = 24576
        cfg.tpu.mesh_tri_cap = 49152
        world = asteroid(seed=7)
        rt = HeadlessRuntime(
            compile_scene(world, cfg), cfg, enable_fracturing=False
        )
        occ_chunks = np.asarray(occupied_chunk_counts(rt.sim.voxels))
        surf_chunks = np.asarray(surface_chunk_counts(rt.sim.voxels))
        assert occ_chunks[0] > 0
        # a radius-10 asteroid at 0.3 extent spans ~67 voxels: most 16³
        # chunks of the 64-grid touch the surface but interiors are UNIFORM
        assert 0 < surf_chunks[0] <= occ_chunks[0] <= 64
        dv, dt = rt.dropped_mesh_elements()
        assert (dv, dt) == (0, 0), f"mesh caps dropped {dv}v/{dt}t at G=64"
        rt.step(2)
        pos = np.asarray(rt.sim.phys.bodies.position)
        assert np.all(np.isfinite(pos))
        img = np.asarray(rt.render())
        assert (img.sum(-1) > 0).sum() > 200  # asteroid visible


class TestGridBroadPhase:
    """Conservative shifted-grid broad phase (ref: hierarchy.rs:14-26 — BVH
    pair queries return ALL intersecting pairs; VERDICT-r4 item 5 — the
    broad phase must be conservative: recall == 1.0)."""

    def _dense_pairs(self, centers, radii, alive, margin):
        n = centers.shape[0]
        out = set()
        for a in range(n):
            for b in range(n):
                if a == b or not (alive[a] and alive[b]):
                    continue
                m = 0.5 * (margin[a] + margin[b])
                if np.linalg.norm(centers[a] - centers[b]) < (
                    radii[a] + radii[b] + m
                ):
                    out.add((a, b))
        return out

    def test_tower_pile_full_recall_and_no_duplicates(self):
        from impact_tpu.voxel.collision import broad_phase_pairs

        n = 160
        centers = np.zeros((n, 3), np.float32)
        centers[:, 1] = np.arange(n) * 1.8  # touching neighbors (r=1)
        radii = np.ones(n, np.float32)
        alive = np.ones(n, bool)
        margin = np.zeros(n, np.float32)
        pa, pb, valid, overflow = broad_phase_pairs(
            jnp.asarray(centers), jnp.asarray(radii), jnp.asarray(alive),
            max_pairs=4 * n, margin=jnp.asarray(margin),
        )
        got = {
            (int(a), int(b))
            for a, b, v in zip(np.asarray(pa), np.asarray(pb), np.asarray(valid))
            if v
        }
        expected = self._dense_pairs(centers, radii, alive, margin)
        assert expected, "test setup: tower must have overlaps"
        assert int(overflow) == 0
        assert got == expected  # soundness both ways on a tower
        assert len(got) == len(set(got))  # no duplicate directional pairs

    def test_clustered_recall_and_soundness(self):
        from impact_tpu.voxel.collision import broad_phase_pairs

        rng = np.random.default_rng(11)
        n = 200
        centers = rng.uniform(0, 14, (n, 3)).astype(np.float32)
        radii = rng.uniform(0.6, 1.2, n).astype(np.float32)
        alive = rng.random(n) < 0.9
        margin = np.full(n, 0.1, np.float32)
        pa, pb, valid, overflow = broad_phase_pairs(
            jnp.asarray(centers), jnp.asarray(radii), jnp.asarray(alive),
            max_pairs=8 * n, margin=jnp.asarray(margin),
        )
        got = {
            (int(a), int(b))
            for a, b, v in zip(np.asarray(pa), np.asarray(pb), np.asarray(valid))
            if v
        }
        expected = self._dense_pairs(centers, radii, alive, margin)
        # soundness: every candidate really overlaps
        assert got <= expected
        # CONSERVATIVE: exact recall (ref hierarchy.rs returns all pairs)
        assert int(overflow) == 0
        recall = len(got & expected) / max(len(expected), 1)
        assert recall == 1.0, recall
        assert len(got) == len(set(got))

    def test_clustered_recall_512(self):
        """VERDICT-r4 item 5 oracle: recall == 1.0 at O=512 random clusters."""
        from impact_tpu.voxel.collision import broad_phase_pairs

        rng = np.random.default_rng(23)
        n = 512
        centers = rng.uniform(0, 20, (n, 3)).astype(np.float32)
        radii = rng.uniform(0.5, 1.0, n).astype(np.float32)
        alive = rng.random(n) < 0.95
        margin = np.full(n, 0.1, np.float32)
        pa, pb, valid, overflow = broad_phase_pairs(
            jnp.asarray(centers), jnp.asarray(radii), jnp.asarray(alive),
            max_pairs=8 * n, margin=jnp.asarray(margin),
        )
        got = {
            (int(a), int(b))
            for a, b, v in zip(np.asarray(pa), np.asarray(pb), np.asarray(valid))
            if v
        }
        expected = self._dense_pairs(centers, radii, alive, margin)
        assert int(overflow) == 0
        assert got == expected
        assert len(got) == len(set(got))

    def test_large_object_lane_catches_nonlocal_overlaps(self):
        from impact_tpu.voxel.collision import broad_phase_pairs

        rng = np.random.default_rng(3)
        n = 150
        centers = rng.uniform(0, 60, (n, 3)).astype(np.float32)
        radii = np.full(n, 0.5, np.float32)
        # one huge object overlapping everything, far in Morton order
        centers[0] = (30.0, 30.0, 30.0)
        radii[0] = 60.0
        alive = np.ones(n, bool)
        margin = np.zeros(n, np.float32)
        pa, pb, valid, _overflow = broad_phase_pairs(
            jnp.asarray(centers), jnp.asarray(radii), jnp.asarray(alive),
            max_pairs=4 * n, margin=jnp.asarray(margin),
        )
        got = {
            (int(a), int(b))
            for a, b, v in zip(np.asarray(pa), np.asarray(pb), np.asarray(valid))
            if v
        }
        # the big object must pair with every other object, both directions
        with_big = {p for p in got if 0 in p}
        assert len(with_big) >= 2 * (n - 1) - len(got - with_big) * 0
        missing = [
            b for b in range(1, n)
            if (0, b) not in got or (b, 0) not in got
        ]
        assert not missing, missing[:5]
