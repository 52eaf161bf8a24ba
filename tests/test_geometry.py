"""Geometry tests (mirrors impact_geometry unit-test coverage)."""

import jax.numpy as jnp
import numpy as np

from impact_tpu.geometry import aabb, frustum, primitives, projection
from impact_tpu.math import quaternion as quat


class TestAabb:
    def test_overlap(self):
        lo = jnp.array([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0], [0.5, 0.5, 0.5]])
        hi = jnp.array([[1.0, 1.0, 1.0], [3.0, 1.0, 1.0], [1.5, 1.5, 1.5]])
        mask = jnp.ones(3, dtype=bool)
        m = aabb.pairwise_overlap_matrix(lo, hi, mask)
        assert not bool(m[0, 1])  # disjoint
        assert bool(m[0, 2])  # overlapping
        assert not bool(m[2, 0])  # upper triangle only
        # masked-out entity produces no pairs
        m2 = aabb.pairwise_overlap_matrix(lo, hi, jnp.array([True, True, False]))
        assert not bool(m2[0, 2])

    def test_transformed_box(self):
        lo = jnp.array([-1.0, -1.0, -1.0])
        hi = jnp.array([1.0, 1.0, 1.0])
        r = quat.to_rotation_matrix(
            quat.from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.pi / 4)
        )
        nlo, nhi = aabb.aabb_of_transformed_box(lo, hi, r, jnp.zeros(3))
        np.testing.assert_allclose(nhi[0], np.sqrt(2.0), atol=1e-5)
        np.testing.assert_allclose(nhi[2], 1.0, atol=1e-5)


class TestPrimitives:
    def test_plane_distance(self):
        n = jnp.array([0.0, 1.0, 0.0])
        assert float(primitives.plane_signed_distance(n, 0.0, jnp.array([0.0, 3.0, 0.0]))) == 3.0

    def test_capsule_sdf(self):
        a = jnp.array([0.0, -1.0, 0.0])
        b = jnp.array([0.0, 1.0, 0.0])
        # beside the cylinder section
        d = primitives.capsule_sdf(a, b, 0.5, jnp.array([1.0, 0.0, 0.0]))
        np.testing.assert_allclose(d, 0.5, atol=1e-6)
        # beyond the cap
        d2 = primitives.capsule_sdf(a, b, 0.5, jnp.array([0.0, 2.0, 0.0]))
        np.testing.assert_allclose(d2, 0.5, atol=1e-6)

    def test_box_sdf(self):
        he = jnp.array([1.0, 1.0, 1.0])
        assert float(primitives.box_sdf(he, jnp.array([2.0, 0.0, 0.0]))) == 1.0
        assert float(primitives.box_sdf(he, jnp.array([0.0, 0.0, 0.0]))) == -1.0

    def test_segment_segment(self):
        # crossing perpendicular segments 1 apart
        c1, c2 = primitives.segment_segment_closest_points(
            jnp.array([-1.0, 0.0, 0.0]),
            jnp.array([1.0, 0.0, 0.0]),
            jnp.array([0.0, -1.0, 1.0]),
            jnp.array([0.0, 1.0, 1.0]),
        )
        np.testing.assert_allclose(c1, [0.0, 0.0, 0.0], atol=1e-6)
        np.testing.assert_allclose(c2, [0.0, 0.0, 1.0], atol=1e-6)


class TestProjection:
    def test_perspective_depth_range(self):
        p = projection.perspective_projection_matrix(16 / 9, jnp.pi / 3, 0.1, 100.0)
        ndc_near, _ = projection.project_points(p, jnp.array([0.0, 0.0, -0.1]))
        ndc_far, _ = projection.project_points(p, jnp.array([0.0, 0.0, -100.0]))
        np.testing.assert_allclose(ndc_near[2], 0.0, atol=1e-5)
        np.testing.assert_allclose(ndc_far[2], 1.0, atol=1e-5)

    def test_depth_inversion(self):
        p = projection.perspective_projection_matrix(1.0, jnp.pi / 2, 0.5, 50.0)
        for z in [0.6, 5.0, 49.0]:
            ndc, _ = projection.project_points(p, jnp.array([0.2, 0.1, -z]))
            zr = projection.view_z_from_depth(ndc[2], 0.5, 50.0)
            np.testing.assert_allclose(zr, z, rtol=1e-4)

    def test_fov_edges(self):
        p = projection.perspective_projection_matrix(1.0, jnp.pi / 2, 0.1, 100.0)
        # point at 45° from axis lands on NDC x = ±1
        ndc, _ = projection.project_points(p, jnp.array([1.0, 0.0, -1.0]))
        np.testing.assert_allclose(ndc[0], 1.0, atol=1e-5)


class TestFrustum:
    def _frustum(self):
        proj = projection.perspective_projection_matrix(1.0, jnp.pi / 2, 0.1, 100.0)
        return frustum.frustum_planes_from_view_proj(proj)  # view = identity

    def test_sphere_culling(self):
        n, d = self._frustum()
        centers = jnp.array(
            [
                [0.0, 0.0, -10.0],  # inside
                [0.0, 0.0, 10.0],  # behind camera
                [0.0, 0.0, -200.0],  # beyond far
                [25.0, 0.0, -10.0],  # far off to the side
                [11.0, 0.0, -10.0],  # just outside left/right plane, radius reaches in
            ]
        )
        radii = jnp.array([1.0, 1.0, 1.0, 1.0, 2.0])
        inside = frustum.sphere_inside_frustum(n, d, centers, radii)
        assert inside.tolist() == [True, False, False, False, True]

    def test_aabb_culling(self):
        n, d = self._frustum()
        lo = jnp.array([[-1.0, -1.0, -11.0], [30.0, 30.0, -11.0]])
        hi = jnp.array([[1.0, 1.0, -9.0], [32.0, 32.0, -9.0]])
        inside = frustum.aabb_inside_frustum(n, d, lo, hi)
        assert inside.tolist() == [True, False]


class TestViewCulling:
    """Per-view culling wiring (pipeline.cull_scene_to_frustum — ref:
    impact_scene/src/lib.rs:160 frustum-culled instance buffering)."""

    def _scene(self, tri_pos):
        from impact_tpu.render.pipeline import RenderScene

        t = tri_pos.shape[0]
        z9 = jnp.zeros((t, 9), jnp.float32)
        return RenderScene(
            tri_pos=tri_pos, tri_pos_prev=tri_pos, tri_normal=z9,
            tri_albedo=z9, tri_f0=z9, tri_roughness=jnp.zeros((t, 3)),
            tri_emissive=z9, tri_material=jnp.zeros((t, 3), jnp.int32),
            tri_active=jnp.ones(t, bool), tri_shadow=jnp.ones(t, bool),
        )

    def test_camera_frustum_masks_active_not_shadow(self):
        from impact_tpu.render.camera import Camera, look_at, view_proj
        from impact_tpu.render.pipeline import cull_scene_to_frustum

        cam = Camera(
            jnp.asarray([0.0, 0.0, 5.0], jnp.float32),
            look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
            jnp.asarray(np.pi / 3, jnp.float32),
            jnp.asarray(0.1, jnp.float32),
            jnp.asarray(100.0, jnp.float32),
        )
        vp = view_proj(cam, 64, 64)

        def tri(cx, cy, cz):
            return jnp.asarray(
                [[cx - 0.5, cy, cz, cx + 0.5, cy, cz, cx, cy + 0.5, cz]],
                jnp.float32,
            )

        tri_pos = jnp.concatenate(
            [
                tri(0.0, 0.0, 0.0),  # in view
                tri(0.0, 0.0, 20.0),  # behind the camera
                tri(0.0, 0.0, -300.0),  # beyond far
                tri(500.0, 0.0, 0.0),  # far off-axis
            ]
        )
        scene = self._scene(tri_pos)
        culled = cull_scene_to_frustum(scene, vp)
        assert culled.tri_active.tolist() == [True, False, False, False]
        # shadow casters are culled per light view, not by the camera
        assert culled.tri_shadow.tolist() == [True, True, True, True]

    def test_triangle_bounding_spheres(self):
        from impact_tpu.render.pipeline import triangle_bounding_spheres

        tri = jnp.asarray([[0.0, 0.0, 0.0, 2.0, 0.0, 0.0, 0.0, 2.0, 0.0]])
        center, rad = triangle_bounding_spheres(tri)
        np.testing.assert_allclose(
            np.asarray(center[0]), [2.0 / 3, 2.0 / 3, 0.0], atol=1e-6
        )
        corners = np.asarray(tri[0]).reshape(3, 3)
        dmax = np.max(np.linalg.norm(corners - np.asarray(center[0]), axis=1))
        np.testing.assert_allclose(float(rad[0]), dmax, rtol=1e-6)
