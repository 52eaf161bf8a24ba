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
