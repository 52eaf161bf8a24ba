"""Renderer tests (raster, clipping, postprocess) at tiny resolutions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast gate

from impact_tpu.render import post, raster as rl
from impact_tpu.render.camera import Camera, look_at, view_proj
from impact_tpu.render.brdf import evaluate_brdf


def _cam(eye=(0.0, 2.0, 5.0), target=(0.0, 0.0, 0.0)):
    return Camera(
        jnp.asarray(eye, jnp.float32),
        look_at(eye, target),
        jnp.asarray(np.pi / 3, jnp.float32),
        jnp.asarray(0.1, jnp.float32),
        jnp.asarray(100.0, jnp.float32),
    )


def _clip(verts, cam, w=32, h=32):
    vp = view_proj(cam, w, h)
    hp = jnp.concatenate([verts, jnp.ones((verts.shape[0], 1))], -1)
    return jnp.einsum("ij,vj->vi", vp, hp)


class TestRaster:
    def test_facing_triangle_covers(self):
        cam = _cam()
        verts = jnp.array([[-1.0, -1.0, 0.0], [1.0, -1.0, 0.0], [0.0, 1.5, 0.0]])
        # find the winding that faces the camera
        clip = _clip(verts, cam)
        t_a = clip[jnp.array([[0, 1, 2]])]
        t_b = clip[jnp.array([[0, 2, 1]])]
        cov = []
        for t in (t_a, t_b):
            target, _, _ = rl.rasterize(t, jnp.ones(1, bool), 32, 32)
            cov.append(int((target.tri_id >= 0).sum()))
        assert max(cov) > 20 and min(cov) == 0  # one faces, one is culled

    def test_depth_ordering(self):
        cam = _cam(eye=(0.0, 0.0, 5.0))
        near_v = jnp.array([[-1.0, -1.0, 1.0], [1.0, -1.0, 1.0], [0.0, 1.0, 1.0]])
        far_v = near_v.at[:, 2].set(-2.0) * 3.0
        verts = jnp.concatenate([near_v, far_v])
        clip = _clip(verts, cam)
        for order in ([0, 1], [1, 0]):
            idx = jnp.array([[0, 1, 2], [3, 4, 5]])[jnp.array(order)]
            tc = clip[idx]
            target, _, _ = rl.rasterize(tc, jnp.ones(2, bool), 32, 32)
            center = int(target.tri_id[16, 16])
            # the near triangle (input slot holding near_v) must win
            near_slot = order.index(0)
            assert center % 2 == near_slot % 2 or center == near_slot

    def test_near_plane_clipping_keeps_partial(self):
        # huge ground quad extending behind the camera must still rasterize
        cam = _cam(eye=(0.0, 5.0, 10.0), target=(0.0, 0.0, 0.0))
        verts = jnp.array(
            [[-50.0, 0.0, -50.0], [50.0, 0.0, -50.0], [50.0, 0.0, 50.0], [-50.0, 0.0, 50.0]]
        )
        clip = _clip(verts, cam)
        tc = clip[jnp.array([[0, 2, 1], [0, 3, 2]])]
        target, _, _ = rl.rasterize(tc, jnp.ones(2, bool), 32, 32)
        assert int((target.tri_id >= 0).sum()) > 200

    def test_resolve_interpolates_against_original_vertices(self):
        cam = _cam(eye=(0.0, 0.0, 3.0))
        verts = jnp.array([[-2.0, -2.0, 0.0], [2.0, -2.0, 0.0], [0.0, 3.0, 0.0]])
        clip = _clip(verts, cam)
        tri_idx = jnp.array([[0, 2, 1]])
        tc = clip[tri_idx]
        target, clip2, bary2 = rl.rasterize(tc, jnp.ones(1, bool), 32, 32)
        if int((target.tri_id >= 0).sum()) == 0:
            tri_idx = jnp.array([[0, 1, 2]])
            tc = clip[tri_idx]
            target, clip2, bary2 = rl.rasterize(tc, jnp.ones(1, bool), 32, 32)
        bary, tri, valid = rl.resolve_barycentrics(clip2, bary2, target, 1)
        # interpolate world position; covered pixels must land on the triangle
        # plane z=0 and inside bounds
        pos = rl.interpolate_attribute(verts, tri_idx, tri, bary, valid)
        zs = jnp.where(valid, pos[..., 2], 0.0)
        assert float(jnp.max(jnp.abs(zs))) < 1e-3
        assert bool(jnp.all(jnp.where(valid, jnp.abs(pos[..., 0]) <= 2.01, True)))


class TestPost:
    def test_tonemap_methods(self):
        x = jnp.array([[[0.0, 0.5, 20.0]]])
        for m in ("None", "ACES", "KhronosPBRNeutral"):
            y = post.tonemap(x, m)
            assert float(jnp.min(y)) >= 0.0 and float(jnp.max(y)) <= 1.0
        aces_mid = post.tonemap(jnp.asarray([0.18]), "ACES")
        assert 0.1 < float(aces_mid[0]) < 0.35

    def test_bloom_odd_dims(self):
        img = jnp.ones((15, 21, 3))
        out = post.bloom(img, n_downsamplings=3)
        assert out.shape == (15, 21, 3)
        np.testing.assert_allclose(out, 1.0, atol=0.05)

    def test_bloom_spreads_light(self):
        img = jnp.zeros((32, 32, 3)).at[16, 16].set(1000.0)
        out = post.bloom(img, n_downsamplings=3, blurred_luminance_weight=0.1)
        assert float(out[18, 18, 0]) > 0.0  # energy leaked to neighbors
        assert float(out[16, 16, 0]) < 1000.0

    def test_exposure_auto(self):
        # Saturation Based Sensitivity (capturing.rs:108-168): with K=12.5 and
        # q=0.65, max_lum = (78/(100q))*(100/K)*avg = 9.6*avg
        avg = jnp.asarray(5000.0)
        e = post.exposure_from_average_luminance(avg)
        np.testing.assert_allclose(float(e) * 5000.0, 1.0 / 9.6, rtol=1e-3)
        # clamped by bounds
        e2 = post.exposure_from_average_luminance(jnp.asarray(1e-12))
        assert float(e2) == pytest.approx(1e-2)

    def test_exposure_manual(self):
        # Manual{iso}: exposure = t*ISO/(120*N^2) (capturing.rs Manual path)
        e = post.manual_exposure(
            relative_aperture=4.0, shutter_duration=0.005, iso=100.0
        )
        assert e == pytest.approx(0.005 * 100.0 / (120.0 * 16.0))

    def test_taa_converges_to_static_scene(self):
        key = jax.random.PRNGKey(0)
        truth = jax.random.uniform(key, (16, 16, 3))
        history = jnp.zeros((16, 16, 3))
        motion = jnp.zeros((16, 16, 2))
        x = truth
        for _ in range(50):
            history = post.temporal_anti_aliasing(x, history, motion, 0.1, 10.0)
        np.testing.assert_allclose(history, truth, atol=0.02)

    def test_srgb_roundtrip_range(self):
        lin = jnp.linspace(0, 1, 32)
        s = post.to_srgb(lin)
        assert float(s[0]) == 0.0
        assert float(s[-1]) == pytest.approx(1.0, abs=1e-5)
        assert bool(jnp.all(jnp.diff(s) > 0))


class TestBrdf:
    def test_energy_reasonable(self):
        n = jnp.array([0.0, 1.0, 0.0])
        v = jnp.array([0.0, 1.0, 0.0])
        l = jnp.array([0.0, 1.0, 0.0])
        albedo = jnp.array([0.8, 0.8, 0.8])
        f0 = jnp.array([0.04, 0.04, 0.04])
        out = evaluate_brdf(n, v, l, albedo, f0, jnp.asarray(0.5))
        assert np.all(np.asarray(out) >= 0)

    def test_no_light_below_horizon(self):
        n = jnp.array([0.0, 1.0, 0.0])
        v = jnp.array([0.0, 1.0, 0.0])
        l = jnp.array([0.0, -1.0, 0.0])  # from below
        out = evaluate_brdf(
            n, v, l, jnp.array([0.8] * 3), jnp.array([0.04] * 3), jnp.asarray(0.5)
        )
        np.testing.assert_allclose(out, 0.0, atol=1e-6)


class TestCascades:
    def test_partition_depths_monotonic(self):
        from impact_tpu.render.lights import cascade_partition_depths

        s = cascade_partition_depths(jnp.asarray(0.1), jnp.asarray(100.0), 4)
        assert s.shape == (5,)
        assert float(s[0]) == pytest.approx(0.1, rel=1e-4)
        assert float(s[-1]) == pytest.approx(100.0, rel=1e-4)
        assert bool(jnp.all(jnp.diff(s) > 0))
        # log-biased: first split well below linear midpoint
        assert float(s[1]) < 25.0

    def test_cascade_selection(self):
        from impact_tpu.render.lights import uni_cascade_visibility

        depths = jnp.ones((3, 8, 8))  # fully lit maps
        vps = jnp.tile(jnp.eye(4)[None], (3, 1, 1))
        splits = jnp.array([0.1, 1.0, 10.0, 100.0])
        vd = jnp.array([[0.5, 5.0], [50.0, 0.2]])
        wp = jnp.zeros((2, 2, 3))
        vis = uni_cascade_visibility(depths, vps, splits, vd, wp)
        assert vis.shape == (2, 2)
        assert bool(jnp.all(vis == 1.0))  # everything lit with depth-1 maps


class TestOrthographicCamera:
    def test_no_perspective_foreshortening(self):
        """Two equal spheres at different depths cover equal pixel areas under
        the true orthographic projection (ref: projection.rs:196-236)."""
        import numpy as np

        from impact_tpu.ecs import World, components as C
        from impact_tpu.runtime import HeadlessRuntime, compile_scene
        from impact_tpu.utils.config import EngineConfig

        cfg = EngineConfig()
        cfg.tpu.max_voxel_objects = 2
        cfg.tpu.max_bodies = 8
        cfg.tpu.max_contacts = 32
        cfg.tpu.voxel_grid_size = 16
        cfg.tpu.render_width = 128
        cfg.tpu.render_height = 96
        cfg.rendering.shadow_mapping.enabled = False
        cfg.rendering.ambient_occlusion.enabled = False
        cfg.rendering.temporal_anti_aliasing.enabled = False
        world = World()
        world.create_entity(C.AmbientEmission(illuminance=(3000.0, 3000.0, 3000.0)))
        # camera at +z looking toward −z; far·tan(fov/2) = view half-height
        import math

        world.create_entity(
            C.ReferenceFrame(position=(0.0, 0.0, 30.0)),
            C.OrthographicCamera(
                vertical_field_of_view=2 * math.atan(6.0 / 100.0),
                near_distance=0.1, far_distance=100.0,
            ),
        )
        for x, z in ((-2.5, 0.0), (2.5, -25.0)):  # same size, depths differ
            world.create_entity(
                C.VoxelSphere(voxel_extent=0.25, radius=6.0),
                C.ReferenceFrame(position=(x, 0.0, z)),
                C.SameVoxelType(voxel_type=0),
            )
        build = compile_scene(world, cfg)
        assert cfg.tpu.orthographic_camera
        rt = HeadlessRuntime(build, cfg)
        rt.step(1)
        img = np.asarray(rt.render())
        # count lit pixels on each half of the screen
        lit = (img.astype(np.int32).sum(-1) > 40)
        left = int(lit[:, : 128 // 2].sum())
        right = int(lit[:, 128 // 2 :].sum())
        assert left > 50 and right > 50
        assert abs(left - right) / max(left, right) < 0.15, (left, right)
