"""Pallas tile rasterizer vs the XLA raster oracle (interpret mode on CPU).

The Pallas kernel (render/raster_pallas.py) must match the XLA tile raster
(render/raster.py) — same near-clipping, coverage rule, depth test, and
perspective-correct attribute interpolation (ref: the reference's hardware
raster semantics in impact_rendering geometry/shadow passes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast gate

from impact_tpu.render import raster as rasterlib
from impact_tpu.render import raster_pallas as rp


def _random_scene(key, n_tris=40, n_verts=64, spread=1.0):
    k1, k2, k3 = jax.random.split(key, 3)
    verts = jax.random.uniform(k1, (n_verts, 3), minval=-spread, maxval=spread)
    verts = verts.at[:, 2].add(-3.0)  # push in front of the camera
    tri = jax.random.randint(k2, (n_tris, 3), 0, n_verts)
    active = jax.random.uniform(k3, (n_tris,)) < 0.8
    # degenerate tris (repeated verts) are culled by the area test
    return verts, tri.astype(jnp.int32), active


def _project(verts, fov=1.0, aspect=1.0, near=0.1, far=100.0):
    """Simple wgpu-convention perspective projection (z in [0,w])."""
    f = 1.0 / np.tan(fov / 2)
    a = far / (far - near)
    b = -far * near / (far - near)
    x, y, z = verts[:, 0], verts[:, 1], verts[:, 2]
    # camera looks down -z
    clip = jnp.stack([f / aspect * x, f * y, a * (-z) + b, -z], axis=-1)
    return clip


@pytest.mark.parametrize("seed", [0, 1])
def test_depth_matches_oracle(seed):
    h = w = 48
    key = jax.random.PRNGKey(seed)
    verts, tri, active = _random_scene(key)
    clip = _project(verts)
    tri_clip = clip[tri]

    target, clip2, _ = rasterlib.rasterize(
        tri_clip, active, h, w, method="chunk"
    )
    depth_p = rp.rasterize_depth(
        tri_clip, active, h, w, k_per_range=32, big_budget=16, interpret=True
    )
    ref = np.asarray(target.depth)
    got = np.asarray(depth_p)
    # coverage may differ on exact edge-on pixels; compare where both agree
    both = (ref < 1.0) & (got < 1.0)
    assert np.mean((ref < 1.0) == (got < 1.0)) > 0.99
    np.testing.assert_allclose(got[both], ref[both], atol=2e-3)


def test_attr_matches_oracle():
    h = w = 48
    key = jax.random.PRNGKey(7)
    verts, tri, active = _random_scene(key, n_tris=30)
    clip = _project(verts)
    tri_clip = clip[tri]
    attrs = jax.random.normal(jax.random.PRNGKey(3), (verts.shape[0], 5))

    interp_o, near_o, valid_o = rasterlib.rasterize_attributes(
        tri_clip, active, tri, attrs, h, w, k_per_tile=128
    )
    interp_p, near_p, valid_p = rp.rasterize_attributes(
        tri_clip, active, tri, attrs, h, w,
        k_per_range=32, big_budget=16, interpret=True,
    )
    vo = np.asarray(valid_o)
    vp = np.asarray(valid_p)
    agree = vo & vp
    assert np.mean(vo == vp) > 0.99
    np.testing.assert_allclose(
        np.asarray(interp_p)[agree], np.asarray(interp_o)[agree],
        atol=5e-2, rtol=5e-2,
    )


def test_near_clipped_triangle():
    """A triangle crossing the near plane (quad-split path -> big list)."""
    h = w = 32
    verts = jnp.array(
        [[-0.5, -0.5, -2.0], [0.5, -0.5, -2.0], [0.0, 0.5, 0.5]],
        jnp.float32,
    )  # third vertex behind the camera
    tri = jnp.array([[0, 1, 2]], jnp.int32)
    active = jnp.ones((1,), bool)
    clip = _project(verts)
    tri_clip = clip[tri]

    target, _, _ = rasterlib.rasterize(tri_clip, active, h, w, method="chunk",
                                       cull_backfaces=False)
    depth_p = rp.rasterize_depth(
        tri_clip, active, h, w, k_per_range=16, big_budget=8,
        cull_backfaces=False, interpret=True,
    )
    ref_cov = np.asarray(target.depth) < 1.0
    got_cov = np.asarray(depth_p) < 1.0
    assert ref_cov.sum() > 0
    assert np.mean(ref_cov == got_cov) > 0.98


def test_big_triangle_ground_plane():
    """A screen-filling quad must land in the big list and cover everything."""
    h = w = 32
    verts = jnp.array(
        [[-50.0, -1.0, -1.0], [50.0, -1.0, -1.0],
         [-50.0, -1.0, -99.0], [50.0, -1.0, -99.0]],
        jnp.float32,
    )
    tri = jnp.array([[0, 2, 1], [1, 2, 3]], jnp.int32)
    active = jnp.ones((2,), bool)
    clip = _project(verts)
    tri_clip = clip[tri]
    depth_p = rp.rasterize_depth(
        tri_clip, active, h, w, k_per_range=16, big_budget=8,
        cull_backfaces=False, interpret=True,
    )
    got = np.asarray(depth_p)
    # bottom half of the screen sees the ground plane
    assert (got[24:, :] < 1.0).all()
