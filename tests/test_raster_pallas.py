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
    # the kernel's depth TEST keeps 12 mantissa bits (packed z|index keys —
    # raster_pallas kernel notes): candidates within ~2.4e-4 relative depth
    # may tie-break differently from the oracle's exact compare, flipping
    # the winner on a few pixels of this random overlapping-triangle soup
    a = np.asarray(interp_p)[agree]
    b = np.asarray(interp_o)[agree]
    close = np.all(np.isclose(a, b, atol=5e-2, rtol=5e-2), axis=-1)
    assert np.mean(close) > 0.99, np.mean(close)


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


def test_medium_triangles_use_coarse_bins_not_big_block():
    """Triangles spanning >2×2 fine tiles but fitting the coarse grid must
    render via the coarse bin class even when the big block is saturated by
    other geometry — they may NOT depend on big_budget."""
    h = w = 64  # 4x4 fine tiles (tile 16), 1x1 coarse
    # a medium quad covering ~3x3 tiles in the screen center
    verts = jnp.array(
        [[-0.7, -0.7, -2.0], [0.7, -0.7, -2.0],
         [-0.7, 0.7, -2.0], [0.7, 0.7, -2.0]],
        jnp.float32,
    )
    tri = jnp.array([[0, 1, 3], [0, 3, 2]], jnp.int32)
    active = jnp.ones((2,), bool)
    clip = _project(verts)
    tri_clip = clip[tri]
    depth_p = rp.rasterize_depth(
        tri_clip, active, h, w, k_per_range=16, big_budget=0,
        cull_backfaces=False, interpret=True,
    )
    got = np.asarray(depth_p)
    # with big_budget=0 the quad can only come through the coarse bins
    assert (got[20:44, 20:44] < 1.0).all()


def test_merged_quads_render_identically():
    """Quad-merged voxel meshes must rasterize pixel-identically to the
    unmerged mesh (the merge predicate guarantees planar/affine blocks)."""
    from impact_tpu.voxel import sdf as sdflib
    from impact_tpu.voxel.mesh import compact_mesh, surface_nets
    from impact_tpu.voxel.object import generate_sdf_grid

    G = 24
    s, _ = generate_sdf_grid(sdflib.box((16.0, 16.0, 16.0)), G, 1.0)
    vt = jnp.zeros((G, G, G), jnp.int32)
    h = w = 96

    def render(ml):
        m = surface_nets(s, vt, merge_levels=ml)
        cm = compact_mesh(m, 4096, 8192)
        pos = (cm.tri_pos - G / 2) * 0.25
        pos = pos - jnp.tile(jnp.asarray([0.0, 0.0, 8.0]), 3)
        cols = [
            _project(pos[:, 3 * c : 3 * c + 3]) for c in range(3)
        ]
        clip = jnp.stack(cols, axis=1)
        # k_per_range sized so the UNMERGED mesh doesn't overflow the ranges
        # (back faces aren't culled here; overflow drops farthest-first which
        # is what the merged/unmerged comparison must not depend on)
        return rp.rasterize_depth(
            clip, cm.tri_active, h, w, k_per_range=1024,
            cull_backfaces=False, interpret=True,
        ), int(cm.tri_active.sum())

    d0, n0 = render(0)
    d2, n2 = render(2)
    assert n2 < n0  # merging actually happened
    diff = np.abs(np.asarray(d0) - np.asarray(d2)) > 2e-5
    # identical except fp tie-breaks of pixels exactly on shared edges
    # (coverage decided from different triangle planes) — same magnitude the
    # XLA-raster oracle shows between the two meshes
    assert diff.mean() <= 1e-3, f"{diff.sum()} px differ"


def test_soa_prologue_matches_clip_path():
    """The SoA (componentwise) prologue entry points must match the
    clip-array entry points: same projection, clipping, and planes."""
    from impact_tpu.render.pipeline import project_corners

    h = w = 48
    key = jax.random.PRNGKey(11)
    verts, tri, active = _random_scene(key, n_tris=40)
    # corner-major world positions + a quad crossing the near plane
    tri_pos9 = verts[tri].reshape(tri.shape[0], 9)
    f = 1.0 / np.tan(0.5)
    a = 100.0 / (100.0 - 0.1)
    b = -100.0 * 0.1 / (100.0 - 0.1)
    vp = jnp.asarray(
        [[f, 0, 0, 0], [0, f, 0, 0], [0, 0, -a, b], [0, 0, -1, 0]],
        jnp.float32,
    )

    clip = project_corners(tri_pos9, vp)
    d_ref = rp.rasterize_depth(
        clip, active, h, w, k_per_range=32, big_budget=16,
        cull_backfaces=False, interpret=True,
    )
    d_soa = rp.rasterize_depth_pos(
        tri_pos9, active, vp, h, w, k_per_range=32, big_budget=16,
        cull_backfaces=False, interpret=True,
    )
    ref, got = np.asarray(d_ref), np.asarray(d_soa)
    both = (ref < 1.0) & (got < 1.0)
    assert np.mean((ref < 1.0) == (got < 1.0)) > 0.995
    np.testing.assert_allclose(got[both], ref[both], atol=1e-4)

    attrs9 = jax.random.normal(jax.random.PRNGKey(5), (tri.shape[0], 9))
    i_ref, n_ref, v_ref = rp.rasterize_attributes(
        clip, active, None, attrs9, h, w, corner_major=True,
        k_per_range=32, big_budget=16, cull_backfaces=False, interpret=True,
    )
    i_soa, n_soa, v_soa = rp.rasterize_attributes_pos(
        tri_pos9, active, attrs9, vp, h, w,
        k_per_range=32, big_budget=16, cull_backfaces=False, interpret=True,
    )
    vr, vs = np.asarray(v_ref), np.asarray(v_soa)
    agree = vr & vs
    assert np.mean(vr == vs) > 0.995
    np.testing.assert_allclose(
        np.asarray(i_soa)[agree], np.asarray(i_ref)[agree],
        atol=1e-3, rtol=1e-3,
    )
