"""Pallas kernels vs their XLA reference implementations (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from impact_tpu.ops.raster_pallas import rasterize_pallas, screen_space_triangles
from impact_tpu.render import raster as rl
from impact_tpu.render.camera import Camera, look_at, view_proj


def _scene_clip(n_tris=40, seed=0, w=128, h=64):
    cam = Camera(
        jnp.array([0.0, 0.0, 6.0]), look_at([0.0, 0.0, 6.0], [0.0, 0.0, 0.0]),
        jnp.asarray(np.pi / 3), jnp.asarray(0.1), jnp.asarray(50.0),
    )
    vp = view_proj(cam, w, h)
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-2, 2, (n_tris, 1, 3)) * [1, 1, 0.5]
    offsets = rng.uniform(-0.8, 0.8, (n_tris, 3, 3))
    verts = jnp.asarray(centers + offsets, jnp.float32)
    hp = jnp.concatenate([verts, jnp.ones((n_tris, 3, 1))], -1)
    clip = jnp.einsum("ij,tvj->tvi", vp, hp)
    return clip


class TestPallasRaster:
    def test_matches_xla_raster(self):
        h, w = 64, 128
        clip = _scene_clip(40, seed=1, w=w, h=h)
        active = jnp.ones(clip.shape[0], bool)

        # XLA reference (no clipping needed: all tris in front of camera)
        target = rl._rasterize_clipped(clip, active, h, w)

        tris, valid = screen_space_triangles(clip, h, w)
        z_p, id_p = rasterize_pallas(tris, active & valid, h, w, interpret=True)

        np.testing.assert_allclose(
            np.asarray(z_p), np.asarray(target.depth), atol=1e-4
        )
        cov_ref = np.asarray(target.tri_id >= 0)
        cov_pal = np.asarray(id_p >= 0)
        np.testing.assert_array_equal(cov_pal, cov_ref)
        # winning ids agree wherever depths are uniquely ordered
        agree = (np.asarray(id_p) == np.asarray(target.tri_id)) | ~cov_ref
        assert agree.mean() > 0.999

    def test_empty_scene(self):
        h, w = 16, 128
        clip = jnp.zeros((4, 3, 4)).at[..., 3].set(1.0)
        z, i = rasterize_pallas(
            *(lambda t: (t[0], jnp.zeros(4, bool) & t[1]))(
                screen_space_triangles(clip, h, w)
            ),
            h, w, interpret=True,
        )
        assert float(z.min()) == 1.0
        assert int(i.max()) == -1


class TestCclPallas:
    def test_matches_xla_path(self):
        """The multi-sweep VMEM CCL kernel (interpret mode on CPU) must match
        the XLA min-propagation labels exactly."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from impact_tpu.ops.ccl_pallas import connected_component_labels_pallas
        from impact_tpu.voxel import sdf as sdflib
        from impact_tpu.voxel.interaction import connected_component_labels
        from impact_tpu.voxel.object import generate_sdf_grid

        g = sdflib.union(
            sdflib.translation(sdflib.sphere(4.0), (-7.0, 0, 0)),
            sdflib.translation(sdflib.sphere(3.0), (7.0, 0, 0)),
        )
        s, _ = generate_sdf_grid(g, 32, 1.0)
        occ = s < 0
        ref = np.asarray(connected_component_labels(occ))
        out = np.asarray(
            connected_component_labels_pallas(occ, n_sweeps=8, interpret=True)
        )
        np.testing.assert_array_equal(ref, out)
        assert len(np.unique(ref[ref >= 0])) == 2
