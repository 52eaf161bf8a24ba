"""Texture subsystem tests (ref: impact_texture — registries, mipmaps,
samplers, lookup tables)."""

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast gate

from impact_tpu.render.textures import (
    LookupTable,
    SamplerConfig,
    WRAP_CLAMP,
    WRAP_MIRROR,
    WRAP_REPEAT,
    build_texture_array,
    checkerboard,
    default_voxel_texture_arrays,
    lod_from_scale,
    noise_normal_map,
    sample_level,
    sample_texture_array,
    sample_triplanar,
    triplanar_normal,
    triplanar_weights,
    value_noise,
)


class TestTextureArray:
    def test_mip_chain_shapes(self):
        tex = build_texture_array(np.zeros((3, 64, 32, 4), np.float32))
        assert tex.n_layers == 3
        assert tex.n_levels == 7  # 64x32 -> ... -> 1x1
        assert tex.mips[0].shape == (3, 64, 32, 4)
        assert tex.mips[1].shape == (3, 32, 16, 4)
        assert tex.mips[-1].shape == (3, 1, 1, 4)

    def test_mipmaps_preserve_mean(self):
        rng = np.random.default_rng(0)
        base = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
        tex = build_texture_array(base)
        mean0 = float(np.mean(base))
        for level in tex.mips:
            assert abs(float(jnp.mean(level)) - mean0) < 1e-5

    def test_nearest_sample_exact(self):
        base = np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1)
        tex = build_texture_array(base, generate_mipmaps=False)
        s = SamplerConfig(filter_linear=False)
        # texel centers: uv = (x+0.5)/4, (y+0.5)/4
        uv = jnp.array([[0.125, 0.125], [0.875, 0.625]])
        layer = jnp.zeros(2, jnp.int32)
        out = sample_level(tex.mips[0], layer, uv, s)
        np.testing.assert_allclose(np.asarray(out[:, 0]), [0.0, 11.0])

    def test_bilinear_interpolates(self):
        base = np.zeros((1, 2, 2, 1), np.float32)
        base[0, 0, 1, 0] = 1.0  # top-right texel
        tex = build_texture_array(base, generate_mipmaps=False)
        out = sample_level(
            tex.mips[0], jnp.asarray(0), jnp.array([0.5, 0.25]),
            SamplerConfig(wrap=WRAP_CLAMP),
        )
        np.testing.assert_allclose(float(out[0]), 0.5, atol=1e-6)

    def test_wrap_modes(self):
        base = np.arange(4, dtype=np.float32).reshape(1, 1, 4, 1)
        tex = build_texture_array(base, generate_mipmaps=False)
        layer = jnp.asarray(0)
        nearest = SamplerConfig(filter_linear=False, wrap=WRAP_REPEAT)
        out = sample_level(tex.mips[0], layer, jnp.array([1.125, 0.5]), nearest)
        assert float(out[0]) == 0.0  # wrapped around
        clamp = SamplerConfig(filter_linear=False, wrap=WRAP_CLAMP)
        out = sample_level(tex.mips[0], layer, jnp.array([1.5, 0.5]), clamp)
        assert float(out[0]) == 3.0
        mirror = SamplerConfig(filter_linear=False, wrap=WRAP_MIRROR)
        out = sample_level(tex.mips[0], layer, jnp.array([1.125, 0.5]), mirror)
        assert float(out[0]) == 3.0

    def test_trilinear_lod_blend(self):
        base = np.zeros((1, 4, 4, 1), np.float32)
        base[0, ::2, ::2, 0] = 1.0  # mean 0.25 at every level
        tex = build_texture_array(base)
        uv = jnp.array([0.5, 0.5])
        layer = jnp.asarray(0)
        # at the last level everything is the mean
        out = sample_texture_array(tex, layer, uv, lod=jnp.asarray(2.0))
        np.testing.assert_allclose(float(out[0]), 0.25, atol=1e-6)

    def test_lod_from_scale(self):
        assert float(lod_from_scale(jnp.asarray(1.0))) == 0.0
        assert float(lod_from_scale(jnp.asarray(4.0))) == 2.0


class TestTriplanar:
    def test_weights_normalized_and_dominant(self):
        n = jnp.array([[0.0, 1.0, 0.0], [0.577, 0.577, 0.577]])
        w = triplanar_weights(n)
        np.testing.assert_allclose(np.asarray(jnp.sum(w, -1)), [1.0, 1.0], atol=1e-6)
        assert float(w[0, 1]) > 0.99

    def test_flat_texture_samples_color(self):
        tex = build_texture_array(np.full((2, 8, 8, 3), 0.25, np.float32))
        out = sample_triplanar(
            tex, jnp.asarray(1), jnp.array([1.3, 2.7, 0.2]),
            jnp.array([0.0, 1.0, 0.0]),
        )
        np.testing.assert_allclose(np.asarray(out), [0.25, 0.25, 0.25], atol=1e-6)

    def test_normal_map_identity_when_flat(self):
        # a flat tangent-space normal map (0.5,0.5,1) must leave normals as-is
        flat = np.tile(np.array([0.5, 0.5, 1.0], np.float32), (1, 8, 8, 1))
        tex = build_texture_array(flat, generate_mipmaps=False)
        n = jnp.array([0.0, 1.0, 0.0])
        out = triplanar_normal(tex, jnp.asarray(0), jnp.array([0.3, 0.9, 2.0]), n)
        np.testing.assert_allclose(np.asarray(out), [0.0, 1.0, 0.0], atol=1e-5)


class TestLookupTable:
    def test_1d_linear(self):
        lut = LookupTable(values=jnp.array([[0.0], [1.0], [4.0]]))
        out = lut.sample(jnp.array([[0.25]]))
        np.testing.assert_allclose(float(out[0, 0]), 0.5, atol=1e-6)

    def test_2d_corners(self):
        v = jnp.arange(4, dtype=jnp.float32).reshape(2, 2, 1)
        lut = LookupTable(values=v)
        out = lut.sample(jnp.array([[0.0, 0.0], [1.0, 1.0], [0.5, 0.5]]))
        np.testing.assert_allclose(np.asarray(out[:, 0]), [0.0, 3.0, 1.5], atol=1e-6)


class TestProceduralSources:
    def test_checkerboard(self):
        img = checkerboard(16, 4)
        assert img.shape == (16, 16, 3)
        assert not np.allclose(img[0, 0], img[0, 4])

    def test_value_noise_deterministic(self):
        a = value_noise(32, 8, seed=5)
        b = value_noise(32, 8, seed=5)
        np.testing.assert_array_equal(a, b)
        assert a.shape == (32, 32, 1)
        assert 0.0 <= a.min() and a.max() <= 1.0

    def test_normal_map_unit_length(self):
        nm = noise_normal_map(32)
        n = nm * 2.0 - 1.0
        np.testing.assert_allclose(
            np.linalg.norm(n, axis=-1), np.ones((32, 32)), atol=1e-5
        )

    def test_default_voxel_arrays(self):
        albedo, normal = default_voxel_texture_arrays(3, size=32)
        assert albedo.n_layers == 3 and normal.n_layers == 3
        assert albedo.base_shape == (32, 32)


class TestImageImport:
    """Image IO + declared-texture import (ref: impact_io/src/image.rs,
    impact_texture/src/import.rs)."""

    def _gradient(self):
        g = np.linspace(0, 255, 48, dtype=np.float32).astype(np.uint8)
        return np.repeat(g[None, :, None], 64, 0).repeat(3, -1).reshape(
            64, 48, 3
        )

    def test_png_jpeg_roundtrip_and_metadata(self, tmp_path):
        from impact_tpu.utils import image as im

        rgb = self._gradient()
        p_png = str(tmp_path / "a.png")
        p_jpg = str(tmp_path / "b.jpg")
        im.save_png(p_png, rgb)
        im.save_jpeg(p_jpg, rgb)
        md = im.read_image_metadata(p_jpg)
        assert (md.width, md.height) == (48, 64)
        a = im.load_image(p_png)
        b = im.load_image(p_jpg)
        assert a.shape == b.shape == (64, 48, 3)
        assert np.abs(a.astype(int) - b.astype(int)).mean() < 3.0  # lossy
        # bytes source (impact_io ImageSource::Bytes)
        c = im.load_image((tmp_path / "b.jpg").read_bytes())
        assert c.shape == (64, 48, 3)

    def test_texture_array_from_images(self, tmp_path):
        from impact_tpu.render import textures as tx
        from impact_tpu.utils import image as im

        rgb = self._gradient()
        p_png = str(tmp_path / "a.png")
        p_jpg = str(tmp_path / "b.jpg")
        im.save_png(p_png, rgb)
        im.save_jpeg(p_jpg, rgb)
        ta = tx.texture_array_from_images([p_png, p_jpg], resolution=32)
        assert ta.n_layers == 2
        assert ta.base_shape == (32, 32)
        assert ta.n_levels == 6  # 32 -> 1 full chain
        # sRGB-decoded linear values stay in [0,1]
        base = np.asarray(ta.mips[0])
        assert base.min() >= 0.0 and base.max() <= 1.0
