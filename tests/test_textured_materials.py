"""Per-entity textured materials (ref: impact_material/src/setup/physical.rs
36-214 — Textured{Color,SpecularReflectance,Roughness,Metalness,
EmissiveLuminance}/NormalMap/ParallaxMap setup components lowering into the
mesh-instance render path)."""

import numpy as np
import pytest

from impact_tpu.ecs import World, components as C
from impact_tpu.render.textures import checkerboard, noise_normal_map, value_noise
from impact_tpu.runtime import HeadlessRuntime, compile_scene
from impact_tpu.runtime.setup import register_texture
from impact_tpu.utils.config import EngineConfig


def _cfg():
    cfg = EngineConfig()
    cfg.tpu.max_voxel_objects = 1
    cfg.tpu.max_bodies = 8
    cfg.tpu.max_contacts = 32
    cfg.tpu.voxel_grid_size = 8
    cfg.tpu.render_width = 128
    cfg.tpu.render_height = 96
    cfg.tpu.texture_resolution = 32
    cfg.rendering.shadow_mapping.enabled = False
    return cfg


def _scene(*material_comps):
    w = World()
    w.create_entity(
        C.ReferenceFrame(position=(0.0, 0.0, 0.0),
                         orientation=(0.0, 1.0, 0.0, 0.0)),  # face +z
        C.PerspectiveCamera(vertical_field_of_view=np.radians(50),
                            near_distance=0.01, far_distance=100.0),
    )
    w.create_entity(C.AmbientEmission(illuminance=(3e3, 3e3, 3e3)))
    w.create_entity(
        C.BoxMesh(), C.ModelTransform(scale=1.4),
        C.ReferenceFrame(position=(0.0, 0.0, 2.6)),
        *material_comps,
    )
    return w


def _render(world, cfg=None):
    cfg = cfg or _cfg()
    rt = HeadlessRuntime(compile_scene(world, cfg), cfg,
                         enable_fracturing=False)
    return np.asarray(rt.render()), rt


class TestTexturedMaterials:
    def test_textured_color_varies_across_surface(self):
        tid = register_texture(
            "test-checker", checkerboard(32, tiles=8,
                                         color_a=(0.9, 0.1, 0.1),
                                         color_b=(0.1, 0.1, 0.9)))
        img_tex, rt = _render(_scene(C.TexturedColor(texture_id=tid),
                                     C.UniformRoughness(roughness=0.8)))
        img_uni, _ = _render(_scene(C.UniformColor(color=(0.5, 0.1, 0.5)),
                                    C.UniformRoughness(roughness=0.8)))
        # the box face fills the image center; textured rendering must show
        # spatial variation the uniform control lacks
        face_tex = img_tex[28:68, 44:84].astype(np.float32)
        face_uni = img_uni[28:68, 44:84].astype(np.float32)
        assert face_tex.std(axis=(0, 1)).max() > 4.0 * max(
            face_uni.std(axis=(0, 1)).max(), 1.0
        )
        # entity layers present; full-PBR flag set for the entity layer
        assert rt._textures is not None and rt._textures.props is not None
        assert float(np.asarray(rt._textures.full_pbr).sum()) == 1.0

    def test_textured_roughness_and_metalness_change_shading(self):
        rough_tid = register_texture(
            "test-rough", value_noise(32, cells=4, seed=5))
        base = (C.UniformColor(color=(0.8, 0.7, 0.2)),)
        img_r, _ = _render(_scene(
            *base, C.TexturedRoughness(texture_id=rough_tid, scale_factor=1.0),
        ))
        img_m, _ = _render(_scene(
            *base, C.TexturedRoughness(texture_id=rough_tid, scale_factor=1.0),
            C.TexturedMetalness(texture_id=rough_tid, scale_factor=1.0),
            C.UniformSpecularReflectance(reflectance=1.0),
        ))
        assert np.abs(img_r.astype(int) - img_m.astype(int)).max() > 8

    def test_normal_and_parallax_maps_perturb_shading(self):
        nrm_tid = register_texture(
            "test-normal", noise_normal_map(32, cells=6, seed=2, strength=4.0))
        hgt_tid = register_texture("test-height", value_noise(32, cells=4, seed=9))
        col = C.UniformColor(color=(0.6, 0.6, 0.6))
        # a directional light gives the normal perturbation something to shade
        def with_light(*mats):
            w = _scene(col, *mats)
            w.create_entity(C.UnidirectionalEmission(
                perpendicular_illuminance=(3e3, 3e3, 3e3),
                direction=(0.4, -0.4, 0.8), angular_source_extent=0.0))
            return w

        img_flat, _ = _render(with_light())
        img_nrm, _ = _render(with_light(C.NormalMap(texture_id=nrm_tid)))
        assert np.abs(img_flat.astype(int) - img_nrm.astype(int)).max() > 8
        img_par, _ = _render(with_light(
            C.TexturedColor(texture_id=register_texture(
                "test-checker2", checkerboard(32, tiles=8))),
            C.ParallaxMap(height_map_texture_id=hgt_tid,
                          displacement_scale=0.08),
        ))
        img_nopar, _ = _render(with_light(
            C.TexturedColor(texture_id=register_texture(
                "test-checker3", checkerboard(32, tiles=8))),
        ))
        assert np.abs(img_par.astype(int) - img_nopar.astype(int)).max() > 8

    def test_textured_emissive_brightens(self):
        emis_tid = register_texture("test-emis", np.ones((8, 8), np.float32))
        img_e, _ = _render(_scene(
            C.UniformColor(color=(1.0, 0.5, 0.2)),
            C.TexturedEmissiveLuminance(texture_id=emis_tid,
                                        scale_factor=5e4),
        ))
        img_0, _ = _render(_scene(C.UniformColor(color=(1.0, 0.5, 0.2))))
        assert img_e[28:68, 44:84].mean() > img_0[28:68, 44:84].mean() + 10

    def test_unregistered_texture_raises(self):
        with pytest.raises(KeyError):
            _render(_scene(C.TexturedColor(texture_id=12345)))
