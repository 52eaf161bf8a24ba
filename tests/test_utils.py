"""Tests for RON parsing, config loading, hashing (ref parity checks)."""

import pathlib

import pytest

from impact_tpu.utils import EngineConfig, hashing, ron

REF_CONFIG = pathlib.Path("/root/reference/apps/basic_app/config/engine_config_no_assets.ron")


class TestRon:
    def test_scalars(self):
        assert ron.loads("42") == 42
        assert ron.loads("-1.5e3") == -1500.0
        assert ron.loads("true") is True
        assert ron.loads('"hi\\n"') == "hi\n"
        assert ron.loads("None") is None
        assert ron.loads("Some(3)") == 3

    def test_struct_and_tuple(self):
        v = ron.loads("(a: 1, b: (2.0, 3.0), c: [1, 2],)")
        assert v == {"a": 1, "b": (2.0, 3.0), "c": [1, 2]}

    def test_enum_variants(self):
        v = ron.loads("SemiDirectional((movement_speed: 8.0))")
        assert isinstance(v, ron.Variant)
        assert v.name == "SemiDirectional"
        assert v.args[0] == {"movement_speed": 8.0}
        unit = ron.loads("ACES")
        assert isinstance(unit, ron.Variant) and unit.name == "ACES"

    def test_comments(self):
        assert ron.loads("( a: 1, // comment\n b: 2, /* block */ )") == {
            "a": 1,
            "b": 2,
        }

    def test_nested_named_struct_fields(self):
        v = ron.loads("(sensitivity: Auto(ev_compensation: 0.0))")
        assert v["sensitivity"].name == "Auto"
        assert v["sensitivity"].fields == {"ev_compensation": 0.0}


class TestEngineConfig:
    def test_defaults(self):
        cfg = EngineConfig()
        assert cfg.physics.simulator.initial_time_step_duration == pytest.approx(
            0.01667
        )
        assert cfg.physics.constraint_solver.n_iterations == 8
        assert cfg.rendering.shadow_mapping.omnidirectional_light_shadow_map_resolution == 1024

    @pytest.mark.skipif(not REF_CONFIG.exists(), reason="reference not mounted")
    def test_loads_reference_config(self):
        cfg = EngineConfig.from_ron_file(REF_CONFIG)
        assert cfg.physics.simulator.initial_time_step_duration == pytest.approx(0.005)
        assert cfg.physics.constraint_solver.old_impulse_weight == pytest.approx(0.4)
        assert cfg.voxel.interaction.fracturing.impact.max_fragment_count == 512
        assert cfg.voxel.interaction.fracturing.impact.seed == 0
        assert cfg.rendering.ambient_occlusion.sample_count == 4
        assert cfg.rendering.capturing_camera.bloom.n_downsamplings == 4
        assert (
            cfg.rendering.capturing_camera.dynamic_range_compression.tone_mapping_method.name
            == "ACES"
        )
        assert cfg.controller.motion.name == "SemiDirectional"


class TestHashing:
    def test_fnv1a_known_values(self):
        # Standard FNV-1a test vectors
        assert hashing.hash_str_to_u32("") == 0x811C9DC5
        assert hashing.hash_str_to_u32("a") == 0xE40C292C
        assert hashing.hash_str_to_u64("") == 0xCBF29CE484222325
        assert hashing.hash_str_to_u64("a") == 0xAF63DC4C8601EC8C

    def test_distinct(self):
        assert hashing.hash_str_to_u64("foo") != hashing.hash_str_to_u64("bar")
