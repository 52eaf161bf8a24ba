"""i8 SDF encoding tests (ref: VoxelSignedDistance, impact_voxel/src/lib.rs:60-73,
140-170 — QUANTIZATION_STEP_SIZE=0.02 voxel units, i8 saturation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from impact_tpu.voxel.encoding import (
    MAX_CODE,
    QUANTIZATION_STEP_SIZE,
    decode_sdf_i8,
    encode_sdf_i8,
    far_value,
    sdf_world,
)


class TestEncoding:
    def test_round_trip_within_quantization(self):
        extent = 0.25
        d = jnp.linspace(-2.0 * extent, 2.0 * extent, 101)
        enc = encode_sdf_i8(d, extent)
        assert enc.dtype == jnp.int8
        dec = decode_sdf_i8(enc, extent)
        np.testing.assert_allclose(
            np.asarray(dec), np.asarray(d),
            atol=0.5 * QUANTIZATION_STEP_SIZE * extent + 1e-7,
        )

    def test_saturation(self):
        enc = encode_sdf_i8(jnp.asarray([1e6, -1e6]), 1.0)
        assert int(enc[0]) == MAX_CODE and int(enc[1]) == -128

    def test_far_value(self):
        assert int(far_value(jnp.int8, jnp.asarray(0.25))) == MAX_CODE
        assert float(far_value(jnp.float32, jnp.asarray(0.25))) == 0.5

    def test_sdf_world_broadcast(self):
        codes = jnp.full((2, 4, 4, 4), 50, jnp.int8)
        extents = jnp.asarray([0.25, 1.0])
        w = sdf_world(codes, extents)
        np.testing.assert_allclose(float(w[0, 0, 0, 0]), 50 * 0.02 * 0.25, rtol=1e-6)
        np.testing.assert_allclose(float(w[1, 0, 0, 0]), 50 * 0.02 * 1.0, rtol=1e-6)


class TestEngineI8:
    @pytest.mark.slow
    def test_i8_engine_close_to_f32(self):
        """The full engine with i8 SDF storage tracks the f32 engine within
        quantization-level tolerance on the tumbler scene."""
        from impact_tpu.ecs import components as C
        from impact_tpu.models import voxel_box_tumbler
        from impact_tpu.runtime import HeadlessRuntime, compile_scene
        from impact_tpu.utils.config import EngineConfig

        def run(encoding):
            cfg = EngineConfig()
            cfg.tpu.max_voxel_objects = 4
            cfg.tpu.max_bodies = 16
            cfg.tpu.max_contacts = 128
            cfg.tpu.voxel_grid_size = 16
            cfg.tpu.sdf_encoding = encoding
            cfg.physics.simulator.initial_time_step_duration = 0.01
            cfg.rendering.shadow_mapping.enabled = False
            cfg.rendering.ambient_occlusion.enabled = False
            world = voxel_box_tumbler(n_boxes=1)
            for eid in world.entities_with(C.VoxelBox):
                for f in ("extent_x", "extent_y", "extent_z"):
                    world.set_field(eid, C.VoxelBox, f, 6.0)
            build = compile_scene(world, cfg)
            assert build.sim.voxels.sdf.dtype == (
                jnp.int8 if encoding == "i8" else jnp.float32
            )
            rt = HeadlessRuntime(build, cfg)
            rt.step(100)
            body = int(build.sim.voxels.body_index[0])
            return np.asarray(rt.sim.phys.bodies.position[body])

        pos_f32 = run("f32")
        pos_i8 = run("i8")
        assert np.all(np.isfinite(pos_i8))
        # same qualitative trajectory: settled near the same place
        np.testing.assert_allclose(pos_i8, pos_f32, atol=0.3)
