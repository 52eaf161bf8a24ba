"""Compact i8 signed-distance encoding.

Ref: impact_voxel/src/lib.rs:60-73,140-170 ``VoxelSignedDistance`` — an i8
code with QUANTIZATION_STEP_SIZE = 0.02 (in units of the voxel extent),
representable range ±2.54 voxel extents, and VOID_LIMIT = 100 (≥ 2 voxel
extents counts as void). Storing the pool SDF as i8 quarters its HBM
footprint and bandwidth; kernels decode after gathering (linear ops commute
with the scale, so interpolation can run in quantized units).
"""

from __future__ import annotations

import jax.numpy as jnp

QUANTIZATION_STEP_SIZE = 0.02  # voxel-extent units per code (ref: lib.rs:141)
VOID_LIMIT = 100  # codes ≥ this are void (2.0 / 0.02)
MAX_CODE = 127
MIN_CODE = -128


def sdf_scale(voxel_extent):
    """World-units-per-code for a given voxel extent ([O] or scalar)."""
    return voxel_extent * QUANTIZATION_STEP_SIZE


def encode_sdf_i8(sdf_world, voxel_extent):
    """f32 world-unit SDF → i8 codes (round, saturate)."""
    q = jnp.round(sdf_world / sdf_scale(voxel_extent))
    return jnp.clip(q, MIN_CODE, MAX_CODE).astype(jnp.int8)


def decode_sdf_i8(codes, voxel_extent):
    """i8 codes → f32 world-unit SDF."""
    return codes.astype(jnp.float32) * sdf_scale(voxel_extent)


def is_encoded(sdf) -> bool:
    return sdf.dtype == jnp.int8


def sdf_world(pool_sdf, voxel_extent):
    """Pool SDF (f32 world units or i8 codes) → f32 world units.

    ``voxel_extent`` broadcasts per object ([O] against [O,G,G,G])."""
    if is_encoded(pool_sdf):
        scale = sdf_scale(voxel_extent)
        if getattr(scale, "ndim", 0) == 1 and pool_sdf.ndim == 4:
            scale = scale[:, None, None, None]
        return pool_sdf.astype(jnp.float32) * scale
    return pool_sdf


def far_value(pool_sdf_dtype, voxel_extent):
    """The 'definitely empty' SDF value in the pool's storage units."""
    if pool_sdf_dtype == jnp.int8:
        return jnp.int8(MAX_CODE)
    return 2.0 * voxel_extent
