"""3D Morton (Z-order) codes, vectorized.

Ref: engine/crates/impact_math/src/morton.rs. Used for the Morton-sorted
agglomerative BVH build (ref: impact_intersection/src/bounding_volume/
fast_bottom_up.rs) — on TPU we keep the same spatial-sort idea for grouping
bodies/chunks but run the bit-interleave as vectorized int ops.
"""

from __future__ import annotations

import jax.numpy as jnp


def _part1by2(x):
    """Spread the low 10 bits of x so there are two zero bits between each."""
    x = x.astype(jnp.uint32) & 0x3FF
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def morton_encode_3d(ix, iy, iz):
    """Interleave three 10-bit integer coordinates into a 30-bit Morton code."""
    return (
        _part1by2(ix) | (_part1by2(iy) << 1) | (_part1by2(iz) << 2)
    ).astype(jnp.uint32)


def morton_codes_for_points(points, lo, hi, bits: int = 10):
    """Quantize points [...,3] into the AABB (lo, hi) and Morton-encode them."""
    scale = (1 << bits) - 1
    t = (points - lo) / jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip((t * scale), 0, scale).astype(jnp.uint32)
    return morton_encode_3d(q[..., 0], q[..., 1], q[..., 2])
