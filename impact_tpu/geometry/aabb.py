"""Axis-aligned bounding boxes, batched (ref: impact_geometry/src/axis_aligned_box.rs).

The reference rebuilds a BVH each frame for broad-phase pair queries
(ref: impact_intersection/src/bounding_volume/hierarchy.rs:14-26). On TPU the
idiomatic broad phase for pools up to ~10⁴ is the dense masked all-pairs
overlap matrix below — one O(N²) fused op beats tree traversal on the VPU.
Larger pools shard the pair matrix over the device mesh (impact_tpu.parallel).
"""

from __future__ import annotations

import jax.numpy as jnp


def from_points(points, axis=-2):
    """AABB (lower, upper) of points along ``axis``."""
    return points.min(axis=axis), points.max(axis=axis)


def union(lo_a, hi_a, lo_b, hi_b):
    return jnp.minimum(lo_a, lo_b), jnp.maximum(hi_a, hi_b)


def center(lo, hi):
    return 0.5 * (lo + hi)


def half_extents(lo, hi):
    return 0.5 * (hi - lo)


def contains_point(lo, hi, p):
    return jnp.all((p >= lo) & (p <= hi), axis=-1)


def overlaps(lo_a, hi_a, lo_b, hi_b):
    """Elementwise AABB-vs-AABB overlap test (broadcasts)."""
    return jnp.all((lo_a <= hi_b) & (lo_b <= hi_a), axis=-1)


def pairwise_overlap_matrix(lo, hi, mask):
    """Dense broad phase: [N, N] boolean overlap matrix for N masked AABBs.

    Entry (i, j) is True iff i < j, both alive, and boxes overlap — the
    all-pairs analog of ``for_each_intersecting_bounding_volume_pair``
    (ref: impact_intersection/src/bounding_volume/hierarchy.rs).
    """
    n = lo.shape[0]
    o = overlaps(lo[:, None, :], hi[:, None, :], lo[None, :, :], hi[None, :, :])
    pair_mask = mask[:, None] & mask[None, :]
    upper = jnp.triu(jnp.ones((n, n), dtype=bool), k=1)
    return o & pair_mask & upper


def aabb_of_sphere(center_, radius):
    r = radius[..., None]
    return center_ - r, center_ + r


def aabb_of_transformed_box(lo, hi, rotation_matrix, translation):
    """AABB of a rotated+translated AABB (the standard |R| trick)."""
    c = center(lo, hi)
    e = half_extents(lo, hi)
    new_c = jnp.einsum("...ij,...j->...i", rotation_matrix, c) + translation
    new_e = jnp.einsum("...ij,...j->...i", jnp.abs(rotation_matrix), e)
    return new_c - new_e, new_c + new_e
