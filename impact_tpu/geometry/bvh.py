"""Implicit bounding-volume hierarchy over scene objects.

Ref: impact_intersection/src/bounding_volume/hierarchy.rs — the reference
maintains a binary AABB tree over model instances for frustum culling and
the BoundingVolumeHierarchy gizmo.

TPU redesign: with a fixed-capacity object pool, an *implicit* LBVH is the
compiler-friendly shape — sort objects by the Morton code of their bounding
sphere centers, then internal node (level ℓ, index i) covers the contiguous
sorted range [i·2^(L-ℓ), (i+1)·2^(L-ℓ)). Node AABBs reduce over static
slices, so the whole build is a sort + O(N log N) min/max reductions with no
pointers, no recursion, and no data-dependent shapes — it jits to a handful
of fused ops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..math.morton import morton_codes_for_points


class ObjectBVH(NamedTuple):
    """Per-level node AABBs; level ℓ has 2^ℓ nodes (root = level 0)."""

    lo: tuple  # tuple of f32[2^ℓ,3]
    hi: tuple  # tuple of f32[2^ℓ,3]
    active: tuple  # tuple of bool[2^ℓ]
    order: jnp.ndarray  # i32[N] morton-sorted object order (leaves)


def build_object_bvh(centers, radii, alive, n_levels: int = 4) -> ObjectBVH:
    """Build an implicit LBVH over object bounding spheres.

    centers f32[N,3], radii f32[N], alive bool[N]. ``n_levels`` levels of
    internal nodes are materialized (root + n_levels-1 splits); leaves below
    the last level stay implicit (they are just the sorted objects).
    """
    n = centers.shape[0]
    big = jnp.float32(3.0e38)
    r = jnp.where(alive, radii, 0.0)[:, None]
    lo_pt = jnp.where(alive[:, None], centers - r, big)
    hi_pt = jnp.where(alive[:, None], centers + r, -big)

    scene_lo = jnp.min(jnp.where(alive[:, None], centers, big), axis=0)
    scene_hi = jnp.max(jnp.where(alive[:, None], centers, -big), axis=0)
    codes = morton_codes_for_points(centers, scene_lo, scene_hi)
    # dead objects sort last so live ranges stay contiguous
    codes = jnp.where(alive, codes, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(codes).astype(jnp.int32)

    lo_s, hi_s, act_s = lo_pt[order], hi_pt[order], alive[order]
    los, his, acts = [], [], []
    for level in range(n_levels):
        k = 1 << level
        if k > n:
            break
        pad = (-n) % k
        shape = (k, (n + pad) // k, 3)
        lo_p = jnp.concatenate([lo_s, jnp.full((pad, 3), big)]).reshape(shape)
        hi_p = jnp.concatenate([hi_s, jnp.full((pad, 3), -big)]).reshape(shape)
        a_p = jnp.concatenate([act_s, jnp.zeros(pad, bool)]).reshape(shape[:2])
        los.append(jnp.min(lo_p, axis=1))
        his.append(jnp.max(hi_p, axis=1))
        acts.append(jnp.any(a_p, axis=1))
    return ObjectBVH(tuple(los), tuple(his), tuple(acts), order)
