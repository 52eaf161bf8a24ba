"""Geometric primitives and queries (ref: engine/crates/impact_geometry).

All primitives are plain arrays batched over leading axes rather than objects:
an AABB is ``(lower [...,3], upper [...,3])``, a sphere ``(center, radius)``,
etc. Every query is vectorized so whole pools of bounding volumes are tested in
one fused XLA op — the TPU-native replacement for the reference's per-object
BVH traversals.
"""

from . import aabb, frustum, primitives, projection
from .projection import perspective_projection_matrix, orthographic_projection_matrix

__all__ = [
    "aabb",
    "frustum",
    "primitives",
    "projection",
    "perspective_projection_matrix",
    "orthographic_projection_matrix",
]
