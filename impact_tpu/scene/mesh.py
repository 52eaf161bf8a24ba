"""Triangle meshes: procedural primitives and OBJ/PLY import.

Ref: impact_mesh — TriangleMesh with procedural generation of box, rectangle,
sphere, hemisphere, cone, cylinder, capsule, circular frustum and screen-quad
meshes (generation.rs, 1280 LoC) plus OBJ/PLY import (io/obj.rs, io/ply.rs).

Meshes are host-side numpy (scene-build time); they enter the device as
StaticGeometry or per-entity instance geometry via scene assembly.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class TriangleMesh(NamedTuple):
    positions: np.ndarray  # f32[V,3]
    normals: np.ndarray  # f32[V,3]
    indices: np.ndarray  # i32[T,3]


def _mesh(positions, normals, indices) -> TriangleMesh:
    return TriangleMesh(
        np.asarray(positions, np.float32),
        np.asarray(normals, np.float32),
        np.asarray(indices, np.int32),
    )


def compute_vertex_normals(positions, indices):
    """Area-weighted vertex normals."""
    positions = np.asarray(positions, np.float32)
    indices = np.asarray(indices, np.int32)
    n = np.zeros_like(positions)
    a, b, c = (positions[indices[:, i]] for i in range(3))
    fn = np.cross(b - a, c - a)
    for i in range(3):
        np.add.at(n, indices[:, i], fn)
    lens = np.linalg.norm(n, axis=-1, keepdims=True)
    return n / np.maximum(lens, 1e-12)


def box_mesh(extents=(1.0, 1.0, 1.0)) -> TriangleMesh:
    """Axis-aligned box centered at the origin (ref: generation.rs box),
    24 vertices (per-face normals)."""
    ex, ey, ez = (e * 0.5 for e in extents)
    faces = [
        # (normal, corner winding)
        ((1, 0, 0), [(ex, -ey, -ez), (ex, ey, -ez), (ex, ey, ez), (ex, -ey, ez)]),
        ((-1, 0, 0), [(-ex, -ey, ez), (-ex, ey, ez), (-ex, ey, -ez), (-ex, -ey, -ez)]),
        ((0, 1, 0), [(-ex, ey, -ez), (-ex, ey, ez), (ex, ey, ez), (ex, ey, -ez)]),
        ((0, -1, 0), [(-ex, -ey, ez), (-ex, -ey, -ez), (ex, -ey, -ez), (ex, -ey, ez)]),
        ((0, 0, 1), [(-ex, -ey, ez), (ex, -ey, ez), (ex, ey, ez), (-ex, ey, ez)]),
        ((0, 0, -1), [(ex, -ey, -ez), (-ex, -ey, -ez), (-ex, ey, -ez), (ex, ey, -ez)]),
    ]
    pos, nrm, idx = [], [], []
    for normal, corners in faces:
        base = len(pos)
        pos.extend(corners)
        nrm.extend([normal] * 4)
        idx.extend([(base, base + 1, base + 2), (base, base + 2, base + 3)])
    return _mesh(pos, nrm, idx)


def rectangle_mesh(width=1.0, depth=1.0) -> TriangleMesh:
    """A y-up rectangle in the xz-plane (ref: generation.rs rectangle)."""
    hw, hd = width * 0.5, depth * 0.5
    pos = [(-hw, 0, -hd), (hw, 0, -hd), (hw, 0, hd), (-hw, 0, hd)]
    nrm = [(0, 1, 0)] * 4
    idx = [(0, 2, 1), (0, 3, 2)]
    return _mesh(pos, nrm, idx)


def sphere_mesh(radius=1.0, n_rings=16, n_segments=32) -> TriangleMesh:
    """UV sphere (ref: generation.rs sphere)."""
    pos, nrm, idx = [], [], []
    for r in range(n_rings + 1):
        theta = np.pi * r / n_rings
        for s in range(n_segments + 1):
            phi = 2 * np.pi * s / n_segments
            n = (
                np.sin(theta) * np.cos(phi),
                np.cos(theta),
                np.sin(theta) * np.sin(phi),
            )
            pos.append(tuple(radius * c for c in n))
            nrm.append(n)
    stride = n_segments + 1
    for r in range(n_rings):
        for s in range(n_segments):
            a = r * stride + s
            b = a + stride
            idx.extend([(a, a + 1, b), (a + 1, b + 1, b)])
    return _mesh(pos, nrm, idx)


def hemisphere_mesh(radius=1.0, n_rings=8, n_segments=32) -> TriangleMesh:
    """Upper hemisphere (ref: generation.rs hemisphere)."""
    full = sphere_mesh(radius, n_rings * 2, n_segments)
    keep = full.positions[:, 1] >= -1e-6
    remap = -np.ones(len(full.positions), np.int32)
    remap[keep] = np.arange(keep.sum())
    tri_keep = keep[full.indices].all(axis=1)
    return _mesh(
        full.positions[keep], full.normals[keep], remap[full.indices[tri_keep]]
    )


def cylinder_mesh(radius=0.5, length=1.0, n_segments=32) -> TriangleMesh:
    """Closed y-axis cylinder (ref: generation.rs cylinder)."""
    h = length * 0.5
    pos, nrm, idx = [], [], []
    # side
    for s in range(n_segments + 1):
        phi = 2 * np.pi * s / n_segments
        c, sn = np.cos(phi), np.sin(phi)
        pos.extend([(radius * c, -h, radius * sn), (radius * c, h, radius * sn)])
        nrm.extend([(c, 0, sn)] * 2)
    for s in range(n_segments):
        a = 2 * s
        idx.extend([(a, a + 1, a + 2), (a + 1, a + 3, a + 2)])
    # caps
    for sign in (1.0, -1.0):
        center = len(pos)
        pos.append((0, sign * h, 0))
        nrm.append((0, sign, 0))
        ring = len(pos)
        for s in range(n_segments + 1):
            phi = 2 * np.pi * s / n_segments
            pos.append((radius * np.cos(phi), sign * h, radius * np.sin(phi)))
            nrm.append((0, sign, 0))
        for s in range(n_segments):
            tri = (center, ring + s, ring + s + 1)
            idx.append(tri if sign < 0 else (tri[0], tri[2], tri[1]))
    return _mesh(pos, nrm, idx)


def cone_mesh(radius=0.5, length=1.0, n_segments=32) -> TriangleMesh:
    """y-axis cone, apex up (ref: generation.rs cone)."""
    h = length * 0.5
    pos, nrm, idx = [], [], []
    slope = radius / length
    for s in range(n_segments + 1):
        phi = 2 * np.pi * s / n_segments
        c, sn = np.cos(phi), np.sin(phi)
        n = np.array([c, slope, sn])
        n /= np.linalg.norm(n)
        pos.extend([(radius * c, -h, radius * sn), (0, h, 0)])
        nrm.extend([tuple(n)] * 2)
    for s in range(n_segments):
        a = 2 * s
        idx.append((a, a + 1, a + 2))
    # base cap
    center = len(pos)
    pos.append((0, -h, 0))
    nrm.append((0, -1, 0))
    ring = len(pos)
    for s in range(n_segments + 1):
        phi = 2 * np.pi * s / n_segments
        pos.append((radius * np.cos(phi), -h, radius * np.sin(phi)))
        nrm.append((0, -1, 0))
    for s in range(n_segments):
        idx.append((center, ring + s, ring + s + 1))
    return _mesh(pos, nrm, idx)


def capsule_mesh(radius=0.5, segment_length=1.0, n_rings=8, n_segments=32) -> TriangleMesh:
    """y-axis capsule (ref: generation.rs capsule): sphere split at equator
    with the halves displaced by ±segment_length/2."""
    sp = sphere_mesh(radius, n_rings * 2, n_segments)
    pos = sp.positions.copy()
    shift = np.where(pos[:, 1] >= 0, segment_length * 0.5, -segment_length * 0.5)
    pos[:, 1] += shift
    return _mesh(pos, sp.normals, sp.indices)


def screen_quad_mesh() -> TriangleMesh:
    """Fullscreen quad in NDC (ref: generation.rs screen quad)."""
    pos = [(-1, -1, 0), (1, -1, 0), (1, 1, 0), (-1, 1, 0)]
    nrm = [(0, 0, 1)] * 4
    return _mesh(pos, nrm, [(0, 1, 2), (0, 2, 3)])


def circular_frustum_mesh(bottom_radius=0.5, top_radius=0.25, length=1.0, n_segments=32) -> TriangleMesh:
    """Conical frustum along y (ref: generation.rs circular frustum)."""
    h = length * 0.5
    pos, nrm, idx = [], [], []
    slope = (bottom_radius - top_radius) / length
    for s in range(n_segments + 1):
        phi = 2 * np.pi * s / n_segments
        c, sn = np.cos(phi), np.sin(phi)
        n = np.array([c, slope, sn])
        n /= np.linalg.norm(n)
        pos.extend(
            [(bottom_radius * c, -h, bottom_radius * sn), (top_radius * c, h, top_radius * sn)]
        )
        nrm.extend([tuple(n)] * 2)
    for s in range(n_segments):
        a = 2 * s
        idx.extend([(a, a + 1, a + 2), (a + 1, a + 3, a + 2)])
    return _mesh(pos, nrm, idx)


# --- import (ref: impact_mesh/src/io/{obj,ply}.rs) ------------------------------


def load_obj(path) -> TriangleMesh:
    """Minimal OBJ reader: v/vn/f records, triangulates polygons (fan)."""
    verts, norms, faces = [], [], []
    face_norms = []
    with open(path, "r", encoding="utf-8", errors="replace") as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "v":
                verts.append(tuple(float(x) for x in parts[1:4]))
            elif parts[0] == "vn":
                norms.append(tuple(float(x) for x in parts[1:4]))
            elif parts[0] == "f":
                refs = []
                for p in parts[1:]:
                    comps = p.split("/")
                    vi = int(comps[0])
                    vi = vi - 1 if vi > 0 else len(verts) + vi
                    refs.append(vi)
                for i in range(1, len(refs) - 1):
                    faces.append((refs[0], refs[i], refs[i + 1]))
    positions = np.asarray(verts, np.float32)
    indices = np.asarray(faces, np.int32)
    normals = (
        np.asarray(norms, np.float32)
        if len(norms) == len(verts)
        else compute_vertex_normals(positions, indices)
    )
    return TriangleMesh(positions, normals, indices)


def load_ply(path) -> TriangleMesh:
    """Minimal ASCII-PLY reader (vertex x/y/z [+nx/ny/nz], face lists)."""
    with open(path, "rb") as f:
        data = f.read()
    text = data.decode("utf-8", errors="replace")
    lines = text.splitlines()
    assert lines[0].strip() == "ply", "not a PLY file"
    n_verts = n_faces = 0
    props = []
    i = 1
    fmt = "ascii"
    current = None
    while i < len(lines):
        parts = lines[i].split()
        if parts[:1] == ["format"]:
            fmt = parts[1]
        elif parts[:1] == ["element"]:
            current = parts[1]
            if current == "vertex":
                n_verts = int(parts[2])
            elif current == "face":
                n_faces = int(parts[2])
        elif parts[:1] == ["property"] and current == "vertex":
            props.append(parts[-1])
        elif parts[:1] == ["end_header"]:
            i += 1
            break
        i += 1
    assert fmt == "ascii", "only ASCII PLY supported"
    rows = [lines[i + k].split() for k in range(n_verts)]
    cols = {p: j for j, p in enumerate(props)}
    positions = np.asarray(
        [[float(r[cols["x"]]), float(r[cols["y"]]), float(r[cols["z"]])] for r in rows],
        np.float32,
    )
    faces = []
    for k in range(n_faces):
        parts = lines[i + n_verts + k].split()
        cnt = int(parts[0])
        refs = [int(x) for x in parts[1 : 1 + cnt]]
        for j in range(1, cnt - 1):
            faces.append((refs[0], refs[j], refs[j + 1]))
    indices = np.asarray(faces, np.int32)
    if {"nx", "ny", "nz"} <= set(cols):
        normals = np.asarray(
            [[float(r[cols["nx"]]), float(r[cols["ny"]]), float(r[cols["nz"]])] for r in rows],
            np.float32,
        )
    else:
        normals = compute_vertex_normals(positions, indices)
    return TriangleMesh(positions, normals, indices)


def mesh_to_static_geometry(mesh: TriangleMesh, albedo=(0.6, 0.6, 0.6), f0=0.04,
                            roughness=0.7, emissive=(0.0, 0.0, 0.0), transform=None):
    """TriangleMesh → StaticGeometry for scene assembly."""
    import jax.numpy as jnp

    from .assembly import StaticGeometry

    pos = mesh.positions
    nrm = mesh.normals
    if transform is not None:
        t, r_mat, s = transform  # translation [3], rotation [3,3], scale
        pos = (pos * s) @ np.asarray(r_mat).T + np.asarray(t)
        nrm = nrm @ np.asarray(r_mat).T
    v = len(pos)
    return StaticGeometry(
        vert_pos=jnp.asarray(pos),
        vert_normal=jnp.asarray(nrm),
        vert_albedo=jnp.tile(jnp.asarray([albedo], jnp.float32), (v, 1)),
        vert_f0=jnp.full((v, 3), f0, jnp.float32),
        vert_roughness=jnp.full(v, roughness, jnp.float32),
        vert_emissive=jnp.tile(jnp.asarray([emissive], jnp.float32), (v, 1)),
        vert_material=jnp.full((v,), -1, jnp.int32),
        tri_indices=jnp.asarray(mesh.indices),
        tri_active=jnp.ones(len(mesh.indices), bool),
    )


class LineSegmentMesh(NamedTuple):
    """Line-segment mesh (ref: impact_mesh line_segment.rs) — consumed by the
    gizmo overlay (render/gizmos.py GizmoLines) and debug tooling."""

    positions: np.ndarray  # f32[V,3]
    indices: np.ndarray  # i32[S,2] segment endpoints


def line_segment_mesh(points, segments) -> LineSegmentMesh:
    return LineSegmentMesh(
        np.asarray(points, np.float32), np.asarray(segments, np.int32)
    )


def wireframe_of(mesh: TriangleMesh) -> LineSegmentMesh:
    """Unique-edge wireframe of a triangle mesh."""
    tri = np.asarray(mesh.indices)
    edges = np.concatenate([tri[:, [0, 1]], tri[:, [1, 2]], tri[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    edges = np.unique(edges, axis=0)
    return LineSegmentMesh(mesh.positions, edges.astype(np.int32))


def line_mesh_to_gizmo_lines(mesh: LineSegmentMesh, color=(1.0, 1.0, 1.0)):
    """LineSegmentMesh → render.gizmos.GizmoLines for overlay drawing."""
    import jax.numpy as jnp

    from ..render.gizmos import GizmoLines

    start = mesh.positions[mesh.indices[:, 0]]
    end = mesh.positions[mesh.indices[:, 1]]
    n = len(start)
    return GizmoLines(
        jnp.asarray(start), jnp.asarray(end),
        jnp.tile(jnp.asarray([color], jnp.float32), (n, 1)),
        jnp.ones(n, bool),
    )
