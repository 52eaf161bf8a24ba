"""Precomputed drag-load maps: direction-sampled force/torque tables.

Ref: impact_physics/src/force/detailed_drag{,.rs} — the reference precomputes
per-shape ``DragLoad`` (force + torque) over incoming-flow directions, stores
them as ``EquirectangularMap``s, samples them at runtime against the
``UniformMedium``, and caches generated maps to disk (``DragLoadMapConfig``:
n_direction_samples, n_theta_coords, save/use_saved_maps, directory).

TPU redesign: the map is a dense ``[n_theta, n_phi, 6]`` table (force and
torque coefficients in the BODY frame per unit dynamic pressure q = ½ρ|v|²),
built once on the host from the shape's surface mesh with a Newtonian
flat-plate pressure model (the reference derives its model in the Julia
notebooks; the table format and runtime sampling path are the parity
surface). Sampling is a bilinear equirectangular lookup — a tiny fused
gather per body per step.
"""

from __future__ import annotations

import hashlib
import pathlib
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class DragLoadMap(NamedTuple):
    """Equirectangular force/torque coefficient table (body frame).

    ``table[t, p, 0:3]`` force coefficient, ``[..., 3:6]`` torque coefficient
    for incoming flow direction (θ_t, φ_p); multiply by dynamic pressure
    q = ½·ρ·|v_rel|² to get force [N] and torque [N·m]."""

    table: jnp.ndarray  # f32[T, P, 6]


def _direction_grid(n_theta: int, n_phi: int):
    theta = (np.arange(n_theta) + 0.5) / n_theta * np.pi
    phi = np.arange(n_phi) / n_phi * 2.0 * np.pi
    st, ct = np.sin(theta)[:, None], np.cos(theta)[:, None]
    cp, sp = np.cos(phi)[None, :], np.sin(phi)[None, :]
    return np.stack(
        [st * cp, np.broadcast_to(ct, (n_theta, n_phi)), st * sp], axis=-1
    )  # [T,P,3] unit incoming-flow directions (y = polar axis)


def build_drag_load_map(
    vertices,
    triangles,
    center_of_mass=(0.0, 0.0, 0.0),
    n_theta: int = 32,
    n_phi: int = 64,
    friction_coefficient: float = 0.05,
) -> DragLoadMap:
    """Build the table from a (closed) surface mesh in the body frame.

    Newtonian flat-plate model per triangle: windward faces (n·d < 0) feel
    pressure Cp = 2·(n·d)² along −n plus a small tangential friction term
    along d; force and torque (about the COM) integrate over the surface.
    """
    v = np.asarray(vertices, np.float64)
    t = np.asarray(triangles, np.int64)
    com = np.asarray(center_of_mass, np.float64)
    a, b, c = v[t[:, 0]], v[t[:, 1]], v[t[:, 2]]
    cross = np.cross(b - a, c - a)
    area = 0.5 * np.linalg.norm(cross, axis=-1)
    ok = area > 1e-12
    normal = np.where(
        ok[:, None], cross / np.maximum(2.0 * area, 1e-12)[:, None], 0.0
    )
    centroid = (a + b + c) / 3.0 - com

    dirs = _direction_grid(n_theta, n_phi)  # [T,P,3]
    # s[t,p,f] = n_f · d_tp
    s = np.einsum("fk,tpk->tpf", normal, dirs)
    wind = np.maximum(0.0, -s)  # windward magnitude
    cp = 2.0 * wind**2  # Newtonian pressure coefficient
    # pressure force along −n, friction along d
    f_press = -np.einsum("tpf,fk->tpfk", cp * area[None, None, :], normal)
    f_fric = friction_coefficient * np.einsum(
        "tpf,tpk->tpfk", wind * area[None, None, :], dirs
    )
    df = f_press + f_fric  # [T,P,F,3]
    force = df.sum(axis=2)
    torque = np.cross(
        np.broadcast_to(centroid[None, None, :, :], df.shape), df
    ).sum(axis=2)
    table = np.concatenate([force, torque], axis=-1).astype(np.float32)
    return DragLoadMap(table=jnp.asarray(table))


def sample_drag_load(map_table, direction_body):
    """Bilinear equirectangular lookup. ``map_table`` f32[T,P,6];
    ``direction_body`` [...,3] unit incoming-flow direction in the body frame.
    Returns (force_coef [...,3], torque_coef [...,3])."""
    n_theta, n_phi = map_table.shape[0], map_table.shape[1]
    d = direction_body
    theta = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))
    phi = jnp.arctan2(d[..., 2], d[..., 0]) % (2.0 * jnp.pi)
    ft = theta / jnp.pi * n_theta - 0.5
    fp = phi / (2.0 * jnp.pi) * n_phi
    t0 = jnp.clip(jnp.floor(ft).astype(jnp.int32), 0, n_theta - 1)
    t1 = jnp.clip(t0 + 1, 0, n_theta - 1)
    wt = jnp.clip(ft - t0, 0.0, 1.0)[..., None]
    p0 = jnp.floor(fp).astype(jnp.int32) % n_phi
    p1 = (p0 + 1) % n_phi
    wp = (fp - jnp.floor(fp))[..., None]
    v00 = map_table[t0, p0]
    v01 = map_table[t0, p1]
    v10 = map_table[t1, p0]
    v11 = map_table[t1, p1]
    out = (
        v00 * (1 - wt) * (1 - wp)
        + v01 * (1 - wt) * wp
        + v10 * wt * (1 - wp)
        + v11 * wt * wp
    )
    return out[..., 0:3], out[..., 3:6]


# --- disk cache (ref: drag_load_map_config save/use_saved_maps, directory) ----


def _cache_key(vertices, triangles, n_theta: int, n_phi: int) -> str:
    h = hashlib.sha1()
    h.update(np.ascontiguousarray(vertices, np.float32).tobytes())
    h.update(np.ascontiguousarray(triangles, np.int32).tobytes())
    h.update(f"{n_theta}x{n_phi}".encode())
    return h.hexdigest()[:16]


def get_or_build_drag_load_map(
    vertices,
    triangles,
    center_of_mass=(0.0, 0.0, 0.0),
    n_theta: int = 32,
    n_phi: int = 64,
    directory=None,
    use_saved: bool = True,
    save_generated: bool = True,
    overwrite: bool = False,
) -> DragLoadMap:
    """Disk-cached map construction (ref: detailed_drag map caching)."""
    path = None
    if directory is not None:
        key = _cache_key(vertices, triangles, n_theta, n_phi)
        path = pathlib.Path(directory) / f"drag_load_{key}.npz"
        if use_saved and path.exists() and not overwrite:
            with np.load(path) as data:
                return DragLoadMap(table=jnp.asarray(data["table"]))
    m = build_drag_load_map(vertices, triangles, center_of_mass, n_theta, n_phi)
    if path is not None and save_generated:
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(path, table=np.asarray(m.table))
    return m
