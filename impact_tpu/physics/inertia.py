"""Analytic inertial properties for primitive shapes.

Ref: impact_physics/src/inertia.rs (InertialProperties: analytic tensors for
primitives, frame transforms). Tensors are about the center of mass in the
body frame; use :func:`translated_inertia` (parallel-axis) and
:func:`rotated_inertia` to move frames. All functions are batched.
"""

from __future__ import annotations

import jax.numpy as jnp


def sphere_inertia(mass, radius):
    """Solid sphere: I = (2/5) m r² · 𝟙."""
    i = jnp.asarray(0.4 * mass * radius**2)
    return i[..., None, None] * jnp.eye(3)


def box_inertia(mass, extents):
    """Solid box with full side lengths ``extents`` [...,3]."""
    ex2 = extents**2
    diag = jnp.stack(
        [
            ex2[..., 1] + ex2[..., 2],
            ex2[..., 0] + ex2[..., 2],
            ex2[..., 0] + ex2[..., 1],
        ],
        axis=-1,
    ) * jnp.asarray(mass / 12.0)[..., None]
    return _diag(diag)


def _diag(d):
    batch = d.shape[:-1]
    m = jnp.zeros((*batch, 3, 3), d.dtype)
    return m.at[..., jnp.arange(3), jnp.arange(3)].set(d)


def cylinder_inertia(mass, radius, length, axis=1):
    """Solid cylinder along local ``axis``."""
    i_axis = 0.5 * mass * radius**2
    i_perp = mass * (3.0 * radius**2 + length**2) / 12.0
    d = [i_perp, i_perp, i_perp]
    d[axis] = i_axis
    return _diag(jnp.stack(jnp.broadcast_arrays(*d), axis=-1))


def capsule_inertia(mass, radius, segment_length, axis=1):
    """Solid capsule: cylinder of length L plus two hemispherical caps,
    mass split by volume (standard closed form)."""
    r, L = radius, segment_length
    v_cyl = jnp.pi * r**2 * L
    v_caps = (4.0 / 3.0) * jnp.pi * r**3
    f_cyl = v_cyl / (v_cyl + v_caps)
    m_cyl = mass * f_cyl
    m_caps = mass * (1.0 - f_cyl)
    i_axis = 0.5 * m_cyl * r**2 + 0.4 * m_caps * r**2
    i_perp = (
        m_cyl * (3.0 * r**2 + L**2) / 12.0
        + m_caps * (0.4 * r**2 + 0.5 * L * r * 0.75 + 0.25 * L**2)
    )
    d = [i_perp, i_perp, i_perp]
    d[axis] = i_axis
    return _diag(jnp.stack(jnp.broadcast_arrays(*d), axis=-1))


def sphere_mass(density, radius):
    return density * (4.0 / 3.0) * jnp.pi * radius**3


def box_mass(density, extents):
    return density * jnp.prod(extents, axis=-1)


def capsule_mass(density, radius, segment_length):
    return density * (
        jnp.pi * radius**2 * segment_length + (4.0 / 3.0) * jnp.pi * radius**3
    )


def translated_inertia(inertia, mass, offset):
    """Parallel-axis theorem: inertia about a point displaced by ``offset``
    from the COM. offset [...,3]."""
    d2 = jnp.sum(offset * offset, axis=-1)[..., None, None]
    outer = offset[..., :, None] * offset[..., None, :]
    return inertia + mass[..., None, None] * (d2 * jnp.eye(3) - outer)


def rotated_inertia(inertia, rotation_matrix):
    """Inertia tensor in a rotated frame: R·I·Rᵀ."""
    return jnp.einsum("...ij,...jk,...lk->...il", rotation_matrix, inertia, rotation_matrix)


def mesh_inertial_properties(vertices, triangles, mass_density=1.0):
    """(mass, center_of_mass [3], inertia_tensor [3,3] about the COM) of a
    closed triangle mesh with uniform density.

    Ref: impact_physics/src/inertia.rs:69 ``of_uniform_triangle_mesh`` /
    ``compute_uniform_triangle_mesh_inertial_properties``. Uses the standard
    signed-tetrahedron decomposition about the origin (each face + origin
    forms a tetrahedron whose signed volume integrals accumulate), so any
    closed, consistently-wound mesh works regardless of origin placement.
    """
    import numpy as np

    v = np.asarray(vertices, np.float64)
    t = np.asarray(triangles, np.int64)
    a, b, c = v[t[:, 0]], v[t[:, 1]], v[t[:, 2]]

    # signed volume of tetra (origin, a, b, c)
    vol6 = np.einsum("ij,ij->i", a, np.cross(b, c))  # 6 * signed volume
    volume = vol6.sum() / 6.0

    # centroid integral: per-tet centroid = (a+b+c+0)/4
    com = ((a + b + c) / 4.0 * vol6[:, None]).sum(axis=0) / (6.0 * volume)

    # second moments via canonical tetrahedron integrals:
    # ∫ x_i x_j dV over tet(0,a,b,c) = (vol6/120)·(Σ_k Σ_l v_k·v_l terms)
    def moment(i, j):
        return (
            vol6
            / 120.0
            * (
                2.0 * (a[:, i] * a[:, j] + b[:, i] * b[:, j] + c[:, i] * c[:, j])
                + a[:, i] * b[:, j]
                + b[:, i] * a[:, j]
                + a[:, i] * c[:, j]
                + c[:, i] * a[:, j]
                + b[:, i] * c[:, j]
                + c[:, i] * b[:, j]
            )
        ).sum()

    xx, yy, zz = moment(0, 0), moment(1, 1), moment(2, 2)
    xy, xz, yz = moment(0, 1), moment(0, 2), moment(1, 2)
    inertia_origin = np.array(
        [
            [yy + zz, -xy, -xz],
            [-xy, xx + zz, -yz],
            [-xz, -yz, xx + yy],
        ]
    )
    mass = mass_density * volume
    # parallel-axis shift to the COM
    d = com
    shift = (d @ d) * np.eye(3) - np.outer(d, d)
    inertia_com = mass_density * inertia_origin - mass * shift
    return (
        jnp.asarray(mass, jnp.float32),
        jnp.asarray(com, jnp.float32),
        jnp.asarray(inertia_com, jnp.float32),
    )
