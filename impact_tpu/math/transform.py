"""Rigid and similarity transforms, batched.

TPU-first equivalents of the reference's ``Isometry3`` / ``Similarity3``
(ref: engine/crates/impact_math/src/transform/isometry.rs, similarity.rs).
A transform is a small pytree of arrays rather than an object, so whole
scene-graph levels transform in one fused vectorized op.

An isometry is ``(translation [...,3], rotation quat [...,4])``; a similarity
adds a uniform ``scaling [...]``. Composition order matches the reference:
``apply(compose(a, b), p) == apply(a, apply(b, p))``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import quaternion as quat


class Isometry(NamedTuple):
    translation: jnp.ndarray  # [..., 3]
    rotation: jnp.ndarray  # [..., 4] unit quaternion (x, y, z, w)

    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32):
        return Isometry(
            jnp.zeros((*batch_shape, 3), dtype),
            quat.identity(batch_shape, dtype),
        )


class Similarity(NamedTuple):
    translation: jnp.ndarray  # [..., 3]
    rotation: jnp.ndarray  # [..., 4]
    scaling: jnp.ndarray  # [...]

    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32):
        return Similarity(
            jnp.zeros((*batch_shape, 3), dtype),
            quat.identity(batch_shape, dtype),
            jnp.ones(batch_shape, dtype),
        )


def iso_apply(iso: Isometry, p):
    return quat.rotate(iso.rotation, p) + iso.translation


def iso_apply_vector(iso: Isometry, v):
    return quat.rotate(iso.rotation, v)


def iso_inverse(iso: Isometry) -> Isometry:
    rinv = quat.conjugate(iso.rotation)
    return Isometry(-quat.rotate(rinv, iso.translation), rinv)


def iso_compose(a: Isometry, b: Isometry) -> Isometry:
    """a ∘ b: apply b first, then a."""
    return Isometry(
        quat.rotate(a.rotation, b.translation) + a.translation,
        quat.normalize(quat.mul(a.rotation, b.rotation)),
    )


def sim_apply(sim: Similarity, p):
    return quat.rotate(sim.rotation, p * sim.scaling[..., None]) + sim.translation


def sim_apply_vector(sim: Similarity, v):
    return quat.rotate(sim.rotation, v * sim.scaling[..., None])


def sim_inverse(sim: Similarity) -> Similarity:
    rinv = quat.conjugate(sim.rotation)
    sinv = 1.0 / sim.scaling
    return Similarity(
        -quat.rotate(rinv, sim.translation) * sinv[..., None], rinv, sinv
    )


def sim_compose(a: Similarity, b: Similarity) -> Similarity:
    return Similarity(
        quat.rotate(a.rotation, b.translation * a.scaling[..., None])
        + a.translation,
        quat.normalize(quat.mul(a.rotation, b.rotation)),
        a.scaling * b.scaling,
    )


def sim_from_iso(iso: Isometry) -> Similarity:
    return Similarity(
        iso.translation,
        iso.rotation,
        jnp.ones(iso.translation.shape[:-1], iso.translation.dtype),
    )


def sim_to_matrix(sim: Similarity):
    """Similarity → homogeneous 4x4 matrix [..., 4, 4] (column-vector maths)."""
    r = quat.to_rotation_matrix(sim.rotation) * sim.scaling[..., None, None]
    batch = sim.translation.shape[:-1]
    m = jnp.zeros((*batch, 4, 4), sim.translation.dtype)
    m = m.at[..., :3, :3].set(r)
    m = m.at[..., :3, 3].set(sim.translation)
    m = m.at[..., 3, 3].set(1.0)
    return m


def iso_to_matrix(iso: Isometry):
    return sim_to_matrix(sim_from_iso(iso))
