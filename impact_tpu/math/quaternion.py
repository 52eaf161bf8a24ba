"""Unit quaternions and rotations, batched over leading axes.

TPU-first redesign of the reference's quaternion/rotation support
(ref: engine/crates/impact_math/src/quaternion.rs, matrix.rs). Quaternions are
stored as ``[..., 4]`` arrays in (x, y, z, w) component order (matching the
glam convention the reference builds on). All functions are pure, shape
polymorphic over leading batch axes, and safe under jit/vmap.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# numpy constant: module import must not initialize a JAX backend
IDENTITY = np.array([0.0, 0.0, 0.0, 1.0], dtype=np.float32)


def identity(batch_shape=(), dtype=jnp.float32):
    """Identity quaternion broadcast to ``batch_shape + (4,)``."""
    q = jnp.zeros((*batch_shape, 4), dtype=dtype)
    return q.at[..., 3].set(1.0)


def normalize(q, eps=1e-12):
    """Renormalize to unit length (guards the zero quaternion)."""
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, eps)


def mul(q1, q2):
    """Hamilton product q1 * q2 (apply q2's rotation, then q1's)."""
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def conjugate(q):
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


inverse = conjugate  # unit quaternions only


def rotate(q, v):
    """Rotate vector(s) ``v`` [..., 3] by unit quaternion(s) ``q`` [..., 4].

    Uses the 15-mul form v' = v + 2*cross(q.xyz, cross(q.xyz, v) + w*v).
    """
    u = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(u, v)
    return v + w * t + jnp.cross(u, t)


def inverse_rotate(q, v):
    return rotate(conjugate(q), v)


def from_axis_angle(axis, angle):
    """Unit quaternion rotating by ``angle`` (radians) about unit ``axis``."""
    angle = jnp.asarray(angle)
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate(
        [axis * s[..., None], jnp.cos(half)[..., None]], axis=-1
    )


def to_axis_angle(q, eps=1e-12):
    """Inverse of :func:`from_axis_angle`; returns (axis, angle)."""
    w = jnp.clip(q[..., 3], -1.0, 1.0)
    angle = 2.0 * jnp.arccos(w)
    s = jnp.sqrt(jnp.maximum(1.0 - w * w, 0.0))
    axis = jnp.where(
        s[..., None] > eps,
        q[..., :3] / jnp.maximum(s[..., None], eps),
        jnp.broadcast_to(
            jnp.array([1.0, 0.0, 0.0], dtype=q.dtype), q[..., :3].shape
        ),
    )
    return axis, angle


def to_rotation_matrix(q):
    """Unit quaternion(s) → rotation matrix/matrices ``[..., 3, 3]``."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(*q.shape[:-1], 3, 3)


def from_rotation_matrix(m):
    """Rotation matrix ``[..., 3, 3]`` → unit quaternion (Shepperd's method,
    branch-free via jnp.where so it vectorizes)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    s0 = jnp.sqrt(jnp.maximum(tr + 1.0, 1e-12)) * 2.0
    c0 = jnp.stack([(m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0, 0.25 * s0], -1)
    s1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2.0
    c1 = jnp.stack([0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1, (m21 - m12) / s1], -1)
    s2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) * 2.0
    c2 = jnp.stack([(m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2, (m02 - m20) / s2], -1)
    s3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) * 2.0
    c3 = jnp.stack([(m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3, (m10 - m01) / s3], -1)

    use0 = (tr > 0.0)[..., None]
    use1 = ((m00 >= m11) & (m00 >= m22))[..., None]
    use2 = (m11 >= m22)[..., None]
    q = jnp.where(use0, c0, jnp.where(use1, c1, jnp.where(use2, c2, c3)))
    return normalize(q)


def integrate_angular_velocity(q, omega, dt):
    """Advance orientation by quaternion kinematics: q̇ = ½ ω ⊗ q.

    Matches the reference's semi-implicit orientation update
    (ref: impact_physics/src/rigid_body.rs:734-744): q ← normalize(q + dt·q̇).
    """
    omega_q = jnp.concatenate(
        [omega, jnp.zeros_like(omega[..., :1])], axis=-1
    )
    dq = 0.5 * mul(omega_q, q)
    return normalize(q + dt * dq)


def slerp(q0, q1, t):
    """Spherical linear interpolation (shortest arc)."""
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(d < 0, -q1, q1)
    d = jnp.abs(d)
    theta = jnp.arccos(jnp.clip(d, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    small = sin_theta < 1e-5
    w0 = jnp.where(small, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.maximum(sin_theta, 1e-12))
    w1 = jnp.where(small, t, jnp.sin(t * theta) / jnp.maximum(sin_theta, 1e-12))
    return normalize(w0 * q0 + w1 * q1)
