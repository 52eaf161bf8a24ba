"""SDF generation graphs, evaluated as fused vectorized ops.

Ref: impact_voxel/src/generation/sdf.rs (smooth union/subtraction/intersection
with the quadratic-polynomial smooth-min — formulas match sdf.rs:74-102
exactly) and generation/sdf/atomic.rs (node set: Sphere/Capsule/Box primitives,
Translation/Rotation/Scaling, smooth boolean ops, MultifractalNoise modifier).

TPU redesign: the reference block-evaluates an explicit node graph into
SIMD-friendly buffers; here a graph is a tree of :class:`SDFNode` dicts that
``evaluate``s over arbitrary point arrays inside jit — XLA fuses the whole
graph into one kernel over the voxel grid. The node schema mirrors atomic.rs
so voxel_generator-style graphs can be transcribed directly.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..math import quaternion as quat

# --- smooth boolean ops (ref: generation/sdf.rs:46-102) -----------------------


def sdf_union(d1, d2, smoothness=0.0):
    if smoothness == 0.0:
        return jnp.minimum(d1, d2)
    h = jnp.maximum(smoothness - jnp.abs(d1 - d2), 0.0)
    return jnp.minimum(d1, d2) - (h * h) * (0.25 / smoothness)


def sdf_subtraction(d1, d2, smoothness=0.0):
    return -sdf_union(-d1, d2, smoothness)


def sdf_intersection(d1, d2, smoothness=0.0):
    return -sdf_union(-d1, -d2, smoothness)


# --- gradient noise (stand-in for the reference's multifractal noise;
#     ref: atomic.rs:171-177 octaves/frequency/lacunarity/persistence/amplitude)


def _hash3(ix, iy, iz, seed):
    h = (
        ix.astype(jnp.uint32) * jnp.uint32(0x8DA6B343)
        + iy.astype(jnp.uint32) * jnp.uint32(0xD8163841)
        + iz.astype(jnp.uint32) * jnp.uint32(0xCB1AB31F)
        + jnp.uint32(seed) * jnp.uint32(0x9E3779B9)
    )
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 16)
    return h


def _grad_dot(ix, iy, iz, fx, fy, fz, seed):
    """Dot of a pseudo-random unit-ish gradient at lattice point with offset."""
    h = _hash3(ix, iy, iz, seed)
    gx = (h & jnp.uint32(0xFF)).astype(jnp.float32) / 127.5 - 1.0
    gy = ((h >> 8) & jnp.uint32(0xFF)).astype(jnp.float32) / 127.5 - 1.0
    gz = ((h >> 16) & jnp.uint32(0xFF)).astype(jnp.float32) / 127.5 - 1.0
    return gx * fx + gy * fy + gz * fz


def gradient_noise(p, seed=0):
    """3D Perlin-style gradient noise over points [...,3], range ≈ [-1, 1]."""
    pi = jnp.floor(p)
    pf = p - pi
    ix, iy, iz = pi[..., 0].astype(jnp.int32), pi[..., 1].astype(jnp.int32), pi[..., 2].astype(jnp.int32)
    fx, fy, fz = pf[..., 0], pf[..., 1], pf[..., 2]
    u = fx * fx * fx * (fx * (fx * 6.0 - 15.0) + 10.0)
    v = fy * fy * fy * (fy * (fy * 6.0 - 15.0) + 10.0)
    w = fz * fz * fz * (fz * (fz * 6.0 - 15.0) + 10.0)

    def g(dx, dy, dz):
        return _grad_dot(ix + dx, iy + dy, iz + dz, fx - dx, fy - dy, fz - dz, seed)

    n000, n100 = g(0, 0, 0), g(1, 0, 0)
    n010, n110 = g(0, 1, 0), g(1, 1, 0)
    n001, n101 = g(0, 0, 1), g(1, 0, 1)
    n011, n111 = g(0, 1, 1), g(1, 1, 1)
    nx00 = n000 + u * (n100 - n000)
    nx10 = n010 + u * (n110 - n010)
    nx01 = n001 + u * (n101 - n001)
    nx11 = n011 + u * (n111 - n011)
    nxy0 = nx00 + v * (nx10 - nx00)
    nxy1 = nx01 + v * (nx11 - nx01)
    return nxy0 + w * (nxy1 - nxy0)


def multifractal_noise(p, octaves=4, frequency=1.0, lacunarity=2.0, persistence=0.5, seed=0):
    """Octave sum of gradient noise (ref: atomic.rs MultifractalNoiseSDFModifier)."""
    total = jnp.zeros(p.shape[:-1], jnp.float32)
    amp, freq = 1.0, frequency
    norm = 0.0
    for o in range(octaves):
        total = total + amp * gradient_noise(p * freq, seed=seed + o)
        norm += amp
        amp *= persistence
        freq *= lacunarity
    return total / max(norm, 1e-12)


# --- node graph -----------------------------------------------------------------

# A node is a dict: {"kind": str, **params, "child"/"children": node(s)}.
# Kinds mirror atomic.rs:63-171: sphere, box, capsule, translation, rotation,
# scaling, union, subtraction, intersection, multifractal_noise.


def sphere(radius):
    return {"kind": "sphere", "radius": float(radius)}


def box(extents):
    return {"kind": "box", "extents": tuple(float(e) for e in extents)}


def capsule(radius, segment_length):
    return {
        "kind": "capsule",
        "radius": float(radius),
        "segment_length": float(segment_length),
    }


def translation(child, offset):
    return {"kind": "translation", "offset": tuple(map(float, offset)), "child": child}


def rotation(child, quaternion_xyzw):
    return {"kind": "rotation", "quaternion": tuple(map(float, quaternion_xyzw)), "child": child}


def scaling(child, scale):
    return {"kind": "scaling", "scale": float(scale), "child": child}


def union(a, b, smoothness=0.0):
    return {"kind": "union", "smoothness": float(smoothness), "children": [a, b]}


def subtraction(a, b, smoothness=0.0):
    return {"kind": "subtraction", "smoothness": float(smoothness), "children": [a, b]}


def intersection(a, b, smoothness=0.0):
    return {"kind": "intersection", "smoothness": float(smoothness), "children": [a, b]}


def noise_modifier(child, octaves=4, frequency=1.0, lacunarity=2.0, persistence=0.5, amplitude=1.0, seed=0):
    return {
        "kind": "multifractal_noise",
        "octaves": int(octaves),
        "frequency": float(frequency),
        "lacunarity": float(lacunarity),
        "persistence": float(persistence),
        "amplitude": float(amplitude),
        "seed": int(seed),
        "child": child,
    }


def evaluate(node, p):
    """Evaluate an SDF graph at points ``p`` [...,3] → distances [...]."""
    kind = node["kind"]
    if kind == "sphere":
        return jnp.linalg.norm(p, axis=-1) - node["radius"]
    if kind == "box":
        he = jnp.asarray(node["extents"], jnp.float32) * 0.5
        q = jnp.abs(p) - he
        return jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1) + jnp.minimum(
            jnp.max(q, axis=-1), 0.0
        )
    if kind == "capsule":
        half = node["segment_length"] * 0.5
        py = jnp.clip(p[..., 1], -half, half)
        q = p - jnp.stack([jnp.zeros_like(py), py, jnp.zeros_like(py)], axis=-1)
        return jnp.linalg.norm(q, axis=-1) - node["radius"]
    if kind == "translation":
        return evaluate(node["child"], p - jnp.asarray(node["offset"], jnp.float32))
    if kind == "rotation":
        q = jnp.asarray(node["quaternion"], jnp.float32)
        return evaluate(node["child"], quat.inverse_rotate(q, p))
    if kind == "scaling":
        s = node["scale"]
        return evaluate(node["child"], p / s) * s
    if kind == "union":
        a, b = node["children"]
        return sdf_union(evaluate(a, p), evaluate(b, p), node["smoothness"])
    if kind == "subtraction":
        a, b = node["children"]
        return sdf_subtraction(evaluate(a, p), evaluate(b, p), node["smoothness"])
    if kind == "intersection":
        a, b = node["children"]
        return sdf_intersection(evaluate(a, p), evaluate(b, p), node["smoothness"])
    if kind == "multifractal_noise":
        d = evaluate(node["child"], p)
        n = multifractal_noise(
            p,
            octaves=node["octaves"],
            frequency=node["frequency"],
            lacunarity=node["lacunarity"],
            persistence=node["persistence"],
            seed=node["seed"],
        )
        return d + n * node["amplitude"]
    raise ValueError(f"unknown SDF node kind {kind!r}")


# --- host-side evaluation + bounds (build-time helpers) -----------------------
#
# Meta-SDF lowering places instances on the surface of already-lowered SDFs
# (ref: meta.rs MetaClosestTranslationToSurface et al.), which happens on the
# host during scene build. A pure-numpy evaluator avoids per-iteration device
# dispatch for those tiny point batches.

import numpy as _np


def _np_hash3(ix, iy, iz, seed):
    with _np.errstate(over="ignore"):  # wrapping u32 hash, overflow intended
        h = (
            ix.astype(_np.uint32) * _np.uint32(0x8DA6B343)
            + iy.astype(_np.uint32) * _np.uint32(0xD8163841)
            + iz.astype(_np.uint32) * _np.uint32(0xCB1AB31F)
            + _np.uint32((seed * 0x9E3779B9) & 0xFFFFFFFF)
        )
        h = h ^ (h >> _np.uint32(13))
        h = h * _np.uint32(0x85EBCA6B)
        h = h ^ (h >> _np.uint32(16))
    return h


def _np_gradient_noise(p, seed=0):
    """Numpy mirror of :func:`gradient_noise` (identical lattice hash)."""
    pi = _np.floor(p)
    pf = p - pi
    ix, iy, iz = pi[..., 0].astype(_np.int32), pi[..., 1].astype(_np.int32), pi[..., 2].astype(_np.int32)
    fx, fy, fz = pf[..., 0], pf[..., 1], pf[..., 2]
    u = fx * fx * fx * (fx * (fx * 6.0 - 15.0) + 10.0)
    v = fy * fy * fy * (fy * (fy * 6.0 - 15.0) + 10.0)
    w = fz * fz * fz * (fz * (fz * 6.0 - 15.0) + 10.0)

    def g(dx, dy, dz):
        h = _np_hash3(ix + dx, iy + dy, iz + dz, seed)
        gx = (h & _np.uint32(0xFF)).astype(_np.float32) / 127.5 - 1.0
        gy = ((h >> _np.uint32(8)) & _np.uint32(0xFF)).astype(_np.float32) / 127.5 - 1.0
        gz = ((h >> _np.uint32(16)) & _np.uint32(0xFF)).astype(_np.float32) / 127.5 - 1.0
        return gx * (fx - dx) + gy * (fy - dy) + gz * (fz - dz)

    n000, n100 = g(0, 0, 0), g(1, 0, 0)
    n010, n110 = g(0, 1, 0), g(1, 1, 0)
    n001, n101 = g(0, 0, 1), g(1, 0, 1)
    n011, n111 = g(0, 1, 1), g(1, 1, 1)
    nx00 = n000 + u * (n100 - n000)
    nx10 = n010 + u * (n110 - n010)
    nx01 = n001 + u * (n101 - n001)
    nx11 = n011 + u * (n111 - n011)
    nxy0 = nx00 + v * (nx10 - nx00)
    nxy1 = nx01 + v * (nx11 - nx01)
    return nxy0 + w * (nxy1 - nxy0)


def _np_quat_rotate(q, v):
    u, w = q[..., :3], q[..., 3:4]
    t = 2.0 * _np.cross(u, v)
    return v + w * t + _np.cross(u, t)


def _np_quat_conj(q):
    return q * _np.array([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def evaluate_np(node, p):
    """Numpy twin of :func:`evaluate` over points ``p`` [...,3] → [...]."""
    p = _np.asarray(p, _np.float32)
    kind = node["kind"]
    if kind == "sphere":
        return _np.linalg.norm(p, axis=-1) - node["radius"]
    if kind == "box":
        he = _np.asarray(node["extents"], _np.float32) * 0.5
        q = _np.abs(p) - he
        return _np.linalg.norm(_np.maximum(q, 0.0), axis=-1) + _np.minimum(
            q.max(axis=-1), 0.0
        )
    if kind == "capsule":
        half = node["segment_length"] * 0.5
        py = _np.clip(p[..., 1], -half, half)
        q = p - _np.stack([_np.zeros_like(py), py, _np.zeros_like(py)], axis=-1)
        return _np.linalg.norm(q, axis=-1) - node["radius"]
    if kind == "translation":
        return evaluate_np(node["child"], p - _np.asarray(node["offset"], _np.float32))
    if kind == "rotation":
        q = _np.asarray(node["quaternion"], _np.float32)
        return evaluate_np(node["child"], _np_quat_rotate(_np_quat_conj(q), p))
    if kind == "scaling":
        s = node["scale"]
        return evaluate_np(node["child"], p / s) * s
    if kind in ("union", "subtraction", "intersection"):
        a, b = node["children"]
        da, db = evaluate_np(a, p), evaluate_np(b, p)
        sm = node["smoothness"]

        def u(d1, d2):
            if sm == 0.0:
                return _np.minimum(d1, d2)
            h = _np.maximum(sm - _np.abs(d1 - d2), 0.0)
            return _np.minimum(d1, d2) - (h * h) * (0.25 / sm)

        if kind == "union":
            return u(da, db)
        if kind == "subtraction":
            return -u(-da, db)
        return -u(-da, -db)
    if kind == "multifractal_noise":
        d = evaluate_np(node["child"], p)
        total = _np.zeros(p.shape[:-1], _np.float32)
        amp, freq, norm = 1.0, node["frequency"], 0.0
        for o in range(node["octaves"]):
            total = total + amp * _np_gradient_noise(p * freq, seed=node["seed"] + o)
            norm += amp
            amp *= node["persistence"]
            freq *= node["lacunarity"]
        return d + (total / max(norm, 1e-12)) * node["amplitude"]
    raise ValueError(f"unknown SDF node kind {kind!r}")


def estimate_bounds(node):
    """Conservative world-space AABB (lo, hi) of a graph's negative region.

    Used as the ray-march domain for surface-relative meta placement (the
    reference's SDFGenerator carries an explicit voxel domain; dict graphs
    derive one, ref: meta.rs:2620-2628 domain.find_ray_intersection)."""
    kind = node["kind"]
    if kind == "sphere":
        r = node["radius"]
        return _np.full(3, -r, _np.float32), _np.full(3, r, _np.float32)
    if kind == "box":
        he = _np.asarray(node["extents"], _np.float32) * 0.5
        return -he, he
    if kind == "capsule":
        r, h = node["radius"], node["segment_length"] * 0.5
        he = _np.array([r, r + h, r], _np.float32)
        return -he, he
    if kind == "translation":
        lo, hi = estimate_bounds(node["child"])
        off = _np.asarray(node["offset"], _np.float32)
        return lo + off, hi + off
    if kind == "rotation":
        lo, hi = estimate_bounds(node["child"])
        q = _np.asarray(node["quaternion"], _np.float32)
        corners = _np.stack(
            [_np.where([(i >> a) & 1 for a in range(3)], hi, lo) for i in range(8)]
        )
        rc = _np_quat_rotate(q, corners)
        return rc.min(axis=0), rc.max(axis=0)
    if kind == "scaling":
        lo, hi = estimate_bounds(node["child"])
        s = node["scale"]
        return lo * s, hi * s
    if kind == "union":
        a, b = node["children"]
        lo1, hi1 = estimate_bounds(a)
        lo2, hi2 = estimate_bounds(b)
        sm = node["smoothness"]
        return _np.minimum(lo1, lo2) - sm, _np.maximum(hi1, hi2) + sm
    if kind == "subtraction":
        return estimate_bounds(node["children"][0])
    if kind == "intersection":
        a, b = node["children"]
        lo1, hi1 = estimate_bounds(a)
        lo2, hi2 = estimate_bounds(b)
        return _np.maximum(lo1, lo2), _np.minimum(hi1, hi2)
    if kind == "multifractal_noise":
        lo, hi = estimate_bounds(node["child"])
        a = abs(node["amplitude"])
        return lo - a, hi + a
    raise ValueError(f"unknown SDF node kind {kind!r}")


# --- graph (de)serialization (ref: apps/voxel_generator graph save/load,
#     editor/meta/io.rs) -----------------------------------------------------

_KNOWN_KINDS = {
    "sphere", "box", "capsule", "translation", "rotation", "scaling",
    "union", "subtraction", "intersection", "multifractal_noise",
}


def validate(node):
    """Validate a graph dict; raises ValueError on unknown kinds/fields."""
    if not isinstance(node, dict) or "kind" not in node:
        raise ValueError(f"not an SDF node: {node!r}")
    kind = node["kind"]
    if kind not in _KNOWN_KINDS:
        raise ValueError(f"unknown SDF node kind {kind!r}")
    for child in node.get("children", []):
        validate(child)
    if "child" in node:
        validate(node["child"])
    return node


def save_graph(path, node):
    """Write a graph to JSON (the voxel_generator analog's file format)."""
    import json

    validate(node)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(node, f, indent=2)


def load_graph(path):
    import json

    with open(path, "r", encoding="utf-8") as f:
        return validate(json.load(f))
