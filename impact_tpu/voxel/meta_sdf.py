"""Meta-SDF graphs: stochastic composition of atomic SDF graphs.

Ref: impact_voxel/src/generation/sdf/meta.rs (+params.rs) — MetaSDFGraph nodes
instantiate collections of primitives with distribution-sampled parameters,
place them via transform generators (stratified grids, sphere surfaces,
stochastic selection), and lower everything to an atomic SDFGraph.

The subset here covers the structural core: primitive collections with
per-instance sampled parameters, stratified-grid and sphere-surface transform
generators, stochastic selection, and smooth-union grouping. Sampling is
host-side with a seeded numpy RNG (the reference samples on the CPU too,
params.rs); lowering emits `voxel.sdf` dict graphs, so the result evaluates
inside jit like any atomic graph.

A meta node is a dict {"kind": "meta_*", ...}; ``lower`` resolves it.
"""

from __future__ import annotations

import numpy as np

from . import sdf as atomic


# --- parameter distributions (ref: params.rs distribution-sampled parameters) --


def constant(v):
    return {"dist": "constant", "value": float(v)}


def uniform(lo, hi):
    return {"dist": "uniform", "lo": float(lo), "hi": float(hi)}


def normal(mean, stddev):
    return {"dist": "normal", "mean": float(mean), "stddev": float(stddev)}


def _sample(dist, rng: np.random.Generator, n: int) -> np.ndarray:
    if isinstance(dist, (int, float)):
        return np.full(n, float(dist))
    kind = dist["dist"]
    if kind == "constant":
        return np.full(n, dist["value"])
    if kind == "uniform":
        return rng.uniform(dist["lo"], dist["hi"], n)
    if kind == "normal":
        return rng.normal(dist["mean"], dist["stddev"], n)
    raise ValueError(f"unknown distribution {kind!r}")


# --- meta nodes -----------------------------------------------------------------


def meta_spheres(radius=1.0):
    """Collection of spheres with distribution-sampled radii
    (ref: meta.rs MetaSpheres)."""
    return {"kind": "meta_spheres", "radius": radius}


def meta_boxes(extent=1.0):
    return {"kind": "meta_boxes", "extent": extent}


def meta_capsules(radius=0.5, segment_length=1.0):
    return {"kind": "meta_capsules", "radius": radius, "segment_length": segment_length}


def stratified_grid_transforms(child, shape=(3, 3, 3), cell_size=2.0, jitter=0.5,
                               scale=1.0):
    """Instantiate the child collection on a jittered grid
    (ref: meta.rs MetaStratifiedGridTransforms)."""
    return {
        "kind": "meta_stratified_grid",
        "shape": tuple(int(s) for s in shape),
        "cell_size": float(cell_size),
        "jitter": float(jitter),
        "scale": scale,
        "child": child,
    }


def sphere_surface_transforms(child, count=16, sphere_radius=5.0, jitter=0.0,
                              scale=1.0):
    """Instantiate the child collection on a sphere surface
    (ref: meta.rs MetaSphereSurfaceTransforms)."""
    return {
        "kind": "meta_sphere_surface",
        "count": int(count),
        "sphere_radius": float(sphere_radius),
        "jitter": float(jitter),
        "scale": scale,
        "child": child,
    }


def stochastic_selection(child, keep_probability=0.5):
    """Randomly drop instances (ref: meta.rs MetaStochasticSelection)."""
    return {
        "kind": "meta_stochastic_selection",
        "keep_probability": float(keep_probability),
        "child": child,
    }


def group_union(children, smoothness=0.0):
    """Smooth union of meta/atomic children (ref: meta.rs group-union)."""
    return {"kind": "meta_group_union", "smoothness": float(smoothness),
            "children": list(children)}


# --- lowering --------------------------------------------------------------------


def _instantiate_primitive(node, rng, n):
    """Sample n instances of a primitive collection → list of atomic graphs."""
    kind = node["kind"]
    if kind == "meta_spheres":
        radii = _sample(node["radius"], rng, n)
        return [atomic.sphere(max(r, 1e-3)) for r in radii]
    if kind == "meta_boxes":
        ext = _sample(node["extent"], rng, n)
        return [atomic.box((e, e, e)) for e in np.maximum(ext, 1e-3)]
    if kind == "meta_capsules":
        radii = _sample(node["radius"], rng, n)
        segs = _sample(node["segment_length"], rng, n)
        return [
            atomic.capsule(max(r, 1e-3), max(s, 1e-3))
            for r, s in zip(radii, segs)
        ]
    raise ValueError(f"not a primitive collection: {kind!r}")


def lower(node, seed: int = 0, smoothness: float = 0.0):
    """Lower a meta graph to an atomic SDF graph (ref: meta.rs lowering)."""
    rng = np.random.default_rng(seed)
    return _lower(node, rng, smoothness)


def _union_all(graphs, smoothness):
    if not graphs:
        # empty selection: a far-away point (evaluates to +large everywhere near)
        return atomic.translation(atomic.sphere(1e-3), (1e6, 1e6, 1e6))
    out = graphs[0]
    for g in graphs[1:]:
        out = atomic.union(out, g, smoothness)
    return out


def _lower(node, rng, smoothness):
    kind = node.get("kind", "")
    if not kind.startswith("meta_"):
        return node  # already atomic

    if kind == "meta_group_union":
        children = [_lower(c, rng, node["smoothness"]) for c in node["children"]]
        return _union_all(children, node["smoothness"])

    if kind == "meta_stratified_grid":
        shape = node["shape"]
        n = int(np.prod(shape))
        prims = _instantiate_primitive(node["child"], rng, n)
        scales = _sample(node["scale"], rng, n)
        cs = node["cell_size"]
        centers = []
        for i in range(shape[0]):
            for j in range(shape[1]):
                for k in range(shape[2]):
                    base = (np.array([i, j, k]) - (np.array(shape) - 1) / 2.0) * cs
                    off = rng.uniform(-0.5, 0.5, 3) * node["jitter"] * cs
                    centers.append(base + off)
        graphs = [
            atomic.translation(atomic.scaling(p, max(s, 1e-3)), tuple(c))
            for p, s, c in zip(prims, scales, centers)
        ]
        return _union_all(graphs, smoothness)

    if kind == "meta_sphere_surface":
        n = node["count"]
        prims = _instantiate_primitive(node["child"], rng, n)
        scales = _sample(node["scale"], rng, n)
        # Fibonacci sphere + jitter (even surface coverage)
        idx = np.arange(n) + 0.5
        phi = np.arccos(1 - 2 * idx / n)
        theta = np.pi * (1 + 5**0.5) * idx
        pts = np.stack(
            [np.sin(phi) * np.cos(theta), np.cos(phi), np.sin(phi) * np.sin(theta)],
            axis=-1,
        ) * node["sphere_radius"]
        pts = pts + rng.normal(0, node["jitter"], pts.shape)
        graphs = [
            atomic.translation(atomic.scaling(p, max(s, 1e-3)), tuple(c))
            for p, s, c in zip(prims, scales, pts)
        ]
        return _union_all(graphs, smoothness)

    if kind == "meta_stochastic_selection":
        lowered = _lower(node["child"], rng, smoothness)
        # selection applies to union children of the lowered graph
        flat = _flatten_union(lowered)
        keep = [g for g in flat if rng.uniform() < node["keep_probability"]]
        return _union_all(keep, smoothness)

    raise ValueError(f"unknown meta node kind {kind!r}")


def _flatten_union(graph):
    if graph.get("kind") == "union":
        out = []
        for c in graph["children"]:
            out.extend(_flatten_union(c))
        return out
    return [graph]
