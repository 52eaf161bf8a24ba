"""Pallas TPU kernel: connected-component min-label propagation sweeps.

Ref role: impact_voxel/src/object/split_detection.rs — the reference maintains
two-level disjoint-set forests per chunk; the TPU analog labels occupied
voxels with the minimum reachable linear index by iterative 6-neighbor min
propagation (voxel/interaction.py connected_component_labels).

The XLA while_loop pays an HBM round trip per propagation sweep (each
iteration reads+writes the full [G,G,G] grid). This kernel keeps the label
grid in VMEM (32³ i32 = 128 KB) and runs ``n_sweeps`` propagation steps per
invocation — one HBM read + one write amortized over many sweeps. The outer
fixpoint loop then needs G³/n_sweeps worst-case invocations instead of G³.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_min(lab, axis: int, big):
    """min(lab, neighbors along ±axis) with +big boundary."""
    g = lab.shape[axis]
    fwd = jnp.concatenate(
        [
            jax.lax.slice_in_dim(lab, 1, g, axis=axis),
            jnp.full_like(jax.lax.slice_in_dim(lab, 0, 1, axis=axis), big),
        ],
        axis=axis,
    )
    bwd = jnp.concatenate(
        [
            jnp.full_like(jax.lax.slice_in_dim(lab, 0, 1, axis=axis), big),
            jax.lax.slice_in_dim(lab, 0, g - 1, axis=axis),
        ],
        axis=axis,
    )
    return jnp.minimum(lab, jnp.minimum(fwd, bwd))


def _ccl_kernel(occ_ref, lab_ref, out_ref, *, n_sweeps: int, big: int):
    lab = lab_ref[:]
    occ = occ_ref[:] != 0  # occupancy passed as i32 (bool VMEM refs are flaky)
    for _ in range(n_sweeps):
        m = lab
        for axis in range(3):
            m = _shift_min(m, axis, big)
        lab = jnp.where(occ, m, big)
    out_ref[:] = lab


def ccl_propagate_sweeps(occ, labels, n_sweeps: int = 16, interpret: bool = False):
    """Run ``n_sweeps`` 6-neighbor min-propagation sweeps on one [G,G,G]
    label grid (i32; ``big`` = G³ marks empty voxels). VMEM-resident."""
    g = occ.shape[0]
    big = g * g * g
    kernel = functools.partial(_ccl_kernel, n_sweeps=n_sweeps, big=big)
    occ = occ.astype(jnp.int32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(labels.shape, labels.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(occ, labels)


def connected_component_labels_pallas(
    occ, max_iters: int | None = None, n_sweeps: int = 16, interpret: bool = False
):
    """Drop-in replacement for interaction.connected_component_labels using
    the multi-sweep VMEM kernel inside the fixpoint while_loop."""
    g = occ.shape[0]
    big = jnp.int32(g * g * g)
    lin = jnp.arange(g * g * g, dtype=jnp.int32).reshape(g, g, g)
    labels0 = jnp.where(occ, lin, big)
    if max_iters is None:
        max_iters = -(-g * g * g // n_sweeps)

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        labels, _, it = state
        new = ccl_propagate_sweeps(occ, labels, n_sweeps, interpret=interpret)
        return new, jnp.any(new != labels), it + 1

    labels, _, _ = jax.lax.while_loop(
        cond, body, (labels0, jnp.asarray(True), jnp.asarray(0))
    )
    return jnp.where(occ, labels, -1)
