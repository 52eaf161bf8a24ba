"""Deterministic random sequences: splitmix64, Halton.

Mirrors the reference's RNG utilities (ref: engine/crates/impact_math/src/random.rs):
splitmix64 for seeded integer streams and the Halton low-discrepancy sequence
(bases 2 and 3) used for TAA camera jitter
(ref: impact_camera/src/gpu_resource.rs:24-76, 32-entry jitter sequence).

Simulation-side randomness uses ``jax.random`` keys carried in the state pytree
(SURVEY.md §2.6 determinism controls); these helpers cover the fixed offline
sequences the reference computes with its own RNGs.
"""

from __future__ import annotations

import numpy as np

MASK64 = (1 << 64) - 1


def splitmix64_next(state: int) -> tuple[int, int]:
    """One splitmix64 step → (new_state, output). Pure-Python host-side."""
    state = (state + 0x9E3779B97F4A7C15) & MASK64
    z = state
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK64
    return state, (z ^ (z >> 31)) & MASK64


def splitmix64_sequence(seed: int, n: int) -> np.ndarray:
    """n splitmix64 outputs as uint64."""
    out = np.empty(n, dtype=np.uint64)
    state = seed & MASK64
    for i in range(n):
        state, v = splitmix64_next(state)
        out[i] = v
    return out


def halton(index: int, base: int) -> float:
    """The Halton radical-inverse of ``index`` (1-based) in ``base``."""
    f, r = 1.0, 0.0
    i = index
    while i > 0:
        f /= base
        r += f * (i % base)
        i //= base
    return r


def halton_sequence_2d(n: int, bases=(2, 3), centered: bool = True) -> np.ndarray:
    """[n, 2] Halton points; ``centered`` maps [0,1) → [-0.5, 0.5) for jitter."""
    pts = np.array(
        [[halton(i + 1, bases[0]), halton(i + 1, bases[1])] for i in range(n)],
        dtype=np.float32,
    )
    return pts - 0.5 if centered else pts


# The 32-entry jitter table the camera uses for TAA, matching the reference's
# jitter count (ref: impact_camera/src/gpu_resource.rs "32-entry Halton jitter").
TAA_JITTER_COUNT = 32
taa_jitter_offsets = halton_sequence_2d(TAA_JITTER_COUNT)
