"""Built-in scenes / model families (ref: apps/basic_app scenes + experiments)."""

from .scenes import (
    SCENES,
    asteroid,
    ball_pit,
    blank,
    drag_drop,
    fracturing,
    free_rotation,
    harmonic_oscillation,
    rendering_test,
    voxel_box_tumbler,
)

__all__ = [
    "SCENES",
    "blank",
    "voxel_box_tumbler",
    "fracturing",
    "ball_pit",
    "asteroid",
    "harmonic_oscillation",
    "free_rotation",
    "drag_drop",
    "rendering_test",
]
