"""Built-in scenes / model families (ref: apps/basic_app scenes + experiments)."""

from .scenes import SCENES, asteroid, ball_pit, blank, fracturing, voxel_box_tumbler

__all__ = [
    "SCENES",
    "blank",
    "voxel_box_tumbler",
    "fracturing",
    "ball_pit",
    "asteroid",
]
