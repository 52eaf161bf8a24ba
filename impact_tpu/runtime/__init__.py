"""Engine runtime (ref: engine/src — Engine, Runtime, headless run loop)."""

from . import checkpoint, command
from .engine import EngineParams, SimState, make_engine_step
from .headless import HeadlessRuntime
from .setup import compile_scene, render_config_from_engine_config

__all__ = [
    "SimState",
    "EngineParams",
    "make_engine_step",
    "compile_scene",
    "render_config_from_engine_config",
    "HeadlessRuntime",
    "checkpoint",
    "command",
]
