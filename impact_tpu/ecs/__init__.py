"""Entity-component system (ref: engine/crates/impact_ecs).

The world is host-side dense SoA numpy arrays + masks; queries are mask
expressions; simulation state is lowered to device pytrees by the runtime.
"""

from . import components
from .world import (
    ComponentMeta,
    EntityStager,
    World,
    component,
    component_registry,
)

__all__ = [
    "World",
    "EntityStager",
    "component",
    "component_registry",
    "ComponentMeta",
    "components",
]
