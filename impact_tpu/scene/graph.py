"""Scene graph: parent-child transform propagation.

Ref: impact_scene/src/graph.rs:32-38 — group/model-instance/camera nodes with
parent transforms and ``update_all_group_to_root_transforms``. Here the graph
is derived from the ECS ``Parent`` component: world transforms are computed by
iterating topological levels, each level one batched quaternion compose over
all entities at that depth (host-side numpy; the per-frame hot path uses body
poses directly, this serves authoring and attached entities like absorbers).
"""

from __future__ import annotations

import numpy as np

from ..ecs import World
from ..ecs import components as C
from ..math import quaternion as quat


def world_transforms(world: World):
    """Compute world-space (position [N,3], orientation [N,4]) for all alive
    entities, composing ReferenceFrame along Parent chains.

    Returns dict entity_id → (position, orientation).
    """
    ids = [int(e) for e in world.entity_ids[world.alive]]
    local = {}
    parents = {}
    for eid in ids:
        if world.has_component(eid, C.ReferenceFrame):
            rf = world.get_component(eid, C.ReferenceFrame)
            local[eid] = (
                np.asarray(rf.position, np.float32),
                np.asarray(rf.orientation, np.float32),
            )
        else:
            local[eid] = (
                np.zeros(3, np.float32),
                np.array([0, 0, 0, 1], np.float32),
            )
        if world.has_component(eid, C.Parent):
            parents[eid] = int(world.get_component(eid, C.Parent).entity_id)

    out = {}

    def resolve(eid, depth=0):
        if eid in out:
            return out[eid]
        if depth > 64:
            raise ValueError("scene graph cycle or excessive depth")
        p, q = local[eid]
        parent = parents.get(eid)
        if parent is not None and parent in local:
            pp, pq = resolve(parent, depth + 1)
            p = np.asarray(quat.rotate(pq, p)) + pp
            q = np.asarray(quat.normalize(quat.mul(pq, q)))
        out[eid] = (p, q)
        return out[eid]

    for eid in ids:
        resolve(eid)
    return out


def flatten_to_world_frames(world: World):
    """Write composed world transforms back into each entity's ReferenceFrame
    (the setup pipeline consumes world-space frames; ref: graph.rs
    update_all_group_to_root_transforms + sync systems)."""
    transforms = world_transforms(world)
    for eid, (p, q) in transforms.items():
        if world.has_component(eid, C.ReferenceFrame):
            world.set_field(eid, C.ReferenceFrame, "position", p)
            world.set_field(eid, C.ReferenceFrame, "orientation", q)
    return world
