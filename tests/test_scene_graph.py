"""SceneGraph node storage + transform propagation tests
(ref: impact_scene/src/graph.rs:33-482)."""

import numpy as np
import pytest

from impact_tpu.scene import (
    INSTANCE_CASTS_NO_SHADOWS,
    INSTANCE_IS_HIDDEN,
    SceneGraph,
)


def _quat_z(angle):
    return np.array(
        [0.0, 0.0, np.sin(angle / 2), np.cos(angle / 2)], np.float32
    )


class TestSceneGraph:
    def test_node_creation_and_counts(self):
        sg = SceneGraph()
        g = sg.create_group_node(sg.root_node_id, position=(1, 0, 0))
        i = sg.create_model_instance_node(g, model_id=7)
        c = sg.create_camera_node(g)
        assert sg.n_nodes() == 4  # root + group + instance + camera
        assert sg.has_group(g) and sg.has_instance(i)
        sg.remove_camera_node(c)
        sg.remove_model_instance_node(i)
        sg.remove_group_node(g)
        assert sg.n_nodes() == 1

    def test_group_removal_is_recursive(self):
        # ref: graph.rs:307 remove_group_node removes the group and all
        # descendant groups/instances/cameras
        sg = SceneGraph()
        g = sg.create_group_node(sg.root_node_id)
        sg.create_model_instance_node(g, model_id=0)
        child = sg.create_group_node(g)
        sg.create_camera_node(child)
        sg.remove_group_node(g)
        assert sg.n_nodes() == 1
        with pytest.raises(ValueError):
            sg.remove_group_node(sg.root_node_id)

    def test_root_transform_propagation(self):
        sg = SceneGraph()
        # group rotated 90° about z, translated +x
        g1 = sg.create_group_node(
            sg.root_node_id, position=(2, 0, 0), orientation=_quat_z(np.pi / 2)
        )
        g2 = sg.create_group_node(g1, position=(1, 0, 0))
        sg.update_all_group_to_root_transforms()
        p, q = sg.group_to_root_transform(g2)
        # (1,0,0) rotated 90° about z = (0,1,0), then +(2,0,0)
        np.testing.assert_allclose(p, [2.0, 1.0, 0.0], atol=1e-6)

    def test_instance_flatten_scale_flags_and_bounds(self):
        sg = SceneGraph()
        g = sg.create_group_node(sg.root_node_id, position=(0, 5, 0))
        vis = sg.create_model_instance_node(
            g, model_id=3, position=(1, 0, 0), scale=2.0, bounding_radius=1.5
        )
        hid = sg.create_model_instance_node(
            g, model_id=4, flags=INSTANCE_IS_HIDDEN
        )
        sg.create_model_instance_node(
            g, model_id=5, flags=INSTANCE_CASTS_NO_SHADOWS
        )
        sg.update_all_group_to_root_transforms()
        ids, pos, ori, scl, flg, (bc, br) = sg.instance_transforms_to_root()
        assert ids.tolist() == [3, 5]  # hidden excluded
        np.testing.assert_allclose(pos[0], [1.0, 5.0, 0.0], atol=1e-6)
        assert scl[0] == 2.0
        # world bounding radius scales with the instance similarity
        np.testing.assert_allclose(br[0], 3.0, atol=1e-6)
        assert flg[1] & INSTANCE_CASTS_NO_SHADOWS
        ids_all, *_ = sg.instance_transforms_to_root(include_hidden=True)
        assert sorted(ids_all.tolist()) == [3, 4, 5]
        assert sg.instance_flags(hid) & INSTANCE_IS_HIDDEN

    def test_camera_sync(self):
        sg = SceneGraph()
        g = sg.create_group_node(
            sg.root_node_id, position=(0, 0, 3), orientation=_quat_z(np.pi)
        )
        cid = sg.create_camera_node(g, position=(1, 0, 0))
        sg.update_all_group_to_root_transforms()
        p, q = sg.sync_camera_view_transform(cid)
        np.testing.assert_allclose(p, [-1.0, 0.0, 3.0], atol=1e-6)

    def test_transform_setters_take_effect(self):
        sg = SceneGraph()
        g = sg.create_group_node(sg.root_node_id)
        sg.update_all_group_to_root_transforms()
        p0, _ = sg.group_to_root_transform(g)
        np.testing.assert_allclose(p0, [0, 0, 0])
        sg.set_group_to_parent_transform(g, (0, 0, 9), (0, 0, 0, 1))
        sg.update_all_group_to_root_transforms()
        p1, _ = sg.group_to_root_transform(g)
        np.testing.assert_allclose(p1, [0, 0, 9])
