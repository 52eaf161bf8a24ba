"""Sharding and halo-exchange tests on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from impact_tpu.parallel import make_device_mesh
from impact_tpu.parallel.halo import make_sharded_min_filter_x

pytestmark = pytest.mark.skipif(
    len(jax.devices("cpu")) < 8, reason="needs 8 virtual CPU devices"
)


def _mesh():
    return make_device_mesh(
        n_objects_axis=4, n_space_axis=2, devices=jax.devices("cpu")[:8]
    )


class TestMesh:
    def test_mesh_shape(self):
        mesh = _mesh()
        assert mesh.axis_names == ("objects", "space")
        assert mesh.devices.shape == (4, 2)

    def test_sharded_grid_round_trip(self):
        mesh = _mesh()
        x = jnp.arange(8 * 16 * 4 * 4, dtype=jnp.float32).reshape(8, 16, 4, 4)
        xs = jax.device_put(x, NamedSharding(mesh, P("objects", "space")))
        y = jax.jit(lambda a: a * 2 + 1)(xs)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x) * 2 + 1)


class TestHalo:
    def test_min_filter_matches_unsharded(self):
        mesh = _mesh()
        key = jax.random.PRNGKey(0)
        g = jax.random.uniform(key, (8, 16, 4, 4))
        gs = jax.device_put(g, NamedSharding(mesh, P("objects", "space")))
        f = make_sharded_min_filter_x(mesh)
        out = np.asarray(jax.jit(f)(gs))

        # reference: 3-point min along x with +inf boundary
        pad = np.pad(np.asarray(g), ((0, 0), (1, 1), (0, 0), (0, 0)),
                     constant_values=np.inf)
        expected = np.minimum(
            np.minimum(pad[:, :-2], pad[:, 1:-1]), pad[:, 2:]
        )
        np.testing.assert_allclose(out, expected, rtol=1e-6)

    def test_halo_boundary_closed(self):
        # edge shards must see +inf (empty space), not wraparound values
        mesh = _mesh()
        g = jnp.zeros((8, 16, 4, 4)).at[:, 0].set(-5.0).at[:, -1].set(-7.0)
        gs = jax.device_put(g, NamedSharding(mesh, P("objects", "space")))
        out = np.asarray(jax.jit(make_sharded_min_filter_x(mesh))(gs))
        # x=0 plane: min(inf, -5, 0) = -5 — NOT -7 (which wraparound would give)
        assert out[0, 0, 0, 0] == -5.0
        assert out[0, -1, 0, 0] == -7.0
