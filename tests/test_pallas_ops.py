"""Pallas kernels vs their XLA reference implementations (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestCclPallas:
    def test_matches_xla_path(self):
        """The multi-sweep VMEM CCL kernel (interpret mode on CPU) must match
        the XLA min-propagation labels exactly."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from impact_tpu.ops.ccl_pallas import connected_component_labels_pallas
        from impact_tpu.voxel import sdf as sdflib
        from impact_tpu.voxel.interaction import connected_component_labels
        from impact_tpu.voxel.object import generate_sdf_grid

        g = sdflib.union(
            sdflib.translation(sdflib.sphere(4.0), (-7.0, 0, 0)),
            sdflib.translation(sdflib.sphere(3.0), (7.0, 0, 0)),
        )
        s, _ = generate_sdf_grid(g, 32, 1.0)
        occ = s < 0
        ref = np.asarray(connected_component_labels(occ))
        out = np.asarray(
            connected_component_labels_pallas(occ, n_sweeps=8, interpret=True)
        )
        np.testing.assert_array_equal(ref, out)
        assert len(np.unique(ref[ref >= 0])) == 2
