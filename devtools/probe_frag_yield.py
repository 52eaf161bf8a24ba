"""Offline fragment-yield probe: distinct Voronoi cells with >=1 voxel for
the bench fracture scene's box geometry, vs seed count / radius."""
import jax
import jax.numpy as jnp
import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from impact_tpu.voxel.interaction import sample_fracture_seeds  # noqa: E402

G = 32
ext = 0.25
ijk = jnp.stack(
    jnp.meshgrid(*[jnp.arange(G)] * 3, indexing="ij"), -1
).astype(jnp.float32)
pos = (ijk + 0.5 - G / 2) * ext
occ = jnp.all(jnp.abs(pos) <= 14 * ext / 2, axis=-1)
print("box voxels:", int(occ.sum()), flush=True)
impact = jnp.array([-1.75, 0.0, 0.0])
key = jax.random.PRNGKey(0)
for n_seeds in (192, 256):
    for rad in (2.0, 2.5, 3.0, 4.0):
        seeds = sample_fracture_seeds(
            key, impact, -impact, rad, n_seeds, radial_falloff_power=2.0
        )
        d2 = jnp.sum(
            (pos[:, :, :, None, :] - seeds[None, None, None, :, :]) ** 2, -1
        )
        a = jnp.argmin(d2, -1)
        in_r = jnp.linalg.norm(pos - impact[None, None, None, :], axis=-1) <= rad
        region = occ & in_r
        ids = np.unique(np.asarray(a)[np.asarray(region)])
        print(
            f"n_seeds={n_seeds} radius={rad}: region={int(region.sum())} "
            f"fragments={int((ids != 0).sum())}",
            flush=True,
        )
