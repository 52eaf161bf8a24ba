"""Bisect the all-black TPU parity frame: fetch intermediate stage outputs
on the real TPU and report where the signal dies (finite? nonzero? count)."""
import os
import sys
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apps.parity_snapshots import build_runtime  # noqa: E402

name = os.environ.get("SCENE", "ShadowCubeMapping")
rt = build_runtime(name, backend="xla")
sim = rt.sim


def stat(label, arr):
    a = np.asarray(arr)
    finite = bool(np.isfinite(a).all()) if a.dtype.kind == "f" else True
    print(
        f"[black] {label:28s} shape={a.shape} finite={finite} "
        f"min={a.min():.4g} max={a.max():.4g} mean={float(a.mean()):.4g}",
        flush=True,
    )


stat("pool alive", sim.voxels.alive)

# scene assembly (already-jitted small program)
scene = rt._scene_of(sim)
stat("scene tri_active", scene.tri_active)
stat("scene tri_pos", scene.tri_pos)
print(f"[black] n active tris = {int(np.asarray(scene.tri_active).sum())}", flush=True)

# render state (exposure / TAA history)
for f in sim.render._fields:
    v = getattr(sim.render, f)
    if hasattr(v, "shape"):
        stat(f"render.{f}", v)

img = np.asarray(rt.render())
stat("final image", img)

# one more render after state advanced
img2 = np.asarray(rt.render())
stat("second render", img2)
