"""Stage-level bisect of the all-black TPU frame: geometry → shadows →
shade → post, fetching each stage's output stats on the real TPU."""
import os
import sys

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
    nz = float((a != 0).mean())
    print(
        f"[black2] {label:24s} shape={a.shape} finite={finite} "
        f"min={a.min():.4g} max={a.max():.4g} nz={nz:.3f}",
        flush=True,
    )


scene = rt._scene_of(sim)
gb, gdrop = rt._geometry(scene, sim.render.frame_index)
for f in gb._fields:
    v = getattr(gb, f)
    if hasattr(v, "shape"):
        stat(f"gbuf.{f}", v)
print(f"[black2] gdrop={int(np.asarray(gdrop))}", flush=True)

omni, uni, sdrop = rt._shadows(scene)
stat("omni", omni)
stat("uni", uni)
lum = rt._shade(gb, omni, uni, rt._textures)
stat("shade lum", lum)
img, hdr, rstate = rt._post(lum, gb.motion, sim.render)
stat("post img", img)
stat("post hdr", hdr)
stat("rstate avg_lum", rstate.avg_luminance)
