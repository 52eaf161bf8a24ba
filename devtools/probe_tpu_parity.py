"""Isolate the tpu_parity_score=0.43 bug: render the parity scene on the
REAL TPU with BOTH raster backends and score each against the reference
golden AND against the other.

- xla-on-TPU low too  -> a non-raster TPU numerics issue (shadows/shade/post)
- pallas low, xla ok  -> the Pallas kernel misbehaves on hardware
  (interpret-mode tests pass, so it's a hardware-semantics divergence)
"""
import os
import sys
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apps.parity_snapshots import REF_DIR, build_runtime  # noqa: E402

from impact_tpu.utils.image import load_png, rgb_hybrid_compare, save_png  # noqa: E402

name = os.environ.get("SCENE", "ShadowCubeMapping")
print(f"[probe] devices: {jax.devices()}", flush=True)
ref = np.asarray(load_png(REF_DIR / f"{name}.png"))[..., :3]

imgs = {}
for backend in ("pallas", "xla"):
    t0 = time.perf_counter()
    rt = build_runtime(name, backend=backend)
    img = np.asarray(rt.render())
    imgs[backend] = img
    score = float(rgb_hybrid_compare(img, ref))
    drops = int(rt.dropped_raster_candidates())
    print(
        f"[probe] {backend:6s} vs golden: {score:.4f} drops={drops} "
        f"({time.perf_counter() - t0:.0f}s)",
        flush=True,
    )
    save_png(f"/tmp/parity_{backend}.png", img)

cross = float(rgb_hybrid_compare(imgs["pallas"], imgs["xla"]))
diff = np.abs(imgs["pallas"].astype(np.int16) - imgs["xla"].astype(np.int16))
print(f"[probe] pallas vs xla (both on this platform): {cross:.4f}", flush=True)
print(
    f"[probe] maxdiff={diff.max()} meandiff={diff.mean():.2f} "
    f"pix>8: {(diff.max(-1) > 8).mean() * 100:.1f}%",
    flush=True,
)
save_png("/tmp/parity_diff.png", diff.astype(np.uint8))
