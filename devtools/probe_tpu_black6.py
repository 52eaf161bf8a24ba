"""Compare scene.tri_pos rows TPU vs CPU for the same sim state."""
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
print(f"[black6] platform={jax.devices()[0].platform}", flush=True)

scene_dev = rt._scene_of(rt.sim)
tp_dev = np.asarray(scene_dev.tri_pos)
act_dev = np.asarray(scene_dev.tri_active)

cpu = jax.devices("cpu")[0]
sim_cpu = jax.device_put(rt.sim, cpu)
with jax.default_device(cpu):
    scene_cpu = jax.jit(rt._scene_of.__wrapped__)(sim_cpu)
tp_cpu = np.asarray(scene_cpu.tri_pos)
act_cpu = np.asarray(scene_cpu.tri_active)

print(f"[black6] active: dev={act_dev.sum()} cpu={act_cpu.sum()} "
      f"agree={np.array_equal(act_dev, act_cpu)}", flush=True)
diff = np.abs(tp_dev - tp_cpu)
print(f"[black6] tri_pos maxdiff={diff.max():.6g} "
      f"rows differing>1e-4: {(diff.max(axis=1) > 1e-4).sum()}", flush=True)
ids = np.nonzero(act_dev)[0][:3]
for i in list(ids) + [10240]:
    print(f"[black6] tri {i} dev = {tp_dev[i]}", flush=True)
    print(f"[black6] tri {i} cpu = {tp_cpu[i]}", flush=True)
