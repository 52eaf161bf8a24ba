"""Is an XLA row-gather of per-pixel winner payloads viable? The Pallas
kernel's one-hot select phase costs ~28 ms at 1080p; the alternative emits
(z, winner index) per pixel (depth-kernel cost, ~12 ms) and gathers the
winner's payload row per pixel in XLA. Decisive number: gather rate for
[2M] rows of 80 f32 from a [290k, 80] table."""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
K = 16


def timeit(name, body):
    @jax.jit
    def loop():
        def step(i, acc):
            out = body(i)
            return acc + jnp.sum(out.reshape(-1)[:1].astype(jnp.float32))

        return jax.lax.fori_loop(0, K, step, jnp.float32(0))

    t0 = time.perf_counter()
    loop().block_until_ready()
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    loop().block_until_ready()
    dt = (time.perf_counter() - t0) / K * 1e3
    print(f"[wg] {name:46s} {dt:8.2f} ms  (compile {c:.0f}s)", flush=True)


def main():
    rng = np.random.default_rng(0)
    n_pix = 1920 * 1088
    n_rows = 290_000
    for rows_w in (80, 16):
        table = jnp.asarray(
            rng.random((n_rows, rows_w)).astype(np.float32)
        )
        idx = jnp.asarray(
            rng.integers(0, n_rows, n_pix).astype(np.int32)
        )
        # coherent indices (neighboring pixels hit nearby rows — the real
        # raster's winners are tile-local)
        idx_coh = jnp.asarray(
            np.clip(
                np.repeat(np.arange(n_pix // 64), 64)
                * (n_rows // (n_pix // 64))
                + rng.integers(0, 128, n_pix),
                0, n_rows - 1,
            ).astype(np.int32)
        )
        timeit(
            f"gather [{n_pix}] rows of {rows_w} (random)",
            lambda i, t=table, ix=idx: t[jnp.minimum(ix + i, n_rows - 1)],
        )
        timeit(
            f"gather [{n_pix}] rows of {rows_w} (coherent)",
            lambda i, t=table, ix=idx_coh: t[jnp.minimum(ix + i, n_rows - 1)],
        )


if __name__ == "__main__":
    main()
