"""SDF voxel-object generator CLI.

Ref: apps/voxel_generator — the reference's interactive egui node-graph editor
for SDF meta/atomic graphs with live voxel regeneration, preview, and graph
save/load (editor/meta/io.rs). The TPU-native equivalent is a headless CLI
over the same graph model (impact_tpu.voxel.sdf dict graphs as JSON):

    python apps/voxel_generator.py preview graph.json out.png
    python apps/voxel_generator.py stats graph.json
    python apps/voxel_generator.py example out.json     # writes a demo graph
    python apps/voxel_generator.py vary graph.json outdir N   # N seed variants
"""

from __future__ import annotations

import sys


def _force_cpu():
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass


def example_graph():
    from impact_tpu.voxel import sdf

    rock = sdf.noise_modifier(
        sdf.sphere(9.0), octaves=4, frequency=0.25, persistence=0.55,
        amplitude=1.8, seed=7,
    )
    spike = sdf.translation(sdf.capsule(1.5, 10.0), (0.0, 6.0, 0.0))
    return sdf.union(rock, spike, smoothness=1.5)


def cmd_example(path):
    from impact_tpu.voxel import sdf

    sdf.save_graph(path, example_graph())
    print(f"wrote {path}")


def _load_any_graph(path, seed=0):
    """Load an atomic OR meta graph JSON; meta graphs lower with ``seed``."""
    import json

    from impact_tpu.voxel import meta_sdf, sdf

    with open(path, "r", encoding="utf-8") as f:
        node = json.load(f)
    if isinstance(node, dict) and str(node.get("kind", "")).startswith("meta_"):
        return meta_sdf.lower(node, seed=seed)
    return sdf.validate(node)


def cmd_stats(path, grid_size=48, extent=0.5):
    _force_cpu()
    import jax.numpy as jnp

    from impact_tpu.voxel import generate_sdf_grid, surface_nets
    from impact_tpu.voxel.mesh import mesh_counts

    graph = _load_any_graph(path)
    s, origin = generate_sdf_grid(graph, grid_size, extent)
    mesh = surface_nets(s, jnp.zeros((grid_size,) * 3, jnp.int32))
    nv, nt = mesh_counts(mesh)
    n_solid = int((s < 0).sum())
    print(
        f"grid {grid_size}³ @ {extent}: {n_solid} solid voxels, "
        f"{int(nv)} vertices, {int(nt)} triangles"
    )


def cmd_preview(path, out_png, grid_size=48, extent=0.5):
    _force_cpu()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from impact_tpu.render import (
        Camera, RenderConfig, empty_light_pools, init_render_state,
        look_at, render_frame,
    )
    from impact_tpu.scene.assembly import render_scene_from_indexed
    from impact_tpu.utils.image import save_png
    from impact_tpu.voxel import sdf, generate_sdf_grid, surface_nets

    graph = _load_any_graph(path)
    s, origin = generate_sdf_grid(graph, grid_size, extent)
    mesh = surface_nets(s, jnp.zeros((grid_size,) * 3, jnp.int32))
    verts = mesh.vert_pos * extent + origin
    v = verts.shape[0]
    scene = render_scene_from_indexed(
        verts, mesh.vert_normal,
        jnp.tile(jnp.asarray([[0.55, 0.45, 0.38]]), (v, 1)),
        jnp.full((v, 3), 0.04), jnp.full(v, 0.8), jnp.zeros((v, 3)),
        jnp.full((v,), -1, jnp.int32),
        mesh.tri_indices, mesh.tri_active,
    )
    lights = empty_light_pools(1, 1)
    lights = lights._replace(
        ambient_luminance=jnp.asarray([1500.0, 1600.0, 1900.0]),
        uni_direction=lights.uni_direction.at[0].set(
            jnp.asarray([-0.4, -0.75, -0.5]) / np.linalg.norm([-0.4, -0.75, -0.5])
        ),
        uni_illuminance=lights.uni_illuminance.at[0].set(
            jnp.asarray([35000.0, 33000.0, 30000.0])
        ),
        uni_mask=lights.uni_mask.at[0].set(True),
    )
    r = grid_size * extent
    eye = (1.6 * r, 1.0 * r, 1.9 * r)
    cam = Camera(
        jnp.asarray(eye), look_at(eye, (0.0, 0.0, 0.0)),
        jnp.asarray(np.pi / 3), jnp.asarray(0.1), jnp.asarray(20.0 * r),
    )
    cfg = RenderConfig(
        width=320, height=240, shadows_enabled=False, taa_enabled=False,
        ao_enabled=True, sky_luminance=(2500.0, 3500.0, 7000.0),
    )
    img, _, _ = jax.jit(
        lambda sc, st: render_frame(sc, lights, cam, cam, st, cfg)
    )(scene, init_render_state(cfg))
    save_png(out_png, img)
    print(f"wrote {out_png}")


def cmd_vary(path, out_dir, n: int = 4):
    """Render ``n`` seed variations of a (meta) graph — the headless analog of
    the editor's stochastic-parameter exploration (meta graphs resample their
    distributions per seed; atomic graphs rendered once per seed identically).
    """
    import pathlib

    pathlib.Path(out_dir).mkdir(parents=True, exist_ok=True)
    for seed in range(n):
        import json

        from impact_tpu.voxel import meta_sdf, sdf

        with open(path, "r", encoding="utf-8") as f:
            node = json.load(f)
        tmp = pathlib.Path(out_dir) / f"_variant_{seed}.json"
        if isinstance(node, dict) and str(node.get("kind", "")).startswith("meta_"):
            lowered = meta_sdf.lower(node, seed=seed)
        else:
            lowered = sdf.validate(node)
        sdf.save_graph(tmp, lowered)
        cmd_preview(str(tmp), str(pathlib.Path(out_dir) / f"variant_{seed}.png"))
        tmp.unlink()


def main(argv):
    if len(argv) < 2:
        print(__doc__)
        return 1
    cmd = argv[1]
    if cmd == "example":
        cmd_example(argv[2])
    elif cmd == "stats":
        cmd_stats(argv[2])
    elif cmd == "preview":
        cmd_preview(argv[2], argv[3])
    elif cmd == "vary":
        cmd_vary(argv[2], argv[3], int(argv[4]) if len(argv) > 4 else 4)
    else:
        print(__doc__)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
