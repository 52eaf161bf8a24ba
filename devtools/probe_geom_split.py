"""Split the geometry pass's cost at bench conditions (1080p, 64 objects):
prologue (SoA project/clip/plane + binning sort + row gather) vs the Pallas
kernel, and kernel cost vs attribute-row count (60 rows = 20 attrs today)."""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf.reshape(-1)[:1]))


def timeit(name, fn, *args, n=20):
    f = jax.jit(fn)
    _fetch(f(*args))
    t0 = time.perf_counter()
    for _ in range(5):
        _fetch(jnp.ones((4,)))
    fc = (time.perf_counter() - t0) / 5
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    _fetch(out)
    dt = max(time.perf_counter() - t0 - fc, 0.0) / n * 1e3
    print(f"[gs] {name:52s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    from impact_tpu.ecs import components as C
    from impact_tpu.models import voxel_box_tumbler
    from impact_tpu.runtime import HeadlessRuntime, compile_scene
    from impact_tpu.scene.assembly import build_render_scene
    from impact_tpu.render import raster_pallas as rp
    from impact_tpu.render.camera import projection_matrix, view_matrix
    from impact_tpu.utils.config import EngineConfig

    H, W = 1080, 1920
    n_objects = 64
    cfg = EngineConfig()
    cfg.tpu.max_voxel_objects = n_objects
    cfg.tpu.max_bodies = n_objects + 16
    cfg.tpu.max_contacts = 1024
    cfg.tpu.voxel_grid_size = 32
    cfg.tpu.render_width = W
    cfg.tpu.render_height = H
    cfg.tpu.solver_mode = "jacobi"
    cfg.tpu.render_tris_per_object = 4096
    cfg.tpu.max_render_triangles = n_objects * 4096 + 64
    cfg.tpu.sdf_encoding = "i8"

    world = voxel_box_tumbler(n_boxes=n_objects - 2, seed=3)
    for eid in world.entities_with(C.VoxelBox):
        world.set_field(eid, C.VoxelBox, "extent_x", 26.0)
        world.set_field(eid, C.VoxelBox, "extent_y", 26.0)
        world.set_field(eid, C.VoxelBox, "extent_z", 26.0)
    t0 = time.perf_counter()
    build = compile_scene(world, cfg)
    print(f"[gs] compile_scene {time.perf_counter() - t0:.0f}s", flush=True)
    rt = HeadlessRuntime(build, cfg, enable_fracturing=False)
    rt.step(2)
    sim = rt.sim
    params = rt.params

    scene = jax.jit(rt._scene_of)(sim)
    cam = params.camera
    vm = view_matrix(cam)
    pm = projection_matrix(cam, W, H, None)
    vp = pm @ vm
    tri_pos = jax.device_put(scene.tri_pos)
    tri_active = jax.device_put(scene.tri_active)
    t = tri_pos.shape[0]
    print(f"[gs] T={t} active={int(jnp.sum(tri_active))}", flush=True)

    def packed_attrs(n_per_corner):
        cols = []
        for c in range(3):
            base = scene.tri_pos[:, 3 * c : 3 * c + 3]
            reps = [base, scene.tri_normal[:, 3 * c : 3 * c + 3],
                    scene.tri_albedo[:, 3 * c : 3 * c + 3],
                    scene.tri_f0[:, 3 * c : 3 * c + 3],
                    scene.tri_emissive[:, 3 * c : 3 * c + 3],
                    scene.tri_pos_prev[:, 3 * c : 3 * c + 3],
                    scene.tri_roughness[:, c : c + 1],
                    scene.tri_material[:, c : c + 1].astype(jnp.float32)]
            cat = jnp.concatenate(reps, axis=-1)[:, :n_per_corner]
            cols.append(cat)
        return jnp.concatenate(cols, axis=-1)

    import os as _os

    variants = [
        tuple(int(x) for x in v.split(":"))
        for v in _os.environ.get("GS_VARIANTS", "32:256,64:512").split(",")
    ]
    for n_attr in (20,):
        packed = jax.device_put(packed_attrs(n_attr))
        for tile, k in variants:
            f = jax.jit(
                lambda tp, ta, pk, tile=tile, k=k: rp.rasterize_attributes_pos(
                    tp, ta, pk, vp, H, W, tile=tile, k_per_range=k,
                    return_drops=True)
            )
            drops = int(f(tri_pos, tri_active, packed)[3])
            timeit(
                f"rasterize_attributes_pos tile={tile} k={k} drops={drops}",
                lambda tp, ta, pk, tile=tile, k=k: rp.rasterize_attributes_pos(
                    tp, ta, pk, vp, H, W, tile=tile, k_per_range=k),
                tri_pos, tri_active, packed,
            )
            if _os.environ.get("GS_AB_SELECT", "0") == "1":
                _os.environ["IMPACT_RASTER_SELECT_MONO"] = "1"
                timeit(
                    f"  ... same, MONOLITHIC select tile={tile} k={k}",
                    lambda tp, ta, pk, tile=tile, k=k:
                    rp.rasterize_attributes_pos(
                        tp, ta, pk, vp, H, W, tile=tile, k_per_range=k),
                    tri_pos, tri_active, packed,
                )
                del _os.environ["IMPACT_RASTER_SELECT_MONO"]
    if _os.environ.get("GS_FULL", "0") != "1":
        return

    packed20 = jax.device_put(packed_attrs(20))

    # prologue only: everything up to (and incl.) payload construction
    def prologue(tp, ta, pk):
        vx, vy, vz, vw = rp._project_soa(tp, vp)
        (cx, cy, cz, cw), bary, act2 = rp._clip_near_soa(
            vx, vy, vz, vw, ta, need_bary=True)
        a_dim = pk.shape[1] // 3
        ca = [jnp.concatenate([pk[:, c * a_dim:(c + 1) * a_dim]] * 2, axis=0)
              for c in range(3)]
        attr_rows = [
            bary[i][0] * ca[0][:, j] + bary[i][1] * ca[1][:, j]
            + bary[i][2] * ca[2][:, j]
            for i in range(3) for j in range(a_dim)]
        geom, act, bbox, near_z = rp._plane_soa(cx, cy, cz, cw, act2, H, W, True)
        return rp._bin_planes(geom, act, bbox, near_z, H, W, 32, 256, 128,
                              attr_rows, n_first=t)[:4]

    timeit("prologue only (clip+planes+sort+gather)", prologue,
           tri_pos, tri_active, packed20)

    # prologue minus the row gather: sort (key,id) only + plane setup
    def prologue_nosort(tp, ta, pk):
        vx, vy, vz, vw = rp._project_soa(tp, vp)
        (cx, cy, cz, cw), bary, act2 = rp._clip_near_soa(
            vx, vy, vz, vw, ta, need_bary=True)
        a_dim = pk.shape[1] // 3
        ca = [jnp.concatenate([pk[:, c * a_dim:(c + 1) * a_dim]] * 2, axis=0)
              for c in range(3)]
        attr_rows = [
            bary[i][0] * ca[0][:, j] + bary[i][1] * ca[1][:, j]
            + bary[i][2] * ca[2][:, j]
            for i in range(3) for j in range(a_dim)]
        geom, act, bbox, near_z = rp._plane_soa(cx, cy, cz, cw, act2, H, W, True)
        return [jnp.sum(r) for r in attr_rows[:4]] + [jnp.sum(geom[0])]

    timeit("prologue minus binning (clip+planes+attr rows)", prologue_nosort,
           tri_pos, tri_active, packed20)

    # kernel only: prebuilt prologue outputs as inputs
    ranges, payload, big_rows, big_mask = jax.jit(prologue)(
        tri_pos, tri_active, packed20)
    th = -(-H // 32)
    tw = -(-W // 32)
    timeit(
        "kernel only n_attr=20",
        lambda r, p, br, bm: rp._run(r, p, br, bm, th, tw, 32, 256, 20, False),
        ranges, payload, big_rows, big_mask,
    )

    timeit(
        "kernel only n_attr=20 UNCOND (no block conds)",
        lambda r, p, br, bm: rp._run(r, p, br, bm, th, tw, 32, 256, 20, False,
                                     skip_empty=False),
        ranges, payload, big_rows, big_mask,
    )
    # fewer candidate blocks: k_per_range=128 -> 2 blocks/window (ranges were
    # built for k=256; counts>128 would drop, but timing is representative)
    timeit(
        "kernel only n_attr=20 k_per_range=128",
        lambda r, p, br, bm: rp._run(r, p, br, bm, th, tw, 32, 128, 20, False),
        ranges, payload, big_rows, big_mask,
    )

    # kernel with fewer rows: slice payload to 12+3*na rows
    for na in (10, 4, 0):
        rows_pad = -(-(12 + 3 * na) // 8) * 8
        p2 = payload[:, :rows_pad, :]
        timeit(
            f"kernel only n_attr={na} (rows={rows_pad})",
            lambda r, p, br, bm, na=na, rows_pad=rows_pad: rp._run(
                r, p, br[:rows_pad], bm, th, tw, 32, 256, na, False),
            ranges, p2, big_rows, big_mask,
        )


if __name__ == "__main__":
    main()
