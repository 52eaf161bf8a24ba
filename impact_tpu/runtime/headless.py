"""Headless runtime: the game loop without a window.

Ref: engine/src/runtime/headless.rs:32-42 (headless run loop) and
engine/src/engine/game_loop.rs:17-72 (per-iteration flow: run frame tasks,
handle errors, frame-duration bookkeeping, metrics). The TPU frame is two
dispatches: the jitted engine step (physics+deformation) and the jitted
render; metrics come from host-side timers around them
(utils.timing.TaskTimer = the TaskTimer analog).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from ..render.pipeline import render_frame
from ..scene.assembly import build_render_scene
from ..scene.materials import VoxelTypeRegistry, default_registry
from ..utils.config import EngineConfig
from ..utils.timing import EngineMetrics, TaskTimer
from .engine import make_engine_step
from .setup import SceneBuildResult, render_config_from_engine_config


class HeadlessRuntime:
    """Owns the compiled scene and the jitted step/render closures."""

    def __init__(
        self,
        build: SceneBuildResult,
        config: EngineConfig,
        registry: VoxelTypeRegistry | None = None,
        enable_fracturing: bool = True,
        enable_absorption: bool = True,
        enable_splitting: bool = True,
    ):
        self.config = config
        self.registry = registry or default_registry()
        self.sim = build.sim
        self._initial_sim = build.sim  # for reset_world (ref: ResetWorld command)
        self.params = build.params
        if registry is not None:
            # custom registry: rebake the scene's material table + meshes
            # (compile_scene baked with the registry IT was given)
            from ..scene.materials import material_corner_table
            from ..voxel.mesh import bake_mesh_materials

            table = material_corner_table(registry)
            self.params = self.params._replace(material_table=table)
            self.sim = self.sim._replace(
                meshes=bake_mesh_materials(self.sim.meshes, table)
            )
            self._initial_sim = self.sim
        self.info = build.info
        self.metrics = EngineMetrics()
        self.timer = TaskTimer()
        self.paused = False
        self._features = dict(
            enable_absorption=enable_absorption,
            enable_splitting=enable_splitting,
            enable_fracturing=enable_fracturing,
        )
        self.command_queue = None  # created lazily by enqueue_command
        self.invalidate_step()
        self.invalidate_render()

    # --- (re)build jit closures (ref: runtime mutation via admin commands) ---
    def invalidate_step(self):
        step_fn = make_engine_step(
            self.params, self.config,
            self.info["mesh_vert_cap"], self.info["mesh_tri_cap"],
            **self._features,
        )
        self._step = jax.jit(step_fn)  # step(sim, params)

        # K steps per dispatch: the per-program floor (~3 ms dispatch + ~30 ms
        # for a full-SimState program through the tunnel) dominates small
        # scenes, so the headless loop batches steps with lax.scan when no
        # render interleaves (ref: the reference amortizes per-frame overhead
        # across its 38-task DAG; here the analog is amortizing XLA dispatch)
        self._step_batch_size = k = int(
            getattr(self.config.tpu, "steps_per_dispatch", 8)
        )

        def step_k(sim, params):
            def body(s, _):
                return step_fn(s, params), None

            s, _ = jax.lax.scan(body, sim, None, length=k)
            return s

        self._step_k = jax.jit(step_k)

    def invalidate_render(self):
        self.render_config = render_config_from_engine_config(self.config)
        params = self.params
        registry_ = self.registry
        rc = self.render_config
        # textured mesh entities force the textured shade path even when
        # voxel-type texturing is off (their layers ride the same arrays)
        entity_layers = self.info.get("entity_texture_layers", [])
        voxel_textured = rc.textured
        if entity_layers and not rc.textured:
            rc = self.render_config = rc._replace(textured=True)
        if entity_layers:
            # entity-local layer indices → scene texture-array indices
            # (voxel-type layers occupy the leading slots when present)
            offset = registry_.n_types if voxel_textured else 0
            mat = params.mesh_instances.material
            params = params._replace(
                mesh_instances=params.mesh_instances._replace(
                    material=jnp.where(mat >= 0, mat + offset, -1)
                )
            )
        from ..render.pipeline import (
            compact_scene_triangles,
            deferred_shade,
            geometry_pass,
            postprocess,
            shadow_pass,
        )

        # Four separately-jitted passes (the reference records them as separate
        # wgpu passes too, render_command.rs:222-432). Stage boundaries are the
        # materialized attachments, so splitting costs no fusion; each stage
        # compiles and caches independently (whole-frame programs make XLA's
        # optimization passes balloon).
        tris_per_object = self.config.tpu.render_tris_per_object

        def scene_of(sim):
            scene = build_render_scene(
                sim.voxels, sim.meshes,
                sim.phys.bodies.position, sim.phys.bodies.orientation,
                sim.prev_position, sim.prev_orientation,
                params.static_geometry,
                params.mesh_instances,
                tris_per_object=tris_per_object,
                voxel_texture_layers=voxel_textured,
            )
            return compact_scene_triangles(scene, rc.max_triangles)

        self._scene_of = jax.jit(scene_of)
        # stage jits return the raster drop counts too (profiling callers
        # index [0]; the fused frame accumulates them into RenderState)
        self._geometry = jax.jit(
            lambda scene, frame_index: geometry_pass(
                scene, params.camera, params.camera, frame_index, rc
            )
        )
        self._shadows = jax.jit(
            lambda scene: shadow_pass(scene, params.lights, params.camera, rc)
        )
        if rc.textured:
            from ..render.textures import build_scene_texture_set

            self._textures = build_scene_texture_set(
                registry_.n_types, entity_layers,
                self.config.tpu.texture_resolution,
                include_voxel_layers=voxel_textured,
            )
        else:
            self._textures = None
        self._shade = jax.jit(
            lambda gb, omni, uni, tex: deferred_shade(
                gb, params.lights, params.camera, omni, uni, rc, tex
            )
        )
        self._post = jax.jit(
            lambda lum, motion, rstate: postprocess(lum, motion, rstate, rc)
        )

        from ..render.camera import projection_matrix, view_matrix
        from ..render.gizmos import build_gizmo_lines, overlay_lines

        def gizmo_overlay(img, sim, kinds):
            lines = build_gizmo_lines(
                sim, params, kinds, aspect=rc.width / rc.height,
                n_cascades=self.config.tpu.csm_cascades)
            vp = projection_matrix(
                params.camera, rc.width, rc.height, None
            ) @ view_matrix(params.camera)
            return overlay_lines(img, lines, vp)

        self._gizmo_overlay = jax.jit(gizmo_overlay, static_argnames=("kinds",))
        self.visible_gizmos: tuple = ()  # e.g. ("reference_frame_axes",)

        # fused halves: geometry side (scene+G-buffer+shadow maps) and shading
        # side (shade+post) — each jit dispatch through the axon tunnel costs
        # ~3 ms of host latency, so 6 stage dispatches/frame were ~20 ms of
        # pure overhead. The per-stage jits above stay for profiling
        # (devtools/profile_stages.py) and the stage-timing entries in bench.
        def render_a(sim):
            scene = scene_of(sim)
            gb, geo_drops = geometry_pass(
                scene, params.camera, params.camera, sim.render.frame_index, rc
            )
            omni, uni, shadow_drops = shadow_pass(
                scene, params.lights, params.camera, rc
            )
            return gb, omni, uni, geo_drops + shadow_drops

        def render_b(gb, omni, uni, tex, rstate):
            lum = deferred_shade(
                gb, params.lights, params.camera, omni, uni, rc, tex
            )
            return postprocess(lum, gb.motion, rstate, rc)

        self._render_a = jax.jit(render_a)
        self._render_b = jax.jit(render_b)

        def render(sim):
            gb, omni, uni, drops = self._render_a(sim)
            rstate_in = sim.render._replace(
                n_raster_drops=sim.render.n_raster_drops + drops
            )
            img, hdr, rstate = self._render_b(
                gb, omni, uni, self._textures, rstate_in
            )
            if self.visible_gizmos:
                img = self._gizmo_overlay(img, sim, tuple(self.visible_gizmos))
            return img, sim._replace(render=rstate)

        self._render = render

        # ONE-dispatch frame: engine step + full render in a single program.
        # The tunnel's per-dispatch floor is ~3 ms for small args and ~30 ms
        # for a full-SimState program, so the 1-step+2-render dispatch chain
        # costs ~60-90 ms of pure host overhead per frame; the fused frame
        # pays it once. (Compile is the sum of the parts.)
        step_for_frame = make_engine_step(
            self.params, self.config,
            self.info["mesh_vert_cap"], self.info["mesh_tri_cap"],
            **self._features,
        )

        def frame_fn(sim, textures):
            sim = step_for_frame(sim, self.params)
            gb, omni, uni, drops = render_a(sim)
            rstate_in = sim.render._replace(
                n_raster_drops=sim.render.n_raster_drops + drops
            )
            img, hdr, rstate = render_b(gb, omni, uni, textures, rstate_in)
            return img, sim._replace(render=rstate)

        self._frame = jax.jit(frame_fn)

    def step_and_render(self):
        """Advance one step and render, as ONE device dispatch.

        Returns the u8 image [H,W,3]; the headline bench loop uses this."""
        self.apply_commands()
        with self.timer.time("frame"):
            img, self.sim = self._frame(self.sim, self._textures)
            if self.visible_gizmos:
                img = self._gizmo_overlay(
                    img, self.sim, tuple(self.visible_gizmos)
                )
        return img

    # --- commands / checkpoint / reset ---------------------------------------
    def enqueue_command(self, category: str, action: str, value=None):
        from .command import Command, CommandQueue

        if self.command_queue is None:
            self.command_queue = CommandQueue()
        self.command_queue.enqueue(Command(category, action, value))

    def apply_commands(self):
        """Drain queued commands (runs automatically at each step batch)."""
        if self.command_queue is not None:
            from .command import execute_commands

            execute_commands(self, self.command_queue)

    def reset_world(self):
        """Restore the initial scene state (ref: SystemAdminCommand::ResetWorld,
        engine/src/command.rs:52-55)."""
        self.sim = self._initial_sim

    def save_checkpoint(self, path, metadata=None):
        from .checkpoint import save_checkpoint

        return save_checkpoint(path, self.sim, metadata)

    def load_checkpoint(self, path):
        from .checkpoint import load_checkpoint

        self.sim, meta = load_checkpoint(path, self.sim)
        return meta

    def profile(self, log_dir: str):
        """XProf/Perfetto device trace of everything run inside the context
        (the Tracy-slot analog, SURVEY §5 tracing; open the trace with
        TensorBoard's profile plugin or ui.perfetto.dev):

            with rt.profile("/tmp/trace"):
                rt.step(10); rt.render()
        """
        import jax.profiler

        return jax.profiler.trace(log_dir)

    def step(self, n: int = 1):
        """Advance the simulation ``n`` frames (no rendering)."""
        self.apply_commands()
        if self.paused:
            return self.sim
        with self.timer.time("step", block_on=None):
            k = self._step_batch_size
            while n >= k > 1:
                self.sim = self._step_k(self.sim, self.params)
                n -= k
            for _ in range(n):
                self.sim = self._step(self.sim, self.params)
            jax.block_until_ready(self.sim)
        return self.sim

    def dropped_mesh_elements(self):
        """(dropped_verts, dropped_tris) summed over objects — active mesh
        elements that overflowed the fixed compaction caps or the
        render_tris_per_object slice ("no silent caps": callers log/assert
        this; nonzero means the caps are undersized for the scene)."""
        import numpy as np

        from ..voxel.chunk_mesh import ChunkMeshPool

        meshes = self.sim.meshes
        dropped_tris = int(np.asarray(jnp.sum(meshes.n_dropped_tris)))
        if isinstance(meshes, ChunkMeshPool):
            # chunk slots are surface-exact; blocked chunks are whole
            # submeshes that could not allocate (pool exhausted)
            dropped_tris += self.config.tpu.chunk_tri_cap * int(
                np.asarray(meshes.n_dropped_chunks)
            )
        else:
            k = self.config.tpu.render_tris_per_object
            if k > 0:
                per_obj = jnp.sum(meshes.tri_active, axis=-1)
                dropped_tris += int(
                    np.asarray(jnp.sum(jnp.maximum(per_obj - k, 0)))
                )
        return (
            int(np.asarray(jnp.sum(meshes.n_dropped_verts))),
            dropped_tris,
        )

    def deferred_absorptions(self) -> int:
        """Absorber-overlapping voxel objects beyond the absorption gate cap
        at the current state — work the next engine step defers by one step.
        The absorption analog of the mesh/raster drop counters: deferral is
        lag, not loss, but it must be auditable (no silent caps).

        The count is an ESTIMATE evaluated at the current body positions;
        the engine's absorption gate runs after the next physics step moves
        bodies, so the exact next-step deferral can differ by whatever that
        step's motion changes. Returns 0 when the runtime was built with
        ``enable_absorption=False`` — a disabled pass never processes the
        overlaps, so "deferred by one step" would misstate it."""
        import numpy as np

        from ..voxel.interaction import deferred_absorption_count

        if not self._features.get("enable_absorption", True):
            return 0
        if self.config.tpu.chunked_remesh:
            # chunked mode defers CHUNK carves beyond the pair budget, not
            # whole objects
            from ..voxel.interaction import _chunk_absorber_hit

            hit = _chunk_absorber_hit(
                self.sim.voxels, self.params.absorbers,
                self.sim.phys.bodies.position,
                self.sim.phys.bodies.orientation,
            )
            return max(
                int(np.asarray(jnp.sum(hit)))
                - self.config.tpu.absorption_chunk_budget,
                0,
            )
        cap = min(
            self.config.tpu.absorption_gate_cap,
            self.config.tpu.max_voxel_objects,
        )
        return int(np.asarray(deferred_absorption_count(
            self.sim.voxels, self.params.absorbers,
            self.sim.phys.bodies.position,
            self.sim.phys.bodies.orientation, cap,
        )))

    def broad_phase_overflow(self) -> int:
        """Shifted-grid broad-phase cell-run overflow at the current state —
        nonzero means some cell held more than ``window`` objects and
        candidate pairs MAY have been missed (raise the window or max_pairs).
        Always 0 for pools below GRID_BROAD_PHASE_MIN_OBJECTS (dense
        all-pairs broad phase — exact by construction)."""
        import numpy as np

        from ..voxel.collision import (
            GRID_BROAD_PHASE_MIN_OBJECTS,
            bounding_radii,
            broad_phase_pairs,
        )

        pool = self.sim.voxels
        if pool.n_objects < GRID_BROAD_PHASE_MIN_OBJECTS:
            return 0
        *_, overflow = broad_phase_pairs(
            self.sim.phys.bodies.position[pool.body_index],
            bounding_radii(pool), pool.alive,
            max_pairs=1, margin=pool.voxel_extent,
        )
        return int(np.asarray(overflow))

    def dropped_raster_candidates(self) -> int:
        """Cumulative raster candidates lost to per-tile k_per_range or
        big-block overflow across every rendered view so far (the raster-side
        "no silent caps" counter). Overflow evicts a range's FARTHEST
        candidates by quantized z, so the count is an UPPER BOUND on risk:
        a drop only affects a pixel if the evicted candidate's true depth
        beats the kept winner within the z-quantization step. Shadow-pass
        drops in particular cannot change the depth-min map beyond that
        epsilon; geometry-pass drops are the ones worth driving to zero
        (enlarge k_per_range/big_budget). bench.py reports the split."""
        import numpy as np

        return int(np.asarray(self.sim.render.n_raster_drops))

    def render(self):
        """Render the current state → u8 image [H,W,3]."""
        with self.timer.time("render"):
            img, self.sim = self._render(self.sim)
            img = jax.block_until_ready(img)
        return img

    def run(self, n_frames: int, render_every: int = 0, screenshot_path=None):
        """Game loop: step each frame; optionally render every k-th frame
        (ref: game_loop max_iterations semantics)."""
        images = []
        for i in range(n_frames):
            t0 = time.perf_counter()
            self.step()
            if render_every and (i % render_every == 0):
                img = self.render()
                images.append(img)
                if screenshot_path:
                    from ..utils.image import save_png

                    save_png(f"{screenshot_path}/frame_{i:05d}.png", img)
            self.metrics.record_frame(time.perf_counter() - t0)
        self.metrics.last_task_execution_times = self.timer.drain()
        return images
