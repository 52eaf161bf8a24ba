"""Engine configuration tree.

Mirrors the reference's serde-default RON ``EngineConfig``
(ref: engine/src/engine.rs:86-99 — sub-configs for game_loop, input, resources,
voxel, physics, rendering, controller, gizmo, instrumentation, screen_capture)
so the reference's config files (e.g. apps/basic_app/config/
engine_config_no_assets.ron) load unchanged. Every field carries the
reference's default value; unknown RON keys are ignored (serde-default
semantics). TPU-specific additions live in :class:`TpuConfig`.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional

from . import ron


# --- rendering --------------------------------------------------------------


@dataclass
class BasicRenderingConfig:
    enabled: bool = True
    wireframe_mode_on: bool = False
    timings_enabled: bool = False


@dataclass
class ShadowMappingConfig:
    enabled: bool = True
    omnidirectional_light_shadow_map_resolution: int = 1024
    unidirectional_light_shadow_map_resolution: int = 1024


@dataclass
class AmbientOcclusionConfig:
    enabled: bool = True
    sample_count: int = 4
    sample_radius: float = 1.0
    intensity: float = 2.0
    contrast: float = 0.75


@dataclass
class TemporalAntiAliasingConfig:
    enabled: bool = True
    current_frame_weight: float = 0.1
    variance_clipping_threshold: float = 1.0


@dataclass
class ExposureBounds:
    lower: float = 1e-6
    upper: float = 1e-2


@dataclass
class CameraSettings:
    relative_aperture: float = 4.0
    shutter_duration: float = 0.005
    # "Auto(ev_compensation)" or "Manual(iso)"; None payload → auto at 0 EV.
    sensitivity: Any = None
    exposure_bounds: ExposureBounds = field(default_factory=ExposureBounds)


@dataclass
class LuminanceBounds:
    lower: float = 100.0
    upper: float = 1e7


@dataclass
class AverageLuminanceConfig:
    luminance_bounds: LuminanceBounds = field(default_factory=LuminanceBounds)
    current_frame_weight: float = 0.02
    fetch_histogram: bool = False


@dataclass
class BloomConfig:
    enabled: bool = True
    n_downsamplings: int = 4
    blur_filter_radius: float = 0.005
    blurred_luminance_weight: float = 0.04


@dataclass
class DynamicRangeCompressionConfig:
    tone_mapping_method: str = "ACES"  # None | ACES | KhronosPBRNeutral


@dataclass
class CapturingCameraConfig:
    settings: CameraSettings = field(default_factory=CameraSettings)
    average_luminance_computation: AverageLuminanceConfig = field(
        default_factory=AverageLuminanceConfig
    )
    bloom: BloomConfig = field(default_factory=BloomConfig)
    dynamic_range_compression: DynamicRangeCompressionConfig = field(
        default_factory=DynamicRangeCompressionConfig
    )


@dataclass
class RenderingConfig:
    basic: BasicRenderingConfig = field(default_factory=BasicRenderingConfig)
    shadow_mapping: ShadowMappingConfig = field(default_factory=ShadowMappingConfig)
    ambient_occlusion: AmbientOcclusionConfig = field(
        default_factory=AmbientOcclusionConfig
    )
    temporal_anti_aliasing: TemporalAntiAliasingConfig = field(
        default_factory=TemporalAntiAliasingConfig
    )
    capturing_camera: CapturingCameraConfig = field(
        default_factory=CapturingCameraConfig
    )


# --- physics -----------------------------------------------------------------


@dataclass
class SimulatorConfig:
    """Ref: engine/src/physics.rs:346-355 defaults."""

    enabled: bool = True
    n_substeps: int = 1
    initial_time_step_duration: float = 0.01667
    match_frame_duration: bool = False
    max_auto_time_step_duration: Optional[float] = None
    simulation_speed_multiplier_increment_factor: float = 1.1


@dataclass
class ConstraintSolverConfig:
    """Ref: impact_physics/src/constraint/solver.rs:41-57 defaults."""

    enabled: bool = True
    n_iterations: int = 8
    old_impulse_weight: float = 0.4
    n_positional_correction_iterations: int = 3
    positional_correction_factor: float = 0.2


@dataclass
class MediumConfig:
    mass_density: float = 0.0
    velocity: tuple = (0.0, 0.0, 0.0)


@dataclass
class DragLoadMapConfig:
    n_direction_samples: int = 5000
    n_theta_coords: int = 64
    smoothness: float = 2.0
    save_generated_maps: bool = True
    overwrite_existing_map_files: bool = False
    use_saved_maps: bool = True
    directory: str = "resources/drag_load_maps"


@dataclass
class RigidBodyForceConfig:
    drag_load_map_config: DragLoadMapConfig = field(default_factory=DragLoadMapConfig)


@dataclass
class PhysicsConfig:
    simulator: SimulatorConfig = field(default_factory=SimulatorConfig)
    rigid_body_force: RigidBodyForceConfig = field(
        default_factory=RigidBodyForceConfig
    )
    constraint_solver: ConstraintSolverConfig = field(
        default_factory=ConstraintSolverConfig
    )
    medium: MediumConfig = field(default_factory=MediumConfig)


# --- voxels --------------------------------------------------------------


@dataclass
class VoxelTypesConfig:
    texture_resolution: int = 256
    voxel_types_path: Optional[str] = None


@dataclass
class FracturingImpactConfig:
    """Ref: engine_config_no_assets.ron voxel.interaction.fracturing.impact."""

    boundary_polar_grid_size: int = 3
    boundary_azimuthal_grid_size: int = 6
    boundary_angular_jitter: float = 0.8
    boundary_radial_jitter: float = 0.2
    max_fragment_count: int = 512
    radial_falloff_power: float = 2.0
    angular_falloff_power: float = 0.5
    radial_grid_size: int = 128
    angular_grid_size: int = 128
    max_position_rejections_per_sample: int = 128
    seed: int = 0


@dataclass
class FracturingConfig:
    impact: FracturingImpactConfig = field(default_factory=FracturingImpactConfig)
    min_relative_fragment_mass: float = 1e-3


@dataclass
class VoxelInteractionConfig:
    fracturing: FracturingConfig = field(default_factory=FracturingConfig)


@dataclass
class VoxelConfig:
    types: VoxelTypesConfig = field(default_factory=VoxelTypesConfig)
    interaction: VoxelInteractionConfig = field(
        default_factory=VoxelInteractionConfig
    )


# --- misc subsystems ----------------------------------------------------------


@dataclass
class GameLoopConfig:
    max_fps: Optional[float] = None
    max_iterations: Optional[int] = None


@dataclass
class InputConfig:
    mouse_sensitivity: float = 1.0


@dataclass
class ResourcesConfig:
    resource_file_path: Optional[str] = None
    lookup_table_dir: Optional[str] = None


@dataclass
class ControllerConfig:
    motion: Any = None  # Variant SemiDirectional((movement_speed, vertical_control))
    orientation: Any = None  # Variant RollFreeCamera(())


@dataclass
class ScreenCaptureConfig:
    output_dir: Optional[str] = None
    tagging: Any = "Timestamp"


@dataclass
class UserInterfaceConfig:
    initially_interactive: bool = True


# --- TPU-specific capacities (no reference analog: static-shape pools) --------


@dataclass
class TpuConfig:
    """Static capacities for the device-resident state pools.

    XLA requires static shapes; every dynamic collection in the reference
    (entities, bodies, contacts, voxel objects) becomes a fixed-capacity
    masked pool here (SURVEY.md §7.0, §7.3.2).
    """

    max_entities: int = 1024
    max_bodies: int = 1024
    max_contacts: int = 4096
    max_voxel_objects: int = 64
    voxel_grid_size: int = 32  # per-object dense grid resolution (multiple of 16)
    max_lights: int = 8
    render_width: int = 256
    render_height: int = 192
    solver_mode: str = "scan"  # "scan" (Gauss-Seidel parity) | "jacobi" (scale)
    csm_cascades: int = 1  # directional shadow cascades (reference max: 4)
    max_render_triangles: int = 65536  # raster budget after slot compaction
    # per-object compacted-mesh capacities; 0 = auto (min(4096,(g-1)³) verts /
    # min(8192,6(g-1)³) tris). Overflow is COUNTED (CompactMesh.n_dropped_*)
    # and surfaced by bench/HeadlessRuntime.dropped_mesh_elements — raise
    # these when a scene's surfaces exceed the auto caps.
    mesh_vert_cap: int = 0
    mesh_tri_cap: int = 0
    # render-exact hierarchical quad merging at remesh time (level ℓ merges
    # 2^ℓ-cell flat uniform blocks; 0 = off). Cuts active triangle counts
    # ~3× on boxy voxel content with pixel-identical output.
    mesh_merge_levels: int = 2
    # per-object triangle slots entering the render scene (0 = all
    # mesh_tri_cap slots). compact_mesh packs actives to the front, so a
    # slice is a free compaction; overflow is counted by
    # HeadlessRuntime.dropped_mesh_elements.
    render_tris_per_object: int = 0
    textured_voxels: bool = False  # triplanar voxel-type texture arrays
    texture_resolution: int = 64  # procedural texture-array base size
    # absorption runs dense only on the ≤cap objects whose bounding spheres
    # overlap an absorber (gathered sub-pool) — O(K·G³), not O(O·G³)
    absorption_gate_cap: int = 8
    # chunked mode: absorber carve visits only the ≤budget (object, chunk)
    # 16³ windows overlapping an absorber — O(B·16³·A), independent of grid
    # volume (ref: absorption.rs:434). Overflow defers to later steps and is
    # counted (HeadlessRuntime.deferred_absorptions).
    absorption_chunk_budget: int = 32
    # seeds/event — effective count is min(this, the RON impact config's
    # max_fragment_count (ref default 512), max_voxel_objects), so small
    # pools stay small; memory-bounded at 128 vs the reference's 512
    # (fracturing.rs:61-70, engine_config_no_assets.ron)
    max_fracture_fragments: int = 128
    max_fracture_events: int = 2  # concurrent fracture events per step
    # chunk-gated meshing (ref: mesh.rs:360 incremental invalidated-chunk
    # remeshing): surface meshes live in a shared pool of chunk-submesh
    # slots; per-step remesh cost is O(chunk_remesh_budget · 18³), tracking
    # surface-chunk counts instead of O·G³. None = AUTO: on for G ≥ 64
    # (resolved by compile_scene), where whole-grid remeshing stops being
    # affordable — chunking is the engine's spine there (absorption carve,
    # mesh invalidation, and CCL all go chunk-granular). At G = 32 the
    # dense path stays default: a full remesh is 8 chunk windows' work and
    # per-object triangle slabs beat the slot pool's render indirection.
    chunked_remesh: bool | None = None
    chunk_submesh_slots: int = 0  # 0 = auto (min(O·C, 1024))
    chunk_tri_cap: int = 1024  # triangle slots per chunk submesh
    chunk_vert_cap: int = 1024  # vertex budget per chunk compaction
    chunk_remesh_budget: int = 16  # dirty chunks re-meshed per step
    # split-detection throughput: pending objects checked per step, and
    # disconnected regions extracted per object per check (ref:
    # extraction.rs:78 extracts regions as found — a multi-way shatter
    # settles in ~1 step instead of one region per step)
    max_split_objects: int = 4
    max_split_regions: int = 3
    soft_shadows: bool = False  # PCSS-style soft shadows from light extents
    procedural_sky: bool = False  # gradient+sun skybox (ref: skybox.rs slot)
    sdf_encoding: str = "f32"  # "f32" | "i8" (ref: VoxelSignedDistance, lib.rs:60-73)
    orthographic_camera: bool = False  # set by compile_scene on OrthographicCamera
    bf16_shading: bool = False  # BRDF math in bfloat16
    sky_luminance: tuple = (3000.0, 4500.0, 9000.0)  # constant-sky fallback
    steps_per_dispatch: int = 8  # lax.scan step batching in the headless loop
    raster_backend: str = "auto"  # "auto" | "pallas" | "xla" triangle raster
    # per-view culling: camera-frustum triangle masking + omni shadow range
    # masking (ref: impact_scene/src/lib.rs:160 frustum-culled instances)
    view_culling: bool = True
    # renderable mesh-model entities (ref: impact_mesh setup + impact_material
    # setup/physical.rs — per-entity material components on mesh models)
    max_mesh_entities: int = 16
    max_mesh_entity_verts: int = 1024  # vertex capacity per mesh entity
    max_mesh_entity_tris: int = 2048


@dataclass
class EngineConfig:
    resources: ResourcesConfig = field(default_factory=ResourcesConfig)
    rendering: RenderingConfig = field(default_factory=RenderingConfig)
    physics: PhysicsConfig = field(default_factory=PhysicsConfig)
    voxel: VoxelConfig = field(default_factory=VoxelConfig)
    controller: ControllerConfig = field(default_factory=ControllerConfig)
    game_loop: GameLoopConfig = field(default_factory=GameLoopConfig)
    input: InputConfig = field(default_factory=InputConfig)
    screen_capture: ScreenCaptureConfig = field(default_factory=ScreenCaptureConfig)
    user_interface: UserInterfaceConfig = field(
        default_factory=UserInterfaceConfig
    )
    tpu: TpuConfig = field(default_factory=TpuConfig)

    @staticmethod
    def from_ron_file(path) -> "EngineConfig":
        return EngineConfig.from_obj(ron.load(path))

    @staticmethod
    def from_ron_str(text: str) -> "EngineConfig":
        return EngineConfig.from_obj(ron.loads(text))

    @staticmethod
    def from_obj(obj: Any) -> "EngineConfig":
        return _build(EngineConfig, obj)


def _build(cls, obj):
    """Recursively construct dataclass ``cls`` from parsed RON, serde-default
    style: missing keys take defaults, unknown keys are ignored."""
    if obj is None:
        return cls()
    if isinstance(obj, ron.Variant):
        if obj.fields is not None:
            obj = obj.fields
        elif len(obj.args) == 1:
            return obj  # keep variant wrapper for Any-typed fields
        else:
            return obj
    if not isinstance(obj, dict):
        return obj
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in obj:
            continue
        v = obj[f.name]
        ftype = f.type if isinstance(f.type, type) else None
        if ftype is None and isinstance(f.type, str):
            ftype = globals().get(f.type)
        if (
            ftype is not None
            and dataclasses.is_dataclass(ftype)
            and isinstance(v, (dict, ron.Variant))
        ):
            kwargs[f.name] = _build(ftype, v)
        else:
            kwargs[f.name] = v
    return cls(**kwargs)
