"""impact_tpu — a TPU-native simulation-and-rendering framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the Impact game
engine (reference: lars-frogner/Impact): an entity-component world expressed as
a pytree of dense SoA arrays, SDF-defined deformable voxel objects meshed with
Surface Nets, rigid-body physics with impulse-based contact/constraint solving,
voxel absorption / split detection / Voronoi fracturing, and a physically based
deferred HDR render path — all jit-compiled XLA programs and Pallas kernels.

Layer map (mirrors SURVEY.md §1, redesigned TPU-first):
  utils/     — config, hashing, RNG seeds, profiling   (ref: impact_math hashes,
               impact_io RON config, impact_profiling)
  math/      — quaternions, transforms, projections    (ref: impact_math)
  geometry/  — bounds, primitives, frusta              (ref: impact_geometry)
  ecs/       — component schema + world-as-arrays      (ref: impact_ecs)
  physics/   — rigid bodies, forces, drivers, contacts, solver (ref: impact_physics)
  voxel/     — voxel objects, SDF generation, meshing, deformation (ref: impact_voxel)
  scene/     — scene graph, lights, camera, instances  (ref: impact_scene et al.)
  render/    — deferred PBR renderer + postprocessing  (ref: impact_rendering)
  ops/       — Pallas TPU kernels for the hot paths
  parallel/  — device-mesh sharding + halo exchange    (new; no reference analog)
  runtime/   — engine loop, commands, checkpointing    (ref: engine/src)
  models/    — built-in scenes / "model families"      (ref: apps/basic_app scenes)
"""

__version__ = "0.1.0"
