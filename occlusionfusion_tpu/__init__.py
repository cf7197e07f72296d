"""occlusionfusion_tpu — TPU-native non-rigid RGB-D fusion engine.

A from-scratch JAX/XLA/Pallas implementation of the full OcclusionFusion
pipeline (reference: remmel/OcclusionFusion): occlusion-aware motion
completion over an embedded deformation graph, Lepard-style point-cloud
matching for scene flow, Gauss-Newton / SO(3)-tangent warp-field solvers
with ARAP/landmark/depth/motion terms, and TSDF integration + meshing
through the warp field — designed TPU-first (static shapes, Pallas kernels
for the hot per-voxel/per-point ops, jax.sharding for multi-chip scale).
"""

__version__ = "0.1.0"
