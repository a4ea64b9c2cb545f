"""hidegs_tpu — TPU-native hierarchical 3D Gaussian splatting.

A from-scratch JAX/XLA/Pallas framework with the capabilities of HiDeGS
(high-frequency detail-enhanced hierarchical 3DGS for UAV multi-view
reconstruction). See SURVEY.md for the structural analysis of the reference
that drives this design.

Top-level layout:
  core/     pure-JAX geometry & math (cameras, quaternions, SH, EWA projection)
  raster/   differentiable tile rasterizer (binning + blend; Pallas hot path)
  model/    Gaussian parameter pytree, masked sparse Adam, densification
  train/    losses, regularizers, training loop, checkpointing
  data/     COLMAP loaders, cameras, scenes, synthetic test scenes
  hier/     LOD hierarchy (io, cut selection, interpolation, offline builder)
  parallel/ device mesh + sharded training step
  utils/    ply IO, metrics, misc
"""

__version__ = "0.1.0"
