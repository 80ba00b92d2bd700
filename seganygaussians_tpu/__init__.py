"""seganygaussians_tpu — TPU-native Segment-Any-3D-Gaussians framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Jumpat/SegAnyGAussians (SAGA): differentiable 3D Gaussian Splatting with a
tile-based rasterizer kernel family (RGB / depth+mask / N-dim affinity
features), 3DGS scene training with adaptive densification, SAM-mask
contrastive affinity-feature distillation, and interactive / open-vocabulary
3D segmentation — all built TPU-first (static shapes, MXU-friendly blending,
pjit/shard_map multi-chip scaling).

Package layout:
  ops/       geometry core + rasterizer (pure-XLA reference + Pallas kernels)
  models/    Gaussian scene / feature models as pytrees with densification
  data/      COLMAP & Blender readers, PLY I/O, SAM/CLIP sidecars
  train/     scene + contrastive training loops
  parallel/  mesh construction and sharding policies
  seg/       scale gate, similarity queries, clustering, CLIP text queries
  viewer/    network viewer protocol
  cli/       command-line entry points mirroring the reference scripts
"""

__version__ = "0.1.0"
