"""Device-mesh construction and sharded training steps.

The reference is strictly single-GPU (SURVEY.md §2.4) — multi-chip scaling is
a greenfield TPU-first subsystem here: data parallelism over cameras/rays with
replicated Gaussian parameters and gradient psum over ICI, plus tile-space
sharding of the rasterization grid for large frames.
"""

from seganygaussians_tpu.parallel.mesh import make_mesh  # noqa: F401
