"""Gaussian scene / feature models as pytrees over fixed-capacity buffers."""

from seganygaussians_tpu.models.gaussians import (  # noqa: F401
    GaussianParams,
    GaussianState,
    create_from_points,
    densify_and_prune,
    get_covariance,
    get_opacity,
    get_rotation,
    get_scaling,
    reset_opacity,
)
from seganygaussians_tpu.models.optim import (  # noqa: F401
    AdamState,
    adam_init,
    adam_update,
    expon_lr,
)
