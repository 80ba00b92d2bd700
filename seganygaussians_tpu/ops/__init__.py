"""Geometry core and rasterization ops (pure JAX + Pallas)."""

from seganygaussians_tpu.ops.camera import (  # noqa: F401
    CameraParams,
    fov2focal,
    focal2fov,
    get_projection_matrix,
    get_world2view,
    make_camera,
)
from seganygaussians_tpu.ops.sh import SH_C0, eval_sh, rgb2sh, sh2rgb  # noqa: F401
from seganygaussians_tpu.ops.transforms import (  # noqa: F401
    build_covariance_3d,
    build_rotation,
    build_scaling_rotation,
    inverse_sigmoid,
    strip_symmetric,
)
from seganygaussians_tpu.ops.rasterize import (  # noqa: F401
    RasterConfig,
    RasterOutput,
    rasterize,
)
