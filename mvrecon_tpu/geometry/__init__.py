"""Geometry primitives: pinhole cameras, projections, synthetic scenes."""

from .camera import (  # noqa: F401
    camera_matrix,
    look_at,
    project_points,
    project_points_orthographic,
    intrinsics,
)
from .scenes import (  # noqa: F401
    curved_tube_points,
    sample_hemisphere_points,
    make_synthetic_scene,
)
