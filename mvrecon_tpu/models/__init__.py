"""Reconstruction pipelines: affine/perspective self-calibration, bundle
adjustment, and end-to-end drivers."""

from .affine import (  # noqa: F401
    affine_self_calibration,
    orthographic_self_calibration,
    symmetric_affine_self_calibration,
    paraperspective_self_calibration,
    observation_matrix,
)
from .covariance import (  # noqa: F401
    BACovariance,
    ba_covariance,
    ba_covariance_chunked,
    ba_covariance_streamed,
)
