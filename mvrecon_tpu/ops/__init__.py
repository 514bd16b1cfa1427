"""Core numerical ops: rotation maps, small-matrix linear algebra,
fourth-moment quadratic forms, SVD factorization, Schur accumulation."""

from .rotations import rodrigues, rodrigues_batched, unit_vec  # noqa: F401
from .factorization import factorization_method  # noqa: F401
from .linalg import (  # noqa: F401
    inv3x3,
    solve3x3,
    min_eigvec_sym,
    max_eigvec_sym,
    orthonormalize,
)
from .moments import fourth_moment_matrix, sym_pack, sym_unpack  # noqa: F401
from .triangulation import triangulate, triangulate_sparse  # noqa: F401
from .procrustes import aligned_rmse, apply_similarity, umeyama  # noqa: F401
