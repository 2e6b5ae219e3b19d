"""ssmtoybox_tpu — a TPU-native nonlinear sigma-point Kalman filtering and
Bayesian-quadrature framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
SSMToybox (jacobnzw/SSMToybox): moment transforms (UT/SR/GH/FS + GPQ/BSQ/TPQ
/GPQ+D), a state-space model zoo, Gaussian/Studentian filters and smoothers,
and estimation metrics — built as pure functions + immutable pytrees so time
recursions run in ``lax.scan``, Monte-Carlo studies batch through ``vmap``,
and multi-chip scaling happens through ``jax.sharding`` over the MC axis.
"""

__version__ = "0.1.0"

from . import utils
from . import points
from . import mtran
from . import ssmod
from . import ssinf
from . import bq
from . import ops
from . import parallel
from . import online

from .utils import GaussRV, StudentRV, GaussianMixtureRV
from .mtran import (
    LinearizationTransform, MonteCarloTransform, SigmaPointTransform,
    SphericalRadialTransform, UnscentedTransform, GaussHermiteTransform,
    FullySymmetricStudentTransform, TaylorGPQDTransform,
)
from .sqrt import (SquareRootKalman, make_sqrt_filter, make_sqrt_smoother,
                   SqrtFilterResult, SquareRootStudent,
                   make_sqrt_studentian_filter, make_sqrt_studentian_smoother,
                   SqrtStudentFilterResult)
from .ssinf import (
    ExtendedKalman, CubatureKalman, UnscentedKalman, GaussHermiteKalman,
    GaussianProcessKalman, BayesSardKalman, StudentProcessKalman,
    FullySymmetricStudent, StudentProcessStudent, ExtendedStudent, GPQStudent,
    TruncatedUnscentedKalman, TruncatedCubatureKalman, TruncatedGaussHermiteKalman,
    MultiOutputGaussianProcessKalman, MultiOutputStudentProcessStudent,
    MarginalInference, MarginalizedGaussianProcessKalman, ExtendedKalmanGPQD,
    GaussianProcessDerKalman,
    IteratedPosteriorLinearizationKalman,
    gaussian_filter, gaussian_smoother, gaussian_filter_batch, studentian_filter,
    studentian_smoother,
    iterated_gaussian_filter, slr_affine,
)

__all__ = [
    "utils", "points", "mtran", "ssmod", "ssinf", "bq", "ops", "parallel", "online", "sqrt",
    "GaussRV", "StudentRV", "GaussianMixtureRV",
    "LinearizationTransform", "MonteCarloTransform", "SigmaPointTransform",
    "SphericalRadialTransform", "UnscentedTransform", "GaussHermiteTransform",
    "FullySymmetricStudentTransform", "TaylorGPQDTransform",
    "ExtendedKalman", "CubatureKalman", "UnscentedKalman", "GaussHermiteKalman",
    "GaussianProcessKalman", "BayesSardKalman", "StudentProcessKalman",
    "FullySymmetricStudent", "StudentProcessStudent", "ExtendedStudent", "GPQStudent",
    "TruncatedUnscentedKalman", "TruncatedCubatureKalman", "TruncatedGaussHermiteKalman",
    "MultiOutputGaussianProcessKalman", "MultiOutputStudentProcessStudent",
    "MarginalInference", "MarginalizedGaussianProcessKalman", "ExtendedKalmanGPQD",
    "GaussianProcessDerKalman",
    "gaussian_filter", "gaussian_smoother", "gaussian_filter_batch", "studentian_filter",
    "studentian_smoother",
    "IteratedPosteriorLinearizationKalman", "iterated_gaussian_filter", "slr_affine",
    "SquareRootKalman", "make_sqrt_filter", "make_sqrt_smoother", "SqrtFilterResult",
    "SquareRootStudent", "make_sqrt_studentian_filter",
    "make_sqrt_studentian_smoother", "SqrtStudentFilterResult",
]
