"""API-completeness guard: every public class/function of the reference
(SURVEY.md §2 inventory) has an equivalent in this framework.

The symbol list is a frozen snapshot of the reference's public API (every
top-level non-underscore class/function in ssmtoybox/{utils,mtran,ssmod,
ssinf}.py and ssmtoybox/bq/{bqkern,bqmod,bqmtran}.py) so the check runs
without the reference mounted.
"""
import pytest

import ssmtoybox_tpu as st
from ssmtoybox_tpu import mtran, ssmod, ssinf, utils
from ssmtoybox_tpu.bq import kernels, models, transforms
from ssmtoybox_tpu.utils import metrics, rand, rv, combin, ode, linalg

REFERENCE_API = {
    # ssmtoybox/bq/bqkern.py
    kernels: ["Kernel", "RBFGauss", "RBFStudent", "RQ"],
    # ssmtoybox/bq/bqmod.py
    models: ["Model", "GaussianProcessModel", "BayesSardModel",
             "StudentTProcessModel", "MultiOutputModel", "GaussianProcessMO",
             "StudentTProcessMO"],
    # ssmtoybox/bq/bqmtran.py
    transforms: ["BQTransform", "GaussianProcessTransform", "BayesSardTransform",
                 "StudentTProcessTransform", "MultiOutputGaussianProcessTransform",
                 "MultiOutputStudentTProcessTransform"],
    # ssmtoybox/mtran.py
    mtran: ["MomentTransform", "LinearizationTransform", "MonteCarloTransform",
            "SigmaPointTransform", "SphericalRadialTransform", "UnscentedTransform",
            "GaussHermiteTransform", "FullySymmetricStudentTransform",
            "TruncatedSigmaPointTransform", "TruncatedSphericalRadialTransform",
            "TruncatedUnscentedTransform", "TruncatedGaussHermiteTransform",
            "TaylorGPQDTransform"],
    # ssmtoybox/ssinf.py
    ssinf: ["StateSpaceInference", "GaussianInference", "ExtendedKalman",
            "CubatureKalman", "UnscentedKalman", "GaussHermiteKalman",
            "GaussianProcessKalman", "BayesSardKalman", "StudentProcessKalman",
            "StudentianInference", "FullySymmetricStudent", "StudentProcessStudent",
            "TruncatedUnscentedKalman", "TruncatedCubatureKalman",
            "TruncatedGaussHermiteKalman", "MultiOutputGaussianProcessKalman",
            "MultiOutputStudentProcessStudent", "MarginalInference",
            "MarginalizedGaussianProcessKalman", "ExtendedKalmanGPQD"],
    # ssmtoybox/ssmod.py
    ssmod: ["TransitionModel", "UNGMTransition", "UNGMNATransition",
            "Pendulum2DTransition", "ReentryVehicle1DTransition",
            "ReentryVehicle2DTransition", "CoordinatedTurnTransition",
            "ConstantTurnRateSpeed", "ConstantVelocity", "MeasurementModel",
            "UNGMMeasurement", "UNGMNAMeasurement", "Pendulum2DMeasurement",
            "RangeMeasurement", "BearingMeasurement", "Radar2DMeasurement"],
}

# ssmtoybox/utils.py — functions may live in any of the utils submodules
REFERENCE_UTILS = [
    "squared_error", "mse_matrix", "log_cred_ratio", "neg_log_likelihood",
    "kl_divergence", "symmetrized_kl_divergence", "bootstrap_var", "print_table",
    "gauss_mixture", "bigauss_mixture", "multivariate_t", "maha", "mat_sqrt",
    "ellipse_points", "n_sum_k", "vandermonde", "ode_euler", "ode_runge_kutta_4",
    "RandomVariable", "GaussRV", "StudentRV",
]

UTILS_MODULES = (utils, metrics, rand, rv, combin, ode, linalg)


@pytest.mark.parametrize("module,names", [(m, n) for m, n in REFERENCE_API.items()],
                         ids=lambda v: getattr(v, "__name__", "names").split(".")[-1])
def test_reference_classes_covered(module, names):
    missing = [n for n in names if not hasattr(module, n)]
    assert not missing, f"missing from {module.__name__}: {missing}"


def test_reference_utils_covered():
    missing = [n for n in REFERENCE_UTILS
               if not any(hasattr(m, n) for m in UTILS_MODULES)]
    assert not missing, f"missing utils equivalents: {missing}"


def test_top_level_filters_exported():
    for n in ["UnscentedKalman", "CubatureKalman", "GaussHermiteKalman",
              "ExtendedKalman", "GaussianProcessKalman", "BayesSardKalman",
              "StudentProcessKalman", "FullySymmetricStudent",
              "StudentProcessStudent", "SquareRootKalman"]:
        assert hasattr(st, n), n
