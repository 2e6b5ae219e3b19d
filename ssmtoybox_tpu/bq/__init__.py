"""Bayesian-quadrature layer: kernels, integrand models, moment transforms.

TPU-native counterpart of ``ssmtoybox/bq/``.
"""
from .kernels import Kernel, RBFGauss, RBFStudent, RQ, get_kernel
from .models import (
    Model,
    GaussianProcessModel,
    BayesSardModel,
    StudentTProcessModel,
    MultiOutputModel,
    GaussianProcessMO,
    StudentTProcessMO,
)
from .transforms import (
    BQTransform,
    GaussianProcessTransform,
    BayesSardTransform,
    StudentTProcessTransform,
    MultiOutputGaussianProcessTransform,
    MultiOutputStudentTProcessTransform,
)

__all__ = [
    "Kernel", "RBFGauss", "RBFStudent", "RQ", "get_kernel",
    "Model", "GaussianProcessModel", "BayesSardModel", "StudentTProcessModel",
    "MultiOutputModel", "GaussianProcessMO", "StudentTProcessMO",
    "BQTransform", "GaussianProcessTransform", "BayesSardTransform",
    "StudentTProcessTransform", "MultiOutputGaussianProcessTransform",
    "MultiOutputStudentTProcessTransform",
]
