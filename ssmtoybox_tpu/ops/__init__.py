"""Pallas TPU kernels and double-double engines for hot compute paths."""
from .pallas_ops import student_expectations, student_kxy, vandermonde
from .ddfilter import scalar_filter_batch as dd_scalar_filter_batch
from .ddfilter import supports as dd_filter_supports
from .ddvec import dd_filter_batch, dd_filter_batch_jit, dd_supports, dd_check

__all__ = ["student_expectations", "student_kxy", "vandermonde",
           "dd_scalar_filter_batch", "dd_filter_supports",
           "dd_filter_batch", "dd_filter_batch_jit", "dd_supports", "dd_check"]
