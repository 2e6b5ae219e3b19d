"""Pallas TPU kernels for hot compute paths."""
from .pallas_ops import student_expectations, vandermonde

__all__ = ["student_expectations", "vandermonde"]
