"""Pallas TPU kernels for hot compute paths."""
from .pallas_ops import student_expectations, student_kxy, vandermonde

__all__ = ["student_expectations", "student_kxy", "vandermonde"]
