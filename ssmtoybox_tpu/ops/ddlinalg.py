"""Small-matrix double-double linear algebra for the vector dd filter engine.

The f64 path already unrolls the filters' small-matrix recurrences into
elementwise ops (``utils/linalg.py``: ``chol_small``, ``tri_solve_small``,
``small_matmul``) because XLA's generic factorizations are emulated-f64
disasters on TPU.  This module lifts THOSE EXACT recurrences onto
double-double (hi, lo) f32 pairs (:mod:`ssmtoybox_tpu.ops.ddmath`), so a
D<=8 filter step can run with zero f64 ops in the program — the technique
that halved the scalar UNGM lanes in r4, extended to vector states
(VERDICT r4 next-round #1).

Representation: a dd *vector* is a Python list of dd scalars; a dd *matrix*
is a list of rows (lists) of dd scalars.  Each dd scalar is an ``(hi, lo)``
tuple of equal-shape f32 arrays — typically batched over trajectories — so
every recurrence below unrolls at trace time into a pure elementwise f32
graph over the batch, exactly like the f64 path's unrolled kernels, and
works unchanged inside Pallas kernel bodies.

Reference anchors (same math, different precision class):
``utils/linalg.py:182-212`` (Cholesky-Banachiewicz), ``:263-295``
(triangular substitution), and the reference's ``cho_factor``/``cho_solve``
usage at ``ssmtoybox/ssinf.py:321,342``.
"""
from __future__ import annotations

from . import ddmath as dd

__all__ = [
    "zeros", "wsum", "chol", "tri_solve_lower", "tri_solve_upper_t",
    "cho_solve_vec", "matvec", "mat_add", "mat_sub",
]


def zeros(like):
    """A dd zero with the same (traced) shape as dd scalar ``like``."""
    return dd.zeros_like(like)


def wsum(values, weights):
    """``sum_i weights[i] * values[i]`` in dd (weights are dd constants)."""
    acc = dd.mul(weights[0], values[0])
    for v, w in zip(values[1:], weights[1:]):
        acc = dd.add(acc, dd.mul(w, v))
    return acc


def chol(A):
    """Lower Cholesky factor of a symmetric dd matrix (list-of-lists).

    The Cholesky-Banachiewicz recurrence of ``utils/linalg.py:182-212``,
    D(D+1)/2 entries unrolled at trace time; entries above the diagonal of
    the result are ``None`` (callers index ``L[i][j]`` with ``j <= i``).
    """
    d = len(A)
    L = [[None] * d for _ in range(d)]
    for i in range(d):
        for j in range(i + 1):
            s = A[i][j]
            for k in range(j):
                s = dd.sub(s, dd.mul(L[i][k], L[j][k]))
            if i == j:
                L[i][j] = dd.sqrt(s)
            else:
                L[i][j] = dd.div(s, L[j][j])
    return L


def tri_solve_lower(L, b):
    """Solve ``L x = b`` (lower-triangular dd ``L``, dd vector ``b``)."""
    d = len(b)
    x = [None] * d
    for i in range(d):
        s = b[i]
        for k in range(i):
            s = dd.sub(s, dd.mul(L[i][k], x[k]))
        x[i] = dd.div(s, L[i][i])
    return x


def tri_solve_upper_t(L, y):
    """Solve ``L^T x = y`` given the LOWER factor ``L`` (dd)."""
    d = len(y)
    x = [None] * d
    for i in range(d - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, d):
            s = dd.sub(s, dd.mul(L[k][i], x[k]))
        x[i] = dd.div(s, L[i][i])
    return x


def cho_solve_vec(L, b):
    """``(L L^T)^{-1} b`` via forward + backward substitution (dd)."""
    return tri_solve_upper_t(L, tri_solve_lower(L, b))


def matvec(A, x):
    """Dense dd matrix-vector product (lists)."""
    out = []
    for row in A:
        s = dd.mul(row[0], x[0])
        for a, v in zip(row[1:], x[1:]):
            s = dd.add(s, dd.mul(a, v))
        out.append(s)
    return out


def mat_add(A, B):
    return [[dd.add(a, b) for a, b in zip(ra, rb)] for ra, rb in zip(A, B)]


def mat_sub(A, B):
    return [[dd.sub(a, b) for a, b in zip(ra, rb)] for ra, rb in zip(A, B)]
