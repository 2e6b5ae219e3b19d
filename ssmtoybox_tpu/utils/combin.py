"""Combinatorics + multivariate-monomial helpers.

Covers ``n_sum_k`` and the Numba-JIT ``vandermonde`` of the reference
(``ssmtoybox/utils.py:459-502``).  ``n_sum_k`` is trace-time combinatorics and
stays in NumPy (its output is a static constant baked into the compiled
program); ``vandermonde`` is the compute-path function, implemented as a loop
of STATIC integer exponents (``x ** int(p)`` lowers to ``integer_pow``; a
broadcasted ``jnp.power`` with an array exponent lowers to ``exp(p*log(x))``
on TPU, which is NaN for the negative sigma-point coordinates — do not
"simplify" it back) plus a Pallas TPU kernel for large point sets
(see :mod:`ssmtoybox_tpu.ops.pallas_ops`).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["n_sum_k", "n_sum_k_complete", "vandermonde", "vandermonde_np"]


def n_sum_k(n: int, k: int) -> np.ndarray:
    """n-tuples of non-negative ints summing to k, as a (n, count) matrix.

    Behavioural parity with ``ssmtoybox/utils.py:459-475`` (same column
    order), since BSQ weights depend on the multi-index ordering through the
    Vandermonde matrix.  NOTE: the reference recursion is INCOMPLETE for
    ``n >= 3, k >= 3`` — e.g. it omits (0, 3, 0) for (n=3, k=3), 3 of 15
    tuples for (3, 4), 4 of 20 for (4, 3) — and that incompleteness is
    reproduced here bit-for-bit (see docs/parity.md).  For the full set use
    :func:`n_sum_k_complete`.
    """
    assert k >= 0
    from .. import native
    fast = native.n_sum_k(n, k) if native.available() else None
    if fast is not None:
        return fast
    if k == 0:
        return np.zeros((n, 1), dtype=np.int64)
    if k == 1:
        return np.eye(n, dtype=np.int64)
    a = n_sum_k(n, k - 1)
    eye = np.eye(n, dtype=np.int64)
    cols = []
    for i in range(n - 1):
        for j in range(i, n):
            cols.append(a[:, i] + eye[:, j])
    temp = np.stack(cols, axis=1) if cols else np.zeros((n, 0), dtype=np.int64)
    return np.hstack((temp, a[:, n - 1:] + eye[:, -1, None]))


def n_sum_k_complete(n: int, k: int) -> np.ndarray:
    """ALL n-tuples of non-negative ints summing to k (the correct
    enumeration — C(k+n-1, n-1) columns, lexicographic order), for callers
    that want a complete total-degree basis instead of reference parity."""
    assert k >= 0
    if n == 1:
        return np.full((1, 1), k, dtype=np.int64)
    cols = []
    for first in range(k + 1):
        rest = n_sum_k_complete(n - 1, k - first)
        top = np.full((1, rest.shape[1]), first, dtype=np.int64)
        cols.append(np.vstack([top, rest]))
    return np.hstack(cols)


def total_degree_multi_index(dim: int, degree: int, complete: bool = False) -> np.ndarray:
    """Multi-index matrix of all monomials with total degree <= ``degree``.

    Mirrors the multi-index construction in ``BayesSardModel.__init__``
    (``ssmtoybox/bq/bqmod.py:624-629``).  With the default
    ``complete=False`` the per-degree blocks come from the reference's
    (incomplete for dim >= 3, degree >= 3) :func:`n_sum_k`; pass
    ``complete=True`` for the full basis via :func:`n_sum_k_complete`.
    """
    gen = n_sum_k_complete if complete else n_sum_k
    return np.hstack([gen(dim, td) for td in range(degree + 1)])


def vandermonde(mul_ind, x) -> jax.Array:
    """Vandermonde matrix of multivariate monomials, traced for XLA.

    Parity with the Numba kernel at ``ssmtoybox/utils.py:478-502``:
    ``vdm[n, b] = prod_d x[d, n] ** mul_ind[d, b]``.

    The multi-index must be a compile-time constant (it always is: BSQ bakes
    it into the weights).  Monomials are built by repeated multiplication —
    an ARRAY-valued exponent would lower to ``lax.pow = exp(e*log(x))``,
    which returns NaN on TPU for the negative sigma-point coordinates and for
    ``0**0``; static integer exponents lower to plain multiplies and are
    exact everywhere.

    Parameters
    ----------
    mul_ind : (D, Q) integer array of multi-indices (static/NumPy).
    x : (D, N) array of points.

    Returns
    -------
    (N, Q) array.
    """
    x = jnp.asarray(x)
    mul_np = np.asarray(mul_ind, dtype=np.int64)   # requires a static multi-index
    d, q = mul_np.shape
    cols = []
    one = jnp.ones_like(x[0])
    for b in range(q):
        col = one
        for dd in range(d):
            e = int(mul_np[dd, b])
            if e:
                col = col * x[dd] ** e             # static int -> integer_pow
        cols.append(col)
    return jnp.stack(cols, axis=1)


def vandermonde_np(mul_ind: np.ndarray, x: np.ndarray) -> np.ndarray:
    """NumPy twin of :func:`vandermonde` for trace-time constant folding."""
    return np.prod(x.T[:, None, :] ** mul_ind.T[None, :, :], axis=-1)
