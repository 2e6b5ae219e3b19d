"""Linear-algebra primitives shared by the whole framework.

TPU-first re-design of the linalg helpers in the reference toolbox
(``ssmtoybox/utils.py:385-456`` — ``maha``, ``mat_sqrt``, ``ellipse_points`` and
``ssmtoybox/bq/bqkern.py:38-142`` — jittered PSD solves).  Everything here is a
pure function of jax arrays: jit-able, vmap-able and differentiable, so filters
can run thousands of small factorizations batched on one chip instead of one
LAPACK call at a time.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_factor, cho_solve

__all__ = [
    "maha",
    "mat_sqrt",
    "safe_cholesky",
    "pd_solve",
    "pd_inv",
    "pd_logdet",
    "gen_solve",
    "gen_inv",
    "symmetrize",
    "ellipse_points",
    "chol_small",
    "chol_small_psd",
    "cholupdate_small",
    "cho_solve_small",
    "pd_solve_small",
    "tri_solve_small",
    "small_matmul",
    "small_mm3",
    "tria",
    "set_small_linalg_mode",
]

#: Default diagonal jitter used to stabilize Gram-matrix inversions
#: (mirrors the reference kernel jitter, ``ssmtoybox/bq/bqkern.py:29-35``).
DEFAULT_JITTER = 1e-8

#: Small-linalg dispatch mode: ``"auto"`` routes through the unrolled
#: elementwise kernels only on TPU backends (where they exist to dodge the
#: emulated-f64 Cholesky/QR/TriangularSolve paths and tiny-matmul overhead)
#: and through XLA's generic ops elsewhere — on CPU the generic ops are
#: single LAPACK custom-calls, so the unrolled graphs are pure XLA-compile
#: cost with no runtime benefit (a full test-suite run is compile-bound).
#: ``"unrolled"`` / ``"generic"`` force one path; settable via the
#: ``SSMTPU_SMALL_LINALG`` environment variable or :func:`set_small_linalg_mode`.
import os as _os


def _check_mode(mode: str) -> str:
    if mode not in ("auto", "unrolled", "generic"):
        raise ValueError(f"unknown small-linalg mode {mode!r}; "
                         "expected 'auto', 'unrolled' or 'generic'")
    return mode


_SMALL_LINALG_MODE = _check_mode(_os.environ.get("SSMTPU_SMALL_LINALG", "auto"))


def set_small_linalg_mode(mode: str, clear_caches: bool = True) -> None:
    """Select the small-linalg dispatch: 'auto' | 'unrolled' | 'generic'.

    The mode picks the path WITHIN each op's static size cap
    (:data:`SMALL_DIM_MAX` / :data:`TRIA_SMALL_DIM_MAX` /
    :data:`UNROLL_MATMUL_MAX`): above the cap the generic XLA op always
    runs, 'unrolled' included — there the unrolled graphs lose on every
    backend, which is why the caps exist.

    The mode is read at TRACE time and is not part of jit cache keys, so
    already-compiled programs would silently keep their old path; by default
    the switch drops jax's compilation caches to force retraces.  Pass
    ``clear_caches=False`` only when no affected program has been traced yet
    (e.g. process startup, or eager-only use).
    """
    global _SMALL_LINALG_MODE
    changed = _check_mode(mode) != _SMALL_LINALG_MODE
    _SMALL_LINALG_MODE = mode
    if changed and clear_caches:
        jax.clear_caches()


def _unrolled(d: int, limit: int) -> bool:
    """True when dimension ``d`` should take the unrolled elementwise path."""
    if d > limit:
        return False
    if _SMALL_LINALG_MODE == "unrolled":
        return True
    if _SMALL_LINALG_MODE == "generic":
        return False
    return jax.default_backend() == "tpu"


def maha(x: jax.Array, y: jax.Array, V: jax.Array | None = None) -> jax.Array:
    """Pairwise squared Mahalanobis distance of rows of ``x`` and ``y``.

    Parity with ``ssmtoybox/utils.py:385-409``: ``maha(x, y, V)[i, j] =
    (x_i - y_j)^T V (x_i - y_j)`` computed via the expanded quadratic form so
    the whole thing lowers to two matmuls (MXU-friendly) plus broadcasts.

    Parameters
    ----------
    x : (N, D) array
    y : (M, D) array
    V : (D, D) array, optional — weight matrix, identity if omitted.
    """
    if V is None:
        xV = x
        yV = y
    else:
        xV = x @ V
        yV = y @ V
    x2 = jnp.sum(xV * x, axis=-1)
    y2 = jnp.sum(yV * y, axis=-1)
    return x2[..., :, None] + y2[..., None, :] - 2.0 * jnp.einsum("...nd,...md->...nm", xV, y)


def symmetrize(a: jax.Array) -> jax.Array:
    """Force symmetry: ``0.5 * (A + A^T)`` (cf. ``bqkern.py:63``, ``bqmod.py:520-522``)."""
    return 0.5 * (a + jnp.swapaxes(a, -1, -2))


def safe_cholesky(a: jax.Array, jitter: float = 0.0) -> jax.Array:
    """Lower Cholesky factor with an eigh-based PSD fallback.

    Replaces the try/except Cholesky→SVD fallback of the reference
    (``ssmtoybox/utils.py:412-433``), which cannot be traced.  Instead we always
    compute both factors and select with ``jnp.where``: when the Cholesky
    succeeds (no NaNs) it is returned bit-for-bit; otherwise the symmetric
    square root from a clipped eigendecomposition is used.  The ``where`` pair
    keeps this compatible with jit/vmap without data-dependent control flow.
    """
    if jitter:
        a = a + jitter * jnp.eye(a.shape[-1], dtype=a.dtype)
    chol = jnp.linalg.cholesky(a)
    ok = jnp.all(jnp.isfinite(chol), axis=(-2, -1), keepdims=True)
    # Eigendecomposition fallback: U * sqrt(clip(s)) (matches the SVD branch of
    # the reference for symmetric inputs).
    w, v = jnp.linalg.eigh(symmetrize(a))
    fallback = v * jnp.sqrt(jnp.clip(w, 0.0))[..., None, :]
    return jnp.where(ok, jnp.where(jnp.isfinite(chol), chol, 0.0), fallback)


def mat_sqrt(a: jax.Array) -> jax.Array:
    """Matrix square root (Cholesky when PD, eigh fallback otherwise).

    Functional equivalent of ``ssmtoybox/utils.py:412-433``.
    """
    return safe_cholesky(a)


def pd_solve(A: jax.Array, b: jax.Array, jitter: float = 0.0) -> jax.Array:
    """Solve ``A x = b`` for symmetric positive-definite ``A`` via Cholesky.

    Equivalent of ``cho_solve(cho_factor(A), b)`` used throughout the reference
    (``ssmtoybox/ssinf.py:321,342``, ``ssmtoybox/bq/bqkern.py:38-64``).
    """
    if jitter:
        A = A + jitter * jnp.eye(A.shape[-1], dtype=A.dtype)
    return cho_solve(cho_factor(A, lower=True), b)


def pd_inv(A: jax.Array, jitter: float = 0.0, do_symmetrize: bool = True) -> jax.Array:
    """Inverse of a symmetric PD matrix, symmetrized like the reference.

    Mirrors ``Kernel._cho_inv`` (``ssmtoybox/bq/bqkern.py:38-64``): Cholesky
    solve against the identity followed by forced symmetrization.
    """
    eye = jnp.eye(A.shape[-1], dtype=A.dtype)
    iA = pd_solve(A, eye, jitter=jitter)
    return symmetrize(iA) if do_symmetrize else iA


#: Largest matrix dimension routed through the unrolled kernels below.
#: Beyond this the emitted-op count (O(D^3)) outgrows the benefit.
SMALL_DIM_MAX = 9


def chol_small(a: jax.Array) -> jax.Array:
    """Batch-parallel Cholesky for small static dimension, fully unrolled.

    Motivation (measured on TPU v5e, f64, 10k-batch of 5x5): XLA's generic
    batched ``cholesky`` costs ~45ms per call in emulated f64, while the
    D(D+1)/2 unrolled Cholesky-Banachiewicz scalar recurrences — each a pure
    elementwise op over the batch — are ~2 orders of magnitude cheaper.  This
    is the filters' per-step hot op (SURVEY §7: "per-step Cholesky of small
    matrices dominates UNGM-scale problems; batch them via vmap").

    Falls back to ``jnp.linalg.cholesky`` above :data:`SMALL_DIM_MAX` and on
    non-TPU backends (same factor either way; see :func:`set_small_linalg_mode`).
    Differentiable and vmappable like any jnp expression.
    """
    d = a.shape[-1]
    if not _unrolled(d, SMALL_DIM_MAX):
        return jnp.linalg.cholesky(a)
    col = [[None] * d for _ in range(d)]
    for i in range(d):
        for j in range(i + 1):
            s = a[..., i, j]
            for k in range(j):
                s = s - col[i][k] * col[j][k]
            if i == j:
                col[i][j] = jnp.sqrt(s)
            else:
                col[i][j] = s / col[j][j]
    zero = jnp.zeros_like(a[..., 0, 0])
    rows = [jnp.stack([col[i][j] if j <= i else zero for j in range(d)], axis=-1)
            for i in range(d)]
    return jnp.stack(rows, axis=-2)


def chol_small_psd(a: jax.Array) -> jax.Array:
    """Clamped :func:`chol_small` for positive SEMI-definite small matrices.

    Rank-deficient inputs are routine in the square-root paths: SLR residual
    covariances are exactly zero on linear models, and ``G Q Gᵀ`` process
    noise through a thin gain has rank ``dim_q < D``.  A plain Cholesky
    recurrence NaNs on the zero pivots (0/0); here each pivot is clamped at
    zero and columns under a scale-relative cutoff ``sqrt(max_diag · eps) · D``
    are zeroed.  The cutoff is the resolution at which a pivot is
    distinguishable from elimination round-off (eliminating an O(scale) block
    leaves O(eps·scale) noise, i.e. O(sqrt(eps·scale)) in the factor), so
    ``L Lᵀ`` can differ from ``a`` by up to ``~D·sqrt(eps)·scale`` — genuine
    correlations between directions whose variances differ by more than a
    factor ``1/eps`` are dropped rather than amplified into NaN/garbage.
    Callers needing those extreme rank-1 structures intact must factor them
    analytically (as the square-root filters do for their noise columns).
    Elementwise over the batch like :func:`chol_small`; no eigh/SVD, so it
    runs on the TPU f64 path too.
    """
    d = a.shape[-1]
    if d > SMALL_DIM_MAX:
        # safe_cholesky's eigh fallback returns a NON-triangular square root;
        # this function's contract is a lower-triangular factor (callers
        # substitute against it), so re-triangularize — a no-op (up to
        # rounding) when the plain Cholesky succeeded
        return tria(safe_cholesky(a))
    eps = jnp.finfo(a.dtype).eps
    diag = jnp.stack([a[..., i, i] for i in range(d)], axis=-1)
    scale = jnp.clip(jnp.max(diag, axis=-1), jnp.finfo(a.dtype).tiny)
    tol = jnp.sqrt(scale * eps) * d
    col = [[None] * d for _ in range(d)]
    for i in range(d):
        for j in range(i + 1):
            s = a[..., i, j]
            for k in range(j):
                s = s - col[i][k] * col[j][k]
            if i == j:
                col[i][j] = jnp.sqrt(jnp.clip(s, 0.0))
            else:
                piv = col[j][j]
                ok = piv > tol
                col[i][j] = jnp.where(ok, s / jnp.where(ok, piv, 1.0), 0.0)
    zero = jnp.zeros_like(a[..., 0, 0])
    rows = [jnp.stack([col[i][j] if j <= i else zero for j in range(d)], axis=-1)
            for i in range(d)]
    return jnp.stack(rows, axis=-2)


def _solve_tri_small(L: jax.Array, b: jax.Array, lower: bool) -> jax.Array:
    """Unrolled triangular substitution; ``b`` is (..., D) or (..., D, K)."""
    d = L.shape[-1]
    vec = b.ndim == L.ndim - 1
    if vec:
        b = b[..., None]
    xs = [None] * d
    order = range(d) if lower else range(d - 1, -1, -1)
    for i in order:
        s = b[..., i, :]
        ks = range(i) if lower else range(i + 1, d)
        for k in ks:
            s = s - L[..., i, k, None] * xs[k]
        xs[i] = s / L[..., i, i, None]
    out = jnp.stack(xs, axis=-2)
    return out[..., 0] if vec else out


def tri_solve_small(L: jax.Array, b: jax.Array, lower: bool = True) -> jax.Array:
    """Unrolled batched triangular solve ``L x = b`` for small static dims.

    ``b`` is (..., D) or (..., D, K).  Same motivation as :func:`chol_small`:
    substitution as D(D+1)/2 elementwise ops beats XLA's generic (and on TPU
    f64, unavailable) TriangularSolve for the filter-sized systems.  On
    non-TPU backends this is a single TriangularSolve custom call instead.
    """
    if not _unrolled(L.shape[-1], SMALL_DIM_MAX):
        from jax.scipy.linalg import solve_triangular
        vec = b.ndim == L.ndim - 1
        rhs = b[..., None] if vec else b
        out = solve_triangular(L, rhs, lower=lower)
        return out[..., 0] if vec else out
    return _solve_tri_small(L, b, lower)


def cholupdate_small(L: jax.Array, v: jax.Array, w) -> jax.Array:
    """Rank-1 Cholesky update: the lower factor of ``L L^T + w v v^T``.

    ``w`` is a (possibly traced) scalar of either sign — the classic
    hyperbolic-rotation update/downdate with the sign folded in, fully
    unrolled like :func:`chol_small` so it batches elementwise.  ``w = 0`` is
    an exact no-op.  Used by the square-root filters for negative
    sigma-point weights and for the measurement-update downdate.  No
    reference counterpart (the reference keeps full covariances).
    """
    d = L.shape[-1]
    w = jnp.asarray(w, dtype=L.dtype)
    sgn = jnp.sign(w)
    root = jnp.sqrt(jnp.abs(w))
    u = [root * v[..., k] for k in range(d)]
    Lc = [[L[..., i, k] for k in range(i + 1)] for i in range(d)]
    out = [[None] * (i + 1) for i in range(d)]
    for k in range(d):
        Lkk = Lc[k][k]
        r = jnp.sqrt(Lkk * Lkk + sgn * u[k] * u[k])
        c = r / Lkk
        s = u[k] / Lkk
        out[k][k] = r
        for i in range(k + 1, d):
            Lik = (Lc[i][k] + sgn * s * u[i]) / c
            out[i][k] = Lik
            u[i] = c * u[i] - s * Lik
            Lc[i][k] = Lik
    zero = jnp.zeros_like(L[..., 0, 0])
    rows = [jnp.stack([out[i][j] if j <= i else zero for j in range(d)], axis=-1)
            for i in range(d)]
    return jnp.stack(rows, axis=-2)


def cho_solve_small(L: jax.Array, b: jax.Array) -> jax.Array:
    """``(L L^T)^-1 b`` via forward+backward substitution (dispatching)."""
    y = tri_solve_small(L, b, lower=True)
    return tri_solve_small(jnp.swapaxes(L, -1, -2), y, lower=False)


def pd_solve_small(A: jax.Array, b: jax.Array) -> jax.Array:
    """Small-dim PD solve through the (dispatching) Cholesky path."""
    return cho_solve_small(chol_small(A), b)


#: Largest contraction dimension unrolled by :func:`small_matmul`.
UNROLL_MATMUL_MAX = 32


def small_matmul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Batched ``a @ b`` unrolled over a small contraction dimension.

    Motivation (measured on TPU v5e, f64, 10k-batch): the MXU has no f64
    path, and XLA's emulated batched ``dot_general`` on tiny operands (e.g.
    (5, 11) x (11, 5)) costs ~23ms per call, while the same contraction as an
    unrolled sum of K rank-1 outer products — pure elementwise VPU ops — is
    ~100x faster.  This is the filters' per-step covariance contraction
    (``dfx @ Wc @ dfx^T``), the second hot op after the small Cholesky.

    Falls back to ``a @ b`` when the contraction dim exceeds
    :data:`UNROLL_MATMUL_MAX` (e.g. high-degree Gauss-Hermite point sets),
    where real matmuls win again.
    """
    k_dim = a.shape[-1]
    # matrix-vector iff b is (..., K) with batch dims matching a's AND its
    # last dim equal to the contraction dim — without the K check, a batched
    # a of shape (B, M, K) against an unbatched (K, J) matrix with B == K
    # would be misread as B vectors and silently produce clamped-index
    # garbage.  (B == K == J stays ambiguous; the vector reading wins, as
    # every internal caller batches both operands together.)
    is_vec = ((b.ndim == 1 or (b.ndim == a.ndim - 1 and b.shape[:-1] == a.shape[:-2]))
              and b.shape[-1] == k_dim)
    if not _unrolled(k_dim, UNROLL_MATMUL_MAX):
        return (a @ b[..., None])[..., 0] if (is_vec and b.ndim > 1) else a @ b
    if is_vec:
        out = a[..., :, 0] * b[..., 0, None]
        for k in range(1, k_dim):
            out = out + a[..., :, k] * b[..., k, None]
        return out
    out = a[..., :, 0, None] * b[..., 0, :][..., None, :]
    for k in range(1, k_dim):
        out = out + a[..., :, k, None] * b[..., k, :][..., None, :]
    return out


def small_mm3(a: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """``a @ w @ b`` through :func:`small_matmul` (both contractions small)."""
    return small_matmul(small_matmul(a, w), b)


#: Largest row dimension routed through the unrolled Householder ``tria``.
#: Wider than :data:`SMALL_DIM_MAX`: QR emits O(D^2) reflector applications
#: (vs Cholesky's O(D^2) scalar recurrences but with an O(M) reduction each),
#: and the payoff against XLA's emulated-f64 ``Qr`` stays large through the
#: 2D-row combines of the time-parallel square-root scans (D=5 -> 10 rows).
TRIA_SMALL_DIM_MAX = 12


def _tria_small(cols: jax.Array) -> jax.Array:
    """Unrolled batched Householder QR for :func:`tria` at small static D.

    Motivation (same economics as :func:`chol_small`, measured on TPU, f64,
    10k-batch reentry): XLA's generic ``Qr`` has no f64 TPU kernel and the
    emulated path made the square-root filter 8.5x SLOWER than full
    covariance (docs/performance.md r1).  D Householder reflectors over the
    (M, D) transposed block, fully unrolled at trace time, are pure
    elementwise/reduction ops over the batch — MXU/VPU-eligible, no
    emulation.  Backward-stable like any Householder QR, so the 1e-10
    SR-vs-full-covariance parity is preserved; rank-deficient inputs (zero
    columns from :func:`_tria_pad` padding) get an identity reflector via the
    ``vnorm2 > 0`` guard instead of 0/0 NaNs.
    """
    d, m = cols.shape[-2], cols.shape[-1]
    # columns of cols^T (the (M, D) matrix being factored), each (..., M)
    a = [cols[..., i, :] for i in range(d)]
    for j in range(d):
        x = a[j][..., j:]                                   # (..., M-j)
        sigma = jnp.sum(x * x, axis=-1)
        normx = jnp.sqrt(sigma)
        x0 = x[..., 0]
        sgn = jnp.where(x0 >= 0, 1.0, -1.0).astype(cols.dtype)
        alpha = -sgn * normx                                # post-reflection pivot
        v0 = x0 + sgn * normx                               # no cancellation
        v = x.at[..., 0].set(v0)
        vnorm2 = sigma + jnp.abs(x0) * normx                # = ||v||^2 / 2
        safe = vnorm2 > 0
        beta = jnp.where(safe, 1.0 / jnp.where(safe, vnorm2, 1.0), 0.0)
        for k in range(j, d):
            t = a[k][..., j:]
            proj = beta * jnp.sum(v * t, axis=-1)
            a[k] = a[k].at[..., j:].set(t - proj[..., None] * v)
        # pin the pivot exactly (the reflection leaves round-off below it)
        a[j] = a[j].at[..., j].set(alpha)
    # R[i, j] = a[j][..., i] (upper, i <= j); emit L = R^T with positive diag
    pos = [jnp.where(a[i][..., i] >= 0, 1.0, -1.0).astype(cols.dtype)
           for i in range(d)]
    zero = jnp.zeros_like(a[0][..., 0])
    rows = [jnp.stack([pos[j] * a[i][..., j] if j <= i else zero
                       for j in range(d)], axis=-1) for i in range(d)]
    return jnp.stack(rows, axis=-2)


def tria(cols: jax.Array) -> jax.Array:
    """Lower-triangular factor of ``cols @ cols^T`` via QR of ``cols^T``.

    ``cols`` is (..., D, M) with M >= D; returns (..., D, D) with a positive
    diagonal.  The square-root filters' workhorse: one fused batched QR
    replaces forming a covariance and refactorizing it — and never squares
    the conditioning, which is the point of the square-root form in f32.

    Small static D (the filters' regime) routes through the unrolled
    Householder kernel :func:`_tria_small` on TPU — XLA's generic ``Qr`` runs
    in emulated f64 there and was the whole cost of the SR-f64 path.  On CPU
    the generic ``Qr`` is one LAPACK call and wins on compile time.
    """
    if _unrolled(cols.shape[-2], TRIA_SMALL_DIM_MAX):
        return _tria_small(cols)
    r = jnp.linalg.qr(jnp.swapaxes(cols, -1, -2), mode="r")
    sgn = jnp.sign(jnp.diagonal(r, axis1=-2, axis2=-1))
    sgn = jnp.where(sgn == 0, jnp.ones_like(sgn), sgn)
    return jnp.swapaxes(r * sgn[..., :, None], -1, -2)


def pd_logdet(A: jax.Array) -> jax.Array:
    """``log det(A)`` for symmetric PD ``A`` via Cholesky.

    TPU note: ``jnp.linalg.slogdet``/``det`` lower to an LU decomposition,
    which has no float64 TPU kernel; Cholesky does.  Every PD logdet in the
    framework routes through here so the f64 parity path runs on-chip.
    """
    L = jnp.linalg.cholesky(A)
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)


def gen_solve(A: jax.Array, B: jax.Array) -> jax.Array:
    """Solve ``A X = B`` for a general (non-symmetric) small matrix ``A``.

    Gauss-Jordan elimination with partial pivoting, written as a
    ``lax.fori_loop`` of static-shape row operations.  Exists because XLA's
    ``LuDecomposition`` expansion has no float64 TPU kernel, so
    ``jnp.linalg.solve``/``inv`` cannot run in the f64 parity configuration
    on-chip.  Matrices here are tiny (sigma-point / polynomial-basis sized),
    so O(n^3) elimination is cheap and fully fused by XLA.
    """
    n = A.shape[-1]
    if B.ndim == 1:
        return gen_solve(A, B[:, None])[:, 0]
    M = jnp.concatenate([A, B], axis=-1)
    rows = jnp.arange(n)

    def body(i, M):
        col = jnp.abs(M[:, i])
        col = jnp.where(rows < i, -jnp.inf, col)
        p = jnp.argmax(col)
        row_i, row_p = M[i], M[p]
        M = M.at[i].set(row_p).at[p].set(row_i)
        pivot = M[i, i]
        factor = M[:, i] / pivot
        factor = factor.at[i].set(0.0)
        M = M - factor[:, None] * M[i][None, :]
        return M.at[i].set(M[i] / pivot)

    M = jax.lax.fori_loop(0, n, body, M)
    return M[:, n:]


def gen_inv(A: jax.Array) -> jax.Array:
    """Inverse of a general small matrix via :func:`gen_solve`."""
    return gen_solve(A, jnp.eye(A.shape[-1], dtype=A.dtype))


def ellipse_points(pos: jax.Array, mat: jax.Array, num: int = 50) -> jax.Array:
    """Points on the 1-sigma ellipse of a 2D Gaussian (``utils.py:436-456``)."""
    w, v = jnp.linalg.eigh(mat)
    theta = jnp.linspace(0.0, 2.0 * jnp.pi, num)
    t = jnp.stack((jnp.cos(theta), jnp.sin(theta)))
    return pos[:, None] + v @ (jnp.sqrt(jnp.clip(w, 0.0))[:, None] * t)
