"""Unit tests for point sets and classical moment transforms.

Modelled on the reference's verification ideas (``tests/test_mtran.py``):
shape checks for the recursive fully-symmetric sets, moment-exactness of the
rules on polynomials, and transform behaviour on canonical nonlinearities.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ssmtoybox_tpu import points as pts
from ssmtoybox_tpu.mtran import (
    LinearizationTransform, MonteCarloTransform, SphericalRadialTransform,
    UnscentedTransform, GaussHermiteTransform, FullySymmetricStudentTransform,
    TruncatedSphericalRadialTransform, TaylorGPQDTransform,
)


def test_point_counts():
    # 2d, 2d+1, degree^d, 2d+1 / 2d^2+1 (cf. SURVEY §2.2 table)
    for d in (1, 2, 3, 5):
        assert pts.sr_points(d).shape == (d, 2 * d)
        assert pts.ut_points(d).shape == (d, 2 * d + 1)
        assert pts.fs_points(d, degree=3).shape == (d, 2 * d + 1)
        assert pts.fs_points(d, degree=5, dof=6.0).shape == (d, 2 * d ** 2 + 1)
    assert pts.gh_points(2, 4).shape == (2, 16)


def test_weights_normalize():
    for d in (1, 3):
        assert np.isclose(pts.sr_weights(d).sum(), 1.0)
        assert np.isclose(pts.ut_weights(d)[0].sum(), 1.0)
        assert np.isclose(pts.gh_weights(d, 3).sum(), 1.0)
        assert np.isclose(pts.fs_weights(d, 3).sum(), 1.0)
        assert np.isclose(pts.fs_weights(d, 5, dof=7.0).sum(), 1.0)


def test_gauss_rules_match_gaussian_moments():
    """Degree-3 rules integrate x and x x^T exactly under N(0, I)."""
    d = 3
    for p, w in [(pts.sr_points(d), pts.sr_weights(d)),
                 (pts.ut_points(d), pts.ut_weights(d)[0]),
                 (pts.gh_points(d, 3), pts.gh_weights(d, 3))]:
        np.testing.assert_allclose(p @ w, np.zeros(d), atol=1e-12)
        np.testing.assert_allclose((p * w) @ p.T, np.eye(d), atol=1e-12)


def test_fs_degree3_converges_to_ut():
    """ST-3 -> UT-3 for dof -> inf (``mtran.py:383-384``)."""
    d = 2
    w_fs = pts.fs_weights(d, 3, dof=1e9)
    p_fs = pts.fs_points(d, 3, dof=1e9)
    np.testing.assert_allclose(w_fs, pts.ut_weights(d)[0], atol=1e-7)
    np.testing.assert_allclose(p_fs, pts.ut_points(d), atol=1e-4)


def test_ut_transform_exact_on_linear():
    """Sigma-point transforms are exact for affine maps."""
    A = jnp.asarray(np.random.RandomState(0).randn(3, 2))
    b = jnp.asarray(np.array([0.3, -1.0, 2.0]))
    mean = jnp.asarray(np.array([1.0, -0.5]))
    cov = jnp.asarray(np.array([[0.6, 0.2], [0.2, 0.9]]))

    tf = UnscentedTransform(2)
    mf, cf, ccf = tf.apply(lambda x, p: A @ x + b, mean, cov, None)
    np.testing.assert_allclose(mf, A @ mean + b, atol=1e-12)
    np.testing.assert_allclose(cf, A @ cov @ A.T, atol=1e-12)
    np.testing.assert_allclose(ccf, A @ cov, atol=1e-12)


def test_linearization_matches_hand_jacobian():
    """AD-based EKF linearization equals the analytic Jacobian (UNGM,
    ``ssmod.py:271-272``)."""
    mean = jnp.asarray(np.array([0.7]))
    cov = jnp.asarray(np.array([[2.0]]))
    f = lambda x, p: 0.5 * x + 25.0 * x / (1.0 + x ** 2)
    tf = LinearizationTransform.create(1)
    mf, cf, ccf = tf.apply(f, mean, cov, None)
    jac = 0.5 + 25 * (1 - 0.7 ** 2) / (1 + 0.7 ** 2) ** 2
    np.testing.assert_allclose(cf, jac ** 2 * 2.0, rtol=1e-12)


def test_mc_transform_converges():
    """MC transform approaches the UT result on a smooth function."""
    mean = jnp.asarray(np.array([1.0, np.pi / 6]))
    cov = jnp.asarray(np.diag([0.05 ** 2, (np.pi / 10) ** 2]))
    f = lambda x, p: x[0] * jnp.stack([jnp.cos(x[1]), jnp.sin(x[1])])
    mf_ut, _, _ = UnscentedTransform(2).apply(f, mean, cov, None)
    mf_mc, _, _ = MonteCarloTransform.create(2, n=100_000, seed=1).apply(f, mean, cov, None)
    np.testing.assert_allclose(mf_mc, mf_ut, atol=5e-3)


def test_truncated_transform_runs():
    tf = TruncatedSphericalRadialTransform(3, 2)
    mean = jnp.asarray(np.array([1.0, 2.0, 3.0]))
    cov = jnp.asarray(np.diag([1.0, 2.0, 3.0]))
    f = lambda x, p: jnp.stack([x[0] + x[1]])
    mf, cf, ccf = tf.apply(f, mean, cov, None)
    assert mf.shape == (1,) and cf.shape == (1, 1) and ccf.shape == (1, 3)
    assert bool(jnp.isfinite(cf).all())


def test_taylor_gpqd_limits_to_linearization():
    """TaylorGPQD -> linearization for length-scale -> infinity
    (``mtran.py:668-672``)."""
    mean = jnp.asarray(np.array([0.4]))
    cov = jnp.asarray(np.array([[1.3]]))
    f = lambda x, p: jnp.sin(x)
    lin = LinearizationTransform.create(1).apply(f, mean, cov, None)
    gpqd = TaylorGPQDTransform.create(1, np.array([[1.0, 1e4]])).apply(f, mean, cov, None)
    np.testing.assert_allclose(gpqd[0], lin[0], rtol=1e-5)
    np.testing.assert_allclose(gpqd[2], lin[2], rtol=1e-4)


def test_transforms_jit_and_vmap():
    """Transforms are jit-able and vmap-able over input moments."""
    tf = UnscentedTransform(2)
    f = lambda x, p: jnp.stack([x[0] * x[1], x[0] + x[1]])
    means = jnp.asarray(np.random.RandomState(2).randn(16, 2))
    covs = jnp.broadcast_to(jnp.eye(2), (16, 2, 2))
    run = jax.jit(jax.vmap(lambda m, P: tf.apply(f, m, P, None)[0]))
    out = run(means, covs)
    assert out.shape == (16, 2)
    np.testing.assert_allclose(out[0], tf.apply(f, means[0], covs[0], None)[0], rtol=1e-12)


def test_contraction_path_consistency(unrolled_linalg):
    """small_matmul vs @ vs einsum agree to f64 round-off.

    Mirrors the reference's dot-vs-einsum consistency study
    (``tests/test_mult_dot_einsum.py``), which documented discrepancies that
    plagued its multi-output models; here all three paths must agree.
    """
    from ssmtoybox_tpu.utils.linalg import small_matmul, small_mm3
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(7, 5, 11))
    W = jnp.asarray(rng.randn(11, 11))
    b = jnp.asarray(rng.randn(7, 11, 5))
    ref = a @ W @ b
    np.testing.assert_allclose(small_mm3(a, W, b), ref, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(jnp.einsum("mik,kl,mlj->mij", a, W, b), ref,
                               rtol=1e-12, atol=1e-12)
    # vector right-hand side
    v = jnp.asarray(rng.randn(11))
    np.testing.assert_allclose(small_matmul(a, v), a @ v, rtol=1e-12, atol=1e-12)


def test_chol_small_grad(unrolled_linalg):
    """Unrolled Cholesky is differentiable (needed by NLML training paths)."""
    from ssmtoybox_tpu.utils.linalg import chol_small
    A = jnp.asarray(np.array([[2.0, 0.5], [0.5, 1.5]]))
    f = lambda A: jnp.sum(chol_small(A))
    g = jax.grad(f)(A)
    eps = 1e-6
    fd = (f(A + eps * jnp.eye(2)) - f(A - eps * jnp.eye(2))) / (2 * eps)
    np.testing.assert_allclose(jnp.trace(g), fd, rtol=1e-5)


@pytest.mark.parametrize("d", [1, 2, 3, 5, 8, 9])
def test_chol_small_matches_lapack_across_dims(d, unrolled_linalg):
    """Unrolled Cholesky/substitution vs LAPACK over random PD batches."""
    from ssmtoybox_tpu.utils.linalg import chol_small, cho_solve_small
    from jax.scipy.linalg import cho_solve
    rng = np.random.RandomState(d)
    A = jnp.asarray(rng.randn(16, d, d))
    P = jnp.einsum("mij,mkj->mik", A, A) + d * jnp.eye(d)
    L = chol_small(P)
    np.testing.assert_allclose(np.asarray(L), np.asarray(jnp.linalg.cholesky(P)),
                               rtol=1e-10, atol=1e-10)
    b = jnp.asarray(rng.randn(16, d, 3))
    x = cho_solve_small(L, b)
    x_ref = cho_solve((jnp.linalg.cholesky(P), True), b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), rtol=1e-9, atol=1e-9)


def test_small_linalg_backend_dispatch():
    """The 'auto' small-linalg mode must lower to LAPACK custom calls on this
    CPU host (single-op programs; the unrolled graphs are pure compile cost
    off-TPU), while 'unrolled' must emit the elementwise kernels with no
    LAPACK custom call — a silent dispatch regression in either direction
    would only show up as perf, never as a wrong answer."""
    from ssmtoybox_tpu.utils import linalg
    A = jnp.eye(4, dtype=jnp.float64) * 2.0
    cols = jnp.ones((4, 9), dtype=jnp.float64)
    # fresh lambdas per lowering: jax's jit trace cache is keyed on the
    # function OBJECT, so lowering linalg.chol_small directly would reuse
    # the trace from the previous mode (the exact footgun that makes
    # set_small_linalg_mode clear caches by default; clear_caches=False
    # here to keep the suite's warm programs alive)
    low_chol = lambda: jax.jit(lambda a: linalg.chol_small(a)).lower(A).as_text()
    low_tria = lambda: jax.jit(lambda c: linalg.tria(c)).lower(cols).as_text()
    prev = linalg._SMALL_LINALG_MODE
    try:
        linalg.set_small_linalg_mode("generic", clear_caches=False)
        assert "lapack_" in low_chol()
        assert "lapack_" in low_tria()
        linalg.set_small_linalg_mode("unrolled", clear_caches=False)
        assert "lapack_" not in low_chol()
        assert "lapack_" not in low_tria()
        # 'auto' == 'generic' on the CPU test backend
        linalg.set_small_linalg_mode("auto", clear_caches=False)
        assert "lapack_" in low_chol()
    finally:
        linalg.set_small_linalg_mode(prev, clear_caches=False)
    with pytest.raises(ValueError):
        linalg.set_small_linalg_mode("fastest")
