"""Time-parallel SQUARE-ROOT filter/smoother: equivalence + f32 stability."""
import numpy as np
import jax
import jax.numpy as jnp

import ssmtoybox_tpu as st
from ssmtoybox_tpu.parallel.timescan import (parallel_linear_filter,
                                             parallel_linear_smoother)
from ssmtoybox_tpu.parallel.sqrttime import (parallel_affine_sqrt_filter,
                                             parallel_affine_sqrt_smoother,
                                             parallel_linear_sqrt_filter,
                                             parallel_linear_sqrt_smoother)

from test_timescan import _setup


def _sqrt_inputs(F, Q, H, R, x0):
    """Thin (D=4, Mq=2) process-noise columns through the CV gain — exercises
    the rank-deficient/zero-padding branches of the factor-form scans."""
    dt = 0.5
    G = np.kron(np.eye(2), np.array([[dt ** 2 / 2], [dt]]))
    SQ = G * np.sqrt(5.0)                  # G chol(diag(5, 5)): (4, 2) columns
    np.testing.assert_allclose(SQ @ SQ.T, Q, atol=1e-12)
    SR = np.linalg.cholesky(R)
    S0 = np.linalg.cholesky(np.asarray(x0.cov))
    return SQ, SR, S0


def test_parallel_sqrt_filter_matches_full_cov():
    dyn, obs, x, y, F, Q, H, R, x0 = _setup()
    SQ, SR, S0 = _sqrt_inputs(F, Q, H, R, x0)
    fm_full, fP_full = parallel_linear_filter(F, Q, H, R, x0.mean, x0.cov, y)
    fm_sq, fS_sq = parallel_linear_sqrt_filter(F, SQ, H, SR, x0.mean, S0, y)
    fP_sq = jnp.einsum("ijn,kjn->ikn", fS_sq, fS_sq)
    np.testing.assert_allclose(np.asarray(fm_sq), np.asarray(fm_full),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(fP_sq), np.asarray(fP_full),
                               rtol=1e-8, atol=1e-8)
    # factors are lower-triangular with positive diagonals
    fS = np.moveaxis(np.asarray(fS_sq), -1, 0)
    assert np.all(np.diagonal(fS, axis1=-2, axis2=-1) > 0)
    assert np.allclose(fS, np.tril(fS))


def test_parallel_sqrt_filter_matches_sequential_sqrt():
    """Cross-check against the sequential square-root scan filter."""
    from ssmtoybox_tpu.sqrt import make_sqrt_filter
    dyn, obs, x, y, F, Q, H, R, x0 = _setup()
    SQ, SR, S0 = _sqrt_inputs(F, Q, H, R, x0)
    seq = make_sqrt_filter(dyn, obs, st.UnscentedKalman(dyn, obs).tf_dyn,
                           st.UnscentedKalman(dyn, obs).tf_obs)(jnp.asarray(y))
    fm_sq, fS_sq = parallel_linear_sqrt_filter(F, SQ, H, SR, x0.mean, S0, y)
    np.testing.assert_allclose(np.asarray(fm_sq), np.asarray(seq.fi_mean),
                               rtol=1e-8, atol=1e-8)
    P_par = jnp.einsum("ijn,kjn->ikn", fS_sq, fS_sq)
    P_seq = jnp.einsum("ijn,kjn->ikn", seq.fi_sqrt, seq.fi_sqrt)
    np.testing.assert_allclose(np.asarray(P_par), np.asarray(P_seq),
                               rtol=1e-8, atol=1e-8)


def test_parallel_sqrt_smoother_matches_full_cov():
    dyn, obs, x, y, F, Q, H, R, x0 = _setup()
    SQ, SR, S0 = _sqrt_inputs(F, Q, H, R, x0)
    fm_full, fP_full = parallel_linear_filter(F, Q, H, R, x0.mean, x0.cov, y)
    sm_full, sP_full = parallel_linear_smoother(F, Q, fm_full, fP_full)
    fm_sq, fS_sq = parallel_linear_sqrt_filter(F, SQ, H, SR, x0.mean, S0, y)
    sm_sq, sS_sq = parallel_linear_sqrt_smoother(F, SQ, fm_sq, fS_sq)
    sP_sq = jnp.einsum("ijn,kjn->ikn", sS_sq, sS_sq)
    np.testing.assert_allclose(np.asarray(sm_sq), np.asarray(sm_full),
                               rtol=1e-7, atol=1e-7)
    np.testing.assert_allclose(np.asarray(sP_sq), np.asarray(sP_full),
                               rtol=1e-7, atol=1e-7)


def test_affine_time_varying_matches_full_cov():
    """Per-step coefficients (not just broadcast constants) agree too."""
    dyn, obs, x, y, F, Q, H, R, x0 = _setup(steps=32)
    n = y.shape[-1]
    rng = np.random.default_rng(3)
    # mildly perturbed time-varying affine model around the CV baseline
    Fs = np.repeat(F[None], n, axis=0) + 0.01 * rng.standard_normal((n, 4, 4))
    bs = 0.1 * rng.standard_normal((n, 4))
    Hs = np.repeat(H[None], n, axis=0) + 0.01 * rng.standard_normal((n, 2, 4))
    cs = 0.1 * rng.standard_normal((n, 2))
    Qs = np.repeat((Q + 1e-6 * np.eye(4))[None], n, axis=0)
    Rs = np.repeat(R[None], n, axis=0)
    SQs = np.linalg.cholesky(Qs)
    SRs = np.linalg.cholesky(Rs)
    S0 = np.linalg.cholesky(np.asarray(x0.cov))

    from ssmtoybox_tpu.parallel.timescan import (parallel_affine_filter,
                                                 parallel_affine_smoother)
    fm_full, fP_full = parallel_affine_filter(Fs, bs, Qs, Hs, cs, Rs,
                                              x0.mean, x0.cov, y)
    fm_sq, fS_sq = parallel_affine_sqrt_filter(Fs, bs, SQs, Hs, cs, SRs,
                                               x0.mean, S0, y)
    fP_sq = jnp.einsum("ijn,kjn->ikn", fS_sq, fS_sq)
    np.testing.assert_allclose(np.asarray(fm_sq), np.asarray(fm_full),
                               rtol=1e-7, atol=1e-7)
    np.testing.assert_allclose(np.asarray(fP_sq), np.asarray(fP_full),
                               rtol=1e-7, atol=1e-7)

    sm_full, sP_full = parallel_affine_smoother(Fs, bs, Qs, fm_full, fP_full)
    sm_sq, sS_sq = parallel_affine_sqrt_smoother(Fs, bs, SQs, fm_sq, fS_sq)
    sP_sq = jnp.einsum("ijn,kjn->ikn", sS_sq, sS_sq)
    np.testing.assert_allclose(np.asarray(sm_sq), np.asarray(sm_full),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sP_sq), np.asarray(sP_full),
                               rtol=1e-6, atol=1e-6)


def test_more_measurements_than_states():
    """E > D exercises the tria branch of the information-factor squaring
    (_square_cols): a 1-D state observed by 3 sensors."""
    rng = np.random.default_rng(7)
    n = 40
    F = np.array([[0.95]])
    Q = np.array([[0.3]])
    H = np.array([[1.0], [0.8], [-0.5]])
    R = np.diag([0.4, 0.6, 0.5])
    m0, P0 = np.array([1.0]), np.array([[2.0]])
    ys = rng.standard_normal((3, n))
    fm_full, fP_full = parallel_linear_filter(F, Q, H, R, m0, P0, ys)
    fm_sq, fS_sq = parallel_linear_sqrt_filter(
        F, np.linalg.cholesky(Q), H, np.linalg.cholesky(R), m0,
        np.linalg.cholesky(P0), ys)
    fP_sq = jnp.einsum("ijn,kjn->ikn", fS_sq, fS_sq)
    np.testing.assert_allclose(np.asarray(fm_sq), np.asarray(fm_full),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(fP_sq), np.asarray(fP_full),
                               rtol=1e-9, atol=1e-9)


def test_blocked_scan_matches_unchunked():
    """``scan_block_len`` (the vmem-bounded scan-of-scans) must reproduce the
    unchunked associative scan exactly — including a ragged tail block (64
    steps over block_len=24 leaves a 16-step remainder that exercises the
    identity padding) — for both the filter and the reverse smoother."""
    dyn, obs, x, y, F, Q, H, R, x0 = _setup()
    SQ, SR, S0 = _sqrt_inputs(F, Q, H, R, x0)
    fm, fS = parallel_linear_sqrt_filter(F, SQ, H, SR, x0.mean, S0, y)
    fm_b, fS_b = parallel_linear_sqrt_filter(F, SQ, H, SR, x0.mean, S0, y,
                                             scan_block_len=24)
    np.testing.assert_allclose(np.asarray(fm_b), np.asarray(fm),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(fS_b), np.asarray(fS),
                               rtol=1e-10, atol=1e-10)
    sm, sS = parallel_linear_sqrt_smoother(F, SQ, fm, fS)
    sm_b, sS_b = parallel_linear_sqrt_smoother(F, SQ, fm, fS,
                                               scan_block_len=24)
    np.testing.assert_allclose(np.asarray(sm_b), np.asarray(sm),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(sS_b), np.asarray(sS),
                               rtol=1e-10, atol=1e-10)


def test_f32_long_record_stays_pd():
    """f32 + 512 steps: the factor recursion keeps positive diagonals and
    tracks the f64 result — the serving scenario that motivates the
    square-root form.  (512 rather than the bench's 100k+: f32
    full-covariance CV filters lose PD within ~300 steps, so the property
    is already discriminating here.)  Compile economics on the 1-core CI
    host: the f32 scans run BLOCKED (``scan_block_len=64`` — also the
    production vmem-bounded mode) so the traced graph stays 64-step-sized,
    and the f64 reference is the sequential UKF (an exact KF on this linear
    model) whose rolled ``lax.scan`` compile is length-independent."""
    dyn, obs, x, y, F, Q, H, R, x0 = _setup(steps=512)
    SQ, SR, S0 = _sqrt_inputs(F, Q, H, R, x0)
    to32 = lambda a: jnp.asarray(a, jnp.float32)
    fm32, fS32 = parallel_linear_sqrt_filter(
        to32(F), to32(SQ), to32(H), to32(SR), to32(x0.mean), to32(S0), to32(y),
        scan_block_len=64)
    assert fm32.dtype == jnp.float32
    assert bool(jnp.isfinite(fm32).all())
    diag = jnp.diagonal(jnp.moveaxis(fS32, -1, 0), axis1=-2, axis2=-1)
    assert bool((diag > 0).all())

    fm64, _ = st.UnscentedKalman(dyn, obs).forward_pass(y)
    err = np.max(np.abs(np.asarray(fm32, np.float64) - np.asarray(fm64)))
    scale = np.max(np.abs(np.asarray(fm64)))
    assert err / scale < 1e-3

    sm32, sS32 = parallel_linear_sqrt_smoother(to32(F), to32(SQ), fm32, fS32,
                                               scan_block_len=64)
    assert bool(jnp.isfinite(sm32).all())
    sdiag = jnp.diagonal(jnp.moveaxis(sS32, -1, 0), axis1=-2, axis2=-1)
    assert bool((sdiag > 0).all())
