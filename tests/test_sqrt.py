"""Square-root filtering: factor-form parity with the full-covariance
filters in f64, PD-by-construction stability in f32, and the unrolled
rank-1 Cholesky update/solve kernels."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import ssmtoybox_tpu as st
from ssmtoybox_tpu.sqrt import make_sqrt_filter, SquareRootKalman
from ssmtoybox_tpu.ssmod import (
    UNGMTransition, UNGMMeasurement, UNGMNATransition, UNGMNAMeasurement,
    ReentryVehicle2DTransition, Radar2DMeasurement)
from ssmtoybox_tpu.utils import GaussRV
from ssmtoybox_tpu.utils.linalg import cholupdate_small, tri_solve_small


class TestSmallKernels:
    def test_cholupdate_small(self):
        rng = np.random.default_rng(0)
        A = rng.normal(size=(5, 5))
        P = A @ A.T + 5 * np.eye(5)
        L = np.linalg.cholesky(P)
        v = rng.normal(size=5)
        for w in (0.7, -0.2, 0.0):
            got = np.asarray(cholupdate_small(jnp.asarray(L), jnp.asarray(v), w))
            want = np.linalg.cholesky(P + w * np.outer(v, v))
            np.testing.assert_allclose(got, want, atol=1e-12)

    def test_cholupdate_small_batched(self):
        rng = np.random.default_rng(1)
        A = rng.normal(size=(7, 3, 3))
        P = A @ np.swapaxes(A, -1, -2) + 3 * np.eye(3)
        L = np.linalg.cholesky(P)
        v = rng.normal(size=(7, 3))
        got = np.asarray(cholupdate_small(jnp.asarray(L), jnp.asarray(v), 0.5))
        want = np.linalg.cholesky(P + 0.5 * v[:, :, None] * v[:, None, :])
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_tri_solve_small(self, unrolled_linalg):
        rng = np.random.default_rng(2)
        L = np.tril(rng.normal(size=(4, 4))) + 4 * np.eye(4)
        B = rng.normal(size=(4, 2))
        got = np.asarray(tri_solve_small(jnp.asarray(L), jnp.asarray(B), lower=True))
        np.testing.assert_allclose(L @ got, B, atol=1e-12)
        U = L.T
        got = np.asarray(tri_solve_small(jnp.asarray(U), jnp.asarray(B), lower=False))
        np.testing.assert_allclose(U @ got, B, atol=1e-12)

    def test_tria_small_matches_generic_qr(self, unrolled_linalg):
        """The unrolled Householder ``tria`` fast path (the SR filters' hot
        op on the TPU f64 path) must agree with the generic QR route to
        machine precision, including ill-conditioned scalings, and produce a
        finite factor on rank-deficient zero-padded inputs."""
        from ssmtoybox_tpu.utils.linalg import _tria_small, tria, TRIA_SMALL_DIM_MAX

        def generic(cols):
            r = jnp.linalg.qr(jnp.swapaxes(cols, -1, -2), mode="r")
            sgn = jnp.sign(jnp.diagonal(r, axis1=-2, axis2=-1))
            sgn = jnp.where(sgn == 0, jnp.ones_like(sgn), sgn)
            return jnp.swapaxes(r * sgn[..., :, None], -1, -2)

        rng = np.random.default_rng(3)
        # (1,1) degenerate, (2,3)/(5,16) filter regime, (12,24) = the
        # TRIA_SMALL_DIM_MAX boundary; a mid-size case adds no new branch
        for d, m in [(1, 1), (2, 3), (5, 16), (12, 24)]:
            assert d <= TRIA_SMALL_DIM_MAX
            cols = jnp.asarray(rng.normal(size=(6, d, m)))
            np.testing.assert_allclose(np.asarray(_tria_small(cols)),
                                       np.asarray(generic(cols)), atol=1e-13)
            # the public entry point dispatches to the unrolled path here
            np.testing.assert_allclose(np.asarray(tria(cols)),
                                       np.asarray(_tria_small(cols)), atol=0)
        # reentry-like dynamic range (1e-3 .. 1e2 factor scales)
        sc = jnp.asarray(np.diag([1e-3, 1e2, 1e-3, 1e2, 1e-1]))
        cols = sc @ jnp.asarray(rng.normal(size=(5, 16)))
        a, b = _tria_small(cols[None]), generic(cols[None])
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12, atol=1e-15)
        # rank-deficient: zero rows/columns from _tria_pad-style padding
        cols = jnp.zeros((1, 5, 8)).at[0, :3, :3].set(
            jnp.asarray(rng.normal(size=(3, 3))))
        a = _tria_small(cols)
        assert bool(jnp.all(jnp.isfinite(a)))
        np.testing.assert_allclose(
            np.asarray(a @ jnp.swapaxes(a, -1, -2)),
            np.asarray(cols @ jnp.swapaxes(cols, -1, -2)), atol=1e-14)
        # differentiable (the SR paths sit under jax.grad in fitting loops)
        g = jax.grad(lambda c: jnp.sum(_tria_small(c)))(
            jnp.asarray(rng.normal(size=(4, 6))))
        assert bool(jnp.all(jnp.isfinite(g)))


@pytest.fixture(scope="module")
def ungm():
    dyn = UNGMTransition.create(GaussRV.create(1, cov=1.0), GaussRV.create(1, cov=10.0))
    obs = UNGMMeasurement.create(GaussRV.create(1, cov=1.0), dim_state=1)
    x = dyn.simulate_discrete(jax.random.PRNGKey(0), steps=100, mc_sims=4)
    y = obs.simulate_measurements(jax.random.PRNGKey(1), x)
    return dyn, obs, x, y


@pytest.fixture(scope="module")
def reentry():
    dyn = ReentryVehicle2DTransition.create(
        GaussRV.create(5, mean=jnp.array([6500.4, 349.14, -1.8093, -6.7967, 0.6932]),
                       cov=jnp.diag(jnp.array([1e-6, 1e-6, 1e-6, 1e-6, 1.0]))),
        GaussRV.create(3, cov=jnp.diag(jnp.array([2.4064e-5, 2.4064e-5, 1e-6]))), dt=0.1)
    obs = Radar2DMeasurement.create(
        GaussRV.create(2, cov=jnp.diag(jnp.array([1e-6, 0.17e-6]))), dim_state=5)
    x = dyn.simulate_discrete(jax.random.PRNGKey(0), steps=100, mc_sims=1)
    y = obs.simulate_measurements(jax.random.PRNGKey(1), x)
    return dyn, obs, x, y


class TestSqrtParity:
    def test_srukf_matches_ukf_ungm(self, ungm):
        dyn, obs, x, y = ungm
        fm, fc = st.UnscentedKalman(dyn, obs).forward_pass(y[..., 0])
        sm, sc = SquareRootKalman(dyn, obs, points="ut").forward_pass(y[..., 0])
        np.testing.assert_allclose(np.asarray(sm), np.asarray(fm), atol=1e-10)
        np.testing.assert_allclose(np.asarray(sc), np.asarray(fc), atol=1e-10)

    def test_srckf_matches_ckf_reentry(self, reentry):
        """5D state — the UT here has negative mean weights, and the factor
        recursion must still reproduce the full-covariance answer."""
        dyn, obs, x, y = reentry
        for pts, full in [("sr", st.CubatureKalman(dyn, obs)),
                          ("ut", st.UnscentedKalman(dyn, obs))]:
            fm, fc = full.forward_pass(y[..., 0])
            sm, sc = SquareRootKalman(dyn, obs, points=pts).forward_pass(y[..., 0])
            np.testing.assert_allclose(np.asarray(sm), np.asarray(fm), rtol=1e-8,
                                       atol=1e-10, err_msg=pts)
            scale = np.abs(np.asarray(fc)).max()
            np.testing.assert_allclose(np.asarray(sc) / scale, np.asarray(fc) / scale,
                                       atol=1e-10, err_msg=pts)

    def test_batch_matches_single(self, ungm):
        dyn, obs, x, y = ungm
        srf = SquareRootKalman(dyn, obs, points="ut")
        bm, bc = srf.forward_pass_batch(jnp.moveaxis(y, -1, 0))
        sm, sc = srf.forward_pass(y[..., 0])
        np.testing.assert_allclose(np.asarray(bm[0]), np.asarray(sm), atol=1e-12)
        np.testing.assert_allclose(np.asarray(bc[0]), np.asarray(sc), atol=1e-12)

    def test_f32_gh_smoother_identity_check_passes(self, ungm):
        """Regression: the GH rule's identity-reconstruction check used a
        fixed atol=1e-10, below f32 resolution of the rule constants, so the
        f32 serving configuration spuriously rejected GH smoothing (noise is
        ~4e-9 there); the tolerance now scales with the stored dtype."""
        dyn, obs, x, y = ungm
        srf = SquareRootKalman(dyn, obs, points="gh", point_hyp={"degree": 3},
                               dtype=jnp.float32)
        sm, sP = srf.smooth(y[..., 0])
        assert sm.dtype == jnp.float32
        assert bool(jnp.isfinite(sm).all())

    def test_f32_stays_pd_and_tracks_f64(self, reentry):
        dyn, obs, x, y = reentry
        sr32 = SquareRootKalman(dyn, obs, points="sr", dtype=jnp.float32)
        m32, _ = sr32.forward_pass(y[..., 0])
        assert m32.dtype == jnp.float32
        d = np.asarray(sr32._result.fi_sqrt)
        diags = d[np.arange(5), np.arange(5), :]
        assert np.isfinite(np.asarray(m32)).all()
        assert (diags > 0).all(), "factor lost positive-definiteness in f32"
        fm, _ = st.CubatureKalman(dyn, obs).forward_pass(y[..., 0])
        rel = np.abs(np.asarray(m32) - np.asarray(fm)).max() / np.abs(np.asarray(fm)).max()
        assert rel < 1e-2


class TestSqrtBQ:
    """BQ filtering in factor form: cov_f = fx (Wc - wm wm^T) fx^T + emv I
    factors exactly (the centered weight matrix is iK Cov[kx] iK, PSD by
    construction), so GPQ/BSQ/TPQ run square-root too (sqrt.py module doc)."""

    @staticmethod
    def _mk_tf(kind, dim_in, dim_out, kp):
        from ssmtoybox_tpu.bq.transforms import (
            GaussianProcessTransform, BayesSardTransform, StudentTProcessTransform)
        if kind == "gpq":
            return GaussianProcessTransform.create(dim_in, dim_out, kp, point_str="ut")
        if kind == "bsq":
            return BayesSardTransform.create(dim_in, dim_out, kp, multi_ind=2,
                                             point_str="ut")
        return StudentTProcessTransform.create(dim_in, dim_out, kp, point_str="ut")

    @pytest.mark.parametrize("kind", ["gpq", "bsq", "tpq"])
    def test_sqrt_bq_matches_full_f64(self, ungm, kind):
        dyn, obs, x, y = ungm
        kp = np.array([[1.0, 3.0]])
        tfd, tfo = self._mk_tf(kind, 1, 1, kp), self._mk_tf(kind, 1, 1, kp)
        res = st.ssinf.gaussian_filter(dyn, obs, tfd, tfo, y[..., 0])
        sm, sc = SquareRootKalman(dyn, obs, tf_dyn=tfd, tf_obs=tfo).forward_pass(y[..., 0])
        np.testing.assert_allclose(np.asarray(sm), np.asarray(res.fi_mean),
                                   atol=1e-8, err_msg=kind)
        np.testing.assert_allclose(np.asarray(sc), np.asarray(res.fi_cov),
                                   atol=1e-8, err_msg=kind)

    def test_f32_gpq_reentry_stays_pd_and_tracks_f64(self, reentry):
        from ssmtoybox_tpu.bq.transforms import GaussianProcessTransform
        dyn, obs, x, y = reentry
        kp = np.array([[1.0, 25, 25, 25, 25, 25]])          # gpq_tracking.py:50
        tfd = GaussianProcessTransform.create(5, 5, kp, point_str="ut")
        tfo = GaussianProcessTransform.create(5, 2, kp, point_str="ut")
        res = st.ssinf.gaussian_filter(dyn, obs, tfd, tfo, y[..., 0])
        srk = SquareRootKalman(dyn, obs, tf_dyn=tfd, tf_obs=tfo, dtype=jnp.float32)
        m32, P32 = srk.forward_pass(y[..., 0])
        assert m32.dtype == jnp.float32
        d = np.asarray(srk._result.fi_sqrt)[np.arange(5), np.arange(5), :]
        assert np.isfinite(np.asarray(m32)).all()
        assert (d > 0).all(), "BQ factor lost positive-definiteness in f32"
        fm = np.asarray(res.fi_mean)
        rel = np.abs(np.asarray(m32) - fm).max() / np.abs(fm).max()
        assert rel < 1e-2

    @pytest.mark.parametrize("kind", ["gpq", "bsq", "tpq"])
    def test_sqrt_bq_smoother_matches_full_f64(self, ungm, kind):
        """BQ square-root RTS: the joint (x_pred, x_prev) factorization from
        the closed-form columns [fx Wcc^T, fx W_hat, emv, noise] / [S, 0]
        (W_hat W_hat^T = (Wc - wm wm^T) - Wcc^T Wcc, PSD as the Schur
        complement of the joint covariance of (x, k(x))) must reproduce the
        full-covariance textbook RTS."""
        from ssmtoybox_tpu.sqrt import make_sqrt_smoother
        dyn, obs, _, y = ungm
        kp = np.array([[1.0, 3.0]])
        tfd, tfo = self._mk_tf(kind, 1, 1, kp), self._mk_tf(kind, 1, 1, kp)
        res = st.ssinf.gaussian_filter(dyn, obs, tfd, tfo, y[..., 0])
        sm_full, sP_full = st.ssinf.gaussian_smoother(res, rts_full=True)
        smooth = make_sqrt_smoother(dyn, obs, tfd, tfo)
        _, sm_m, sm_S = smooth(y[..., 0])
        P = np.einsum("ijn,kjn->ikn", np.asarray(sm_S), np.asarray(sm_S))
        np.testing.assert_allclose(np.asarray(sm_m), np.asarray(sm_full),
                                   atol=1e-8, err_msg=kind)
        np.testing.assert_allclose(P, np.asarray(sP_full), atol=1e-8, err_msg=kind)

    def test_sqrt_bq_smoother_f32_reentry_stays_pd(self, reentry):
        from ssmtoybox_tpu.bq.transforms import GaussianProcessTransform
        from ssmtoybox_tpu.sqrt import make_sqrt_smoother
        dyn, obs, _, y = reentry
        kp = np.array([[1.0, 25, 25, 25, 25, 25]])          # gpq_tracking.py:50
        tfd = GaussianProcessTransform.create(5, 5, kp, point_str="ut")
        tfo = GaussianProcessTransform.create(5, 2, kp, point_str="ut")
        res = st.ssinf.gaussian_filter(dyn, obs, tfd, tfo, y[..., 0])
        sm_full, _ = st.ssinf.gaussian_smoother(res, rts_full=True)
        smooth32 = make_sqrt_smoother(dyn, obs, tfd, tfo, dtype=jnp.float32)
        _, sm_m, sm_S = smooth32(y[..., 0])
        assert sm_m.dtype == jnp.float32
        assert np.isfinite(np.asarray(sm_m)).all()
        d = np.asarray(sm_S)[np.arange(5), np.arange(5), :]
        assert (d > 0).all(), "BQ smoothed factor lost definiteness in f32"
        fm = np.asarray(sm_full)
        rel = np.abs(np.asarray(sm_m) - fm).max() / np.abs(fm).max()
        assert rel < 1e-2

    def test_sqrt_bq_smoother_nonadditive(self):
        """The trimmed-Wcc branch of the BQ joint factorization: non-additive
        dynamics augment the input (dim_in = 2), Wcc is row-trimmed to the
        state block, and the residual (Wc - wm wm^T) - Wcc_trim^T Wcc_trim
        stays PSD (trimming only shrinks the subtrahend). Offset init mean
        avoids the degenerate bilinear-measurement singularity; parity with
        the full-covariance path is bounded by the sqrt path's 1e-9
        innovation-jitter floor (see test_nonadditive_matches_full_covariance)."""
        from ssmtoybox_tpu.bq.transforms import GaussianProcessTransform
        from ssmtoybox_tpu.sqrt import make_sqrt_smoother
        dyn = UNGMNATransition.create(
            GaussRV.create(1, mean=jnp.array([2.0]), cov=1.0),
            GaussRV.create(1, cov=1.0))
        obs = UNGMNAMeasurement.create(GaussRV.create(1, cov=1.0), dim_state=1)
        x = dyn.simulate_discrete(jax.random.PRNGKey(4), steps=50, mc_sims=1)
        y = obs.simulate_measurements(jax.random.PRNGKey(5), x)[..., 0]
        kp2 = np.array([[1.0, 3.0, 3.0]])
        tfd = GaussianProcessTransform.create(2, 1, kp2, point_str="ut")
        tfo = GaussianProcessTransform.create(2, 1, kp2, point_str="ut")
        res = st.ssinf.gaussian_filter(dyn, obs, tfd, tfo, y)
        sm_full, sP_full = st.ssinf.gaussian_smoother(res, rts_full=True)
        _, sm_m, sm_S = make_sqrt_smoother(dyn, obs, tfd, tfo)(y)
        np.testing.assert_allclose(np.asarray(sm_m), np.asarray(sm_full),
                                   rtol=1e-3, atol=1e-3)
        P = np.einsum("ijn,kjn->ikn", np.asarray(sm_S), np.asarray(sm_S))
        np.testing.assert_allclose(P, np.asarray(sP_full), rtol=1e-2, atol=1e-3)
        d = np.asarray(sm_S)[0, 0, :]
        assert (d > 0).all()

    def test_fixed_lag_sqrt_bq_matches_offline(self, ungm):
        from ssmtoybox_tpu.sqrt import (make_fixed_lag_sqrt_smoother,
                                        make_sqrt_smoother)
        dyn, obs, _, y = ungm
        kp = np.array([[1.0, 3.0]])
        tfd, tfo = self._mk_tf("gpq", 1, 1, kp), self._mk_tf("gpq", 1, 1, kp)
        lag, steps = 4, 10
        data = jnp.asarray(y[..., 0][:, :steps])
        init, step = make_fixed_lag_sqrt_smoother(dyn, obs, tfd, tfo, lag=lag,
                                                  donate=False)
        smooth = make_sqrt_smoother(dyn, obs, tfd, tfo)
        state = init()
        for n in range(1, steps + 1):
            state, info, (sm_m, sm_S) = step(state, data[:, n - 1])
            if n >= lag:
                _, sm_all, sS_all = smooth(data[:, :n])
                np.testing.assert_allclose(np.asarray(sm_m),
                                           np.asarray(sm_all[:, n - lag]),
                                           rtol=1e-9, atol=1e-9, err_msg=f"n={n}")

    def test_mo_transform_rejected(self, ungm):
        from ssmtoybox_tpu.bq.transforms import MultiOutputGaussianProcessTransform
        dyn, obs, _, y = ungm
        mo = MultiOutputGaussianProcessTransform.create(1, 1, np.array([[1.0, 3.0]]))
        with pytest.raises(TypeError, match="full-covariance path"):
            make_sqrt_filter(dyn, obs, mo, mo)

    def test_online_sqrt_bq_matches_offline(self, ungm):
        from ssmtoybox_tpu.sqrt import make_online_sqrt_filter
        dyn, obs, _, y = ungm
        kp = np.array([[1.0, 3.0]])
        tfd, tfo = self._mk_tf("gpq", 1, 1, kp), self._mk_tf("gpq", 1, 1, kp)
        srf = SquareRootKalman(dyn, obs, tf_dyn=tfd, tf_obs=tfo)
        off = srf._filter(y[..., 0])
        init, step = make_online_sqrt_filter(dyn, obs, tfd, tfo, donate=False)
        state = init()
        ms = []
        for k in range(y.shape[-2]):
            state, _ = step(state, y[:, k, 0])
            ms.append(np.asarray(state.mean))
        np.testing.assert_allclose(np.stack(ms, -1), np.asarray(off.fi_mean),
                                   atol=1e-10)


class TestSqrtSmoother:
    def test_matches_textbook_rts_ungm(self, ungm):
        from ssmtoybox_tpu.sqrt import make_sqrt_smoother
        dyn, obs, _, y = ungm
        rec = y[..., 0]
        ukf = st.UnscentedKalman(dyn, obs)
        ukf.forward_pass(rec)
        smm, smP = st.ssinf.gaussian_smoother(ukf._result, rts_full=True)
        _, sm_m, sm_S = make_sqrt_smoother(dyn, obs, ukf.tf_dyn, ukf.tf_obs)(rec)
        sm_cov = jnp.einsum("ijn,kjn->ikn", sm_S, sm_S)
        np.testing.assert_allclose(np.asarray(sm_m), np.asarray(smm), atol=1e-10)
        np.testing.assert_allclose(np.asarray(sm_cov), np.asarray(smP), atol=1e-10)

    def test_matches_textbook_rts_reentry_negative_weights(self, reentry):
        """5D UT: the joint factorization takes rank-1 downdates on the
        10-dim joint factor; must still agree with the moment-form RTS."""
        from ssmtoybox_tpu.sqrt import make_sqrt_smoother
        dyn, obs, _, y = reentry
        rec = y[..., 0]
        ukf = st.UnscentedKalman(dyn, obs)
        ukf.forward_pass(rec)
        smm, smP = st.ssinf.gaussian_smoother(ukf._result, rts_full=True)
        _, sm_m, sm_S = make_sqrt_smoother(dyn, obs, ukf.tf_dyn, ukf.tf_obs)(rec)
        sm_cov = jnp.einsum("ijn,kjn->ikn", sm_S, sm_S)
        ms = np.abs(np.asarray(smm)).max()
        Ps = np.abs(np.asarray(smP)).max()
        np.testing.assert_allclose(np.asarray(sm_m) / ms, np.asarray(smm) / ms, atol=1e-12)
        np.testing.assert_allclose(np.asarray(sm_cov) / Ps, np.asarray(smP) / Ps, atol=1e-10)

    def test_f32_smoother_stays_pd(self, reentry):
        from ssmtoybox_tpu.sqrt import make_sqrt_smoother
        dyn, obs, _, y = reentry
        rec = y[..., 0]
        srf = SquareRootKalman(dyn, obs, points="ut")
        _, m32, S32 = make_sqrt_smoother(dyn, obs, srf.tf_dyn, srf.tf_obs,
                                         dtype=jnp.float32)(rec)
        assert m32.dtype == jnp.float32
        d = np.asarray(S32)[np.arange(5), np.arange(5), :]
        assert np.isfinite(np.asarray(m32)).all() and (d > 0).all()

    def test_class_smooth_method(self, ungm):
        dyn, obs, _, y = ungm
        rec = y[..., 0]
        srf = SquareRootKalman(dyn, obs, points="ut")
        sm_m, sm_P = srf.smooth(rec)
        fm, _ = srf.forward_pass(rec)
        # smoothing reduces time-averaged error vs filtering on UNGM
        assert sm_m.shape == fm.shape and np.isfinite(np.asarray(sm_P)).all()


class TestOnlineSqrt:
    def test_streaming_matches_offline(self, ungm):
        from ssmtoybox_tpu.sqrt import make_online_sqrt_filter
        dyn, obs, x, y = ungm
        srf = SquareRootKalman(dyn, obs, points="ut")
        off = srf._filter(y[..., 0])
        init, step = make_online_sqrt_filter(dyn, obs, srf.tf_dyn, srf.tf_obs,
                                             donate=False)
        rec = y[..., 0]
        state = init()
        for k in range(20):
            state, info = step(state, rec[:, k])
            np.testing.assert_allclose(np.asarray(state.mean),
                                       np.asarray(off.fi_mean[:, k]), atol=1e-10)
            np.testing.assert_allclose(np.asarray(state.sqrt),
                                       np.asarray(off.fi_sqrt[..., k]), atol=1e-10)
        assert np.isfinite(np.asarray(info.innov_sqrt)).all()

    def test_dropout_keeps_prediction(self, ungm):
        from ssmtoybox_tpu.sqrt import make_online_sqrt_filter
        dyn, obs, _, y = ungm
        srf = SquareRootKalman(dyn, obs, points="ut")
        init, step = make_online_sqrt_filter(dyn, obs, srf.tf_dyn, srf.tf_obs,
                                             donate=False)
        state, info = step(init(), y[:, 0, 0], observed=False)  # y[:, 0, 0] == y[..., 0][:, 0]
        off = srf._filter(y[..., 0])
        np.testing.assert_allclose(np.asarray(state.mean),
                                   np.asarray(off.pr_mean[:, 0]), atol=1e-12)
        np.testing.assert_allclose(np.asarray(state.sqrt),
                                   np.asarray(off.pr_sqrt[..., 0]), atol=1e-12)

    def test_batched_donated_serving(self, ungm):
        from ssmtoybox_tpu.sqrt import make_online_sqrt_filter
        dyn, obs, _, y = ungm
        srf = SquareRootKalman(dyn, obs, points="ut")
        init, step = make_online_sqrt_filter(dyn, obs, srf.tf_dyn, srf.tf_obs,
                                             batch=True, donate=True,
                                             dtype=jnp.float32)
        state = init(batch_size=4)
        yb = jnp.moveaxis(y, -1, 0)
        for k in range(5):
            state, info = step(state, yb[:, :, k])
        assert state.mean.shape == (4, 1) and state.mean.dtype == jnp.float32
        assert np.isfinite(np.asarray(state.mean)).all()


class TestSqrtValidation:
    def test_rejects_unknown_transform(self, ungm):
        """Single-output BQ transforms are now square-root SUPPORTED
        (TestSqrtBQ); anything that is neither classical nor BQ must still
        fail loudly."""
        dyn, obs, _, _ = ungm
        from ssmtoybox_tpu.mtran import MonteCarloTransform
        mc = MonteCarloTransform.create(1, n=10)
        with pytest.raises(TypeError, match="square-root"):
            make_sqrt_filter(dyn, obs, mc, mc)

    def test_nonadditive_matches_full_covariance(self):
        """Non-additive noise in factor form (augmented blkdiag factor)
        matches the full-covariance UKF on UNGM-NA in f64, and survives f32.

        The init mean is OFFSET from zero: at exactly zero mean the bilinear
        measurement ``z = 0.05 r x^2`` maps every sigma point to 0 and the
        innovation covariance is singular in BOTH paths (the full path then
        rides on rounding luck, matching the reference's behavior) — that
        degenerate case has its own test below."""
        dyn = UNGMNATransition.create(
            GaussRV.create(1, mean=jnp.array([2.0]), cov=1.0),
            GaussRV.create(1, cov=1.0))
        obs = UNGMNAMeasurement.create(GaussRV.create(1, cov=1.0), dim_state=1)
        x = dyn.simulate_discrete(jax.random.PRNGKey(4), steps=60, mc_sims=1)
        y = obs.simulate_measurements(jax.random.PRNGKey(5), x)[..., 0]
        fm, fc = st.UnscentedKalman(dyn, obs).forward_pass(y)
        srk = SquareRootKalman(dyn, obs, points="ut")
        sm, sc = srk.forward_pass(y)
        # the sqrt path carries a 1e-9 innovation-jitter floor (no additive-R
        # floor exists for non-additive models), so parity is ~sqrt(jitter)
        np.testing.assert_allclose(np.asarray(sm), np.asarray(fm),
                                   rtol=1e-3, atol=1e-3)
        m32, P32 = SquareRootKalman(dyn, obs, points="ut",
                                    dtype=jnp.float32).forward_pass(y)
        assert np.isfinite(np.asarray(m32)).all()
        assert np.isfinite(np.asarray(P32)).all()

    def test_nonadditive_degenerate_prior_stays_finite(self):
        """At a zero prior mean the bilinear measurement makes the innovation
        covariance EXACTLY singular; the sqrt path's jitter floor must keep
        the recursion finite in both precisions (a 0/0 would NaN the gain)."""
        dyn = UNGMNATransition.create(GaussRV.create(1, cov=1.0),
                                      GaussRV.create(1, cov=10.0))
        obs = UNGMNAMeasurement.create(GaussRV.create(1, cov=1.0), dim_state=1)
        x = dyn.simulate_discrete(jax.random.PRNGKey(4), steps=60, mc_sims=1)
        y = obs.simulate_measurements(jax.random.PRNGKey(5), x)[..., 0]
        for dt in (None, jnp.float32):
            m, P = SquareRootKalman(dyn, obs, points="ut", dtype=dt).forward_pass(y)
            assert np.isfinite(np.asarray(m)).all(), dt
            assert np.isfinite(np.asarray(P)).all(), dt

    def test_rejects_bad_points(self, ungm):
        dyn, obs, _, _ = ungm
        with pytest.raises(ValueError, match="unsupported point set"):
            SquareRootKalman(dyn, obs, points="bogus")

    def test_smoother_rejects_fs_rule(self, ungm):
        """The FS Student rule reconstructs dof/(dof-2)*I, not I, so the
        joint-factorization smoother would silently inflate every smoothed
        covariance — it must refuse (the filter itself still works: its
        factors mirror the full-covariance filter with the same rule)."""
        dyn, obs, _, y = ungm
        alg = SquareRootKalman(dyn, obs, points="fs")
        alg.forward_pass(y[..., 0])              # filter path is fine
        with pytest.raises(TypeError, match="reconstruct identity"):
            alg.smooth(y[..., 0])

    def test_batched_init_requires_batch_size(self, ungm):
        dyn, obs, _, _ = ungm
        tf = st.UnscentedTransform(1)
        from ssmtoybox_tpu.sqrt import make_online_sqrt_filter
        init, _ = make_online_sqrt_filter(dyn, obs, tf, tf, batch=True)
        with pytest.raises(ValueError, match="batch_size"):
            init()
        from ssmtoybox_tpu.online import make_online_filter
        init2, _ = make_online_filter(dyn, obs, tf, tf, batch=True)
        with pytest.raises(ValueError, match="batch_size"):
            init2()


class TestReviewRegressions:
    def test_small_matmul_unbatched_square_right_with_matching_batch(self, unrolled_linalg):
        """Regression: a batched (B, M, K) left against an unbatched (K, J)
        right with B == K used to be misread as B vectors, producing
        clamped-index garbage of the wrong shape."""
        from ssmtoybox_tpu.utils.linalg import small_matmul
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.standard_normal((3, 4, 3)))
        b = jnp.asarray(rng.standard_normal((3, 2)))
        out = small_matmul(a, b)
        assert out.shape == (3, 4, 2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(a) @ np.asarray(b),
                                   rtol=1e-12, atol=1e-12)

    def test_kl_divergence_compat_and_corrected(self):
        """Default reproduces the reference's flipped log-det (can be
        negative); compat_flipped_logdet=False gives the true non-negative
        KL.  The symmetrized form is identical either way."""
        from ssmtoybox_tpu.utils.metrics import (kl_divergence,
                                                 symmetrized_kl_divergence)
        m0 = jnp.zeros(1); c0 = jnp.eye(1)
        m1 = jnp.zeros(1); c1 = 4.0 * jnp.eye(1)
        ref_style = float(kl_divergence(m0, c0, m1, c1))
        true_kl = float(kl_divergence(m0, c0, m1, c1, compat_flipped_logdet=False))
        # true KL(N(0,1) || N(0,4)) = 0.5*(1/4 - 1 + ln 4)
        np.testing.assert_allclose(true_kl, 0.5 * (0.25 - 1.0 + np.log(4.0)),
                                   rtol=1e-12)
        assert ref_style < 0 < true_kl
        np.testing.assert_allclose(
            float(symmetrized_kl_divergence(m0, c0, m1, c1)),
            0.5 * (ref_style + float(kl_divergence(m1, c1, m0, c0))), rtol=1e-12)

    def test_rmse_axis_semantics(self):
        from ssmtoybox_tpu.utils.metrics import rmse
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((2, 5, 3)))   # (D, N, M)
        m = jnp.asarray(rng.standard_normal((2, 5, 3)))
        per_run = rmse(x, m, axis=0)
        assert per_run.shape == (3,)
        expected = np.sqrt(np.mean(np.sum((np.asarray(x) - np.asarray(m)) ** 2,
                                          axis=0), axis=0))
        np.testing.assert_allclose(np.asarray(per_run), expected, rtol=1e-12)
        assert rmse(x, m).shape == ()

    def test_n_sum_k_complete(self):
        """The reference recursion drops tuples for n>=3, k>=3 (parity kept
        in n_sum_k, documented); n_sum_k_complete enumerates all of them."""
        import itertools
        from ssmtoybox_tpu.utils.combin import n_sum_k, n_sum_k_complete
        assert n_sum_k(3, 3).shape[1] == 9          # reference parity: 9 of 10
        full = n_sum_k_complete(3, 3)
        assert full.shape == (3, 10)
        got = {tuple(c) for c in np.asarray(full).T}
        want = {t for t in itertools.product(range(4), repeat=3) if sum(t) == 3}
        assert got == want

    def test_classical_transform_has_no_dense_wc_leaf(self):
        """Classical rules carry only the diagonal in the pytree; the dense
        Wc (reference attribute) is materialized on demand."""
        tf = st.UnscentedTransform(3)
        assert tf.Wc_dense is None
        leaves = jax.tree_util.tree_leaves(tf)
        assert all(l.ndim < 2 or l.shape == tf.unit_sp.shape for l in leaves)
        W = np.asarray(tf.Wc)
        np.testing.assert_allclose(W, np.diag(np.asarray(tf.wc_diag)), rtol=0, atol=0)


class TestFixedLagSqrt:
    def test_matches_offline_sqrt_rts(self, ungm):
        """At each step n >= lag, the emitted factor-form estimate equals the
        offline square-root RTS on the truncated record."""
        from ssmtoybox_tpu.sqrt import (make_fixed_lag_sqrt_smoother,
                                        make_sqrt_smoother)
        dyn, obs, x, y = ungm
        tf = st.UnscentedTransform(1)
        lag, steps = 4, 12
        data = jnp.asarray(y[..., 0][:, :steps])
        init, step = make_fixed_lag_sqrt_smoother(dyn, obs, tf, tf, lag=lag,
                                                  donate=False)
        smooth = make_sqrt_smoother(dyn, obs, tf, tf)
        state = init()
        for n in range(1, steps + 1):
            state, info, (sm_m, sm_S) = step(state, data[:, n - 1])
            if n >= lag:
                _, sm_all, sS_all = smooth(data[:, :n])
                np.testing.assert_allclose(np.asarray(sm_m),
                                           np.asarray(sm_all[:, n - lag]),
                                           rtol=1e-9, atol=1e-9, err_msg=f"n={n}")
                P_lag = np.asarray(sm_S) @ np.asarray(sm_S).T
                P_ref = (np.asarray(sS_all[:, :, n - lag]) @
                         np.asarray(sS_all[:, :, n - lag]).T)
                np.testing.assert_allclose(P_lag, P_ref, rtol=1e-9, atol=1e-9)

    def test_f32_stays_pd_with_dropouts(self, ungm):
        from ssmtoybox_tpu.sqrt import make_fixed_lag_sqrt_smoother
        dyn, obs, x, y = ungm
        tf = st.UnscentedTransform(1)
        init, step = make_fixed_lag_sqrt_smoother(dyn, obs, tf, tf, lag=5,
                                                  donate=False, dtype=jnp.float32)
        state = init()
        data = jnp.asarray(y[..., 0])
        for n in range(min(20, data.shape[-1])):
            state, info, (sm_m, sm_S) = step(state, data[:, n],
                                             observed=(n % 4 != 2))
        assert sm_m.dtype == jnp.float32
        assert bool(jnp.isfinite(sm_m).all())
        assert float(sm_S[0, 0]) > 0

    def test_guards(self, ungm):
        from ssmtoybox_tpu.sqrt import make_fixed_lag_sqrt_smoother
        dyn, obs, _, _ = ungm
        tf = st.UnscentedTransform(1)
        with pytest.raises(ValueError, match="lag >= 2"):
            make_fixed_lag_sqrt_smoother(dyn, obs, tf, tf, lag=1)
        init, _ = make_fixed_lag_sqrt_smoother(dyn, obs, tf, tf, lag=3, batch=True)
        with pytest.raises(ValueError, match="batch_size"):
            init()


# ---------------------------------------------------------------------------
# Square-root STUDENTIAN filtering
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ungm_student():
    from ssmtoybox_tpu.utils import StudentRV
    dyn = UNGMTransition.create(StudentRV.create(1, dof=4.0),
                                StudentRV.create(1, scale=10.0, dof=4.0))
    obs = UNGMMeasurement.create(StudentRV.create(1, scale=0.01, dof=4.0),
                                 dim_state=1)
    x = dyn.simulate_discrete(jax.random.PRNGKey(0), steps=80, mc_sims=1)
    y = obs.simulate_measurements(jax.random.PRNGKey(1), x)[..., 0]
    return dyn, obs, x, y


class TestSqrtStudent:
    """Factor-form Student filter vs ssinf.studentian_filter (the reference
    recursion at ``ssinf.py:634-736``): identical math, Cholesky factors of
    the scale matrices instead of the matrices."""

    @staticmethod
    def _fs(dim, degree=3):
        from ssmtoybox_tpu.mtran import FullySymmetricStudentTransform
        return FullySymmetricStudentTransform(dim, degree, None, 4.0)

    @pytest.mark.parametrize("fixed_dof", [True, False])
    def test_matches_full_fs(self, ungm_student, fixed_dof):
        from ssmtoybox_tpu.sqrt import make_sqrt_studentian_filter
        from ssmtoybox_tpu.ssinf import studentian_filter
        dyn, obs, _, y = ungm_student
        td, to = self._fs(dyn.dim_in), self._fs(obs.dim_in)
        full = studentian_filter(dyn, obs, td, to, y, dof=4.0, fixed_dof=fixed_dof)
        res = make_sqrt_studentian_filter(dyn, obs, td, to, dof=4.0,
                                          fixed_dof=fixed_dof)(y)
        np.testing.assert_allclose(np.asarray(res.fi_mean),
                                   np.asarray(full.fi_mean), atol=1e-9)
        smat = jnp.einsum("ijn,kjn->ikn", res.fi_smat_sqrt, res.fi_smat_sqrt)
        np.testing.assert_allclose(np.asarray(smat), np.asarray(full.fi_smat),
                                   rtol=1e-8, atol=1e-10)
        cov = jnp.einsum("ijn,kjn->ikn", res.fi_cov_sqrt, res.fi_cov_sqrt)
        np.testing.assert_allclose(np.asarray(cov), np.asarray(full.fi_cov),
                                   rtol=1e-8, atol=1e-10)
        prs = jnp.einsum("ijn,kjn->ikn", res.pr_smat_sqrt, res.pr_smat_sqrt)
        np.testing.assert_allclose(np.asarray(prs), np.asarray(full.pr_smat),
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_array_equal(np.asarray(res.dof_fi),
                                      np.asarray(full.dof_fi))

    @pytest.mark.slow
    def test_matches_full_tpq(self, ungm_student):
        """TPQ transforms: the data-dependent EMV scale reads the raw
        function values inside the factorization (out_sqrt_scale applies
        AFTER emv_cols), matching StudentProcessStudent's full path."""
        from ssmtoybox_tpu.bq.transforms import StudentTProcessTransform
        from ssmtoybox_tpu.sqrt import make_sqrt_studentian_filter
        from ssmtoybox_tpu.ssinf import studentian_filter
        dyn, obs, _, y = ungm_student
        y = y[:, :50]
        kp = np.array([[1.0, 1.0]])
        mc = dict(num_samples=20_000, num_batches=10)
        td = StudentTProcessTransform.create(dyn.dim_in, 1, kp, "rbf-student",
                                             "fs", dict(dof=4.0), nu=4.0, mc_opts=mc)
        to = StudentTProcessTransform.create(obs.dim_in, 1, kp, "rbf-student",
                                             "fs", dict(dof=4.0), nu=4.0, mc_opts=mc)
        full = studentian_filter(dyn, obs, td, to, y, dof=4.0, fixed_dof=True)
        res = make_sqrt_studentian_filter(dyn, obs, td, to)(y)
        np.testing.assert_allclose(np.asarray(res.fi_mean),
                                   np.asarray(full.fi_mean), atol=1e-9)
        smat = jnp.einsum("ijn,kjn->ikn", res.fi_smat_sqrt, res.fi_smat_sqrt)
        np.testing.assert_allclose(np.asarray(smat), np.asarray(full.fi_smat),
                                   rtol=1e-8, atol=1e-10)

    def test_nonadditive_measurement(self):
        """Non-additive measurement noise in factor form.  Degree-5 points:
        the deg-3 rule varies one coordinate at a time, which gives the
        bilinear ``z = 0.05 r x^2`` an exactly ZERO gain — the filter then
        free-runs and the per-step ``(nu + d^T d)/(nu + dim_y)`` rescale
        compounds chaotically in both paths (no information ever enters), so
        only deg-5 is a meaningful parity scenario."""
        from ssmtoybox_tpu.utils import StudentRV
        from ssmtoybox_tpu.sqrt import make_sqrt_studentian_filter
        from ssmtoybox_tpu.ssinf import studentian_filter
        dyn = UNGMTransition.create(
            StudentRV.create(1, mean=jnp.array([2.0]), scale=1.0, dof=4.0),
            StudentRV.create(1, scale=1.0, dof=4.0))
        obs = UNGMNAMeasurement.create(StudentRV.create(1, scale=1.0, dof=4.0),
                                       dim_state=1)
        td, to = self._fs(dyn.dim_in, 5), self._fs(obs.dim_in, 5)
        x = dyn.simulate_discrete(jax.random.PRNGKey(2), steps=60, mc_sims=1)
        y = obs.simulate_measurements(jax.random.PRNGKey(3), x)[..., 0]
        full = studentian_filter(dyn, obs, td, to, y, dof=4.0, fixed_dof=True)
        res = make_sqrt_studentian_filter(dyn, obs, td, to)(y)
        np.testing.assert_allclose(np.asarray(res.fi_mean),
                                   np.asarray(full.fi_mean), rtol=1e-3, atol=1e-3)
        smat = jnp.einsum("ijn,kjn->ikn", res.fi_smat_sqrt, res.fi_smat_sqrt)
        np.testing.assert_allclose(np.asarray(smat), np.asarray(full.fi_smat),
                                   rtol=1e-3, atol=1e-3)

    def test_f32_stays_finite_pd(self, ungm_student):
        from ssmtoybox_tpu.sqrt import make_sqrt_studentian_filter
        dyn, obs, _, y = ungm_student
        td, to = self._fs(dyn.dim_in), self._fs(obs.dim_in)
        res = make_sqrt_studentian_filter(dyn, obs, td, to,
                                          dtype=jnp.float32)(y)
        assert res.fi_mean.dtype == jnp.float32
        assert bool(jnp.all(jnp.isfinite(res.fi_mean)))
        assert bool(jnp.all(jnp.isfinite(res.fi_smat_sqrt)))
        # factors reconstruct PD scale matrices (diagonal bounded away from 0)
        smat = jnp.einsum("ijn,kjn->ikn", res.fi_smat_sqrt, res.fi_smat_sqrt)
        assert float(jnp.min(smat[0, 0])) > 0.0

    def test_streaming_matches_offline(self, ungm_student):
        from ssmtoybox_tpu.sqrt import (make_sqrt_studentian_filter,
                                        make_online_sqrt_student_filter)
        dyn, obs, _, y = ungm_student
        td, to = self._fs(dyn.dim_in), self._fs(obs.dim_in)
        off = make_sqrt_studentian_filter(dyn, obs, td, to)(y)
        init, step = make_online_sqrt_student_filter(dyn, obs, td, to)
        s = init()
        means, smats = [], []
        for k in range(y.shape[-1]):
            s, info = step(s, y[:, k])
            means.append(np.asarray(s.mean))
            smats.append(np.asarray(s.sqrt))
        np.testing.assert_allclose(np.stack(means, -1), np.asarray(off.fi_mean),
                                   rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(np.stack(smats, -1),
                                   np.asarray(off.fi_smat_sqrt),
                                   rtol=1e-12, atol=1e-12)
        assert float(s.dof) == float(off.dof_fi[-1])

    def test_streaming_dropout_keeps_prediction(self, ungm_student):
        """A dropped measurement keeps the predicted mean/scale and does NOT
        advance the dof (no information arrived)."""
        from ssmtoybox_tpu.sqrt import make_online_sqrt_student_filter
        dyn, obs, _, y = ungm_student
        td, to = self._fs(dyn.dim_in), self._fs(obs.dim_in)
        init, step = make_online_sqrt_student_filter(dyn, obs, td, to)
        s = init()
        s, _ = step(s, y[:, 0])
        dof_before = float(s.dof)
        s2, info = step(s, y[:, 1], observed=False)
        assert float(s2.dof) == dof_before
        assert bool(jnp.all(jnp.isfinite(s2.mean)))

    def test_class_api_matches_full_filter(self, ungm_student):
        """SquareRootStudent mirrors FullySymmetricStudent's constructor and
        reports the same quirky scale-derived 'covariance' (reference FIXME
        ssinf.py:726-727)."""
        dyn, obs, _, y = ungm_student
        alg_full = st.FullySymmetricStudent(dyn, obs, degree=3, dof=4.0)
        fm, fc = alg_full.forward_pass(y)
        alg = st.SquareRootStudent(dyn, obs, degree=3, dof=4.0)
        sm, sc = alg.forward_pass(y)
        np.testing.assert_allclose(np.asarray(sm), np.asarray(fm), atol=1e-9)
        np.testing.assert_allclose(np.asarray(sc), np.asarray(fc),
                                   rtol=1e-8, atol=1e-10)
        alg.reset()
        assert alg._result is None

    def test_rejects_mismatched_transform_args(self, ungm_student):
        dyn, obs, _, _ = ungm_student
        with pytest.raises(ValueError, match="both tf_dyn and tf_obs"):
            st.SquareRootStudent(dyn, obs, tf_dyn=self._fs(dyn.dim_in))


class TestSqrtStudentSmoother:
    """Square-root Student RTS vs ssinf.studentian_smoother (rts_full):
    the joint factorization with the (1 - scale*c) conditional correction."""

    @staticmethod
    def _fs(dim, degree=3):
        from ssmtoybox_tpu.mtran import FullySymmetricStudentTransform
        return FullySymmetricStudentTransform(dim, degree, None, 4.0)

    @pytest.mark.parametrize("degree,dof", [(3, 4.0), (3, 6.0), (5, 4.0)])
    def test_matches_full_fs(self, ungm_student, degree, dof):
        """deg-3/dof-6 exercises scale*c = 1 exactly (dof_pr capped at the
        noise dofs); deg-5 exercises the larger joint."""
        from ssmtoybox_tpu.sqrt import make_sqrt_studentian_smoother
        from ssmtoybox_tpu.ssinf import studentian_filter, studentian_smoother
        dyn, obs, _, y = ungm_student
        td, to = self._fs(dyn.dim_in, degree), self._fs(obs.dim_in, degree)
        full = studentian_filter(dyn, obs, td, to, y, dof=dof, fixed_dof=True)
        sm_m_full, sm_S_full = studentian_smoother(full, rts_full=True)
        res, sm_m, sm_S = make_sqrt_studentian_smoother(
            dyn, obs, td, to, dof=dof, fixed_dof=True)(y)
        np.testing.assert_allclose(np.asarray(sm_m), np.asarray(sm_m_full),
                                   atol=1e-9)
        smat = jnp.einsum("ijn,kjn->ikn", sm_S, sm_S)
        np.testing.assert_allclose(np.asarray(smat), np.asarray(sm_S_full),
                                   rtol=1e-8, atol=1e-10)
        # the embedded forward pass is the filter itself
        fi = studentian_filter(dyn, obs, td, to, y, dof=dof, fixed_dof=True)
        np.testing.assert_allclose(np.asarray(res.fi_mean),
                                   np.asarray(fi.fi_mean), atol=1e-9)

    @pytest.mark.slow
    def test_matches_full_tpq(self, ungm_student):
        """BQ (TPQ) dynamics: the kappa-generalized joint columns — the
        Student-weighted kernel's weighting covariance is kappa*I with
        kappa = dof/(dof-2), and the Student filter's predictive scale
        compensates it exactly (scale*kappa = 1 for matched dofs)."""
        from ssmtoybox_tpu.bq.transforms import StudentTProcessTransform
        from ssmtoybox_tpu.sqrt import make_sqrt_studentian_smoother
        from ssmtoybox_tpu.ssinf import studentian_filter, studentian_smoother
        dyn, obs, _, y = ungm_student
        y = y[:, :50]
        kp = np.array([[1.0, 1.0]])
        mc = dict(num_samples=20_000, num_batches=10)
        td = StudentTProcessTransform.create(dyn.dim_in, 1, kp, "rbf-student",
                                             "fs", dict(dof=4.0), nu=4.0, mc_opts=mc)
        to = StudentTProcessTransform.create(obs.dim_in, 1, kp, "rbf-student",
                                             "fs", dict(dof=4.0), nu=4.0, mc_opts=mc)
        full = studentian_filter(dyn, obs, td, to, y, dof=4.0, fixed_dof=True)
        sm_m_full, sm_S_full = studentian_smoother(full, rts_full=True)
        res, sm_m, sm_S = make_sqrt_studentian_smoother(dyn, obs, td, to)(y)
        np.testing.assert_allclose(np.asarray(sm_m), np.asarray(sm_m_full),
                                   atol=1e-9)
        smat = jnp.einsum("ijn,kjn->ikn", sm_S, sm_S)
        np.testing.assert_allclose(np.asarray(smat), np.asarray(sm_S_full),
                                   rtol=1e-8, atol=1e-10)
        # f32 stays finite/PD
        _, m32, S32 = make_sqrt_studentian_smoother(dyn, obs, td, to,
                                                    dtype=jnp.float32)(y)
        assert m32.dtype == jnp.float32
        assert bool(jnp.all(jnp.isfinite(m32)))
        assert bool(jnp.all(jnp.isfinite(S32)))

    def test_rejects_mismatched_dofs(self, ungm_student):
        """scale*c > 1 (filter dof heavier than the rule's): the conditional
        covariance is indefinite, no factor exists — labeled refusal instead
        of the NaNs a silent attempt produces."""
        from ssmtoybox_tpu.sqrt import make_sqrt_studentian_smoother
        dyn, obs, _, _ = ungm_student
        td, to = self._fs(dyn.dim_in), self._fs(obs.dim_in)
        with pytest.raises(TypeError, match="scale\\*c <= 1"):
            make_sqrt_studentian_smoother(dyn, obs, td, to, dof=6.0,
                                          fixed_dof=False)

    def test_gaussian_smoother_rejects_student_kernel(self, ungm):
        """The GAUSSIAN square-root smoother has no predictive scale to
        compensate a Student-weighted kernel's kappa > 1 — it must refuse
        (the silent eigh-clip alternative computes a wrong joint)."""
        from ssmtoybox_tpu.bq.transforms import GaussianProcessTransform
        from ssmtoybox_tpu.sqrt import make_sqrt_smoother
        dyn, obs, _, _ = ungm
        kp = np.array([[1.0, 1.0]])
        tf = GaussianProcessTransform.create(1, 1, kp, "rbf-student", "fs",
                                             dict(dof=4.0), num_samples=20_000,
                                             num_batches=10)
        with pytest.raises(TypeError, match="Student-weighted"):
            make_sqrt_smoother(dyn, obs, tf, tf)

    def test_class_smooth_method(self, ungm_student):
        from ssmtoybox_tpu.ssinf import studentian_filter, studentian_smoother
        dyn, obs, _, y = ungm_student
        td = self._fs(dyn.dim_in)
        alg = st.SquareRootStudent(dyn, obs, degree=3, dof=4.0)
        sm_m, sm_S = alg.smooth(y)
        full = studentian_filter(dyn, obs, alg.tf_dyn, alg.tf_obs, y,
                                 dof=4.0, fixed_dof=True)
        sm_m_full, sm_S_full = studentian_smoother(full, rts_full=True)
        np.testing.assert_allclose(np.asarray(sm_m), np.asarray(sm_m_full),
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(sm_S), np.asarray(sm_S_full),
                                   rtol=1e-8, atol=1e-10)

    def test_fixed_lag_matches_offline(self, ungm_student):
        """Each emitted lagged estimate equals the offline square-root
        Student RTS on the truncated record (means and SCALE factors)."""
        from ssmtoybox_tpu.sqrt import (make_fixed_lag_sqrt_student_smoother,
                                        make_sqrt_studentian_smoother)
        dyn, obs, _, y = ungm_student
        td, to = self._fs(dyn.dim_in), self._fs(obs.dim_in)
        lag, steps = 4, 10
        data = jnp.asarray(y[:, :steps])
        init, step = make_fixed_lag_sqrt_student_smoother(
            dyn, obs, td, to, lag=lag, donate=False)
        smooth = make_sqrt_studentian_smoother(dyn, obs, td, to)
        state = init()
        for n in range(1, steps + 1):
            state, info, (sm_m, sm_S) = step(state, data[:, n - 1])
            if n >= lag:
                _, sm_all, sS_all = smooth(data[:, :n])
                np.testing.assert_allclose(np.asarray(sm_m),
                                           np.asarray(sm_all[:, n - lag]),
                                           rtol=1e-9, atol=1e-9, err_msg=f"n={n}")
                cov = sm_S @ sm_S.T
                cov_all = sS_all[:, :, n - lag] @ sS_all[:, :, n - lag].T
                np.testing.assert_allclose(np.asarray(cov), np.asarray(cov_all),
                                           rtol=1e-8, atol=1e-10, err_msg=f"n={n}")

    def test_fixed_lag_rejects_lag_one(self, ungm_student):
        from ssmtoybox_tpu.sqrt import make_fixed_lag_sqrt_student_smoother
        dyn, obs, _, _ = ungm_student
        td, to = self._fs(dyn.dim_in), self._fs(obs.dim_in)
        with pytest.raises(ValueError, match="lag >= 2"):
            make_fixed_lag_sqrt_student_smoother(dyn, obs, td, to, lag=1)

    def test_shape_guards(self, ungm_student):
        """Class-API entry points reject swapped record/batch shapes instead
        of silently vmapping over the wrong axis (mirrors
        StateSpaceInference's guards, ssinf.py:569-574)."""
        dyn, obs, _, y = ungm_student
        alg = st.SquareRootStudent(dyn, obs, degree=3, dof=4.0)
        with pytest.raises(ValueError, match="forward_pass_batch"):
            alg.forward_pass(y[None])                    # batch into single
        with pytest.raises(ValueError, match="single trajectory"):
            alg.forward_pass_batch(y)                    # single into batch
        with pytest.raises(ValueError, match="forward_pass_batch"):
            alg.smooth(y[None])
        dyn_g = UNGMTransition.create(GaussRV.create(1, cov=1.0),
                                      GaussRV.create(1, cov=10.0))
        obs_g = UNGMMeasurement.create(GaussRV.create(1, cov=1.0), dim_state=1)
        srk = SquareRootKalman(dyn_g, obs_g, points="ut")
        with pytest.raises(ValueError, match="forward_pass_batch"):
            srk.forward_pass(np.zeros((3, 1, 10)))
        with pytest.raises(ValueError, match="single trajectory"):
            srk.forward_pass_batch(np.zeros((1, 10)))
