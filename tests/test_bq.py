"""Unit tests for the BQ layer: kernels, models, transforms, GPQ+D.

Adopts the reference test strategy (SURVEY §4): Monte-Carlo verification of
closed-form kernel expectations (``test_bqkern.py:142-173``), PD/symmetry
invariants, NLML gradient checks (``test_bqmod.py:88-96``), and BSQ
degenerate-case equivalence to classical rules (``test_bqmod.py:368-475``).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ssmtoybox_tpu import points as pts
from ssmtoybox_tpu.bq.kernels import RBFGauss, RBFStudent, RQ
from ssmtoybox_tpu.bq.models import (
    BayesSardModel, GaussianProcessModel, StudentTProcessModel,
    GaussianProcessMO, StudentTProcessMO)
from ssmtoybox_tpu.bq.transforms import (
    GaussianProcessTransform, BayesSardTransform, StudentTProcessTransform,
    MultiOutputGaussianProcessTransform)
from ssmtoybox_tpu.bq.gpqd import RBFGaussDer, GaussianProcessDerModel, GaussianProcessDerTransform


@pytest.fixture(scope="module")
def rbf_setup():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 6))
    par = jnp.asarray(np.array([[1.3, 0.8, 1.4]]))
    return RBFGauss.create(2, par), par, x


def _mc_expectation(fn, dim, num=150_000, seed=0):
    """Monte-Carlo ground truth for E_{x~N(0,I)}[fn(x)] (cf. test_bqkern.py:142-173)."""
    key = jax.random.PRNGKey(seed)
    xs = jax.random.normal(key, (num, dim))
    return jnp.mean(jax.vmap(fn)(xs), axis=0)


class TestRBFExpectations:
    def test_q_vs_mc(self, rbf_setup):
        kern, par, x = rbf_setup
        q = kern.exp_x_kx(par, x)
        q_mc = _mc_expectation(lambda s: kern.eval(par, s[:, None], x, scaling=False)[0], 2)
        np.testing.assert_allclose(q, q_mc, atol=5e-3)

    def test_R_vs_mc(self, rbf_setup):
        kern, par, x = rbf_setup
        R = kern.exp_x_xkx(par, x)
        R_mc = _mc_expectation(
            lambda s: s[:, None] * kern.eval(par, s[:, None], x, scaling=False)[0][None, :], 2)
        np.testing.assert_allclose(R, R_mc, atol=5e-3)

    def test_Q_vs_mc(self, rbf_setup):
        kern, par, x = rbf_setup
        Q = kern.exp_x_kxkx(par, par, x)
        Q_mc = _mc_expectation(
            lambda s: jnp.outer(kern.eval(par, s[:, None], x, scaling=False)[0],
                                kern.eval(par, s[:, None], x, scaling=False)[0]), 2)
        np.testing.assert_allclose(Q, Q_mc, atol=5e-3)

    def test_kxy_vs_mc(self, rbf_setup):
        kern, par, x = rbf_setup
        kxy = kern.exp_xy_kxy(par)
        key1, key2 = jax.random.split(jax.random.PRNGKey(1))
        a = jax.random.normal(key1, (200_000, 2))
        b = jax.random.normal(key2, (200_000, 2))
        mc = jnp.mean(jax.vmap(lambda u, v: kern.eval(par, u[:, None], v[:, None])[0, 0])(a, b))
        np.testing.assert_allclose(kxy, mc, atol=3e-3)

    def test_gram_pd_and_symmetric(self, rbf_setup):
        kern, par, x = rbf_setup
        K = kern.eval(par, x)
        np.testing.assert_allclose(K, K.T, atol=1e-14)
        assert bool(jnp.all(jnp.linalg.eigvalsh(K + 1e-8 * jnp.eye(6)) > 0))


class TestGPModel:
    def test_weight_shapes(self):
        par = np.array([[1.0, 1.0, 1.0, 1.0]])
        gp = GaussianProcessModel.create(3, par, "rbf", "ut")
        w = gp.bq_weights()
        n = 7
        assert w.wm.shape == (n,) and w.Wc.shape == (n, n) and w.Wcc.shape == (3, n)

    def test_weights_scale_invariant(self):
        """BQ weights do not depend on the kernel scaling parameter
        (``test_bqmtran.py:40-46``)."""
        x_par1 = np.array([[1.0, 2.0]])
        x_par2 = np.array([[5.0, 2.0]])
        w1 = GaussianProcessModel.create(1, x_par1, "rbf", "ut").bq_weights()
        w2 = GaussianProcessModel.create(1, x_par2, "rbf", "ut").bq_weights()
        np.testing.assert_allclose(w1.wm, w2.wm, rtol=1e-12)
        np.testing.assert_allclose(w1.Wc, w2.Wc, rtol=1e-12)

    def test_emv_ivar_nonnegative(self):
        par = np.array([[1.0, 3.0]])
        w = GaussianProcessModel.create(1, par, "rbf", "ut").bq_weights()
        assert float(w.model_var) >= 0.0
        assert float(w.integral_var) >= 0.0

    def test_nlml_grad_matches_fd(self):
        """jax.grad of the NLML vs central finite differences
        (replaces ``check_grad``, ``test_bqmod.py:88-96``)."""
        par = np.array([[1.0, 1.0]])
        gp = GaussianProcessModel.create(1, par, "rbf", "ut")
        x_obs = gp.points
        fcn_obs = jnp.sin(x_obs).T        # (N, 1)
        jitter = 1e-8 * jnp.eye(3)
        f = lambda lp: gp.neg_log_marginal_likelihood(lp, fcn_obs, x_obs, jitter)
        lp0 = jnp.asarray(np.array([0.1, -0.2]))
        g = jax.grad(f)(lp0)
        eps = 1e-6
        for i in range(2):
            e = jnp.zeros(2).at[i].set(eps)
            fd = (f(lp0 + e) - f(lp0 - e)) / (2 * eps)
            np.testing.assert_allclose(g[i], fd, rtol=1e-5)

    def test_predict_interpolates(self):
        par = np.array([[1.0, 1.0]])
        gp = GaussianProcessModel.create(1, par, "rbf", "ut")
        fcn_obs = jnp.sin(gp.points).reshape(1, -1)
        mean, var = gp.predict(gp.points, fcn_obs)
        np.testing.assert_allclose(mean, jnp.sin(gp.points)[0], atol=1e-5)
        assert bool(jnp.all(var < 1e-5))

    def test_optimize_decreases_nlml(self):
        par = np.array([[1.0, 1.0]])
        gp = GaussianProcessModel.create(1, par, "rbf", "gh", point_par={"degree": 7})
        fcn_obs = np.sin(np.asarray(gp.points)).T
        res = gp.optimize(np.zeros(2), fcn_obs, gp.points)
        assert res.fun <= float(gp.neg_log_marginal_likelihood(
            jnp.zeros(2), jnp.asarray(fcn_obs), gp.points, 1e-8 * jnp.eye(7)))


class TestBSQ:
    def test_unisolvent_reproduces_gh_weights(self):
        """BSQ with the 1-D degree-p basis on GH points reproduces GH weights
        (``test_bqmod.py:368-475``)."""
        deg = 5
        par = np.array([[1.0, 0.6]])
        mulind = np.atleast_2d(np.arange(deg))
        bs = BayesSardModel.create(1, par, multi_ind=mulind, point_str="gh",
                                   point_par={"degree": deg})
        w = bs.bq_weights()
        np.testing.assert_allclose(w.wm, pts.gh_weights(1, deg), atol=1e-7)

    def test_polynomial_expectations_vs_mc(self):
        """Closed-form E[k(x)p(x)^T] (corrected formula) vs Monte Carlo
        (``bqmod.py:799-816``)."""
        par = np.array([[1.0, 0.7, 1.2]])
        bs = BayesSardModel.create(2, par, multi_ind=2, point_str="ut",
                                   compat_kxpx_ell_squared=False)
        from ssmtoybox_tpu.bq.models import _exp_x_kxpx
        closed = _exp_x_kxpx(jnp.asarray([0.7, 1.2]), bs.mulind_np, bs.points)
        mc = bs.mc_exp_x_kxpx(jax.random.PRNGKey(0), num_iter=10)
        np.testing.assert_allclose(closed, mc, atol=5e-3)

    def test_xpx_moments_degree5_vs_mc(self):
        """E[x p(x)^T] closed form for odd degrees >= 5: E[x^6] = 5!! = 15,
        E[x^8] = 7!! = 105 — the reference's formula returns alpha_d (5, 7)
        instead of alpha_d!! (``bqmod.py:697``), coincidentally right only
        for degrees 1 and 3 (see docs/parity.md)."""
        from ssmtoybox_tpu.bq.models import _exp_x_xpx
        mi = np.array([[1, 3, 5, 7], [0, 2, 0, 0]])
        got = _exp_x_xpx(mi)
        np.testing.assert_allclose(got[0], [1.0, 3.0, 15.0, 105.0], rtol=0)
        np.testing.assert_allclose(got[1], 0.0, rtol=0)

    def test_compat_flag_changes_emv_only(self):
        par = np.array([[2.0, 0.5]])
        mul = np.array([[0, 1, 2]])
        w_compat = BayesSardModel.create(1, par, multi_ind=mul).bq_weights()
        w_fixed = BayesSardModel.create(1, par, multi_ind=mul,
                                        compat_kxpx_ell_squared=False).bq_weights()
        np.testing.assert_allclose(w_compat.wm, w_fixed.wm, rtol=1e-12)
        np.testing.assert_allclose(w_compat.Wc, w_fixed.Wc, rtol=1e-12)
        assert not np.isclose(float(w_compat.model_var), float(w_fixed.model_var))


class TestTPModel:
    def test_tp_scales_gp_variance(self):
        par = np.array([[1.0, 2.0]])
        tp = StudentTProcessModel.create(1, par, "rbf", "ut", nu=5.0)
        gp = GaussianProcessModel.create(1, par, "rbf", "ut")
        fcn_obs = jnp.sin(tp.points).reshape(1, -1)
        m_tp, v_tp = tp.predict(tp.points, fcn_obs)
        m_gp, v_gp = gp.predict(gp.points, fcn_obs)
        np.testing.assert_allclose(m_tp, m_gp, rtol=1e-10)
        iK = tp.kernel.eval_inv_dot(par, tp.points)
        fo = fcn_obs.reshape(-1)
        scale = (5.0 - 2 + fo @ iK @ fo) / (5.0 - 2 + 3)
        np.testing.assert_allclose(v_tp, scale * v_gp, rtol=1e-10)


class TestTransforms:
    def test_output_cov_pd(self):
        """PD of the output covariance is the core invariant
        (``test_bqmtran.py:77-85``)."""
        par = np.array([[1.0, 1.5, 1.5]])
        mean = jnp.asarray(np.array([1.0, 0.5]))
        cov = jnp.asarray(np.diag([0.4, 0.3]))
        f = lambda x, p: jnp.stack([x[0] * x[1], jnp.sin(x[0])])
        # BSQ uses the pi-unisolvent UT basis; non-unisolvent bases are not
        # PD-calibrated in general (the reference notes frequent PD loss for
        # such configurations, ``ssinf.py:953-955``)
        mulind_uni = np.hstack([np.zeros((2, 1), int), np.eye(2, dtype=int), 2 * np.eye(2, dtype=int)])
        for tf in [GaussianProcessTransform.create(2, 2, par, point_str="ut"),
                   StudentTProcessTransform.create(2, 2, par, point_str="ut"),
                   BayesSardTransform.create(2, 2, par, multi_ind=mulind_uni,
                                             point_str="ut")]:
            mf, cf, ccf = tf.apply(f, mean, cov, None)
            np.testing.assert_allclose(cf, cf.T, atol=1e-12)
            assert bool(jnp.all(jnp.linalg.eigvalsh(cf) > 0)), type(tf).__name__

    def test_weights_rederive_matches_precomputed(self):
        """apply(kern_par=...) with the construction parameters reproduces
        the precomputed-weight path (``bqmtran.py:93-95``)."""
        par = np.array([[1.0, 2.0]])
        tf = GaussianProcessTransform.create(1, 1, par, point_str="ut")
        mean = jnp.asarray(np.array([0.3]))
        cov = jnp.asarray(np.array([[1.1]]))
        f = lambda x, p: jnp.sin(x)
        out1 = tf.apply(f, mean, cov, None)
        out2 = tf.apply(f, mean, cov, None, kern_par=jnp.asarray(par))
        for a, b in zip(out1, out2):
            np.testing.assert_allclose(a, b, rtol=1e-10)

    def test_mo_transform_close_to_so_with_same_params(self):
        """MO-GPQ with identical parameter rows approximates single-output GPQ
        (the reference documents small discrepancies, ``bqmtran.py:438-450``)."""
        par_so = np.array([[1.0, 1.5, 1.5]])
        par_mo = np.tile(par_so, (2, 1))
        mean = jnp.asarray(np.array([1.0, 0.5]))
        cov = jnp.asarray(np.diag([0.4, 0.3]))
        f = lambda x, p: jnp.stack([x[0] * x[1], jnp.sin(x[0])])
        so = GaussianProcessTransform.create(2, 2, par_so, point_str="ut").apply(f, mean, cov, None)
        mo = MultiOutputGaussianProcessTransform.create(2, 2, par_mo, point_str="ut").apply(f, mean, cov, None)
        np.testing.assert_allclose(mo[0], so[0], rtol=1e-8, atol=1e-12)
        np.testing.assert_allclose(mo[2], so[2], rtol=1e-8, atol=1e-12)

    def test_mo_cross_cov_nondiagonal_input_cov(self):
        """Regression: the MO cross-covariance must contract against the
        Cholesky factor's TRANSPOSE like the single-output path — a diagonal
        input covariance (L = L^T on the diagonal scale) cannot tell the two
        apart, a correlated one can."""
        par_so = np.array([[1.0, 1.5, 1.5]])
        par_mo = np.tile(par_so, (2, 1))
        mean = jnp.asarray(np.array([1.0, 0.5]))
        cov = jnp.asarray(np.array([[0.4, 0.15], [0.15, 0.3]]))
        f = lambda x, p: jnp.stack([x[0] * x[1], jnp.sin(x[0])])
        so = GaussianProcessTransform.create(2, 2, par_so, point_str="ut").apply(f, mean, cov, None)
        mo = MultiOutputGaussianProcessTransform.create(2, 2, par_mo, point_str="ut").apply(f, mean, cov, None)
        np.testing.assert_allclose(mo[2], so[2], rtol=1e-8, atol=1e-12)


class TestStudentKernel:
    def test_student_mc_vs_gauss_closed_form(self):
        """For large dof, Student-weighted MC expectations approach the
        Gaussian closed forms."""
        par = np.array([[1.0, 2.0]])
        x = jnp.asarray(np.array([[0.0, 1.0, -1.0]]))
        ks = RBFStudent.create(1, par, dof=200.0, num_samples=400_000, num_batches=100)
        kg = RBFGauss.create(1, par)
        np.testing.assert_allclose(ks.exp_x_kx(par, x), kg.exp_x_kx(par, x), atol=5e-3)
        np.testing.assert_allclose(ks.exp_x_kxkx(par, par, x),
                                   kg.exp_x_kxkx(par, par, x), atol=5e-3)
        # pairwise E[k(x,y)] normalization: the reference overestimates by
        # ~batch_size (``bqkern.py:529-536``); fixed here, so the MC estimate
        # must approach the Gaussian closed form at high dof
        np.testing.assert_allclose(float(ks.exp_xy_kxy(par)),
                                   float(kg.exp_xy_kxy(par)), atol=5e-3)

    def test_student_kxkx_orientation_matches_closed_form(self):
        """Q[i,j] = E[k_par0(x, x_i) k_par1(x, x_j)]: with distinct parameter
        rows the MC estimate must match the closed-form ORIENTATION (the
        reference accumulates the transpose) — so Q(p1,p0) == Q(p0,p1)^T."""
        p0 = np.array([[1.0, 1.0]])
        p1 = np.array([[1.0, 3.0]])
        x = jnp.asarray(np.array([[0.0, 1.5, -1.0]]))
        ks = RBFStudent.create(1, np.vstack([p0, p1]), dof=200.0,
                               num_samples=400_000, num_batches=100)
        kg = RBFGauss.create(1, np.vstack([p0, p1]))
        q_mc = np.asarray(ks.exp_x_kxkx(p0, p1, x))
        q_cf = np.asarray(kg.exp_x_kxkx(p0, p1, x))
        assert np.max(np.abs(q_cf - q_cf.T)) > 1e-3   # orientation-sensitive case
        np.testing.assert_allclose(q_mc, q_cf, atol=5e-3)
        np.testing.assert_allclose(np.asarray(ks.exp_x_kxkx(p1, p0, x)), q_mc.T,
                                   atol=1e-12)

    def test_full_student_weight_build_grad_on_pallas_path(self):
        """r3: the Pallas student kernels carry custom VJPs, so jax.grad
        through a FULL rbf-student bq_weights build (projected weight stats
        scan + Pallas exp_xy_kxy) works with use_pallas='force' — before,
        the integral-variance term killed the gradient on the TPU path."""
        from ssmtoybox_tpu.bq.models import GaussianProcessModel
        par = np.array([[1.0, 2.0]])
        m = GaussianProcessModel.create(1, par, kern_str="rbf-student",
                                        point_str="ut", num_samples=20_000,
                                        num_batches=10, use_pallas="force")

        def loss(p):
            w = m.bq_weights(p)
            return (jnp.sum(w.wm) + jnp.sum(w.Wc) + w.model_var
                    + w.integral_var)

        g = jax.grad(loss)(jnp.asarray(par))
        assert bool(jnp.isfinite(g).all())
        m_scan = m.replace(kernel=m.kernel.replace(use_pallas=False))

        def loss_scan(p):
            w = m_scan.bq_weights(p)
            return (jnp.sum(w.wm) + jnp.sum(w.Wc) + w.model_var
                    + w.integral_var)

        g_scan = jax.grad(loss_scan)(jnp.asarray(par))
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_scan),
                                   rtol=0.1, atol=0.05)

    def test_use_pallas_flag_and_grad_path(self):
        """use_pallas=False selects the jnp scan path everywhere (still the
        off-TPU default; the Pallas kernels now carry custom VJPs, see
        test_full_student_weight_build_grad_on_pallas_path); both paths
        agree to MC error."""
        par = np.array([[1.0, 2.0]])
        x = jnp.asarray(np.array([[0.0, 1.0, -1.0]]))
        k_scan = RBFStudent.create(1, par, dof=10.0, num_samples=20_000,
                                   num_batches=10, use_pallas=False)
        # 'force' runs the Pallas kernels in interpret mode on this CPU host
        # (plain True now defers to the backend and would pick the scan path)
        k_pal = RBFStudent.create(1, par, dof=10.0, num_samples=20_000,
                                  use_pallas="force")
        g = jax.grad(lambda p: jnp.sum(k_scan.exp_x_qRQ(p, x)[2])
                     + k_scan.exp_xy_kxy(p))(jnp.asarray(par[0]))
        assert bool(jnp.isfinite(g).all())
        q1, _, Q1 = k_pal.exp_x_qRQ(par, x)
        q2, _, Q2 = k_scan.exp_x_qRQ(par, x)
        np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=2e-2)
        np.testing.assert_allclose(np.asarray(Q1), np.asarray(Q2), atol=2e-2)
        np.testing.assert_allclose(float(k_pal.exp_xy_kxy(par)),
                                   float(k_scan.exp_xy_kxy(par)), atol=2e-2)

    def test_rq_kxkx_rbf_limit(self):
        """alpha -> inf must degrade RQ to RBF, so exp_x_kxkx must converge
        to the RBF closed form (the reference's sign bug fails this by up to
        ~70%; see docs/parity.md) — and match a 400k-sample MC estimate."""
        from ssmtoybox_tpu.bq.kernels import RQ, RBFGauss
        par_rq = np.array([[1.0, 1e7, 1.3, 0.8]])
        par_rbf = np.array([[1.0, 1.3, 0.8]])
        x = jnp.asarray(np.random.RandomState(0).randn(2, 3))
        rq = RQ.create(2, par_rq)
        Q_rq = rq.exp_x_kxkx(par_rq, par_rq, x)
        Q_rbf = RBFGauss.create(2, par_rbf).exp_x_kxkx(par_rbf, par_rbf, x)
        np.testing.assert_allclose(np.asarray(Q_rq), np.asarray(Q_rbf),
                                   rtol=1e-5, atol=1e-6)
        samp = np.random.RandomState(1).randn(400_000, 2)
        k = np.asarray(rq.eval(par_rq, jnp.asarray(samp.T), x))
        Q_mc = k.T @ k / len(samp)
        np.testing.assert_allclose(np.asarray(Q_rq), Q_mc, atol=3e-3)

    def test_rq_expectations_shapes(self):
        par = np.array([[1.0, 2.0, 1.0, 1.0]])
        x = jnp.asarray(np.random.RandomState(3).randn(2, 5))
        rq = RQ.create(2, par)
        assert rq.exp_x_kx(par, x).shape == (5,)
        assert rq.exp_x_kxkx(par, par, x).shape == (5, 5)
        assert rq.exp_x_xkx(par, x).shape == (2, 5)
        K = rq.eval(par, x)
        np.testing.assert_allclose(K, K.T, atol=1e-14)


class TestGPQD:
    def test_der_model_emv_ivar_joint(self):
        """exp_model_variance/integral_variance on the derivative model use
        the JOINT function+derivative expectations; the inherited versions
        crashed on a shape mismatch between the joint Gram inverse and the
        function-only Q/q (gpqd_base.py:107-126)."""
        m = GaussianProcessDerModel.create(2, np.array([[1.0, 1.0, 1.0]]))
        w = m.bq_weights()
        emv, ivar = m.exp_model_variance(), m.integral_variance()
        np.testing.assert_allclose(float(emv), float(w.model_var), rtol=1e-12)
        np.testing.assert_allclose(float(ivar), float(w.integral_var), rtol=1e-12)
        assert float(emv) >= 0.0

    def test_der_kernel_blocks_consistent_with_ad(self):
        """Kfd/Kdd blocks equal AD derivatives of the RBF kernel."""
        par = np.array([[1.0, 1.3]])
        x = jnp.asarray(np.array([[0.0, 0.7, -0.4]]))
        kern = RBFGaussDer.create(1, par)
        K = kern.eval(par, x)                      # (N + N*D)^2, D=1
        base = RBFGauss.create(1, par)
        # d/dxj k(xi, xj):
        kfun = lambda a, b: base.eval(par, a[:, None], b[:, None])[0, 0]
        dk = jax.grad(kfun, argnums=1)
        for i in range(3):
            for j in range(3):
                np.testing.assert_allclose(K[i, 3 + j], dk(x[:, i], x[:, j])[0],
                                           rtol=1e-10, err_msg=f"Kfd {i}{j}")
        d2k = jax.jacfwd(dk, argnums=0)
        for i in range(3):
            for j in range(3):
                np.testing.assert_allclose(K[3 + i, 3 + j], d2k(x[:, i], x[:, j])[0, 0],
                                           rtol=1e-10, err_msg=f"Kdd {i}{j}")

    def test_der_expectations_vs_mc(self):
        """Derivative kernel expectations vs MC (``research/gpqd/tests``)."""
        par = np.array([[1.0, 1.2]])
        x = jnp.asarray(np.array([[0.0, 1.0, -1.0]]))
        kern = RBFGaussDer.create(1, par)
        base = RBFGauss.create(1, par)
        kfun = lambda s, xi: base.eval(par, s[:, None], xi[:, None], scaling=False)[0, 0]
        dk = jax.grad(kfun, argnums=1)

        qd = kern.exp_x_dkx(par, x)
        qd_mc = _mc_expectation(
            lambda s: jnp.stack([dk(s, x[:, i])[0] for i in range(3)]), 1)
        np.testing.assert_allclose(qd, qd_mc, atol=3e-3)

        Qdd = kern.exp_x_dkxdkx(par, x)
        Qdd_mc = _mc_expectation(
            lambda s: jnp.asarray([[dk(s, x[:, i])[0] * dk(s, x[:, j])[0]
                                    for j in range(3)] for i in range(3)]), 1)
        np.testing.assert_allclose(Qdd, Qdd_mc, atol=3e-3)

        Qfd = kern.exp_x_kxdkx(par, x)
        Qfd_mc = _mc_expectation(
            lambda s: jnp.asarray([[kfun(s, x[:, i]) * dk(s, x[:, j])[0]
                                    for j in range(3)] for i in range(3)]), 1)
        np.testing.assert_allclose(Qfd, Qfd_mc, atol=3e-3)

        Rd = kern.exp_x_xdkx(par, x)
        Rd_mc = _mc_expectation(
            lambda s: jnp.asarray([s[0] * dk(s, x[:, j])[0] for j in range(3)])[None, :], 1)
        np.testing.assert_allclose(Rd, Rd_mc, atol=3e-3)

    def test_gpqd_mean_near_exact_on_linear(self):
        """Derivative observations pin down a linear integrand: the GPQ+D
        mean is near-exact and tighter than plain GPQ."""
        par = np.array([[1.0, 3.0]])
        mean = jnp.asarray(np.array([0.5]))
        cov = jnp.asarray(np.array([[0.6]]))
        f = lambda x, p: 2.0 * x + 1.0
        true_mean = 2.0
        gpq = GaussianProcessTransform.create(1, 1, par, point_str="ut").apply(f, mean, cov, None)
        gpqd = GaussianProcessDerTransform.create(1, 1, par, point_str="ut").apply(f, mean, cov, None)
        np.testing.assert_allclose(float(gpqd[0][0]), true_mean, atol=1e-3)
        assert abs(float(gpqd[0][0]) - true_mean) < abs(float(gpq[0][0]) - true_mean)

    def test_gpqd_weight_shapes_with_subset(self):
        par = np.array([[1.0, 1.0, 1.0]])
        m = GaussianProcessDerModel.create(2, par, point_str="ut", which_der=[0, 2])
        w = m.bq_weights()
        n_tilde = 5 + 2 * 2
        assert w.wm.shape == (n_tilde,)
        assert w.Wc.shape == (n_tilde, n_tilde)
        assert w.Wcc.shape == (2, n_tilde)


class TestGPQDCrossEval:
    """Regression: the derivative kernel's cross-covariance case (x1 != x2,
    the predict path) used to crash for unequal point counts and returned a
    wrong Kfd orientation for equal ones (the Gram/weights path was always
    correct, which is why golden parity never caught it)."""

    def test_cross_kfd_matches_finite_differences(self):
        kern = RBFGaussDer.create(2, np.array([[1.0, 1.5, 2.0]]))
        par = kern.par
        rng = np.random.default_rng(0)
        x1 = jnp.asarray(rng.standard_normal((2, 3)))
        x2 = jnp.asarray(rng.standard_normal((2, 5)))
        K = kern.eval(par, x1, x2)
        assert K.shape == (3, 5 + 5 * 2)

        def kf(xi, xj):
            return float(kern.eval(par, xi[:, None], xj[:, None])[0, 0])

        eps = 1e-6
        for i in range(3):
            for j in range(5):
                for d in range(2):
                    e = np.zeros(2)
                    e[d] = eps
                    fd = (kf(x1[:, i], jnp.asarray(np.asarray(x2[:, j]) + e))
                          - kf(x1[:, i], jnp.asarray(np.asarray(x2[:, j]) - e))) / (2 * eps)
                    assert abs(fd - float(K[i, 5 + j * 2 + d])) < 1e-6

    def test_joint_predict_interpolates(self):
        """predict() consumes stacked function+Jacobian observations and
        interpolates them (the inherited base predict was incompatible with
        the joint Gram structure)."""
        m = GaussianProcessDerModel.create(2, np.array([[1.0, 1.5, 2.0]]))
        f = lambda x: jnp.sin(x[0]) + 0.5 * x[1] ** 2
        fx = jnp.stack([f(m.points[:, i]) for i in range(m.num_pts)])
        jac = jnp.concatenate([jax.jacfwd(f)(m.points[:, i]) for i in range(m.num_pts)])
        mean, var = m.predict(m.points[:, :2], jnp.concatenate([fx, jac]))
        true = np.array([float(f(m.points[:, i])) for i in range(2)])
        np.testing.assert_allclose(np.asarray(mean), true, atol=1e-4)
        assert np.all(np.asarray(var) > -1e-9)
        with pytest.raises(ValueError, match="Jacobian entries"):
            m.predict(m.points[:, :2], fx)
