"""Generate golden parity data from the reference SSMToybox.

Runs the reference implementation (mounted read-only at /root/reference) on
fixed-seed scenarios and dumps inputs + outputs to ``tests/goldens/*.npz``.
The test suite then replays the SAME measurement sequences through the
TPU-native framework and asserts 1e-8 agreement on filtered/smoothed moments,
BQ weights and kernel expectations (the parity protocol of BASELINE.md).

The reference requires numba (not installed here); its single @nb.jit function
is pure Python-compatible, so we stub the decorator.
"""
import os
import sys
import types  # noqa: F401 (kept for any residual direct use)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.refcompat import install  # noqa: E402

install()

import numpy as np  # noqa: E402
import scipy as sp  # noqa: E402,F401

from ssmtoybox.ssmod import (  # noqa: E402
    UNGMTransition, UNGMNATransition, UNGMMeasurement, UNGMNAMeasurement,
    Pendulum2DTransition, Pendulum2DMeasurement,
    ConstantVelocity, Radar2DMeasurement,
    CoordinatedTurnTransition, BearingMeasurement,
    ReentryVehicle2DTransition, ConstantTurnRateSpeed,
)
from ssmtoybox.ssinf import (  # noqa: E402
    UnscentedKalman, CubatureKalman, GaussHermiteKalman, ExtendedKalman,
    GaussianProcessKalman, BayesSardKalman, StudentProcessKalman,
    FullySymmetricStudent, ExtendedKalmanGPQD,
)
from ssmtoybox.utils import GaussRV, StudentRV  # noqa: E402
from ssmtoybox.mtran import (  # noqa: E402
    UnscentedTransform, SphericalRadialTransform, GaussHermiteTransform,
    FullySymmetricStudentTransform,
)
from ssmtoybox.bq.bqkern import RBFGauss, RQ  # noqa: E402
from ssmtoybox.bq.bqmod import GaussianProcessModel, BayesSardModel, StudentTProcessModel  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")
os.makedirs(OUT, exist_ok=True)


def run_filter(alg, y):
    fm, fP = alg.forward_pass(y)
    return np.asarray(fm), np.asarray(fP)


def main():
    # =====================================================================
    # Scenario A: UNGM additive, all Gaussian filters + smoothers
    # =====================================================================
    np.random.seed(42)
    x0 = GaussRV(1, cov=np.atleast_2d(1.0))
    q = GaussRV(1, cov=np.atleast_2d(10.0))
    r = GaussRV(1, cov=np.atleast_2d(1.0))
    dyn = UNGMTransition(x0, q)
    obs = UNGMMeasurement(r, dyn.dim_state)
    x = dyn.simulate_discrete(100, mc_sims=3)
    y = obs.simulate_measurements(x)
    data = {"x": x, "y": y}

    kpar = np.array([[1.0, 3.0]])
    # NOTE: the reference's BayesSardKalman crashes when multi_ind is an int
    # (BayesSardTransform.weights passes the raw constructor arg to
    # bq_weights, bqmtran.py:338,359 + bqmod.py:926); research scripts pass
    # explicit multi-index matrices, so the goldens do too.
    mulind1 = np.array([[0, 1, 2]])
    filters = {
        "ukf": UnscentedKalman(dyn, obs),
        "ckf": CubatureKalman(dyn, obs),
        "ghkf5": GaussHermiteKalman(dyn, obs, deg=5),
        "ekf": ExtendedKalman(dyn, obs),
        "gpqkf": GaussianProcessKalman(dyn, obs, kpar, kpar, points="ut"),
        "bsqkf": BayesSardKalman(dyn, obs, np.array([[3.0, 0.3]]), np.array([[3.0, 0.3]]),
                                 mulind_dyn=mulind1, mulind_obs=mulind1, points="ut"),
        "tpqkf": StudentProcessKalman(dyn, obs, kpar, kpar, points="ut", nu=3.0),
        "ekf_gpqd": ExtendedKalmanGPQD(dyn, obs, kpar, kpar),
    }
    for name, alg in filters.items():
        fm, fP = run_filter(alg, y[..., 0])
        data[f"{name}_fm"], data[f"{name}_fP"] = fm, fP
        if name in ("ukf", "gpqkf", "bsqkf"):
            sm, sP = alg.backward_pass()
            data[f"{name}_sm"], data[f"{name}_sP"] = np.asarray(sm), np.asarray(sP)
        alg.reset()
    np.savez(os.path.join(OUT, "ungm.npz"), **data)
    print("ungm.npz:", sorted(data))

    # =====================================================================
    # Scenario B: UNGM non-additive noise
    # =====================================================================
    np.random.seed(7)
    # non-zero initial mean: with x0_mean = 0 the 0.05*r*x^2 measurement is
    # numerically unobservable (S ~ 1e-68) and "parity" reduces to comparing
    # summation-order noise
    dyn_na = UNGMNATransition(GaussRV(1, mean=np.atleast_1d(1.0), cov=np.atleast_2d(1.0)),
                              GaussRV(1, cov=np.atleast_2d(10.0)))
    obs_na = UNGMNAMeasurement(GaussRV(1, cov=np.atleast_2d(0.01)), dyn_na.dim_state)
    x = dyn_na.simulate_discrete(60, mc_sims=1)
    y = obs_na.simulate_measurements(x)
    ukf = UnscentedKalman(dyn_na, obs_na)
    fm, fP = run_filter(ukf, y[..., 0])
    np.savez(os.path.join(OUT, "ungm_na.npz"), x=x, y=y, ukf_fm=fm, ukf_fP=fP)
    print("ungm_na.npz done")

    # =====================================================================
    # Scenario C: Pendulum
    # =====================================================================
    np.random.seed(3)
    dt = 0.01
    x0 = GaussRV(2, mean=np.array([1.5, 0.0]), cov=0.01 * np.eye(2))
    qc = 0.10
    Q = qc * np.array([[dt ** 3 / 3, dt ** 2 / 2], [dt ** 2 / 2, dt]])
    dyn_p = Pendulum2DTransition(x0, GaussRV(2, cov=Q), dt=dt)
    obs_p = Pendulum2DMeasurement(GaussRV(1, cov=np.atleast_2d(0.1)), dyn_p.dim_state)
    x = dyn_p.simulate_discrete(80, mc_sims=1)
    y = obs_p.simulate_measurements(x)
    kpar2 = np.array([[1.0, 2.0, 2.0]])
    algs = {
        "ukf": UnscentedKalman(dyn_p, obs_p),
        "gpqkf": GaussianProcessKalman(dyn_p, obs_p, kpar2, np.array([[1.0, 2.0, 2.0]]), points="sr"),
    }
    data = {"x": x, "y": y}
    for name, alg in algs.items():
        fm, fP = run_filter(alg, y[..., 0])
        data[f"{name}_fm"], data[f"{name}_fP"] = fm, fP
        sm, sP = alg.backward_pass()
        data[f"{name}_sm"], data[f"{name}_sP"] = np.asarray(sm), np.asarray(sP)
    np.savez(os.path.join(OUT, "pendulum.npz"), **data)
    print("pendulum.npz done")

    # =====================================================================
    # Scenario D: constant-velocity + 2D radar (state_index selection)
    # =====================================================================
    np.random.seed(11)
    x0 = GaussRV(4, mean=np.array([10000., 300., 1000., -40.]),
                 cov=np.diag([100.0, 25.0, 100.0, 25.0]))
    q = GaussRV(2, cov=np.diag([50.0, 5.0]))
    r = GaussRV(2, cov=np.diag([50.0, 0.4e-6]))
    dyn_cv = ConstantVelocity(x0, q, dt=0.5)
    obs_cv = Radar2DMeasurement(r, dyn_cv.dim_state, state_index=[0, 2])
    x = dyn_cv.simulate_discrete(60, mc_sims=1)
    y = obs_cv.simulate_measurements(x)
    ukf = UnscentedKalman(dyn_cv, obs_cv)
    fm, fP = run_filter(ukf, y[..., 0])
    sm, sP = ukf.backward_pass()
    np.savez(os.path.join(OUT, "cv_radar.npz"), x=x, y=y, ukf_fm=fm, ukf_fP=fP,
             ukf_sm=np.asarray(sm), ukf_sP=np.asarray(sP))
    print("cv_radar.npz done")

    # =====================================================================
    # Scenario E: coordinated turn + bearing sensors
    # =====================================================================
    np.random.seed(13)
    dt = 0.1
    x0 = GaussRV(5, mean=np.array([1000., 300., 1000., 0., -3.0 * np.pi / 180]),
                 cov=np.diag([100., 10., 100., 10., 0.1]))
    rho_1, rho_2 = 0.1, 1.75e-4
    A = np.array([[dt ** 3 / 3, dt ** 2 / 2], [dt ** 2 / 2, dt]])
    import scipy.linalg as sla
    Q = sla.block_diag(rho_1 * A, rho_1 * A, rho_2 * dt)
    q = GaussRV(5, cov=Q)
    r = GaussRV(4, cov=1e-3 * np.eye(4))
    dyn_ct = CoordinatedTurnTransition(x0, q, dt=dt)
    sensors = 100.0 * np.vstack((np.eye(2), -np.eye(2)))
    obs_ct = BearingMeasurement(r, 5, state_index=[0, 2], sensor_pos=sensors)
    x = dyn_ct.simulate_discrete(60, mc_sims=1)
    y = obs_ct.simulate_measurements(x)
    ckf = CubatureKalman(dyn_ct, obs_ct)
    fm, fP = run_filter(ckf, y[..., 0])
    np.savez(os.path.join(OUT, "ct_bearing.npz"), x=x, y=y, ckf_fm=fm, ckf_fP=fP)
    print("ct_bearing.npz done")

    # =====================================================================
    # Scenario E2: constant-turn-rate-and-speed (non-additive 5D) + radar
    # =====================================================================
    np.random.seed(23)
    dyn_ctrs = ConstantTurnRateSpeed(
        GaussRV(5, mean=np.array([10., 0., 5., 0.5, 0.1]), cov=0.1 * np.eye(5)),
        GaussRV(2, cov=np.diag([0.1, 0.1 * np.pi])), dt=0.05)
    obs_ctrs = Radar2DMeasurement(GaussRV(2, cov=np.diag([0.3, 0.03])), 5,
                                  state_index=[0, 1])
    x = dyn_ctrs.simulate_discrete(40, mc_sims=1)
    y = obs_ctrs.simulate_measurements(x)
    ukf = UnscentedKalman(dyn_ctrs, obs_ctrs)
    fm, fP = run_filter(ukf, y[..., 0])
    np.savez(os.path.join(OUT, "ctrs_radar.npz"), x=x, y=y, ukf_fm=fm, ukf_fP=fP)
    print("ctrs_radar.npz done")

    # =====================================================================
    # Scenario F: reentry vehicle 2D + radar
    # =====================================================================
    np.random.seed(17)
    dt = 0.05
    x0 = GaussRV(5, mean=np.array([6500.4, 349.14, -1.8093, -6.7967, 0.6932]),
                 cov=np.diag([1e-6, 1e-6, 1e-6, 1e-6, 1.0]))
    Q = np.diag([2.4064e-5, 2.4064e-5, 1e-6])
    q = GaussRV(3, cov=Q)
    r = GaussRV(2, cov=np.diag([1e-3, 1e-5]))
    dyn_re = ReentryVehicle2DTransition(x0, q, dt=dt)
    obs_re = Radar2DMeasurement(r, 5, state_index=[0, 1], radar_loc=np.array([6374.0, 0.0]))
    x = dyn_re.simulate_discrete(40, mc_sims=1)
    y = obs_re.simulate_measurements(x)
    data = {"x": x, "y": y}
    mulind5 = np.hstack([np.zeros((5, 1), dtype=int), np.eye(5, dtype=int),
                         2 * np.eye(5, dtype=int)])
    for name, alg in {
        "ukf": UnscentedKalman(dyn_re, obs_re),
        "bsqkf": BayesSardKalman(dyn_re, obs_re, np.array([[1.0, 1, 1, 1, 1, 1]]),
                                  np.array([[1.0, 0.9, 0.9, 1e4, 1e4, 1e4]]),
                                  mulind_dyn=mulind5, mulind_obs=mulind5, points="ut"),
    }.items():
        fm, fP = run_filter(alg, y[..., 0])
        data[f"{name}_fm"], data[f"{name}_fP"] = fm, fP
    np.savez(os.path.join(OUT, "reentry.npz"), **data)
    print("reentry.npz done")

    # =====================================================================
    # Scenario G: Student filter (FSQ) on UNGM with Student noises
    # =====================================================================
    np.random.seed(19)
    x0 = StudentRV(1, scale=np.atleast_2d(1.0), dof=4.0)
    q = StudentRV(1, scale=np.atleast_2d(10.0), dof=4.0)
    r = StudentRV(1, scale=np.atleast_2d(0.01), dof=4.0)
    dyn_s = UNGMTransition(x0, q)
    obs_s = UNGMMeasurement(r, dyn_s.dim_state)
    x = dyn_s.simulate_discrete(60, mc_sims=1)
    y = obs_s.simulate_measurements(x)
    data = {"x": x, "y": y}
    for name, alg in {
        "fsq3": FullySymmetricStudent(dyn_s, obs_s, degree=3, dof=4.0, fixed_dof=True),
        "fsq3_inc": FullySymmetricStudent(dyn_s, obs_s, degree=3, dof=4.0, fixed_dof=False),
    }.items():
        fm, fP = run_filter(alg, y[..., 0])
        data[f"{name}_fm"], data[f"{name}_fP"] = fm, fP
    np.savez(os.path.join(OUT, "ungm_student.npz"), **data)
    print("ungm_student.npz done")

    # =====================================================================
    # Scenario H: transform/weight/kernel-expectation level goldens
    # =====================================================================
    rng = np.random.RandomState(23)
    data = {}
    # RBF kernel expectations at random points, dim 2
    x2 = rng.randn(2, 7)
    par2 = np.array([[1.5, 0.7, 1.3]])
    kern = RBFGauss(2, par2)
    data["kern_x"] = x2
    data["kern_par"] = par2
    data["kern_K"] = kern.eval(par2, x2)
    data["kern_q"] = kern.exp_x_kx(par2, x2)
    data["kern_Q"] = kern.exp_x_kxkx(par2, par2, x2)
    data["kern_R"] = kern.exp_x_xkx(par2, x2)
    data["kern_kxy"] = np.atleast_1d(kern.exp_xy_kxy(par2))
    # RQ kernel expectations (approximate Student-weighted closed forms)
    par_rq = np.array([[1.2, 3.0, 0.8, 1.1]])
    rq = RQ(2, par_rq)
    data["rq_par"] = par_rq
    data["rq_K"] = rq.eval(par_rq, x2)
    data["rq_q"] = rq.exp_x_kx(par_rq, x2)
    data["rq_Q"] = rq.exp_x_kxkx(par_rq, par_rq, x2)
    data["rq_R"] = rq.exp_x_xkx(par_rq, x2)
    data["rq_kxy"] = np.atleast_1d(rq.exp_xy_kxy(par_rq))
    # GP/TP/BSQ weights for several point sets, dim 2
    for pts in ["ut", "sr", "gh"]:
        gp = GaussianProcessModel(2, par2, "rbf", pts, None, False)
        wm, wc, wcc, emv, ivar = gp.bq_weights(par2)
        data[f"gp_{pts}_wm"], data[f"gp_{pts}_wc"], data[f"gp_{pts}_wcc"] = wm, wc, wcc
        data[f"gp_{pts}_emv"], data[f"gp_{pts}_ivar"] = np.atleast_1d(emv), np.atleast_1d(ivar)
    tp = StudentTProcessModel(2, par2, "rbf", "ut", None, False, nu=4.0)
    wm, wc, wcc, emv, ivar = tp.bq_weights(par2)
    data["tp_ut_wm"], data["tp_ut_wc"], data["tp_ut_wcc"] = wm, wc, wcc
    bs = BayesSardModel(2, par2, multi_ind=2, point_str="gh",
                        point_par={"degree": 3}, estimate_par=False)
    wm, wc, wcc, emv, ivar = bs.bq_weights(par2)
    data["bs_gh_wm"], data["bs_gh_wc"], data["bs_gh_wcc"] = wm, wc, wcc
    data["bs_gh_emv"], data["bs_gh_ivar"] = np.atleast_1d(emv), np.atleast_1d(ivar)
    data["bs_gh_mulind"] = bs.mulind
    # unisolvent BSQ on UT points reproduces UT weights
    mulind_uni = np.hstack([np.zeros((2, 1), dtype=int), np.eye(2, dtype=int),
                            2 * np.eye(2, dtype=int)])
    bs_uni = BayesSardModel(2, par2, multi_ind=mulind_uni, point_str="ut")
    wm, wc, wcc, emv, ivar = bs_uni.bq_weights(par2, mulind_uni)
    data["bs_uni_wm"], data["bs_uni_wc"], data["bs_uni_wcc"] = wm, wc, wcc
    data["bs_uni_emv"] = np.atleast_1d(emv)
    data["bs_uni_mulind"] = mulind_uni
    # classical point sets / weights
    data["ut3_pts"] = UnscentedTransform.unit_sigma_points(3)
    data["ut3_wm"], data["ut3_wc"] = UnscentedTransform.weights(3)
    data["sr4_pts"] = SphericalRadialTransform.unit_sigma_points(4)
    data["sr4_w"] = SphericalRadialTransform.weights(4)
    data["gh2_pts"] = GaussHermiteTransform.unit_sigma_points(2, 4)
    data["gh2_w"] = GaussHermiteTransform.weights(2, 4)
    data["fs3_pts_d5"] = FullySymmetricStudentTransform.unit_sigma_points(3, degree=5, dof=6.0)
    data["fs3_w_d5"] = FullySymmetricStudentTransform.weights(3, degree=5, dof=6.0)
    data["fs2_pts_d3"] = FullySymmetricStudentTransform.unit_sigma_points(2, degree=3, dof=4.0)
    data["fs2_w_d3"] = FullySymmetricStudentTransform.weights(2, degree=3, dof=4.0)
    # transform-level apply on a fixed nonlinearity: polar2cartesian
    def polar2cartesian(x, pars):
        return x[0] * np.array([np.cos(x[1]), np.sin(x[1])])
    mean_in = np.array([1.0, np.pi / 6])
    cov_in = np.diag([0.05 ** 2, (np.pi / 10) ** 2])
    ut = UnscentedTransform(2)
    mf, cf, ccf = ut.apply(polar2cartesian, mean_in, cov_in, None)
    data["p2c_mean_in"], data["p2c_cov_in"] = mean_in, cov_in
    data["p2c_ut_mf"], data["p2c_ut_cf"], data["p2c_ut_ccf"] = mf, cf, ccf
    from ssmtoybox.bq.bqmtran import GaussianProcessTransform as RefGPT
    gpt = RefGPT(2, 2, par2, point_str="ut")
    mf, cf, ccf = gpt.apply(polar2cartesian, mean_in, cov_in, None)
    data["p2c_gpq_mf"], data["p2c_gpq_cf"], data["p2c_gpq_ccf"] = mf, cf, ccf
    np.savez(os.path.join(OUT, "transforms.npz"), **data)
    print("transforms.npz done")

    # =====================================================================
    # Scenario H2: GPQ+D derivative-kernel expectations, weights and apply
    # (reference lives in research/gpqd/gpqd_base.py, loaded by file path)
    # =====================================================================
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "gpqd_base", "/root/reference/research/gpqd/gpqd_base.py")
    gpqd_base = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gpqd_base)

    data = {}
    rng = np.random.RandomState(31)
    x1 = rng.randn(1, 3)
    par1 = np.array([[1.0, 1.2]])
    kd = gpqd_base.RBFGaussDer(1, par1)
    data["d1_x"], data["d1_par"] = x1, par1
    data["d1_K"] = kd.eval(par1, x1)
    data["d1_qd"] = kd.exp_x_dkx(par1, x1)
    data["d1_Rd"] = kd.exp_x_xdkx(par1, x1)
    data["d1_Qfd"] = kd.exp_x_kxdkx(par1, x1)
    data["d1_Qdd"] = kd.exp_x_dkxdkx(par1, x1)

    x2g = rng.randn(2, 5)
    par2g = np.array([[1.3, 0.9, 1.4]])
    kd2 = gpqd_base.RBFGaussDer(2, par2g)
    data["d2_x"], data["d2_par"] = x2g, par2g
    data["d2_K"] = kd2.eval(par2g, x2g)
    data["d2_qd"] = kd2.exp_x_dkx(par2g, x2g)
    data["d2_Rd"] = kd2.exp_x_xdkx(par2g, x2g)
    data["d2_Qfd"] = kd2.exp_x_kxdkx(par2g, x2g)
    data["d2_Qdd"] = kd2.exp_x_dkxdkx(par2g, x2g)

    # GPQ+D model weights + transform apply on polar2cartesian w/ Jacobian
    tdm = gpqd_base.GaussianProcessDerTransform(2, 2, par2g, point_str="ut")
    wm, wc, wcc, emv, ivar = tdm.model.bq_weights(par2g)
    data["gpqd_wm"], data["gpqd_wc"], data["gpqd_wcc"] = wm, wc, wcc
    data["gpqd_emv"], data["gpqd_ivar"] = np.atleast_1d(emv), np.atleast_1d(ivar)

    def p2c(x, pars, dx=False):
        if dx:
            return np.array([[np.cos(x[1]), -x[0] * np.sin(x[1])],
                             [np.sin(x[1]), x[0] * np.cos(x[1])]])
        return x[0] * np.array([np.cos(x[1]), np.sin(x[1])])

    mean_in = np.array([1.0, np.pi / 6])
    cov_in = np.diag([0.05 ** 2, (np.pi / 10) ** 2])
    mf, cf, ccf = tdm.apply(p2c, mean_in, cov_in, None)
    data["gpqd_mf"], data["gpqd_cf"], data["gpqd_ccf"] = mf, cf, ccf
    data["gpqd_mean_in"], data["gpqd_cov_in"] = mean_in, cov_in
    np.savez(os.path.join(OUT, "gpqd.npz"), **data)
    print("gpqd.npz done")

    # =====================================================================
    # Scenario I: metrics on fixed arrays
    # =====================================================================
    from ssmtoybox.utils import (squared_error, mse_matrix, log_cred_ratio,
                                 neg_log_likelihood, kl_divergence,
                                 symmetrized_kl_divergence)
    rng = np.random.RandomState(29)
    xm = rng.randn(3)
    mm = rng.randn(3)
    A = rng.randn(3, 3); P = A @ A.T + 3 * np.eye(3)
    B = rng.randn(3, 3); MSE = B @ B.T + 3 * np.eye(3)
    est = rng.randn(3, 50)
    data = {
        "x": xm, "m": mm, "P": P, "MSE": MSE, "est": est,
        "se": squared_error(xm, mm),
        "msem": mse_matrix(xm[:, None], est),
        "lcr": np.atleast_1d(log_cred_ratio(xm, mm, P, MSE)),
        "nll": np.atleast_1d(neg_log_likelihood(xm, mm, P)),
        "kl": np.atleast_1d(kl_divergence(xm, P, mm, MSE)),
        "skl": np.atleast_1d(symmetrized_kl_divergence(xm, P, mm, MSE)),
    }
    np.savez(os.path.join(OUT, "metrics.npz"), **data)
    print("metrics.npz done")


def scenario_h3():
    """Scenario H3: truncated / multi-output / linearization / Taylor-GPQD
    transform goldens (reference mtran.py:49-60,588-658,668-701 and
    bqmtran.py:425-645), written to ``transforms2.npz``."""
    from ssmtoybox.mtran import (
        LinearizationTransform, TaylorGPQDTransform,
        TruncatedUnscentedTransform, TruncatedSphericalRadialTransform,
        TruncatedGaussHermiteTransform)
    from ssmtoybox.bq.bqmtran import (
        MultiOutputGaussianProcessTransform, MultiOutputStudentTProcessTransform)

    data = {}

    def p2c(x, pars, dx=False):
        if dx:
            return np.array([[np.cos(x[1]), -x[0] * np.sin(x[1])],
                             [np.sin(x[1]), x[0] * np.cos(x[1])]])
        return x[0] * np.array([np.cos(x[1]), np.sin(x[1])])

    mean2 = np.array([1.0, np.pi / 6])
    cov2 = np.diag([0.05 ** 2, (np.pi / 10) ** 2])
    data["mean2"], data["cov2"] = mean2, cov2

    lin = LinearizationTransform(2)
    mf, cf, ccf = lin.apply(p2c, mean2, cov2, None)
    data["lin_mf"], data["lin_cf"], data["lin_ccf"] = mf, cf, ccf

    par_t = np.array([[1.0, 2.5]])
    tay = TaylorGPQDTransform(2, par_t)
    mf, cf, ccf = tay.apply(p2c, mean2, cov2, None)
    data["tay_par"] = par_t
    data["tay_mf"], data["tay_cf"], data["tay_ccf"] = mf, cf, ccf

    # truncated rules: 3D input, only the first 2 dims are effective
    def p2c_aug(x, pars):
        return x[0] * np.array([np.cos(x[1]), np.sin(x[1])])

    mean3 = np.array([1.0, np.pi / 6, -0.4])
    cov3 = np.array([[0.05 ** 2, 0.0, 0.001],
                     [0.0, (np.pi / 10) ** 2, 0.0],
                     [0.001, 0.0, 0.3]])
    data["mean3"], data["cov3"] = mean3, cov3
    for name, tf in [("tut", TruncatedUnscentedTransform(3, 2)),
                     ("tsr", TruncatedSphericalRadialTransform(3, 2)),
                     ("tgh", TruncatedGaussHermiteTransform(3, 2, degree=3))]:
        mf, cf, ccf = tf.apply(p2c_aug, mean3, cov3, None)
        data[f"{name}_mf"], data[f"{name}_cf"], data[f"{name}_ccf"] = mf, cf, ccf

    # multi-output BQ transforms: one kernel-parameter row per output
    par_mo = np.array([[1.0, 0.7, 1.1],
                       [1.3, 0.9, 1.4]])
    data["mo_par"] = par_mo
    # NOTE: the reference MO transforms never set self.wm at init and their
    # weights() plumbing is broken (BQTransform.weights 5-unpacks the MO
    # model's 3-tuple, bqmtran.py:111-129 vs bqmod.py:1254-1316) — the MO
    # filters are documented as experimental/known-broken (ssinf.py:953-955).
    # The intended math lives in MultiOutputModel.bq_weights; install those
    # weights by hand, then apply() exercises the MO einsum moment equations.
    mo = MultiOutputGaussianProcessTransform(2, 2, par_mo, point_str="ut")
    mo.wm, mo.Wc, mo.Wcc = mo.model.bq_weights(par_mo)
    mf, cf, ccf = mo.apply(p2c, mean2, cov2, None)
    data["mo_gp_wm"], data["mo_gp_wc"], data["mo_gp_wcc"] = mo.wm, mo.Wc, mo.Wcc
    data["mo_gp_mf"], data["mo_gp_cf"], data["mo_gp_ccf"] = mf, cf, ccf

    mo_tp = MultiOutputStudentTProcessTransform(2, 2, par_mo, point_str="ut", nu=4.0)
    mo_tp.wm, mo_tp.Wc, mo_tp.Wcc = mo_tp.model.bq_weights(par_mo)
    mf, cf, ccf = mo_tp.apply(p2c, mean2, cov2, None)
    data["mo_tp_wm"], data["mo_tp_wc"], data["mo_tp_wcc"] = mo_tp.wm, mo_tp.Wc, mo_tp.Wcc
    data["mo_tp_mf"], data["mo_tp_cf"], data["mo_tp_ccf"] = mf, cf, ccf

    np.savez(os.path.join(OUT, "transforms2.npz"), **data)
    print("transforms2.npz done")


def scenario_j():
    """Scenario J: parameter-marginalized GPQ filtering on UNGM
    (``ssinf.py:1102-1270``).  The reference's inner BFGS uses finite-
    difference gradients and its BFGS-estimated inverse Hessian, so exact
    moment parity is unattainable (ours differentiates the same objective
    exactly); the golden records the reference's filtered moments and RMSE
    for a STUDY-LEVEL comparison (comparable RMSE, finite PD moments)."""
    from ssmtoybox.ssmod import UNGMTransition, UNGMMeasurement
    from ssmtoybox.utils import GaussRV
    from ssmtoybox.ssinf import MarginalizedGaussianProcessKalman

    np.random.seed(0)
    dyn = UNGMTransition(GaussRV(1, cov=1.0), GaussRV(1, cov=10.0))
    obs = UNGMMeasurement(GaussRV(1, cov=1.0), 1)
    x = dyn.simulate_discrete(20, mc_sims=1)
    y = obs.simulate_measurements(x)
    f = MarginalizedGaussianProcessKalman(dyn, obs, points="ut")
    fm, fP = f.forward_pass(y[..., 0])
    np.savez(os.path.join(OUT, "marginal_ungm.npz"),
             x=x[..., 0], y=y[..., 0], fi_mean=fm, fi_cov=fP,
             rmse=np.atleast_1d(np.sqrt(np.mean((fm - x[:, :, 0]) ** 2))))
    print("marginal_ungm.npz done")


def scenario_k():
    """Scenario K: TPQ weights on the FUSION-2017 CV-glint kernel parameters
    (``research/tpq/tpq_constant_velocity.py:62-68``).  These parameters are
    deliberately ill-conditioned (lengthscales >> unit-point spread,
    ``lambda_min(K) ~ 1e-7``) — the regression this golden guards is weight-
    space Monte-Carlo accumulation vs the iK-amplified composed form.  MC
    streams differ between reference and build, so tolerances in the test are
    the reference's own seed-to-seed spread (measured: wm 8e-4, Wc 0.06)."""
    from ssmtoybox.bq.bqmtran import StudentTProcessTransform

    data = {}
    for tag, par in (("dyn", np.array([[0.05, 100., 100., 100., 100.]])),
                     ("obs", np.array([[0.005, 10., 100., 10., 100.]]))):
        np.random.seed(0)
        t = StudentTProcessTransform(4, 1, par, 'rbf-student', 'fs',
                                     {'dof': 4.0}, nu=4.0)
        data[f"{tag}_par"] = par
        data[f"{tag}_wm"] = t.wm
        data[f"{tag}_Wc"] = t.Wc
        data[f"{tag}_Wcc"] = t.Wcc
        data[f"{tag}_emv"] = np.atleast_1d(t.model.model_var)
    np.savez(os.path.join(OUT, "tpq_cv_weights.npz"), **data)
    print("tpq_cv_weights.npz done")


if __name__ == "__main__":
    if sys.argv[1:] == ["h3"]:
        scenario_h3()
    elif sys.argv[1:] == ["j"]:
        scenario_j()
    elif sys.argv[1:] == ["k"]:
        scenario_k()
    else:
        main()
        scenario_h3()
        scenario_j()
        scenario_k()
