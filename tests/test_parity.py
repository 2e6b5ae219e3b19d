"""Golden-parity tests against the reference SSMToybox.

Each test replays measurement sequences recorded from the reference
implementation (tools/gen_goldens.py) through the TPU-native framework and
checks filtered/smoothed moments, BQ weights, kernel expectations, point sets
and metrics to 1e-8 — the parity protocol from BASELINE.md.
"""
import numpy as np
import pytest
import jax.numpy as jnp

import ssmtoybox_tpu as st
from ssmtoybox_tpu import points as pts
from ssmtoybox_tpu.bq.kernels import RBFGauss
from ssmtoybox_tpu.bq.models import (
    BayesSardModel, GaussianProcessModel, StudentTProcessModel)
from ssmtoybox_tpu.bq.transforms import GaussianProcessTransform
from ssmtoybox_tpu.mtran import UnscentedTransform
from ssmtoybox_tpu.ssmod import (
    UNGMTransition, UNGMNATransition, UNGMMeasurement, UNGMNAMeasurement,
    Pendulum2DTransition, Pendulum2DMeasurement, ConstantVelocity,
    Radar2DMeasurement, CoordinatedTurnTransition, BearingMeasurement,
    ReentryVehicle2DTransition, ConstantTurnRateSpeed)
from ssmtoybox_tpu.utils import GaussRV, StudentRV
from ssmtoybox_tpu.utils import metrics as M

ATOL = 1e-8
RTOL = 1e-8


def assert_close(ours, golden, label, atol=ATOL, rtol=RTOL):
    np.testing.assert_allclose(np.asarray(ours), golden, atol=atol, rtol=rtol,
                               err_msg=label)


# ---------------------------------------------------------------------------
# UNGM — all Gaussian filters
# ---------------------------------------------------------------------------

def _ungm_models():
    dyn = UNGMTransition.create(GaussRV.create(1, cov=1.0), GaussRV.create(1, cov=10.0))
    obs = UNGMMeasurement.create(GaussRV.create(1, cov=1.0), dim_state=1)
    return dyn, obs


UNGM_FILTERS = {
    "ukf": lambda d, o: st.UnscentedKalman(d, o),
    "ckf": lambda d, o: st.CubatureKalman(d, o),
    "ghkf5": lambda d, o: st.GaussHermiteKalman(d, o, deg=5),
    "ekf": lambda d, o: st.ExtendedKalman(d, o),
    "gpqkf": lambda d, o: st.GaussianProcessKalman(
        d, o, np.array([[1.0, 3.0]]), np.array([[1.0, 3.0]]), points="ut"),
    "bsqkf": lambda d, o: st.BayesSardKalman(
        d, o, np.array([[3.0, 0.3]]), np.array([[3.0, 0.3]]),
        mulind_dyn=np.array([[0, 1, 2]]), mulind_obs=np.array([[0, 1, 2]]), points="ut"),
    "tpqkf": lambda d, o: st.StudentProcessKalman(
        d, o, np.array([[1.0, 3.0]]), np.array([[1.0, 3.0]]), points="ut", nu=3.0),
    "ekf_gpqd": lambda d, o: st.ssinf.ExtendedKalmanGPQD(
        d, o, np.array([[1.0, 3.0]]), np.array([[1.0, 3.0]])),
}


@pytest.mark.parametrize("name", sorted(UNGM_FILTERS))
def test_ungm_filter_parity(goldens, name):
    g = goldens["ungm"]
    dyn, obs = _ungm_models()
    alg = UNGM_FILTERS[name](dyn, obs)
    fm, fP = alg.forward_pass(g["y"][..., 0])
    assert_close(fm, g[f"{name}_fm"], f"{name} filtered mean")
    assert_close(fP, g[f"{name}_fP"], f"{name} filtered cov")
    if f"{name}_sm" in g:
        sm, sP = alg.backward_pass()
        assert_close(sm, g[f"{name}_sm"], f"{name} smoothed mean")
        assert_close(sP, g[f"{name}_sP"], f"{name} smoothed cov")


def test_ungm_batch_matches_single(goldens):
    """vmapped batch filtering must equal per-trajectory filtering exactly."""
    g = goldens["ungm"]
    dyn, obs = _ungm_models()
    alg = st.UnscentedKalman(dyn, obs)
    y = g["y"]  # (1, N, 3)
    batch = np.moveaxis(y, -1, 0)  # (3, 1, N)
    res = alg.forward_pass_batch(batch)
    for s in range(y.shape[-1]):
        fm, _ = alg.forward_pass(y[..., s])
        # batched and unbatched traces fuse differently; agreement is at
        # accumulated-rounding level, far below the 1e-8 parity budget
        np.testing.assert_allclose(res.fi_mean[s], fm, rtol=1e-9, atol=1e-9)


def test_ungm_nonadditive_parity(goldens):
    g = goldens["ungm_na"]
    dyn = UNGMNATransition.create(GaussRV.create(1, mean=1.0, cov=1.0),
                                  GaussRV.create(1, cov=10.0))
    obs = UNGMNAMeasurement.create(GaussRV.create(1, cov=0.01), dim_state=1)
    alg = st.UnscentedKalman(dyn, obs)
    fm, fP = alg.forward_pass(g["y"][..., 0])
    assert_close(fm, g["ukf_fm"], "UNGM-NA UKF mean")
    assert_close(fP, g["ukf_fP"], "UNGM-NA UKF cov")


# ---------------------------------------------------------------------------
# Pendulum, CV radar, coordinated turn, reentry
# ---------------------------------------------------------------------------

def test_pendulum_parity(goldens):
    g = goldens["pendulum"]
    dt = 0.01
    qc = 0.10
    Q = qc * np.array([[dt ** 3 / 3, dt ** 2 / 2], [dt ** 2 / 2, dt]])
    dyn = Pendulum2DTransition.create(
        GaussRV.create(2, mean=np.array([1.5, 0.0]), cov=0.01 * np.eye(2)),
        GaussRV.create(2, cov=Q), dt=dt)
    obs = Pendulum2DMeasurement.create(GaussRV.create(1, cov=0.1), dim_state=2)
    for name, alg in {
        "ukf": st.UnscentedKalman(dyn, obs),
        "gpqkf": st.GaussianProcessKalman(dyn, obs, np.array([[1.0, 2.0, 2.0]]),
                                          np.array([[1.0, 2.0, 2.0]]), points="sr"),
    }.items():
        fm, fP = alg.forward_pass(g["y"][..., 0])
        assert_close(fm, g[f"{name}_fm"], f"pendulum {name} mean")
        assert_close(fP, g[f"{name}_fP"], f"pendulum {name} cov")
        sm, sP = alg.backward_pass()
        assert_close(sm, g[f"{name}_sm"], f"pendulum {name} smoothed mean")
        assert_close(sP, g[f"{name}_sP"], f"pendulum {name} smoothed cov")


def test_cv_radar_parity(goldens):
    g = goldens["cv_radar"]
    dyn = ConstantVelocity.create(
        GaussRV.create(4, mean=np.array([10000., 300., 1000., -40.]),
                       cov=np.diag([100.0, 25.0, 100.0, 25.0])),
        GaussRV.create(2, cov=np.diag([50.0, 5.0])), dt=0.5)
    obs = Radar2DMeasurement.create(GaussRV.create(2, cov=np.diag([50.0, 0.4e-6])),
                                    dim_state=4, state_index=[0, 2])
    alg = st.UnscentedKalman(dyn, obs)
    fm, fP = alg.forward_pass(g["y"][..., 0])
    assert_close(fm, g["ukf_fm"], "CV radar UKF mean")
    assert_close(fP, g["ukf_fP"], "CV radar UKF cov")
    sm, sP = alg.backward_pass()
    assert_close(sm, g["ukf_sm"], "CV radar UKF smoothed mean")
    assert_close(sP, g["ukf_sP"], "CV radar UKF smoothed cov")


def test_coordinated_turn_parity(goldens):
    g = goldens["ct_bearing"]
    dt = 0.1
    import scipy.linalg as sla
    rho_1, rho_2 = 0.1, 1.75e-4
    A = np.array([[dt ** 3 / 3, dt ** 2 / 2], [dt ** 2 / 2, dt]])
    Q = sla.block_diag(rho_1 * A, rho_1 * A, rho_2 * dt)
    dyn = CoordinatedTurnTransition.create(
        GaussRV.create(5, mean=np.array([1000., 300., 1000., 0., -3.0 * np.pi / 180]),
                       cov=np.diag([100., 10., 100., 10., 0.1])),
        GaussRV.create(5, cov=Q), dt=dt)
    sensors = 100.0 * np.vstack((np.eye(2), -np.eye(2)))
    obs = BearingMeasurement.create(GaussRV.create(4, cov=1e-3 * np.eye(4)),
                                    dim_state=5, state_index=[0, 2], sensor_pos=sensors)
    alg = st.CubatureKalman(dyn, obs)
    fm, fP = alg.forward_pass(g["y"][..., 0])
    assert_close(fm, g["ckf_fm"], "CT bearing CKF mean", atol=1e-7, rtol=1e-7)
    assert_close(fP, g["ckf_fP"], "CT bearing CKF cov", atol=1e-7, rtol=1e-7)


def test_ctrs_radar_parity(goldens):
    """Non-additive 5-state CTRS dynamics + radar (dim_in = 7 UT).

    ``compat_heading=True``: the golden was produced by the reference, whose
    code increments the heading by ``dt*heading`` instead of the documented
    ``dt*yaw_rate`` (``ssmod.py:763,771``); the default model here is the
    documented one (see docs/parity.md and test_ssmod_ssinf's heading test).
    """
    g = goldens["ctrs_radar"]
    dyn = ConstantTurnRateSpeed.create(
        GaussRV.create(5, mean=np.array([10., 0., 5., 0.5, 0.1]), cov=0.1 * np.eye(5)),
        GaussRV.create(2, cov=np.diag([0.1, 0.1 * np.pi])), dt=0.05,
        compat_heading=True)
    obs = Radar2DMeasurement.create(GaussRV.create(2, cov=np.diag([0.3, 0.03])),
                                    dim_state=5, state_index=[0, 1])
    alg = st.UnscentedKalman(dyn, obs)
    fm, fP = alg.forward_pass(g["y"][..., 0])
    assert_close(fm, g["ukf_fm"], "CTRS UKF mean", atol=1e-7, rtol=1e-7)
    assert_close(fP, g["ukf_fP"], "CTRS UKF cov", atol=1e-7, rtol=1e-7)


def test_reentry_parity(goldens):
    g = goldens["reentry"]
    dt = 0.05
    dyn = ReentryVehicle2DTransition.create(
        GaussRV.create(5, mean=np.array([6500.4, 349.14, -1.8093, -6.7967, 0.6932]),
                       cov=np.diag([1e-6, 1e-6, 1e-6, 1e-6, 1.0])),
        GaussRV.create(3, cov=np.diag([2.4064e-5, 2.4064e-5, 1e-6])), dt=dt)
    obs = Radar2DMeasurement.create(GaussRV.create(2, cov=np.diag([1e-3, 1e-5])),
                                    dim_state=5, state_index=[0, 1],
                                    radar_loc=np.array([6374.0, 0.0]))
    mulind5 = np.hstack([np.zeros((5, 1), dtype=int), np.eye(5, dtype=int),
                         2 * np.eye(5, dtype=int)])
    for name, alg in {
        "ukf": st.UnscentedKalman(dyn, obs),
        "bsqkf": st.BayesSardKalman(dyn, obs, np.array([[1.0, 1, 1, 1, 1, 1]]),
                                    np.array([[1.0, 0.9, 0.9, 1e4, 1e4, 1e4]]),
                                    mulind_dyn=mulind5, mulind_obs=mulind5, points="ut"),
    }.items():
        fm, fP = alg.forward_pass(g["y"][..., 0])
        assert_close(fm, g[f"{name}_fm"], f"reentry {name} mean", atol=1e-7, rtol=1e-6)
        assert_close(fP, g[f"{name}_fP"], f"reentry {name} cov", atol=1e-7, rtol=1e-6)


# ---------------------------------------------------------------------------
# Studentian filters
# ---------------------------------------------------------------------------

def test_student_filter_parity(goldens):
    g = goldens["ungm_student"]
    dyn = UNGMTransition.create(StudentRV.create(1, scale=1.0, dof=4.0),
                                StudentRV.create(1, scale=10.0, dof=4.0))
    obs = UNGMMeasurement.create(StudentRV.create(1, scale=0.01, dof=4.0), dim_state=1)
    for name, fixed in [("fsq3", True), ("fsq3_inc", False)]:
        alg = st.FullySymmetricStudent(dyn, obs, degree=3, dof=4.0, fixed_dof=fixed)
        fm, fP = alg.forward_pass(g["y"][..., 0])
        assert_close(fm, g[f"{name}_fm"], f"{name} mean")
        assert_close(fP, g[f"{name}_fP"], f"{name} cov")


# ---------------------------------------------------------------------------
# Kernel expectations, BQ weights, point sets, transform-level parity
# ---------------------------------------------------------------------------

def test_kernel_expectation_parity(goldens):
    g = goldens["transforms"]
    x, par = g["kern_x"], g["kern_par"]
    kern = RBFGauss.create(2, par)
    assert_close(kern.eval(par, x), g["kern_K"], "K")
    assert_close(kern.exp_x_kx(par, x), g["kern_q"], "q")
    assert_close(kern.exp_x_kxkx(par, par, x), g["kern_Q"], "Q")
    assert_close(kern.exp_x_xkx(par, x), g["kern_R"], "R")
    assert_close(jnp.atleast_1d(kern.exp_xy_kxy(par)), g["kern_kxy"], "kxy")


def test_rq_kernel_parity(goldens):
    """Parity on K/q/R/kxy; DOCUMENTED DEVIATION on Q: the reference adds
    the completed-square cross term with the wrong sign (``bqkern.py:686``),
    failing its own alpha->inf RBF limit by up to ~70% — we fix the sign
    (see docs/parity.md).  The golden is pinned to the reference's buggy
    formula (reconstructed here) so any further drift is still caught, and
    the fix itself is gated by the RBF-limit + MC test in test_bq."""
    from ssmtoybox_tpu.bq.kernels import RQ
    g = goldens["transforms"]
    x, par = g["kern_x"], g["rq_par"]
    rq = RQ.create(2, par)
    assert_close(rq.eval(par, x), g["rq_K"], "RQ K")
    assert_close(rq.exp_x_kx(par, x), g["rq_q"], "RQ q")
    assert_close(rq.exp_x_xkx(par, x), g["rq_R"], "RQ R")
    assert_close(jnp.atleast_1d(rq.exp_xy_kxy(par)), g["rq_kxy"], "RQ kxy")

    # reference's Q with the sign bug, reconstructed independently in numpy:
    # quad[i,j] = (z_i + z_j)^T R^-1 (z_i + z_j) with z = Lam^-1 x — the
    # reference ADDS it to xi_i + xi_j, the corrected form SUBTRACTS it
    alpha, ell = float(par[0, 1]), np.asarray(par[0, 2:])
    xs = np.asarray(x)
    inv_lam = ell ** -2.0
    r = 2.0 * inv_lam + 1.0
    xi = np.sum((xs / ell[:, None]) ** 2, axis=0)
    z = inv_lam[:, None] * xs                                  # (D, N)
    zz = z[:, :, None] + z[:, None, :]                         # (D, N, N)
    quad = np.einsum("dij,d,dij->ij", zz, 1.0 / r, zz)
    base = xi[:, None] + xi[None, :]
    det_term = np.prod(r) ** -0.5
    Q_ref = det_term * (1.0 + (base + quad) / (2.0 * alpha)) ** (-alpha)
    Q_fix = det_term * (1.0 + (base - quad) / (2.0 * alpha)) ** (-alpha)
    assert_close(jnp.asarray(Q_ref), g["rq_Q"], "RQ Q (reference formula)")
    assert_close(rq.exp_x_kxkx(par, par, x), jnp.asarray(Q_fix), "RQ Q (fixed)")


@pytest.mark.parametrize("point_str", ["ut", "sr", "gh"])
def test_gp_weights_parity(goldens, point_str):
    g = goldens["transforms"]
    par = g["kern_par"]
    gp = GaussianProcessModel.create(2, par, "rbf", point_str)
    w = gp.bq_weights(par)
    assert_close(w.wm, g[f"gp_{point_str}_wm"], "wm")
    assert_close(w.Wc, g[f"gp_{point_str}_wc"], "Wc")
    assert_close(w.Wcc, g[f"gp_{point_str}_wcc"], "Wcc")
    assert_close(jnp.atleast_1d(w.model_var), g[f"gp_{point_str}_emv"], "emv")
    assert_close(jnp.atleast_1d(w.integral_var), g[f"gp_{point_str}_ivar"], "ivar")


def test_tp_weights_parity(goldens):
    g = goldens["transforms"]
    par = g["kern_par"]
    tp = StudentTProcessModel.create(2, par, "rbf", "ut", nu=4.0)
    w = tp.bq_weights(par)
    assert_close(w.wm, g["tp_ut_wm"], "tp wm")
    assert_close(w.Wc, g["tp_ut_wc"], "tp Wc")
    assert_close(w.Wcc, g["tp_ut_wcc"], "tp Wcc")


def test_bsq_weights_parity(goldens):
    g = goldens["transforms"]
    par = g["kern_par"]
    bs = BayesSardModel.create(2, par, multi_ind=2, point_str="gh",
                               point_par={"degree": 3})
    np.testing.assert_array_equal(bs.mulind_np, g["bs_gh_mulind"])
    w = bs.bq_weights(par)
    assert_close(w.wm, g["bs_gh_wm"], "bs wm")
    assert_close(w.Wc, g["bs_gh_wc"], "bs Wc")
    assert_close(w.Wcc, g["bs_gh_wcc"], "bs Wcc")
    assert_close(jnp.atleast_1d(w.model_var), g["bs_gh_emv"], "bs emv")
    assert_close(jnp.atleast_1d(w.integral_var), g["bs_gh_ivar"], "bs ivar")


def test_bsq_unisolvent_weights_parity(goldens):
    g = goldens["transforms"]
    par = g["kern_par"]
    mulind = g["bs_uni_mulind"]
    bs = BayesSardModel.create(2, par, multi_ind=mulind, point_str="ut")
    w = bs.bq_weights(par)
    assert_close(w.wm, g["bs_uni_wm"], "bs uni wm")
    assert_close(w.Wc, g["bs_uni_wc"], "bs uni Wc")
    assert_close(w.Wcc, g["bs_uni_wcc"], "bs uni Wcc")
    assert_close(jnp.atleast_1d(w.model_var), g["bs_uni_emv"], "bs uni emv")
    # unisolvent BSQ on UT points reproduces classical UT mean weights
    assert_close(w.wm, pts.ut_weights(2)[0], "bs uni == UT wm")


def test_point_set_parity(goldens):
    g = goldens["transforms"]
    assert_close(pts.ut_points(3), g["ut3_pts"], "ut3 pts")
    wm, wc = pts.ut_weights(3)
    assert_close(wm, g["ut3_wm"], "ut3 wm")
    assert_close(wc, g["ut3_wc"], "ut3 wc")
    assert_close(pts.sr_points(4), g["sr4_pts"], "sr4 pts")
    assert_close(pts.sr_weights(4), g["sr4_w"], "sr4 w")
    assert_close(pts.gh_points(2, 4), g["gh2_pts"], "gh2 pts")
    assert_close(pts.gh_weights(2, 4), g["gh2_w"], "gh2 w")
    assert_close(pts.fs_points(3, 5, dof=6.0), g["fs3_pts_d5"], "fs3 pts d5")
    assert_close(pts.fs_weights(3, 5, dof=6.0), g["fs3_w_d5"], "fs3 w d5")
    assert_close(pts.fs_points(2, 3, dof=4.0), g["fs2_pts_d3"], "fs2 pts d3")
    assert_close(pts.fs_weights(2, 3, dof=4.0), g["fs2_w_d3"], "fs2 w d3")


def test_transform_apply_parity(goldens):
    g = goldens["transforms"]

    def polar2cartesian(x, pars):
        return x[0] * jnp.stack([jnp.cos(x[1]), jnp.sin(x[1])])

    mean_in, cov_in = g["p2c_mean_in"], g["p2c_cov_in"]
    ut = UnscentedTransform(2)
    mf, cf, ccf = ut.apply(polar2cartesian, jnp.asarray(mean_in), jnp.asarray(cov_in), None)
    assert_close(mf, g["p2c_ut_mf"], "p2c ut mean")
    assert_close(cf, g["p2c_ut_cf"], "p2c ut cov")
    assert_close(ccf, g["p2c_ut_ccf"], "p2c ut ccov")

    gpt = GaussianProcessTransform.create(2, 2, g["kern_par"], point_str="ut")
    mf, cf, ccf = gpt.apply(polar2cartesian, jnp.asarray(mean_in), jnp.asarray(cov_in), None)
    assert_close(mf, g["p2c_gpq_mf"], "p2c gpq mean")
    assert_close(cf, g["p2c_gpq_cf"], "p2c gpq cov")
    assert_close(ccf, g["p2c_gpq_ccf"], "p2c gpq ccov")


def test_linearization_taylor_transform_parity(goldens):
    """Linearization + Taylor-GPQD applies match the reference
    (mtran.py:49-60, 668-701); ours derives Jacobians with jacfwd instead of
    the reference's hand-written dx=True protocol."""
    from ssmtoybox_tpu.mtran import LinearizationTransform, TaylorGPQDTransform
    g = goldens["transforms2"]

    def p2c(x, pars):
        return x[0] * jnp.stack([jnp.cos(x[1]), jnp.sin(x[1])])

    mean2, cov2 = jnp.asarray(g["mean2"]), jnp.asarray(g["cov2"])
    lin = LinearizationTransform.create(2)
    mf, cf, ccf = lin.apply(p2c, mean2, cov2, None)
    assert_close(mf, g["lin_mf"], "lin mean")
    assert_close(cf, g["lin_cf"], "lin cov")
    assert_close(ccf, g["lin_ccf"], "lin ccov")

    tay = TaylorGPQDTransform.create(2, g["tay_par"])
    mf, cf, ccf = tay.apply(p2c, mean2, cov2, None)
    assert_close(mf, g["tay_mf"], "taylor mean")
    assert_close(cf, g["tay_cf"], "taylor cov")
    # ours returns (E, D); the reference returns (D, E) — see mtran.py docstring
    assert_close(ccf, g["tay_ccf"].T, "taylor ccov")


@pytest.mark.parametrize("name,make", [
    ("tut", lambda: __import__("ssmtoybox_tpu.mtran", fromlist=["x"]).TruncatedUnscentedTransform(3, 2)),
    ("tsr", lambda: __import__("ssmtoybox_tpu.mtran", fromlist=["x"]).TruncatedSphericalRadialTransform(3, 2)),
    ("tgh", lambda: __import__("ssmtoybox_tpu.mtran", fromlist=["x"]).TruncatedGaussHermiteTransform(3, 2, degree=3)),
])
def test_truncated_transform_parity(goldens, name, make):
    """Truncated sigma-point rules match the reference (mtran.py:588-658) on a
    3D input whose last dimension is irrelevant to the nonlinearity."""
    g = goldens["transforms2"]

    def p2c_aug(x, pars):
        return x[0] * jnp.stack([jnp.cos(x[1]), jnp.sin(x[1])])

    tf = make()
    mf, cf, ccf = tf.apply(p2c_aug, jnp.asarray(g["mean3"]), jnp.asarray(g["cov3"]), None)
    assert_close(mf, g[f"{name}_mf"], f"{name} mean")
    assert_close(cf, g[f"{name}_cf"], f"{name} cov")
    assert_close(ccf, g[f"{name}_ccf"], f"{name} ccov")


def test_multioutput_transform_parity(goldens):
    """MO-GPQ / MO-TPQ weights and applied moments match the reference's
    intended math (bqmod.py:1254-1316 weights + bqmtran.py:462-523 moment
    contractions; the reference's own transform-level plumbing is broken —
    see tools/gen_goldens.py scenario H3)."""
    from ssmtoybox_tpu.bq.transforms import (
        MultiOutputGaussianProcessTransform, MultiOutputStudentTProcessTransform)
    g = goldens["transforms2"]
    par_mo = g["mo_par"]
    mean2, cov2 = jnp.asarray(g["mean2"]), jnp.asarray(g["cov2"])

    def p2c(x, pars):
        return x[0] * jnp.stack([jnp.cos(x[1]), jnp.sin(x[1])])

    mo = MultiOutputGaussianProcessTransform.create(2, 2, par_mo, point_str="ut")
    assert_close(mo.wm, g["mo_gp_wm"], "mo-gp wm")
    assert_close(mo.Wc, g["mo_gp_wc"], "mo-gp Wc")
    assert_close(mo.Wcc, g["mo_gp_wcc"], "mo-gp Wcc")
    mf, cf, ccf = mo.apply(p2c, mean2, cov2, None)
    assert_close(mf, g["mo_gp_mf"], "mo-gp mean")
    assert_close(cf, g["mo_gp_cf"], "mo-gp cov")
    assert_close(ccf, g["mo_gp_ccf"], "mo-gp ccov")

    mo_tp = MultiOutputStudentTProcessTransform.create(2, 2, par_mo, point_str="ut", nu=4.0)
    assert_close(mo_tp.wm, g["mo_tp_wm"], "mo-tp wm")
    assert_close(mo_tp.Wc, g["mo_tp_wc"], "mo-tp Wc")
    assert_close(mo_tp.Wcc, g["mo_tp_wcc"], "mo-tp Wcc")
    mf, cf, ccf = mo_tp.apply(p2c, mean2, cov2, None)
    assert_close(mf, g["mo_tp_mf"], "mo-tp mean")
    assert_close(cf, g["mo_tp_cf"], "mo-tp cov")
    assert_close(ccf, g["mo_tp_ccf"], "mo-tp ccov")


# ---------------------------------------------------------------------------
# GPQ+D derivative kernel / weights / transform
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("prefix,dim", [("d1", 1), ("d2", 2)])
def test_gpqd_kernel_parity(goldens, prefix, dim):
    from ssmtoybox_tpu.bq.gpqd import RBFGaussDer
    g = goldens["gpqd"]
    x, par = g[f"{prefix}_x"], g[f"{prefix}_par"]
    kern = RBFGaussDer.create(dim, par)
    assert_close(kern.eval(par, jnp.asarray(x)), g[f"{prefix}_K"], "joint K")
    assert_close(kern.exp_x_dkx(par, jnp.asarray(x)), g[f"{prefix}_qd"], "qd")
    assert_close(kern.exp_x_xdkx(par, jnp.asarray(x)), g[f"{prefix}_Rd"], "Rd")
    assert_close(kern.exp_x_kxdkx(par, jnp.asarray(x)), g[f"{prefix}_Qfd"], "Qfd")
    assert_close(kern.exp_x_dkxdkx(par, jnp.asarray(x)), g[f"{prefix}_Qdd"], "Qdd")


def test_gpqd_transform_parity(goldens):
    from ssmtoybox_tpu.bq.gpqd import GaussianProcessDerTransform
    g = goldens["gpqd"]
    par = g["d2_par"]
    tf = GaussianProcessDerTransform.create(2, 2, par, point_str="ut")
    w = tf.model.bq_weights(par)
    assert_close(w.wm, g["gpqd_wm"], "gpqd wm")
    assert_close(w.Wc, g["gpqd_wc"], "gpqd Wc")
    assert_close(w.Wcc, g["gpqd_wcc"], "gpqd Wcc")
    assert_close(jnp.atleast_1d(w.model_var), g["gpqd_emv"], "gpqd emv")
    assert_close(jnp.atleast_1d(w.integral_var), g["gpqd_ivar"], "gpqd ivar")

    def p2c(x, pars):
        return x[0] * jnp.stack([jnp.cos(x[1]), jnp.sin(x[1])])

    mf, cf, ccf = tf.apply(p2c, jnp.asarray(g["gpqd_mean_in"]),
                           jnp.asarray(g["gpqd_cov_in"]), None)
    assert_close(mf, g["gpqd_mf"], "gpqd mean")
    assert_close(cf, g["gpqd_cf"], "gpqd cov")
    assert_close(ccf, g["gpqd_ccf"], "gpqd ccov")


def test_marginal_inference_study_parity(goldens):
    """Parameter-marginalized GPQ filtering (``ssinf.py:1102-1270``).

    Exact moment parity is unattainable: the reference's inner BFGS uses
    finite-difference gradients and its BFGS-estimated inverse Hessian as the
    Laplace covariance, while ours differentiates the same objective exactly.
    The study-level check: same data, same prior ⇒ comparable RMSE (within
    25%) and finite PD filtered covariances.
    """
    g = goldens["marginal_ungm"]
    dyn, obs = _ungm_models()
    f = st.ssinf.MarginalizedGaussianProcessKalman(dyn, obs, points="ut")
    fm, fP = f.forward_pass(jnp.asarray(g["y"]))
    fm, fP = np.asarray(fm), np.asarray(fP)
    assert np.isfinite(fm).all() and np.isfinite(fP).all()
    assert (fP[0, 0, :] > 0).all()
    rmse = float(np.sqrt(np.mean((fm - g["x"]) ** 2)))
    ref_rmse = float(g["rmse"][0])
    assert rmse < 1.25 * ref_rmse, (rmse, ref_rmse)


@pytest.mark.parametrize("tag", ["dyn",
                                 pytest.param("obs", marks=pytest.mark.slow)])
def test_tpq_cv_weight_parity(goldens, tag):
    """TPQ weights on the FUSION-2017 CV-glint kernel parameters
    (``research/tpq/tpq_constant_velocity.py:62-68``) vs the reference.

    The regression this guards: these parameters give ``lambda_min(K) ~
    1e-7``, so the composed ``iK Q iK`` weight form amplifies ANY
    unstructured error in the accumulated Q by ~1e16 — even exact-f64
    2e6-sample matmul accumulation rounds enough (~1e-11/entry) to push
    ``eigmax(Wc)`` from ~2.2 to ~580 and diverge the TPQSF filter 100%.
    The projected weight-space accumulation
    (``RBFStudent.projected_weight_stats``) must stay inside the reference's
    own Monte-Carlo seed-to-seed spread (measured at 2e6 samples: wm 8e-4,
    Wc 0.18, Wcc 0.08, emv 6% on the dyn parameters; we run 1e6 samples for
    test speed, ~1.4x the noise — tolerances carry ~2x headroom on top)."""
    g = goldens["tpq_cv_weights"]
    from ssmtoybox_tpu.bq.transforms import StudentTProcessTransform
    # default profile checks the dyn parameters (the ones that triggered the
    # regression); the obs row exercises the identical code path and runs in
    # the slow/nightly profile
    t = StudentTProcessTransform.create(
        4, 1, g[f"{tag}_par"], "rbf-student", "fs", point_par={"dof": 4.0},
        nu=4.0, mc_opts={"num_samples": 1_000_000})
    np.testing.assert_allclose(np.asarray(t.wm), g[f"{tag}_wm"], atol=5e-3)
    np.testing.assert_allclose(np.asarray(t.Wc), g[f"{tag}_Wc"], atol=0.5)
    np.testing.assert_allclose(np.asarray(t.Wcc), g[f"{tag}_Wcc"], atol=0.25)
    np.testing.assert_allclose(float(t.model_var), float(g[f"{tag}_emv"][0]),
                               rtol=0.3)
    lam = np.linalg.eigvalsh(np.asarray(t.Wc))
    lam_ref = np.linalg.eigvalsh(g[f"{tag}_Wc"])
    # the broken composed form gave eigmax ~580 vs the reference's 2-6
    assert lam[0] > -1e-10 and lam[-1] < 2.0 * lam_ref[-1], (lam, lam_ref)


def test_marginal_bfgs_vs_newton_quantified(goldens):
    """Quantified drift gate between ``MarginalInference.forward_pass`` (the
    reference-faithful per-step scipy-BFGS Laplace) and
    ``forward_pass_compiled`` (scan-Newton), on the golden UNGM scenario.

    Pointwise late-step agreement is NOT a meaningful invariant: the per-step
    parameter posterior is multimodal, the two optimizers settle in different
    modes from step 2 on (measured per-step |Δmean| median ≈ 3.8 on a state
    scale of ~21), and a single mode flip propagates.  The stable, testable
    contract is: (a) tight agreement on step 1 (same prior, same unimodal
    Laplace target) and (b) study-level accuracy agreement — both paths'
    RMSE within 1.5 of each other and both within 1.25x the reference golden.
    """
    g = goldens["marginal_ungm"]
    dyn, obs = _ungm_models()
    f = st.ssinf.MarginalizedGaussianProcessKalman(dyn, obs, points="ut")
    fm_b, _ = f.forward_pass(jnp.asarray(g["y"]))
    f.reset()
    fm_n, fP_n = f.forward_pass_compiled(jnp.asarray(g["y"]))
    fm_b, fm_n = np.asarray(fm_b), np.asarray(fm_n)
    assert np.isfinite(fm_n).all() and np.isfinite(np.asarray(fP_n)).all()
    # (a) step-1: both approximate the same Laplace posterior from the prior
    np.testing.assert_allclose(fm_n[:, :1], fm_b[:, :1], rtol=0.05, atol=0.05)
    # (b) study level (measured: bfgs 10.83, newton 10.58, golden 12.49)
    rmse_b = float(np.sqrt(np.mean((fm_b - g["x"]) ** 2)))
    rmse_n = float(np.sqrt(np.mean((fm_n - g["x"]) ** 2)))
    ref_rmse = float(g["rmse"][0])
    assert abs(rmse_b - rmse_n) <= 1.5, (rmse_b, rmse_n)
    assert rmse_n < 1.25 * ref_rmse, (rmse_n, ref_rmse)


# ---------------------------------------------------------------------------
# Metrics
# ---------------------------------------------------------------------------

def test_metrics_parity(goldens):
    g = goldens["metrics"]
    x, m, P, MSE, est = g["x"], g["m"], g["P"], g["MSE"], g["est"]
    assert_close(M.squared_error(jnp.asarray(x), jnp.asarray(m)), g["se"], "se")
    assert_close(M.mse_matrix(jnp.asarray(x), jnp.asarray(est)), g["msem"], "mse matrix")
    assert_close(jnp.atleast_1d(M.log_cred_ratio(x, m, P, MSE)), g["lcr"], "lcr")
    assert_close(jnp.atleast_1d(M.neg_log_likelihood(x, m, P)), g["nll"], "nll")
    assert_close(jnp.atleast_1d(M.kl_divergence(x, P, m, MSE)), g["kl"], "kl")
    assert_close(jnp.atleast_1d(M.symmetrized_kl_divergence(x, P, m, MSE)), g["skl"], "skl")
