"""Double-double sigma-point filtering for small vector-state models (D <= 8).

Round 4 re-expressed the SCALAR filter step in explicit f32-pair arithmetic
and halved the emulated-f64 UNGM lanes (:mod:`ssmtoybox_tpu.ops.ddfilter`).
This module lifts the same technique to vector states: the reentry-tracking
lane (``/root/reference/ssmtoybox/ssmod.py:438-584``) is 55% of the headline
wall-clock and profiling proved it compute-bound on emulated-f64 arithmetic
(docs/performance.md "Where the time went") — exactly the cost class the dd
engines eliminate.  The whole filter step — Cholesky of P (D x D), sigma
points, dynamics with ``exp``-drag, radar measurement with ``atan2``,
Kalman gain through a 2 x 2 Cholesky solve — unrolls into a pure-f32
elementwise graph over the trajectory batch, built from:

- :mod:`ssmtoybox_tpu.ops.ddmath` — dd scalar ops incl. ``exp``/``atan2``;
- :mod:`ssmtoybox_tpu.ops.ddlinalg` — the f64 path's unrolled small-matrix
  recurrences (``utils/linalg.py``) on dd pairs.

Unlike the r4 scalar engine (means only), this engine emits the FULL moment
set — filtered mean/cov plus the predictive moments the RTS smoother
consumes — so it can stand in for :func:`ssmtoybox_tpu.ssinf.
gaussian_filter_batch` behind the public ``engine="dd"`` switch.  Scalar
(D == 1) models run through the same code path via adapters around the
scalar registry, giving them full outputs too.

Precision contract: identical to the scalar engine's tiered contract
(``ops/ddfilter.py`` module docstring) — per-op ~2^-48, statistical
study-level agreement with the f64 path (reentry study RMSE matches to
~1e-6 relative; regression-tested in tests/test_ddvec.py).  The headline
bench keeps the jnp-f64 lanes as the metric of record; dd lanes are
reported separately (``bench.py`` ``dd_lanes``, ``tools/bench_dd.py``).
"""
from __future__ import annotations

import collections

import numpy as np
import jax
import jax.numpy as jnp

from . import ddmath as dd
from . import ddlinalg as ddl
from ..mtran import SigmaPointTransform
from ..bq.transforms import BQTransform, StudentTProcessTransform
from ..ssmod import ReentryVehicle2DTransition, Radar2DMeasurement

__all__ = [
    "dd_filter_batch", "dd_filter_batch_jit", "dd_supports", "dd_check",
    "register_dyn_dd_vec", "register_obs_dd_vec",
]

#: Largest state dimension the unrolled dd engine accepts (matches the f64
#: path's ``SMALL_DIM_MAX`` economics: beyond this the emitted-op count
#: outgrows the benefit).
DIM_MAX = 8


# ---------------------------------------------------------------------------
# vector dd model registry
# ---------------------------------------------------------------------------

_DYN_DD_VEC = {}
_OBS_DD_VEC = {}


def register_dyn_dd_vec(model_cls, lower):
    """Register a vector transition model for dd filtering.

    ``lower(model, n_steps) -> (streams, eval)`` where ``streams`` is a list
    of per-step host f64 arrays (n_steps,) — time-dependent constants,
    hoisted out of the compiled step — and ``eval(x, c) -> list[dd]`` is the
    dynamics in dd arithmetic (``x``: list of D dd scalars, ``c``: list of
    dd per-step constants, one per stream).
    """
    _DYN_DD_VEC[model_cls] = lower


def register_obs_dd_vec(model_cls, lower):
    """Register a vector measurement model: ``lower(model) -> eval`` with
    ``eval(x: list[D dd]) -> list[E dd]`` (the eval does its own
    ``state_index`` gather, like ``MeasurementModel.meas_eval``)."""
    _OBS_DD_VEC[model_cls] = lower


def _reentry_lower(model, n_steps):
    """Reentry dynamics in dd (``ssmod.py:438-584``; fused drag exponent as
    in :meth:`ReentryVehicle2DTransition._drag_gravity`)."""
    dt = dd.const(model.dt)
    R0 = dd.const(model.R0)
    H0 = dd.const(model.H0)
    Gm0 = dd.const(model.Gm0)
    b0 = dd.const(model.b0)

    def eval_dd(x, c):
        x0, x1, x2, x3, x4 = x
        R = dd.sqrt(dd.add(dd.sqr(x0), dd.sqr(x1)))
        V = dd.sqrt(dd.add(dd.sqr(x2), dd.sqr(x3)))
        drag = dd.mul(dd.mul(b0, dd.exp(dd.add(x4, dd.div(dd.sub(R0, R), H0)))), V)
        grav = dd.neg(dd.div(Gm0, dd.mul(R, dd.sqr(R))))
        return [
            dd.add(x0, dd.mul(dt, x2)),
            dd.add(x1, dd.mul(dt, x3)),
            dd.add(x2, dd.mul(dt, dd.add(dd.mul(drag, x2), dd.mul(grav, x0)))),
            dd.add(x3, dd.mul(dt, dd.add(dd.mul(drag, x3), dd.mul(grav, x1)))),
            x4,
        ]

    return [], eval_dd


def _radar_lower(model):
    """Range + bearing radar in dd (``ssmod.py:1201-1255``): dd ``sqrt`` for
    the range, dd ``atan2`` for the bearing."""
    loc = np.asarray(model.radar_loc, np.float64).ravel()
    idx = (model.state_index if model.state_index is not None
           else tuple(range(model.dim_substate)))
    l0, l1 = dd.const(loc[0]), dd.const(loc[1])

    def eval_dd(x):
        dxx = dd.sub(x[idx[0]], l0)
        dyy = dd.sub(x[idx[1]], l1)
        rng = dd.sqrt(dd.add(dd.sqr(dxx), dd.sqr(dyy)))
        return [rng, dd.atan2(dyy, dxx)]

    return eval_dd


def _pendulum_lower(model, n_steps):
    """Pendulum dynamics in dd (``ssmod.py:309-365``)."""
    dt = dd.const(model.dt)
    gdt = dd.const(model.g * model.dt)

    def eval_dd(x, c):
        s, _ = dd.sincos(x[0])
        return [dd.add(x[0], dd.mul(dt, x[1])),
                dd.sub(x[1], dd.mul(gdt, s))]

    return [], eval_dd


def _reentry1d_lower(model, n_steps):
    """1D reentry dynamics in dd (``ssmod.py:368-435``)."""
    dt = dd.const(model.dt)
    ngam = dd.const(-model.Gamma)

    def eval_dd(x, c):
        e = dd.exp(dd.mul(ngam, x[0]))
        return [dd.sub(x[0], dd.mul(dt, x[1])),
                dd.sub(x[1], dd.mul(dt, dd.mul(dd.mul(e, dd.sqr(x[1])), x[2]))),
                x[2]]

    return [], eval_dd


def _ct_lower(model, n_steps):
    """Coordinated-turn dynamics in dd (``ssmod.py:587-696``), with the
    same ``om -> 0`` limit substitution as the f64 path (``c -> dt``,
    ``d -> 0`` via select — NaN-free for any input)."""
    dt = dd.const(model.dt)
    one = dd.const(1.0)
    tiny = np.float32(1e-30)

    def eval_dd(x, c):
        om = x[4]
        cond = jnp.abs(om[0]) < tiny
        om_safe = dd.where(cond, dd.const(float(tiny)), om)
        s, co = dd.sincos(dd.mul(om, dt))
        cc = dd.where(cond, dt, dd.div(s, om_safe))
        ds = dd.where(cond, dd.const(0.0), dd.div(dd.sub(one, co), om_safe))
        return [
            dd.sub(dd.add(x[0], dd.mul(cc, x[1])), dd.mul(ds, x[3])),
            dd.sub(dd.mul(co, x[1]), dd.mul(s, x[3])),
            dd.add(dd.add(x[2], dd.mul(ds, x[1])), dd.mul(cc, x[3])),
            dd.add(dd.mul(s, x[1]), dd.mul(co, x[3])),
            x[4],
        ]

    return [], eval_dd


def _cv_lower(model, n_steps):
    """Constant-velocity dynamics in dd (``ssmod.py:783-855``; the noise
    gain enters through the additive GQG^T term, as in the f64 filter)."""
    dt = dd.const(model.dt)

    def eval_dd(x, c):
        return [dd.add(x[0], dd.mul(dt, x[1])), x[1],
                dd.add(x[2], dd.mul(dt, x[3])), x[3]]

    return [], eval_dd


def _obs_idx(model, default):
    return (tuple(model.state_index) if model.state_index is not None
            else default)


def _pend_meas_lower(model):
    """``z = sin(alpha)`` (``ssmod.py:1092-1118``)."""
    idx = _obs_idx(model, (0,))

    def eval_dd(x):
        s, _ = dd.sincos(x[idx[0]])
        return [s]

    return eval_dd


def _range_lower(model):
    """Range to a falling body (``ssmod.py:1121-1152``)."""
    sx2 = dd.const(float(model.sx) ** 2)
    sy = dd.const(float(model.sy))
    idx = _obs_idx(model, (0,))

    def eval_dd(x):
        dyv = dd.sub(x[idx[0]], sy)
        return [dd.sqrt(dd.add(sx2, dd.sqr(dyv)))]

    return eval_dd


def _bearing_lower(model):
    """S bearing sensors, dd ``atan2`` each (``ssmod.py:1155-1198``)."""
    pos = np.asarray(model.sensor_pos, np.float64)
    idx = _obs_idx(model, (0, 1))
    pos_c = [(dd.const(pos[s, 0]), dd.const(pos[s, 1]))
             for s in range(pos.shape[0])]

    def eval_dd(x):
        return [dd.atan2(dd.sub(x[idx[1]], py), dd.sub(x[idx[0]], px))
                for px, py in pos_c]

    return eval_dd


register_dyn_dd_vec(ReentryVehicle2DTransition, _reentry_lower)
register_obs_dd_vec(Radar2DMeasurement, _radar_lower)

from ..ssmod import (Pendulum2DTransition, Pendulum2DMeasurement,          # noqa: E402
                     ReentryVehicle1DTransition, RangeMeasurement,
                     CoordinatedTurnTransition, ConstantVelocity,
                     BearingMeasurement)

register_dyn_dd_vec(Pendulum2DTransition, _pendulum_lower)
register_dyn_dd_vec(ReentryVehicle1DTransition, _reentry1d_lower)
register_dyn_dd_vec(CoordinatedTurnTransition, _ct_lower)
register_dyn_dd_vec(ConstantVelocity, _cv_lower)
register_obs_dd_vec(Pendulum2DMeasurement, _pend_meas_lower)
register_obs_dd_vec(RangeMeasurement, _range_lower)
register_obs_dd_vec(BearingMeasurement, _bearing_lower)


def _vec_registry_lookup(registry, model):
    """MRO-aware lookup: BearingMeasurement instances carry a cached
    per-sensor-count SUBCLASS (``ssmod._bearing_class``), so an exact
    ``type(model)`` match misses the registration on the base class."""
    for t in type(model).__mro__:
        if t in registry:
            return registry[t]
    return None


def _dyn_lower_for(model, n_steps):
    """Resolve a vector lowering; scalar-registry models (D == 1) adapt."""
    t = type(model)
    lower = _vec_registry_lookup(_DYN_DD_VEC, model)
    if lower is not None:
        return lower(model, n_steps)
    from .ddfilter import _DYN_DD
    if model.dim_state == 1 and t in _DYN_DD:
        consts_fn, eval_sc = _DYN_DD[t]
        stream = np.asarray(consts_fn(model, n_steps), np.float64)

        def eval_dd(x, c):
            return [eval_sc(model, x[0], c[0])]

        return [stream], eval_dd
    raise KeyError(f"no dd dynamics registered for {t.__name__} "
                   "(register_dyn_dd_vec / ddfilter.register_dyn_dd)")


def _obs_lower_for(model):
    t = type(model)
    lower = _vec_registry_lookup(_OBS_DD_VEC, model)
    if lower is not None:
        return lower(model)
    from .ddfilter import _OBS_DD
    if model.dim_out == 1 and t in _OBS_DD:
        eval_sc = _OBS_DD[t]
        idx = (model.state_index if model.state_index is not None
               else (0,))

        def eval_dd(x):
            return [eval_sc(model, x[idx[0]])]

        return eval_dd
    raise KeyError(f"no dd measurement registered for {t.__name__} "
                   "(register_obs_dd_vec / ddfilter.register_obs_dd)")


# ---------------------------------------------------------------------------
# transform lowering: (points, weights) baked as dd constants
# ---------------------------------------------------------------------------

def _lower_transform_vec(tf, dim_in, dim_out):
    """Return a dd ``apply(m, P, f) -> (mu, Pf, Cf)`` closure for ``tf``.

    ``m``: list of ``dim_in`` dd scalars; ``P``: full symmetric list-of-lists;
    ``f``: list -> list of ``dim_out`` dd.  ``Cf`` is the (E, D) input-output
    cross-covariance, matching the f64 conventions exactly:
    classical — centered diagonal-weight quadrature (``mtran.py:153-172``);
    BQ — uncentered dense-Wc quadrature + expected-model-variance inflation
    (``bq/transforms.py:80-103``).
    """
    if isinstance(tf, SigmaPointTransform):
        if tf.wc_diag is None:
            raise ValueError("dd engine needs diagonal classical weights "
                             "(wc_diag); dense-Wc classical rules unsupported")
        xi = np.asarray(tf.unit_sp, np.float64)
        if xi.shape[0] != dim_in:
            raise ValueError(f"transform dimension {xi.shape[0]} != expected "
                             f"{dim_in} (non-additive augmentation is not "
                             "supported by the dd engine)")
        wm_c = [dd.const(v) for v in np.asarray(tf.wm, np.float64)]
        wc_c = [dd.const(v) for v in np.asarray(tf.wc_diag, np.float64)]
        n = xi.shape[1]
        xi_c = [[dd.const(xi[k, j]) for j in range(n)] for k in range(dim_in)]

        def apply_classical(m, P, f):
            L = ddl.chol(P)
            dxs, fs = [], []
            for j in range(n):
                dx = []
                for a in range(dim_in):
                    acc = None
                    for k in range(a + 1):          # L is lower-triangular
                        if xi[k, j] == 0.0:          # trace-time sparsity
                            continue
                        term = dd.mul(L[a][k], xi_c[k][j])
                        acc = term if acc is None else dd.add(acc, term)
                    dx.append(acc if acc is not None else ddl.zeros(m[0]))
                dxs.append(dx)
                fs.append(f([dd.add(m[a], dx[a]) for a in range(dim_in)]))
            E = dim_out
            mu = [ddl.wsum([fs[j][e] for j in range(n)], wm_c) for e in range(E)]
            ds = [[dd.sub(fs[j][e], mu[e]) for e in range(E)] for j in range(n)]
            Pf = [[None] * E for _ in range(E)]
            for a in range(E):
                for b in range(a + 1):
                    v = ddl.wsum([dd.mul(ds[j][a], ds[j][b]) for j in range(n)], wc_c)
                    Pf[a][b] = Pf[b][a] = v
            Cf = [[ddl.wsum([dd.mul(ds[j][e], dxs[j][d]) for j in range(n)], wc_c)
                   for d in range(dim_in)] for e in range(E)]
            return mu, Pf, Cf

        return apply_classical

    if isinstance(tf, BQTransform):
        if isinstance(tf, StudentTProcessTransform):
            raise ValueError("TPQ's data-dependent scale is not supported by "
                             "the dd engine")
        pts = np.asarray(tf.model.points, np.float64)
        if pts.shape[0] != dim_in:
            raise ValueError(f"transform dimension {pts.shape[0]} != expected "
                             f"{dim_in}")
        wm = np.asarray(tf.wm, np.float64).ravel()
        Wc = np.asarray(tf.Wc, np.float64)
        Wcc = np.asarray(tf.Wcc, np.float64)              # (D, n)
        emv_c = dd.const(float(np.asarray(tf.model_var).reshape(())))
        n = pts.shape[1]
        pts_c = [[dd.const(pts[k, j]) for j in range(n)] for k in range(dim_in)]
        wm_c = [dd.const(v) for v in wm]
        wc_c = [[dd.const(Wc[i, j]) for j in range(n)] for i in range(n)]
        wcc_c = [[dd.const(Wcc[a, j]) for j in range(n)] for a in range(dim_in)]

        def apply_bq(m, P, f):
            L = ddl.chol(P)
            fs = []
            for j in range(n):
                x = []
                for a in range(dim_in):
                    acc = m[a]
                    for k in range(a + 1):
                        if pts[k, j] == 0.0:
                            continue
                        acc = dd.add(acc, dd.mul(L[a][k], pts_c[k][j]))
                    x.append(acc)
                fs.append(f(x))
            E = dim_out
            mu = [ddl.wsum([fs[j][e] for j in range(n)], wm_c) for e in range(E)]
            # g[e][i] = sum_j Wc[i, j] f_j[e]  (uncentered quadrature)
            g = [[ddl.wsum([fs[j][e] for j in range(n)], wc_c[i])
                  for i in range(n)] for e in range(E)]
            Pf = [[None] * E for _ in range(E)]
            for a in range(E):
                for b in range(a + 1):
                    # sum_i f_i[a] g[b][i]  (both operands traced dd)
                    v = dd.mul(fs[0][a], g[b][0])
                    for i in range(1, n):
                        v = dd.add(v, dd.mul(fs[i][a], g[b][i]))
                    v = dd.sub(v, dd.mul(mu[a], mu[b]))
                    if a == b:
                        v = dd.add(v, emv_c)
                    Pf[a][b] = Pf[b][a] = v
            # h[e][a] = sum_j Wcc[a, j] f_j[e];  Cf = h L^T
            h = [[ddl.wsum([fs[j][e] for j in range(n)], wcc_c[a])
                  for a in range(dim_in)] for e in range(E)]
            Cf = [[None] * dim_in for _ in range(E)]
            for e in range(E):
                for d_ in range(dim_in):
                    acc = dd.mul(h[e][0], L[d_][0])
                    for a in range(1, d_ + 1):
                        acc = dd.add(acc, dd.mul(h[e][a], L[d_][a]))
                    Cf[e][d_] = acc
            return mu, Pf, Cf

        return apply_bq

    raise ValueError(f"unsupported transform for the dd engine: {type(tf)!r}")


# ---------------------------------------------------------------------------
# the filter
# ---------------------------------------------------------------------------

def dd_check(mod_dyn, mod_obs, tf_dyn, tf_obs):
    """Raise (ValueError/KeyError) with the reason the dd engine cannot run
    this configuration; return silently when it can."""
    if mod_dyn.dim_state > DIM_MAX:
        raise ValueError(f"dd engine supports dim_state <= {DIM_MAX}; "
                         f"got {mod_dyn.dim_state}")
    if not (mod_dyn.noise_additive and mod_obs.noise_additive):
        raise ValueError("dd engine requires additive process and "
                         "measurement noise")
    _dyn_lower_for(mod_dyn, 1)
    _obs_lower_for(mod_obs)
    _lower_transform_vec(tf_dyn, mod_dyn.dim_state, mod_dyn.dim_state)
    _lower_transform_vec(tf_obs, mod_dyn.dim_state, mod_obs.dim_out)


def dd_supports(mod_dyn, mod_obs, tf_dyn, tf_obs) -> bool:
    """True if :func:`dd_filter_batch` can run this configuration."""
    try:
        dd_check(mod_dyn, mod_obs, tf_dyn, tf_obs)
        return True
    except (ValueError, KeyError):
        return False


def _prepare(mod_dyn, mod_obs, tf_dyn, tf_obs, n_steps, init_mean, init_cov):
    D = mod_dyn.dim_state
    E = mod_obs.dim_out
    apply_dyn = _lower_transform_vec(tf_dyn, D, D)
    apply_obs = _lower_transform_vec(tf_obs, D, E)
    streams, dyn_eval = _dyn_lower_for(mod_dyn, n_steps)
    obs_eval = _obs_lower_for(mod_obs)

    m0, P0 = mod_dyn.init_rv.get_stats()[:2]
    if init_mean is not None:
        m0 = init_mean
    if init_cov is not None:
        P0 = init_cov
    m0 = np.asarray(m0, np.float64).reshape(D)
    P0 = np.asarray(P0, np.float64).reshape(D, D)
    G = np.atleast_2d(np.asarray(mod_dyn.noise_gain, np.float64))
    Q = np.atleast_2d(np.asarray(mod_dyn.noise_rv.get_stats()[1], np.float64))
    R = np.atleast_2d(np.asarray(mod_obs.noise_rv.get_stats()[1], np.float64))
    GQG = G @ Q @ G.T
    gqg_c = [[dd.const(GQG[i, j]) for j in range(D)] for i in range(D)]
    r_c = [[dd.const(R[i, j]) for j in range(E)] for i in range(E)]

    def step_math(m, P, y, c):
        """One Gaussian filter step in dd, specialized additive-noise
        (``ssinf.py:254-323`` in the reference; ``_gaussian_time_update`` +
        ``_kalman_update`` here)."""
        m_pr, Pf, xx = apply_dyn(m, P, lambda x: dyn_eval(x, c))
        P_pr = ddl.mat_add(Pf, gqg_c)
        y_pr, S0, C = apply_obs(m_pr, P_pr, obs_eval)
        S = ddl.mat_add(S0, r_c)
        Ls = ddl.chol(S)
        # gain (D, E) = solve(S, C).T, column by column of C's D columns
        gain = [[None] * E for _ in range(D)]
        for d_ in range(D):
            w = ddl.cho_solve_vec(Ls, [C[e][d_] for e in range(E)])
            for e in range(E):
                gain[d_][e] = w[e]
        dy = [dd.sub(y[e], y_pr[e]) for e in range(E)]
        m_fi = []
        for d_ in range(D):
            acc = m_pr[d_]
            for e in range(E):
                acc = dd.add(acc, dd.mul(gain[d_][e], dy[e]))
            m_fi.append(acc)
        # P_fi = P_pr - gain S gain^T  via T = gain @ S
        T = [[None] * E for _ in range(D)]
        for d_ in range(D):
            for e in range(E):
                acc = dd.mul(gain[d_][0], S[0][e])
                for e2 in range(1, E):
                    acc = dd.add(acc, dd.mul(gain[d_][e2], S[e2][e]))
                T[d_][e] = acc
        P_fi = [[None] * D for _ in range(D)]
        for a in range(D):
            for b in range(a + 1):
                acc = dd.mul(T[a][0], gain[b][0])
                for e in range(1, E):
                    acc = dd.add(acc, dd.mul(T[a][e], gain[b][e]))
                v = dd.sub(P_pr[a][b], acc)
                P_fi[a][b] = P_fi[b][a] = v
        return m_fi, P_fi, (m_pr, P_pr, xx)

    return step_math, streams, (m0, P0), (D, E)


def dd_filter_batch(mod_dyn, mod_obs, tf_dyn, tf_obs, data_batch,
                    init_mean=None, init_cov=None, unroll: int = 1):
    """Batched Gaussian forward pass in double-double arithmetic.

    Drop-in counterpart of :func:`ssmtoybox_tpu.ssinf.gaussian_filter_batch`
    for registered small-state additive-noise configurations: ``data_batch``
    is (B, dim_y, N) and the returned ``FilterResult`` carries the full
    stacked moments in the reference layout — fi_mean (B, D, N), fi_cov
    (B, D, D, N), plus the predictive moments the RTS smoother consumes —
    all converted to the default float dtype at the HBM boundary.

    The function is traceable w.r.t. ``data_batch`` only (model/transform
    constants are baked at trace time); callers jit it with the
    configuration closed over, as :meth:`GaussianInference.
    forward_pass_batch` does.  ``init_mean``/``init_cov`` must be concrete
    (host) values.
    """
    from ..ssinf import FilterResult

    ys = jnp.asarray(data_batch)
    B, E_in, N = ys.shape
    step_math, streams, (m0, P0), (D, E) = _prepare(
        mod_dyn, mod_obs, tf_dyn, tf_obs, N, init_mean, init_cov)
    if E_in != E:
        raise ValueError(f"data_batch dim_y {E_in} != model dim_out {E}")

    y_hi, y_lo = dd.from_f64(ys.transpose(2, 1, 0))            # (N, E, B)
    c_pairs = []
    for s in streams:
        hi = s.astype(np.float32)
        lo = (s - hi.astype(np.float64)).astype(np.float32)
        c_pairs.append((jnp.asarray(hi), jnp.asarray(lo)))

    m_init = [dd.const(m0[a], (B,)) for a in range(D)]
    P_init = [[dd.const(P0[a, b], (B,)) for b in range(D)] for a in range(D)]

    def step(carry, inp):
        m, P = carry
        yh, yl, c = inp
        y = [(yh[e], yl[e]) for e in range(E)]
        m_fi, P_fi, (m_pr, P_pr, xx) = step_math(m, P, y, c)
        return (m_fi, P_fi), (m_fi, P_fi, m_pr, P_pr, xx)

    xs = (y_hi, y_lo, c_pairs)
    _, (fm, fP, pm, pP, pxx) = jax.lax.scan(step, (m_init, P_init), xs,
                                            unroll=unroll)

    def vec_out(v):      # list[D] of dd (N, B) -> (B, D, N)
        return jnp.stack([dd.to_f64(v[a]) for a in range(len(v))],
                         axis=0).transpose(2, 0, 1)

    def mat_out(M):      # list[D][D] of dd (N, B) -> (B, D, D, N)
        rows = [jnp.stack([dd.to_f64(M[a][b]) for b in range(len(M[a]))], axis=0)
                for a in range(len(M))]
        return jnp.stack(rows, axis=0).transpose(3, 0, 1, 2)

    return FilterResult(
        fi_mean=vec_out(fm), fi_cov=mat_out(fP),
        pr_mean=vec_out(pm), pr_cov=mat_out(pP), pr_xx_cov=mat_out(pxx))


# ---------------------------------------------------------------------------
# cached jit entry — what the public ``engine="dd"`` switch calls
# ---------------------------------------------------------------------------

#: LRU of compiled dd filters keyed by configuration identity.  The cache
#: holds STRONG references to the model/transform objects, which both keeps
#: their jitted closures warm across calls (``dd_filter_batch`` bakes every
#: constant at trace time, so a fresh lambda per call would retrace) and
#: pins their ``id()``s — an id in the key can never be reused while its
#: entry is alive, so the identity key is sound.
_JIT_CACHE: "collections.OrderedDict[tuple, tuple]" = collections.OrderedDict()
_JIT_CACHE_MAX = 8


def _opt_bytes(v):
    return None if v is None else np.asarray(v, np.float64).tobytes()


def dd_filter_batch_jit(mod_dyn, mod_obs, tf_dyn, tf_obs, data_batch,
                        init_mean=None, init_cov=None, unroll: int = 1):
    """Jitted-and-cached :func:`dd_filter_batch` — the ``engine="dd"`` path
    of :func:`ssmtoybox_tpu.ssinf.gaussian_filter_batch`.  Model/transform
    objects must be concrete (host-side) configurations, not traced values;
    per-configuration compiled closures are reused across calls."""
    key = (id(mod_dyn), id(mod_obs), id(tf_dyn), id(tf_obs), int(unroll),
           _opt_bytes(init_mean), _opt_bytes(init_cov))
    hit = _JIT_CACHE.get(key)
    if hit is None:
        fn = jax.jit(lambda ys: dd_filter_batch(
            mod_dyn, mod_obs, tf_dyn, tf_obs, ys,
            init_mean=init_mean, init_cov=init_cov, unroll=unroll))
        hit = ((mod_dyn, mod_obs, tf_dyn, tf_obs), fn)
        _JIT_CACHE[key] = hit
        while len(_JIT_CACHE) > _JIT_CACHE_MAX:
            _JIT_CACHE.popitem(last=False)
    else:
        _JIT_CACHE.move_to_end(key)
    return hit[1](jnp.asarray(data_batch))
