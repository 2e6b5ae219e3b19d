"""Fused double-double sigma-point filtering for scalar state-space models.

The headline UNGM studies (bench.py; ``research/bsq/bsq_ungm.py:91-190``)
filter 10k trajectories of a 1-D model for 500 steps.  On TPU the jnp-f64
path is LAUNCH-bound, not compute-bound: every step of the ``lax.scan`` body
dispatches its (emulated-f64) kernels separately — measured ~124 us/step on
v5e regardless of batch width (docs/performance.md), i.e. the chip idles.

This module re-expresses the *entire* filter step in explicit double-double
f32-pair arithmetic (:mod:`ssmtoybox_tpu.ops.ddmath`) so the program contains
no f64 ops at all.  Two engines share the identical step math:

- :func:`scalar_filter_batch` — a plain ``lax.scan`` whose body is a pure-f32
  elementwise graph that XLA fuses into a handful of kernels per step;
- a whole-scan Pallas kernel (``scalar_filter_batch(..., engine="pallas")``)
  that runs ALL steps for a tile of trajectories inside ONE kernel launch,
  removing the per-step dispatch floor entirely.

Model support is via a small registry of dd-evaluators (the kernel cannot
trace arbitrary f64 jnp code into pair arithmetic): a transition model maps
to ``(step_consts(n_steps) -> f64 array, eval(x_dd, c_dd) -> dd)`` and a
measurement model to ``eval(x_dd) -> dd``.  UNGM (``ssmod.py:129-166``,
``ssmod.py:960-1009``) ships in the registry; any scalar additive-noise
model can register its own.

Transforms supported for ``dim=1``: classical :class:`SigmaPointTransform`
with diagonal covariance weights (UT/CKF/GH; ``mtran.py:102-149``) and
GPQ/BSQ :class:`BQTransform` (dense ``Wc``, uncentered covariance + expected
model variance; ``bqmtran.py:60-224``).  Weights are baked as double-double
constants at trace time, exactly like the f64 path bakes them as f64.

Precision: dd ops carry ~2^-48 relative error, giving a one-step filter
error of <2e-12 on UNGM scales (tests/test_ddfilter.py).  Over long records
the UNGM recursion amplifies ANY rounding difference chaotically — the f64
path itself, perturbed by 1e-13, reaches 8e-7 pointwise by step 200 — so
the honest long-horizon contract is statistical: study RMSE matches the
f64 path to ~6e-5 relative at 500 steps/256 records, the same class as
XLA's own on-TPU emulated f64 vs CPU f64 (experiments/RESULTS.md notes the
4th-decimal NLL shift).  Short horizons can stay inside the 1e-8 pointwise
parity tolerance (the fixed-seed 100-step records of tests/test_ddfilter.py
do), but this is record-dependent — records that pass near the UNGM map's
high-gradient region amplify faster (tools/bench_dd.py measures ~1e-2 max
pointwise by step 50 on some of 64 records while study RMSE agrees to 2e-6).
The headline bench keeps the jnp-f64 lanes as the metric of record; the dd
engines are benchmarked separately (tools/bench_dd.py).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import ddmath as dd
from ..mtran import SigmaPointTransform
from ..bq.transforms import BQTransform, StudentTProcessTransform
from ..ssmod import UNGMTransition, UNGMMeasurement

__all__ = ["scalar_filter_batch", "supports", "register_dyn_dd", "register_obs_dd"]


# ---------------------------------------------------------------------------
# dd model registry
# ---------------------------------------------------------------------------

_DYN_DD = {}
_OBS_DD = {}


def register_dyn_dd(model_cls, step_consts, eval_dd):
    """Register a scalar transition model for dd filtering.

    ``step_consts(model, n_steps) -> (n_steps,) f64 ndarray`` — the per-step
    time-dependent constant stream (hoisted out of the kernel; transcendental
    functions of *time* are trace-time data, not in-kernel work).
    ``eval_dd(model, x_dd, c_dd) -> dd`` — the dynamics in dd arithmetic.
    """
    _DYN_DD[model_cls] = (step_consts, eval_dd)


def register_obs_dd(model_cls, eval_dd):
    """Register a scalar measurement model: ``eval_dd(model, x_dd) -> dd``."""
    _OBS_DD[model_cls] = eval_dd


def _ungm_consts(model, n_steps):
    # time index for step k (1-based) is k-1 (``gaussian_filter`` /
    # ``ssinf.py:101``): cos stream over 0..N-1
    t = np.arange(0, n_steps, dtype=np.float64)
    return 8.0 * np.cos(1.2 * t)


def _ungm_dyn_dd(model, x, c):
    # 0.5*x + 25*x/(1+x^2) + 8*cos(1.2*(k-1))  (``ssmod.py:170``)
    xx = dd.sqr(x)
    frac = dd.div(x, dd.add_f(xx, np.float32(1.0)))
    return dd.add(dd.add(dd.mul_f(x, np.float32(0.5)),
                         dd.mul_f(frac, np.float32(25.0))), c)


_UNGM_OBS_COEF = dd.const(0.05)        # 0.05 is not exactly representable in f32


def _ungm_obs_dd(model, x):
    # 0.05*x^2  (``ssmod.py:486-506``)
    return dd.mul(dd.sqr(x), _UNGM_OBS_COEF)


register_dyn_dd(UNGMTransition, _ungm_consts, _ungm_dyn_dd)
register_obs_dd(UNGMMeasurement, _ungm_obs_dd)


# ---------------------------------------------------------------------------
# transform lowering: bake (points, weights) as dd constants
# ---------------------------------------------------------------------------

def _lower_transform(tf):
    """Extract the 1-D sigma-point rule of ``tf`` as host f64 arrays and
    return a dd ``apply(m, P, f) -> (mu, Pf, Cf)`` closure.

    Classical rule: centered diagonal-weight quadrature
    (``mtran.py:102-149``).  BQ rule: uncentered dense-Wc quadrature with
    expected-model-variance inflation (``bqmtran.py:178-224``).
    """
    if isinstance(tf, SigmaPointTransform):
        if tf.wc_diag is None:
            raise ValueError("fused scalar filter needs diagonal classical weights")
        xi = np.asarray(tf.unit_sp, np.float64).ravel()
        wm = np.asarray(tf.wm, np.float64)
        wc = np.asarray(tf.wc_diag, np.float64)
        xi_c = [dd.const(v) for v in xi]
        wm_c = [dd.const(v) for v in wm]
        wc_c = [dd.const(v) for v in wc]

        def apply_classical(m, P, f):
            L = dd.sqrt(P)
            dx = [dd.mul(L, x) for x in xi_c]
            fs = [f(dd.add(m, d)) for d in dx]
            mu = _dd_wsum(fs, wm_c)
            ds = [dd.sub(v, mu) for v in fs]
            Pf = _dd_wsum([dd.sqr(d) for d in ds], wc_c)
            Cf = _dd_wsum([dd.mul(dx[i], ds[i]) for i in range(len(ds))], wc_c)
            return mu, Pf, Cf

        return apply_classical

    if isinstance(tf, BQTransform):
        if isinstance(tf, StudentTProcessTransform):
            raise ValueError("TPQ's data-dependent scale is not supported "
                             "by the fused scalar engine")
        xi = np.asarray(tf.model.points, np.float64).ravel()
        wm = np.asarray(tf.wm, np.float64).ravel()
        Wc = np.asarray(tf.Wc, np.float64)
        Wcc = np.asarray(tf.Wcc, np.float64).reshape(-1)
        emv = float(np.asarray(tf.model_var).reshape(()))
        n = xi.size
        xi_c = [dd.const(v) for v in xi]
        wm_c = [dd.const(v) for v in wm]
        wcc_c = [dd.const(v) for v in Wcc]
        emv_c = dd.const(emv)
        # symmetric dense Wc: diagonal + doubled upper triangle
        wdiag_c = [dd.const(Wc[i, i]) for i in range(n)]
        woff = [(i, j, dd.const(2.0 * Wc[i, j]))
                for i in range(n) for j in range(i + 1, n)]

        def apply_bq(m, P, f):
            L = dd.sqrt(P)
            dx = [dd.mul(L, x) for x in xi_c]
            fs = [f(dd.add(m, d)) for d in dx]
            mu = _dd_wsum(fs, wm_c)
            quad = _dd_wsum([dd.sqr(v) for v in fs], wdiag_c)
            for i, j, w in woff:
                quad = dd.add(quad, dd.mul(w, dd.mul(fs[i], fs[j])))
            Pf = dd.add(dd.sub(quad, dd.sqr(mu)), emv_c)
            Cf = dd.mul(_dd_wsum(fs, wcc_c), L)
            return mu, Pf, Cf

        return apply_bq

    raise ValueError(f"unsupported transform for fused scalar filter: {type(tf)!r}")


def _dd_wsum(values, weights):
    acc = dd.mul(weights[0], values[0])
    for v, w in zip(values[1:], weights[1:]):
        acc = dd.add(acc, dd.mul(w, v))
    return acc


# ---------------------------------------------------------------------------
# the fused filter
# ---------------------------------------------------------------------------

def supports(mod_dyn, mod_obs, tf_dyn, tf_obs) -> bool:
    """True if the fused dd engine can run this configuration."""
    try:
        _check(mod_dyn, mod_obs)
        _lower_transform(tf_dyn)
        _lower_transform(tf_obs)
        return True
    except (ValueError, KeyError):
        return False


def _check(mod_dyn, mod_obs):
    if mod_dyn.dim_state != 1 or mod_obs.dim_out != 1:
        raise ValueError("fused scalar engine requires dim_state == dim_out == 1")
    if not (mod_dyn.noise_additive and mod_obs.noise_additive):
        raise ValueError("fused scalar engine requires additive noise")
    if type(mod_dyn) not in _DYN_DD:
        raise KeyError(f"no dd dynamics registered for {type(mod_dyn).__name__}")
    if type(mod_obs) not in _OBS_DD:
        raise KeyError(f"no dd measurement registered for {type(mod_obs).__name__}")


def _prepare(mod_dyn, mod_obs, tf_dyn, tf_obs, n_steps):
    """Shared trace-time lowering for both engines."""
    _check(mod_dyn, mod_obs)
    apply_dyn = _lower_transform(tf_dyn)
    apply_obs = _lower_transform(tf_obs)
    consts_fn, dyn_eval = _DYN_DD[type(mod_dyn)]
    obs_eval = _OBS_DD[type(mod_obs)]

    c_stream = np.asarray(consts_fn(mod_dyn, n_steps), np.float64)   # (N,)
    c_hi = c_stream.astype(np.float32)
    c_lo = (c_stream - c_hi.astype(np.float64)).astype(np.float32)

    m0, P0 = mod_dyn.init_rv.get_stats()[:2]
    m0 = float(np.asarray(m0).reshape(()))
    P0 = float(np.asarray(P0).reshape(()))
    q_cov = float(np.asarray(mod_dyn.noise_rv.get_stats()[1]).reshape(()))
    g = float(np.asarray(mod_dyn.noise_gain).reshape(()))
    r_cov = float(np.asarray(mod_obs.noise_rv.get_stats()[1]).reshape(()))

    gqg_c = dd.const(g * q_cov * g)
    r_c = dd.const(r_cov)

    def step_math(m, P, y, c):
        """One filter step in dd: ``_gaussian_time_update`` +
        ``_kalman_update`` (``ssinf.py:103-156``) specialized to 1-D."""
        f = lambda x: dyn_eval(mod_dyn, x, c)
        h = lambda x: obs_eval(mod_obs, x)
        m_pr, Pf, _ = apply_dyn(m, P, f)
        P_pr = dd.add(Pf, gqg_c)
        y_pr, S0, C = apply_obs(m_pr, P_pr, h)
        S = dd.add(S0, r_c)
        K = dd.div(C, S)
        m_fi = dd.add(m_pr, dd.mul(K, dd.sub(y, y_pr)))
        P_fi = dd.sub(P_pr, dd.mul(dd.sqr(K), S))
        return m_fi, P_fi

    return step_math, (c_hi, c_lo), (m0, P0)


def scalar_filter_batch(mod_dyn, mod_obs, tf_dyn, tf_obs, data_batch,
                        engine: str = "scan", unroll: int = 1,
                        block_b: int = 1024, interpret: bool | None = None):
    """Filtered means for a batch of scalar records, double-double engine.

    ``data_batch``: (B, 1, N) or (B, N) f64 measurements.  Returns filtered
    means shaped (B, 1, N) f64 — the quantity the MC studies consume
    (``research/bsq/bsq_ungm.py:130-138`` keeps only means for scoring).

    ``engine="scan"``: ``lax.scan`` over dd steps (any backend).
    ``engine="pallas"``: one Mosaic kernel runs the whole record per
    trajectory tile (TPU; falls back to interpret mode elsewhere).
    ``interpret`` (pallas engine only): force interpret (True) or compiled
    Mosaic (False) instead of the backend default — the knob
    tools/validate_pallas.py uses for its compiled-vs-interpret check.
    """
    ys = jnp.asarray(data_batch)
    if ys.ndim == 3:
        ys = ys[:, 0, :]
    B, N = ys.shape
    step_math, (c_hi, c_lo), (m0, P0) = _prepare(mod_dyn, mod_obs,
                                                 tf_dyn, tf_obs, N)
    y_hi, y_lo = dd.from_f64(ys)                       # (B, N) each

    if engine == "scan":
        m_init = dd.const(m0, (B,))
        P_init = dd.const(P0, (B,))

        def step(carry, inp):
            m, P = carry
            yh, yl, ch, cl = inp
            m_fi, P_fi = step_math(m, P, (yh, yl), (ch, cl))
            return (m_fi, P_fi), (m_fi[0], m_fi[1])

        xs = (y_hi.T, y_lo.T,
              jnp.broadcast_to(c_hi[:, None], (N, 1)),
              jnp.broadcast_to(c_lo[:, None], (N, 1)))
        _, (fh, fl) = jax.lax.scan(step, (m_init, P_init), xs, unroll=unroll)
        fm = fh.astype(jnp.float64) + fl.astype(jnp.float64)     # (N, B)
        return fm.T[:, None, :]

    if engine == "pallas":
        from .ddscan_pallas import pallas_scalar_filter
        fm = pallas_scalar_filter(step_math, y_hi, y_lo, c_hi, c_lo,
                                  m0, P0, block_b=block_b, interpret=interpret)
        return fm[:, None, :]

    raise ValueError(f"unknown engine {engine!r}")
