"""State-space inference: nonlinear Kalman filters and smoothers.

TPU-first re-design of ``ssmtoybox/ssinf.py``.  The reference implements the
filtering loop as stateful Python iteration over time steps
(``ssinf.py:66-118``); here the recursion is a single ``jax.lax.scan`` over a
pure step function, and Monte-Carlo studies batch thousands of trajectories
through one compiled program with ``jax.vmap`` (see
:func:`gaussian_filter_batch`).  The maths is the reference's exactly:

* Gaussian time update with non-additive-noise augmentation, additive-noise
  ``G Q G^T`` correction and cross-covariance trimming (``ssinf.py:254-295``);
* Kalman measurement update via Cholesky-solved gain (``ssinf.py:297-323``);
* Rauch-Tung-Striebel smoothing update (``ssinf.py:325-344``);
* Studentian predict/update with scale-matrix and DOF bookkeeping
  (``ssinf.py:634-736``).

Behaviour-parity notes (deliberate quirks kept from the reference):

1. ``backward_pass`` smooths time indices ``1..N-2`` only and seeds the first
   smoothing update with the filtered estimate of step ``N`` against the
   predictive moments of step ``N-1`` (``ssinf.py:120-147``).  We reproduce
   this exactly by default; the textbook recursion is available with
   ``rts_full=True``.
2. The Studentian measurement update stores a scale-derived matrix in the
   filtered covariance slot (FIXME at ``ssinf.py:726-727``) and trims
   cross-covariances with ``dim_in`` instead of ``dim_state``
   (``ssinf.py:696-698``).  Both are reproduced.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from flax import struct
from jax.scipy.linalg import block_diag, cho_factor, cho_solve

from .utils.linalg import (chol_small, pd_solve_small, tri_solve_small,
                           small_matmul, small_mm3, symmetrize)

from .mtran import (
    LinearizationTransform,
    SphericalRadialTransform,
    UnscentedTransform,
    GaussHermiteTransform,
    FullySymmetricStudentTransform,
    TruncatedSphericalRadialTransform,
    TruncatedUnscentedTransform,
    TruncatedGaussHermiteTransform,
    TaylorGPQDTransform,
)

__all__ = [
    "FilterResult", "StudentFilterResult",
    "gaussian_filter", "gaussian_smoother", "gaussian_filter_batch",
    "studentian_filter", "studentian_smoother",
    "slr_affine", "iterated_gaussian_filter",
    "StateSpaceInference", "GaussianInference", "StudentianInference",
    "IteratedPosteriorLinearizationKalman",
    "ExtendedKalman", "CubatureKalman", "UnscentedKalman", "GaussHermiteKalman",
    "GaussianProcessKalman", "BayesSardKalman", "StudentProcessKalman",
    "FullySymmetricStudent", "StudentProcessStudent", "ExtendedStudent", "GPQStudent",
    "TruncatedUnscentedKalman", "TruncatedCubatureKalman", "TruncatedGaussHermiteKalman",
    "MultiOutputGaussianProcessKalman", "MultiOutputStudentProcessStudent",
    "MarginalInference", "MarginalizedGaussianProcessKalman", "ExtendedKalmanGPQD",
    "GaussianProcessDerKalman",
]


# ---------------------------------------------------------------------------
# Pure functional core — Gaussian
# ---------------------------------------------------------------------------

class FilterResult(struct.PyTreeNode):
    """Stacked forward-pass moments, shapes follow the reference convention
    (state-dim first, time last): ``fi_mean`` (D, N), ``fi_cov`` (D, D, N),
    plus the predictive moments needed by the RTS backward pass
    (``ssinf.py:105-107``)."""

    fi_mean: jax.Array
    fi_cov: jax.Array
    pr_mean: jax.Array
    pr_cov: jax.Array
    pr_xx_cov: jax.Array


class StudentFilterResult(struct.PyTreeNode):
    """Stacked Student forward-pass moments plus the predictive scale-matrix
    moments consumed by :func:`studentian_smoother` (the reference stores no
    predictive quantities because its Student smoother is unimplemented,
    ``ssinf.py:738-740``)."""

    fi_mean: jax.Array
    fi_cov: jax.Array
    fi_smat: jax.Array
    dof_fi: jax.Array
    pr_mean: jax.Array
    pr_smat: jax.Array
    pr_xx_smat: jax.Array


def _gaussian_time_update(mod_dyn, mod_obs, tf_dyn, tf_obs, m, P, time,
                          theta_dyn=None, theta_obs=None):
    """One Gaussian time update (``ssinf.py:254-295``).

    Returns predicted state moments, predicted measurement moments and the
    (trimmed) cross-covariances.
    """
    q_mean, q_cov = mod_dyn.noise_rv.get_stats()[:2]
    r_mean, r_cov = mod_obs.noise_rv.get_stats()[:2]
    G = mod_dyn.noise_gain

    # non-additive process noise: augment mean and covariance
    if mod_dyn.noise_additive:
        mean, cov = m, P
    else:
        mean = jnp.concatenate([m, q_mean])
        cov = block_diag(P, q_cov)

    x_mean_pr, x_cov_pr, xx_cov = _tf_apply(tf_dyn, mod_dyn.dyn_eval, mean, cov, time, theta_dyn)
    if mod_dyn.noise_additive:
        x_cov_pr = x_cov_pr + small_mm3(G, q_cov, G.T)

    # non-additive measurement noise: augment
    if mod_obs.noise_additive:
        mean, cov = x_mean_pr, x_cov_pr
    else:
        mean = jnp.concatenate([x_mean_pr, r_mean])
        cov = block_diag(x_cov_pr, r_cov)

    y_mean_pr, y_cov_pr, xy_cov = _tf_apply(tf_obs, mod_obs.meas_eval, mean, cov, time, theta_obs)
    if mod_obs.noise_additive:
        y_cov_pr = y_cov_pr + r_cov

    # trim cross-covariances (no-op in the additive case), ``ssinf.py:293-295``
    d = mod_dyn.dim_state
    xy_cov = xy_cov[:, :d]
    xx_cov = xx_cov[:, :d]
    return x_mean_pr, x_cov_pr, xx_cov, y_mean_pr, y_cov_pr, xy_cov


def _tf_apply(tf, f, mean, cov, time, theta):
    """Apply a moment transform, forwarding explicit kernel parameters when
    given (BQ transforms re-derive weights, ``bqmtran.py:93-95``)."""
    if theta is not None:
        return tf.apply(f, mean, cov, time, theta)
    return tf.apply(f, mean, cov, time)


def _kalman_update(x_mean_pr, x_cov_pr, y_mean_pr, y_cov_pr, xy_cov, y):
    """Gaussian measurement update (``ssinf.py:297-323``)."""
    gain = pd_solve_small(y_cov_pr, xy_cov).T
    x_mean_fi = x_mean_pr + small_matmul(gain, y - y_mean_pr)
    x_cov_fi = x_cov_pr - small_mm3(gain, y_cov_pr, gain.T)
    return x_mean_fi, x_cov_fi


def _smoothing_update(m_fi, P_fi, m_sm_next, P_sm_next, m_pr_next, P_pr_next, xx_cov_next):
    """RTS smoothing update (``ssinf.py:325-344``)."""
    gain = pd_solve_small(P_pr_next, xx_cov_next).T
    m_sm = m_fi + small_matmul(gain, m_sm_next - m_pr_next)
    P_sm = P_fi + small_mm3(gain, P_sm_next - P_pr_next, gain.T)
    return m_sm, P_sm


def slr_affine(tf, f, mean, cov, time, theta=None):
    """Statistical linear regression of ``f`` about ``N(mean, cov)``.

    Returns ``(A, b, Omega)`` with ``f(x) ≈ A x + b + e``, ``e ~ N(0,
    Omega)``: ``A = C P^-1``, ``b = mu - A m``, ``Omega = S - A P A^T`` —
    the moment-matched affine fit implied by any moment transform (the
    "enabling approximation" hidden inside every sigma-point update, made
    explicit).  Shared by the sequential iterated filter below and the
    time-parallel smoother (:mod:`ssmtoybox_tpu.parallel.iplf`).
    """
    mu, S, C = _tf_apply(tf, f, mean, cov, time, theta)
    A = pd_solve_small(cov, C.T).T                     # (E, D)
    b = mu - small_matmul(A, mean)
    Omega = symmetrize(S - small_mm3(A, cov, A.T))
    return A, b, Omega


def _scan_unroll(unroll: int | None) -> int:
    """Resolve the time-loop ``lax.scan`` unroll: explicit argument, else env
    ``SSMTPU_SCAN_UNROLL``, else 1 (see :func:`gaussian_filter`)."""
    if unroll is None:
        return int(os.environ.get("SSMTPU_SCAN_UNROLL", "1"))
    return unroll


def iterated_gaussian_filter(mod_dyn, mod_obs, tf_dyn, tf_obs, data,
                             iterations: int = 5,
                             init_mean=None, init_cov=None,
                             theta_dyn=None, theta_obs=None,
                             unroll: int | None = None) -> FilterResult:
    """Iterated posterior-linearization filter (IPLF) as one ``lax.scan``.

    Garcia-Fernandez, Svensson, Morelande & Sarkka (IEEE TSP 2015): the
    measurement update re-linearizes the measurement model (via SLR through
    the ``tf_obs`` transform) about the CURRENT POSTERIOR instead of the
    predictive density, iterating to the posterior-linearization fixed
    point.  ``iterations=1`` linearizes about the predictive and reproduces
    the standard sigma-point filter EXACTLY (tested); more iterations
    strictly refine the linearization on strong measurement nonlinearities.
    No reference counterpart (the reference has single-update filters only).

    The returned :class:`FilterResult` carries the standard predictive
    moments, so :func:`gaussian_smoother` over it yields the corresponding
    (one-pass) iterated posterior-linearization smoother.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1; got {iterations}")
    m0, P0 = mod_dyn.init_rv.get_stats()[:2]
    m0 = m0 if init_mean is None else init_mean
    P0 = P0 if init_cov is None else init_cov
    n_steps = data.shape[-1]
    dim = mod_dyn.dim_state
    r_mean, r_cov = mod_obs.noise_rv.get_stats()[:2]

    def slr_obs(m, P, t):
        """SLR of the measurement about N(m, P) -> (H, c, R_eff)."""
        if mod_obs.noise_additive:
            H, c, Om = slr_affine(tf_obs, mod_obs.meas_eval, m, P, t, theta_obs)
            return H, c, Om + r_cov
        A, c, Om = slr_affine(tf_obs, mod_obs.meas_eval,
                              jnp.concatenate([m, r_mean]),
                              block_diag(P, r_cov), t, theta_obs)
        H, Ar = A[:, :dim], A[:, dim:]
        return H, c + small_matmul(Ar, r_mean), Om + small_mm3(Ar, r_cov, Ar.T)

    def step(carry, inp):
        m, P = carry
        y, k = inp
        m_pr, P_pr, xx, y_pr0, S0, xy0 = _gaussian_time_update(
            mod_dyn, mod_obs, tf_dyn, tf_obs, m, P, k - 1, theta_dyn, theta_obs)
        # iteration 0 == the standard update (linearization at the predictive)
        m_fi, P_fi = _kalman_update(m_pr, P_pr, y_pr0, S0, xy0, y)

        def refine(_, mp):
            m_i, P_i = mp
            H, c, R_eff = slr_obs(m_i, P_i, k - 1)
            S = symmetrize(small_mm3(H, P_pr, H.T) + R_eff)
            K = pd_solve_small(S, small_matmul(H, P_pr)).T
            m_new = m_pr + small_matmul(K, y - c - small_matmul(H, m_pr))
            P_new = symmetrize(P_pr - small_mm3(K, S, K.T))
            return m_new, P_new

        m_fi, P_fi = jax.lax.fori_loop(0, iterations - 1, refine, (m_fi, P_fi))
        return (m_fi, P_fi), (m_pr, P_pr, xx, m_fi, P_fi)

    ks = jnp.arange(1, n_steps + 1)
    _, (pr_m, pr_P, pr_xx, fi_m, fi_P) = jax.lax.scan(
        step, (m0, P0), (data.T, ks), unroll=_scan_unroll(unroll))
    return FilterResult(
        fi_mean=jnp.moveaxis(fi_m, 0, -1),
        fi_cov=jnp.moveaxis(fi_P, 0, -1),
        pr_mean=jnp.moveaxis(pr_m, 0, -1),
        pr_cov=jnp.moveaxis(pr_P, 0, -1),
        pr_xx_cov=jnp.moveaxis(pr_xx, 0, -1),
    )


def gaussian_filter(mod_dyn, mod_obs, tf_dyn, tf_obs, data,
                    init_mean=None, init_cov=None,
                    theta_dyn=None, theta_obs=None,
                    unroll: int | None = None) -> FilterResult:
    """Run the full Gaussian forward pass as one ``lax.scan``.

    Equivalent to ``StateSpaceInference.forward_pass`` (``ssinf.py:66-118``).
    ``data`` is (dim_y, N); measurement ``k`` (1-based) is processed with the
    dynamics evaluated at time ``k-1``, like the reference.

    ``theta_dyn``/``theta_obs`` optionally override the transforms' parameters
    per call (BQ transforms re-derive their weights from them inside the
    traced program, ``bqmtran.py:93-95``) — this makes the whole filter
    differentiable w.r.t. kernel parameters for end-to-end training.

    ``unroll`` is passed to ``lax.scan`` (default 1, or env
    ``SSMTPU_SCAN_UNROLL``): the time recursion is sequential, so the only
    per-step cost an unrolled body can amortize is loop/dispatch overhead —
    which DOMINATES small-state filters on TPU, where each of the body's
    fused kernels launches in ~1-2 us regardless of the (vmapped) batch
    width.  Results agree for any value up to XLA fusion-order rounding
    (ULP-level; regression-tested).
    """
    m0, P0 = mod_dyn.init_rv.get_stats()[:2]
    m0 = m0 if init_mean is None else init_mean
    P0 = P0 if init_cov is None else init_cov
    n_steps = data.shape[-1]

    def step(carry, inp):
        m, P = carry
        y, k = inp
        m_pr, P_pr, xx, y_pr, S, xy = _gaussian_time_update(
            mod_dyn, mod_obs, tf_dyn, tf_obs, m, P, k - 1, theta_dyn, theta_obs)
        m_fi, P_fi = _kalman_update(m_pr, P_pr, y_pr, S, xy, y)
        return (m_fi, P_fi), (m_pr, P_pr, xx, m_fi, P_fi)

    ks = jnp.arange(1, n_steps + 1)
    _, (pr_m, pr_P, pr_xx, fi_m, fi_P) = jax.lax.scan(
        step, (m0, P0), (data.T, ks), unroll=_scan_unroll(unroll))
    return FilterResult(
        fi_mean=jnp.moveaxis(fi_m, 0, -1),
        fi_cov=jnp.moveaxis(fi_P, 0, -1),
        pr_mean=jnp.moveaxis(pr_m, 0, -1),
        pr_cov=jnp.moveaxis(pr_P, 0, -1),
        pr_xx_cov=jnp.moveaxis(pr_xx, 0, -1),
    )


def gaussian_smoother(result: FilterResult, rts_full: bool = False,
                      unroll: int | None = None):
    """RTS backward pass over stacked forward moments (``ssinf.py:120-147``).

    With ``rts_full=False`` (default) the reference's indexing is reproduced
    exactly: entries ``N-1`` and ``N`` keep their filtered values and the first
    smoothing step combines ``fi[N]`` with the predictive moments of step
    ``N-1`` (see module docstring, quirk 1).  With ``rts_full=True`` the
    textbook recursion smooths every step from the final filtered estimate.
    """
    fi_m = jnp.moveaxis(result.fi_mean, -1, 0)     # (N, D)
    fi_P = jnp.moveaxis(result.fi_cov, -1, 0)      # (N, D, D)
    pr_m = jnp.moveaxis(result.pr_mean, -1, 0)
    pr_P = jnp.moveaxis(result.pr_cov, -1, 0)
    pr_xx = jnp.moveaxis(result.pr_xx_cov, -1, 0)
    n = fi_m.shape[0]

    def step(carry, inp):
        m_next, P_next = carry
        m_fi, P_fi, m_pr_next, P_pr_next, xx_next = inp
        m_sm, P_sm = _smoothing_update(m_fi, P_fi, m_next, P_next,
                                       m_pr_next, P_pr_next, xx_next)
        return (m_sm, P_sm), (m_sm, P_sm)

    if rts_full:
        # smooth indices n-2 .. 0 seeded from the last filtered estimate
        xs = (fi_m[:-1], fi_P[:-1], pr_m[1:], pr_P[1:], pr_xx[1:])
        init = (fi_m[-1], fi_P[-1])
        _, (sm_m, sm_P) = jax.lax.scan(step, init, xs, reverse=True,
                                       unroll=_scan_unroll(unroll))
        sm_m = jnp.concatenate([sm_m, fi_m[-1:]], axis=0)
        sm_P = jnp.concatenate([sm_P, fi_P[-1:]], axis=0)
    else:
        # reference semantics: smooth indices n-3 .. 0, seed with fi[n-1]
        # paired with predictive moments of step n-2 (ssinf.py:137-145)
        xs = (fi_m[:n - 2], fi_P[:n - 2], pr_m[1:n - 1], pr_P[1:n - 1], pr_xx[1:n - 1])
        init = (fi_m[-1], fi_P[-1])
        _, (sm_m, sm_P) = jax.lax.scan(step, init, xs, reverse=True,
                                       unroll=_scan_unroll(unroll))
        sm_m = jnp.concatenate([sm_m, fi_m[n - 2:]], axis=0)
        sm_P = jnp.concatenate([sm_P, fi_P[n - 2:]], axis=0)

    return jnp.moveaxis(sm_m, 0, -1), jnp.moveaxis(sm_P, 0, -1)


def gaussian_filter_batch(mod_dyn, mod_obs, tf_dyn, tf_obs, data_batch,
                          init_mean=None, init_cov=None,
                          engine: str = "f64", unroll: int | None = None) -> FilterResult:
    """Vectorized forward pass over a batch of measurement trajectories.

    ``data_batch`` is (M, dim_y, N); all M trajectories run in one compiled
    program — this is the TPU replacement for the sequential MC loops of the
    research scripts (``research/bsq/bsq_ungm.py:133-138``).

    ``engine`` selects the arithmetic the compiled program runs in:

    - ``"f64"`` (default, the metric of record) — emulated float64 on TPU;
      bit-stable against the reference parity goldens.
    - ``"dd"`` — double-double f32-pair arithmetic
      (:mod:`ssmtoybox_tpu.ops.ddvec`): ~2x faster on TPU, per-op ~2^-48
      relative error.  Pointwise outputs agree with the f64 path to the dd
      grain per step; study-level statistics (RMSE/NLL over a MC batch)
      agree to ~1e-6 relative.  Only registered small-state (D <= 8)
      additive-noise configurations are supported — a loud ``ValueError``
      explains any unsupported piece.  Requires concrete (non-traced)
      models/transforms: call it eagerly, it jits and caches internally.
    - ``"auto"`` — ``"dd"`` when the configuration supports it, else
      ``"f64"``.

    ``unroll`` is the dd scan's unroll factor (default: 8 for scalar-state
    models, whose tiny step is dispatch-bound; 1 for vector states, whose
    unrolled step is already large — measured equal at 1 and 2 on the
    reentry lane while unrolling multiplies its compile time).  The f64
    path takes its unroll from the per-trajectory :func:`gaussian_filter`
    env knob instead.
    """
    if engine not in ("f64", "dd", "auto"):
        raise ValueError(f"engine must be 'f64', 'dd' or 'auto'; got {engine!r}")
    if engine != "f64":
        from .ops import ddvec
        try:
            ddvec.dd_check(mod_dyn, mod_obs, tf_dyn, tf_obs)
        except (ValueError, KeyError) as e:
            if engine == "dd":
                raise ValueError(
                    f"engine='dd' cannot run this configuration: {e}") from e
            engine = "f64"
        else:
            engine = "dd"
    if engine == "dd":
        from .ops import ddvec
        if unroll is None:
            unroll = 8 if mod_dyn.dim_state == 1 else 1
        return ddvec.dd_filter_batch_jit(
            mod_dyn, mod_obs, tf_dyn, tf_obs, data_batch,
            init_mean=init_mean, init_cov=init_cov, unroll=unroll)
    return jax.vmap(
        lambda ys: gaussian_filter(mod_dyn, mod_obs, tf_dyn, tf_obs, ys, init_mean, init_cov)
    )(data_batch)


# ---------------------------------------------------------------------------
# Pure functional core — Studentian
# ---------------------------------------------------------------------------

def studentian_filter(mod_dyn, mod_obs, tf_dyn, tf_obs, data,
                      dof: float = 4.0, fixed_dof: bool = True,
                      unroll: int | None = None) -> StudentFilterResult:
    """Student-t forward pass (``ssinf.py:555-736``) as one ``lax.scan``.

    Tracks the filtered mean, the (pseudo-)covariance, the scale matrix and
    the degrees of freedom.  Parity quirks preserved — see module docstring.
    ``unroll`` as in :func:`gaussian_filter` (env ``SSMTPU_SCAN_UNROLL``).
    """
    if dof <= 2.0:
        dof = 4.0

    x0_mean, x0_smat, x0_dof = mod_dyn.init_rv.get_stats()
    q_mean, q_cov, q_dof = mod_dyn.noise_rv.get_stats()
    r_mean, r_cov, r_dof = mod_obs.noise_rv.get_stats()
    q_gain = mod_dyn.noise_gain

    init_scale = (dof - 2.0) / dof
    q_smat = init_scale * q_cov
    r_smat = init_scale * r_cov
    x_smat_0 = init_scale * x0_smat
    # loop-invariant noise corrections, hoisted out of the scan body (the
    # Gaussian path does the same via small_mm3, ssinf.py:111)
    GQGt = small_mm3(q_gain, q_cov, q_gain.T)
    GSGt = small_mm3(q_gain, q_smat, q_gain.T)

    dim_trim = mod_dyn.dim_in   # reference trims with dim_in (ssinf.py:696-698)
    n_steps = data.shape[-1]

    def step(carry, inp):
        m, smat, dof_fi = carry
        y, k = inp

        if fixed_dof:
            dof_pr = jnp.minimum(jnp.minimum(dof_fi, q_dof), r_dof)
            scale = (dof_pr - 2.0) / dof_pr
        else:
            scale = (dof - 2.0) / dof

        # ---- time update (ssinf.py:662-698): transforms act on scale matrices
        if mod_dyn.noise_additive:
            mean, sm = m, smat
        else:
            mean = jnp.concatenate([m, q_mean])
            sm = block_diag(smat, q_smat)
        x_mean_pr, x_cov_pr, xx_cov = tf_dyn.apply(mod_dyn.dyn_eval, mean, sm, k - 1)
        x_smat_pr = scale * x_cov_pr
        if mod_dyn.noise_additive:
            x_cov_pr = x_cov_pr + GQGt
            x_smat_pr = x_smat_pr + GSGt
        # cross scale matrix cov(x_{k-1}, x_k^pr) for the RTS backward pass,
        # trimmed to the state block (correct dim_state trim — no reference
        # counterpart to be quirk-faithful to, its smoother is unimplemented)
        xx_smat = scale * xx_cov[:, :mod_dyn.dim_state]

        if mod_obs.noise_additive:
            mean, sm = x_mean_pr, x_smat_pr
        else:
            mean = jnp.concatenate([x_mean_pr, r_mean])
            sm = block_diag(x_smat_pr, r_smat)
        y_mean_pr, y_cov_pr, xy_cov = tf_obs.apply(mod_obs.meas_eval, mean, sm, k - 1)
        y_smat_pr = scale * y_cov_pr
        xy_smat = scale * xy_cov
        if mod_obs.noise_additive:
            y_cov_pr = y_cov_pr + r_cov
            y_smat_pr = y_smat_pr + r_smat

        xy_smat = xy_smat[:, :dim_trim]

        # ---- measurement update (ssinf.py:700-736)
        gain = pd_solve_small(y_smat_pr, xy_smat).T
        x_mean_fi = x_mean_pr + small_matmul(gain, y - y_mean_pr)
        # NOTE: scale-derived matrix stored as covariance — reference FIXME
        x_cov_fi = x_smat_pr - small_mm3(gain, y_smat_pr, gain.T)

        delta = tri_solve_small(chol_small(y_smat_pr), y - y_mean_pr, lower=True)
        scale_fi = (dof + delta @ delta) / (dof + mod_obs.dim_out)
        x_smat_fi = scale_fi * x_cov_fi
        dof_next = dof_fi + mod_obs.dim_out

        return ((x_mean_fi, x_smat_fi, dof_next),
                (x_mean_fi, x_cov_fi, x_smat_fi, dof_next,
                 x_mean_pr, x_smat_pr, xx_smat))

    ks = jnp.arange(1, n_steps + 1)
    init = (x0_mean, x_smat_0, jnp.asarray(x0_dof, dtype=x0_mean.dtype))
    _, (fi_m, fi_P, fi_S, dofs, pr_m, pr_S, pr_xx) = jax.lax.scan(
        step, init, (data.T, ks), unroll=_scan_unroll(unroll))
    return StudentFilterResult(
        fi_mean=jnp.moveaxis(fi_m, 0, -1),
        fi_cov=jnp.moveaxis(fi_P, 0, -1),
        fi_smat=jnp.moveaxis(fi_S, 0, -1),
        dof_fi=dofs,
        pr_mean=jnp.moveaxis(pr_m, 0, -1),
        pr_smat=jnp.moveaxis(pr_S, 0, -1),
        pr_xx_smat=jnp.moveaxis(pr_xx, 0, -1),
    )


def studentian_smoother(result: StudentFilterResult, rts_full: bool = False,
                        unroll: int | None = None):
    """Student-t RTS backward pass on SCALE matrices (beyond-parity feature:
    the reference leaves its Student smoother unimplemented,
    ``ssinf.py:738-740``).

    The RTS recursion applies to the scale matrices unchanged (Piché, Särkkä
    & Hartikainen 2012, "Recursive outlier-robust filtering and smoothing for
    nonlinear systems using the multivariate Student-t distribution"): with
    the filtered scale ``S_fi``, predictive scale ``S_pr`` and cross scale
    ``S_xx`` from the forward pass,

        G    = S_xx^T S_pr^{-1}
        m_sm = m_fi + G (m_sm_next - m_pr_next)
        S_sm = S_fi + G (S_sm_next - S_pr_next) G^T

    — identical algebra to :func:`_smoothing_update`, just fed scale-matrix
    moments.  Returns ``(sm_mean, sm_smat)``; the MOMENT covariance of the
    smoothed Student marginal is ``dof/(dof - 2) * sm_smat`` with the
    terminal ``result.dof_fi[-1]`` (every smoothed marginal conditions on
    all N measurements).  ``rts_full`` selects the same two index layouts as
    :func:`gaussian_smoother` so Student and Gaussian smoothers are
    drop-in comparable.
    """
    fi_m = jnp.moveaxis(result.fi_mean, -1, 0)     # (N, D)
    fi_S = jnp.moveaxis(result.fi_smat, -1, 0)     # (N, D, D)
    pr_m = jnp.moveaxis(result.pr_mean, -1, 0)
    pr_S = jnp.moveaxis(result.pr_smat, -1, 0)
    pr_xx = jnp.moveaxis(result.pr_xx_smat, -1, 0)
    n = fi_m.shape[0]

    def step(carry, inp):
        m_next, S_next = carry
        m_fi, S_fi, m_pr_next, S_pr_next, xx_next = inp
        m_sm, S_sm = _smoothing_update(m_fi, S_fi, m_next, S_next,
                                       m_pr_next, S_pr_next, xx_next)
        return (m_sm, S_sm), (m_sm, S_sm)

    if rts_full:
        xs = (fi_m[:-1], fi_S[:-1], pr_m[1:], pr_S[1:], pr_xx[1:])
        init = (fi_m[-1], fi_S[-1])
        _, (sm_m, sm_S) = jax.lax.scan(step, init, xs, reverse=True,
                                       unroll=_scan_unroll(unroll))
        sm_m = jnp.concatenate([sm_m, fi_m[-1:]], axis=0)
        sm_S = jnp.concatenate([sm_S, fi_S[-1:]], axis=0)
    else:
        xs = (fi_m[:n - 2], fi_S[:n - 2], pr_m[1:n - 1], pr_S[1:n - 1], pr_xx[1:n - 1])
        init = (fi_m[-1], fi_S[-1])
        _, (sm_m, sm_S) = jax.lax.scan(step, init, xs, reverse=True,
                                       unroll=_scan_unroll(unroll))
        sm_m = jnp.concatenate([sm_m, fi_m[n - 2:]], axis=0)
        sm_S = jnp.concatenate([sm_S, fi_S[n - 2:]], axis=0)

    return jnp.moveaxis(sm_m, 0, -1), jnp.moveaxis(sm_S, 0, -1)


# ---------------------------------------------------------------------------
# Class API mirroring the reference (thin wrappers over the pure core)
# ---------------------------------------------------------------------------

class StateSpaceInference:
    """Stateful convenience wrapper with the reference's API surface
    (``forward_pass`` / ``backward_pass`` / ``reset``, ``ssinf.py:19-212``).

    All computation is delegated to jitted pure functions; instances only
    cache the stacked moments between the passes.
    """

    def __init__(self, mod_dyn, mod_obs, tf_dyn, tf_obs):
        self.mod_dyn = mod_dyn
        self.mod_obs = mod_obs
        self.tf_dyn = tf_dyn
        self.tf_obs = tf_obs
        self.flags = {"filtered": False, "smoothed": False}
        self._result = None
        self.fi_mean = self.fi_cov = None
        self.sm_mean = self.sm_cov = None

    def get_flag(self, key):
        return self.flags[key]

    def set_flag(self, key, value):
        self.flags[key] = value

    def _check_batch(self, data_batch):
        """Friendly shape error for the batch entry points — a 2-D input
        would otherwise vmap over the measurement dimension and broadcast
        into numerically meaningless output without raising."""
        data_batch = jnp.asarray(data_batch)
        if data_batch.ndim != 3 or data_batch.shape[1] != self.mod_obs.dim_out:
            raise ValueError(
                f"data_batch must be (num_traj, dim_y={self.mod_obs.dim_out}, "
                f"num_steps); got {data_batch.shape}. For a single trajectory "
                "use forward_pass((dim_y, N)).")
        return data_batch

    def forward_pass(self, data):
        data = jnp.asarray(data)
        if data.ndim != 2 or data.shape[0] != self.mod_obs.dim_out:
            raise ValueError(
                f"data must be (dim_y={self.mod_obs.dim_out}, num_steps); got {data.shape}. "
                "For a batch of trajectories use forward_pass_batch((M, dim_y, N)).")
        self._result = self._run_forward(data)
        self.fi_mean, self.fi_cov = self._result.fi_mean, self._result.fi_cov
        self.set_flag("filtered", True)
        return self.fi_mean, self.fi_cov

    def backward_pass(self, rts_full: bool = False):
        assert self.get_flag("filtered"), "forward_pass must run first"
        self.sm_mean, self.sm_cov = self._run_backward(self._result, rts_full)
        self.set_flag("smoothed", True)
        return self.sm_mean, self.sm_cov

    def reset(self):
        self._result = None
        self.fi_mean = self.fi_cov = None
        self.sm_mean = self.sm_cov = None
        self.flags = {"filtered": False, "smoothed": False}

    # -- hooks ----------------------------------------------------------------
    def _run_forward(self, data):  # pragma: no cover - interface
        raise NotImplementedError

    def _run_backward(self, result, rts_full):  # pragma: no cover - interface
        raise NotImplementedError


@jax.jit
def _jit_gaussian_filter(mod_dyn, mod_obs, tf_dyn, tf_obs, data):
    return gaussian_filter(mod_dyn, mod_obs, tf_dyn, tf_obs, data)


@jax.jit
def _jit_default_time_update(mod_dyn, mod_obs, tf_dyn, tf_obs, m, P, k):
    return _gaussian_time_update(mod_dyn, mod_obs, tf_dyn, tf_obs, m, P, k)


@functools.partial(jax.jit, static_argnames=("iterations",))
def _jit_iterated_filter(mod_dyn, mod_obs, tf_dyn, tf_obs, data, iterations):
    return iterated_gaussian_filter(mod_dyn, mod_obs, tf_dyn, tf_obs, data,
                                    iterations=iterations)


@functools.partial(jax.jit, static_argnames=("iterations",))
def _jit_iterated_filter_batch(mod_dyn, mod_obs, tf_dyn, tf_obs, data_batch, iterations):
    return jax.vmap(lambda ys: iterated_gaussian_filter(
        mod_dyn, mod_obs, tf_dyn, tf_obs, ys, iterations=iterations))(data_batch)


@jax.jit
def _jit_gaussian_filter_batch(mod_dyn, mod_obs, tf_dyn, tf_obs, data_batch):
    return gaussian_filter_batch(mod_dyn, mod_obs, tf_dyn, tf_obs, data_batch)


@jax.jit
def _jit_gaussian_smoother(result):
    return gaussian_smoother(result, rts_full=False)


@jax.jit
def _jit_gaussian_smoother_full(result):
    return gaussian_smoother(result, rts_full=True)


@functools.partial(jax.jit, static_argnames=("dof", "fixed_dof"))
def _jit_studentian_filter(mod_dyn, mod_obs, tf_dyn, tf_obs, data, dof, fixed_dof):
    return studentian_filter(mod_dyn, mod_obs, tf_dyn, tf_obs, data, dof, fixed_dof)


@functools.partial(jax.jit, static_argnames=("dof", "fixed_dof"))
def _jit_studentian_filter_batch(mod_dyn, mod_obs, tf_dyn, tf_obs, data_batch, dof, fixed_dof):
    return jax.vmap(
        lambda y: studentian_filter(mod_dyn, mod_obs, tf_dyn, tf_obs, y, dof, fixed_dof)
    )(data_batch)


@functools.partial(jax.jit, static_argnames=("rts_full",))
def _jit_studentian_smoother(result, rts_full):
    return studentian_smoother(result, rts_full=rts_full)


class GaussianInference(StateSpaceInference):
    """Gaussian filter/smoother wrapper (``ssinf.py:215-344``)."""

    def _run_forward(self, data):
        return _jit_gaussian_filter(self.mod_dyn, self.mod_obs, self.tf_dyn, self.tf_obs, data)

    def _run_backward(self, result, rts_full):
        if rts_full:
            return _jit_gaussian_smoother_full(result)
        return _jit_gaussian_smoother(result)

    def forward_pass_batch(self, data_batch, engine: str = "f64"):
        """Filter a whole (M, dim_y, N) batch of trajectories in one program.

        ``engine`` as in :func:`gaussian_filter_batch`: ``"f64"`` (default),
        ``"dd"`` (double-double f32-pair fast path for registered small-state
        models — see its docstring for the precision contract), ``"auto"``.
        """
        data_batch = self._check_batch(data_batch)
        if engine != "f64":
            return gaussian_filter_batch(self.mod_dyn, self.mod_obs,
                                         self.tf_dyn, self.tf_obs,
                                         data_batch, engine=engine)
        return _jit_gaussian_filter_batch(self.mod_dyn, self.mod_obs,
                                          self.tf_dyn, self.tf_obs,
                                          data_batch)


class IteratedPosteriorLinearizationKalman(GaussianInference):
    """Class API for the iterated posterior-linearization filter: any
    classical sigma-point rule, ``iterations`` SLR refinements of each
    measurement update about the evolving posterior.  ``backward_pass``
    smooths the iterated forward pass like any Gaussian filter."""

    SUPPORTED_POINTS = ("sr", "ut", "gh", "fs")

    def __init__(self, dyn, obs, points: str = "ut", point_hyp=None,
                 iterations: int = 5):
        hyp = dict(point_hyp or {})
        make = {"sr": lambda d: SphericalRadialTransform(d),
                "ut": lambda d: UnscentedTransform(d, **hyp),
                "gh": lambda d: GaussHermiteTransform(d, **hyp),
                "fs": lambda d: FullySymmetricStudentTransform(d, **hyp)}
        if points not in make:
            raise ValueError(f"unsupported point set {points!r}; choose from "
                             f"{self.SUPPORTED_POINTS}")
        if points == "sr" and hyp:
            raise ValueError(
                "the spherical-radial rule takes no hyperparameters; got "
                f"point_hyp={hyp} — drop it or pick points in ('ut', 'gh', 'fs')")
        super().__init__(dyn, obs, make[points](dyn.dim_in), make[points](obs.dim_in))
        if iterations < 1:
            raise ValueError(f"iterations must be >= 1; got {iterations}")
        self.iterations = int(iterations)

    def _run_forward(self, data):
        return _jit_iterated_filter(self.mod_dyn, self.mod_obs, self.tf_dyn,
                                    self.tf_obs, data, self.iterations)

    def forward_pass_batch(self, data_batch):
        return _jit_iterated_filter_batch(self.mod_dyn, self.mod_obs, self.tf_dyn,
                                          self.tf_obs, self._check_batch(data_batch),
                                          self.iterations)


class StudentianInference(StateSpaceInference):
    """Studentian filter wrapper (``ssinf.py:555-740``).

    The reference leaves the Student smoother unimplemented
    (``ssinf.py:738-740``); here ``backward_pass`` runs the scale-matrix RTS
    recursion of :func:`studentian_smoother` (beyond-parity feature).
    ``sm_cov`` holds the smoothed SCALE matrices — mirroring the forward
    pass's own scale-matrix bookkeeping; multiply by ``dof/(dof - 2)`` with
    the terminal ``dof_fi[-1]`` for moment covariances.
    """

    def __init__(self, mod_dyn, mod_obs, tf_dyn, tf_obs, dof=4.0, fixed_dof=True):
        super().__init__(mod_dyn, mod_obs, tf_dyn, tf_obs)
        if dof <= 2.0:
            dof = 4.0
        self.dof = float(dof)
        self.fixed_dof = bool(fixed_dof)

    def _run_forward(self, data):
        return _jit_studentian_filter(self.mod_dyn, self.mod_obs, self.tf_dyn, self.tf_obs,
                                      data, self.dof, self.fixed_dof)

    def forward_pass_batch(self, data_batch):
        return _jit_studentian_filter_batch(self.mod_dyn, self.mod_obs, self.tf_dyn,
                                            self.tf_obs, self._check_batch(data_batch),
                                            self.dof, self.fixed_dof)

    def _run_backward(self, result, rts_full):
        return _jit_studentian_smoother(result, rts_full)


# ---------------------------------------------------------------------------
# Concrete filters — classical transforms (``ssinf.py:347-402``)
# ---------------------------------------------------------------------------

class ExtendedKalman(GaussianInference):
    """EKF via AD Jacobians (``ssinf.py:347-357``)."""

    def __init__(self, dyn, obs):
        tf = LinearizationTransform.create(dyn.dim_in)
        th = LinearizationTransform.create(obs.dim_in)
        super().__init__(dyn, obs, tf, th)


class CubatureKalman(GaussianInference):
    """CKF (``ssinf.py:360-366``)."""

    def __init__(self, dyn, obs):
        tf = SphericalRadialTransform(dyn.dim_in)
        th = SphericalRadialTransform(obs.dim_in)
        super().__init__(dyn, obs, tf, th)


class UnscentedKalman(GaussianInference):
    """UKF (``ssinf.py:369-386``)."""

    def __init__(self, dyn, obs, kappa=None, alpha=1.0, beta=2.0):
        tf = UnscentedTransform(dyn.dim_in, kappa=kappa, alpha=alpha, beta=beta)
        th = UnscentedTransform(obs.dim_in, kappa=kappa, alpha=alpha, beta=beta)
        super().__init__(dyn, obs, tf, th)


class GaussHermiteKalman(GaussianInference):
    """GHKF (``ssinf.py:389-402``)."""

    def __init__(self, dyn, obs, deg=3):
        tf = GaussHermiteTransform(dyn.dim_in, degree=deg)
        th = GaussHermiteTransform(obs.dim_in, degree=deg)
        super().__init__(dyn, obs, tf, th)


# ---------------------------------------------------------------------------
# Concrete filters — BQ transforms (``ssinf.py:405-552``)
# ---------------------------------------------------------------------------

class GaussianProcessKalman(GaussianInference):
    """GPQKF (``ssinf.py:405-451``)."""

    def __init__(self, dyn, obs, kern_par_dyn, kern_par_obs, kernel="rbf", points="ut",
                 point_hyp=None):
        from .bq.transforms import GaussianProcessTransform
        t_dyn = GaussianProcessTransform.create(dyn.dim_in, dyn.dim_state, kern_par_dyn,
                                                kernel, points, point_hyp)
        t_obs = GaussianProcessTransform.create(obs.dim_in, obs.dim_out, kern_par_obs,
                                                kernel, points, point_hyp)
        super().__init__(dyn, obs, t_dyn, t_obs)


class BayesSardKalman(GaussianInference):
    """BSQKF (``ssinf.py:454-500``)."""

    def __init__(self, dyn, obs, kern_par_dyn, kern_par_obs, mulind_dyn=2, mulind_obs=2,
                 points="ut", point_hyp=None):
        from .bq.transforms import BayesSardTransform
        t_dyn = BayesSardTransform.create(dyn.dim_in, dyn.dim_state, kern_par_dyn,
                                          mulind_dyn, points, point_hyp)
        t_obs = BayesSardTransform.create(obs.dim_in, obs.dim_out, kern_par_obs,
                                          mulind_obs, points, point_hyp)
        super().__init__(dyn, obs, t_dyn, t_obs)


class StudentProcessKalman(GaussianInference):
    """TPQKF (``ssinf.py:503-552``)."""

    def __init__(self, dyn, obs, kern_par_dyn, kern_par_obs, kernel="rbf", points="ut",
                 point_hyp=None, nu=3.0):
        from .bq.transforms import StudentTProcessTransform
        t_dyn = StudentTProcessTransform.create(dyn.dim_in, 1, kern_par_dyn, kernel,
                                                points, point_hyp, nu=nu)
        t_obs = StudentTProcessTransform.create(obs.dim_in, 1, kern_par_obs, kernel,
                                                points, point_hyp, nu=nu)
        super().__init__(dyn, obs, t_dyn, t_obs)


# ---------------------------------------------------------------------------
# Concrete filters — Studentian (``ssinf.py:743-833``)
# ---------------------------------------------------------------------------

class FullySymmetricStudent(StudentianInference):
    """Fully-symmetric Student filter (``ssinf.py:743-775``)."""

    def __init__(self, dyn, obs, degree=3, kappa=None, dof=4.0, fixed_dof=True):
        dyn_dof = min(dyn.init_rv.dof, dyn.noise_rv.dof)
        obs_dof = min(dyn_dof, obs.noise_rv.dof)
        t_dyn = FullySymmetricStudentTransform(dyn.dim_in, degree, kappa, dyn_dof)
        t_obs = FullySymmetricStudentTransform(obs.dim_in, degree, kappa, obs_dof)
        super().__init__(dyn, obs, t_dyn, t_obs, dof, fixed_dof)


class ExtendedStudent(StudentianInference):
    """EKF-style Student filter via AD linearization (capability parity with
    the research layer, ``research/tpq/tpq_base.py:35-40``)."""

    def __init__(self, dyn, obs, dof=4.0, fixed_dof=True):
        tf = LinearizationTransform.create(dyn.dim_in)
        th = LinearizationTransform.create(obs.dim_in)
        super().__init__(dyn, obs, tf, th, dof, fixed_dof)


class GPQStudent(StudentianInference):
    """Student filter with GPQ transforms on fully-symmetric points and the
    Student-weighted RBF kernel (``research/tpq/tpq_base.py:43-91``)."""

    def __init__(self, dyn, obs, kern_par_dyn, kern_par_obs, point_hyp=None, dof=4.0,
                 fixed_dof=True, mc_opts=None):
        from .bq.transforms import GaussianProcessTransform
        q_dof = dyn.noise_rv.dof
        r_dof = obs.noise_rv.dof
        point_hyp = dict(point_hyp or {})
        point_hyp_dyn = dict(point_hyp, dof=q_dof)
        point_hyp_obs = dict(point_hyp, dof=r_dof)
        mc_opts = dict(mc_opts or {})
        # noise dof shapes the POINTS only; the kernel's Student weighting
        # density stays at its St(0, I, 4) default like the reference
        # (``tpq_base.py:77-91`` + ``bqmod.py:421``) — see the parity note in
        # ``bq/transforms.py`` (StudentTProcessTransform.create)
        t_dyn = GaussianProcessTransform.create(dyn.dim_in, 1, kern_par_dyn,
                                                "rbf-student", "fs", point_hyp_dyn,
                                                **mc_opts)
        t_obs = GaussianProcessTransform.create(obs.dim_in, 1, kern_par_obs,
                                                "rbf-student", "fs", point_hyp_obs,
                                                **mc_opts)
        super().__init__(dyn, obs, t_dyn, t_obs, dof, fixed_dof)


class StudentProcessStudent(StudentianInference):
    """TPQSF: t-process quadrature Student filter (``ssinf.py:778-833``)."""

    def __init__(self, dyn, obs, kern_par_dyn, kern_par_obs, point_par=None, dof=4.0,
                 fixed_dof=True, dof_tp=4.0, compat_drop_nu=True, mc_opts=None):
        from .bq.transforms import StudentTProcessTransform
        q_dof, r_dof = dyn.noise_rv.dof, obs.noise_rv.dof
        point_par = dict(point_par or {})
        point_par_dyn = dict(point_par, dof=q_dof)
        point_par_obs = dict(point_par, dof=r_dof)
        # compat_drop_nu=True reproduces the reference, where dof_tp never
        # reaches the TP model (bqmtran.py:271-272); set False to honour it.
        # mc_opts (num_samples/num_batches/seed) tunes the Student-kernel
        # Monte-Carlo expectation sweep.
        t_dyn = StudentTProcessTransform.create(dyn.dim_in, 1, kern_par_dyn, "rbf-student",
                                                "fs", point_par_dyn, nu=dof_tp,
                                                compat_drop_nu=compat_drop_nu, mc_opts=mc_opts)
        t_obs = StudentTProcessTransform.create(obs.dim_in, 1, kern_par_obs, "rbf-student",
                                                "fs", point_par_obs, nu=dof_tp,
                                                compat_drop_nu=compat_drop_nu, mc_opts=mc_opts)
        super().__init__(dyn, obs, t_dyn, t_obs, dof, fixed_dof)


# ---------------------------------------------------------------------------
# Concrete filters — truncated transforms (``ssinf.py:844-901``)
# ---------------------------------------------------------------------------

class TruncatedUnscentedKalman(GaussianInference):
    """(``ssinf.py:844-860``)"""

    def __init__(self, dyn, obs, kappa=None, alpha=1.0, beta=2.0):
        tf = UnscentedTransform(dyn.dim_in, kappa, alpha, beta)
        th = TruncatedUnscentedTransform(obs.dim_state, obs.dim_in, kappa, alpha, beta)
        super().__init__(dyn, obs, tf, th)


class TruncatedCubatureKalman(GaussianInference):
    """(``ssinf.py:863-879``)"""

    def __init__(self, dyn, obs):
        tf = SphericalRadialTransform(dyn.dim_in)
        th = TruncatedSphericalRadialTransform(obs.dim_state, obs.dim_in)
        super().__init__(dyn, obs, tf, th)


class TruncatedGaussHermiteKalman(GaussianInference):
    """(``ssinf.py:882-901``)

    Deviation: the reference builds the measurement transform with
    ``dyn.dim_in`` as the effective dimension (``ssinf.py:901``) — a
    copy-paste slip its UT/CKF siblings don't share, which crashes (or
    silently mis-truncates) whenever ``dyn.dim_in != obs.dim_in``;
    ``obs.dim_in`` here, matching TruncatedUnscentedKalman/CubatureKalman.
    """

    def __init__(self, dyn, obs, degree=3):
        tf = GaussHermiteTransform(dyn.dim_in, degree)
        th = TruncatedGaussHermiteTransform(obs.dim_state, obs.dim_in, degree)
        super().__init__(dyn, obs, tf, th)


# ---------------------------------------------------------------------------
# Concrete filters — multi-output BQ (``ssinf.py:911-1024``)
# ---------------------------------------------------------------------------

class MultiOutputGaussianProcessKalman(GaussianInference):
    """GPQKF with a multi-output GP model (``ssinf.py:911-961``).

    EXPERIMENTAL in the reference (known PD-loss issues, ``ssinf.py:953-955``).
    """

    def __init__(self, dyn, obs, kern_par_dyn, kern_par_obs, kernel="rbf", points="ut",
                 point_hyp=None):
        from .bq.transforms import MultiOutputGaussianProcessTransform
        t_dyn = MultiOutputGaussianProcessTransform.create(dyn.dim_in, dyn.dim_state,
                                                           kern_par_dyn, kernel, points, point_hyp)
        t_obs = MultiOutputGaussianProcessTransform.create(obs.dim_in, obs.dim_out,
                                                           kern_par_obs, kernel, points, point_hyp)
        super().__init__(dyn, obs, t_dyn, t_obs)


class MultiOutputStudentProcessStudent(StudentianInference):
    """TPQSF with a multi-output TP model (``ssinf.py:964-1024``)."""

    def __init__(self, dyn, obs, kern_par_dyn, kern_par_obs, point_par=None, dof=4.0,
                 fixed_dof=True, dof_tp=4.0):
        from .bq.transforms import MultiOutputStudentTProcessTransform
        q_dof, r_dof = dyn.noise_rv.dof, obs.noise_rv.dof
        point_par = dict(point_par or {})
        point_par_dyn = dict(point_par, dof=q_dof)
        point_par_obs = dict(point_par, dof=r_dof)
        t_dyn = MultiOutputStudentTProcessTransform.create(dyn.dim_in, dyn.dim_state,
                                                           kern_par_dyn, "rbf-student", "fs",
                                                           point_par_dyn, nu=dof_tp)
        t_obs = MultiOutputStudentTProcessTransform.create(obs.dim_in, obs.dim_out,
                                                           kern_par_obs, "rbf-student", "fs",
                                                           point_par_obs, nu=dof_tp)
        super().__init__(dyn, obs, t_dyn, t_obs, dof, fixed_dof)


# ---------------------------------------------------------------------------
# Marginalized-parameter inference (``ssinf.py:1034-1292``)
# ---------------------------------------------------------------------------

class MarginalInference(GaussianInference):
    """Gaussian inference with marginalized transform parameters
    (``ssinf.py:1034-1273``).

    Each measurement update performs (1) a Laplace approximation of the
    log-parameter posterior via BFGS on the negative log-posterior and (2) a
    spherical-radial quadrature over parameter space, collapsing the Gaussian
    mixture.  The inner optimizer resists ``lax.scan`` (data-dependent
    iteration counts), so — as planned in SURVEY §7 — the time loop runs in
    Python while every objective/likelihood evaluation is a jitted, AD-backed
    pure function (scipy BFGS consumes jitted value+grad).
    """

    def __init__(self, dyn, obs, tf_dyn, tf_obs, par_mean=None, par_cov=None):
        super().__init__(dyn, obs, tf_dyn, tf_obs)
        import numpy as np
        from . import points as pts_mod

        self.param_dyn_dim = self.mod_dyn.dim_in + 1
        self.param_obs_dim = self.mod_obs.dim_state + 1
        self.param_dim = self.param_dyn_dim + self.param_obs_dim

        self.param_prior_mean = (jnp.zeros(self.param_dim) if par_mean is None
                                 else jnp.asarray(par_mean))
        self.param_prior_cov = (jnp.eye(self.param_dim) if par_cov is None
                                else jnp.asarray(par_cov))
        self.param_mean = self.param_prior_mean
        self.param_cov = self.param_prior_cov
        self.param_jitter = 1e-8 * jnp.eye(self.param_dim)

        self.param_upts = jnp.asarray(pts_mod.sr_points(self.param_dim))
        self.param_wts = jnp.asarray(pts_mod.sr_weights(self.param_dim))
        self.param_pts_num = self.param_upts.shape[1]
        # compiled-variant knobs (forward_pass_compiled / forward_pass_batch)
        self.newton_iters = 15
        self.damping = 1e-3
        #: precision of the compiled Laplace search ("float32" runs the
        #: Newton inner loop native-f32 on TPU — see _jit_marginal); None
        #: keeps the all-f64 behavior
        self.inner_dtype = None

        # jitted primitives -------------------------------------------------
        def _predict_meas(theta, m, P, k):
            """Predicted measurement moments given log-params (ssinf.py:1160-1203).

            Log-params are boxed to [-8, 8] like the compiled path: scipy's
            unbounded BFGS can wander far enough for ``exp`` to overflow the
            kernel expectations, after which every later step is NaN (the
            reference is exposed to the same blow-up)."""
            theta = jnp.clip(theta, -8.0, 8.0)
            theta_dyn = jnp.exp(theta[: self.param_dyn_dim])
            theta_obs = jnp.exp(theta[self.param_dyn_dim:])
            m_pr, P_pr, xx, y_pr, S, xy = _gaussian_time_update(
                self.mod_dyn, self.mod_obs, self.tf_dyn, self.tf_obs, m, P, k,
                theta_dyn, theta_obs)
            return m_pr, P_pr, xx, y_pr, S, xy

        def _neg_log_post(theta, y, m, P, k, pm, pc):
            from .utils.linalg import pd_logdet
            _, _, _, y_pr, S, _ = _predict_meas(theta, m, P, k)
            dy = y - y_pr
            loglik = -0.5 * (pd_logdet(S) + dy @ cho_solve(cho_factor(S, lower=True), dy)
                             + y.shape[0] * jnp.log(2 * jnp.pi))
            dth = theta - pm
            logprior = -0.5 * (pd_logdet(pc) + dth @ cho_solve(cho_factor(pc, lower=True), dth)
                               + theta.shape[0] * jnp.log(2 * jnp.pi))
            # outside the box the likelihood is constant (clipped); this
            # quadratic keeps the BFGS gradient pointing back inside
            box_penalty = 0.5 * jnp.sum((theta - jnp.clip(theta, -8.0, 8.0)) ** 2)
            return -(loglik + logprior) + box_penalty

        def _posterior_moments(theta, y, m, P, k):
            m_pr, P_pr, _, y_pr, S, xy = _predict_meas(theta, m, P, k)
            m_fi, P_fi = _kalman_update(m_pr, P_pr, y_pr, S, xy, y)
            return m_fi, P_fi

        self._neg_log_post = jax.jit(jax.value_and_grad(_neg_log_post))
        self._posterior_moments = jax.jit(jax.vmap(_posterior_moments,
                                                   in_axes=(1, None, None, None, None)))

    def reset(self):
        super().reset()
        self.param_mean = self.param_prior_mean
        self.param_cov = self.param_prior_cov

    def _laplace_step(self, y, m, P, k):
        """BFGS Laplace approximation of the parameter posterior
        (``ssinf.py:1247-1273``)."""
        import numpy as np
        from scipy.optimize import minimize

        pm, pc = self.param_mean, self.param_cov

        def obj(theta):
            v, g = self._neg_log_post(jnp.asarray(theta), y, m, P, k, pm, pc)
            return float(v), np.asarray(g, dtype=float)

        res = minimize(obj, np.asarray(pm, dtype=float), method="BFGS", jac=True)
        # extreme log-params can make the Gram ill-conditioned enough that
        # the objective/gradient go NaN mid-search, in which case scipy
        # returns its (garbage) last iterate — keep the incumbent posterior
        # rather than poisoning every later step (the compiled Newton path
        # safeguards the same way)
        x = np.asarray(res.x, dtype=float)
        hinv = np.asarray(res.hess_inv, dtype=float)
        if np.isfinite(x).all() and np.isfinite(res.fun) and np.isfinite(hinv).all():
            self.param_mean = jnp.clip(jnp.asarray(x), -8.0, 8.0)
            self.param_cov = jnp.asarray(hinv) + self.param_jitter

    def forward_pass(self, data):
        data = jnp.asarray(data)
        n_steps = data.shape[-1]
        m, P = self.mod_dyn.init_rv.get_stats()[:2]
        fi_m, fi_P = [], []
        pr_m, pr_P, pr_xx = [], [], []
        for k in range(1, n_steps + 1):
            y = data[:, k - 1]
            # default-parameter predictive moments for the RTS smoother —
            # the reference runs the plain _time_update(k-1) before each
            # marginalized measurement update (ssinf.py:104), so smoothing
            # gains come from the DEFAULT kernel parameters
            m_pr_d, P_pr_d, xx_d, _, _, _ = _jit_default_time_update(
                self.mod_dyn, self.mod_obs, self.tf_dyn, self.tf_obs, m, P,
                jnp.asarray(k - 1, data.dtype))
            pr_m.append(m_pr_d)
            pr_P.append(P_pr_d)
            pr_xx.append(xx_d)
            # NOTE: unlike the plain Gaussian time update (applied at k-1,
            # ssinf.py:104), the reference's marginalized update evaluates
            # both transforms at time k (ssinf.py:110,1152,1188-1199)
            self._laplace_step(y, m, P, k)
            chol_pc = jnp.linalg.cholesky(self.param_cov)
            theta_pts = self.param_mean[:, None] + chol_pc @ self.param_upts
            means, covs = self._posterior_moments(theta_pts, y, m, P, k)
            m = jnp.einsum("pi,p->i", means, self.param_wts)
            P = jnp.einsum("pij,p->ij", covs, self.param_wts)
            fi_m.append(m)
            fi_P.append(P)
        self.fi_mean = jnp.stack(fi_m, axis=-1)
        self.fi_cov = jnp.stack(fi_P, axis=-1)
        self._result = FilterResult(
            fi_mean=self.fi_mean, fi_cov=self.fi_cov,
            pr_mean=jnp.stack(pr_m, axis=-1), pr_cov=jnp.stack(pr_P, axis=-1),
            pr_xx_cov=jnp.stack(pr_xx, axis=-1))
        self.set_flag("filtered", True)
        return self.fi_mean, self.fi_cov

    # backward_pass: inherited from GaussianInference — the reference's
    # MarginalInference smooths with the default-parameter predictive
    # moments stored by its plain _time_update (ssinf.py:104,120-147)


    def forward_pass_batch(self, data_batch, newton_iters: int | None = None,
                           damping: float | None = None,
                           inner_dtype: str | None = None):
        """Marginalized filtering of an (M, dim_y, N) batch in one program.

        Overrides the inherited plain-Gaussian batch path, which would
        silently filter with FIXED default kernel parameters instead of
        marginalizing them.  Uses the compiled damped-Newton Laplace variant
        (:meth:`forward_pass_compiled`) vmapped over trajectories — the
        study-scale configuration (each trajectory runs its own per-step
        parameter posterior).

        ``inner_dtype="float32"`` runs the Laplace parameter search in
        native f32 (state moments stay f64) — the TPU fast path; see
        :meth:`_jit_marginal`."""
        data = self._check_batch(data_batch)
        res = self._jit_marginal_batch(
            self.mod_dyn, self.mod_obs, self.tf_dyn, self.tf_obs, data,
            self.param_prior_mean, self.param_prior_cov,
            self.newton_iters if newton_iters is None else newton_iters,
            self.damping if damping is None else damping,
            self.inner_dtype if inner_dtype is None else inner_dtype)
        self._result = res
        return res

    @staticmethod
    @functools.partial(jax.jit, static_argnames=("newton_iters", "inner_dtype"))
    def _jit_marginal_batch(mod_dyn, mod_obs, tf_dyn, tf_obs, data,
                            par_mean0, par_cov0, newton_iters, damping,
                            inner_dtype=None):
        return jax.vmap(lambda y: MarginalInference._jit_marginal(
            mod_dyn, mod_obs, tf_dyn, tf_obs, y,
            par_mean0, par_cov0, newton_iters, damping,
            inner_dtype=inner_dtype))(data)

    # -- fully-compiled variant ------------------------------------------------
    def forward_pass_compiled(self, data, newton_iters: int | None = None,
                              damping: float | None = None,
                              inner_dtype: str | None = None):
        """Whole marginalized filter as one ``lax.scan`` (TPU-native variant).

        The reference's per-step scipy BFGS (``ssinf.py:1272``) is replaced by
        a fixed number of damped-Newton iterations on the negative
        log-posterior, with the exact AD Hessian supplying the Laplace
        covariance — so the entire time loop compiles, batches under ``vmap``
        and runs on-device.  (The BFGS path above remains the
        reference-faithful option; its ``hess_inv`` is a quasi-Newton
        *estimate* and the per-step parameter posterior is multimodal, so the
        two variants agree tightly on step 1 and at the study level, but can
        settle in different posterior modes at individual later steps — the
        quantified regression gate lives in
        ``tests/test_parity.py::test_marginal_bfgs_vs_newton_quantified``.)
        """
        data = jnp.asarray(data)
        self._result = self._jit_marginal(
            self.mod_dyn, self.mod_obs, self.tf_dyn, self.tf_obs, data,
            self.param_prior_mean, self.param_prior_cov,
            self.newton_iters if newton_iters is None else newton_iters,
            self.damping if damping is None else damping,
            self.inner_dtype if inner_dtype is None else inner_dtype)
        self.fi_mean, self.fi_cov = self._result.fi_mean, self._result.fi_cov
        self.set_flag("filtered", True)
        return self.fi_mean, self.fi_cov

    @staticmethod
    @functools.partial(jax.jit, static_argnames=("newton_iters", "inner_dtype"))
    def _jit_marginal(mod_dyn, mod_obs, tf_dyn, tf_obs, data,
                      par_mean0, par_cov0, newton_iters, damping,
                      inner_dtype=None):
        from . import points as pts_mod
        from .utils.linalg import gen_solve, pd_logdet, symmetrize

        param_dim = par_mean0.shape[0]
        dyn_dim = mod_dyn.dim_in + 1
        upts = jnp.asarray(pts_mod.sr_points(param_dim), data.dtype)
        wts = jnp.asarray(pts_mod.sr_weights(param_dim), data.dtype)
        eye_p = jnp.eye(param_dim, dtype=data.dtype)

        # ``inner_dtype="float32"`` runs the Laplace search — 15 damped-
        # Newton iterations of grad+Hessian through the BQ-weight
        # re-derivation, ~90% of this filter's FLOPs — in NATIVE f32 on
        # TPU instead of emulated f64.  The parameter posterior it produces
        # only GATES the quadrature nodes; the state moments (and the final
        # mixture collapse) stay in the ambient f64.  This is the fix for
        # the one workload where the chip lost to the CPU host (VERDICT r4
        # #5: 31.1 s v5e vs 9.2 s CPU at mc=100 — f32 inner runs it in
        # 1.4 s).  Precision contract (measured, experiments/RESULTS.md):
        # step-1 agreement with the f64 inner path is ~5e-5; from step 2 on
        # the per-step parameter posterior is MULTIMODAL and mode selection
        # is precision-sensitive, so pointwise trajectories diverge (the
        # same property the BFGS-vs-Newton gate quantifies,
        # tests/test_parity.py::test_marginal_bfgs_vs_newton_quantified) —
        # study-level scores land within the method spread and the
        # calibration conclusions are unchanged, but this is a documented
        # method variant, not a bit-compatible fast path; the all-f64
        # inner loop stays the default.
        idt = data.dtype if inner_dtype is None else jnp.dtype(inner_dtype)

        def to_inner(t):
            return jax.tree_util.tree_map(
                lambda x: x.astype(idt)
                if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x, t)

        mod_dyn_i, mod_obs_i, tf_dyn_i, tf_obs_i = to_inner(
            (mod_dyn, mod_obs, tf_dyn, tf_obs))
        eye_i = eye_p.astype(idt)
        damping_i = jnp.asarray(damping, idt)
        # f32 needs a larger floor than 1e-8 to keep tiny-posterior solves
        # and the PD gate meaningful (f32 eps ~ 1.2e-7)
        post_jitter = jnp.asarray(1e-8 if idt == jnp.float64 else 1e-6, idt)

        def predict_meas(theta, m, P, k):
            theta_dyn = jnp.exp(theta[:dyn_dim])
            theta_obs = jnp.exp(theta[dyn_dim:])
            return _gaussian_time_update(mod_dyn, mod_obs, tf_dyn, tf_obs, m, P, k,
                                         theta_dyn, theta_obs)

        def neg_log_post(theta, y, m, P, k, pm, pc):
            # inner-precision twin of the objective: every operand enters in
            # ``idt`` so the whole Laplace graph stays native-precision
            _, _, _, y_pr, S, _ = _gaussian_time_update(
                mod_dyn_i, mod_obs_i, tf_dyn_i, tf_obs_i, m, P, k,
                jnp.exp(theta[:dyn_dim]), jnp.exp(theta[dyn_dim:]))
            dy = y - y_pr
            loglik = -0.5 * (pd_logdet(S) + dy @ pd_solve_small(S, dy))
            dth = theta - pm
            logprior = -0.5 * dth @ pd_solve_small(pc, dth)
            return -(loglik + logprior)

        def step(carry, inp):
            m, P, pm, pc = carry
            y64, k = inp

            # default-parameter predictive moments for the RTS smoother
            # (the reference's plain _time_update(k-1), ssinf.py:104)
            m_pr_d, P_pr_d, xx_d, _, _, _ = _gaussian_time_update(
                mod_dyn, mod_obs, tf_dyn, tf_obs, m, P, k - 1)

            y = y64.astype(idt)
            m_i, P_i, k_i = m.astype(idt), P.astype(idt), k.astype(idt)

            # Safeguarded damped-Newton Laplace approximation: a step is
            # accepted only if it keeps the objective finite and non-
            # increasing; otherwise a short gradient step is tried, and the
            # incumbent kept as a last resort.  Log-params are boxed to
            # [-6, 6] so exp() cannot overflow the kernel expectations.
            def newton(i, carry):
                theta, f_cur = carry
                g = jax.grad(neg_log_post)(theta, y, m_i, P_i, k_i, pm, pc)
                H = jax.hessian(neg_log_post)(theta, y, m_i, P_i, k_i, pm, pc)
                delta = gen_solve(H + damping_i * eye_i, g)
                nrm = jnp.linalg.norm(delta)
                delta = delta * jnp.minimum(1.0, 3.0 / (nrm + 1e-12))

                cand = jnp.clip(theta - delta, -6.0, 6.0)
                f_cand = neg_log_post(cand, y, m_i, P_i, k_i, pm, pc)
                ok = jnp.isfinite(f_cand) & (f_cand <= f_cur)

                grad_step = jnp.clip(theta - 0.1 * g / (jnp.linalg.norm(g) + 1e-12),
                                     -6.0, 6.0)
                f_grad = neg_log_post(grad_step, y, m_i, P_i, k_i, pm, pc)
                ok_grad = jnp.isfinite(f_grad) & (f_grad <= f_cur)

                theta_new = jnp.where(ok, cand, jnp.where(ok_grad, grad_step, theta))
                f_new = jnp.where(ok, f_cand, jnp.where(ok_grad, f_grad, f_cur))
                return theta_new, f_new

            # marginalized updates evaluate at time k, like the reference
            # (ssinf.py:110,1152) — not k-1 as in the plain time update
            f0 = neg_log_post(pm, y, m_i, P_i, k_i, pm, pc)
            theta_star, _ = jax.lax.fori_loop(0, newton_iters, newton, (pm, f0))
            H = jax.hessian(neg_log_post)(theta_star, y, m_i, P_i, k_i, pm, pc)
            pc_cand = (symmetrize(gen_solve(H + damping_i * eye_i, eye_i))
                       + post_jitter * eye_i)
            # an indefinite Hessian (saddle) yields a non-PD candidate:
            # keep the previous posterior covariance in that case
            L_cand = chol_small(pc_cand)
            pd_ok = jnp.all(jnp.isfinite(L_cand))
            pc_new = jnp.where(pd_ok, pc_cand, pc)
            L_pc = jnp.where(pd_ok, L_cand, chol_small(pc))

            # SR quadrature over parameter space; Gaussian-mixture collapse.
            # Nodes are PLACED at inner precision but each per-node Kalman
            # update runs in the ambient f64 (state moments never leave f64)
            theta_pts = (theta_star[:, None] + L_pc @ upts.astype(idt)
                         ).astype(data.dtype)

            def one(theta):
                m_pr, P_pr, _, y_pr, S, xy = predict_meas(theta, m, P, k)
                return _kalman_update(m_pr, P_pr, y_pr, S, xy, y64)

            means, covs = jax.vmap(one, in_axes=1)(theta_pts)
            m_new = jnp.einsum("pi,p->i", means, wts)
            P_new = symmetrize(jnp.einsum("pij,p->ij", covs, wts))
            # per-theta Kalman updates subtract K S K^T from full covariances,
            # so an extreme quadrature member can push the collapsed mixture
            # covariance non-PD — after which every later step is NaN.  Keep
            # the incumbent moments in that case (the same safeguard this
            # step already applies to the parameter posterior above); the
            # run continues instead of being lost to one bad step.
            state_ok = (jnp.all(jnp.isfinite(m_new))
                        & jnp.all(jnp.isfinite(chol_small(P_new))))
            m_new = jnp.where(state_ok, m_new, m)
            P_new = jnp.where(state_ok, P_new, P)
            return ((m_new, P_new, theta_star, pc_new),
                    (m_new, P_new, m_pr_d, P_pr_d, xx_d))

        m0, P0 = mod_dyn.init_rv.get_stats()[:2]
        ks = jnp.arange(1, data.shape[-1] + 1)
        _, (fi_m, fi_P, pr_m, pr_P, pr_xx) = jax.lax.scan(
            step, (m0, P0, par_mean0.astype(idt), par_cov0.astype(idt)),
            (data.T, ks))
        return FilterResult(
            fi_mean=jnp.moveaxis(fi_m, 0, -1),
            fi_cov=jnp.moveaxis(fi_P, 0, -1),
            pr_mean=jnp.moveaxis(pr_m, 0, -1),
            pr_cov=jnp.moveaxis(pr_P, 0, -1),
            pr_xx_cov=jnp.moveaxis(pr_xx, 0, -1))


class MarginalizedGaussianProcessKalman(MarginalInference):
    """GPQKF with marginalized kernel parameters (``ssinf.py:1276-1292``)."""

    def __init__(self, dyn, obs, kernel="rbf", points="ut", point_hyp=None,
                 par_mean=None, par_cov=None):
        import numpy as np
        from .bq.transforms import GaussianProcessTransform
        kpar_dyn = np.ones((1, dyn.dim_in + 1))
        kpar_obs = np.ones((1, obs.dim_state + 1))
        t_dyn = GaussianProcessTransform.create(dyn.dim_in, 1, kpar_dyn, kernel, points, point_hyp)
        t_obs = GaussianProcessTransform.create(obs.dim_state, 1, kpar_obs, kernel, points, point_hyp)
        super().__init__(dyn, obs, t_dyn, t_obs, par_mean, par_cov)


class GaussianProcessDerKalman(GaussianInference):
    """GPQ+D Kalman filter: GPQ transforms with joint function+derivative
    observations (extension — the reference exposes GPQ+D only at the
    transform level, ``research/gpqd/gpqd_base.py:11-52``)."""

    def __init__(self, dyn, obs, kern_par_dyn, kern_par_obs, points="ut",
                 point_hyp=None, which_der=None):
        from .bq.gpqd import GaussianProcessDerTransform
        t_dyn = GaussianProcessDerTransform.create(dyn.dim_in, dyn.dim_state,
                                                   kern_par_dyn, points, point_hyp,
                                                   which_der=which_der)
        t_obs = GaussianProcessDerTransform.create(obs.dim_in, obs.dim_out,
                                                   kern_par_obs, points, point_hyp,
                                                   which_der=which_der)
        super().__init__(dyn, obs, t_dyn, t_obs)


class ExtendedKalmanGPQD(GaussianInference):
    """EKF via single-point GPQ+D (``ssinf.py:1302-1319``)."""

    def __init__(self, dyn, obs, rbf_par_dyn, rbf_par_obs):
        tf = TaylorGPQDTransform.create(dyn.dim_in, rbf_par_dyn)
        th = TaylorGPQDTransform.create(obs.dim_state, rbf_par_obs)
        super().__init__(dyn, obs, tf, th)
