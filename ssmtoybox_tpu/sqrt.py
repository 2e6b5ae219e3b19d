"""Square-root sigma-point filtering — the TPU float32 fast path.

The reference keeps full covariances and refactorizes them with a Cholesky at
every step (``ssinf.py:254-344`` via ``mtran.py:133-149``).  This module is
an extension with no reference counterpart: it propagates the lower Cholesky
factor itself — Van der Merwe & Wan's square-root UKF generalized to any
classical sigma-point rule — which

* keeps the covariance positive-definite *by construction*, making single
  precision — the TPU's native fast path (the MXU and VPU are f32) — usable
  on problems where the plain recursion loses definiteness,
* replaces the per-step factorization with a batched QR of the weighted
  sigma-point deviations, and
* needs only triangular solves in the gain computation.

Supported: classical sigma-point transforms (vector ``wm``, diagonal ``Wc``:
SR/UT/GH/FS rules) AND single-output BQ transforms (GPQ/BSQ/TPQ), with
additive OR non-additive noise on either model (non-additive noise enters
through state augmentation in factor form: the augmented factor is
``blkdiag(S, chol(noise_cov))``, whose noise block is a trace-time
constant).  Negative covariance weights (UT with ``kappa < 0``) are handled
with static rank-1 Cholesky downdates
(:func:`~ssmtoybox_tpu.utils.linalg.cholupdate_small`).

STUDENT-t filtering runs in factor form too (:func:`make_sqrt_studentian_
filter` / :class:`SquareRootStudent` / :func:`make_online_sqrt_student_
filter`): the Student recursion is the Gaussian algebra on SCALE matrices
plus two scalars — the predictive scale ``(nu-2)/nu`` (a column multiplier
on the transform output) and the posterior rescale ``(nu + d^T d)/(nu +
dim_y)`` (a scalar on the downdated factor, with ``d`` one triangular solve
against the innovation factor) — so outlier-robust FSQ/GPQ-Student/TPQ
serving gets the same PD-by-construction f32 path.  Student RTS smoothing
(:func:`make_sqrt_studentian_smoother`) adds an exact rank-D conditional
correction ``(1 - scale*c) P_fi`` to the joint factorization (``c`` the
rule's — or, for BQ dynamics, the Student kernel's — reconstruction
scalar); ``scale*c > 1`` configurations are refused because the conditional
covariance is provably indefinite there.

BQ transforms carry a dense covariance-weight matrix ``Wc`` plus an
expected-model-variance (EMV) term (``bqmtran.py:178-201``), which looks
square-root-hostile — but the BQ output covariance

``cov_f = fx Wc fx^T - m m^T + emv I``   with  ``m = fx wm``

factors EXACTLY, because ``Wc - wm wm^T = iK (Q - q q^T) iK =
iK Cov_x[k(x, X)] iK`` is PSD by construction (the weights are moments of
the posterior weight FUNCTION ``w(x) = iK k(x, X)``: ``wm = E[w]``,
``Wc = E[w w^T]``).  Factoring the centered weight matrix once at build
time, ``L_w L_w^T = Wc - wm wm^T``, gives

``cov_f = (fx L_w)(fx L_w)^T + emv I``,

i.e. one QR over the columns ``[fx L_w, sqrt(emv) I, noise]`` — all
positive terms, no downdates, PD by construction in f32.  The same argument
covers BSQ (augmented features ``[k(x, X); p(x)]``) and TPQ (GP weights with
a data-dependent EMV scale, handled in-trace).

BQ SMOOTHING works in factor form too: the joint (x_pred, x_prev)
factorization the RTS recursion needs does not require the classical
shared-deviation structure, because the residual weight matrix

``(Wc - wm wm^T) - Wcc^T Wcc = iK (Q - q q^T - R^T R) iK``

is the Schur complement of the joint covariance of ``(x, k(x, X))`` under
``x ~ N(0, I)`` — PSD by construction — so closed-form joint columns
``top = [fx Wcc^T, fx W_hat, emv, noise]``, ``bot = [S, 0, 0, 0]`` with
``W_hat W_hat^T`` the factored residual reproduce the predicted covariance,
the exact (uncentered-equivalent) BQ cross-covariance and the previous
filtered covariance in one QR (:func:`_make_joint_factor_bq`) — again no
downdates, PD by construction.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from .online import streaming_api
from .mtran import (SigmaPointTransform, apply_f_columns, SphericalRadialTransform,
                    UnscentedTransform, GaussHermiteTransform,
                    FullySymmetricStudentTransform)
from .utils.linalg import (cholupdate_small, small_matmul, small_mm3,
                           tri_solve_small, tria)

__all__ = ["SqrtFilterResult", "make_sqrt_filter", "make_sqrt_smoother",
           "SquareRootKalman", "SqrtOnlineState", "SqrtStepInfo",
           "make_online_sqrt_filter", "FixedLagSqrtState",
           "make_fixed_lag_sqrt_smoother", "SqrtStudentFilterResult",
           "make_sqrt_studentian_filter", "make_sqrt_studentian_smoother",
           "SqrtStudentOnlineState", "make_online_sqrt_student_filter",
           "SquareRootStudent", "FixedLagSqrtStudentState",
           "make_fixed_lag_sqrt_student_smoother"]


class SqrtFilterResult(struct.PyTreeNode):
    """Stacked square-root forward-pass moments (state-dim first, time last):
    ``fi_mean`` (D, N), ``fi_sqrt`` (D, D, N) lower Cholesky factors, plus the
    predicted pairs."""

    fi_mean: jax.Array
    fi_sqrt: jax.Array
    pr_mean: jax.Array
    pr_sqrt: jax.Array


# shared QR triangularization (promoted to utils.linalg for the time-parallel
# square-root module); kept under its historical local name
_qr_factor = tria


def _rule_arrays(tf, what: str):
    """Extract (unit points, wm, diag wc, negative-weight indices) from a
    classical sigma-point transform, concretely (trace-time constants)."""
    if not isinstance(tf, SigmaPointTransform):
        raise TypeError(
            f"this square-root component needs a classical sigma-point transform "
            f"for the {what} model (SR/UT/GH/FS rules); got {type(tf).__name__}")
    xi = np.asarray(tf.unit_sp)
    wm = np.asarray(tf.wm)
    if tf.wc_diag is not None:
        wc = np.asarray(tf.wc_diag)
    else:
        Wc = np.asarray(tf.Wc)
        # exact check: silently dropping small-but-genuine off-diagonal
        # weights would compute with a truncated rule
        if np.any(Wc != np.diag(np.diag(Wc))):
            raise TypeError(f"{what} transform has a non-diagonal covariance-"
                            f"weight matrix; square-root form requires a "
                            f"classical rule")
        wc = np.diag(Wc)
    neg = tuple(int(i) for i in np.nonzero(wc < 0)[0])
    return xi, wm, wc, neg


def _psd_chol(P: np.ndarray) -> np.ndarray:
    """Concrete lower factor with an eigh fallback for PSD noise covariances."""
    try:
        return np.linalg.cholesky(P)
    except np.linalg.LinAlgError:
        w, v = np.linalg.eigh((P + P.T) / 2.0)
        return v * np.sqrt(np.clip(w, 0.0, None))[None, :]


def _check_record(data, dim_y: int):
    """Friendly shape error for the class-API single-record entry points
    (mirrors ``StateSpaceInference.forward_pass``, ssinf.py:569-574): a 3-D
    batch passed here would silently broadcast into meaningless output."""
    data = jnp.asarray(data)
    if data.ndim != 2 or data.shape[0] != dim_y:
        raise ValueError(
            f"data must be (dim_y={dim_y}, num_steps); got {data.shape}. "
            "For a batch of trajectories use forward_pass_batch((M, dim_y, N)).")
    return data


def _check_record_batch(data_batch, dim_y: int):
    """Friendly shape error for the class-API batch entry points (mirrors
    ``StateSpaceInference._check_batch``): a 2-D record would otherwise vmap
    over the measurement dimension without raising."""
    data_batch = jnp.asarray(data_batch)
    if data_batch.ndim != 3 or data_batch.shape[1] != dim_y:
        raise ValueError(
            f"data_batch must be (num_traj, dim_y={dim_y}, num_steps); got "
            f"{data_batch.shape}. For a single trajectory use "
            "forward_pass((dim_y, N)).")
    return data_batch


def _jit_cols(d_: int) -> np.ndarray:
    """Jitter floor columns for non-additive models whose factorized
    covariances can be exactly singular (see the augmentation note in
    :func:`_sqrt_machinery`)."""
    return np.sqrt(1e-9) * np.eye(d_)


def _sqrt_from_deviations(dev, sqrt_pos, noise_cols, wc, neg_idx):
    """Factor of ``dev diag(wc) dev^T + noise_cols noise_cols^T``: QR over the
    positively-weighted columns, rank-1 downdates for the (statically known)
    negative weights."""
    S = _qr_factor(jnp.concatenate([dev * sqrt_pos, noise_cols], axis=-1))
    for i in neg_idx:
        S = cholupdate_small(S, dev[..., :, i], wc[i])
    return S


def _transform_core(tf, what: str, cast, state_dim: int | None = None):
    """Build the per-transform square-root pieces: trace-time constant unit
    points + mean weights, a ``factor(fx, dfx, noise_cols) -> S`` covariance
    factorization and a ``cross(S_in, dX_in, fx, dfx) -> P_xy`` cross-
    covariance, for classical sigma-point rules and single-output BQ
    transforms alike.  Returns ``(pts, wm, factor, cross, statics)`` where
    ``statics`` carries the arrays the smoothers' joint factorization needs
    (deviation weights for classical rules; ``bq=True`` plus the
    ``Wcc``-transpose / residual-factor / EMV-column pieces for BQ, consumed
    by :func:`_make_joint_factor_bq`).

    ``state_dim`` trims the BQ cross-covariance weight rows for NON-additive
    models (augmented input: ``Wcc`` spans dim_in rows but the gain needs
    only the state block, like the full path's ``xy_cov[:, :d]`` trim);
    classical rules trim through the caller-supplied ``dX_in`` instead."""
    # local import: transforms.py imports utils/mtran; no cycle, but keep the
    # classical-only fast path importable without the bq subpackage warm
    from .bq.transforms import BQTransform, StudentTProcessTransform

    if isinstance(tf, SigmaPointTransform):
        xi, wm, wc, neg = _rule_arrays(tf, what)
        xi_, wm_, wc_ = cast(xi), cast(wm), cast(wc)
        sqrt_pos = cast(np.sqrt(np.clip(wc, 0.0, None)))[None, :]

        def factor(fx, dfx, noise_cols, out_sqrt_scale=None):
            # out_sqrt_scale scales the TRANSFORM-output columns only (the
            # Student recursion multiplies the transform covariance by a
            # per-step scalar before adding the scale-form noise term,
            # ssinf.py:662-698); scaling the deviations scales the negative-
            # weight downdates identically, so the result is exactly
            # scale * (sum_i wc_i dfx_i dfx_i^T) + noise noise^T
            dev = dfx if out_sqrt_scale is None else dfx * out_sqrt_scale
            return _sqrt_from_deviations(dev, sqrt_pos, noise_cols, wc, neg)

        def cross(S_in, dX_in, fx, dfx):
            return small_matmul(dX_in * wc_[None, :], jnp.swapaxes(dfx, -1, -2))

        statics = dict(sqrt_pos_d=sqrt_pos, wc_d=wc, neg_d=neg,
                       xi_d=xi, wc_d_np=wc)
        return xi_, wm_, factor, cross, statics

    if isinstance(tf, BQTransform):
        pts = np.asarray(tf.model.points)
        wm = np.asarray(tf.wm)
        # centered covariance-weight factor: Wc - wm wm^T = iK Cov[kx] iK is
        # PSD by construction (see module docstring); eigh-clip absorbs the
        # tiny negative eigenvalues f64 round-off leaves on singular rules
        C = np.asarray(tf.Wc) - np.outer(wm, wm)
        C = (C + C.T) / 2.0
        s, v = np.linalg.eigh(C)
        L_w = v * np.sqrt(np.clip(s, 0.0, None))[None, :]
        Wcc = np.asarray(tf.Wcc)                        # (dim_in, N), = R iK
        if state_dim is not None:
            Wcc = Wcc[:state_dim]                       # augmented-input trim
        # EMV >= 0 in any sane configuration; clip so a slightly negative
        # trace residual (1 - tr(Q iK) < 0) degrades to "no inflation"
        # instead of a NaN column (full-covariance path would subtract it)
        emv = float(np.clip(np.asarray(tf.model_var), 0.0, None))
        pts_, wm_, Wcc_ = cast(pts), cast(wm), cast(Wcc)
        L_w_ = cast(L_w)
        sqrt_emv = cast(np.sqrt(emv))

        if isinstance(tf, StudentTProcessTransform):
            # TPQ: data-dependent EMV scale (nu-2 + f iK f^T)/(nu-2 + N)
            # (``bqmod.py:1129-1160``) — computed in-trace from fx
            iK_ = cast(np.asarray(tf.iK))
            nu = float(tf.model.nu)
            num_pts = float(tf.model.num_pts)

            def emv_cols(fx):
                e = fx.shape[-2]
                fe = fx
                scale_d = (nu - 2.0 + jnp.einsum("...en,nm,...em->...e", fe, iK_, fe)
                           ) / (nu - 2.0 + num_pts)
                se = jnp.sqrt(jnp.clip(scale_d, 0.0) * (sqrt_emv ** 2))
                return se[..., None, :] * jnp.eye(e, dtype=fx.dtype)
        else:
            def emv_cols(fx):
                e = fx.shape[-2]
                return sqrt_emv * jnp.eye(e, dtype=fx.dtype)

        def factor(fx, dfx, noise_cols, out_sqrt_scale=None):
            # transform-output columns (weight factor + EMV); out_sqrt_scale
            # multiplies ONLY these — the Student recursion scales the whole
            # BQ output covariance (EMV included, via tf.apply) by a per-step
            # scalar and adds the scale-form noise separately.  emv_cols is
            # evaluated on the RAW fx: TPQ's data-dependent EMV scale reads
            # the unscaled function values, exactly like the full path.
            tcols = jnp.concatenate(
                [small_matmul(fx, L_w_),
                 emv_cols(fx) + jnp.zeros(fx.shape[:-2] + (1, 1), fx.dtype)],
                axis=-1)
            if out_sqrt_scale is not None:
                tcols = tcols * out_sqrt_scale
            return _qr_factor(jnp.concatenate([tcols, noise_cols], axis=-1))

        def cross(S_in, dX_in, fx, dfx):
            # reference cross-covariance is UNCENTERED: chol R iK fx^T
            # (``bqmtran.py:219-224``); E[xi] = 0 makes the mean term vanish
            # analytically, so parity with the full path holds to round-off
            return small_mm3(S_in, Wcc_, jnp.swapaxes(fx, -1, -2))

        # raw np pieces only — the smoothers' joint factorization derives its
        # residual factor W_hat from them lazily (_make_joint_factor_bq), so
        # filter-only builds pay nothing for the smoothing machinery (and an
        # RQ kernel, whose weighting scalar is unknown, still filters fine)
        statics = dict(bq=True, C_np=C, Wcc_np=Wcc, emv_cols_b=emv_cols,
                       cast_b=cast, kernel_b=tf.model.kernel)
        return pts_, wm_, factor, cross, statics

    raise TypeError(
        f"square-root filtering needs a classical sigma-point transform or a "
        f"single-output BQ transform for the {what} model; got {type(tf).__name__} "
        f"— multi-output BQ transforms carry per-output weight tensors and are "
        f"only supported on the full-covariance path")


def _sqrt_machinery(mod_dyn, mod_obs, tf_dyn, tf_obs, dtype):
    """Validate the configuration and build the shared square-root step core.

    Returns ``(cores, cast, m0, S0, dim_y)`` where ``cores['step'](m, S, y,
    k) -> (m_pr, S_pr, y_pr, S_yy, m_fi, S_fi)`` performs one factor-form
    predict+update, and ``cores['time']``/``cores['meas']`` expose the halves
    (the smoother needs the time update's deviations).
    """
    def cast(a):
        return jnp.asarray(a, dtype=dtype)

    m0_np, P0_np = (np.asarray(a) for a in mod_dyn.init_rv.get_stats()[:2])
    S0_np = _psd_chol(P0_np)
    dim_x = m0_np.shape[0]

    pts_d, wm_d_, factor_d, _, statics_d = _transform_core(
        tf_dyn, "dynamics", cast, state_dim=dim_x)
    pts_o, wm_o_, factor_o, cross_o, _ = _transform_core(
        tf_obs, "measurement", cast, state_dim=dim_x)

    q_mean, q_cov = (np.asarray(a) for a in mod_dyn.noise_rv.get_stats()[:2])
    r_mean, r_cov = (np.asarray(a) for a in mod_obs.noise_rv.get_stats()[:2])
    G = np.asarray(mod_dyn.noise_gain)

    # Non-additive noise enters through STATE AUGMENTATION (like the full
    # path's block_diag at ssinf._gaussian_time_update): the augmented
    # factor is blkdiag(S, chol(noise_cov)), so only the state block varies
    # — the noise block of the sigma-point deviations is a trace-time
    # constant and the noise is already inside the propagated deviations.
    # Without an additive-noise floor, though, the factorized covariances
    # can be EXACTLY singular (e.g. the bilinear ``z = 0.05 r x^2``
    # measurement maps every sigma point to 0 at a zero prior mean), and the
    # gain's triangular solves would produce NaN from the 0/0 — the jitter
    # columns ``sqrt(1e-9) I`` floor the factors the way the additive
    # noise factor does naturally.  (The full-covariance path inherits the
    # reference's unjittered solve and its luck-of-rounding behavior there.)
    if mod_dyn.noise_additive:
        Sq_ = cast(G @ _psd_chol(q_cov))          # (D, dim_q) noise columns
        q_mean_ = None
        dX_bot_d = None
    else:
        Sq_ = cast(_jit_cols(dim_x))              # jitter floor only
        q_mean_ = cast(q_mean)
        dX_bot_d = cast(_psd_chol(q_cov) @ np.asarray(pts_d)[dim_x:])
    if mod_obs.noise_additive:
        Sr_ = cast(_psd_chol(r_cov))              # (E, E)
        r_mean_ = None
        dX_bot_o = None
    else:
        Sr_ = cast(_jit_cols(int(mod_obs.dim_out)))
        r_mean_ = cast(r_mean)
        dX_bot_o = cast(_psd_chol(r_cov) @ np.asarray(pts_o)[dim_x:])
    dim_y = r_cov.shape[0] if mod_obs.noise_additive else int(mod_obs.dim_out)

    def time_dev(m, S, k):
        """Propagate sigma points; returns the predicted mean and the
        input/propagated deviations (no factorization — the smoother gets
        ``S_pr`` as the leading block of its joint factorization instead).
        ``dX_in`` carries the STATE block of the input deviations (the part
        the smoother gain and cross-covariances need)."""
        dX_in = small_matmul(S, pts_d[:dim_x])
        if mod_dyn.noise_additive:
            X = m[:, None] + dX_in
        else:
            m_aug = jnp.concatenate([m, q_mean_.astype(S.dtype)])
            dX_aug = jnp.concatenate(
                [dX_in, jnp.broadcast_to(dX_bot_d.astype(S.dtype),
                                         dX_in.shape[:-2] + dX_bot_d.shape)],
                axis=-2)
            X = m_aug[:, None] + dX_aug
        # model parameters may live in f64; pin the recursion's dtype
        fX = apply_f_columns(mod_dyn.dyn_eval, X, k - 1).astype(S.dtype)
        m_pr = small_matmul(fX, wm_d_)
        dfx = fX - m_pr[:, None]
        return m_pr, fX, dfx, dX_in

    def time_core(m, S, k):
        """Factor-form time update."""
        m_pr, fX, dfx, dX_in = time_dev(m, S, k)
        S_pr = factor_d(fX, dfx, Sq_)
        return m_pr, S_pr, dfx, dX_in

    def meas_core(m_pr, S_pr, y, k):
        """Factor-form measurement update.  The measurement function is
        evaluated at ``k - 1`` like the full-covariance filters
        (``ssinf._gaussian_time_update`` applies both models at ``time=k-1``,
        the reference convention), so time-dependent measurement models see
        identical stamps on both paths."""
        dX = small_matmul(S_pr, pts_o[:dim_x])
        if mod_obs.noise_additive:
            Xp = m_pr[:, None] + dX
        else:
            m_aug = jnp.concatenate([m_pr, r_mean_.astype(S_pr.dtype)])
            dX_aug = jnp.concatenate(
                [dX, jnp.broadcast_to(dX_bot_o.astype(S_pr.dtype),
                                      dX.shape[:-2] + dX_bot_o.shape)],
                axis=-2)
            Xp = m_aug[:, None] + dX_aug
        hX = apply_f_columns(mod_obs.meas_eval, Xp, k - 1).astype(S_pr.dtype)
        y_pr = small_matmul(hX, wm_o_)
        dhx = hX - y_pr[:, None]
        S_yy = factor_o(hX, dhx, Sr_)
        P_xy = cross_o(S_pr, dX, hX, dhx)
        # K = P_xy (S_yy S_yy^T)^-1 via two triangular substitutions
        B = tri_solve_small(S_yy, jnp.swapaxes(P_xy, -1, -2), lower=True)
        C = tri_solve_small(jnp.swapaxes(S_yy, -1, -2), B, lower=False)
        K = jnp.swapaxes(C, -1, -2)
        m_fi = m_pr + small_matmul(K, y - y_pr)
        U = small_matmul(K, S_yy)
        S_fi = S_pr
        for j in range(dim_y):
            S_fi = cholupdate_small(S_fi, U[..., :, j], -1.0)
        return y_pr, S_yy, m_fi, S_fi

    def step_core(m, S, y, k):
        m_pr, S_pr, _, _ = time_core(m, S, k)
        y_pr, S_yy, m_fi, S_fi = meas_core(m_pr, S_pr, y, k)
        return m_pr, S_pr, y_pr, S_yy, m_fi, S_fi

    # _transform_core always returns a statics dict (it raises on anything
    # that is neither a classical rule nor a single-output BQ transform)
    statics = dict(statics_d, Sq=Sq_)
    is_bq_dyn = statics_d.get("bq", False)
    cores = dict(step=step_core, time=time_core, time_dev=time_dev,
                 meas=meas_core, statics=statics,
                 classical_dyn=not is_bq_dyn, bq_dyn=is_bq_dyn)
    return cores, cast, m0_np, S0_np, dim_y


def make_sqrt_filter(mod_dyn, mod_obs, tf_dyn, tf_obs, dtype=None,
                     unroll: int | None = None):
    """Build a jitted square-root Gaussian filter for additive-noise models.

    Returns ``filter_fn(data, init_mean=None, init_sqrt=None) ->
    SqrtFilterResult`` over a (dim_y, N) record; vmap it for MC batches.
    ``dtype`` casts the whole recursion (e.g. ``jnp.float32`` for the TPU
    fast path) — the factor form keeps f32 stable where the plain recursion
    needs f64.  ``unroll`` amortizes scan dispatch like
    :func:`ssmtoybox_tpu.ssinf.gaussian_filter` (env ``SSMTPU_SCAN_UNROLL``).
    """
    from .ssinf import _scan_unroll
    unroll = _scan_unroll(unroll)
    cores, cast, m0_np, S0_np, _ = _sqrt_machinery(
        mod_dyn, mod_obs, tf_dyn, tf_obs, dtype)
    step_core = cores["step"]

    @jax.jit
    def filter_fn(data, init_mean=None, init_sqrt=None):
        m0 = cast(m0_np) if init_mean is None else cast(init_mean)
        S0 = cast(S0_np) if init_sqrt is None else cast(init_sqrt)
        data_ = cast(data)
        n_steps = data_.shape[-1]

        def step(carry, inp):
            m, S = carry
            y, k = inp
            m_pr, S_pr, _, _, m_fi, S_fi = step_core(m, S, y, k)
            return (m_fi, S_fi), (m_pr, S_pr, m_fi, S_fi)

        ks = jnp.arange(1, n_steps + 1)
        _, (pr_m, pr_S, fi_m, fi_S) = jax.lax.scan(step, (m0, S0), (data_.T, ks),
                                                   unroll=unroll)
        return SqrtFilterResult(
            fi_mean=jnp.moveaxis(fi_m, 0, -1),
            fi_sqrt=jnp.moveaxis(fi_S, 0, -1),
            pr_mean=jnp.moveaxis(pr_m, 0, -1),
            pr_sqrt=jnp.moveaxis(pr_S, 0, -1),
        )

    return filter_fn


def _rule_recon_scalar(st_) -> float:
    """The dynamics rule's covariance-weight reconstruction factor ``c``:
    require ``sum_i wc_i xi_i xi_i^T = c I`` and return ``c`` (1 for
    SR/UT/GH, ``dof/(dof - 2)`` for the FS Student rule).  The Student
    square-root smoother corrects its joint factorization by exactly
    ``(1 - scale*c) P_fi`` (see :func:`_make_student_predict_joint`), which
    only exists for scalar-multiple reconstructions."""
    recon = st_["xi_d"] @ np.diag(st_["wc_d_np"]) @ st_["xi_d"].T
    c = float(np.trace(recon) / recon.shape[0])
    atol = 1000.0 * float(np.finfo(np.asarray(st_["wc_d_np"]).dtype).eps)
    if not np.allclose(recon, c * np.eye(recon.shape[0]),
                       atol=atol * max(1.0, abs(c))):
        raise TypeError(
            "square-root Student smoothing needs a sigma-point rule whose "
            "covariance weights reconstruct a scalar multiple of identity "
            f"(sum wc_i xi_i xi_i^T = c I); this rule reconstructs\n{recon}")
    return c


def _check_identity_reconstruction(st_):
    """The GAUSSIAN joint factorization's bottom block reconstructs the
    filtered covariance as ``S_fi (sum_i wc_i xi_i xi_i^T) S_fi^T`` — valid
    only for rules whose covariance weights reproduce identity (``c = 1`` in
    :func:`_rule_recon_scalar`; the FS Student rule reconstructs
    ``dof/(dof-2) I``, which would silently inflate every smoothed
    covariance — the STUDENT square-root smoother handles those through its
    scale correction instead)."""
    c = _rule_recon_scalar(st_)
    if abs(c - 1.0) > 1e-9:
        raise TypeError(
            "square-root smoothing requires a sigma-point rule whose "
            "covariance weights reconstruct identity (sum wc_i xi_i xi_i^T "
            f"= I); this rule reconstructs {c:.6g} * I (the FS Student rule "
            "scales by dof/(dof-2)) — use the full-covariance smoother or "
            "the Student square-root smoother for it")


def _make_joint_factor(st_, dim):
    """Build the joint-deviation triangularization shared by the offline and
    fixed-lag square-root smoothers."""
    sqrt_pos_d, Sq_, wc_d, neg_d = (st_["sqrt_pos_d"], st_["Sq"],
                                    st_["wc_d"], st_["neg_d"])

    def joint_factor(dfx, dX_in):
        """Lower factor of the joint (x_pred, x_prev) covariance; blocks give
        S_pr (its leading principal block — a Cholesky factor's leading block
        depends only on the leading block of the matrix, so no separate
        prediction QR is needed), the smoother gain and the conditional
        factor R22."""
        zeros = jnp.zeros(dX_in.shape[:-1] + (Sq_.shape[-1],), dX_in.dtype)
        top = jnp.concatenate([dfx * sqrt_pos_d, Sq_ + zeros], axis=-1)
        bot = jnp.concatenate([dX_in * sqrt_pos_d, zeros], axis=-1)
        L = _qr_factor(jnp.concatenate([top, bot], axis=-2))
        for i in neg_d:
            v = jnp.concatenate([dfx[..., :, i], dX_in[..., :, i]], axis=-1)
            L = cholupdate_small(L, v, wc_d[i])
        L11 = L[..., :dim, :dim]
        L21 = L[..., dim:, :dim]
        R22 = L[..., dim:, dim:]
        # G = L21 L11^-1  via  L11^T G^T = L21^T (upper-triangular solve)
        Gt = tri_solve_small(jnp.swapaxes(L11, -1, -2),
                             jnp.swapaxes(L21, -1, -2), lower=False)
        return L11, jnp.swapaxes(Gt, -1, -2), R22

    return joint_factor


def _kernel_weighting_scalar(kern) -> float:
    """Covariance scalar ``kappa`` of a BQ kernel's weighting density.

    The Schur-complement identities behind the BQ joint factorizations hold
    under the measure the kernel EXPECTATIONS integrate against:
    ``N(0, I)`` (kappa = 1) for the Gaussian RBF, ``St(0, I, dof)``
    (kappa = dof/(dof - 2)) for the Student-weighted RBF.  Kernels whose
    weighting covariance is not a known scalar multiple of identity (RQ)
    cannot drive the square-root smoothers."""
    from .bq.kernels import RBFGauss, RBFStudent
    if isinstance(kern, RBFStudent):          # subclass of RBFGauss: test first
        return float(kern.dof) / (float(kern.dof) - 2.0)
    if isinstance(kern, RBFGauss):
        return 1.0
    raise TypeError(
        f"square-root BQ smoothing needs a kernel whose weighting-density "
        f"covariance is a known scalar multiple of identity (RBF-Gauss or "
        f"RBF-Student); got {type(kern).__name__}")


def _bq_joint_pieces(st_):
    """Shared build of the BQ joint-factorization constants: pre-scaled
    ``Wcc^T`` columns, residual factor ``W_hat`` and the weighting scalar
    ``kappa``.  The residual identity generalizes to non-Gaussian weighting
    measures: the joint covariance of ``(x, w(x))`` under the KERNEL's
    weighting density has ``Cov[x] = kappa I``, so the PSD Schur residual is

        W_hat W_hat^T = (Wc - wm wm^T) - (1/kappa) Wcc^T Wcc

    and the joint columns carry ``fx Wcc^T / sqrt(kappa)`` on top against
    ``sqrt(kappa) S`` on the bottom (cross block exact; the bottom block's
    ``kappa P_fi`` excess is repaired by the callers' rank-``dim``
    correction).  For Gaussian-weighted kernels kappa = 1 and everything
    reduces to the plain Schur complement."""
    kap = _kernel_weighting_scalar(st_["kernel_b"])
    C2 = st_["C_np"] - (1.0 / kap) * (st_["Wcc_np"].T @ st_["Wcc_np"])
    C2 = (C2 + C2.T) / 2.0
    s2, v2 = np.linalg.eigh(C2)
    cast_b = st_["cast_b"]
    WccT_ = cast_b(st_["Wcc_np"].T / np.sqrt(kap))
    W_hat_ = cast_b(v2 * np.sqrt(np.clip(s2, 0.0, None))[None, :])
    return kap, WccT_, W_hat_


def _make_joint_factor_bq(st_, dim):
    """Joint-deviation triangularization for BQ DYNAMICS transforms.

    The classical joint factor reconstructs both blocks from shared sigma-
    point deviations; BQ covariance/cross weights are dense, so the joint
    (x_pred, x_prev) covariance is factored from closed-form columns
    instead::

        top = [fx Wcc^T/sqrt(k), fx W_hat, emv_cols, noise]  (predicted rows)
        bot = [sqrt(k) S,        0,        0,        0   ]   (previous rows)

    with ``k`` the kernel's weighting scalar and ``W_hat`` the PSD Schur
    residual (:func:`_bq_joint_pieces`): top·top^T = P_pr, top·bot^T =
    cov(x_pred, x_prev) exactly, and the bottom block's ``k P_fi`` is
    corrected to ``P_fi`` by ``dim`` rank-1 updates of weight ``1 - k`` on
    the conditional factor.  For Gaussian-weighted kernels (k = 1, the
    common case) the correction vanishes and the result is one QR, no
    downdates, PD by construction like the classical path; Student-weighted
    kernels (k > 1) take guarded downdates.
    """
    # Derive the residual factor here (not at _transform_core build time) so
    # filter-only paths never pay for the smoothing machinery; eigh-clip
    # absorbs the round-off negatives PSD-by-construction leaves in f64,
    # like the L_w build.
    kap, WccT_, W_hat_ = _bq_joint_pieces(st_)
    if kap > 1.0 + 1e-9:
        # existence, not engineering: with kappa > 1 the GAUSSIAN recursion's
        # conditional P_fi - G P_pr G^T can be indefinite (the Schur bound
        # only gives G P_pr G^T <= kappa P_fi), so no Cholesky-factor form
        # exists.  The STUDENT square-root smoother supports these kernels —
        # its predictive scale (nu-2)/nu <= 1/kappa compensates exactly
        # (see _make_student_predict_joint).
        raise TypeError(
            f"square-root GAUSSIAN smoothing cannot drive a Student-weighted "
            f"kernel (weighting covariance {kap:.4f} x identity > identity): "
            f"the conditional covariance P_fi - G P_pr G^T is indefinite — "
            f"use the Student square-root smoother "
            f"(make_sqrt_studentian_smoother) or the full-covariance "
            f"gaussian_smoother")
    emv_cols, Sq_ = st_["emv_cols_b"], st_["Sq"]

    def joint_factor(fX, S):
        A1 = small_matmul(fX, WccT_.astype(fX.dtype))       # (D, D)
        A2 = small_matmul(fX, W_hat_.astype(fX.dtype))      # (D, N)
        E = emv_cols(fX) + jnp.zeros(fX.shape[:-2] + (1, 1), fX.dtype)
        nq = Sq_.shape[-1]
        top = jnp.concatenate(
            [A1, A2, E, Sq_.astype(fX.dtype) +
             jnp.zeros(fX.shape[:-2] + (1, 1), fX.dtype)], axis=-1)
        pad = jnp.zeros(S.shape[:-1] + (A2.shape[-1] + E.shape[-1] + nq,),
                        S.dtype)
        bot = jnp.concatenate([float(np.sqrt(kap)) * S, pad], axis=-1)
        L = _qr_factor(jnp.concatenate([top, bot], axis=-2))
        L11 = L[..., :dim, :dim]
        L21 = L[..., dim:, :dim]
        R22 = L[..., dim:, dim:]
        if kap != 1.0:              # static: no-op for Gaussian weighting
            for j in range(dim):
                R22 = cholupdate_small(R22, S[..., :, j], 1.0 - kap)
        Gt = tri_solve_small(jnp.swapaxes(L11, -1, -2),
                             jnp.swapaxes(L21, -1, -2), lower=False)
        return L11, jnp.swapaxes(Gt, -1, -2), R22

    return joint_factor


def _make_predict_joint(cores, time_dev, dim):
    """Shared smoother prediction: ``(m, S, k) -> (m_pr, S_pr, G, R22)``,
    dispatching on the dynamics-transform family (classical sigma-point rule
    vs single-output BQ) — S_pr is the leading block of the joint (x_pred,
    x_prev) factorization either way, so no separate prediction QR runs."""
    if cores["classical_dyn"]:
        _check_identity_reconstruction(cores["statics"])
        joint_classical = _make_joint_factor(cores["statics"], dim)

        def predict_joint(m, S, k):
            m_pr, _, dfx, dX_in = time_dev(m, S, k)
            S_pr, G, R22 = joint_classical(dfx, dX_in)
            return m_pr, S_pr, G, R22
    elif cores["bq_dyn"]:
        joint_bq = _make_joint_factor_bq(cores["statics"], dim)

        def predict_joint(m, S, k):
            m_pr, fX, _, _ = time_dev(m, S, k)
            S_pr, G, R22 = joint_bq(fX, S)
            return m_pr, S_pr, G, R22
    else:  # unreachable: _transform_core raised on anything else
        raise TypeError("square-root smoothing needs a classical sigma-point "
                        "rule or a single-output BQ transform for the dynamics")
    return predict_joint


def make_sqrt_smoother(mod_dyn, mod_obs, tf_dyn, tf_obs, dtype=None,
                       unroll: int | None = None):
    """Build a jitted square-root RTS smoother (textbook indexing).

    Returns ``smooth_fn(data) -> (SqrtFilterResult, sm_mean (D, N), sm_sqrt
    (D, D, N))``.  The forward pass additionally triangularizes the JOINT
    deviations of each time update,

    ``[[dfx·√w, S_q], [dX·√w, 0]] → [[S_pr, 0], [L21, R22]]``,

    which yields the smoother gain ``G = L21 S_pr⁻¹`` and the factor ``R22``
    of ``P_fi − G P_pr Gᵀ`` without ever forming a covariance; the backward
    pass is then one QR per step, ``S_sm = qr([R22, G·S_sm_next])`` — the
    array square-root RTS recursion, PD by construction in f32 like the
    filter.  BQ dynamics transforms route through the closed-form joint
    columns of :func:`_make_joint_factor_bq` instead of shared deviations
    (module docstring).  (The full-covariance smoother lives in
    :func:`ssmtoybox_tpu.ssinf.gaussian_smoother`, which also reproduces the
    reference's off-by-one indexing; this one is textbook-only.)
    """
    from .ssinf import _scan_unroll
    unroll = _scan_unroll(unroll)
    cores, cast, m0_np, S0_np, _ = _sqrt_machinery(
        mod_dyn, mod_obs, tf_dyn, tf_obs, dtype)
    time_dev, meas_core = cores["time_dev"], cores["meas"]
    dim = S0_np.shape[0]
    predict_joint = _make_predict_joint(cores, time_dev, dim)

    @jax.jit
    def smooth_fn(data, init_mean=None, init_sqrt=None):
        m0 = cast(m0_np) if init_mean is None else cast(init_mean)
        S0 = cast(S0_np) if init_sqrt is None else cast(init_sqrt)
        data_ = cast(data)
        n_steps = data_.shape[-1]

        def fstep(carry, inp):
            m, S = carry
            y, k = inp
            m_pr, S_pr, G, R22 = predict_joint(m, S, k)
            _, _, m_fi, S_fi = meas_core(m_pr, S_pr, y, k)
            return (m_fi, S_fi), (m_pr, S_pr, m_fi, S_fi, G, R22)

        ks = jnp.arange(1, n_steps + 1)
        _, (pr_m, pr_S, fi_m, fi_S, Gs, R22s) = jax.lax.scan(
            fstep, (m0, S0), (data_.T, ks), unroll=unroll)

        def bstep(carry, inp):
            m_sm_next, S_sm_next = carry
            m_fi, G, R22, m_pr_next = inp
            m_sm = m_fi + small_matmul(G, m_sm_next - m_pr_next)
            S_sm = _qr_factor(jnp.concatenate(
                [R22, small_matmul(G, S_sm_next)], axis=-1))
            return (m_sm, S_sm), (m_sm, S_sm)

        xs = (fi_m[:-1], Gs[1:], R22s[1:], pr_m[1:])
        _, (sm_m, sm_S) = jax.lax.scan(bstep, (fi_m[-1], fi_S[-1]), xs,
                                       reverse=True, unroll=unroll)
        sm_m = jnp.concatenate([sm_m, fi_m[-1:]], axis=0)
        sm_S = jnp.concatenate([sm_S, fi_S[-1:]], axis=0)

        result = SqrtFilterResult(
            fi_mean=jnp.moveaxis(fi_m, 0, -1),
            fi_sqrt=jnp.moveaxis(fi_S, 0, -1),
            pr_mean=jnp.moveaxis(pr_m, 0, -1),
            pr_sqrt=jnp.moveaxis(pr_S, 0, -1),
        )
        return result, jnp.moveaxis(sm_m, 0, -1), jnp.moveaxis(sm_S, 0, -1)

    return smooth_fn


class SqrtOnlineState(struct.PyTreeNode):
    """Streaming square-root carry: mean, lower factor, 1-based step index."""

    mean: jax.Array          # (D,) or (B, D)
    sqrt: jax.Array          # (D, D) or (B, D, D)
    step: jax.Array          # scalar or (B,) int


class SqrtStepInfo(struct.PyTreeNode):
    """Per-step serving diagnostics in factor form (``innov_sqrt`` is the
    lower factor of the innovation covariance — NIS gating is two triangular
    substitutions away)."""

    y_pred: jax.Array
    innov: jax.Array
    innov_sqrt: jax.Array


def make_online_sqrt_filter(mod_dyn, mod_obs, tf_dyn, tf_obs, batch: bool = False,
                            donate: bool = True, dtype=None):
    """Streaming square-root filtering — the f32 serving configuration.

    The factor-form analogue of :func:`~ssmtoybox_tpu.online.make_online_filter`:
    ``init(batch_size=None) -> SqrtOnlineState`` and ``step(state, y,
    observed=True) -> (SqrtOnlineState, SqrtStepInfo)`` with donated state
    buffers, an optional multi-target batch axis and dropout handling.  With
    ``dtype=jnp.float32`` the served state is half the bytes of the full-
    covariance f64 path and stays PD by construction.
    """
    cores, cast, m0_np, S0_np, _ = _sqrt_machinery(
        mod_dyn, mod_obs, tf_dyn, tf_obs, dtype)
    step_core = cores["step"]

    def _leaves():
        return dict(mean=cast(m0_np), sqrt=cast(S0_np),
                    step=jnp.asarray(1, jnp.int32))

    def _one(state: SqrtOnlineState, y, observed):
        m_pr, S_pr, y_pr, S_yy, m_fi, S_fi = step_core(
            state.mean, state.sqrt, y, state.step)
        m_new = jnp.where(observed, m_fi, m_pr)
        S_new = jnp.where(observed, S_fi, S_pr)
        info = SqrtStepInfo(y_pred=y_pr, innov=y - y_pr, innov_sqrt=S_yy)
        return SqrtOnlineState(mean=m_new, sqrt=S_new, step=state.step + 1), info

    return streaming_api(SqrtOnlineState, _leaves, _one, batch, donate, cast=cast)


class SquareRootKalman:
    """Class-API square-root Kalman filter over a classical sigma-point rule.

    ``SquareRootKalman(dyn, obs, points='ut')`` mirrors the constructor
    conventions of the full-covariance filters (``ssinf.py:346-633``);
    ``forward_pass`` returns ``(fi_mean, fi_cov)`` with ``fi_cov``
    reconstituted as ``S S^T`` for drop-in comparison.  Pass
    ``dtype=jnp.float32`` for the TPU fast path.

    BQ filtering AND smoothing in factor form: pass prebuilt transforms
    instead of a rule string, e.g. ``SquareRootKalman(dyn, obs,
    tf_dyn=GaussianProcessTransform.create(...), tf_obs=...)`` — the f32
    square-root twin of ``GaussianProcessKalman``/``BayesSardKalman``/
    ``StudentProcessKalman``; ``smooth()`` routes BQ dynamics through the
    closed-form joint factorization (module docstring).
    """

    SUPPORTED_POINTS = ("sr", "ut", "gh", "fs")

    @staticmethod
    def _make_rule(points, dim, point_hyp):
        hyp = dict(point_hyp or {})
        if points == "sr":
            return SphericalRadialTransform(dim)
        if points == "ut":
            return UnscentedTransform(dim, **hyp)
        if points == "gh":
            return GaussHermiteTransform(dim, **hyp)
        if points == "fs":
            return FullySymmetricStudentTransform(dim, **hyp)
        raise ValueError(f"unsupported point set {points!r}; choose from "
                         f"{SquareRootKalman.SUPPORTED_POINTS}")

    def __init__(self, dyn, obs, points: str = "ut", point_hyp=None, dtype=None,
                 tf_dyn=None, tf_obs=None):
        if (tf_dyn is None) != (tf_obs is None):
            raise ValueError("pass both tf_dyn and tf_obs, or neither")
        self.mod_dyn, self.mod_obs = dyn, obs
        if tf_dyn is not None:
            self.tf_dyn, self.tf_obs = tf_dyn, tf_obs
        else:
            self.tf_dyn = self._make_rule(points, dyn.dim_in, point_hyp)
            self.tf_obs = self._make_rule(points, obs.dim_in, point_hyp)
        self._filter = make_sqrt_filter(dyn, obs, self.tf_dyn, self.tf_obs, dtype=dtype)
        self._dtype = dtype
        self._smoother = None
        self._result = None

    def forward_pass(self, data):
        res = self._filter(_check_record(data, int(self.mod_obs.dim_out)))
        self._result = res
        cov = jnp.einsum("ijn,kjn->ikn", res.fi_sqrt, res.fi_sqrt)
        return res.fi_mean, cov

    def forward_pass_batch(self, data_batch):
        res = jax.vmap(self._filter)(
            _check_record_batch(data_batch, int(self.mod_obs.dim_out)))
        self._result = res
        cov = jnp.einsum("mijn,mkjn->mikn", res.fi_sqrt, res.fi_sqrt)
        return res.fi_mean, cov

    def smooth(self, data):
        """Square-root RTS smoothing (textbook indexing): returns
        ``(sm_mean, sm_cov)`` with ``sm_cov`` reconstituted as ``S S^T``."""
        if self._smoother is None:
            self._smoother = make_sqrt_smoother(
                self.mod_dyn, self.mod_obs, self.tf_dyn, self.tf_obs,
                dtype=self._dtype)
        res, sm_m, sm_S = self._smoother(
            _check_record(data, int(self.mod_obs.dim_out)))
        self._result = res
        return sm_m, jnp.einsum("ijn,kjn->ikn", sm_S, sm_S)

    def reset(self):
        self._result = None


class FixedLagSqrtState(struct.PyTreeNode):
    """Streaming square-root fixed-lag smoother carry: filter state plus
    ring buffers (oldest first) of the filtered moments and the per-step
    smoother pieces — ``buf_G[j]``/``buf_R22[j]``/``buf_pr_m[j]`` belong to
    the time update INTO buffer slot ``j``."""

    mean: jax.Array
    sqrt: jax.Array
    step: jax.Array
    buf_fi_m: jax.Array      # (L, D) or (B, L, D)
    buf_fi_S: jax.Array      # (L, D, D) or (B, L, D, D)
    buf_G: jax.Array
    buf_R22: jax.Array
    buf_pr_m: jax.Array      # (L, D) or (B, L, D)


def make_fixed_lag_sqrt_smoother(mod_dyn, mod_obs, tf_dyn, tf_obs, lag: int,
                                 batch: bool = False, donate: bool = True,
                                 dtype=None):
    """Streaming FIXED-LAG smoothing in square-root form — the f32 serving
    twin of :func:`ssmtoybox_tpu.online.make_fixed_lag_smoother`.

    Every buffered quantity is a Cholesky factor and every backward update is
    one QR (``S_sm = tria([R22, G S_sm_next])``), so the emitted lagged
    covariance factor stays PD by construction in ``dtype=jnp.float32``.
    ``step(state, y, observed=True) -> (state, info, (sm_mean, sm_sqrt))``
    emits the smoothed estimate of the state ``lag - 1`` steps ago given all
    data so far (equal to the offline square-root RTS on the truncated
    record); output is meaningful once ``state.step > lag``.
    """
    if lag < 2:
        raise ValueError(f"fixed-lag smoothing needs lag >= 2; got {lag} "
                         f"(lag=1 is plain filtering — use make_online_sqrt_filter)")
    cores, cast, m0_np, S0_np, _ = _sqrt_machinery(
        mod_dyn, mod_obs, tf_dyn, tf_obs, dtype)
    time_dev, meas_core = cores["time_dev"], cores["meas"]
    dim = S0_np.shape[0]
    predict_joint = _make_predict_joint(cores, time_dev, dim)

    def _fresh_bufs():
        m0, S0 = cast(m0_np), cast(S0_np)
        zero_G = jnp.zeros((lag, dim, dim), dtype=S0.dtype)
        return dict(
            buf_fi_m=jnp.broadcast_to(m0, (lag,) + m0.shape),
            buf_fi_S=jnp.broadcast_to(S0, (lag,) + S0.shape),
            # zero gains during warmup: the backward scan then passes the
            # buffered (prior) factors through unchanged
            buf_G=zero_G,
            buf_R22=jnp.broadcast_to(S0, (lag,) + S0.shape),
            buf_pr_m=jnp.broadcast_to(m0, (lag,) + m0.shape),
        )

    def _leaves():
        return dict(mean=cast(m0_np), sqrt=cast(S0_np),
                    step=jnp.asarray(1, jnp.int32), **_fresh_bufs())

    def _one(state: FixedLagSqrtState, y, observed):
        k = state.step
        m_pr, S_pr, G, R22 = predict_joint(state.mean, state.sqrt, k)
        y_pr, S_yy, m_fi, S_fi = meas_core(m_pr, S_pr, y, k)
        m_new = jnp.where(observed, m_fi, m_pr)
        S_new = jnp.where(observed, S_fi, S_pr)

        shift = lambda buf, new: jnp.roll(buf, -1, axis=0).at[-1].set(new)
        buf_fi_m = shift(state.buf_fi_m, m_new)
        buf_fi_S = shift(state.buf_fi_S, S_new)
        buf_G = shift(state.buf_G, G)
        buf_R22 = shift(state.buf_R22, R22)
        buf_pr_m = shift(state.buf_pr_m, m_pr)

        def bstep(carry, inp):
            m_sm_next, S_sm_next = carry
            fi_m_j, G_j1, R22_j1, pr_m_j1 = inp
            m_sm = fi_m_j + small_matmul(G_j1, m_sm_next - pr_m_j1)
            S_sm = _qr_factor(jnp.concatenate(
                [R22_j1, small_matmul(G_j1, S_sm_next)], axis=-1))
            return (m_sm, S_sm), None

        xs = (buf_fi_m[:-1], buf_G[1:], buf_R22[1:], buf_pr_m[1:])
        (sm_m, sm_S), _ = jax.lax.scan(bstep, (buf_fi_m[-1], buf_fi_S[-1]),
                                       xs, reverse=True)

        new_state = FixedLagSqrtState(mean=m_new, sqrt=S_new, step=k + 1,
                                      buf_fi_m=buf_fi_m, buf_fi_S=buf_fi_S,
                                      buf_G=buf_G, buf_R22=buf_R22,
                                      buf_pr_m=buf_pr_m)
        info = SqrtStepInfo(y_pred=y_pr, innov=y - y_pr, innov_sqrt=S_yy)
        return new_state, info, (sm_m, sm_S)

    return streaming_api(FixedLagSqrtState, _leaves, _one, batch, donate,
                         cast=cast)


# ---------------------------------------------------------------------------
# Square-root STUDENTIAN filtering — f32 outlier-robust serving
# ---------------------------------------------------------------------------

class SqrtStudentFilterResult(struct.PyTreeNode):
    """Stacked square-root Student forward-pass moments (state-dim first,
    time last) — the factor-form twin of
    :class:`ssmtoybox_tpu.ssinf.StudentFilterResult`.

    ``fi_smat_sqrt`` holds lower Cholesky factors of the filtered SCALE
    matrices; ``fi_cov_sqrt`` factors the pre-rescale matrix the reference
    stores as the filtered "covariance" (its FIXME at ``ssinf.py:726-727`` —
    kept for drop-in parity); ``dof_fi`` is the accumulated degrees of
    freedom.  The MOMENT covariance of the filtered Student marginal is
    ``dof/(dof - 2) * S S^T`` with the matching ``dof_fi`` entry."""

    fi_mean: jax.Array
    fi_cov_sqrt: jax.Array
    fi_smat_sqrt: jax.Array
    dof_fi: jax.Array
    pr_mean: jax.Array
    pr_smat_sqrt: jax.Array


def _sqrt_student_machinery(mod_dyn, mod_obs, tf_dyn, tf_obs, dof, fixed_dof,
                            dtype):
    """Factor-form Student step core: the recursion of
    :func:`ssmtoybox_tpu.ssinf.studentian_filter` (itself the reference's
    ``ssinf.py:634-736``) on Cholesky factors of the SCALE matrices.

    The Student recursion differs from the Gaussian one by exactly two
    scalars, and both enter a factor form as column multipliers:

    * the predictive scale ``(nu_pr - 2)/nu_pr`` multiplies the transform's
      output covariance before the scale-form noise term is added
      (``x_smat_pr = scale * x_cov_pr + G S_q G^T``) — passed to the
      transform factorizations as ``out_sqrt_scale = sqrt(scale)``, which
      scales the transform columns but not the noise columns;
    * the posterior rescale ``(nu + delta^T delta)/(nu + dim_y)`` multiplies
      the downdated factor, with ``delta = S_yy^{-1} (y - y_pred)`` — one
      triangular substitution against the innovation factor the measurement
      update already built.

    Everything else (QR factorization of weighted deviations, triangular
    gain solves, rank-1 gain downdates, non-additive state augmentation in
    factor form) is shared verbatim with the Gaussian machinery.  Works with
    classical sigma-point rules (FS for Student inputs) AND single-output BQ
    transforms (GPQ on Student points, TPQ with its data-dependent EMV) —
    i.e. the factor-form twins of ``FullySymmetricStudent``, ``GPQStudent``
    and ``StudentProcessStudent``.
    """
    def cast(a):
        return jnp.asarray(a, dtype=dtype)

    if dof <= 2.0:               # same guard as the full path (ssinf.py:612)
        dof = 4.0
    dof_f = float(dof)

    x0_mean, x0_smat, x0_dof = (np.asarray(a) for a in mod_dyn.init_rv.get_stats())
    q_mean, q_cov, q_dof = (np.asarray(a) for a in mod_dyn.noise_rv.get_stats())
    r_mean, r_cov, r_dof = (np.asarray(a) for a in mod_obs.noise_rv.get_stats())
    G = np.asarray(mod_dyn.noise_gain)
    dim_x = x0_mean.shape[0]
    dim_y = int(mod_obs.dim_out)
    q_dof_f, r_dof_f = float(q_dof), float(r_dof)

    init_scale = (dof_f - 2.0) / dof_f
    S0_np = _psd_chol(init_scale * x0_smat)
    sqrt_iscale = float(np.sqrt(init_scale))

    pts_d, wm_d_, factor_d, _, statics_d = _transform_core(
        tf_dyn, "dynamics", cast, state_dim=dim_x)
    pts_o, wm_o_, factor_o, cross_o, _ = _transform_core(
        tf_obs, "measurement", cast, state_dim=dim_x)

    # noise factors in SCALE form: q_smat = (dof-2)/dof * q_cov (and r
    # alike) are loop invariants, like the full path's hoisted GSGt.
    # Non-additive noise augments the state in factor form exactly as in
    # _sqrt_machinery, with the jitter floor for the same singularity reason.
    if mod_dyn.noise_additive:
        Sq_ = cast(sqrt_iscale * (G @ _psd_chol(q_cov)))
        q_mean_ = None
        dX_bot_d = None
    else:
        Sq_ = cast(_jit_cols(dim_x))
        q_mean_ = cast(q_mean)
        dX_bot_d = cast(sqrt_iscale * _psd_chol(q_cov) @ np.asarray(pts_d)[dim_x:])
    if mod_obs.noise_additive:
        Sr_ = cast(sqrt_iscale * _psd_chol(r_cov))
        r_mean_ = None
        dX_bot_o = None
    else:
        Sr_ = cast(_jit_cols(dim_y))
        r_mean_ = cast(r_mean)
        dX_bot_o = cast(sqrt_iscale * _psd_chol(r_cov) @ np.asarray(pts_o)[dim_x:])

    def pred_scale(S, dof_fi):
        """Per-step predictive scale ``(nu_pr - 2)/nu_pr`` and its sqrt."""
        if fixed_dof:            # ssinf.py:648-653: heavy tails preserved
            dof_pr = jnp.minimum(jnp.minimum(dof_fi, q_dof_f), r_dof_f)
            scale = ((dof_pr - 2.0) / dof_pr).astype(S.dtype)
        else:
            scale = jnp.asarray(init_scale, S.dtype)
        return scale, jnp.sqrt(scale)

    def time_dev(m, S, k):
        """Propagate sigma points of the scale factor; no factorization —
        the smoother consumes the raw deviations through its joint QR."""
        dX_in = small_matmul(S, pts_d[:dim_x])
        if mod_dyn.noise_additive:
            X = m[:, None] + dX_in
        else:
            m_aug = jnp.concatenate([m, q_mean_.astype(S.dtype)])
            dX_aug = jnp.concatenate(
                [dX_in, jnp.broadcast_to(dX_bot_d.astype(S.dtype),
                                         dX_in.shape[:-2] + dX_bot_d.shape)],
                axis=-2)
            X = m_aug[:, None] + dX_aug
        fX = apply_f_columns(mod_dyn.dyn_eval, X, k - 1).astype(S.dtype)
        m_pr = small_matmul(fX, wm_d_)
        dfx = fX - m_pr[:, None]
        return m_pr, fX, dfx, dX_in

    def meas_core(m_pr, S_pr, scale, ssc, dof_fi, y, k):
        """Factor-form Student measurement update (ssinf.py:700-736)."""
        dX = small_matmul(S_pr, pts_o[:dim_x])
        if mod_obs.noise_additive:
            Xp = m_pr[:, None] + dX
        else:
            m_aug = jnp.concatenate([m_pr, r_mean_.astype(S_pr.dtype)])
            dX_aug = jnp.concatenate(
                [dX, jnp.broadcast_to(dX_bot_o.astype(S_pr.dtype),
                                      dX.shape[:-2] + dX_bot_o.shape)],
                axis=-2)
            Xp = m_aug[:, None] + dX_aug
        hX = apply_f_columns(mod_obs.meas_eval, Xp, k - 1).astype(S_pr.dtype)
        y_pr = small_matmul(hX, wm_o_)
        dhx = hX - y_pr[:, None]
        S_yy = factor_o(hX, dhx, Sr_, out_sqrt_scale=ssc)
        P_xy = scale * cross_o(S_pr, dX, hX, dhx)

        B = tri_solve_small(S_yy, jnp.swapaxes(P_xy, -1, -2), lower=True)
        C = tri_solve_small(jnp.swapaxes(S_yy, -1, -2), B, lower=False)
        K = jnp.swapaxes(C, -1, -2)
        m_fi = m_pr + small_matmul(K, y - y_pr)
        U = small_matmul(K, S_yy)
        S_cov_fi = S_pr
        for j in range(dim_y):
            S_cov_fi = cholupdate_small(S_cov_fi, U[..., :, j], -1.0)
        # delta^T delta = r^T (S_yy S_yy^T)^-1 r — invariant to the factor's
        # column signs, so QR-derived factors are as good as a Cholesky here
        delta = tri_solve_small(S_yy, y - y_pr, lower=True)
        scale_fi = ((dof_f + jnp.sum(delta * delta, axis=-1))
                    / (dof_f + dim_y)).astype(S_pr.dtype)
        S_smat_fi = jnp.sqrt(scale_fi) * S_cov_fi
        dof_next = dof_fi + dim_y
        return y_pr, S_yy, m_fi, S_cov_fi, S_smat_fi, dof_next

    def step_core(m, S, dof_fi, y, k):
        """One factor-form Student predict+update.  Returns ``(m_pr, S_pr,
        y_pr, S_yy, m_fi, S_cov_fi, S_smat_fi, dof_next)`` — ``S_cov_fi`` is
        the pre-rescale (quirky "covariance") factor, ``S_smat_fi`` the
        filtered scale factor."""
        scale, ssc = pred_scale(S, dof_fi)
        m_pr, fX, dfx, _ = time_dev(m, S, k)
        S_pr = factor_d(fX, dfx, Sq_, out_sqrt_scale=ssc)
        y_pr, S_yy, m_fi, S_cov_fi, S_smat_fi, dof_next = meas_core(
            m_pr, S_pr, scale, ssc, dof_fi, y, k)
        return m_pr, S_pr, y_pr, S_yy, m_fi, S_cov_fi, S_smat_fi, dof_next

    if fixed_dof:
        # dof_pr = min(dof_fi, q_dof, r_dof) never exceeds min(q, r), so the
        # per-step predictive scale is bounded by this static supremum (the
        # smoother's joint-factorization existence check needs it)
        m_dof = min(q_dof_f, r_dof_f)
        scale_sup = (m_dof - 2.0) / m_dof
    else:
        scale_sup = init_scale
    cores = dict(step=step_core, pred_scale=pred_scale, time_dev=time_dev,
                 meas=meas_core, statics_d=dict(statics_d, Sq=Sq_),
                 bq_dyn=statics_d.get("bq", False), scale_sup=scale_sup)
    return cores, cast, x0_mean, S0_np, float(x0_dof), dim_y


def make_sqrt_studentian_filter(mod_dyn, mod_obs, tf_dyn, tf_obs,
                                dof: float = 4.0, fixed_dof: bool = True,
                                dtype=None, unroll: int | None = None):
    """Build a jitted square-root STUDENT-t filter — outlier-robust serving
    on the TPU f32 fast path.

    The factor-form twin of :func:`ssmtoybox_tpu.ssinf.studentian_filter`
    (same signature conventions): returns ``filter_fn(data, init_mean=None,
    init_sqrt=None) -> SqrtStudentFilterResult`` over a (dim_y, N) record;
    vmap it for MC batches.  ``init_sqrt`` is a factor of the INITIAL SCALE
    matrix ``(dof-2)/dof * init_rv scale`` (defaults to the model prior).
    With ``dtype=jnp.float32`` the recursion stays positive-definite by
    construction where the full-covariance Student recursion — which both
    rescales and downdates every step — loses definiteness first.  ``unroll``
    amortizes scan dispatch (env ``SSMTPU_SCAN_UNROLL``).
    """
    from .ssinf import _scan_unroll
    unroll = _scan_unroll(unroll)
    cores, cast, m0_np, S0_np, dof0, _ = _sqrt_student_machinery(
        mod_dyn, mod_obs, tf_dyn, tf_obs, dof, fixed_dof, dtype)
    step_core = cores["step"]

    @jax.jit
    def filter_fn(data, init_mean=None, init_sqrt=None):
        m0 = cast(m0_np) if init_mean is None else cast(init_mean)
        S0 = cast(S0_np) if init_sqrt is None else cast(init_sqrt)
        data_ = cast(data)
        n_steps = data_.shape[-1]

        def step(carry, inp):
            m, S, dof_fi = carry
            y, k = inp
            m_pr, S_pr, _, _, m_fi, S_cov, S_fi, dof_next = step_core(
                m, S, dof_fi, y, k)
            return (m_fi, S_fi, dof_next), (m_fi, S_cov, S_fi, dof_next,
                                            m_pr, S_pr)

        ks = jnp.arange(1, n_steps + 1)
        init = (m0, S0, cast(dof0))
        _, (fi_m, fi_C, fi_S, dofs, pr_m, pr_S) = jax.lax.scan(
            step, init, (data_.T, ks), unroll=unroll)
        return SqrtStudentFilterResult(
            fi_mean=jnp.moveaxis(fi_m, 0, -1),
            fi_cov_sqrt=jnp.moveaxis(fi_C, 0, -1),
            fi_smat_sqrt=jnp.moveaxis(fi_S, 0, -1),
            dof_fi=dofs,
            pr_mean=jnp.moveaxis(pr_m, 0, -1),
            pr_smat_sqrt=jnp.moveaxis(pr_S, 0, -1),
        )

    return filter_fn


class SqrtStudentOnlineState(struct.PyTreeNode):
    """Streaming square-root Student carry: mean, SCALE factor, accumulated
    dof, 1-based step index."""

    mean: jax.Array          # (D,) or (B, D)
    sqrt: jax.Array          # (D, D) or (B, D, D) — scale-matrix factor
    dof: jax.Array           # scalar or (B,)
    step: jax.Array          # scalar or (B,) int


def make_online_sqrt_student_filter(mod_dyn, mod_obs, tf_dyn, tf_obs,
                                    dof: float = 4.0, fixed_dof: bool = True,
                                    batch: bool = False, donate: bool = True,
                                    dtype=None):
    """Streaming square-root STUDENT filtering — outlier-robust f32 serving.

    Same ``init(batch_size=None)`` / ``step(state, y, observed=True) ->
    (SqrtStudentOnlineState, SqrtStepInfo)`` surface as
    :func:`make_online_sqrt_filter`, with the Student scale/dof bookkeeping
    in the carry.  A dropped measurement (``observed=False``) keeps the
    predicted mean/scale and leaves the dof untouched (no information
    arrived).  NIS-style innovation gating works unchanged off
    ``info.innov_sqrt`` — two triangular substitutions — which is how a
    serving stack rejects glint outliers *before* they enter the state.
    """
    cores, cast, m0_np, S0_np, dof0, _ = _sqrt_student_machinery(
        mod_dyn, mod_obs, tf_dyn, tf_obs, dof, fixed_dof, dtype)
    step_core = cores["step"]

    def _leaves():
        return dict(mean=cast(m0_np), sqrt=cast(S0_np), dof=cast(dof0),
                    step=jnp.asarray(1, jnp.int32))

    def _one(state: SqrtStudentOnlineState, y, observed):
        m_pr, S_pr, y_pr, S_yy, m_fi, _, S_fi, dof_next = step_core(
            state.mean, state.sqrt, state.dof, y, state.step)
        m_new = jnp.where(observed, m_fi, m_pr)
        S_new = jnp.where(observed, S_fi, S_pr)
        dof_new = jnp.where(observed, dof_next, state.dof)
        info = SqrtStepInfo(y_pred=y_pr, innov=y - y_pr, innov_sqrt=S_yy)
        return SqrtStudentOnlineState(mean=m_new, sqrt=S_new, dof=dof_new,
                                      step=state.step + 1), info

    return streaming_api(SqrtStudentOnlineState, _leaves, _one, batch, donate,
                         cast=cast)


class SquareRootStudent:
    """Class-API square-root Student filter.

    ``SquareRootStudent(dyn, obs)`` mirrors the constructor conventions of
    :class:`ssmtoybox_tpu.ssinf.FullySymmetricStudent` (degree/kappa pick the
    fully-symmetric rule, with the noise dofs shaping the points exactly as
    there); pass prebuilt transforms instead for the factor-form twins of
    ``GPQStudent``/``StudentProcessStudent``, e.g. ``SquareRootStudent(dyn,
    obs, tf_dyn=StudentTProcessTransform.create(...), tf_obs=...)``.

    ``forward_pass`` returns ``(fi_mean, fi_cov)`` with ``fi_cov``
    reconstituted as ``S S^T`` from the pre-rescale factor — the same quirky
    scale-derived matrix ``StudentianInference.forward_pass`` reports
    (reference FIXME at ``ssinf.py:726-727``) — for drop-in comparison.
    Pass ``dtype=jnp.float32`` for the TPU fast path.
    """

    def __init__(self, dyn, obs, degree: int = 3, kappa=None, dof: float = 4.0,
                 fixed_dof: bool = True, dtype=None, tf_dyn=None, tf_obs=None):
        if (tf_dyn is None) != (tf_obs is None):
            raise ValueError("pass both tf_dyn and tf_obs, or neither")
        self.mod_dyn, self.mod_obs = dyn, obs
        if tf_dyn is None:
            dyn_dof = min(dyn.init_rv.dof, dyn.noise_rv.dof)
            obs_dof = min(dyn_dof, obs.noise_rv.dof)
            tf_dyn = FullySymmetricStudentTransform(dyn.dim_in, degree, kappa,
                                                    dyn_dof)
            tf_obs = FullySymmetricStudentTransform(obs.dim_in, degree, kappa,
                                                    obs_dof)
        self.tf_dyn, self.tf_obs = tf_dyn, tf_obs
        self._filter = make_sqrt_studentian_filter(
            dyn, obs, tf_dyn, tf_obs, dof=dof, fixed_dof=fixed_dof, dtype=dtype)
        self._opts = dict(dof=dof, fixed_dof=fixed_dof, dtype=dtype)
        self._smoother = None
        self._result = None

    def forward_pass(self, data):
        res = self._filter(_check_record(data, int(self.mod_obs.dim_out)))
        self._result = res
        cov = jnp.einsum("ijn,kjn->ikn", res.fi_cov_sqrt, res.fi_cov_sqrt)
        return res.fi_mean, cov

    def forward_pass_batch(self, data_batch):
        res = jax.vmap(self._filter)(
            _check_record_batch(data_batch, int(self.mod_obs.dim_out)))
        self._result = res
        cov = jnp.einsum("mijn,mkjn->mikn", res.fi_cov_sqrt, res.fi_cov_sqrt)
        return res.fi_mean, cov

    def smooth(self, data):
        """Square-root Student RTS smoothing (textbook indexing): returns
        ``(sm_mean, sm_smat)`` with the smoothed SCALE matrices reconstituted
        as ``S S^T`` — the factor twin of ``StudentianInference.
        backward_pass`` fed :func:`studentian_smoother` semantics."""
        if self._smoother is None:
            self._smoother = make_sqrt_studentian_smoother(
                self.mod_dyn, self.mod_obs, self.tf_dyn, self.tf_obs,
                **self._opts)
        res, sm_m, sm_S = self._smoother(
            _check_record(data, int(self.mod_obs.dim_out)))
        self._result = res
        return sm_m, jnp.einsum("ijn,kjn->ikn", sm_S, sm_S)

    def reset(self):
        self._result = None


def _make_student_predict_joint(cores, dim):
    """Joint (x_pred, x_prev) factorization for the Student smoother.

    The Student joint SCALE matrix is NOT representable by shared sigma-point
    deviations: the predicted block and the cross block carry the per-step
    predictive scale ``s = (nu_pr - 2)/nu_pr`` while the previous-filtered
    block is the carry ``P_fi`` itself, so a shared-deviation QR (bottom rows
    ``sqrt(s) * dX``) reproduces ``s*c*P_fi`` in the bottom block — ``c`` the
    rule's reconstruction factor — instead of ``P_fi``.  The gain ``G`` and
    the predicted factor from that QR are EXACT anyway (they only involve the
    predicted and cross blocks); the conditional factor is off by exactly

        R22_true R22_true^T = R22_joint R22_joint^T + (1 - s*c) P_fi,

    a rank-``dim`` correction applied as signed rank-1 updates with the
    columns of the carried factor ``S`` (``cholupdate_small`` takes either
    sign; for matched dofs ``s*c = 1`` and the correction vanishes).  BQ
    dynamics use the closed-form joint columns of :func:`_bq_joint_pieces`
    with the kernel's weighting scalar ``kappa`` in the role of ``c``: the
    bottom block carries ``sqrt(s*kappa) S`` (its ``s*kappa*P_fi`` excess
    corrected by ``beta = 1 - s*kappa``, zero for matched dofs), and the
    same ``s*c <= 1`` existence constraint applies.
    """
    st_ = cores["statics_d"]
    time_dev, pred_scale = cores["time_dev"], cores["pred_scale"]
    Sq_ = st_["Sq"]

    def _check_exists(c, kind):
        """The correction ``(1 - scale*c) P_fi`` only has a Cholesky-factor
        form when the implied conditional ``P_fi - G P_pr G^T`` stays PSD;
        ``scale*c > 1`` (a rule/kernel built for heavier tails than the
        filter's own predictive scale) breaks that — the full-covariance
        :func:`ssmtoybox_tpu.ssinf.studentian_smoother` has no such
        constraint.  Matched dofs give ``scale*c = 1`` exactly."""
        sup = cores["scale_sup"] * c
        if sup > 1.0 + 1e-9:
            raise TypeError(
                f"square-root Student smoothing needs scale*c <= 1: the "
                f"predictive scale reaches {cores['scale_sup']:.4f} while the "
                f"{kind} reconstructs c={c:.4f} times identity "
                f"(scale*c={sup:.4f} > 1), so the conditional covariance "
                f"P_fi - G P_pr G^T is indefinite and has no factor — match "
                f"the rule/kernel dof to the filter and noise dofs, or use "
                f"the full-covariance studentian_smoother")

    if not cores["bq_dyn"]:
        c = _rule_recon_scalar(st_)
        _check_exists(c, "dynamics rule")
        sqrt_pos_d, wc_d, neg_d = st_["sqrt_pos_d"], st_["wc_d"], st_["neg_d"]

        def predict_joint(m, S, dof_fi, k):
            scale, ssc = pred_scale(S, dof_fi)
            m_pr, fX, dfx, dX_in = time_dev(m, S, k)
            zeros = jnp.zeros(dX_in.shape[:-1] + (Sq_.shape[-1],), dX_in.dtype)
            top = jnp.concatenate([dfx * sqrt_pos_d * ssc, Sq_ + zeros], axis=-1)
            bot = jnp.concatenate([dX_in * sqrt_pos_d * ssc, zeros], axis=-1)
            L = _qr_factor(jnp.concatenate([top, bot], axis=-2))
            for i in neg_d:
                v = ssc * jnp.concatenate([dfx[..., :, i], dX_in[..., :, i]],
                                          axis=-1)
                L = cholupdate_small(L, v, wc_d[i])
            L11 = L[..., :dim, :dim]
            L21 = L[..., dim:, :dim]
            R22 = L[..., dim:, dim:]
            Gt = tri_solve_small(jnp.swapaxes(L11, -1, -2),
                                 jnp.swapaxes(L21, -1, -2), lower=False)
            beta = 1.0 - scale * c
            for j in range(dim):
                R22 = cholupdate_small(R22, S[..., :, j], beta)
            return scale, ssc, m_pr, L11, jnp.swapaxes(Gt, -1, -2), R22
        return predict_joint

    # BQ dynamics: closed-form joint columns (cf. _make_joint_factor_bq),
    # with sqrt(scale) on every transform column and sqrt(scale*kappa) on
    # the bottom block — kappa the kernel's weighting scalar
    # (:func:`_bq_joint_pieces`); the bottom excess scale*kappa*P_fi is
    # corrected to P_fi by the rank-dim update below
    kap, WccT_, W_hat_ = _bq_joint_pieces(st_)
    _check_exists(kap, "kernel weighting density")
    emv_cols = st_["emv_cols_b"]

    def predict_joint(m, S, dof_fi, k):
        scale, ssc = pred_scale(S, dof_fi)
        m_pr, fX, _, _ = time_dev(m, S, k)
        A1 = ssc * small_matmul(fX, WccT_.astype(fX.dtype))
        A2 = ssc * small_matmul(fX, W_hat_.astype(fX.dtype))
        E = ssc * (emv_cols(fX) + jnp.zeros(fX.shape[:-2] + (1, 1), fX.dtype))
        nq = Sq_.shape[-1]
        top = jnp.concatenate(
            [A1, A2, E, Sq_.astype(fX.dtype) +
             jnp.zeros(fX.shape[:-2] + (1, 1), fX.dtype)], axis=-1)
        pad = jnp.zeros(S.shape[:-1] + (A2.shape[-1] + E.shape[-1] + nq,),
                        S.dtype)
        bot = jnp.concatenate([(float(np.sqrt(kap)) * ssc) * S, pad], axis=-1)
        L = _qr_factor(jnp.concatenate([top, bot], axis=-2))
        L11 = L[..., :dim, :dim]
        L21 = L[..., dim:, :dim]
        R22 = L[..., dim:, dim:]
        Gt = tri_solve_small(jnp.swapaxes(L11, -1, -2),
                             jnp.swapaxes(L21, -1, -2), lower=False)
        beta = 1.0 - scale * kap
        for j in range(dim):
            R22 = cholupdate_small(R22, S[..., :, j], beta)
        return scale, ssc, m_pr, L11, jnp.swapaxes(Gt, -1, -2), R22
    return predict_joint


def make_sqrt_studentian_smoother(mod_dyn, mod_obs, tf_dyn, tf_obs,
                                  dof: float = 4.0, fixed_dof: bool = True,
                                  dtype=None, unroll: int | None = None):
    """Square-root STUDENT-t RTS smoother (textbook indexing).

    Factor-form twin of :func:`ssmtoybox_tpu.ssinf.studentian_smoother`
    (itself a beyond-parity feature — the reference leaves its Student
    smoother unimplemented, ``ssinf.py:738-740``): returns ``smooth_fn(data)
    -> (SqrtStudentFilterResult, sm_mean, sm_sqrt)`` with ``sm_sqrt`` lower
    factors of the smoothed SCALE matrices (multiply ``S S^T`` by
    ``dof/(dof - 2)`` with the terminal ``dof_fi`` for moment covariances).
    The forward pass triangularizes the joint time-update deviations with
    the Student scale corrections of :func:`_make_student_predict_joint`;
    the backward pass is the array RTS, one QR per step.
    """
    from .ssinf import _scan_unroll
    unroll = _scan_unroll(unroll)
    cores, cast, m0_np, S0_np, dof0, _ = _sqrt_student_machinery(
        mod_dyn, mod_obs, tf_dyn, tf_obs, dof, fixed_dof, dtype)
    meas_core = cores["meas"]
    dim = S0_np.shape[0]
    predict_joint = _make_student_predict_joint(cores, dim)

    @jax.jit
    def smooth_fn(data, init_mean=None, init_sqrt=None):
        m0 = cast(m0_np) if init_mean is None else cast(init_mean)
        S0 = cast(S0_np) if init_sqrt is None else cast(init_sqrt)
        data_ = cast(data)
        n_steps = data_.shape[-1]

        def fstep(carry, inp):
            m, S, dof_fi = carry
            y, k = inp
            scale, ssc, m_pr, S_pr, G, R22 = predict_joint(m, S, dof_fi, k)
            y_pr, S_yy, m_fi, S_cov, S_fi, dof_next = meas_core(
                m_pr, S_pr, scale, ssc, dof_fi, y, k)
            return (m_fi, S_fi, dof_next), (m_pr, S_pr, m_fi, S_cov, S_fi,
                                            dof_next, G, R22)

        ks = jnp.arange(1, n_steps + 1)
        _, (pr_m, pr_S, fi_m, fi_C, fi_S, dofs, Gs, R22s) = jax.lax.scan(
            fstep, (m0, S0, cast(dof0)), (data_.T, ks), unroll=unroll)

        def bstep(carry, inp):
            m_sm_next, S_sm_next = carry
            m_fi, G, R22, m_pr_next = inp
            m_sm = m_fi + small_matmul(G, m_sm_next - m_pr_next)
            S_sm = _qr_factor(jnp.concatenate(
                [R22, small_matmul(G, S_sm_next)], axis=-1))
            return (m_sm, S_sm), (m_sm, S_sm)

        xs = (fi_m[:-1], Gs[1:], R22s[1:], pr_m[1:])
        _, (sm_m, sm_S) = jax.lax.scan(bstep, (fi_m[-1], fi_S[-1]), xs,
                                       reverse=True, unroll=unroll)
        sm_m = jnp.concatenate([sm_m, fi_m[-1:]], axis=0)
        sm_S = jnp.concatenate([sm_S, fi_S[-1:]], axis=0)

        result = SqrtStudentFilterResult(
            fi_mean=jnp.moveaxis(fi_m, 0, -1),
            fi_cov_sqrt=jnp.moveaxis(fi_C, 0, -1),
            fi_smat_sqrt=jnp.moveaxis(fi_S, 0, -1),
            dof_fi=dofs,
            pr_mean=jnp.moveaxis(pr_m, 0, -1),
            pr_smat_sqrt=jnp.moveaxis(pr_S, 0, -1),
        )
        return result, jnp.moveaxis(sm_m, 0, -1), jnp.moveaxis(sm_S, 0, -1)

    return smooth_fn


class FixedLagSqrtStudentState(struct.PyTreeNode):
    """Streaming square-root Student fixed-lag carry: filter state (mean,
    SCALE factor, dof) plus ring buffers (oldest first) of the filtered
    moments and the per-step smoother pieces, laid out exactly like
    :class:`FixedLagSqrtState`."""

    mean: jax.Array
    sqrt: jax.Array
    dof: jax.Array
    step: jax.Array
    buf_fi_m: jax.Array      # (L, D) or (B, L, D)
    buf_fi_S: jax.Array      # (L, D, D) or (B, L, D, D)
    buf_G: jax.Array
    buf_R22: jax.Array
    buf_pr_m: jax.Array      # (L, D) or (B, L, D)


def make_fixed_lag_sqrt_student_smoother(mod_dyn, mod_obs, tf_dyn, tf_obs,
                                         lag: int, dof: float = 4.0,
                                         fixed_dof: bool = True,
                                         batch: bool = False,
                                         donate: bool = True, dtype=None):
    """Streaming FIXED-LAG Student smoothing in square-root form.

    The outlier-robust twin of :func:`make_fixed_lag_sqrt_smoother`: every
    buffered quantity is a Cholesky factor of a SCALE matrix, the forward
    step is the factor-form Student update with the joint-factorization
    pieces of :func:`_make_student_predict_joint` (same existence
    constraint: ``scale*c <= 1``, matched dofs give equality), and each
    arriving measurement re-smooths the ring buffer with one QR per lag
    step.  ``step(state, y, observed=True) -> (state, info, (sm_mean,
    sm_sqrt))`` emits the smoothed SCALE factor of the state ``lag - 1``
    steps ago given all data so far; a dropped measurement keeps the
    prediction and does not advance the dof.
    """
    if lag < 2:
        raise ValueError(f"fixed-lag smoothing needs lag >= 2; got {lag} "
                         f"(lag=1 is plain filtering — use "
                         f"make_online_sqrt_student_filter)")
    cores, cast, m0_np, S0_np, dof0, _ = _sqrt_student_machinery(
        mod_dyn, mod_obs, tf_dyn, tf_obs, dof, fixed_dof, dtype)
    meas_core = cores["meas"]
    dim = S0_np.shape[0]
    predict_joint = _make_student_predict_joint(cores, dim)

    def _fresh_bufs():
        m0, S0 = cast(m0_np), cast(S0_np)
        zero_G = jnp.zeros((lag, dim, dim), dtype=S0.dtype)
        return dict(
            buf_fi_m=jnp.broadcast_to(m0, (lag,) + m0.shape),
            buf_fi_S=jnp.broadcast_to(S0, (lag,) + S0.shape),
            # zero gains during warmup: the backward scan then passes the
            # buffered (prior) factors through unchanged
            buf_G=zero_G,
            buf_R22=jnp.broadcast_to(S0, (lag,) + S0.shape),
            buf_pr_m=jnp.broadcast_to(m0, (lag,) + m0.shape),
        )

    def _leaves():
        return dict(mean=cast(m0_np), sqrt=cast(S0_np), dof=cast(dof0),
                    step=jnp.asarray(1, jnp.int32), **_fresh_bufs())

    def _one(state: FixedLagSqrtStudentState, y, observed):
        k = state.step
        scale, ssc, m_pr, S_pr, G, R22 = predict_joint(
            state.mean, state.sqrt, state.dof, k)
        y_pr, S_yy, m_fi, _, S_fi, dof_next = meas_core(
            m_pr, S_pr, scale, ssc, state.dof, y, k)
        m_new = jnp.where(observed, m_fi, m_pr)
        S_new = jnp.where(observed, S_fi, S_pr)
        dof_new = jnp.where(observed, dof_next, state.dof)

        shift = lambda buf, new: jnp.roll(buf, -1, axis=0).at[-1].set(new)
        buf_fi_m = shift(state.buf_fi_m, m_new)
        buf_fi_S = shift(state.buf_fi_S, S_new)
        buf_G = shift(state.buf_G, G)
        buf_R22 = shift(state.buf_R22, R22)
        buf_pr_m = shift(state.buf_pr_m, m_pr)

        def bstep(carry, inp):
            m_sm_next, S_sm_next = carry
            fi_m_j, G_j1, R22_j1, pr_m_j1 = inp
            m_sm = fi_m_j + small_matmul(G_j1, m_sm_next - pr_m_j1)
            S_sm = _qr_factor(jnp.concatenate(
                [R22_j1, small_matmul(G_j1, S_sm_next)], axis=-1))
            return (m_sm, S_sm), None

        xs = (buf_fi_m[:-1], buf_G[1:], buf_R22[1:], buf_pr_m[1:])
        (sm_m, sm_S), _ = jax.lax.scan(bstep, (buf_fi_m[-1], buf_fi_S[-1]),
                                       xs, reverse=True)

        new_state = FixedLagSqrtStudentState(
            mean=m_new, sqrt=S_new, dof=dof_new, step=k + 1,
            buf_fi_m=buf_fi_m, buf_fi_S=buf_fi_S, buf_G=buf_G,
            buf_R22=buf_R22, buf_pr_m=buf_pr_m)
        info = SqrtStepInfo(y_pred=y_pr, innov=y - y_pr, innov_sqrt=S_yy)
        return new_state, info, (sm_m, sm_S)

    return streaming_api(FixedLagSqrtStudentState, _leaves, _one, batch,
                         donate, cast=cast)
