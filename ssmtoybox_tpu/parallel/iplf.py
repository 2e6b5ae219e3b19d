"""Time-parallel iterated NONLINEAR filtering/smoothing (SLR + associative scan).

Extends :mod:`ssmtoybox_tpu.parallel.timescan` from linear-Gaussian models to
the full nonlinear SSM zoo.  The reference (SURVEY §5.7) scales the inherently
sequential time recursion only by looping (``ssinf.py:101-111``); this module
removes the sequential-time bottleneck for nonlinear models (additive or
augmented non-additive noise):

1. **Statistical linear regression (SLR).**  Any sigma-point moment transform
   applied to ``f`` about ``N(m, P)`` yields ``(mu, S, C)``; the best affine
   fit is ``A = C^T P^-1``, ``b = mu - A m`` with residual covariance
   ``Omega = S - A P A^T``.  This is exactly the "enabling approximation"
   hidden inside every sigma-point Kalman filter, made explicit.
2. **Time-varying affine Kalman recursions as associative scans** (the
   Särkkä & García-Fernández, IEEE TAC 2021, elements of ``timescan.py``,
   generalized to per-step affine models ``x_k = F_k x_{k-1} + b_k + q_k``,
   ``y_k = H_k x_k + c_k + r_k``) — O(log N) parallel depth on the time axis.
3. **Posterior-linearization iteration** (García-Fernández, Svensson, Särkkä,
   "Iterated posterior linearization smoother", IEEE TAC 2017; temporal
   parallelization in Yaghoobi et al., IEEE TSP 2022): linearize about the
   current smoothed marginals, re-run the affine filter+smoother, repeat.

One iteration from the prior linearization is already a valid sigma-point
filter; at the fixed point the estimates solve the same posterior-linearization
conditions as the sequential iterated smoother.  For an exactly linear model,
SLR recovers the model itself, so one iteration reproduces the sequential
Kalman filter/RTS smoother to rounding — the crispest correctness check
(``tests/test_iplf.py``).

TPU notes: all per-step work is batched ``vmap`` over the time axis (big,
regular, MXU/VPU-friendly); the only cross-step coupling is the
``associative_scan`` combine, whose tiny matrix products route through the
unrolled ``small_matmul`` kernels (f64 TPU gap, see ``utils/linalg.py``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.scipy.linalg import block_diag

from ..ssinf import _tf_apply, slr_affine
from ..utils.linalg import (chol_small_psd, pd_solve_small, small_matmul,
                            small_mm3, symmetrize, tri_solve_small, tria)
from .timescan import parallel_affine_filter, parallel_affine_smoother
from .sqrttime import (_tria_pad, parallel_affine_sqrt_filter,
                       parallel_affine_sqrt_smoother)
from .shardtime import (sharded_parallel_affine_filter,
                        sharded_parallel_affine_smoother,
                        sharded_parallel_affine_sqrt_filter,
                        sharded_parallel_affine_sqrt_smoother)

__all__ = [
    "slr_affine",
    "parallel_affine_filter",
    "parallel_affine_smoother",
    "IteratedSmootherResult",
    "iterated_parallel_smoother",
]


class IteratedSmootherResult(struct.PyTreeNode):
    """Final-iteration moments, reference layout (state first, time last)."""

    fi_mean: jax.Array   # (D, N)   filtered
    fi_cov: jax.Array    # (D, D, N)
    sm_mean: jax.Array   # (D, N)   smoothed
    sm_cov: jax.Array    # (D, D, N)


def iterated_parallel_smoother(mod_dyn, mod_obs, tf_dyn, tf_obs, data,
                               iterations: int = 10,
                               init_mean=None, init_cov=None,
                               theta_dyn=None, theta_obs=None,
                               init="observer", block_len: int = 2048,
                               warmup: int = 512, sqrt: bool = False,
                               dtype=None,
                               chol_jitter: float = 0.0,
                               scan_block_len: int | None = None,
                               mesh=None, mesh_axis: str = "t"
                               ) -> IteratedSmootherResult:
    """Iterated posterior-linearization smoother with a time-parallel core.

    Per iteration: SLR of the dynamics/measurement about the current smoothed
    marginals (``vmap`` over the time axis — fully parallel), then one
    time-parallel affine filter + smoother, iterating toward the IPLS fixed
    point.

    ``init`` selects the first linearization trajectory.  Posterior
    linearization only converges locally, so this choice decides which basin
    long records land in:

    * ``"observer"`` (default) — a frozen-covariance EKF: Riccati at the
      prior SLR gives a steady-state predictive covariance, then a mean-only
      rollout corrected by each measurement with a gain from the LOCAL
      measurement Jacobian, ``m_k = f(m_{k-1}) + K(H_k) (y_k - h(f(m_{k-1})))``.
      O(N) depth like any rollout, but constant small per-step flops, and the
      measurement feedback keeps the trajectory phase-locked on arbitrarily
      long records where an open-loop rollout drifts.  (A constant prior gain
      is NOT enough: with ``h = sin``, a gain sized where ``cos ≈ 0.07``
      over-corrects 14x where ``cos ≈ 1`` and the observer itself diverges.)
    * ``"block-observer"`` — the same observer run over ``ceil(N/block_len)``
      overlapping blocks IN PARALLEL (``vmap``), each starting ``warmup``
      steps early from the prior mean so the measurement feedback locks on
      before its real segment begins.  Init depth drops from O(N) to
      O(block_len + warmup) — the right choice for very long records, where
      the sequential observer otherwise dominates the wall-clock.  Requires
      the observer to re-acquire the state from the prior within the warmup,
      i.e. an (effectively) unimodal measurement: with a direct angle
      measurement it matches the sequential observer to 1e-6 on a 10k-step
      pendulum, but with the multimodal ``sin`` measurement mid-record blocks
      lock onto the wrong branch and the result is garbage — keep the
      sequential ``"observer"`` there.
    * ``"rollout"`` — deterministic propagation of the prior mean through the
      dynamics.  Fine for records short enough that model drift stays small;
      on a 10k-step pendulum the accumulated phase error puts late
      linearization points on the wrong ``sin`` branch and the iteration
      diverges (the observer init fixes exactly this).
    * ``"prior"`` — all points at ``N(m0, P0)`` (fully parallel init; fine
      for short records or mild nonlinearities).
    * an array ``(N+1, D)`` of linearization means (times ``0..N``) — e.g.
      the output of any cheap external tracker.

    Non-additive noise is handled exactly like the sequential filter
    (``ssinf.py:271-272``): the SLR runs over the augmented input
    ``(x, q) ~ N((m, q_mean), blockdiag(P, Q))`` and the affine fit splits
    into a state map and a noise map, ``f(x, q) ≈ F x + A_q q + b + e``, so
    the effective affine model is ``F x + (b + A_q q_mean)`` with residual
    covariance ``A_q Q A_qᵀ + Omega``.  Time conventions match the sequential
    filter: step ``k`` (1-based) evaluates both models at ``time = k-1``
    (``ssinf.py:276,287``).

    ``scan_block_len`` (sqrt mode) chunks the associative scans into a
    scan-of-scans with bounded temporaries — set it (e.g. 65536) for records
    beyond the ~100k-step vmem ceiling; results are identical.

    ``sqrt=True`` routes the affine passes through the time-parallel
    SQUARE-ROOT filter/smoother (:mod:`ssmtoybox_tpu.parallel.sqrttime`):
    filtered/smoothed covariances are carried as Cholesky factors and stay PD
    by construction, which makes ``dtype=jnp.float32`` — the TPU fast path —
    usable on long records where the full-covariance recursion loses
    definiteness.  ``dtype`` casts the whole iteration (prior, data, SLR,
    scans); the per-step effective noise enters the scans as stacked factor
    columns ``[chol_psd(Omega), noise_map·chol(Q)]`` (never summed into a
    covariance — rank-deficient pieces stay exact), and ``chol_jitter`` adds
    a diagonal stabilizer before the residual factorization (0 is fine in
    f64; f32 runs on stiff models may need ~1e-6 of the noise scale).
    Returned covariances are reconstituted ``S Sᵀ`` (PSD by construction).

    ``mesh`` (a :class:`jax.sharding.Mesh` with axis ``mesh_axis``) routes
    every affine filter/smoother pass through the mesh-sharded scans
    (:mod:`ssmtoybox_tpu.parallel.shardtime`) — sequence parallelism for a
    single long NONLINEAR record: per-device local scans, one ``all_gather``
    of chunk aggregates per pass.  Results equal the unsharded smoother to
    reassociation rounding.  The per-step SLR stays a global ``vmap`` —
    embarrassingly parallel over time, so under ``jit`` GSPMD shards it over
    the same devices with no code changes here.  Mutually exclusive with
    ``scan_block_len`` (the per-device chunks already bound the live
    temporaries to ``N / n_dev`` elements).
    """
    m0, P0 = mod_dyn.init_rv.get_stats()[:2]
    m0 = jnp.asarray(m0 if init_mean is None else init_mean)
    if dtype is None:
        dtype = m0.dtype
    m0 = m0.astype(dtype)
    P0 = jnp.asarray(P0 if init_cov is None else init_cov, dtype=dtype)
    q_mean, q_cov = (jnp.asarray(a, dtype=dtype)
                     for a in mod_dyn.noise_rv.get_stats()[:2])
    r_mean, r_cov = (jnp.asarray(a, dtype=dtype)
                     for a in mod_obs.noise_rv.get_stats()[:2])
    G = jnp.asarray(mod_dyn.noise_gain, dtype=dtype)
    GQGt = small_mm3(G, q_cov, G.T)
    dim = m0.shape[0]

    if iterations < 1:
        raise ValueError(f"iterations must be >= 1; got {iterations}")
    if scan_block_len is not None and not sqrt:
        raise ValueError(
            "scan_block_len (the bounded-vmem scan-of-scans) is only wired "
            "into the square-root scans — pass sqrt=True with it, or drop it; "
            "silently ignoring it would hit the very vmem ceiling it exists "
            "to avoid")
    if mesh is not None and scan_block_len is not None:
        raise ValueError(
            "mesh and scan_block_len are mutually exclusive: the mesh-sharded "
            "scans already bound live temporaries to N/n_dev elements per "
            "device")
    data = jnp.asarray(data, dtype=m0.dtype)
    n_steps = data.shape[-1]
    # integer time stamps, like the sequential filter's k-1 (ssinf.py:183)
    times = jnp.arange(n_steps)

    # pin the recursion dtype: model constants may live in f64 (x64 mode), so
    # every SLR/model evaluation is cast back before entering the scans
    _c = lambda a: jnp.asarray(a, dtype)

    def _slr(tf, f, m, P, t, theta):
        return tuple(_c(a) for a in slr_affine(tf, f, m, P, t, theta))

    def slr_dyn(m, P, t):
        """SLR of the dynamics about N(m, P) -> (F, b, Q_eff)."""
        if mod_dyn.noise_additive:
            F, b, Om = _slr(tf_dyn, mod_dyn.dyn_eval, m, P, t, theta_dyn)
            return F, b, Om + GQGt
        A, b, Om = _slr(tf_dyn, mod_dyn.dyn_eval,
                        jnp.concatenate([m, q_mean]),
                        block_diag(P, q_cov), t, theta_dyn)
        F, Aq = A[:, :dim], A[:, dim:]
        return F, b + small_matmul(Aq, q_mean), Om + small_mm3(Aq, q_cov, Aq.T)

    def slr_obs(m, P, t):
        """SLR of the measurement about N(m, P) -> (H, c, R_eff)."""
        if mod_obs.noise_additive:
            H, c, Gm = _slr(tf_obs, mod_obs.meas_eval, m, P, t, theta_obs)
            return H, c, Gm + r_cov
        A, c, Gm = _slr(tf_obs, mod_obs.meas_eval,
                        jnp.concatenate([m, r_mean]),
                        block_diag(P, r_cov), t, theta_obs)
        H, Ar = A[:, :dim], A[:, dim:]
        return H, c + small_matmul(Ar, r_mean), Gm + small_mm3(Ar, r_cov, Ar.T)

    if sqrt:
        dim_y = data.shape[0]
        S0 = chol_small_psd(P0 + chol_jitter * jnp.eye(dim, dtype=dtype))
        eye_d = jnp.eye(dim, dtype=dtype)
        eye_e = jnp.eye(dim_y, dtype=dtype)
        # static noise factor columns (additive models); per-step noise maps
        # of non-additive models re-scale these columns with the SLR's A_q/A_r
        Lq = chol_small_psd(q_cov)
        Lr = chol_small_psd(r_cov)
        Gq_cols = small_matmul(G, Lq)

        def slr_dyn_sqrt(m, P, t):
            """SLR -> (F, b, noise factor COLUMNS): the effective process
            noise ``Omega + (noise map) Q (noise map)ᵀ`` enters the scans as
            stacked columns ``[chol_psd(Omega), noise_map·chol(Q)]`` — never
            summed into a covariance, so rank-deficient pieces (Omega == 0 on
            linear models, thin noise gains) stay exact."""
            if mod_dyn.noise_additive:
                F, b, Om = _slr(tf_dyn, mod_dyn.dyn_eval, m, P, t, theta_dyn)
                cols = jnp.concatenate(
                    [chol_small_psd(Om + chol_jitter * eye_d), Gq_cols], axis=-1)
                return F, b, cols
            A, b, Om = _slr(tf_dyn, mod_dyn.dyn_eval,
                            jnp.concatenate([m, q_mean]),
                            block_diag(P, q_cov), t, theta_dyn)
            F, Aq = A[:, :dim], A[:, dim:]
            cols = jnp.concatenate(
                [chol_small_psd(Om + chol_jitter * eye_d),
                 small_matmul(Aq, Lq)], axis=-1)
            return F, b + small_matmul(Aq, q_mean), cols

        def slr_obs_sqrt(m, P, t):
            if mod_obs.noise_additive:
                H, c, Gm = _slr(tf_obs, mod_obs.meas_eval, m, P, t, theta_obs)
                cols = jnp.concatenate(
                    [chol_small_psd(Gm + chol_jitter * eye_e), Lr], axis=-1)
                return H, c, cols
            A, c, Gm = _slr(tf_obs, mod_obs.meas_eval,
                            jnp.concatenate([m, r_mean]),
                            block_diag(P, r_cov), t, theta_obs)
            H, Ar = A[:, :dim], A[:, dim:]
            cols = jnp.concatenate(
                [chol_small_psd(Gm + chol_jitter * eye_e),
                 small_matmul(Ar, Lr)], axis=-1)
            return H, c + small_matmul(Ar, r_mean), cols

    def one_pass(lin_m, lin_P):
        # lin_m: (N+1, D) marginal means at times 0..N; lin_P: (N+1, D, D)
        if sqrt:
            Fs, bds, SQs = jax.vmap(slr_dyn_sqrt)(lin_m[:-1], lin_P[:-1], times)
            Hs, cs, SRs = jax.vmap(slr_obs_sqrt)(lin_m[1:], lin_P[1:], times)
            if mesh is not None:
                fi_m, fi_cov = sharded_parallel_affine_sqrt_filter(
                    Fs, bds, SQs, Hs, cs, SRs, m0, S0, data, mesh, mesh_axis)
                sm_m, sm_S = sharded_parallel_affine_sqrt_smoother(
                    Fs, bds, SQs, fi_m, fi_cov, mesh, mesh_axis)
            else:
                fi_m, fi_cov = parallel_affine_sqrt_filter(
                    Fs, bds, SQs, Hs, cs, SRs, m0, S0, data,
                    scan_block_len=scan_block_len)
                sm_m, sm_S = parallel_affine_sqrt_smoother(
                    Fs, bds, SQs, fi_m, fi_cov, scan_block_len=scan_block_len)
            # the next SLR consumes full smoothed covariances; the filtered
            # factor is carried as-is and reconstituted once after the loop
            sm_P = jnp.einsum("ijn,kjn->ikn", sm_S, sm_S)

            # step-0 refresh in FACTOR form (one joint QR, like the sqrt RTS
            # element) — a subtractive full-covariance downdate here would be
            # the single non-PD-safe operation in the f32 path
            top = jnp.concatenate([small_matmul(Fs[0], S0), SQs[0]], axis=-1)
            bot = jnp.concatenate([S0, jnp.zeros_like(SQs[0])], axis=-1)
            L = _tria_pad(jnp.concatenate([top, bot], axis=-2))
            L11, L21, L22 = L[:dim, :dim], L[dim:, :dim], L[dim:, dim:]
            G0 = jnp.swapaxes(tri_solve_small(
                jnp.swapaxes(L11, -1, -2), jnp.swapaxes(L21, -1, -2),
                lower=False), -1, -2)
            S0_s = tria(jnp.concatenate(
                [L22, small_matmul(G0, sm_S[:, :, 0])], axis=-1))
            P0_s = small_matmul(S0_s, S0_s.T)
        else:
            Fs, bds, Qs = jax.vmap(slr_dyn)(lin_m[:-1], lin_P[:-1], times)
            Hs, cs, Rs = jax.vmap(slr_obs)(lin_m[1:], lin_P[1:], times)
            if mesh is not None:
                fi_m, fi_cov = sharded_parallel_affine_filter(
                    Fs, bds, Qs, Hs, cs, Rs, m0, P0, data, mesh, mesh_axis)
                sm_m, sm_P = sharded_parallel_affine_smoother(
                    Fs, bds, Qs, fi_m, fi_cov, mesh, mesh_axis)
            else:
                fi_m, fi_cov = parallel_affine_filter(Fs, bds, Qs, Hs, cs, Rs,
                                                      m0, P0, data)
                sm_m, sm_P = parallel_affine_smoother(Fs, bds, Qs, fi_m, fi_cov)

            # smooth the prior-time state to refresh the step-0 linearization
            Pp1 = symmetrize(small_mm3(Fs[0], P0, Fs[0].T) + Qs[0])
            G0 = pd_solve_small(Pp1, small_matmul(Fs[0], P0)).T
            P0_s = symmetrize(P0 + small_mm3(G0, sm_P[:, :, 0] - Pp1, G0.T))

        m0_s = m0 + small_matmul(G0, sm_m[:, 0] - (small_matmul(Fs[0], m0) + bds[0]))
        new_lin_m = jnp.concatenate([m0_s[None], sm_m.T], axis=0)
        new_lin_P = jnp.concatenate([P0_s[None], jnp.moveaxis(sm_P, -1, 0)], axis=0)
        # fi_cov is (D, D, N) covariances in full-cov mode, (D, D, N) Cholesky
        # factors in sqrt mode (reconstituted after the iteration loop)
        return new_lin_m, new_lin_P, fi_m, fi_cov, sm_m, sm_P

    # mean-evaluation wrappers: non-additive models take augmented columns
    if mod_dyn.noise_additive:
        f_mean = lambda m, t: _c(jnp.atleast_1d(mod_dyn.dyn_eval(m, t)))
    else:
        f_mean = lambda m, t: _c(jnp.atleast_1d(
            mod_dyn.dyn_eval(jnp.concatenate([m, q_mean]), t)))
    if mod_obs.noise_additive:
        h_mean = lambda x, t: _c(jnp.atleast_1d(mod_obs.meas_eval(x, t)))
    else:
        h_mean = lambda x, t: _c(jnp.atleast_1d(
            mod_obs.meas_eval(jnp.concatenate([x, r_mean]), t)))

    if not isinstance(init, str):
        lin_m = jnp.asarray(init, dtype=m0.dtype)
        if lin_m.shape != (n_steps + 1, dim):
            raise ValueError(f"init trajectory must be ({n_steps + 1}, {dim}); "
                             f"got {lin_m.shape}")
    elif init in ("observer", "block-observer"):
        # steady-state predictive covariance from a Riccati recursion with
        # per-step LOCAL Jacobians would be sequential-expensive; instead
        # freeze the covariance (Riccati at the prior SLR) and recompute only
        # the GAIN from the local measurement Jacobian each step — constant
        # per-step flops, no factorizations beyond a tiny (E, E) solve.
        F0, _, Q0 = slr_dyn(m0, P0, times[0])
        H0, _, R0 = slr_obs(m0, P0, times[0])

        def ricc(P, _):
            Pp = symmetrize(small_mm3(F0, P, F0.T) + Q0)
            S = small_mm3(H0, Pp, H0.T) + R0
            K = pd_solve_small(S, small_matmul(H0, Pp)).T
            return symmetrize(Pp - small_mm3(K, S, K.T)), None

        P_ss, _ = jax.lax.scan(ricc, P0, None, length=50)
        Pp_ss = symmetrize(small_mm3(F0, P_ss, F0.T) + Q0)

        # value and Jacobian of h in ONE evaluation (has_aux returns the
        # primal alongside the forward-mode Jacobian) — h runs inside the
        # sequential init scan, so a second call would cost a full extra
        # O(N)-depth pass for expensive measurement models
        def h_val_jac(x, t):
            return jax.jacfwd(lambda xx: (h_mean(xx, t),) * 2, has_aux=True)(x)

        def roll(m, inp):
            t, y = inp
            mp = f_mean(m, t)
            H, y_pred = h_val_jac(mp, t)
            S = small_mm3(H, Pp_ss, H.T) + R0
            K = pd_solve_small(S, small_matmul(H, Pp_ss)).T
            m_next = mp + small_matmul(K, y - y_pred)
            return m_next, m_next

        if init == "observer" or n_steps <= block_len:
            _, rolled = jax.lax.scan(roll, m0, (times, data.T))
        else:
            # overlapping blocks, each warmed up from the prior mean; the
            # index bookkeeping is static (trace-time numpy)
            n_blocks = -(-n_steps // block_len)
            starts = np.maximum(np.arange(n_blocks) * block_len - warmup, 0)
            idx = np.minimum(starts[:, None] + np.arange(block_len + warmup)[None, :],
                             n_steps - 1)
            block_roll = jax.vmap(
                lambda ts_b, ys_b: jax.lax.scan(roll, m0, (ts_b, ys_b))[1])
            outs = block_roll(times[idx], data.T[idx])     # (B, L+W, D)
            off = np.arange(n_blocks) * block_len - starts  # 0 for block 0, else W
            rows = outs[np.arange(n_blocks)[:, None],
                        off[:, None] + np.arange(block_len)[None, :]]
            rolled = rows.reshape(n_blocks * block_len, dim)[:n_steps]
        lin_m = jnp.concatenate([m0[None], rolled], axis=0)
    elif init == "rollout":
        def roll(m, t):
            m_next = f_mean(m, t)
            return m_next, m_next
        _, rolled = jax.lax.scan(roll, m0, times)
        lin_m = jnp.concatenate([m0[None], rolled], axis=0)
    elif init == "prior":
        lin_m = jnp.broadcast_to(m0, (n_steps + 1, dim))
    else:
        raise ValueError(
            f"init must be 'observer', 'block-observer', 'rollout', 'prior' "
            f"or an (N+1, D) trajectory; got {init!r}")
    lin_P = jnp.broadcast_to(P0, (n_steps + 1, dim, dim))
    fi_m = jnp.zeros((dim, n_steps), dtype=m0.dtype)
    fi_P = jnp.zeros((dim, dim, n_steps), dtype=m0.dtype)

    def body(_, carry):
        lin_m, lin_P, _, _, _, _ = carry
        return one_pass(lin_m, lin_P)

    carry = (lin_m, lin_P, fi_m, fi_P, fi_m, fi_P)
    carry = jax.lax.fori_loop(0, iterations, body, carry)
    _, _, fi_m, fi_P, sm_m, sm_P = carry
    if sqrt:
        # the loop carries the filtered Cholesky factor; reconstitute once
        fi_P = jnp.einsum("ijn,kjn->ikn", fi_P, fi_P)
    return IteratedSmootherResult(fi_mean=fi_m, fi_cov=fi_P, sm_mean=sm_m, sm_cov=sm_P)
