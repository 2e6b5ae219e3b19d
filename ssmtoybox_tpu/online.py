"""Online (streaming) filtering for serving workloads.

The reference processes whole batches of measurements (`forward_pass(data)`);
a deployed tracker instead receives measurements one at a time and must
update state in place with minimal latency.  This module provides that
per-measurement API on top of the same pure step math:

* :class:`OnlineState` — the Gaussian filter's carry as a pytree (mean,
  covariance, step counter), checkpointable with
  :mod:`ssmtoybox_tpu.utils.checkpoint`.  (Streaming is Gaussian-only; the
  square-root variant lives in :mod:`ssmtoybox_tpu.sqrt`.)
* :func:`make_online_filter` — builds a jitted ``step(state, y) -> (state,
  info)`` with donated state buffers (no per-step allocation churn) and an
  optional leading batch axis for multi-target serving.

Missing measurements (dropouts) are handled with a per-call ``observed``
flag: the time update always runs; the measurement update is skipped via
``jnp.where`` when ``observed`` is false — a capability the reference lacks
entirely.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from .ssinf import _gaussian_time_update, _kalman_update, _smoothing_update

__all__ = ["OnlineState", "StepInfo", "make_online_filter",
           "FixedLagState", "make_fixed_lag_smoother"]


def streaming_api(state_cls, leaves_fn, one_fn, batch: bool, donate: bool,
                  cast=jnp.asarray):
    """Shared scaffolding for every streaming ``(init, step)`` factory
    (Gaussian + square-root, filter + fixed-lag smoother).

    * ``init(batch_size=None)`` validates the batch flag, builds the state
      from ``leaves_fn() -> {field: unbatched array}`` with fresh copies
      (the state is DONATED to the jitted step — handing out the model's own
      prior buffers would let donation delete them), broadcasting a leading
      batch axis when ``batch=True``.
    * ``step(state, y, observed=True)`` wraps the per-target ``one_fn`` in
      ``vmap`` (batch mode), broadcasts a scalar ``observed`` flag over the
      batch, and jits with the state buffers donated.
    """
    def init(batch_size: Optional[int] = None):
        if batch and batch_size is None:
            raise ValueError(
                "batch=True needs init(batch_size=...) — an unbatched state "
                "would crash the vmapped step")
        if not batch and batch_size is not None:
            raise ValueError(
                "init(batch_size=...) requires batch=True — an unbatched "
                "step would silently broadcast batched measurements into a "
                "corrupt state")
        leaves = leaves_fn()
        if batch:
            leaves = {k: jnp.array(jnp.broadcast_to(v, (batch_size,) + jnp.shape(v)),
                                   copy=True)
                      for k, v in leaves.items()}
        else:
            leaves = {k: jnp.array(v, copy=True) for k, v in leaves.items()}
        return state_cls(**leaves)

    inner = jax.vmap(one_fn, in_axes=(0, 0, 0)) if batch else one_fn

    def step_fn(state, y, observed):
        observed = jnp.asarray(observed, bool)
        if batch and observed.ndim == 0:
            observed = jnp.broadcast_to(observed, (y.shape[0],))
        return inner(state, y, observed)

    step = jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    def step_api(state, y, observed=True):
        return step(state, cast(y), observed)

    return init, step_api


class OnlineState(struct.PyTreeNode):
    """Streaming filter carry."""

    mean: jax.Array          # (D,) or (B, D)
    cov: jax.Array           # (D, D) or (B, D, D)
    step: jax.Array          # scalar or (B,) int — 1-based measurement index


class StepInfo(struct.PyTreeNode):
    """Per-step diagnostics: predicted measurement moments + innovation."""

    y_pred: jax.Array
    innov: jax.Array
    innov_cov: jax.Array


def make_online_filter(mod_dyn, mod_obs, tf_dyn, tf_obs, batch: bool = False,
                       donate: bool = True):
    """Build ``(init, step)`` for streaming Gaussian filtering.

    ``init(batch_size=None) -> OnlineState`` starts from the model prior
    (``ssinf.py:239-245``); ``step(state, y, observed=True) -> (OnlineState,
    StepInfo)`` performs one predict+update (``ssinf.py:254-323``).

    With ``batch=True`` the state and measurements carry a leading batch axis
    (independent targets served in one program).  With ``donate=True`` the
    state argument's buffers are donated to the jitted step, so steady-state
    serving does not allocate.
    """
    m0, P0 = mod_dyn.init_rv.get_stats()[:2]

    def _leaves():
        return dict(mean=m0, cov=P0, step=jnp.asarray(1, jnp.int32))

    def _one(state: OnlineState, y, observed):
        k = state.step
        m_pr, P_pr, _, y_pr, S, xy = _gaussian_time_update(
            mod_dyn, mod_obs, tf_dyn, tf_obs, state.mean, state.cov, k - 1)
        m_fi, P_fi = _kalman_update(m_pr, P_pr, y_pr, S, xy, y)
        # dropout handling: keep the prediction when no measurement arrived
        m_new = jnp.where(observed, m_fi, m_pr)
        P_new = jnp.where(observed, P_fi, P_pr)
        info = StepInfo(y_pred=y_pr, innov=y - y_pr, innov_cov=S)
        return OnlineState(mean=m_new, cov=P_new, step=k + 1), info

    return streaming_api(OnlineState, _leaves, _one, batch, donate)


class FixedLagState(struct.PyTreeNode):
    """Streaming fixed-lag smoother carry: the filter state plus ring buffers
    of the last ``lag`` steps' filtered and predictive moments (oldest
    first).  ``buf_xx[j]`` is the cross-covariance between the state at
    buffer slot ``j-1`` and its prediction at slot ``j`` — exactly the
    quantity the RTS gain needs (``ssinf.py:325-344``)."""

    mean: jax.Array          # (D,) or (B, D) — current filtered
    cov: jax.Array
    step: jax.Array          # scalar or (B,) int — 1-based measurement index
    buf_fi_m: jax.Array      # (L, D) or (B, L, D)
    buf_fi_P: jax.Array      # (L, D, D) or (B, L, D, D)
    buf_pr_m: jax.Array
    buf_pr_P: jax.Array
    buf_xx: jax.Array


def make_fixed_lag_smoother(mod_dyn, mod_obs, tf_dyn, tf_obs, lag: int,
                            batch: bool = False, donate: bool = True):
    """Build ``(init, step)`` for streaming FIXED-LAG smoothing.

    The serving middle ground between filtering (no latency, no hindsight)
    and offline RTS smoothing (all hindsight, full-record latency): each
    incoming measurement updates the filter AND re-smooths the last ``lag``
    steps, emitting the smoothed estimate of the state ``lag - 1`` steps ago
    — i.e. the estimate of ``x_{k-lag+1}`` given ``y_{1:k}``, identical to
    running the offline textbook RTS on the record truncated at ``k`` (no
    reference counterpart; the reference smooths offline only,
    ``ssinf.py:120-147``).

    ``step(state, y, observed=True) -> (state, info, (sm_mean, sm_cov))``.
    Per-step cost is one predict+update plus a length-``lag - 1`` backward
    scan of the standard smoothing updates over the ring buffer.  The
    smoothed output is meaningful once ``state.step > lag`` (the buffers
    start filled with the prior); before that it reflects prior padding.
    ``batch``/``donate`` behave like :func:`make_online_filter`.
    """
    if lag < 2:
        raise ValueError(f"fixed-lag smoothing needs lag >= 2; got {lag} "
                         f"(lag=1 is plain filtering — use make_online_filter)")
    m0, P0 = mod_dyn.init_rv.get_stats()[:2]

    def _fresh_bufs():
        return dict(
            buf_fi_m=jnp.broadcast_to(m0, (lag,) + m0.shape),
            buf_fi_P=jnp.broadcast_to(P0, (lag,) + P0.shape),
            buf_pr_m=jnp.broadcast_to(m0, (lag,) + m0.shape),
            buf_pr_P=jnp.broadcast_to(P0, (lag,) + P0.shape),
            buf_xx=jnp.broadcast_to(P0, (lag,) + P0.shape),
        )

    def _leaves():
        return dict(mean=m0, cov=P0, step=jnp.asarray(1, jnp.int32),
                    **_fresh_bufs())

    def _one(state: FixedLagState, y, observed):
        k = state.step
        m_pr, P_pr, xx, y_pr, S, xy = _gaussian_time_update(
            mod_dyn, mod_obs, tf_dyn, tf_obs, state.mean, state.cov, k - 1)
        m_fi, P_fi = _kalman_update(m_pr, P_pr, y_pr, S, xy, y)
        m_new = jnp.where(observed, m_fi, m_pr)
        P_new = jnp.where(observed, P_fi, P_pr)

        shift = lambda buf, new: jnp.roll(buf, -1, axis=0).at[-1].set(new)
        buf_fi_m = shift(state.buf_fi_m, m_new)
        buf_fi_P = shift(state.buf_fi_P, P_new)
        buf_pr_m = shift(state.buf_pr_m, m_pr)
        buf_pr_P = shift(state.buf_pr_P, P_pr)
        buf_xx = shift(state.buf_xx, xx)

        # RTS backward over the window: newest filtered seeds the recursion,
        # each older slot smoothed against the NEXT slot's predictive moments
        def bstep(carry, inp):
            m_sm, P_sm = carry
            fi_m_j, fi_P_j, pr_m_j1, pr_P_j1, xx_j1 = inp
            out = _smoothing_update(fi_m_j, fi_P_j, m_sm, P_sm,
                                    pr_m_j1, pr_P_j1, xx_j1)
            return out, None

        xs = (buf_fi_m[:-1], buf_fi_P[:-1],
              buf_pr_m[1:], buf_pr_P[1:], buf_xx[1:])
        (sm_m, sm_P), _ = jax.lax.scan(bstep, (buf_fi_m[-1], buf_fi_P[-1]),
                                       xs, reverse=True)

        new_state = FixedLagState(mean=m_new, cov=P_new, step=k + 1,
                                  buf_fi_m=buf_fi_m, buf_fi_P=buf_fi_P,
                                  buf_pr_m=buf_pr_m, buf_pr_P=buf_pr_P,
                                  buf_xx=buf_xx)
        info = StepInfo(y_pred=y_pr, innov=y - y_pr, innov_cov=S)
        return new_state, info, (sm_m, sm_P)

    return streaming_api(FixedLagState, _leaves, _one, batch, donate)
