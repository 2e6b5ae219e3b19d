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

from .ssinf import _gaussian_time_update, _kalman_update

__all__ = ["OnlineState", "StepInfo", "make_online_filter"]


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

    def init(batch_size: Optional[int] = None) -> OnlineState:
        if batch and batch_size is None:
            raise ValueError("batch=True filters need init(batch_size=...) — "
                             "an unbatched state would crash the vmapped step")
        if not batch and batch_size is not None:
            raise ValueError("init(batch_size=...) requires the filter built "
                             "with batch=True — an unbatched step would silently "
                             "broadcast batched measurements into a corrupt state")
        # fresh copies: the state is donated to the jitted step, and handing
        # out the model's own prior buffers would let donation delete them
        if batch and batch_size is not None:
            return OnlineState(
                mean=jnp.array(jnp.broadcast_to(m0, (batch_size,) + m0.shape), copy=True),
                cov=jnp.array(jnp.broadcast_to(P0, (batch_size,) + P0.shape), copy=True),
                step=jnp.ones((batch_size,), jnp.int32),
            )
        return OnlineState(mean=jnp.array(m0, copy=True), cov=jnp.array(P0, copy=True),
                           step=jnp.asarray(1, jnp.int32))

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

    if batch:
        inner = jax.vmap(_one, in_axes=(0, 0, 0))
    else:
        inner = _one

    def step_fn(state, y, observed):
        observed = jnp.asarray(observed, bool)
        if batch and observed.ndim == 0:
            observed = jnp.broadcast_to(observed, (y.shape[0],))
        return inner(state, y, observed)

    step = jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    def step_api(state, y, observed=True):
        return step(state, jnp.asarray(y), observed)

    return init, step_api
