"""Estimation-performance metrics as pure, vmappable JAX functions.

Re-design of the metric suite in ``ssmtoybox/utils.py:18-244`` (squared error,
sample MSE matrix, log-credibility ratio / NCI / inclination, NLL, (symmetrized)
KL divergence, bootstrap variance).  The reference loops over MC runs in Python;
here every metric is written for a single (state, estimate) pair and batched
with ``jax.vmap`` so a 10k-trajectory study reduces on-device.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .linalg import pd_logdet, pd_solve

__all__ = [
    "squared_error",
    "mse_matrix",
    "log_cred_ratio",
    "neg_log_likelihood",
    "kl_divergence",
    "symmetrized_kl_divergence",
    "bootstrap_var",
    "rmse",
    "nci",
    "inclination",
    "nll_mean",
]


def squared_error(x: jax.Array, m: jax.Array) -> jax.Array:
    """Elementwise squared error ``(x - m)**2`` (``utils.py:18-38``)."""
    return (x - m) ** 2


def mse_matrix(x: jax.Array, m: jax.Array) -> jax.Array:
    """Sample mean-square-error matrix averaged over MC runs.

    Parity with ``ssmtoybox/utils.py:41-64`` but computed as one einsum instead
    of a Python loop over simulations.

    Parameters
    ----------
    x : (D,) or (D, M) array — true state.
    m : (D, M) array — estimates from M MC runs.
    """
    dx = jnp.atleast_2d(x.T).T - m  # broadcast true state over MC axis
    return jnp.einsum("dm,em->de", dx, dx) / m.shape[-1]


def log_cred_ratio(x: jax.Array, m: jax.Array, P: jax.Array, MSE: jax.Array) -> jax.Array:
    """Log-credibility ratio of Li & Zhao (``utils.py:67-120``).

    ``10 * log10( dx^T P^-1 dx / dx^T MSE^-1 dx )`` — the building block of the
    non-credibility index (NCI) and inclination indicator.
    """
    dx = x - m
    dx_icov_dx = dx @ pd_solve(P, dx)
    dx_imse_dx = dx @ pd_solve(MSE, dx)
    return 10.0 * (jnp.log10(dx_icov_dx) - jnp.log10(dx_imse_dx))


def neg_log_likelihood(x: jax.Array, m: jax.Array, P: jax.Array) -> jax.Array:
    """Gaussian negative log-likelihood of the estimate (``utils.py:123-148``)."""
    dx = x - m
    d = x.shape[-1]
    dx_iP_dx = dx @ pd_solve(P, dx)
    return 0.5 * (pd_logdet(P) + dx_iP_dx + d * jnp.log(2.0 * jnp.pi))


def kl_divergence(mean_0, cov_0, mean_1, cov_1, compat_flipped_logdet=True) -> jax.Array:
    """KL divergence between two Gaussians (``utils.py:151-182``).

    NOTE: the reference's log-determinant ratio has the WRONG SIGN
    (``log(det_0/det_1)``; the true KL(N_0 || N_1) has ``log(det_1/det_0)``),
    so its values can be negative.  The default reproduces the reference for
    golden parity; pass ``compat_flipped_logdet=False`` for the correct
    (non-negative) divergence.  :func:`symmetrized_kl_divergence` is
    unaffected — the flipped terms cancel in the symmetrization.
    """
    k = mean_0.shape[-1]
    dmu = mean_0 - mean_1
    inv_1_cov_0 = pd_solve(cov_1, cov_0)
    logdets = pd_logdet(cov_0) - pd_logdet(cov_1)
    if not compat_flipped_logdet:
        logdets = -logdets
    return 0.5 * (jnp.trace(inv_1_cov_0) + dmu @ pd_solve(cov_1, dmu)
                  + logdets - k)


def symmetrized_kl_divergence(mean_0, cov_0, mean_1, cov_1) -> jax.Array:
    """Symmetrized KL divergence (``utils.py:185-220``)."""
    return 0.5 * (
        kl_divergence(mean_0, cov_0, mean_1, cov_1)
        + kl_divergence(mean_1, cov_1, mean_0, cov_0)
    )


def bootstrap_var(key: jax.Array, data: jax.Array, samples: int = 1000) -> jax.Array:
    """Bootstrap variance of the sample mean (``utils.py:223-244``).

    Resamples on-device with ``jax.random`` instead of ``np.random.choice``.
    """
    data = data.reshape(-1)
    n = data.shape[0]
    idx = jax.random.randint(key, (samples, n), 0, n)
    means = jnp.mean(data[idx], axis=1)
    return jnp.var(means)


# ---------------------------------------------------------------------------
# Batched study-level aggregates (replaces research helpers such as
# ``research/tpq/tpq_base.py:154-172`` eval_perf_scores).
# ---------------------------------------------------------------------------

def rmse(x: jax.Array, m: jax.Array, axis=None) -> jax.Array:
    """Root-mean-square error: the state dimension (axis 0) is summed, then
    the root of the mean over ``axis`` of the REMAINING array is taken.

    ``axis=None`` (default) averages everything to a scalar.  Typical:
    ``x, m`` of shape (D, N, M) with ``axis=0`` -> time-averaged RMSE per
    run, shape (M,).

    .. note:: semantic break vs the reference (``utils.py`` has no rmse;
       research scripts keep per-run arrays): an early revision defaulted to
       ``axis=(0,)`` (per-run array); the default is now a scalar.  Pass an
       explicit ``axis`` to get unreduced arrays.
    """
    se = jnp.sum(squared_error(x, m), axis=0)
    return jnp.sqrt(jnp.mean(se, axis=axis))


def _lcr_series(x, m, P, MSE):
    """Per-time-step log-cred ratios for (D, N) trajectories."""
    return jax.vmap(log_cred_ratio, in_axes=(1, 1, 2, 2))(x, m, P, MSE)


def nci(x: jax.Array, m: jax.Array, P: jax.Array, MSE: jax.Array) -> jax.Array:
    """Non-credibility index: time-average of |log-cred ratio| (``utils.py:95-104``)."""
    return jnp.mean(jnp.abs(_lcr_series(x, m, P, MSE)))


def inclination(x: jax.Array, m: jax.Array, P: jax.Array, MSE: jax.Array) -> jax.Array:
    """Inclination indicator: time-average of the log-cred ratio."""
    return jnp.mean(_lcr_series(x, m, P, MSE))


def nll_mean(x: jax.Array, m: jax.Array, P: jax.Array) -> jax.Array:
    """Time-averaged Gaussian NLL for (D, N) trajectories."""
    return jnp.mean(jax.vmap(neg_log_likelihood, in_axes=(1, 1, 2))(x, m, P))


def print_table(data, row_labels=None, col_labels=None, latex=False):
    """Pretty-print a results table (functional fix of ``utils.py:247-251``,
    which builds a DataFrame but prints the module instead)."""
    import numpy as np
    import pandas as pd

    df = pd.DataFrame(np.asarray(data), index=row_labels, columns=col_labels)
    print(df)
    if latex:
        print(df.to_latex())
    return df
