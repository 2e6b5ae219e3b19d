"""Samplers built on ``jax.random`` (counter-based, reproducible, vmappable).

Replaces the NumPy global-RNG samplers of the reference
(``ssmtoybox/utils.py:254-382`` — ``gauss_mixture``, ``bigauss_mixture``,
``multivariate_t``).  Every sampler takes an explicit PRNG key, so Monte-Carlo
studies are deterministic and shardable across devices.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["multivariate_normal", "multivariate_t", "gauss_mixture", "bigauss_mixture"]


def multivariate_normal(key, mean, cov, shape=()) -> jax.Array:
    """Gaussian samples of shape ``(*shape, dim)``."""
    mean = jnp.asarray(mean)
    cov = jnp.asarray(cov, dtype=mean.dtype)
    return jax.random.multivariate_normal(key, mean, cov, shape=shape, dtype=mean.dtype)


def multivariate_t(key, mean, scale, dof, shape=()) -> jax.Array:
    """Multivariate Student-t samples via the Gamma-mixture construction.

    Parity with ``ssmtoybox/utils.py:349-382``: ``x = mu + n / sqrt(u)`` with
    ``n ~ N(0, scale)`` and ``u ~ Gamma(k=dof/2, theta=2/dof)``.

    Returns samples of shape ``(*shape, dim)``.
    """
    mean = jnp.asarray(mean)
    k_g, k_n = jax.random.split(key)
    u = jax.random.gamma(k_g, dof / 2.0, shape=shape, dtype=mean.dtype) * (2.0 / dof)
    n = multivariate_normal(k_n, jnp.zeros_like(mean), scale, shape)
    return mean + n / jnp.sqrt(u)[..., None]


def gauss_mixture(key, means, covs, alphas, shape=()) -> jax.Array:
    """Samples from a Gaussian mixture (``utils.py:254-299``).

    Instead of drawing counts per component and shuffling (host logic), draw a
    categorical component index per sample and select — identical distribution,
    fully on-device.

    Returns ``(samples, indexes)`` with shapes ``(*shape, dim)`` and ``shape``.
    """
    means = jnp.stack([jnp.asarray(m) for m in means])  # (C, D)
    covs = jnp.stack([jnp.asarray(c) for c in covs])    # (C, D, D)
    alphas = jnp.asarray(alphas, dtype=means.dtype)
    k_c, k_n = jax.random.split(key)
    ci = jax.random.categorical(k_c, jnp.log(alphas), shape=shape)      # (*shape,)
    comps = multivariate_normal(
        k_n, jnp.zeros(means.shape[-1], means.dtype), jnp.eye(means.shape[-1], dtype=means.dtype), shape
    )
    chols = jnp.linalg.cholesky(covs)                                    # (C, D, D)
    samples = means[ci] + jnp.einsum("...de,...e->...d", chols[ci], comps)
    return samples, ci


def bigauss_mixture(key, m0, c0, m1, c1, alpha, shape=()) -> jax.Array:
    """Two-component Gaussian mixture samples (``utils.py:302-346``).

    The reference draws from both components and masks; we do the same so the
    per-sample distribution matches exactly (component 0 w.p. ``alpha``).
    Returns samples of shape ``(*shape, dim)``.
    """
    m0 = jnp.asarray(m0)
    k_b, k_0, k_1 = jax.random.split(key, 3)
    pick0 = jax.random.bernoulli(k_b, alpha, shape=shape)
    n0 = multivariate_normal(k_0, m0, c0, shape)
    n1 = multivariate_normal(k_1, jnp.asarray(m1), c1, shape)
    return jnp.where(pick0[..., None], n0, n1)
