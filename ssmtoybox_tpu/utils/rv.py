"""Random-variable pytrees.

Functional re-design of ``ssmtoybox/utils.py:569-674`` (``RandomVariable``,
``GaussRV``, ``StudentRV``) plus the ``GaussianMixtureRV`` used by the TPQ
research layer (``research/tpq/tpq_base.py``).  RVs are immutable flax
dataclasses (pytrees), so they can live inside jitted filter configs and be
donated/sharded like any other array data.

Shape convention matches the reference: ``sample(key, size)`` returns an array
of shape ``(dim, *size)`` (``utils.py:618-619``).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from . import rand

__all__ = ["RandomVariable", "GaussRV", "StudentRV", "GaussianMixtureRV"]


def _as_tuple(size) -> Tuple[int, ...]:
    if isinstance(size, int):
        return (size,)
    return tuple(size)


class RandomVariable:
    """Interface marker for random variables (cf. ``utils.py:569-577``):
    implementers provide ``sample(key, size)`` and ``get_stats()``."""

    def sample(self, key, size):  # pragma: no cover - interface
        raise NotImplementedError

    def get_stats(self):  # pragma: no cover - interface
        raise NotImplementedError


class GaussRV(RandomVariable, struct.PyTreeNode):
    """Gaussian random variable (cf. ``utils.py:580-622``)."""

    mean: jax.Array
    cov: jax.Array

    @classmethod
    def create(cls, dim: int, mean=None, cov=None, dtype=jnp.float64) -> "GaussRV":
        dtype = jnp.zeros((), dtype).dtype  # canonicalize under x64-disabled configs
        mean = jnp.zeros((dim,), dtype) if mean is None else jnp.atleast_1d(jnp.asarray(mean, dtype))
        cov = jnp.eye(dim, dtype=dtype) if cov is None else jnp.atleast_2d(jnp.asarray(cov, dtype))
        return cls(mean=mean, cov=cov)

    @property
    def dim(self) -> int:
        return self.mean.shape[-1]

    def sample(self, key, size) -> jax.Array:
        s = rand.multivariate_normal(key, self.mean, self.cov, _as_tuple(size))
        return jnp.moveaxis(s, -1, 0)

    def get_stats(self):
        return self.mean, self.cov


class StudentRV(RandomVariable, struct.PyTreeNode):
    """Student-t random variable (cf. ``utils.py:625-674``).

    ``get_stats()`` returns ``(mean, scale, dof)`` — note the reference returns
    the *scale matrix*, not the covariance (see the TODO at ``ssinf.py:601``),
    and the filters consume it as-is; we preserve that behaviour for parity.
    """

    mean: jax.Array
    scale: jax.Array
    dof: float = struct.field(pytree_node=False, default=3.0)

    @classmethod
    def create(cls, dim: int, mean=None, scale=None, dof: float = 3.0, dtype=jnp.float64) -> "StudentRV":
        dtype = jnp.zeros((), dtype).dtype
        mean = jnp.zeros((dim,), dtype) if mean is None else jnp.atleast_1d(jnp.asarray(mean, dtype))
        scale = jnp.eye(dim, dtype=dtype) if scale is None else jnp.atleast_2d(jnp.asarray(scale, dtype))
        if dof <= 2.0:  # reference enforces dof > 2 (``utils.py:662-663``)
            dof = 3.0
        return cls(mean=mean, scale=scale, dof=float(dof))

    @property
    def dim(self) -> int:
        return self.mean.shape[-1]

    def sample(self, key, size) -> jax.Array:
        s = rand.multivariate_t(key, self.mean, self.scale, self.dof, _as_tuple(size))
        return jnp.moveaxis(s, -1, 0)

    def get_stats(self):
        return self.mean, self.scale, self.dof


class GaussianMixtureRV(RandomVariable, struct.PyTreeNode):
    """Two-or-more component Gaussian mixture RV.

    Capability parity with ``research/tpq/tpq_base.py`` (``GaussianMixtureRV``),
    used for glint/outlier noise studies.  ``get_stats()`` returns the moment
    -matched mean and covariance of the mixture.
    """

    means: jax.Array    # (C, D)
    covs: jax.Array     # (C, D, D)
    alphas: jax.Array   # (C,)

    @classmethod
    def create(cls, dim: int, means, covs, alphas, dtype=jnp.float64) -> "GaussianMixtureRV":
        dtype = jnp.zeros((), dtype).dtype
        means = jnp.stack([jnp.broadcast_to(jnp.asarray(m, dtype), (dim,)) for m in means])
        covs = jnp.stack([jnp.atleast_2d(jnp.asarray(c, dtype)) for c in covs])
        alphas = jnp.asarray(alphas, dtype)
        return cls(means=means, covs=covs, alphas=alphas)

    @property
    def dim(self) -> int:
        return self.means.shape[-1]

    def sample(self, key, size) -> jax.Array:
        s, _ = rand.gauss_mixture(key, self.means, self.covs, self.alphas, _as_tuple(size))
        return jnp.moveaxis(s, -1, 0)

    def get_stats(self):
        mean = jnp.einsum("c,cd->d", self.alphas, self.means)
        dm = self.means - mean
        cov = jnp.einsum("c,cde->de", self.alphas, self.covs + jnp.einsum("cd,ce->cde", dm, dm))
        return mean, cov
