"""Classical moment transforms as pure-functional JAX pytrees.

TPU-first re-design of ``ssmtoybox/mtran.py``.  The mathematical contract is
identical to the reference (``mtran.py:11-46``): a transform maps

    ``(f, mean, cov, fcn_par) -> (mean_f, cov_f, cov_fx)``

for a nonlinear ``f`` and Gaussian/Student input moments.  Differences from the
reference are purely architectural:

* transforms are immutable flax pytrees — weights/points are arrays computed
  once at construction and baked into jitted programs;
* ``f`` is evaluated on all sigma-points with ``jax.vmap`` instead of
  ``np.apply_along_axis`` (``mtran.py:141``), so a single trace covers any
  batch of trajectories;
* Jacobians (EKF-style linearization) come from ``jax.jacfwd`` instead of
  hand-coded ``dyn_fcn_dx`` — analytically identical, and exact to machine
  precision.

Callable convention: ``f(x_vec, fcn_par) -> y_vec`` where ``x_vec`` is one
(augmented) state column.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from . import points as pts
from .utils.linalg import chol_small, small_matmul, small_mm3

__all__ = [
    "MomentTransform",
    "LinearizationTransform",
    "MonteCarloTransform",
    "SigmaPointTransform",
    "SphericalRadialTransform",
    "UnscentedTransform",
    "GaussHermiteTransform",
    "FullySymmetricStudentTransform",
    "TruncatedSigmaPointTransform",
    "TruncatedSphericalRadialTransform",
    "TruncatedUnscentedTransform",
    "TruncatedGaussHermiteTransform",
    "TaylorGPQDTransform",
    "apply_f_columns",
]


def apply_f_columns(f: Callable, x: jax.Array, fcn_par) -> jax.Array:
    """Evaluate ``f`` on every column of ``x`` with vmap.

    Replaces ``np.apply_along_axis(f, 0, x, fcn_pars)`` (``mtran.py:141``).
    ``x`` is (D, N); result is (E, N).
    """
    return jax.vmap(lambda col: jnp.atleast_1d(f(col, fcn_par)), in_axes=1, out_axes=1)(x)


class MomentTransform:
    """Interface marker (cf. ``mtran.py:11-46``)."""

    def apply(self, f, mean, cov, fcn_par):  # pragma: no cover - interface
        raise NotImplementedError


class LinearizationTransform(MomentTransform, struct.PyTreeNode):
    """EKF-style first-order Taylor transform (``mtran.py:49-59``).

    The reference calls ``f(mean, dx=True)`` for a hand-coded Jacobian; here
    the Jacobian is ``jax.jacfwd(f)`` evaluated at the mean, which equals the
    analytic Jacobian exactly.
    """

    dim: int = struct.field(pytree_node=False)

    @classmethod
    def create(cls, dim: int, dtype=None) -> "LinearizationTransform":
        del dtype
        return cls(dim=dim)

    def apply(self, f, mean, cov, fcn_par):
        mean_f = jnp.atleast_1d(f(mean, fcn_par))
        jac = jnp.atleast_2d(jax.jacfwd(lambda v: jnp.atleast_1d(f(v, fcn_par)))(mean))
        cov_fx = jac @ cov
        cov_f = cov_fx @ jac.T
        return mean_f, cov_f, cov_fx


class MonteCarloTransform(MomentTransform, struct.PyTreeNode):
    """Monte-Carlo baseline transform (``mtran.py:62-94``).

    Unit points are drawn once at construction from a seeded generator (the
    reference uses the global NumPy RNG) — the transform itself is then a
    deterministic pure function.
    """

    unit_sp: jax.Array
    wm: float = struct.field(pytree_node=False)
    wc: float = struct.field(pytree_node=False)

    @classmethod
    def create(cls, dim: int, n: int = 100, seed: int = 0, dtype=None) -> "MonteCarloTransform":
        wm, wc = pts.mc_weights(int(n))
        return cls(unit_sp=jnp.asarray(pts.mc_points(dim, n, seed), dtype=dtype), wm=wm, wc=wc)

    def apply(self, f, mean, cov, fcn_par):
        L = chol_small(cov)
        dx_in = small_matmul(L, self.unit_sp)
        x = mean[:, None] + dx_in
        fx = apply_f_columns(f, x, fcn_par)
        mean_f = self.wm * jnp.sum(fx, axis=1)
        dfx = fx - mean_f[:, None]
        cov_f = self.wc * (dfx @ dfx.T)
        cov_fx = self.wc * (dfx @ dx_in.T)
        return mean_f, cov_f, cov_fx


class SigmaPointTransform(MomentTransform, struct.PyTreeNode):
    """Generic weighted sigma-point transform (``mtran.py:102-149``).

    ``x = mean + chol(cov) @ xi``; push through ``f``; weighted mean,
    covariance and input-output cross-covariance.  ``wm`` is a weight vector,
    ``Wc`` a (N, N) covariance weight matrix (diagonal for classical rules).
    """

    unit_sp: jax.Array  # (D, N)
    wm: jax.Array       # (N,)
    #: dense (N, N) covariance-weight matrix — only populated for rules that
    #: genuinely need one; classical rules carry :attr:`wc_diag` instead and
    #: leave this None (a GH degree^d rule would otherwise bake an O(N^2)
    #: constant into every compiled program: ~78 MB for GH-5 in 5D)
    Wc_dense: jax.Array | None = None
    #: diagonal of ``Wc`` when the rule's covariance weights are diagonal
    #: (every classical rule) — its presence is STATIC pytree structure, so
    #: ``apply`` halves the contraction work without a traced branch
    wc_diag: jax.Array | None = None

    @property
    def Wc(self) -> jax.Array:
        """Dense covariance-weight matrix (reference attribute,
        ``mtran.py:102-149``), materialized on demand for diagonal rules."""
        if self.Wc_dense is not None:
            return self.Wc_dense
        if self.wc_diag is None:
            raise ValueError("SigmaPointTransform needs covariance weights: "
                             "pass wc_diag (classical diagonal rule) or "
                             "Wc_dense (general rule)")
        return jnp.diag(self.wc_diag)

    def apply(self, f, mean, cov, fcn_par):
        L = chol_small(cov)
        dx_in = small_matmul(L, self.unit_sp)
        x = mean[:, None] + dx_in
        fx = apply_f_columns(f, x, fcn_par)
        mean_f = small_matmul(fx, self.wm)
        dfx = fx - mean_f[:, None]
        if self.wc_diag is not None:
            # dfx @ diag(wc) @ B^T as one elementwise scale + one contraction.
            # (A lower-triangle-only Gram was tried and measured SLOWER on
            # TPU for D=5 — the rank-1-update pattern fuses better than
            # D(D+1)/2 separate dot chains.)
            dfx_w = dfx * self.wc_diag[None, :]
            cov_f = small_matmul(dfx_w, dfx.T)
            cov_fx = small_matmul(dfx_w, dx_in.T)
        else:
            Wc = self.Wc        # raises a clear error if neither weight set
            cov_f = small_mm3(dfx, Wc, dfx.T)
            cov_fx = small_mm3(dfx, Wc, dx_in.T)
        return mean_f, cov_f, cov_fx


def _spt(points: np.ndarray, wm: np.ndarray, wc: np.ndarray, dtype=None) -> SigmaPointTransform:
    return SigmaPointTransform(
        unit_sp=jnp.asarray(points, dtype=dtype),
        wm=jnp.asarray(wm, dtype=dtype),
        wc_diag=jnp.asarray(wc, dtype=dtype),
    )


class SphericalRadialTransform:
    """CKF spherical-radial rule, 2d points (``mtran.py:152-204``)."""

    def __new__(cls, dim: int, dtype=None) -> SigmaPointTransform:
        w = pts.sr_weights(dim)
        return _spt(pts.sr_points(dim), w, w, dtype)

    unit_sigma_points = staticmethod(pts.sr_points)
    weights = staticmethod(pts.sr_weights)


class UnscentedTransform:
    """Unscented transform, 2d+1 points (``mtran.py:207-293``)."""

    def __new__(cls, dim: int, kappa=None, alpha: float = 1.0, beta: float = 2.0,
                dtype=None) -> SigmaPointTransform:
        wm, wc = pts.ut_weights(dim, kappa, alpha, beta)
        return _spt(pts.ut_points(dim, kappa, alpha), wm, wc, dtype)

    unit_sigma_points = staticmethod(pts.ut_points)
    weights = staticmethod(pts.ut_weights)


class GaussHermiteTransform:
    """Gauss-Hermite rule, degree^d points (``mtran.py:296-360``)."""

    def __new__(cls, dim: int, degree: int = 3, dtype=None) -> SigmaPointTransform:
        w = pts.gh_weights(dim, degree)
        return _spt(pts.gh_points(dim, degree), w, w, dtype)

    unit_sigma_points = staticmethod(pts.gh_points)
    weights = staticmethod(pts.gh_weights)


class FullySymmetricStudentTransform:
    """McNamee-Stenger fully-symmetric rule for Student inputs (``mtran.py:363-578``)."""

    def __new__(cls, dim: int, degree: int = 3, kappa=None, dof: float = 4.0,
                dtype=None) -> SigmaPointTransform:
        w = pts.fs_weights(dim, degree, kappa, dof)
        return _spt(pts.fs_points(dim, degree, kappa, dof), w, w, dtype)

    unit_sigma_points = staticmethod(pts.fs_points)
    weights = staticmethod(pts.fs_weights)


class TruncatedSigmaPointTransform(MomentTransform, struct.PyTreeNode):
    """Sigma-point transform aware of effective input dimension.

    Parity with ``mtran.py:588-658`` (EXPERIMENTAL in the reference): mean and
    covariance come from the rule on the leading ``dim_eff`` marginal, the
    cross-covariance from the full-dimensional rule.
    """

    unit_sp_eff: jax.Array
    wm: jax.Array
    Wc: jax.Array
    unit_sp: jax.Array
    Wcc: jax.Array
    dim_eff: int = struct.field(pytree_node=False)

    def apply(self, f, mean, cov, fcn_par):
        d_eff = self.dim_eff
        mean_eff = mean[:d_eff]
        cov_eff = cov[:d_eff, :d_eff]

        x_eff = mean_eff[:, None] + small_matmul(chol_small(cov_eff), self.unit_sp_eff)
        dx_in = small_matmul(chol_small(cov), self.unit_sp)
        x = mean[:, None] + dx_in

        fx_eff = apply_f_columns(f, x_eff, fcn_par)
        fx = apply_f_columns(f, x, fcn_par)

        mean_f = small_matmul(fx_eff, self.wm)
        dfx_eff = fx_eff - mean_f[:, None]
        dfx = fx - mean_f[:, None]
        cov_f = small_mm3(dfx_eff, self.Wc, dfx_eff.T)
        cov_fx = small_mm3(dfx, self.Wcc, dx_in.T)
        return mean_f, cov_f, cov_fx


def _trunc(points_eff, wm, wc, points_full, wc_full, dim_eff, dtype=None):
    return TruncatedSigmaPointTransform(
        unit_sp_eff=jnp.asarray(points_eff, dtype=dtype),
        wm=jnp.asarray(wm, dtype=dtype),
        Wc=jnp.asarray(np.diag(wc), dtype=dtype),
        unit_sp=jnp.asarray(points_full, dtype=dtype),
        Wcc=jnp.asarray(np.diag(wc_full), dtype=dtype),
        dim_eff=dim_eff,
    )


class TruncatedSphericalRadialTransform:
    """(``mtran.py:625-634``)"""

    def __new__(cls, dim: int, dim_eff: int, dtype=None) -> TruncatedSigmaPointTransform:
        w_eff = pts.sr_weights(dim_eff)
        return _trunc(pts.sr_points(dim_eff), w_eff, w_eff,
                      pts.sr_points(dim), pts.sr_weights(dim), dim_eff, dtype)


class TruncatedUnscentedTransform:
    """(``mtran.py:637-646``)"""

    def __new__(cls, dim: int, dim_eff: int, kappa=None, alpha: float = 1.0, beta: float = 2.0,
                dtype=None) -> TruncatedSigmaPointTransform:
        wm, wc = pts.ut_weights(dim_eff, kappa, alpha, beta)
        _, wc_full = pts.ut_weights(dim, kappa, alpha, beta)
        return _trunc(pts.ut_points(dim_eff, kappa, alpha), wm, wc,
                      pts.ut_points(dim, kappa, alpha), wc_full, dim_eff, dtype)


class TruncatedGaussHermiteTransform:
    """(``mtran.py:649-658``)"""

    def __new__(cls, dim: int, dim_eff: int, degree: int = 3, dtype=None) -> TruncatedSigmaPointTransform:
        w_eff = pts.gh_weights(dim_eff, degree)
        return _trunc(pts.gh_points(dim_eff, degree), w_eff, w_eff,
                      pts.gh_points(dim, degree), pts.gh_weights(dim, degree), dim_eff, dtype)


class TaylorGPQDTransform(MomentTransform, struct.PyTreeNode):
    """GPQ+D with a single sigma-point at the mean — "Bayesian EKF".

    Parity with ``mtran.py:668-701``.  Converges to the linearization
    transform for length-scale -> infinity.  The reference returns the
    cross-covariance as ``Lam (Lam+cov)^-1 cov J^T`` of shape (D, E); we return
    its transpose so the output convention (E, D) matches every other
    transform (the reference only exercises this on 1-D models where the two
    coincide; see ``ssinf.py:1302-1319``).
    """

    alpha: jax.Array      # kernel scaling
    ell: jax.Array        # (dim,) length-scales
    dim: int = struct.field(pytree_node=False)

    @classmethod
    def create(cls, dim: int, ker_par, dtype=None) -> "TaylorGPQDTransform":
        ker_par = jnp.atleast_2d(jnp.asarray(ker_par, dtype=dtype))
        alpha = ker_par[0, 0]
        ell = ker_par[0, 1:] * jnp.ones(dim, dtype=ker_par.dtype)
        return cls(alpha=alpha, ell=ell, dim=dim)

    def apply(self, f, mean, cov, fcn_par):
        from .utils.linalg import pd_logdet, pd_solve

        lam = self.ell ** 2            # diag(Lam)
        ilam = self.ell ** -2          # diag(Lam^-1)

        # det(Lam^-1 cov + I) = det(cov + Lam) / prod(lam)  — PD-only path so
        # the f64 parity configuration compiles on TPU (no LU kernel there)
        wm = jnp.exp(-0.5 * (pd_logdet(cov + jnp.diag(lam)) - jnp.sum(jnp.log(lam))))
        fm = jnp.atleast_1d(f(mean, fcn_par))
        mean_f = wm * fm
        jac = jnp.atleast_2d(jax.jacfwd(lambda v: jnp.atleast_1d(f(v, fcn_par)))(mean))

        wc = jnp.exp(-0.5 * (pd_logdet(cov + jnp.diag(0.5 * lam)) - jnp.sum(jnp.log(0.5 * lam))))
        Wc = 0.5 * lam[:, None] * pd_solve(jnp.diag(0.5 * lam) + cov, cov)
        model_var = self.alpha ** 2 - self.alpha ** 2 * wc * (1.0 + jnp.trace(Wc * ilam[None, :]))
        cov_f = wc * (jnp.outer(fm, fm) + jac @ Wc @ jac.T) - jnp.outer(mean_f, mean_f) + model_var
        cov_fx = (lam[:, None] * pd_solve(jnp.diag(lam) + cov, cov) @ jac.T).T
        return mean_f, cov_f, cov_fx
