"""BQ integrand models: GP, Bayes-Sard GP, Student-t process, multi-output.

TPU-first re-design of ``ssmtoybox/bq/bqmod.py``.  A model ties a kernel to a
sigma-point set and produces the Bayesian-quadrature weights

    ``wm = q K^-1``, ``Wc = K^-1 Q K^-1``, ``Wcc = R K^-1``
    (+ expected model variance and integral variance)

exactly as ``GaussianProcessModel.bq_weights`` (``bqmod.py:495-523``).  Unlike
the reference, models are stateless pytrees: ``bq_weights`` returns everything
(weights + the Gram inverse and expectations the transforms may need later)
instead of stashing them on ``self`` — which is what makes weight re-derivation
inside jitted, parameter-marginalizing filters possible.

Hyper-parameter estimation: NLML values are pure jnp functions; gradients come
from ``jax.grad`` (replacing the hand-coded ``der_par`` chain,
``bqmod.py:537-596``) and the BFGS driver wraps a jitted value-and-grad.
"""
from __future__ import annotations

from math import factorial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from ..points import get_points
from ..utils.combin import vandermonde
from ..utils.linalg import gen_solve, pd_solve, symmetrize
from .kernels import Kernel, get_kernel


def _dfact(n: int) -> int:
    """Double factorial with the ``(-1)!! = 0!! = 1`` convention.

    SciPy >= 1.11 returns 0 for negative arguments, which silently breaks the
    Gaussian moment identity ``E[x^a] = (a-1)!!`` at ``a = 0``; hence a local
    implementation.
    """
    if n <= 0:
        return 1
    out = 1
    while n > 1:
        out *= n
        n -= 2
    return out


__all__ = [
    "Model", "GaussianProcessModel", "BayesSardModel", "StudentTProcessModel",
    "MultiOutputModel", "GaussianProcessMO", "StudentTProcessMO",
]

_SUPPORTED_POINTS = ["sr", "ut", "gh", "fs"]
_SUPPORTED_KERNELS = ["rbf", "rq", "rbf-student"]


class BQWeights(struct.PyTreeNode):
    """Everything ``bq_weights`` produces; the reference spreads these across
    return values and instance attributes (``bqmod.py:508-523``)."""

    wm: jax.Array
    Wc: jax.Array
    Wcc: jax.Array
    model_var: jax.Array
    integral_var: jax.Array
    q: jax.Array
    Q: jax.Array
    iK: jax.Array


class Model(struct.PyTreeNode):
    """Base integrand model = kernel + point set (``bqmod.py:15-424``)."""

    # supported acronym lists (cf. ``bqmod.py:82-83``)
    _supported_points_ = _SUPPORTED_POINTS
    _supported_kernels_ = _SUPPORTED_KERNELS

    kernel: Kernel
    points: jax.Array
    dim_in: int = struct.field(pytree_node=False)
    num_pts: int = struct.field(pytree_node=False)
    str_pts: str = struct.field(pytree_node=False, default="")
    estimate_par: bool = struct.field(pytree_node=False, default=False)

    # -- construction helpers ---------------------------------------------------
    @staticmethod
    def _build_parts(dim, kern_par, kern_str, point_str, point_par, dtype=None, **kern_kwargs):
        kernel = get_kernel(dim, kern_str, kern_par, dtype=dtype, **kern_kwargs)
        points = jnp.asarray(get_points(dim, point_str, point_par), dtype=kernel.par.dtype)
        return kernel, points

    # -- interface ---------------------------------------------------------------
    def bq_weights(self, par=None, *args) -> BQWeights:  # pragma: no cover
        raise NotImplementedError

    def predict(self, test_data, fcn_obs, x_obs=None, par=None):  # pragma: no cover
        raise NotImplementedError

    def exp_model_variance(self, par=None, *args):  # pragma: no cover
        raise NotImplementedError

    def integral_variance(self, par=None, *args):  # pragma: no cover
        raise NotImplementedError

    def neg_log_marginal_likelihood(self, log_par, fcn_obs, x_obs, jitter):  # pragma: no cover
        raise NotImplementedError

    def plot_model(self, test_data, fcn_obs, par=None, fcn_true=None, in_dim=0):
        """Debug plot of the integrand model's predictive mean/variance
        (``bqmod.py:287-338``).  Host-side matplotlib; figure is returned
        (never shown) so the call is headless-CI safe, unlike the reference's
        blocking ``plt.show()`` (SURVEY §4)."""
        import matplotlib
        matplotlib.use("Agg", force=False)
        import matplotlib.pyplot as plt

        fcn_obs = np.squeeze(np.asarray(fcn_obs))
        mean, var = self.predict(test_data, jnp.asarray(fcn_obs))
        mean = np.asarray(mean)
        std = np.sqrt(np.asarray(var))
        xplot = np.squeeze(np.asarray(test_data)[in_dim, :])

        fig, ax = plt.subplots()
        ax.fill_between(xplot, mean - 2 * std, mean + 2 * std, color="0.1", alpha=0.15)
        ax.plot(xplot, mean, color="k", lw=2)
        ax.plot(np.asarray(self.points)[in_dim, :], fcn_obs, "ko", ms=8)
        if fcn_true is not None:
            ax.plot(xplot, np.squeeze(np.asarray(fcn_true)), lw=2, ls="--", color="tomato")
        ax.set_title(f"{type(self).__name__} model of the integrand")
        return fig

    # -- hyper-parameter optimization (``bqmod.py:250-285``) ----------------------
    def optimize(self, log_par_0, fcn_obs, x_obs, method="BFGS", **kwargs):
        """Minimize the NLML over log-parameters with scipy BFGS driving a
        jitted jax value-and-grad — the TPU-side replacement for the
        reference's hand-derived gradient path (``bqmod.py:282-285``)."""
        from scipy.optimize import minimize

        x_obs = jnp.asarray(x_obs)
        fcn_obs = jnp.asarray(fcn_obs)
        jitter = 1e-8 * jnp.eye(x_obs.shape[1], dtype=x_obs.dtype)
        vag = jax.jit(jax.value_and_grad(
            lambda lp: self.neg_log_marginal_likelihood(lp, fcn_obs, x_obs, jitter)))

        def obj(lp):
            v, g = vag(jnp.asarray(lp))
            return float(v), np.asarray(g, dtype=float)

        return minimize(obj, np.asarray(log_par_0, dtype=float).reshape(-1),
                        method=method, jac=True, **kwargs)


class GaussianProcessModel(Model):
    """GP regression model of the integrand (``bqmod.py:426-596``)."""

    @classmethod
    def create(cls, dim, kern_par, kern_str="rbf", point_str="ut", point_par=None,
               estimate_par=False, dtype=None, **kern_kwargs):
        kernel, points = cls._build_parts(dim, kern_par, kern_str, point_str, point_par,
                                          dtype, **kern_kwargs)
        return cls(kernel=kernel, points=points, dim_in=dim, num_pts=points.shape[1],
                   str_pts=point_str, estimate_par=estimate_par)

    def bq_weights(self, par=None, *args) -> BQWeights:
        """Core BQ weight formulas (``bqmod.py:495-523``).

        MC-expectation kernels (rbf-student) go through the kernel's
        projected-weight-space accumulator instead of the ``iK Q iK``
        composition: the same integrals, but immune to the ``1/lambda_min^2``
        error amplification that makes the composed form diverge on the
        ill-conditioned FUSION-2017 kernel parameters (see
        ``RBFStudent.projected_weight_stats``)."""
        par = self.kernel.get_parameters(par)
        x = self.points

        iK = self.kernel.eval_inv_dot(par, x, scaling=False)
        if hasattr(self.kernel, "projected_weight_stats"):
            q, w_m, Wc, w_cc_t, tr_QiK, Q = \
                self.kernel.projected_weight_stats(par, x, iK)
            w_c = symmetrize(Wc)
            w_cc = w_cc_t
            model_var = self.kernel.exp_x_kxx(par) * (1.0 - tr_QiK)
            integral_var = self.kernel.exp_xy_kxy(par) - q @ w_m
            return BQWeights(wm=w_m, Wc=w_c, Wcc=w_cc, model_var=model_var,
                             integral_var=integral_var, q=q, Q=Q, iK=iK)

        q, R, Q = self.kernel.exp_x_qRQ(par, x)

        w_m = q @ iK
        w_c = symmetrize(iK @ Q @ iK)
        w_cc = R @ iK

        model_var = self.kernel.exp_x_kxx(par) * (1.0 - jnp.trace(Q @ iK))
        integral_var = self.kernel.exp_xy_kxy(par) - q @ iK @ q
        return BQWeights(wm=w_m, Wc=w_c, Wcc=w_cc, model_var=model_var,
                         integral_var=integral_var, q=q, Q=Q, iK=iK)

    def predict(self, test_data, fcn_obs, x_obs=None, par=None):
        """GP predictive mean/variance (``bqmod.py:454-493``)."""
        x_obs = self.points if x_obs is None else x_obs
        par = self.kernel.get_parameters(par)
        iK = self.kernel.eval_inv_dot(par, x_obs)
        kx = self.kernel.eval(par, test_data, x_obs)
        kxx = self.kernel.eval(par, test_data, test_data, diag=True)
        mean = jnp.squeeze(kx @ iK @ jnp.atleast_2d(fcn_obs.T).reshape(x_obs.shape[1], -1))
        var = jnp.squeeze(kxx - jnp.einsum("im,mn,in->i", kx, iK, kx))
        return mean, var

    def exp_model_variance(self, par=None, *args, weights: "BQWeights" = None):
        """``s^2 (1 - tr(Q K^-1))`` (``bqmod.py:525-528``).

        MC-weighted kernels (rbf-student) accumulate ``tr(Q iK) = E[k^T iK k]``
        in projected form (see ``bq_weights``) — the composed
        ``trace(Q @ iK)`` picks up iK-amplified accumulation noise on
        ill-conditioned parameters.  Pass a precomputed ``weights``
        (:meth:`bq_weights` result) to avoid re-running that multi-million-
        sample MC sweep just to re-derive one scalar it already holds."""
        if weights is not None:
            return weights.model_var
        par = self.kernel.get_parameters(par)
        iK = self.kernel.eval_inv_dot(par, self.points)
        if hasattr(self.kernel, "projected_weight_stats"):
            _, _, _, _, tr_QiK, _ = \
                self.kernel.projected_weight_stats(par, self.points, iK)
            return self.kernel.exp_x_kxx(par) * (1.0 - tr_QiK)
        _, _, Q = self.kernel.exp_x_qRQ(par, self.points)
        return self.kernel.exp_x_kxx(par) * (1.0 - jnp.trace(Q @ iK))

    def integral_variance(self, par=None, *args, weights: "BQWeights" = None):
        """``E[kxy] - q^T K^-1 q`` (``bqmod.py:530-535``).

        ``weights`` short-circuits the MC sweep like in
        :meth:`exp_model_variance`."""
        if weights is not None:
            return weights.integral_var
        par = self.kernel.get_parameters(par)
        iK = self.kernel.eval_inv_dot(par, self.points, scaling=False)
        if hasattr(self.kernel, "projected_weight_stats"):
            q, wm, _, _, _, _ = \
                self.kernel.projected_weight_stats(par, self.points, iK)
            return self.kernel.exp_xy_kxy(par) - q @ wm
        q, _, _ = self.kernel.exp_x_qRQ(par, self.points)
        return self.kernel.exp_xy_kxy(par) - q @ iK @ q

    def neg_log_marginal_likelihood(self, log_par, fcn_obs, x_obs, jitter):
        """Total multi-output GP NLML (``bqmod.py:537-596``), value only —
        differentiate with ``jax.grad``.  ``fcn_obs`` is (num_pts, dim_out)."""
        par = jnp.exp(log_par)
        num_data, num_out = fcn_obs.shape
        K = self.kernel.eval(par, x_obs) + jitter
        L = jnp.linalg.cholesky(K)
        a = jax.scipy.linalg.cho_solve((L, True), fcn_obs)
        y_dot_a = jnp.sum(fcn_obs * a)
        return (num_out * jnp.sum(jnp.log(jnp.diag(L)))
                + 0.5 * (y_dot_a + num_out * num_data * jnp.log(2.0 * jnp.pi)))


# ---------------------------------------------------------------------------
# Bayes-Sard model
# ---------------------------------------------------------------------------

def _exp_x_px(multi_ind: np.ndarray) -> np.ndarray:
    """``E[p(x)]_q = prod_d (alpha_d^q - 1)!!`` if all even, else 0
    (``bqmod.py:635-662``).  Static combinatorics: evaluated in NumPy at trace
    time because the multi-index is a compile-time constant."""
    dim, num_basis = multi_ind.shape
    out = np.zeros(num_basis)
    for qi in range(num_basis):
        if np.all(multi_ind[:, qi] % 2 == 0):
            out[qi] = np.prod([float(_dfact(int(multi_ind[d, qi]) - 1))
                               for d in range(dim)])
    return out


def _exp_x_xpx(multi_ind: np.ndarray) -> np.ndarray:
    """``E[x p(x)^T]_{eq}`` (``bqmod.py:664-698``)."""
    dim, num_basis = multi_ind.shape
    out = np.zeros((dim, num_basis))
    d_ind = np.arange(dim)
    for d in range(dim):
        for qi in range(num_basis):
            alpha_min_d = multi_ind[d_ind != d, qi]
            if (multi_ind[d, qi] + 1) % 2 == 0 and np.all(alpha_min_d % 2 == 0):
                amd = np.prod([float(_dfact(int(a) - 1)) for a in alpha_min_d])
                # E[x_d^(alpha_d + 1)] = alpha_d!! for odd alpha_d.  The
                # reference uses plain alpha_d (``bqmod.py:697``) — equal to
                # alpha_d!! only for alpha_d in {1, 3}, wrong from degree 5
                # (5!! = 15, not 5); fixed here, recorded in docs/parity.md.
                out[d, qi] = float(_dfact(int(multi_ind[d, qi]))) * amd
    return out


def _exp_x_pxpx(multi_ind: np.ndarray) -> np.ndarray:
    """``E[p(x) p(x)^T]_{rq}`` (``bqmod.py:700-731``)."""
    dim, num_basis = multi_ind.shape
    out = np.zeros((num_basis, num_basis))
    for r in range(num_basis):
        for qi in range(num_basis):
            if np.all((multi_ind[:, r] + multi_ind[:, qi]) % 2 == 0):
                out[r, qi] = np.prod([
                    float(_dfact(int(multi_ind[d, r] + multi_ind[d, qi]) - 1))
                    for d in range(dim)])
    return out


def _exp_x_kxpx(ell: jax.Array, multi_ind: np.ndarray, x: jax.Array) -> jax.Array:
    """``E[k(x)p(x)^T]_{nq}`` — closed form for RBF x monomials
    (``bqmod.py:733-797``).  Traced in jnp (depends on kernel length-scales and
    points); the inner sums run over the static multi-index."""
    dim, num_basis = multi_ind.shape
    cols = []
    for qi in range(num_basis):
        term = None
        for d in range(dim):
            alpha = int(multi_ind[d, qi])
            ld = ell[d]
            xd = x[d, :]
            a = ld * (1.0 + ld ** 2) ** (-(1 + alpha) / 2.0) * jnp.exp(-xd ** 2 / (2.0 * (1.0 + ld ** 2)))
            b = 0.0
            for m in range(alpha // 2 + 1):
                part_1 = float(factorial(alpha)) / (
                    (2 ** m) * float(factorial(m)) * float(factorial(alpha - 2 * m)))
                part_2 = ld ** (2 * m) * (xd / jnp.sqrt(1.0 + ld ** 2)) ** (alpha - 2 * m)
                b = b + part_1 * part_2
            ab = a * b
            term = ab if term is None else term * ab
        cols.append(term)
    return jnp.stack(cols, axis=1)  # (N, Q)


class BayesSardModel(Model):
    """GP with multivariate-polynomial prior mean (``bqmod.py:599-1057``).

    The pi-unisolvent branch (num_basis == num_pts) reproduces classical
    UT/GH weights exactly with calibrated EMV (``bqmod.py:948-961``).
    The multi-index is static configuration (stored as a nested tuple so the
    pytree stays hashable); all polynomial-moment matrices are trace-time
    constants.
    """

    mulind: Tuple[Tuple[int, ...], ...] = struct.field(pytree_node=False, default=())
    #: The reference's ``_exp_x_kxpx`` substitutes the SQUARED length-scale
    #: into a closed form derived for the length-scale (``bqmod.py:770-771``:
    #: ``ell = diag(sqrt_inv_lam)**-2`` is l^2, then used as l in
    #: ``bqmod.py:784-790``).  This only affects the expected-model-variance
    #: calibration, not the weights, and is invisible at l = 1.  Default True
    #: reproduces the reference bit-for-bit; set False for the mathematically
    #: correct expectation (verified against Monte Carlo in the test suite).
    compat_kxpx_ell_squared: bool = struct.field(pytree_node=False, default=True)

    @classmethod
    def create(cls, dim, kern_par, multi_ind=2, point_str="ut", point_par=None,
               estimate_par=False, dtype=None, compat_kxpx_ell_squared=True):
        kernel, points = cls._build_parts(dim, kern_par, "rbf", point_str, point_par, dtype)
        if isinstance(multi_ind, int):
            from ..utils.combin import total_degree_multi_index
            mi = total_degree_multi_index(dim, multi_ind)
        else:
            mi = np.asarray(multi_ind, dtype=np.int64)
        return cls(kernel=kernel, points=points, dim_in=dim, num_pts=points.shape[1],
                   str_pts=point_str, estimate_par=estimate_par,
                   mulind=tuple(tuple(int(v) for v in row) for row in mi),
                   compat_kxpx_ell_squared=compat_kxpx_ell_squared)

    @property
    def mulind_np(self) -> np.ndarray:
        return np.asarray(self.mulind, dtype=np.int64)

    def _ell(self, par) -> jax.Array:
        ell = jnp.asarray(par).reshape(-1)[1:]
        return ell ** 2 if self.compat_kxpx_ell_squared else ell

    def bq_weights(self, par=None, multi_ind=None) -> BQWeights:
        """BSQ weights, unisolvent and general branches (``bqmod.py:893-992``)."""
        par = self.kernel.get_parameters(par)
        x = self.points
        mi = self.mulind_np if multi_ind is None else np.asarray(multi_ind, dtype=np.int64)
        num_basis = mi.shape[1]
        if mi.shape[0] != self.dim_in:
            raise ValueError(
                f"Dimension mismatch {mi.shape[0]} != {self.dim_in}: monomial dim must equal point dim.")
        if num_basis > self.num_pts:
            raise ValueError(
                f"Number of basis functions ({num_basis}) must be <= number of points ({self.num_pts}).")

        dtype = x.dtype
        iK = self.kernel.eval_inv_dot(par, x, scaling=False)
        V = vandermonde(mi, x).astype(dtype)
        eye_b = jnp.eye(num_basis, dtype=dtype)
        iViKV = pd_solve(V.T @ iK @ V + 1e-8 * eye_b, eye_b)

        px = jnp.asarray(_exp_x_px(mi), dtype)
        xpx = jnp.asarray(_exp_x_xpx(mi), dtype)
        pxpx = jnp.asarray(_exp_x_pxpx(mi), dtype)
        kxpx = _exp_x_kxpx(self._ell(par), mi, x)
        q = self.kernel.exp_x_kx(par, x)
        kxy = self.kernel.exp_xy_kxy(par)
        kscale2 = jnp.asarray(par).reshape(-1)[0] ** 2

        if num_basis == self.num_pts:
            # pi-unisolvent points: weights via the inverse Vandermonde matrix
            # (gen_solve, not jnp.linalg.solve: no f64 LU kernel on TPU)
            iV = gen_solve(V, jnp.eye(num_basis, dtype=dtype))
            w_m = iV.T @ px
            w_c = iV.T @ pxpx @ iV
            w_cc = xpx @ iV
            model_var = kscale2 * (1.0 - jnp.trace(kxpx.T @ iV.T + kxpx @ iV - pxpx @ iViKV))
            integral_var = kxy - q @ iV.T @ px - px @ iV @ q + px @ iViKV @ px
            Q = self.kernel.exp_x_kxkx(par, par, x)
        else:
            Q = self.kernel.exp_x_kxkx(par, par, x)
            R = self.kernel.exp_x_xkx(par, x)
            Z = V.T @ iK
            A = V @ iViKV
            b = Z @ q - px
            B = Z @ Q @ Z.T + pxpx - Z @ kxpx - kxpx.T @ Z.T
            D = R @ Z.T - xpx
            w_m = iK @ (q - A @ b)
            w_c = iK @ (Q - A @ B @ A.T) @ iK
            w_cc = (R - D @ A.T) @ iK
            model_var = kscale2 * (1.0 - jnp.trace(Q @ iK) + jnp.trace(B @ iViKV))
            integral_var = kxy - q @ iK @ q + b @ iViKV @ b

        w_c = symmetrize(w_c)
        return BQWeights(wm=w_m, Wc=w_c, Wcc=w_cc, model_var=model_var,
                         integral_var=integral_var, q=q, Q=Q, iK=iK)

    def predict(self, test_data, fcn_obs, x_obs=None, par=None, mulind=None):
        """BSQ-GP predictive mean/variance (``bqmod.py:840-891``)."""
        x_obs = self.points if x_obs is None else x_obs
        mi = self.mulind_np if mulind is None else np.asarray(mulind, dtype=np.int64)
        par = self.kernel.get_parameters(par)
        dtype = x_obs.dtype
        num_basis = mi.shape[1]

        iK = self.kernel.eval_inv_dot(par, x_obs)
        kx = self.kernel.eval(par, test_data, x_obs)
        kxx = self.kernel.eval(par, test_data, test_data, diag=True)

        V = vandermonde(mi, x_obs).astype(dtype)
        Z = V.T @ iK
        eye_b = jnp.eye(num_basis, dtype=dtype)
        iViKV = pd_solve(Z @ V, eye_b)
        A = iViKV @ V.T
        vx = vandermonde(mi, test_data).astype(dtype)
        b = Z @ kx.T - vx.T

        mean = jnp.squeeze((kx - b.T @ A) @ iK @ jnp.atleast_2d(fcn_obs.T).reshape(x_obs.shape[1], -1))
        var = jnp.squeeze(kxx - jnp.einsum("im,mn,in->i", kx, iK, kx)
                          + jnp.einsum("mi,mn,ni->i", b, iViKV, b))
        return mean, var

    def exp_model_variance(self, par=None, mulind=None):
        """(``bqmod.py:994-1024``)"""
        par = self.kernel.get_parameters(par)
        mi = self.mulind_np if mulind is None else np.asarray(mulind, dtype=np.int64)
        x = self.points
        dtype = x.dtype
        pxpx = jnp.asarray(_exp_x_pxpx(mi), dtype)
        kxpx = _exp_x_kxpx(self._ell(par), mi, x)
        kxkx = self.kernel.exp_x_kxkx(par, par, x)
        iK = self.kernel.eval_inv_dot(par, x, scaling=False)
        V = vandermonde(mi, x).astype(dtype)
        iViKV = pd_solve(V.T @ iK @ V, jnp.eye(mi.shape[1], dtype=dtype))
        Z = V.T @ iK
        B = Z @ kxkx @ Z.T + pxpx - Z @ kxpx - kxpx.T @ Z.T
        kscale2 = jnp.asarray(par).reshape(-1)[0] ** 2
        return kscale2 * (1.0 - jnp.trace(kxkx @ iK) + jnp.trace(B @ iViKV))

    def integral_variance(self, par=None, mulind=None):
        """(``bqmod.py:1026-1054``)"""
        par = self.kernel.get_parameters(par)
        mi = self.mulind_np if mulind is None else np.asarray(mulind, dtype=np.int64)
        x = self.points
        dtype = x.dtype
        q = self.kernel.exp_x_kx(par, x)
        iK = self.kernel.eval_inv_dot(par, x, scaling=False)
        kbar = self.kernel.exp_xy_kxy(par)
        V = vandermonde(mi, x).astype(dtype)
        px = jnp.asarray(_exp_x_px(mi), dtype)
        b = V.T @ iK @ q - px
        iViKV = pd_solve(V.T @ iK @ V, jnp.eye(mi.shape[1], dtype=dtype))
        return kbar - q @ iK @ q + b @ iViKV @ b

    def mc_exp_x_kxpx(self, key, par=None, mulind=None, num_iter=10, batch_size=100_000):
        """MC verifier for the kxpx expectation (``bqmod.py:799-816``)."""
        par = self.kernel.get_parameters(par)
        mi = jnp.asarray(self.mulind_np if mulind is None else mulind)
        x = self.points
        dim = x.shape[0]

        def body(acc, k):
            xs = jax.random.multivariate_normal(
                k, jnp.zeros(dim, x.dtype), jnp.eye(dim, dtype=x.dtype), (batch_size,)).T
            p = vandermonde(mi, xs).astype(x.dtype)                 # (B, Q)
            kx = self.kernel.eval(par, xs, x, scaling=False)        # (B, N)
            return acc + jnp.einsum("bn,bq->nq", kx, p), None

        acc, _ = jax.lax.scan(body, jnp.zeros((x.shape[1], mi.shape[1]), x.dtype),
                              jax.random.split(key, num_iter))
        return acc / (num_iter * batch_size)

    def mc_exp_x_cov(self, key, par=None, mulind=None, num_iter=10, batch_size=100_000):
        """MC verifier for the BSQ weight-error covariance (``bqmod.py:818-838``)."""
        par = self.kernel.get_parameters(par)
        mi = jnp.asarray(self.mulind_np if mulind is None else mulind)
        x = self.points
        dim = x.shape[0]
        V = vandermonde(mi, x).astype(x.dtype)
        ViK = V.T @ self.kernel.eval_inv_dot(par, x)

        def body(acc, k):
            xs = jax.random.multivariate_normal(
                k, jnp.zeros(dim, x.dtype), jnp.eye(dim, dtype=x.dtype), (batch_size,)).T
            p = vandermonde(mi, xs).astype(x.dtype)                 # (B, Q)
            kx = self.kernel.eval(par, xs, x)                       # (B, N)
            b = kx @ ViK.T - p                                      # (B, Q)
            return acc + jnp.einsum("bq,br->qr", b, b), None

        acc, _ = jax.lax.scan(body, jnp.zeros((mi.shape[1], mi.shape[1]), x.dtype),
                              jax.random.split(key, num_iter))
        return acc / (num_iter * batch_size)

    def neg_log_marginal_likelihood(self, log_par, fcn_obs, x_obs, jitter):
        raise NotImplementedError("BSQ NLML unimplemented (parity: bqmod.py:1056-1057)")


class StudentTProcessModel(GaussianProcessModel):
    """Student-t process regression model (``bqmod.py:1060-1245``).

    Inherits the GP weights; predictive/model variance are rescaled by
    ``(nu - 2 + y^T K^-1 y) / (nu - 2 + N)``.
    """

    nu: float = struct.field(pytree_node=False, default=4.0)

    @classmethod
    def create(cls, dim, kern_par, kern_str="rbf", point_str="ut", point_par=None,
               estimate_par=False, nu=4.0, dtype=None, **kern_kwargs):
        kernel, points = cls._build_parts(dim, kern_par, kern_str, point_str, point_par,
                                          dtype, **kern_kwargs)
        nu = 3.0 if nu < 2.0 else float(nu)
        return cls(kernel=kernel, points=points, dim_in=dim, num_pts=points.shape[1],
                   str_pts=point_str, estimate_par=estimate_par, nu=nu)

    def predict(self, test_data, fcn_obs, x_obs=None, par=None, nu=None):
        """TP predictions (``bqmod.py:1090-1130``)."""
        nu = self.nu if nu is None else nu
        x_obs = self.points if x_obs is None else x_obs
        par = self.kernel.get_parameters(par)
        mean, var = super().predict(test_data, fcn_obs, x_obs, par)
        iK = self.kernel.eval_inv_dot(par, x_obs)
        fo = fcn_obs.reshape(-1)
        scale = (nu - 2.0 + fo @ iK @ fo) / (nu - 2.0 + self.num_pts)
        return mean, scale * var

    def tp_scale(self, iK, fcn_evals) -> jax.Array:
        """Data-dependent variance scale (``bqmod.py:1129,1158``).

        ``fcn_evals`` is (E, N); returns the (E, E) scale matrix (scalar-like
        for E = 1) used by the TPQ transform's EMV.
        """
        fe = jnp.atleast_2d(fcn_evals)
        return (self.nu - 2.0 + fe @ iK @ fe.T) / (self.nu - 2.0 + self.num_pts)

    def exp_model_variance(self, par=None, fcn_obs=None, iK=None, gp_emv=None):
        """TP expected model variance (``bqmod.py:1132-1160``).

        With precomputed ``iK``/``gp_emv`` (the transform's cached values)
        this is the fast path; otherwise both are recomputed from ``par``.
        """
        par = self.kernel.get_parameters(par)
        if iK is None:
            iK = self.kernel.eval_inv_dot(par, self.points, scaling=False)
        if gp_emv is None:
            gp_emv = super().exp_model_variance(par)
        fe = jnp.atleast_2d(fcn_obs).reshape(-1, self.num_pts)
        scale = self.tp_scale(iK, fe)
        return jnp.squeeze(scale * gp_emv) if fe.shape[0] == 1 else scale * gp_emv

    def integral_variance(self, par=None, fcn_obs=None, iK=None, gp_ivar=None):
        """(``bqmod.py:1162-1189``); ``iK``/``gp_ivar`` precomputable like
        :meth:`exp_model_variance`'s fast path."""
        par = self.kernel.get_parameters(par)
        if iK is None:
            iK = self.kernel.eval_inv_dot(par, self.points, scaling=False)
        if gp_ivar is None:
            gp_ivar = super().integral_variance(par)
        fo = jnp.asarray(fcn_obs).reshape(-1)
        scale = (self.nu - 2.0 + fo @ iK @ fo) / (self.nu - 2.0 + self.num_pts)
        return scale * gp_ivar

    def neg_log_marginal_likelihood(self, log_par, fcn_obs, x_obs, jitter):
        """TP NLML (``bqmod.py:1191-1245``), value only."""
        from jax.scipy.special import gammaln
        par = jnp.exp(log_par)
        num_data, num_out = fcn_obs.shape
        nu = self.nu
        K = self.kernel.eval(par, x_obs) + jitter
        L = jnp.linalg.cholesky(K)
        a = jax.scipy.linalg.cho_solve((L, True), fcn_obs)
        y_dot_a = jnp.sum(fcn_obs * a, axis=0)                     # (E,)
        half_logdet_K = jnp.sum(jnp.log(jnp.diag(L)))
        const = (0.5 * num_data * jnp.log((nu - 2.0) * jnp.pi)
                 - gammaln((nu + num_data) / 2.0) + gammaln(nu / 2.0))
        log_sum = 0.5 * (nu + num_data) * jnp.sum(jnp.log1p(y_dot_a / (nu - 2.0)))
        return log_sum + num_out * (half_logdet_K + const)


# ---------------------------------------------------------------------------
# Multi-output models (EXPERIMENTAL in the reference, ``bqmod.py:1248-1720``)
# ---------------------------------------------------------------------------

class MOWeights(struct.PyTreeNode):
    wm: jax.Array     # (N, E)
    Wc: jax.Array     # (N, N, E, E)
    Wcc: jax.Array    # (D, N, E)
    q: jax.Array      # (N, E)
    Q: jax.Array      # (N, N, E, E)
    R: jax.Array      # (D, N, E)
    iK: jax.Array     # (N, N, E)


def mo_gp_emv(scale, Q, iK):
    """Per-output MO-GP expected model variance ``s_e^2 (1 - tr(Q_ee iK_e))``
    (``bqmod.py:1532-1537``) — single implementation shared by the MO models
    and the MO transforms."""
    tr = jnp.einsum("nmee,mne->e", Q, iK)
    return scale ** 2 * (1.0 - tr)


def mo_tp_emv(scale, nu, num_pts, Q, iK, fcn_obs):
    """Per-output MO-TP expected model variance: the GP EMV rescaled by the
    data-dependent Student factor (``bqmod.py:1643-1663``)."""
    fe = jnp.atleast_2d(fcn_obs)                                          # (E, N)
    quad = jnp.einsum("en,nme,em->e", fe, iK, fe)
    s = (nu - 2.0 + quad) / (nu - 2.0 + num_pts)
    tr = jnp.einsum("nmee,mne->e", Q, iK)
    return scale ** 2 * s * (1.0 - tr)


class MultiOutputModel(Model):
    """One kernel-parameter row per output (``bqmod.py:1248-1478``)."""

    dim_out: int = struct.field(pytree_node=False, default=1)
    # The reference fills the upper output-triangle of its covariance-weight
    # tensor by copying the lower one WITHOUT transposing the point axes
    # (``w_c[..., j, i] = w_c[..., i, j]``, bqmod.py:1292-1297) before the
    # final symmetrization.  True (default) reproduces that; False computes
    # every block ``iK_e Q_ef iK_f`` exactly.
    compat_mirror_wc: bool = struct.field(pytree_node=False, default=True)

    @classmethod
    def create(cls, dim_in, dim_out, kern_par, kern_str="rbf", point_str="ut",
               point_par=None, estimate_par=False, dtype=None,
               compat_mirror_wc=True, **kern_kwargs):
        kernel, points = cls._build_parts(dim_in, kern_par, kern_str, point_str, point_par,
                                          dtype, **kern_kwargs)
        return cls(kernel=kernel, points=points, dim_in=dim_in, num_pts=points.shape[1],
                   str_pts=point_str, estimate_par=estimate_par, dim_out=dim_out,
                   compat_mirror_wc=compat_mirror_wc)

    def bq_weights(self, par=None, *args) -> MOWeights:
        """Tensor-valued MO-BQ weights (``bqmod.py:1254-1315``).

        The per-output loops of the reference become vmaps over parameter
        rows; ``Wc[..., e, f] = iK_e Q_ef iK_f``, symmetrized across both the
        point and output axes (``bqmod.py:1313``).
        """
        par = self.kernel.get_parameters(par)
        x = self.points

        q = jax.vmap(lambda p: self.kernel.exp_x_kx(p, x))(par)               # (E, N)
        R = jax.vmap(lambda p: self.kernel.exp_x_xkx(p, x))(par)              # (E, D, N)
        iK = jax.vmap(lambda p: self.kernel.eval_inv_dot(p, x, scaling=False))(par)  # (E, N, N)
        # only the E(E+1)/2 lower-triangle blocks are computed: with the
        # consistent orientation Q[e,f][i,j] = E[k_e(x,xi) k_f(x,xj)], the
        # upper triangle is exactly the point-axis transpose — for
        # rbf-student every avoided block is a multi-million-sample MC sweep
        # (the reference also loops j<=i, ``bqmod.py:1292-1296``, though it
        # mirrors untransposed; the transpose is the correct assembly)
        il, jl = np.tril_indices(self.dim_out)
        Q_low = jax.vmap(lambda p0, p1: self.kernel.exp_x_kxkx(p0, p1, x))(
            par[il], par[jl])                                                 # (P, N, N)
        n_pts = x.shape[-1]
        Q = jnp.zeros((self.dim_out, self.dim_out, n_pts, n_pts), dtype=Q_low.dtype)
        Q = Q.at[il, jl].set(Q_low)
        Q = Q.at[jl, il].set(jnp.swapaxes(Q_low, -1, -2))                     # (E, E, N, N)

        w_m = jnp.einsum("en,enm->me", q, iK)
        w_c = jnp.einsum("eni,efij,fjm->nmef", iK, Q, iK)
        if self.compat_mirror_wc:
            e_ge_f = (jnp.arange(self.dim_out)[:, None]
                      >= jnp.arange(self.dim_out)[None, :])                   # (E, E)
            w_c = jnp.where(e_ge_f[None, None], w_c, jnp.swapaxes(w_c, 2, 3))
        w_c = 0.5 * (w_c + jnp.swapaxes(jnp.swapaxes(w_c, 0, 1), 2, 3))
        w_cc = jnp.einsum("edi,ein->dne", R, iK)

        return MOWeights(wm=w_m, Wc=w_c, Wcc=w_cc,
                         q=jnp.moveaxis(q, 0, -1),
                         Q=jnp.moveaxis(Q, (0, 1), (-2, -1)),
                         R=jnp.moveaxis(R, 0, -1),
                         iK=jnp.moveaxis(iK, 0, -1))

    def optimize(self, log_par_0, fcn_obs, x_obs, method="BFGS", **kwargs):
        """Per-output NLML optimization (``bqmod.py:1317-1372``)."""
        results = []
        log_par_0 = np.atleast_2d(np.asarray(log_par_0, dtype=float))
        fcn_obs = np.asarray(fcn_obs)
        for d in range(self.dim_out):
            r = super().optimize(log_par_0[d], fcn_obs[d, :, None], x_obs,
                                 method=method, **kwargs)
            results.append(r)
        par = np.vstack([r.x for r in results])
        return par, results


class GaussianProcessMO(MultiOutputModel):
    """Multi-output GP model (``bqmod.py:1481-1608``)."""

    def exp_model_variance(self, weights: MOWeights, fcn_obs=None):
        """Per-output EMV (``bqmod.py:1532-1537``)."""
        return mo_gp_emv(self.kernel.scale, weights.Q, weights.iK)

    def integral_variance(self, fcn_obs=None, par=None):
        """(``bqmod.py:1539-1548``)"""
        par = self.kernel.get_parameters(par)
        x = self.points

        def one(p):
            q = self.kernel.exp_x_kx(p, x)
            iK = self.kernel.eval_inv_dot(p, x, scaling=False)
            return self.kernel.exp_xy_kxy(p) - q @ iK @ q

        return jax.vmap(one)(par)

    def neg_log_marginal_likelihood(self, log_par, fcn_obs, x_obs, jitter):
        """Single-output term of the MO NLML (``bqmod.py:1550-1608``)."""
        par = jnp.exp(log_par)
        num_data = x_obs.shape[1]
        K = self.kernel.eval(par, x_obs) + jitter
        L = jnp.linalg.cholesky(K)
        a = jax.scipy.linalg.cho_solve((L, True), fcn_obs)
        y_dot_a = jnp.sum(fcn_obs * a)
        return jnp.sum(jnp.log(jnp.diag(L))) + 0.5 * (y_dot_a + num_data * jnp.log(2.0 * jnp.pi))

    def predict(self, *args, **kwargs):
        raise NotImplementedError(
            "MO predict unimplemented (parity: bqmod.py:1509-1530)")


class StudentTProcessMO(MultiOutputModel):
    """Multi-output Student-t process model (``bqmod.py:1611-1720``)."""

    nu: float = struct.field(pytree_node=False, default=3.0)

    @classmethod
    def create(cls, dim_in, dim_out, kern_par, kern_str="rbf", point_str="ut",
               point_par=None, estimate_par=False, nu=3.0, dtype=None, **kern_kwargs):
        kernel, points = cls._build_parts(dim_in, kern_par, kern_str, point_str, point_par,
                                          dtype, **kern_kwargs)
        return cls(kernel=kernel, points=points, dim_in=dim_in, num_pts=points.shape[1],
                   str_pts=point_str, estimate_par=estimate_par, dim_out=dim_out, nu=float(nu))

    def exp_model_variance(self, weights: MOWeights, fcn_obs):
        """Data-scaled per-output EMV (``bqmod.py:1643-1663``)."""
        return mo_tp_emv(self.kernel.scale, self.nu, self.num_pts,
                         weights.Q, weights.iK, fcn_obs)

    def integral_variance(self, fcn_obs=None, par=None):
        return None  # parity: unimplemented (``bqmod.py:1665-1666``)

    def neg_log_marginal_likelihood(self, log_par, fcn_obs, x_obs, jitter):
        """Single-output Student NLML term (``bqmod.py:1668-1720``)."""
        from jax.scipy.special import gammaln
        par = jnp.exp(log_par)
        num_data = x_obs.shape[1]
        nu = self.nu
        K = self.kernel.eval(par, x_obs) + jitter
        L = jnp.linalg.cholesky(K)
        a = jax.scipy.linalg.cho_solve((L, True), fcn_obs)
        y_dot_a = jnp.sum(fcn_obs * a)
        half_logdet_K = jnp.sum(jnp.log(jnp.diag(L)))
        const = (0.5 * num_data * jnp.log((nu - 2.0) * jnp.pi)
                 + gammaln(0.5 * nu + num_data) - gammaln(0.5 * nu))
        return 0.5 * (nu + num_data) * jnp.log1p(y_dot_a) + half_logdet_K + const

    def predict(self, *args, **kwargs):
        raise NotImplementedError(
            "MO predict unimplemented (parity: bqmod.py:1509-1530)")
