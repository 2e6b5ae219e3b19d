"""Time-parallel Kalman filtering and smoothing via associative scans.

The filters' time recursion is inherently sequential for nonlinear models
(SURVEY §5.7), but for LINEAR-Gaussian state-space models the Kalman
recursions are associative and can run in O(log N) depth with
``jax.lax.associative_scan`` (Särkkä & García-Fernández, "Temporal
Parallelization of Bayesian Smoothers", IEEE TAC 2021).  This is a TPU-native
extension beyond the reference's capability set: instead of scaling only
across Monte-Carlo trajectories, a single long trajectory parallelizes across
the time axis — the right tool for low-latency post-processing of long
records.

Model: ``x_k = F x_{k-1} + q, q ~ N(0, Q)``; ``y_k = H x_k + r, r ~ N(0, R)``
with prior ``x_0 ~ N(m0, P0)`` and measurements ``y_1..y_N`` (same indexing
as :func:`ssmtoybox_tpu.ssinf.gaussian_filter`).

Filtering elements (a = (A, b, C, eta, J)) compose as

    A = A2 (I + C1 J2)^-1 A1
    b = A2 (I + C1 J2)^-1 (b1 + C1 eta2) + b2
    C = A2 (I + C1 J2)^-1 C1 A2^T + C2
    eta = A1^T (I + J2 C1)^-1 (eta2 - J2 b1) + eta1
    J = A1^T (I + J2 C1)^-1 J2 A1 + J1

and the filtered posterior at step k is ``N(b_k, C_k)`` after prepending the
prior element.  Smoothing elements (E, g, L) compose as

    E = E1 E2,  g = E1 g2 + g1,  L = E1 L2 E1^T + L1

run in reverse, giving ``N(g_k, L_k)``.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..utils.linalg import gen_solve, pd_solve_small, small_matmul, small_mm3, symmetrize

__all__ = ["parallel_linear_filter", "parallel_linear_smoother",
           "parallel_affine_filter", "parallel_affine_smoother"]


def _affine_filter_elements(Fs, bs, Qs, Hs, cs, Rs, m0, P0, ys):
    """Per-step filtering elements for a time-varying affine model
    (eqs. 10-12 of Särkkä & G-F 2021 with the affine offsets folded in):
    conditioned on ``x_{k-1}``, the posterior of ``x_k`` given ``y_k`` is
    ``N((I-KH)F x + b + K(y - c - H b), (I-KH)Q)``.
    """
    d = m0.shape[0]
    eye = jnp.eye(d, dtype=m0.dtype)

    def generic(F, bd, Q, H, c, R, y):
        yc = y - c - small_matmul(H, bd)
        S = small_mm3(H, Q, H.T) + R
        K = pd_solve_small(S, small_matmul(H, Q)).T
        A = small_matmul(eye - small_matmul(K, H), F)
        b = bd + small_matmul(K, yc)
        C = symmetrize(Q - small_mm3(K, H, Q))
        HF = small_matmul(H, F)
        eta = small_matmul(HF.T, pd_solve_small(S, yc))
        J = small_matmul(HF.T, pd_solve_small(S, HF))
        return A, b, C, eta, J

    A, b, C, eta, J = jax.vmap(generic)(Fs, bs, Qs, Hs, cs, Rs, ys)

    # first element conditions on the prior pushed through step 1's model
    m1 = small_matmul(Fs[0], m0) + bs[0]
    P1 = symmetrize(small_mm3(Fs[0], P0, Fs[0].T) + Qs[0])
    S1 = small_mm3(Hs[0], P1, Hs[0].T) + Rs[0]
    K1 = pd_solve_small(S1, small_matmul(Hs[0], P1)).T
    b0 = m1 + small_matmul(K1, ys[0] - cs[0] - small_matmul(Hs[0], m1))
    C0 = symmetrize(P1 - small_mm3(K1, Hs[0], P1))

    A = A.at[0].set(jnp.zeros((d, d), dtype=m0.dtype))
    b = b.at[0].set(b0)
    C = C.at[0].set(C0)
    eta = eta.at[0].set(jnp.zeros((d,), dtype=m0.dtype))
    J = J.at[0].set(jnp.zeros((d, d), dtype=m0.dtype))
    return A, b, C, eta, J


def _combine_filter(elem1, elem2):
    """Associative filtering-element composition (eq. 9)."""
    A1, b1, C1, eta1, J1 = elem1
    A2, b2, C2, eta2, J2 = elem2
    d = A1.shape[-1]
    eye = jnp.eye(d, dtype=A1.dtype)

    # (I + C1 J2)^-1 — general (non-symmetric) solve, unrolled Gauss-Jordan
    M = jax.vmap(gen_solve)(eye + small_matmul(C1, J2), jnp.broadcast_to(eye, A1.shape))
    A2M = small_matmul(A2, M)
    A = small_matmul(A2M, A1)
    b = small_matmul(A2M, b1 + small_matmul(C1, eta2)) + b2
    C = small_mm3(A2M, C1, jnp.swapaxes(A2, -1, -2)) + C2

    Mt = jax.vmap(gen_solve)(eye + small_matmul(J2, C1), jnp.broadcast_to(eye, A1.shape))
    A1tMt = small_matmul(jnp.swapaxes(A1, -1, -2), Mt)
    eta = small_matmul(A1tMt, eta2 - small_matmul(J2, b1)) + eta1
    J = small_mm3(A1tMt, J2, A1) + J1
    return A, b, C, eta, J


def parallel_affine_filter(Fs, bs, Qs, Hs, cs, Rs, m0, P0, data) -> Tuple[jax.Array, jax.Array]:
    """Kalman-filter a time-varying affine model in O(log N) parallel depth.

    ``Fs (N,D,D), bs (N,D), Qs (N,D,D)`` define ``x_k = F_k x_{k-1} + b_k + q_k``
    (element ``k`` predicts step ``k`` from ``k-1``); ``Hs (N,E,D), cs (N,E),
    Rs (N,E,E)`` define ``y_k = H_k x_k + c_k + r_k``; ``data`` is (E, N).
    Returns ``(fi_mean (D,N), fi_cov (D,D,N))`` — identical (to rounding) to
    the sequential filter.
    """
    ys = jnp.asarray(data).T
    elems = _affine_filter_elements(Fs, bs, Qs, Hs, cs, Rs,
                                    jnp.asarray(m0), jnp.asarray(P0), ys)
    A, b, C, eta, J = jax.lax.associative_scan(_combine_filter, elems)
    return jnp.moveaxis(b, 0, -1), jnp.moveaxis(jax.vmap(symmetrize)(C), 0, -1)


def parallel_linear_filter(F, Q, H, R, m0, P0, data) -> Tuple[jax.Array, jax.Array]:
    """Kalman-filter a linear-Gaussian model in O(log N) parallel depth.

    Parameters follow the module docstring; ``data`` is (dim_y, N).
    Returns ``(fi_mean (D, N), fi_cov (D, D, N))`` — identical (to rounding)
    to the sequential filter.  Thin wrapper: the constant-coefficient,
    zero-offset special case of :func:`parallel_affine_filter`.
    """
    data = jnp.asarray(data)
    n = data.shape[-1]
    F, Q, H, R = map(jnp.asarray, (F, Q, H, R))
    rep = lambda a: jnp.broadcast_to(a, (n,) + a.shape)
    zero_c = jnp.zeros((n, H.shape[0]), dtype=F.dtype)
    zero_b = jnp.zeros((n, F.shape[0]), dtype=F.dtype)
    return parallel_affine_filter(rep(F), zero_b, rep(Q), rep(H), zero_c, rep(R),
                                  m0, P0, data)


def _combine_smoother(elem2, elem1):
    """Associative smoothing-element composition (reverse direction)."""
    E1, g1, L1 = elem1
    E2, g2, L2 = elem2
    E = small_matmul(E1, E2)
    g = small_matmul(E1, g2) + g1
    L = small_mm3(E1, L2, jnp.swapaxes(E1, -1, -2)) + L1
    return E, g, L


def _affine_smoother_elements(Fs, bs, Qs, m, P):
    """Per-step RTS smoothing elements ``(E, g, L)`` for filtered moments
    ``m (N, D)``, ``P (N, D, D)``; the last step keeps its filtered moments
    (shared by the unsharded and mesh-sharded scans)."""
    def element(F, bd, Q, mk, Pk):
        Pp = symmetrize(small_mm3(F, Pk, F.T) + Q)         # predictive at k+1
        G = pd_solve_small(Pp, small_matmul(F, Pk)).T      # smoother gain
        g = mk - small_matmul(G, small_matmul(F, mk) + bd)
        L = symmetrize(Pk - small_mm3(G, Pp, G.T))
        return G, g, L

    # elements for steps 0..N-2; the last step keeps its filtered moments
    E, g, L = jax.vmap(element)(Fs[1:], bs[1:], Qs[1:], m[:-1], P[:-1])
    E = jnp.concatenate([E, jnp.zeros_like(Fs[:1])], axis=0)
    g = jnp.concatenate([g, m[-1:]], axis=0)
    L = jnp.concatenate([L, P[-1:]], axis=0)
    return E, g, L


def parallel_affine_smoother(Fs, bs, Qs, fi_mean, fi_cov) -> Tuple[jax.Array, jax.Array]:
    """RTS-smooth the affine parallel filter output in O(log N) depth.

    ``Fs/bs/Qs`` use the same indexing as :func:`parallel_affine_filter`
    (element ``k`` maps step ``k-1`` to ``k``), so the smoothing element at
    step ``k`` uses the dynamics into ``k+1``.  Textbook RTS — every step
    smoothed from the final filtered estimate.
    """
    m = jnp.moveaxis(jnp.asarray(fi_mean), -1, 0)          # (N, D)
    P = jnp.moveaxis(jnp.asarray(fi_cov), -1, 0)           # (N, D, D)
    E, g, L = _affine_smoother_elements(Fs, bs, Qs, m, P)
    E_s, g_s, L_s = jax.lax.associative_scan(_combine_smoother, (E, g, L), reverse=True)
    return jnp.moveaxis(g_s, 0, -1), jnp.moveaxis(jax.vmap(symmetrize)(L_s), 0, -1)


def parallel_linear_smoother(F, Q, fi_mean, fi_cov) -> Tuple[jax.Array, jax.Array]:
    """RTS-smooth the parallel filter output in O(log N) parallel depth.

    ``fi_mean``/``fi_cov`` are the (D, N)/(D, D, N) outputs of
    :func:`parallel_linear_filter`.  Thin wrapper over
    :func:`parallel_affine_smoother` with constant coefficients.
    """
    F = jnp.asarray(F)
    Q = jnp.asarray(Q)
    n = jnp.asarray(fi_mean).shape[-1]
    rep = lambda a: jnp.broadcast_to(a, (n,) + a.shape)
    zero_b = jnp.zeros((n, F.shape[0]), dtype=F.dtype)
    return parallel_affine_smoother(rep(F), zero_b, rep(Q), fi_mean, fi_cov)
