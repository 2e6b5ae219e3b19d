"""Time-parallel SQUARE-ROOT Kalman filtering/smoothing via associative scans.

Combines the framework's two TPU-native extensions beyond the reference's
capability set (the reference scales the time recursion only by looping,
``ssinf.py:101-111``, and keeps full covariances, ``ssinf.py:254-344``):

* the associative-scan time-parallel Kalman recursions of
  :mod:`ssmtoybox_tpu.parallel.timescan` (Särkkä & García-Fernández, IEEE TAC
  2021) — O(log N) parallel depth on the time axis, and
* the Cholesky-factor (square-root) recursion of :mod:`ssmtoybox_tpu.sqrt` —
  PD by construction, which is what makes **float32** (the TPU's native fast
  path: MXU/VPU are f32, f64 is emulated) usable on ill-conditioned models.

The combination is the square-root analogue of the parallel filter/smoother
(cf. Yaghoobi, Corenflos, Hassan & Särkkä, "Parallel square-root solutions
for Bayesian smoothers", IEEE TSP 2022): every covariance in the scan
elements is carried as a lower-triangular factor and every combine step is a
batched QR triangularization — no covariance is ever formed, so conditioning
is never squared.

Algebra (derivation, used instead of forming ``C = U Uᵀ``/``J = Z Zᵀ``): the
full-covariance filtering-element combine needs ``M C1`` and ``N J2`` with
``M = (I + C1 J2)⁻¹``, ``N = (I + J2 C1)⁻¹``.  With ``V = U1ᵀ Z2`` the
push-through identity gives

    M C1 = U1 (I + V Vᵀ)⁻¹ U1ᵀ,      N J2 = Z2 (I + Vᵀ V)⁻¹ Z2ᵀ,

so with Cholesky factors ``L_V L_Vᵀ = I + V Vᵀ`` and ``L_W L_Wᵀ = I + Vᵀ V``
(both computed as one QR each, ``tria([V, I])`` / ``tria([Vᵀ, I])``), the
factor updates are pure column-stacking QRs:

    U = tria([A2 U1 L_V⁻ᵀ, U2]),      Z = tria([A1ᵀ Z2 L_W⁻ᵀ, Z1]),

and the mean/information vectors use ``M = I − U1 V W⁻¹ Z2ᵀ`` and
``N = I − Z2 W⁻¹ Vᵀ U1ᵀ`` (Woodbury), i.e. only triangular solves against
``L_W`` whose diagonal is ≥ 1 — unconditionally stable.

All per-step work is batched over the time axis (``vmap``/QR batching); the
tiny matrix products route through the unrolled ``small_matmul`` kernels
(f64 TPU gap, see ``utils/linalg.py``) so the f64 parity configuration stays
fast too.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..utils.linalg import small_matmul, tri_solve_small, tria

__all__ = ["parallel_affine_sqrt_filter", "parallel_affine_sqrt_smoother",
           "parallel_linear_sqrt_filter", "parallel_linear_sqrt_smoother"]


def _blocked_associative_scan(fn, elems, identity, block_len: int,
                              reverse: bool = False):
    """Scan-of-associative-scans with bounded temporaries.

    ``jax.lax.associative_scan`` keeps O(N) intermediate element arrays live
    per tree level, which tops out the scoped vmem near 100k-step records for
    the square-root combines (docs/performance.md).  This helper computes the
    identical prefix (or suffix) compositions by scanning fixed-size blocks:
    an in-block ``associative_scan`` (temporaries bounded by ``block_len``)
    inside a sequential ``lax.scan`` whose carry is the running composition
    of all finished blocks, applied to each in-block prefix with one extra
    combine.  ``identity`` must be a two-sided identity element of ``fn``
    (used as the initial carry and as tail padding).
    """
    if reverse:
        # exactly lax.associative_scan's reverse=True semantics: flip, scan
        # forward with the SAME fn (argument order untouched — the smoother
        # combine already encodes the flipped convention), flip back
        flip = lambda t: jax.tree_util.tree_map(lambda x: jnp.flip(x, 0), t)
        return flip(_blocked_associative_scan(fn, flip(elems), identity,
                                              block_len))

    n = jax.tree_util.tree_leaves(elems)[0].shape[0]
    num_blocks = -(-n // block_len)
    pad = num_blocks * block_len - n
    if pad:
        elems = jax.tree_util.tree_map(
            lambda x, idl: jnp.concatenate(
                [x, jnp.broadcast_to(idl, (pad,) + idl.shape)], axis=0),
            elems, identity)
    blocks = jax.tree_util.tree_map(
        lambda x: x.reshape((num_blocks, block_len) + x.shape[1:]), elems)

    def step(carry, blk):
        scanned = jax.lax.associative_scan(fn, blk)
        out = jax.vmap(fn, in_axes=(None, 0))(carry, scanned)
        new_carry = jax.tree_util.tree_map(lambda x: x[-1], out)
        return new_carry, out

    _, outs = jax.lax.scan(step, identity, blocks)
    return jax.tree_util.tree_map(
        lambda x: x.reshape((num_blocks * block_len,) + x.shape[2:])[:n], outs)


def _filter_identity(d: int, dtype):
    """Two-sided identity of :func:`_combine_sqrt_filter`:
    ``x -> I x + 0`` with zero covariance and zero information."""
    return (jnp.eye(d, dtype=dtype), jnp.zeros((d,), dtype),
            jnp.zeros((d, d), dtype), jnp.zeros((d,), dtype),
            jnp.zeros((d, d), dtype))


def _smoother_identity(d: int, dtype):
    """Two-sided identity of :func:`_combine_sqrt_smoother`."""
    return (jnp.eye(d, dtype=dtype), jnp.zeros((d,), dtype),
            jnp.zeros((d, d), dtype))


def _tria_pad(cols: jax.Array) -> jax.Array:
    """:func:`tria` tolerant of fewer columns than rows (rank-deficient
    Grams, e.g. low-rank process noise ``G Q Gᵀ``): zero-pads the column
    block so the QR is square — the Gram, hence the factor, is unchanged."""
    rows, m = cols.shape[-2], cols.shape[-1]
    if m < rows:
        pad = jnp.zeros(cols.shape[:-1] + (rows - m,), cols.dtype)
        cols = jnp.concatenate([cols, pad], axis=-1)
    return tria(cols)


def _square_cols(Zm: jax.Array, d: int) -> jax.Array:
    """Normalize a (..., D, E) factor to (..., D, D) columns: zero-pad when
    E < D (Gram unchanged), triangularize when E > D."""
    e = Zm.shape[-1]
    if e == d:
        return Zm
    if e < d:
        pad = jnp.zeros(Zm.shape[:-1] + (d - e,), Zm.dtype)
        return jnp.concatenate([Zm, pad], axis=-1)
    return tria(Zm)


def _sqrt_filter_elements(Fs, bs, SQs, Hs, cs, SRs, m0, S0, ys):
    """Per-step square-root filtering elements ``(A, b, U, eta, Z)`` with
    ``C = U Uᵀ`` and ``J = Z Zᵀ`` (factor form of the full-covariance
    elements in ``timescan._affine_filter_elements``)."""
    d = m0.shape[0]
    e = ys.shape[-1]
    eye = jnp.eye(d, dtype=m0.dtype)

    def generic(F, bd, SQ, H, c, SR, y):
        # Psi = tria([[H SQ, SR], [SQ, 0]]):  Psi11 = sqrt(H Q Hᵀ + R),
        # Psi21 = Q Hᵀ Psi11⁻ᵀ,  Psi22 = sqrt((I − K H) Q)
        hsq = small_matmul(H, SQ)
        zeros = jnp.zeros((d, SR.shape[-1]), dtype=m0.dtype)
        top = jnp.concatenate([hsq, SR], axis=-1)
        bot = jnp.concatenate([SQ, zeros], axis=-1)
        Psi = _tria_pad(jnp.concatenate([top, bot], axis=-2))
        Psi11 = Psi[:e, :e]
        Psi21 = Psi[e:, :e]
        U = Psi[e:, e:]
        # K = Psi21 Psi11⁻¹ (triangular)
        K = jnp.swapaxes(tri_solve_small(
            jnp.swapaxes(Psi11, -1, -2), jnp.swapaxes(Psi21, -1, -2),
            lower=False), -1, -2)
        A = small_matmul(eye - small_matmul(K, H), F)
        z = y - c - small_matmul(H, bd)
        b = bd + small_matmul(K, z)
        HF = small_matmul(H, F)
        # eta = (H F)ᵀ S⁻¹ z and Z = (H F)ᵀ Psi11⁻ᵀ, so J = Z Zᵀ
        Zm = jnp.swapaxes(tri_solve_small(Psi11, HF, lower=True), -1, -2)
        eta = small_matmul(Zm, tri_solve_small(Psi11, z, lower=True))
        return A, b, U, eta, _square_cols(Zm, d)

    A, b, U, eta, Z = jax.vmap(generic)(Fs, bs, SQs, Hs, cs, SRs, ys)

    # first element conditions on the prior pushed through step 1's model
    m1 = small_matmul(Fs[0], m0) + bs[0]
    SP1 = _tria_pad(jnp.concatenate([small_matmul(Fs[0], S0), SQs[0]], axis=-1))
    hsp = small_matmul(Hs[0], SP1)
    top = jnp.concatenate([hsp, SRs[0]], axis=-1)
    bot = jnp.concatenate([SP1, jnp.zeros((d, SRs.shape[-1]), dtype=m0.dtype)],
                          axis=-1)
    Psi = _tria_pad(jnp.concatenate([top, bot], axis=-2))
    Psi11, Psi21, U0 = Psi[:e, :e], Psi[e:, :e], Psi[e:, e:]
    K1 = jnp.swapaxes(tri_solve_small(
        jnp.swapaxes(Psi11, -1, -2), jnp.swapaxes(Psi21, -1, -2),
        lower=False), -1, -2)
    b0 = m1 + small_matmul(K1, ys[0] - cs[0] - small_matmul(Hs[0], m1))

    A = A.at[0].set(jnp.zeros((d, d), dtype=m0.dtype))
    b = b.at[0].set(b0)
    U = U.at[0].set(U0)
    eta = eta.at[0].set(jnp.zeros((d,), dtype=m0.dtype))
    Z = Z.at[0].set(jnp.zeros((d, d), dtype=m0.dtype))
    return A, b, U, eta, Z


def _combine_sqrt_filter(elem1, elem2):
    """Associative square-root filtering-element composition (all factor
    updates are QRs; all solves are against unit-or-larger diagonals)."""
    A1, b1, U1, eta1, Z1 = elem1
    A2, b2, U2, eta2, Z2 = elem2
    d = A1.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(d, dtype=A1.dtype), A1.shape)

    V = small_matmul(jnp.swapaxes(U1, -1, -2), Z2)                 # U1ᵀ Z2
    LV = tria(jnp.concatenate([V, eye], axis=-1))                  # chol(I + V Vᵀ)
    LW = tria(jnp.concatenate([jnp.swapaxes(V, -1, -2), eye], axis=-1))

    # covariance factor: U = tria([A2 U1 LV⁻ᵀ, U2])
    A2U1 = small_matmul(A2, U1)
    X = tri_solve_small(LV, jnp.swapaxes(A2U1, -1, -2), lower=True)  # LV⁻¹ (A2 U1)ᵀ
    U = tria(jnp.concatenate([jnp.swapaxes(X, -1, -2), U2], axis=-1))

    # information factor: Z = tria([A1ᵀ Z2 LW⁻ᵀ, Z1])
    A1tZ2 = small_matmul(jnp.swapaxes(A1, -1, -2), Z2)
    Y = tri_solve_small(LW, jnp.swapaxes(A1tZ2, -1, -2), lower=True)
    Z = tria(jnp.concatenate([jnp.swapaxes(Y, -1, -2), Z1], axis=-1))

    def w_solve(rhs):
        """(I + Vᵀ V)⁻¹ rhs via the two triangular substitutions."""
        return tri_solve_small(jnp.swapaxes(LW, -1, -2),
                               tri_solve_small(LW, rhs, lower=True), lower=False)

    # A = A2 M A1, b = A2 M (b1 + C1 eta2) + b2, M = I − U1 V W⁻¹ Z2ᵀ
    b1c = b1 + small_matmul(U1, small_matmul(jnp.swapaxes(U1, -1, -2), eta2))
    TG = small_matmul(A2U1, jnp.swapaxes(w_solve(jnp.swapaxes(V, -1, -2)), -1, -2))
    Z2t = jnp.swapaxes(Z2, -1, -2)
    A = small_matmul(A2, A1) - small_matmul(TG, small_matmul(Z2t, A1))
    b = small_matmul(A2, b1c) - small_matmul(TG, small_matmul(Z2t, b1c)) + b2

    # eta = A1ᵀ N (eta2 − J2 b1) + eta1, N = I − Z2 W⁻¹ Vᵀ U1ᵀ
    dvec = eta2 - small_matmul(Z2, small_matmul(Z2t, b1))
    corr = w_solve(small_matmul(jnp.swapaxes(V, -1, -2),
                                small_matmul(jnp.swapaxes(U1, -1, -2), dvec)))
    eta = (small_matmul(jnp.swapaxes(A1, -1, -2), dvec)
           - small_matmul(A1tZ2, corr) + eta1)
    return A, b, U, eta, Z


def parallel_affine_sqrt_filter(Fs, bs, SQs, Hs, cs, SRs, m0, S0, data,
                                scan_block_len: int | None = None
                                ) -> Tuple[jax.Array, jax.Array]:
    """Square-root Kalman filter for a time-varying affine model in O(log N)
    parallel depth.

    Same model/indexing as
    :func:`~ssmtoybox_tpu.parallel.timescan.parallel_affine_filter`, but all
    covariances enter and leave as lower Cholesky factors: ``SQs (N, D, Mq)``
    and ``SRs (N, E, Mr)`` are noise-covariance factor COLUMNS — any column
    count works, square Cholesky factors, thin gain-scaled factors
    (``Mq < D``) and stacked multi-source columns alike; ``S0`` is the prior
    factor.
    Returns ``(fi_mean (D, N), fi_sqrt (D, D, N))`` with
    ``fi_sqrt[..., k] fi_sqrt[..., k]ᵀ`` equal (to rounding) to the
    sequential filtered covariance — and PD by construction in f32.

    ``scan_block_len`` bounds the associative scan's live temporaries (the
    ~100k-step vmem ceiling) by running it as a scan-of-scans; results are
    identical.  65536 handles 1M-step f32 records on one v5e chip.
    """
    ys = jnp.asarray(data).T
    elems = _sqrt_filter_elements(Fs, bs, SQs, Hs, cs, SRs,
                                  jnp.asarray(m0), jnp.asarray(S0), ys)
    if scan_block_len:
        d = jnp.asarray(m0).shape[0]
        _, b, U, _, _ = _blocked_associative_scan(
            _combine_sqrt_filter, elems, _filter_identity(d, elems[0].dtype),
            int(scan_block_len))
    else:
        _, b, U, _, _ = jax.lax.associative_scan(_combine_sqrt_filter, elems)
    return jnp.moveaxis(b, 0, -1), jnp.moveaxis(U, 0, -1)


def parallel_linear_sqrt_filter(F, SQ, H, SR, m0, S0, data,
                                scan_block_len: int | None = None
                                ) -> Tuple[jax.Array, jax.Array]:
    """Constant-coefficient wrapper over :func:`parallel_affine_sqrt_filter`."""
    data = jnp.asarray(data)
    n = data.shape[-1]
    F, SQ, H, SR = map(jnp.asarray, (F, SQ, H, SR))
    rep = lambda a: jnp.broadcast_to(a, (n,) + a.shape)
    zero_b = jnp.zeros((n, F.shape[0]), dtype=F.dtype)
    zero_c = jnp.zeros((n, H.shape[0]), dtype=F.dtype)
    return parallel_affine_sqrt_filter(rep(F), zero_b, rep(SQ), rep(H), zero_c,
                                       rep(SR), m0, S0, data,
                                       scan_block_len=scan_block_len)


def _combine_sqrt_smoother(elem2, elem1):
    """Associative square-root smoothing composition (reverse direction):
    ``E = E1 E2``, ``g = E1 g2 + g1``, ``D = tria([E1 D2, D1])``."""
    E1, g1, D1 = elem1
    E2, g2, D2 = elem2
    E = small_matmul(E1, E2)
    g = small_matmul(E1, g2) + g1
    D = tria(jnp.concatenate([small_matmul(E1, D2), D1], axis=-1))
    return E, g, D


def _sqrt_smoother_elements(Fs, bs, SQs, m, S):
    """Per-step square-root RTS smoothing elements ``(E, g, D)`` for
    filtered moments ``m (N, D)`` and factors ``S (N, D, D)``; the last step
    keeps its filtered moments (shared by the unsharded and mesh-sharded
    scans)."""
    d = S.shape[-1]

    def element(F, bd, SQ, mk, Sk):
        top = jnp.concatenate([small_matmul(F, Sk), SQ], axis=-1)
        bot = jnp.concatenate([Sk, jnp.zeros_like(SQ)], axis=-1)
        L = _tria_pad(jnp.concatenate([top, bot], axis=-2))
        L11, L21, L22 = L[:d, :d], L[d:, :d], L[d:, d:]
        # G = L21 L11⁻¹  via  L11ᵀ Gᵀ = L21ᵀ
        G = jnp.swapaxes(tri_solve_small(
            jnp.swapaxes(L11, -1, -2), jnp.swapaxes(L21, -1, -2),
            lower=False), -1, -2)
        g = mk - small_matmul(G, small_matmul(F, mk) + bd)
        return G, g, L22

    # elements for steps 0..N-2; the last step keeps its filtered moments
    E, g, D = jax.vmap(element)(Fs[1:], bs[1:], SQs[1:], m[:-1], S[:-1])
    E = jnp.concatenate([E, jnp.zeros((1, d, d), dtype=S.dtype)], axis=0)
    g = jnp.concatenate([g, m[-1:]], axis=0)
    D = jnp.concatenate([D, S[-1:]], axis=0)
    return E, g, D


def parallel_affine_sqrt_smoother(Fs, bs, SQs, fi_mean, fi_sqrt,
                                  scan_block_len: int | None = None
                                  ) -> Tuple[jax.Array, jax.Array]:
    """Square-root RTS smoothing of the parallel square-root filter output in
    O(log N) depth.

    Per-step elements come from ONE joint QR of the (predicted, filtered)
    deviations — the same block triangularization as the sequential
    square-root smoother (:func:`ssmtoybox_tpu.sqrt.make_sqrt_smoother`):

        tria([[F S_fi, S_Q], [S_fi, 0]]) = [[S_pr, 0], [L21, L22]]

    gives the gain ``G = L21 S_pr⁻¹`` and the conditional factor
    ``L22 = sqrt(P_fi − G P_pr Gᵀ)`` without forming a covariance.  Returns
    ``(sm_mean (D, N), sm_sqrt (D, D, N))``.
    """
    m = jnp.moveaxis(jnp.asarray(fi_mean), -1, 0)          # (N, D)
    S = jnp.moveaxis(jnp.asarray(fi_sqrt), -1, 0)          # (N, D, D)
    d = S.shape[-1]
    E, g, D = _sqrt_smoother_elements(Fs, bs, SQs, m, S)

    if scan_block_len:
        E_s, g_s, D_s = _blocked_associative_scan(
            _combine_sqrt_smoother, (E, g, D), _smoother_identity(d, S.dtype),
            int(scan_block_len), reverse=True)
    else:
        E_s, g_s, D_s = jax.lax.associative_scan(_combine_sqrt_smoother,
                                                 (E, g, D), reverse=True)
    return jnp.moveaxis(g_s, 0, -1), jnp.moveaxis(D_s, 0, -1)


def parallel_linear_sqrt_smoother(F, SQ, fi_mean, fi_sqrt,
                                  scan_block_len: int | None = None
                                  ) -> Tuple[jax.Array, jax.Array]:
    """Constant-coefficient wrapper over :func:`parallel_affine_sqrt_smoother`."""
    F = jnp.asarray(F)
    SQ = jnp.asarray(SQ)
    n = jnp.asarray(fi_mean).shape[-1]
    rep = lambda a: jnp.broadcast_to(a, (n,) + a.shape)
    zero_b = jnp.zeros((n, F.shape[0]), dtype=F.dtype)
    return parallel_affine_sqrt_smoother(rep(F), zero_b, rep(SQ), fi_mean,
                                         fi_sqrt, scan_block_len=scan_block_len)
