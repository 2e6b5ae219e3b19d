"""Pallas TPU kernels for the framework's hot compute paths.

Three kernels, chosen by profiling the reference's cost structure (SURVEY §3.3):

1. :func:`student_expectations` — THE expensive init path: the RBF-Student
   kernel expectations behind TPQ weights are Monte-Carlo averages over ~2e6
   samples (``bqkern.py:457-536``; the reference loops 1000 NumPy batches).
   The fused kernel streams sample chunks HBM->VMEM and accumulates all three
   expectations

       q = E[k(x, x_n)],  R = E[x k(x, x_n)],  Q = E[k(x, x_i) k(x, x_j)]

   in one pass: the (chunk, N) Gram tile never leaves VMEM, and the three
   reductions are MXU matmuls against it.  The jnp scan path materializes the
   Gram tile per batch in HBM three times (and pays emulated f64 per step —
   measured 98x slower on one chip).

2. :func:`student_kxy` — the pairwise ``E[k(x, y)]`` integral-variance term:
   one (chunk, chunk) f32 MXU Gram per grid step, all off-diagonal pairs.

3. :func:`vandermonde` — the reference's single natively-accelerated function
   (Numba-JIT, ``utils.py:478-502``); here a static-unrolled VPU kernel over
   the (compile-time) multi-index.

Pallas TPU compute is float32 (Mosaic has no f64 VPU/MXU path); the kernels
run in f32.  ``vandermonde`` therefore RETURNS f32 (~1e-7 relative accuracy
— monomials of irrational sigma-point coordinates are not exactly
representable; the exact-f64 :func:`ssmtoybox_tpu.utils.combin.vandermonde`
is what BSQ weight solves use).  The Student MC kernels emit PER-CHUNK f32 partial
sums that are reduced in f64 outside the kernel: per-chunk rounding averages
out across chunks, whereas in-kernel f32 accumulation would quantize the
final expectations at ~1e-7 relative.  This keeps the RAW expectations at
Monte-Carlo-noise accuracy (validated on hardware by
tools/validate_pallas.py) — but raw expectations of ANY precision are not
weight-grade on ill-conditioned kernel parameters, where the BQ weight
solve amplifies unstructured error by ``1/lambda_min(K)^2`` (~1e16 on the
FUSION-2017 Student-study parameters).  The weight path therefore never
composes ``iK Q iK`` from these outputs; it accumulates directly in weight
space (``RBFStudent.projected_weight_stats``).  Off-TPU the same kernels
run in interpret mode.  :func:`student_expectations` is DIFFERENTIABLE
(``jax.custom_vjp`` w.r.t. the kernel parameters and sigma-points): the
expectation gradients are MC averages over the same sample stream, so the
backward pass is a second fused kernel replaying the saved samples
(:func:`_student_qRQ_bwd_kernel`) under the same per-chunk-f32/f64-reduce
precision contract.  :func:`student_kxy` carries the analogous VJP for the
lengthscales (:func:`_student_kxy_bwd_kernel`), so the whole rbf-student
expectation surface is differentiable on the Pallas path.
"""
from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.rand import multivariate_t

__all__ = ["student_expectations", "student_kxy", "vandermonde"]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Fused RBF-Student Monte-Carlo expectations
# ---------------------------------------------------------------------------

def _student_exp_kernel(inv_l_ref, xs_ref, xp_ref, q_ref, r_ref, Q_ref):
    """One grid step: reduce a (C, Dp) sample chunk to per-chunk q/R/Q
    partial sums.

    All operands live in VMEM; the Gram tile ``k`` exists only as a register/
    VMEM intermediate.  Each grid step writes ITS OWN output block (no
    in-kernel accumulation across chunks): the cross-chunk reduction happens
    outside in f64.  Accumulating across chunks in f32 here would quantize
    the ~``total``-magnitude running sums at ~1e-7 relative — uncorrelated
    noise per entry that an ill-conditioned BQ weight solve (lengthscales >>
    point spread give Gram matrices with lambda_min ~ 1e-7) amplifies into
    O(1) weight errors, where the correlated f64 Monte-Carlo error cancels.
    Per-chunk partials quantize at chunk magnitude instead, keeping the final
    f64-summed expectations at MC-noise accuracy.
    """
    xs = xs_ref[:]                                   # (C, Dp) raw samples
    xp = xp_ref[:]                                   # (Np, Dp) raw points
    inv_l = inv_l_ref[:]                             # (1, Dp); 0 in padded dims

    s = xs * inv_l
    p = xp * inv_l
    s2 = jnp.sum(s * s, axis=1, keepdims=True)       # (C, 1)
    p2 = jnp.sum(p * p, axis=1, keepdims=True).T     # (1, Np)
    # Gram tile on the MXU; padded points sit ~1e3 away -> exp(-big) == 0
    k = jnp.exp(-0.5 * (s2 + p2) + jnp.dot(s, p.T, preferred_element_type=jnp.float32))

    q_ref[0, 0, :] = jnp.sum(k, axis=0)                                    # (Np,)
    r_ref[0, :, :] = jnp.dot(xs.T, k, preferred_element_type=jnp.float32)  # (Dp, Np)
    Q_ref[0, :, :] = jnp.dot(k.T, k, preferred_element_type=jnp.float32)   # (Np, Np)


def student_expectations(par, x, dof: float, num_samples: int = 2_000_000,
                         key=None, chunk: int = 4096,
                         interpret: bool | None = None) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused MC estimates of (q, R, Q) for the RBF-Student kernel.

    Drop-in accelerated equivalent of calling ``RBFStudent.exp_x_kx`` /
    ``exp_x_xkx`` / ``exp_x_kxkx`` separately (each re-sampling and re-
    evaluating the Gram matrix, ``bqkern.py:476-524``) — one sample stream,
    one Gram evaluation, three reductions.

    DIFFERENTIABLE: carries a ``jax.custom_vjp`` w.r.t. ``par`` (the
    lengthscales; the unscaled expectations do not depend on the scale
    ``par[0]``) and ``x``.  The parameter gradients of the three
    expectations are themselves MC averages over the SAME sample stream
    (the integrand is smooth in the parameters), so the backward pass is a
    second fused kernel replaying the saved samples — see
    :func:`_student_qRQ_bwd_kernel`.  The samples are treated as MC
    constants (no gradient flows into the PRNG key).

    Parameters
    ----------
    par : (1, D+1) kernel parameters ``[s, l_1..l_D]`` (expectations are
        computed unscaled, matching ``bq_weights``' ``scaling=False`` use).
    x : (D, N) sigma-points.
    dof : Student-t degrees of freedom of the weighting density.
    chunk : samples per grid step; the (chunk, 128)-padded Gram tile must fit
        the ~16 MB VMEM budget alongside the double-buffered sample stream,
        which bounds chunk at ~8k for small point counts (4096 is also the
        fastest setting measured on v5e).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if key is None:
        key = jax.random.PRNGKey(0)

    x = jnp.asarray(x)
    d, n = x.shape
    dp = _round_up(max(d, 1), 8)
    np_pad = _round_up(max(n, 1), 128)
    # a sample budget below one chunk would otherwise silently draw a full
    # chunk; shrink the chunk (8-aligned for the TPU tile) instead
    chunk = min(chunk, _round_up(max(num_samples, 8), 8))
    num_chunks = max(num_samples // chunk, 1)
    total = num_chunks * chunk

    # samples (f32): Student-t via the Gamma-mixture construction; MC
    # constants as far as autodiff is concerned
    samples = jax.lax.stop_gradient(
        multivariate_t(key, jnp.zeros(d, jnp.float32),
                       jnp.eye(d, dtype=jnp.float32), dof, (total,)))   # (S, D)
    return _student_qRQ(dp, np_pad, chunk, bool(interpret),
                        jnp.asarray(par), x, samples)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _student_qRQ(dp, np_pad, chunk, interpret, par, x, samples):
    """(q, R, Q) from a fixed sample stream; differentiable in par and x."""
    return _student_qRQ_fwd_impl(dp, np_pad, chunk, interpret, par, x, samples)


def _student_qRQ_fwd_impl(dp, np_pad, chunk, interpret, par, x, samples):
    ell = jnp.asarray(par).reshape(-1)[1:]
    d, n = x.shape
    in_dtype = x.dtype
    total = samples.shape[0]
    num_chunks = total // chunk

    xs = jnp.zeros((total, dp), jnp.float32).at[:, :d].set(samples)
    # points padded FAR away so padded columns contribute exactly zero
    xp = jnp.full((np_pad, dp), 1e3, jnp.float32).at[:n, :d].set(x.T.astype(jnp.float32))
    inv_l = jnp.zeros((1, dp), jnp.float32).at[0, :d].set(1.0 / ell.astype(jnp.float32))

    grid = (num_chunks,)
    # under jax_enable_x64 the grid index maps trace to i64, which Mosaic
    # cannot legalize ("func.return (i64, i64)"); the kernel is all-f32, so
    # trace it with x64 off
    with jax.enable_x64(False):
        q_c, r_c, Q_c = _student_pallas_call(grid, dp, np_pad, chunk, interpret,
                                             inv_l, xs, xp)

    # cross-chunk reduction in f64 (or the best the ambient mode allows) —
    # see the precision note in _student_exp_kernel
    acc_t = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    inv_total = 1.0 / total
    q_out = (jnp.sum(q_c.astype(acc_t), axis=0)[0, :n] * inv_total).astype(in_dtype)
    r_out = (jnp.sum(r_c.astype(acc_t), axis=0)[:d, :n] * inv_total).astype(in_dtype)
    Q_out = (jnp.sum(Q_c.astype(acc_t), axis=0)[:n, :n] * inv_total).astype(in_dtype)
    return q_out, r_out, Q_out


def _student_qRQ_fwd(dp, np_pad, chunk, interpret, par, x, samples):
    out = _student_qRQ_fwd_impl(dp, np_pad, chunk, interpret, par, x, samples)
    return out, (par, x, samples)


def _student_qRQ_bwd_kernel(inv_l_ref, xs_ref, xp_ref, gq_ref, gR_ref, gQ2_ref,
                            cs_ref, B_ref, u_ref):
    """One grid step of the VJP: re-evaluate the chunk's Gram tile, fold the
    output cotangents into a per-(sample, point) weight

        W[s, n] = gq[n] + sum_d gR[d, n] xs[s, d] + sum_m (gQ + gQ^T)[n, m] k[s, m]

    (the coefficient of ``dk[s, n]`` in ``<g, d(q, R, Q)>``), and reduce the
    weighted Gram ``M = W * k`` to the three per-chunk partials the host
    needs to assemble d/dx and d/dl of the RBF exponent
    ``-0.5 ||(x_s - x_n)/l||^2``:

        cs[n] = sum_s M[s, n]                (weight mass per point)
        B[d, n] = sum_s xs[s, d] M[s, n]     (first sample moment)
        u[d]   = sum_{s, n} xs[s, d]^2 M[s, n]  (second sample moment)

    Per-chunk f32 partials, reduced in f64 outside — the same precision
    contract as the forward (see :func:`_student_exp_kernel`).  ``u`` is
    broadcast across a 128-lane output block to satisfy the TPU tile shape.
    """
    xs = xs_ref[:]
    xp = xp_ref[:]
    inv_l = inv_l_ref[:]
    s = xs * inv_l
    p = xp * inv_l
    s2 = jnp.sum(s * s, axis=1, keepdims=True)
    p2 = jnp.sum(p * p, axis=1, keepdims=True).T
    k = jnp.exp(-0.5 * (s2 + p2) + jnp.dot(s, p.T, preferred_element_type=jnp.float32))
    W = (gq_ref[:]
         + jnp.dot(xs, gR_ref[:], preferred_element_type=jnp.float32)
         + jnp.dot(k, gQ2_ref[:], preferred_element_type=jnp.float32))
    M = W * k
    cs_ref[0, 0, :] = jnp.sum(M, axis=0)
    B_ref[0, :, :] = jnp.dot(xs.T, M, preferred_element_type=jnp.float32)
    rowsum = jnp.sum(M, axis=1, keepdims=True)                      # (C, 1)
    u = jnp.sum(xs * xs * rowsum, axis=0)                           # (Dp,)
    u_ref[0, :, :] = u[:, None] * jnp.ones((1, 128), jnp.float32)


def _student_qRQ_bwd(dp, np_pad, chunk, interpret, res, ct):
    par, x, samples = res
    gq, gR, gQ = ct
    d, n = x.shape
    total = samples.shape[0]
    num_chunks = total // chunk
    par_arr = jnp.asarray(par)
    ell = par_arr.reshape(-1)[1:]

    xs = jnp.zeros((total, dp), jnp.float32).at[:, :d].set(samples)
    xp = jnp.full((np_pad, dp), 1e3, jnp.float32).at[:n, :d].set(x.T.astype(jnp.float32))
    inv_l = jnp.zeros((1, dp), jnp.float32).at[0, :d].set(1.0 / ell.astype(jnp.float32))
    gq_p = jnp.zeros((1, np_pad), jnp.float32).at[0, :n].set(gq.astype(jnp.float32))
    gR_p = jnp.zeros((dp, np_pad), jnp.float32).at[:d, :n].set(gR.astype(jnp.float32))
    gQ2 = gQ + gQ.T
    gQ2_p = jnp.zeros((np_pad, np_pad), jnp.float32).at[:n, :n].set(gQ2.astype(jnp.float32))

    with jax.enable_x64(False):
        cs_c, B_c, u_c = pl.pallas_call(
            _student_qRQ_bwd_kernel,
            grid=(num_chunks,),
            in_specs=[
                pl.BlockSpec((1, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((np_pad, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, np_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((dp, np_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((np_pad, np_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, np_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, dp, np_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, dp, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((num_chunks, 1, np_pad), jnp.float32),
                jax.ShapeDtypeStruct((num_chunks, dp, np_pad), jnp.float32),
                jax.ShapeDtypeStruct((num_chunks, dp, 128), jnp.float32),
            ),
            interpret=interpret,
        )(inv_l, xs, xp, gq_p, gR_p, gQ2_p)

    acc_t = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    inv_total = 1.0 / total
    cs = jnp.sum(cs_c.astype(acc_t), axis=0)[0, :n]                 # (N,)
    B = jnp.sum(B_c.astype(acc_t), axis=0)[:d, :n]                  # (D, N)
    u = jnp.sum(u_c.astype(acc_t), axis=0)[:d, 0]                   # (D,)

    xn = x.astype(acc_t)
    ell_a = ell.astype(acc_t)
    # d exponent / dx[d, n] = (xs - xn) / l^2; / dl[d] = (xs - xn)^2 / l^3
    x_bar = ((B - xn * cs[None, :]) / (ell_a ** 2)[:, None]) * inv_total
    l_bar = ((u - 2.0 * jnp.sum(B * xn, axis=1) + jnp.sum(xn * xn * cs[None, :], axis=1))
             / ell_a ** 3) * inv_total
    par_bar = (jnp.concatenate([jnp.zeros((1,), acc_t), l_bar])
               .reshape(par_arr.shape).astype(par_arr.dtype))
    # samples are MC constants (stop_gradient'ed before entry)
    return par_bar, x_bar.astype(x.dtype), jnp.zeros_like(samples)


_student_qRQ.defvjp(_student_qRQ_fwd, _student_qRQ_bwd)


def _student_pallas_call(grid, dp, np_pad, chunk, interpret, inv_l, xs, xp):
    num_chunks = grid[0]
    return pl.pallas_call(
        _student_exp_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((np_pad, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, np_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dp, np_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_pad, np_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((num_chunks, 1, np_pad), jnp.float32),
            jax.ShapeDtypeStruct((num_chunks, dp, np_pad), jnp.float32),
            jax.ShapeDtypeStruct((num_chunks, np_pad, np_pad), jnp.float32),
        ),
        interpret=interpret,
    )(inv_l, xs, xp)


def _student_kxy_kernel(inv_l_ref, xs_ref, out_ref):
    """Per-chunk pairwise ``E[k(x, y)]`` contribution: all off-diagonal pairs
    of the chunk's sample-sample Gram.  ``k_ii = exp(0) = 1`` exactly, so the
    diagonal is removed arithmetically (no trace op needed).  Each grid step
    writes its own output slot; the cross-chunk mean is taken outside in f64
    (see the precision note in :func:`_student_exp_kernel`)."""
    s = xs_ref[:] * inv_l_ref[:]
    s2 = jnp.sum(s * s, axis=1, keepdims=True)       # (C, 1)
    k = jnp.exp(-0.5 * (s2 + s2.T) + jnp.dot(s, s.T, preferred_element_type=jnp.float32))
    c = k.shape[0]
    out_ref[pl.program_id(0), 0] = (jnp.sum(k) - c) / (c - 1)


def student_kxy(par, dim: int, dof: float, num_samples: int = 2_000_000,
                key=None, chunk: int = 1024,
                interpret: bool | None = None) -> jax.Array:
    """Fused MC estimate of the pairwise expectation ``E[k(x, y)]`` over
    independent Student draws (the ``exp_xy_kxy`` integral-variance term).

    The jnp scan equivalent walks 10000 tiny batches (reference structure,
    ``bqkern.py:529-536``) — a scan that long costs ~30 s in emulated f64 on
    TPU; here each grid step is one (chunk, chunk) f32 Gram on the MXU.
    ``chunk`` is bounded by the Gram tile's VMEM footprint (1024² f32 = 4 MB).

    DIFFERENTIABLE w.r.t. the lengthscales ``par[1:]`` (``jax.custom_vjp``;
    the gradient is a pairwise MC average over the same sample stream —
    one more fused kernel).  The scale ``par[0]`` does not enter the
    unscaled expectation, so its cotangent is zero (callers apply the
    ``s**2`` scaling outside, where autodiff handles it).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if key is None:
        key = jax.random.PRNGKey(0)

    d = dim
    dp = _round_up(max(d, 1), 8)
    # pairs need >= 2 samples per chunk (the estimator divides by chunk-1);
    # shrink an oversized chunk to the 8-aligned sample budget
    chunk = min(chunk, _round_up(max(num_samples, 8), 8))
    if chunk < 2:
        raise ValueError(f"student_kxy needs chunk >= 2 (pairs); got {chunk}")
    num_chunks = max(num_samples // chunk, 1)
    total = num_chunks * chunk

    samples = jax.lax.stop_gradient(
        multivariate_t(key, jnp.zeros(d, jnp.float32),
                       jnp.eye(d, dtype=jnp.float32), dof, (total,)))
    return _student_kxy_core(dp, chunk, bool(interpret), jnp.asarray(par), samples)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _student_kxy_core(dp, chunk, interpret, par, samples):
    par_row = jnp.asarray(par).reshape(-1)
    ell = par_row[1:]
    d = ell.shape[0]
    total = samples.shape[0]
    num_chunks = total // chunk
    xs = jnp.zeros((total, dp), jnp.float32).at[:, :d].set(samples)
    inv_l = jnp.zeros((1, dp), jnp.float32).at[0, :d].set(1.0 / ell.astype(jnp.float32))

    with jax.enable_x64(False):
        acc = pl.pallas_call(
            _student_kxy_kernel,
            grid=(num_chunks,),
            in_specs=[
                pl.BlockSpec((1, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((num_chunks, 1), jnp.float32),
            interpret=interpret,
        )(inv_l, xs)
    acc_t = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    return (jnp.sum(acc.astype(acc_t)) / total).astype(jnp.asarray(par).dtype)


def _student_kxy_core_fwd(dp, chunk, interpret, par, samples):
    return _student_kxy_core(dp, chunk, interpret, par, samples), (par, samples)


def _student_kxy_bwd_kernel(inv_l_ref, xs_ref, out_ref):
    """Per-chunk partials of ``d E[k(x, y)] / d l_d`` over off-diagonal
    pairs: with the exponent ``-0.5 sum_d (x_sd - x_td)^2 / l_d^2``,

        t_d = sum_{s != t} k_st (x_sd - x_td)^2
            = 2 sum_s x_sd^2 (rowsum_s - 1) - 2 (x_d^T k x_d - sum_s x_sd^2)
            = 2 sum_s x_sd^2 rowsum_s - 2 x_d^T k x_d

    (``k_ss = 1`` exactly, so the diagonal's contribution cancels — it is
    zero in the numerator anyway since ``x_s - x_s = 0``).  The host divides
    by ``l_d^3`` and the pair count.  Broadcast across 128 lanes for the
    TPU tile shape."""
    xs = xs_ref[:]
    s = xs * inv_l_ref[:]
    s2 = jnp.sum(s * s, axis=1, keepdims=True)
    k = jnp.exp(-0.5 * (s2 + s2.T) + jnp.dot(s, s.T, preferred_element_type=jnp.float32))
    rowsum = jnp.sum(k, axis=1, keepdims=True)                       # (C, 1)
    kx = jnp.dot(k, xs, preferred_element_type=jnp.float32)          # (C, Dp)
    t = 2.0 * (jnp.sum(xs * xs * rowsum, axis=0) - jnp.sum(xs * kx, axis=0))
    out_ref[0, :, :] = t[:, None] * jnp.ones((1, 128), jnp.float32)


def _student_kxy_core_bwd(dp, chunk, interpret, res, g):
    par, samples = res
    par_arr = jnp.asarray(par)
    ell = par_arr.reshape(-1)[1:]
    d = ell.shape[0]
    total = samples.shape[0]
    num_chunks = total // chunk
    xs = jnp.zeros((total, dp), jnp.float32).at[:, :d].set(samples)
    inv_l = jnp.zeros((1, dp), jnp.float32).at[0, :d].set(1.0 / ell.astype(jnp.float32))

    with jax.enable_x64(False):
        t_c = pl.pallas_call(
            _student_kxy_bwd_kernel,
            grid=(num_chunks,),
            in_specs=[
                pl.BlockSpec((1, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, dp, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((num_chunks, dp, 128), jnp.float32),
            interpret=interpret,
        )(inv_l, xs)

    acc_t = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    t = jnp.sum(t_c.astype(acc_t), axis=0)[:d, 0]
    ell_a = ell.astype(acc_t)
    # same normalization as the forward: off-diagonal pairs, per-chunk mean
    # over (chunk - 1) pairs then the cross-chunk mean over total samples
    l_bar = g.astype(acc_t) * t / (ell_a ** 3) / (total * (chunk - 1))
    par_bar = (jnp.concatenate([jnp.zeros((1,), acc_t), l_bar])
               .reshape(par_arr.shape).astype(par_arr.dtype))
    return par_bar, jnp.zeros_like(samples)


_student_kxy_core.defvjp(_student_kxy_core_fwd, _student_kxy_core_bwd)


# ---------------------------------------------------------------------------
# Vandermonde matrix of multivariate monomials
# ---------------------------------------------------------------------------

def _vandermonde_kernel(mul_ind, x_ref, out_ref):
    """Static-unrolled monomial products; ``mul_ind`` is a compile-time
    constant (like the multi-index baked into BSQ weights)."""
    x = x_ref[:]                                      # (Np, Dp)
    d, q = mul_ind.shape
    cols = []
    for b in range(q):
        col = jnp.ones_like(x[:, 0])
        for dd in range(d):
            e = int(mul_ind[dd, b])
            if e:
                col = col * x[:, dd] ** e
        cols.append(col)
    out_ref[:] = jnp.stack(cols, axis=1)


def vandermonde(mul_ind, x, interpret: bool | None = None) -> jax.Array:
    """Pallas twin of :func:`ssmtoybox_tpu.utils.combin.vandermonde`.

    ``vdm[n, b] = prod_d x[d, n] ** mul_ind[d, b]`` — the reference's Numba
    kernel (``utils.py:478-502``) as a TPU VPU kernel.

    Returns FLOAT32: Mosaic has no f64 ALU path, so the monomial products
    carry f32 accuracy (~1e-7 relative on sigma-point-scale inputs) no
    matter the input dtype — the dtype now says so instead of a silent
    f64 upcast.  BSQ weight solves (ill-conditioned Vandermonde systems)
    must use the exact :func:`~ssmtoybox_tpu.utils.combin.vandermonde`,
    and do.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    mul_ind = np.asarray(mul_ind, dtype=np.int64)
    x = jnp.asarray(x)
    d, n = x.shape
    q = mul_ind.shape[1]

    np_pad = _round_up(max(n, 1), 8)
    dp = max(d, 1)      # D axis needs no explicit alignment (Mosaic pads)
    qp = _round_up(max(q, 1), 128)
    mul_pad = np.zeros((dp, qp), dtype=np.int64)
    mul_pad[:d, :q] = mul_ind
    xp = jnp.zeros((np_pad, dp), jnp.float32).at[:n, :d].set(x.T.astype(jnp.float32))

    out = pl.pallas_call(
        functools.partial(_vandermonde_kernel, mul_pad),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_pad, qp), jnp.float32),
        interpret=interpret,
    )(xp)
    return out[:n, :q]        # f32 on purpose — see docstring
