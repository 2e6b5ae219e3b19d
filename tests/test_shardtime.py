"""Mesh-sharded time-parallel scans vs the single-chip associative scans.

Runs on the 8-device virtual CPU mesh (conftest).  The sharded variants in
:mod:`ssmtoybox_tpu.parallel.shardtime` reuse the element builders and
combines of ``timescan``/``sqrttime``, so equality here pins down only the
two-level scan decomposition (local scan → all_gather → prefix combine →
apply) and the identity padding — the math is shared by construction.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from ssmtoybox_tpu.parallel.shardtime import (
    sharded_associative_scan,
    sharded_parallel_affine_filter, sharded_parallel_affine_smoother,
    sharded_parallel_affine_sqrt_filter, sharded_parallel_affine_sqrt_smoother)
from ssmtoybox_tpu.parallel.timescan import (parallel_linear_filter,
                                             parallel_linear_smoother)
from ssmtoybox_tpu.parallel.sqrttime import (parallel_linear_sqrt_filter,
                                             parallel_linear_sqrt_smoother)

from test_timescan import _setup
from test_sqrttime import _sqrt_inputs


def _time_mesh(n=8):
    return Mesh(np.asarray(jax.devices()[:n]).reshape(n), axis_names=("t",))


def _expand_linear(F, Q, H, R, steps):
    """Broadcast per-step matrices the way parallel_linear_filter does."""
    rep = lambda A: jnp.broadcast_to(jnp.asarray(A), (steps,) + np.shape(A))
    d = np.shape(F)[0]
    return (rep(F), jnp.zeros((steps, d)), rep(Q),
            rep(H), jnp.zeros((steps, np.shape(H)[0])), rep(R))


# ---------------------------------------------------------------- generic

def test_sharded_scan_noncommutative_matches_unsharded():
    """2x2 matrix products — non-commutative, so argument order in the apply
    step is observable (a prefix-sum test would not catch a swap)."""
    key = jax.random.PRNGKey(3)
    mats = jax.random.normal(key, (32, 2, 2)) * 0.4 + jnp.eye(2)
    fn = lambda agg, el: jnp.einsum("...ij,...jk->...ik", agg, el)
    mesh = _time_mesh()
    for reverse in (False, True):
        ref = jax.lax.associative_scan(fn, mats, reverse=reverse)
        got = sharded_associative_scan(fn, mats, mesh, "t", reverse=reverse)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-12, atol=1e-12)


def test_sharded_scan_identity_padding():
    """N=30 on 8 devices: pads with the identity, trims exactly."""
    key = jax.random.PRNGKey(4)
    mats = jax.random.normal(key, (30, 2, 2)) * 0.4 + jnp.eye(2)
    fn = lambda agg, el: jnp.einsum("...ij,...jk->...ik", agg, el)
    mesh = _time_mesh()
    for reverse in (False, True):
        ref = jax.lax.associative_scan(fn, mats, reverse=reverse)
        got = sharded_associative_scan(fn, mats, mesh, "t", reverse=reverse,
                                       identity=jnp.eye(2))
        assert got.shape == (30, 2, 2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-12, atol=1e-12)


def test_sharded_scan_indivisible_without_identity_raises():
    mats = jnp.broadcast_to(jnp.eye(2), (30, 2, 2))
    fn = lambda agg, el: jnp.einsum("...ij,...jk->...ik", agg, el)
    with pytest.raises(ValueError, match="does not divide"):
        sharded_associative_scan(fn, mats, _time_mesh(), "t")


# ----------------------------------------------------- full-covariance path

def test_sharded_filter_smoother_match_unsharded():
    dyn, obs, x, y, F, Q, H, R, x0 = _setup(steps=64)
    mesh = _time_mesh()
    Fs, bs, Qs, Hs, cs, Rs = _expand_linear(F, Q, H, R, y.shape[-1])
    fm_ref, fP_ref = parallel_linear_filter(F, Q, H, R, x0.mean, x0.cov, y)
    fm, fP = sharded_parallel_affine_filter(Fs, bs, Qs, Hs, cs, Rs,
                                            x0.mean, x0.cov, y, mesh)
    np.testing.assert_allclose(np.asarray(fm), np.asarray(fm_ref), rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(fP), np.asarray(fP_ref), rtol=1e-8, atol=1e-8)

    sm_ref, sP_ref = parallel_linear_smoother(F, Q, fm_ref, fP_ref)
    sm, sP = sharded_parallel_affine_smoother(Fs, bs, Qs, fm, fP, mesh)
    np.testing.assert_allclose(np.asarray(sm), np.asarray(sm_ref), rtol=1e-7, atol=1e-7)
    np.testing.assert_allclose(np.asarray(sP), np.asarray(sP_ref), rtol=1e-7, atol=1e-7)


# ----------------------------------------------------------- sqrt path

def test_sharded_sqrt_filter_smoother_match_unsharded_padded():
    """N=30 (indivisible by 8) exercises the factor-form identity padding."""
    dyn, obs, x, y, F, Q, H, R, x0 = _setup(steps=30)
    SQ, SR, S0 = _sqrt_inputs(F, Q, H, R, x0)
    mesh = _time_mesh()
    steps = y.shape[-1]
    rep = lambda A: jnp.broadcast_to(jnp.asarray(A), (steps,) + np.shape(A))
    Fs, bs = rep(F), jnp.zeros((steps, 4))
    SQs, Hs = rep(SQ), rep(H)
    cs, SRs = jnp.zeros((steps, 2)), rep(SR)

    fm_ref, fS_ref = parallel_linear_sqrt_filter(F, SQ, H, SR, x0.mean, S0, y)
    fm, fS = sharded_parallel_affine_sqrt_filter(Fs, bs, SQs, Hs, cs, SRs,
                                                 x0.mean, S0, y, mesh)
    np.testing.assert_allclose(np.asarray(fm), np.asarray(fm_ref), rtol=1e-8, atol=1e-8)
    P, P_ref = (jnp.einsum("ijn,kjn->ikn", S, S) for S in (fS, fS_ref))
    np.testing.assert_allclose(np.asarray(P), np.asarray(P_ref), rtol=1e-8, atol=1e-8)

    sm_ref, sS_ref = parallel_linear_sqrt_smoother(F, SQ, fm_ref, fS_ref)
    sm, sS = sharded_parallel_affine_sqrt_smoother(Fs, bs, SQs, fm, fS, mesh)
    np.testing.assert_allclose(np.asarray(sm), np.asarray(sm_ref), rtol=1e-7, atol=1e-7)
    sP, sP_ref = (jnp.einsum("ijn,kjn->ikn", S, S) for S in (sS, sS_ref))
    np.testing.assert_allclose(np.asarray(sP), np.asarray(sP_ref), rtol=1e-7, atol=1e-7)


def test_sharded_sqrt_filter_f32_pd():
    """f32 end-to-end: factors stay finite with positive diagonals — the PD-
    by-construction contract survives the sharded decomposition."""
    dyn, obs, x, y, F, Q, H, R, x0 = _setup(steps=64)
    SQ, SR, S0 = _sqrt_inputs(F, Q, H, R, x0)
    mesh = _time_mesh()
    steps = y.shape[-1]
    f32 = lambda A: jnp.asarray(A, jnp.float32)
    rep = lambda A: jnp.broadcast_to(f32(A), (steps,) + np.shape(A))
    fm, fS = sharded_parallel_affine_sqrt_filter(
        rep(F), jnp.zeros((steps, 4), jnp.float32), rep(SQ), rep(H),
        jnp.zeros((steps, 2), jnp.float32), rep(SR),
        f32(x0.mean), f32(S0), f32(y), mesh)
    assert fS.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(fm))) and bool(jnp.all(jnp.isfinite(fS)))
    diag = jnp.diagonal(jnp.moveaxis(fS, -1, 0), axis1=-2, axis2=-1)
    assert bool(jnp.all(diag > 0))


# ----------------------------------------- nonlinear iterated smoother

def test_mesh_iterated_smoother_matches_unsharded():
    """Sequence-parallel NONLINEAR smoothing: `iterated_parallel_smoother`
    with `mesh=` routes its affine passes through the sharded scans and must
    equal the single-chip result.  30 steps — indivisible by 8, so the
    identity padding is exercised through the nonlinear path too."""
    from ssmtoybox_tpu.mtran import UnscentedTransform
    from ssmtoybox_tpu.parallel.iplf import iterated_parallel_smoother
    from test_iplf import _pendulum_setup

    dyn, obs, x_true, y = _pendulum_setup(steps=30)
    tf = UnscentedTransform(2)
    ref = iterated_parallel_smoother(dyn, obs, tf, tf, y, iterations=2)
    got = iterated_parallel_smoother(dyn, obs, tf, tf, y, iterations=2,
                                     mesh=_time_mesh())
    np.testing.assert_allclose(np.asarray(got.sm_mean), np.asarray(ref.sm_mean),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(got.sm_cov), np.asarray(ref.sm_cov),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(got.fi_mean), np.asarray(ref.fi_mean),
                               rtol=1e-8, atol=1e-8)

    # sqrt routing composes with the mesh (f64 equality to the full-cov mesh run)
    got_sq = iterated_parallel_smoother(dyn, obs, tf, tf, y, iterations=2,
                                        sqrt=True, mesh=_time_mesh())
    np.testing.assert_allclose(np.asarray(got_sq.sm_mean), np.asarray(ref.sm_mean),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_sq.sm_cov), np.asarray(ref.sm_cov),
                               rtol=1e-6, atol=1e-6)


def test_mesh_with_scan_block_len_raises():
    from ssmtoybox_tpu.mtran import UnscentedTransform
    from ssmtoybox_tpu.parallel.iplf import iterated_parallel_smoother
    from test_iplf import _pendulum_setup
    dyn, obs, x_true, y = _pendulum_setup(steps=16)
    tf = UnscentedTransform(2)
    with pytest.raises(ValueError, match="mutually exclusive"):
        iterated_parallel_smoother(dyn, obs, tf, tf, y, sqrt=True,
                                   scan_block_len=8, mesh=_time_mesh())
