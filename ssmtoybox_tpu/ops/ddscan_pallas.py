"""Whole-scan Pallas kernel for the fused double-double scalar filter.

One kernel launch runs the COMPLETE filter recursion (all N steps) for a
tile of trajectories: the per-step state lives in registers/VMEM for the
whole record and the only HBM traffic is the measurement stream in and the
filtered means out.  This removes the per-step dispatch floor that bounds
the ``lax.scan`` engines (~124 us/step measured on v5e for the jnp-f64
path — docs/performance.md): the scan becomes one launch per ~512
trajectories instead of ~N launches over the whole batch.

The step math itself is the SAME traced dd code the scan engine uses
(:mod:`ssmtoybox_tpu.ops.ddfilter` builds it; :mod:`ddmath` ops are plain
jax-on-f32-pairs, which Mosaic compiles like any elementwise graph).  Grid:
one program per trajectory tile of ``block_b = S x 128`` records; inside,
``lax.fori_loop`` walks the record sequentially — trajectories are
embarrassingly parallel, time is not, which is exactly the (parallel lanes)
x (sequential loop) structure the VPU wants.

Off-TPU the kernel runs in Pallas interpret mode (tests), matching the
repo-wide backend gating convention (ops/pallas_ops.py:134).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_scalar_filter"]

_LANE = 128


def pallas_scalar_filter(step_math, y_hi, y_lo, c_hi, c_lo, m0, P0,
                         block_b: int = 512, interpret: bool | None = None):
    """Run ``step_math`` over the whole record inside one Pallas kernel per
    trajectory tile.

    ``y_hi/y_lo``: (B, N) f32 measurement stream (dd pair).
    ``c_hi/c_lo``: (N,) f32 per-step dynamics constants (dd pair).
    ``m0/P0``: python floats, the initial state (f64 precision retained via
    dd split).  Returns (B, N) f64 filtered means.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, N = y_hi.shape
    S = max(block_b // _LANE, 1)
    tile = S * _LANE
    T = -(-B // tile)                                   # cdiv
    pad = T * tile - B
    if pad:
        y_hi = jnp.pad(y_hi, ((0, pad), (0, 0)))
        y_lo = jnp.pad(y_lo, ((0, pad), (0, 0)))

    # (T, N, S, LANE): time-major per tile so step k reads one (S, LANE) slab
    def retile(a):
        return a.reshape(T, S, _LANE, N).transpose(0, 3, 1, 2)

    yh_t, yl_t = retile(y_hi), retile(y_lo)
    # per-step constants go to SMEM as (N, 1) and are read back as true
    # scalars: a (1, LANE) VMEM slice broadcast against the (S, LANE) state
    # needs a sublane-replicating relayout Mosaic refuses ("Invalid
    # relayout ... replicated in destination but not in source", observed
    # on v5e), while scalar-times-vector is native
    ch_t = c_hi[:, None]
    cl_t = c_lo[:, None]

    m0_hi = np.float32(m0)
    m0_lo = np.float32(np.float64(m0) - np.float64(m0_hi))
    P0_hi = np.float32(P0)
    P0_lo = np.float32(np.float64(P0) - np.float64(P0_hi))

    def kernel(yh_ref, yl_ref, ch_ref, cl_ref, fh_ref, fl_ref):
        # anchor the initial carry to loaded data: a pure splat would get
        # Mosaic's replicated layout {*,*}, which cannot be unified with the
        # concrete {0,0} layout the loop body produces ("Invalid relayout:
        # ... replicated in destination but not in source", observed on v5e)
        anchor = yh_ref[0, 0] * 0.0                                # (S, LANE)
        m = (anchor + m0_hi, anchor + m0_lo)
        P = (anchor + P0_hi, anchor + P0_lo)

        def body(k, carry):
            m, P = carry
            y = (yh_ref[0, k], yl_ref[0, k])                       # (S, LANE)
            # broadcast the SMEM scalars onto the concrete-layout anchor at
            # once: keeping them scalar would drag the dd chains onto the
            # scalar core, which Mosaic fails to legalize (i64 func.return)
            c = (anchor + ch_ref[k, 0], anchor + cl_ref[k, 0])     # (S, LANE)
            m_fi, P_fi = step_math(m, P, y, c)
            fh_ref[0, k] = m_fi[0]
            fl_ref[0, k] = m_fi[1]
            return m_fi, P_fi

        # i32 bounds: under x64 python-int bounds trace the counter as i64,
        # which Mosaic fails to legalize (i64 func.return on v5e)
        jax.lax.fori_loop(jnp.int32(0), jnp.int32(N), body, (m, P))

    out_shape = jax.ShapeDtypeStruct((T, N, S, _LANE), jnp.float32)
    # index-map constants must be i32: under x64 a python 0 traces to i64,
    # which Mosaic fails to legalize (func.return (i32, i64, ...) on v5e)
    _0 = np.int32(0)
    spec = pl.BlockSpec((1, N, S, _LANE), lambda i: (i, _0, _0, _0),
                        memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((N, 1), lambda i: (_0, _0),
                         memory_space=pltpu.SMEM)
    fh, fl = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[spec, spec, cspec, cspec],
        out_specs=(spec, spec),
        out_shape=(out_shape, out_shape),
        interpret=bool(interpret),
    )(yh_t, yl_t, ch_t, cl_t)

    fm = fh.astype(jnp.float64) + fl.astype(jnp.float64)           # (T, N, S, L)
    fm = fm.transpose(0, 2, 3, 1).reshape(T * tile, N)
    return fm[:B]
