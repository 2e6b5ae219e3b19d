"""Double-double (f32-pair) arithmetic for TPU-resident f64-grade compute.

TPU has no f64 ALU; XLA emulates ``jnp.float64`` in software, but the
emulation happens per-op deep in the lowering pipeline, where it breaks
fusion: a sigma-point filter step that is ~60 scalar f64 ops compiles to a
launch-bound scan body (~124 us/step measured on v5e regardless of batch
width, docs/performance.md).  This module implements the same
precision class EXPLICITLY — every value is an (hi, lo) pair of float32
arrays with ``value = hi + lo``, |lo| <= ulp(hi)/2, giving a 48-bit
effective mantissa (~3.6e-15 relative per op) — as ordinary jax ops on f32
arrays.  XLA then sees a pure-f32 elementwise graph it can fuse freely, and
the same functions work unchanged inside Pallas kernels (Mosaic has no f64
either), enabling whole-scan single-launch filters (ops/ddfilter.py).

Algorithms are the classical error-free transformations (Dekker 1971,
Knuth TAOCP 2.4, and the QD library of Hida/Li/Bailey 2000): ``two_sum``,
Dekker ``split``/``two_prod`` (FMA-free — XLA gives no single-rounding fma
guarantee), renormalization via ``quick_two_sum``.  No reference
counterpart (the reference is CPU NumPy f64 throughout); this is TPU
enablement, cited against the emulated-f64 cost measurements in
``tools/microbench_f64.py``.

Precision contract: each op's result is ~2^-48 relative (vs f64's 2^-53).
Consumers should treat long iterated recursions statistically — any
sub-64-bit precision class (including XLA's own on-TPU f64 emulation)
diverges pointwise on chaotic systems; see ops/ddfilter.py and
tests/test_ddfilter.py for the tiered contract.

A dd value is a plain ``(hi, lo)`` tuple of equal-shape f32 arrays —
a pytree, so dd values flow through ``lax.scan`` carries, ``vmap``, and
Pallas kernel bodies without wrapping.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "const", "from_f64", "to_f64", "zeros_like",
    "add", "sub", "neg", "mul", "sqr", "div", "sqrt",
    "add_f", "mul_f",
]

_SPLIT = np.float32(4097.0)      # 2^12 + 1, Dekker split constant for f32


# -- error-free transformations (f32 in, exact (result, error) out) ---------

def _two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _quick_two_sum(a, b):
    """Renormalize: requires |a| >= |b| (true for all internal uses)."""
    s = a + b
    return s, b - (s - a)


def _dekker_split(a):
    t = _SPLIT * a
    hi = t - (t - a)
    return hi, a - hi


def _two_prod(a, b):
    """Exact product: a*b = p + err, FMA-free via Dekker splitting."""
    p = a * b
    ah, al = _dekker_split(a)
    bh, bl = _dekker_split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


# -- construction / conversion ----------------------------------------------

def const(x, shape=()):
    """Host f64 scalar/array -> dd constant (exact split, done in f64).

    Returned as NUMPY arrays so that inside a Pallas kernel body they are
    trace-time literals (a jnp array would be a captured constant, which
    ``pallas_call`` rejects); jnp ops convert them on first use anyway.
    """
    x = np.asarray(x, dtype=np.float64)
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    if shape:
        hi = np.broadcast_to(hi, shape).copy()
        lo = np.broadcast_to(lo, shape).copy()
    return hi, lo


def from_f64(x):
    """Traced f64 array -> dd (split inside the program; the only place the
    engine touches f64 — at its HBM boundary, once per record)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def to_f64(d):
    return d[0].astype(jnp.float64) + d[1].astype(jnp.float64)


def zeros_like(d):
    return jnp.zeros_like(d[0]), jnp.zeros_like(d[1])


# -- arithmetic ---------------------------------------------------------------

def add(x, y):
    s, e = _two_sum(x[0], y[0])
    e = e + (x[1] + y[1])
    return _quick_two_sum(s, e)


def neg(x):
    return -x[0], -x[1]


def sub(x, y):
    return add(x, neg(y))


def mul(x, y):
    p, e = _two_prod(x[0], y[0])
    e = e + (x[0] * y[1] + x[1] * y[0])
    return _quick_two_sum(p, e)


def sqr(x):
    p, e = _two_prod(x[0], x[0])
    e = e + 2.0 * (x[0] * x[1])
    return _quick_two_sum(p, e)


def add_f(x, f):
    """dd + plain f32 (exact in the f32 term)."""
    s, e = _two_sum(x[0], f)
    e = e + x[1]
    return _quick_two_sum(s, e)


def mul_f(x, f):
    """dd * plain f32."""
    p, e = _two_prod(x[0], f)
    e = e + x[1] * f
    return _quick_two_sum(p, e)


def div(x, y):
    """dd / dd, QD-style three-term long division (~2^-48 relative)."""
    q1 = x[0] / y[0]
    r = sub(x, mul_f(y, q1))
    q2 = r[0] / y[0]
    r = sub(r, mul_f(y, q2))
    q3 = r[0] / y[0]
    s, e = _quick_two_sum(q1, q2)
    return _quick_two_sum(s, e + q3)


def sqrt(x):
    """dd sqrt: f32 rsqrt seed + one error-corrected Newton step in dd
    (QD library's ``ddsqrt``); exact 0 passes through (filters hit P=0 only
    on degenerate inputs, but the guard is one ``where``)."""
    hi = x[0]
    y0 = jax.lax.rsqrt(jnp.where(hi > 0, hi, 1.0))
    r0 = hi * y0                                  # ~f32-accurate sqrt
    # r = r0 + (x - r0^2) * (y0 / 2): the residual is computed exactly in
    # dd, the correction in f32 — one step lifts 24 -> ~48 bits
    p, e = _two_prod(r0, r0)
    diff = sub(x, (p, e))
    corr = (diff[0] + diff[1]) * (0.5 * y0)
    s, err = _quick_two_sum(r0, corr)
    return jnp.where(hi > 0, s, 0.0), jnp.where(hi > 0, err, 0.0)
