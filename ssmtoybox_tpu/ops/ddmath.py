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
    "exp", "sincos", "atan2", "where",
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


# -- transcendentals ----------------------------------------------------------
#
# Same playbook as ``sqrt``: cheap f32 hardware seed (or exact range
# reduction) + a correction computed with error-free dd arithmetic, lifting
# 24 -> ~48 bits.  These exist for the VECTOR-state dd filter engines: the
# reentry dynamics needs ``exp`` (atmospheric drag, ``ssmod.py:571-575`` in
# the reference) and the radar measurement needs ``atan2``
# (``ssmod.py:1201-1255``); ``sincos`` backs ``atan2``'s Newton correction
# and the coordinated-turn rotation.  All are branch-free elementwise jax
# graphs — they fuse, vmap, and run inside Pallas bodies like every other
# ``ddmath`` op.

import math as _math


def _split3(v: float):
    """Split a host f64 constant into three f32 legs, hi+mid+lo ~ 72 bits."""
    v = np.float64(v)
    hi = np.float32(v)
    mid = np.float32(v - np.float64(hi))
    lo = np.float32(v - np.float64(hi) - np.float64(mid))
    return hi, mid, lo


def _mul_int3(hi, mid, lo, k):
    """``k * (hi + mid + lo)`` to dd for integer-valued f32 ``k``.

    ``k * hi`` and ``k * mid`` are made exact by Dekker two_prod; only the
    third leg rounds (abs error ~ |k| * 2^-72) — the Cody-Waite reduction
    that keeps exp/sincos accurate for large quotients.
    """
    p1, e1 = _two_prod(hi, k)
    p2, e2 = _two_prod(mid, k)
    s, e = _two_sum(p1, p2)
    e = e + (e1 + e2 + lo * k)
    return _quick_two_sum(s, e)


_LN2_3 = _split3(_math.log(2.0))
_INV_LN2 = np.float32(1.0 / _math.log(2.0))
#: exp Taylor coefficients 1/n!, n = 14 .. 0, as dd constants (Horner order).
_EXP_COEFS = [const(1.0 / _math.factorial(n)) for n in range(14, -1, -1)]


def exp(x):
    """dd ``exp``: Cody-Waite reduction by ln2 + degree-14 dd Horner.

    ``exp(x) = 2^k * exp(r)`` with ``k = round(x / ln2)``, ``|r| <= ln2/2``;
    the Taylor tail at degree 14 is ~4e-18 — below the 2^-48 dd grain.
    Domain: results representable in f32 (|x| <~ 87); ``k`` is clamped to
    +-126 so out-of-range inputs saturate to 0 / inf smoothly instead of
    producing NaN pairs.  Full ~2^-48 relative error holds for results
    >= ~2^-100 (x >= ~-70); below that the lo leg underflows f32 subnormals
    and precision degrades gracefully toward f32's 2^-24 — far outside the
    drag-exponent range the filters evaluate (x in [-15, 5]).
    """
    k = jnp.clip(jnp.round(x[0] * _INV_LN2), -126.0, 126.0)
    r = sub(x, _mul_int3(*_LN2_3, k))
    acc = _EXP_COEFS[0]
    for c in _EXP_COEFS[1:]:
        acc = add(mul(acc, r), c)
    # 2^k EXACTLY, by building the f32 exponent field (XLA's exp2 is an
    # approximation — measured 4e-6 relative even at integer inputs)
    s = jax.lax.bitcast_convert_type(
        (k.astype(jnp.int32) + 127) << 23, jnp.float32)
    return acc[0] * s, acc[1] * s


_PI2_3 = _split3(_math.pi / 2.0)
_INV_PI2 = np.float32(2.0 / _math.pi)
#: sin(r)/r and cos(r) Taylor coefficients in z = r^2, Horner order
#: (highest first).  Degrees reach r^17 / r^18: tails ~5e-17 / 2e-18 at
#: |r| <= pi/4 — below the dd grain.
_SIN_COEFS = [const((-1.0) ** n / _math.factorial(2 * n + 1))
              for n in range(8, -1, -1)]
_COS_COEFS = [const((-1.0) ** n / _math.factorial(2 * n))
              for n in range(9, -1, -1)]


def sincos(x):
    """dd ``(sin x, cos x)``: reduction mod pi/2 + dd Taylor in r^2.

    Accurate to ~2^-48 absolute for |x| up to a few thousand (the Cody-Waite
    legs keep the reduction exact through |k| < 2^11; filter bearings and
    turn angles live in [-pi, pi]).
    """
    k = jnp.round(x[0] * _INV_PI2)
    r = sub(x, _mul_int3(*_PI2_3, k))
    z = sqr(r)
    ps = _SIN_COEFS[0]
    for c in _SIN_COEFS[1:]:
        ps = add(mul(ps, z), c)
    sin_r = mul(r, ps)
    pc = _COS_COEFS[0]
    for c in _COS_COEFS[1:]:
        pc = add(mul(pc, z), c)
    q = jnp.mod(k, 4.0)                 # quadrant: 0..3 (f32 compare-safe)

    def pick(a, b):
        """quadrant select: q=0 -> a, 1 -> b, 2 -> -a, 3 -> -b."""
        hi = jnp.where(q == 0.0, a[0], jnp.where(q == 1.0, b[0],
                       jnp.where(q == 2.0, -a[0], -b[0])))
        lo = jnp.where(q == 0.0, a[1], jnp.where(q == 1.0, b[1],
                       jnp.where(q == 2.0, -a[1], -b[1])))
        return hi, lo

    return pick(sin_r, pc), pick(pc, neg(sin_r))


def where(cond, a, b):
    """Elementwise select between dd values (``cond`` is a bool array;
    broadcasting follows ``jnp.where``).  Backs the singularity guards the
    f64 models express with ``jnp.where`` (e.g. the coordinated-turn
    ``om -> 0`` limit, ``ssmod.py:683-684`` in the reference)."""
    return jnp.where(cond, a[0], b[0]), jnp.where(cond, a[1], b[1])


def atan2(y, x):
    """dd ``atan2(y, x)``: f32 hardware seed + one dd Newton correction.

    With ``t0 = atan2_f32(y, x)`` and ``r = sqrt(x^2 + y^2)``, the residual
    ``e = y cos t0 - x sin t0`` equals ``r sin(theta* - t0)``, so one
    correction ``t0 + e/r`` recovers theta* to ~2^-47 absolute (the
    ``asin`` cubic term is ~2^-68 at an f32-accurate seed).  ``x = y = 0``
    returns 0 like the hardware convention.
    """
    t0 = jnp.arctan2(y[0], x[0])
    s, c = sincos((t0, jnp.zeros_like(t0)))
    e = sub(mul(y, c), mul(x, s))
    r = sqrt(add(sqr(x), sqr(y)))
    safe = r[0] > 0
    r = (jnp.where(safe, r[0], 1.0), jnp.where(safe, r[1], 0.0))
    corr = div(e, r)
    out = add((t0, jnp.zeros_like(t0)), corr)
    return jnp.where(safe, out[0], t0), jnp.where(safe, out[1], 0.0)
