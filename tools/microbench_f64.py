"""Micro-benchmark XLA's emulated-f64 primitives on the TPU chip, and
candidate f32-seed + Newton-refined replacements.

TPU has no f64 ALU; XLA emulates f64 with float32-pair (double-double)
arithmetic.  Adds/muls are cheap expansions; transcendentals expand to long
dd-polynomial programs.  For sqrt/rsqrt/div, a 24-bit f32 seed + pure
mul/add Newton steps can beat the generic expansion while keeping ~1 ulp.

Measurement note: one dispatch through the dev tunnel costs ~25-30 ms RTT
(docs/performance.md serving section), so each op is iterated ITERS times
inside a single jitted ``lax.fori_loop`` and the RTT floor (measured by a
no-op loop) is subtracted.

Usage: python tools/microbench_f64.py [--n 200000] [--iters 512]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--iters", type=int, default=512)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from jax import lax

    print("devices:", jax.devices(), file=sys.stderr)

    x = jax.random.uniform(jax.random.PRNGKey(0), (args.n,), dtype=jnp.float64,
                           minval=0.5, maxval=2.0)
    x.block_until_ready()
    ITERS = args.iters
    results = {}

    def timed(label, op, v=x):
        # iterate the op in-device; data dependence via the tiny rotation
        # keeps iterations sequential and uncollapsible
        def body(i, acc):
            return 0.5 * acc + 0.5 * op(acc) + 1e-15 * i

        run = jax.jit(lambda a: lax.fori_loop(0, ITERS, body, a))
        float(jnp.sum(run(v)))                                 # compile+warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(run(v)))
            ts.append(time.perf_counter() - t0)
        per = min(ts) / ITERS / args.n * 1e9
        results[label] = per
        extra = ""
        if "baseline" in results and label != "baseline":
            extra = f"  (op-only {per - results['baseline']:6.3f} ns/elt)"
        print(f"{label:<26} {min(ts)*1e3:8.1f} ms  {per:6.3f} ns/elt/iter{extra}",
              flush=True)

    timed("baseline", lambda v: v)                 # loop + blend cost only
    timed("mul", lambda v: v * 1.0000001)
    timed("div", lambda v: 1.3 / v)
    timed("sqrt", jnp.sqrt)
    timed("rsqrt", lax.rsqrt)
    timed("exp", lambda v: jnp.exp(v * 1e-3) * 0.999)
    timed("log", lambda v: jnp.log(v + 0.5))
    timed("arctan2", lambda v: jnp.arctan2(v, 1.7))
    timed("sin", jnp.sin)

    def fast_sqrt(v):
        r = jnp.sqrt(v.astype(jnp.float32)).astype(jnp.float64)
        r = 0.5 * (r + v / r)
        r = 0.5 * (r + v / r)
        return r

    def fast_rsqrt_sqrt(v):
        yv = lax.rsqrt(v.astype(jnp.float32)).astype(jnp.float64)
        yv = yv * (1.5 - 0.5 * v * yv * yv)
        yv = yv * (1.5 - 0.5 * v * yv * yv)
        return v * yv

    timed("sqrt f32seed+2NR", fast_sqrt)
    timed("sqrt rsqrt-NR x2", fast_rsqrt_sqrt)

    ref = jnp.sqrt(x)
    for name, f in [("f32seed+2NR", fast_sqrt), ("rsqrt-NR", fast_rsqrt_sqrt)]:
        err = float(jnp.max(jnp.abs(jax.jit(f)(x) - ref) / ref))
        print(f"sqrt {name}: max rel err vs generic {err:.3e}", flush=True)


if __name__ == "__main__":
    main()
