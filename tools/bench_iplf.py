"""TPU latency study: sequential scan vs time-parallel IPLS on one long record.

Single long pendulum trajectory (no MC axis to parallelize over): compares the
sequential UKF forward+RTS `lax.scan` against `iterated_parallel_smoother`
(SLR + associative scans, 2 iterations) at several record lengths, f32 and
f64.  Run on the real chip: `python tools/bench_iplf.py`.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    f64 = "--f32" not in sys.argv
    jax.config.update("jax_enable_x64", f64)
    dtype = jnp.float64 if f64 else jnp.float32

    import ssmtoybox_tpu as st
    from ssmtoybox_tpu.mtran import UnscentedTransform
    from ssmtoybox_tpu.parallel import iterated_parallel_smoother
    from ssmtoybox_tpu.ssmod import Pendulum2DTransition, Pendulum2DMeasurement
    from ssmtoybox_tpu.utils import GaussRV
    from ssmtoybox_tpu.utils.profiling import sync

    print(f"backend={jax.default_backend()} dtype={dtype.__name__}", file=sys.stderr)

    dt = 0.01
    Q = 0.1 * np.array([[dt ** 3 / 3, dt ** 2 / 2], [dt ** 2 / 2, dt]])
    dyn = Pendulum2DTransition.create(
        GaussRV.create(2, mean=np.array([1.5, 0.0]), cov=0.01 * np.eye(2), dtype=dtype),
        GaussRV.create(2, cov=Q, dtype=dtype), dt=dt)
    obs = Pendulum2DMeasurement.create(GaussRV.create(1, cov=0.1, dtype=dtype), dim_state=2)
    tf = UnscentedTransform(2, dtype=dtype)

    def best_of(fn, n=3):
        out = []
        for _ in range(n):
            t0 = time.perf_counter()
            sync(fn())
            out.append(time.perf_counter() - t0)
        return min(out)

    from ssmtoybox_tpu.ssinf import gaussian_filter, gaussian_smoother

    sizes = [int(s) for s in os.environ.get("IPLF_SIZES", "1000,10000").split(",")]
    for steps in sizes:
        x = dyn.simulate_discrete(jax.random.PRNGKey(2), steps=steps, mc_sims=1)
        y = jnp.asarray(obs.simulate_measurements(jax.random.PRNGKey(3), x)[..., 0], dtype)

        @jax.jit
        def seq(data):
            res = gaussian_filter(dyn, obs, tf, tf, data)
            sm, sP = gaussian_smoother(res, rts_full=True)
            return res.fi_mean, sm

        use_sqrt = "--sqrt" in sys.argv
        block = next((int(a.split("=", 1)[1]) for a in sys.argv
                      if a.startswith("--block=")), None)

        @jax.jit
        def par(data):
            r = iterated_parallel_smoother(dyn, obs, tf, tf, data, iterations=2,
                                           sqrt=use_sqrt, dtype=dtype,
                                           chol_jitter=0.0 if f64 else 1e-7,
                                           scan_block_len=block)
            return r.fi_mean, r.sm_mean

        sync(seq(y)); sync(par(y))                      # compile
        t_seq = best_of(lambda: seq(y))
        t_par = best_of(lambda: par(y))

        fm_s, sm_s = seq(y)
        fm_p, sm_p = par(y)
        xt = x[..., 0]
        # accumulate the error in f64 on the host: under --f32 (x64 disabled)
        # a jnp f64 cast silently stays f32
        rm = lambda m: float(np.sqrt(np.mean((np.asarray(m, np.float64) -
                                              np.asarray(xt, np.float64)) ** 2)))
        tag = "sqrt-ipls(2)" if use_sqrt else "ipls(2)"
        print(f"steps={steps:>7d}  seq={t_seq*1e3:9.2f} ms  {tag}={t_par*1e3:9.2f} ms  "
              f"speedup={t_seq/t_par:6.2f}x  rmse seq/par smooth: {rm(sm_s):.4f}/{rm(sm_p):.4f}",
              flush=True)


if __name__ == "__main__":
    main()
