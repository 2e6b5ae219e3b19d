"""Offline scan-unroll sweep for the headline lanes (bench.py self-tunes
over a SHORT list to bound compile time in the driver window; this tool
explores the full range so the short list stays the right one).

Usage: python tools/sweep_unroll.py [--lane reentry|ungm|gpqkf] [--mc 10000]
       [--unrolls 1,2,4,8,16]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lane", default="reentry", choices=["reentry", "ungm", "gpqkf"])
    ap.add_argument("--mc", type=int, default=10_000)
    ap.add_argument("--unrolls", default="1,2,4,8,16")
    args = ap.parse_args()
    unrolls = [int(u) for u in args.unrolls.split(",")]

    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import ssmtoybox_tpu as st
    from ssmtoybox_tpu.ssmod import (UNGMTransition, UNGMMeasurement,
                                     ReentryVehicle2DTransition, Radar2DMeasurement)
    from ssmtoybox_tpu.utils import GaussRV

    print("devices:", jax.devices(), file=sys.stderr)

    if args.lane == "reentry":
        dyn = ReentryVehicle2DTransition.create(
            GaussRV.create(5, mean=np.array([6500.4, 349.14, -1.8093, -6.7967, 0.6932]),
                           cov=np.diag([1e-6, 1e-6, 1e-6, 1e-6, 1.0])),
            GaussRV.create(3, cov=np.diag([2.4064e-5, 2.4064e-5, 1e-6])), dt=0.05)
        obs = Radar2DMeasurement.create(GaussRV.create(2, cov=np.diag([1e-3, 1e-5])),
                                        dim_state=5, state_index=[0, 1],
                                        radar_loc=np.array([6374.0, 0.0]))
        steps = 100
        flt = st.UnscentedKalman(dyn, obs)
    else:
        dyn = UNGMTransition.create(GaussRV.create(1, cov=5.0), GaussRV.create(1, cov=10.0))
        obs = UNGMMeasurement.create(GaussRV.create(1, cov=1.0), dim_state=1)
        steps = 500
        if args.lane == "gpqkf":
            flt = st.GaussianProcessKalman(dyn, obs, np.array([[1.0, 3.0]]),
                                           np.array([[1.0, 3.0]]), points="ut")
        else:
            flt = st.UnscentedKalman(dyn, obs)

    x = dyn.simulate_discrete(jax.random.PRNGKey(2), steps=steps, mc_sims=args.mc)
    y = obs.simulate_measurements(jax.random.PRNGKey(3), x)
    ys = jnp.moveaxis(y, -1, 0)

    for u in unrolls:
        run = jax.jit(lambda b, u=u: jax.vmap(
            lambda yy: st.gaussian_filter(dyn, obs, flt.tf_dyn, flt.tf_obs, yy,
                                          unroll=u))(b).fi_mean)
        t0 = time.perf_counter()
        float(jnp.sum(run(ys)))                       # compile + warmup
        t_compile = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(run(ys)))
            ts.append(time.perf_counter() - t0)
        print(f"{args.lane} unroll={u:>2}: best {min(ts):.4f}s "
              f"(runs {['%.4f' % t for t in ts]}, compile+warm {t_compile:.1f}s)",
              flush=True)


if __name__ == "__main__":
    main()
