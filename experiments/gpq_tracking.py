"""Reentry tracking demo with GPQ Kalman filters (``research/gpq/gpq_tracking.py``).

Euler-Maruyama ground truth, UKF vs GPQKF with UT points.

Usage: python experiments/gpq_tracking.py [--dur 200] [--mc 20]
                                          [--engine f64|dd|auto]

``--engine dd`` runs the filters in double-double f32-pair arithmetic
(:mod:`ssmtoybox_tpu.ops.ddvec` — the reentry lane's ~4x TPU fast path);
scores match f64 statistically (see RESULTS.md).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from experiments.common import setup_jax, run_filter_bank, print_tables


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dur", type=float, default=200.0)
    ap.add_argument("--mc", type=int, default=20)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--engine", choices=["f64", "dd", "auto"], default="f64")
    args = ap.parse_args()

    setup_jax()
    import jax
    import ssmtoybox_tpu as st
    from ssmtoybox_tpu.ssmod import ReentryVehicle2DTransition, Radar2DMeasurement
    from ssmtoybox_tpu.utils import GaussRV

    tau = 0.05
    sys_dyn = ReentryVehicle2DTransition.create(
        GaussRV.create(5, mean=np.array([6500.4, 349.14, -1.8093, -6.7967, 0.6932]),
                       cov=np.diag([1e-6, 1e-6, 1e-6, 1e-6, 1e-12])),
        GaussRV.create(3, cov=np.diag([2.4064e-5, 2.4064e-5, 1e-12])), dt=tau)
    obs = Radar2DMeasurement.create(GaussRV.create(2, cov=np.diag([1e-3, 0.17e-3])),
                                    dim_state=5, radar_loc=np.array([6374.0, 0.0]))

    key = jax.random.PRNGKey(args.seed)
    x = sys_dyn.simulate_continuous(key, duration=args.dur, dt=tau, mc_sims=args.mc)
    y = obs.simulate_measurements(jax.random.PRNGKey(args.seed + 1), x)
    x = np.asarray(x[:, ::2, :])
    y = np.asarray(y[:, ::2, :])

    dyn = ReentryVehicle2DTransition.create(
        GaussRV.create(5, mean=np.array([6500.4, 349.14, -1.8093, -6.7967, 0.6932]),
                       cov=np.diag([1e-6, 1e-6, 1e-6, 1e-6, 1.0])),
        GaussRV.create(3, cov=np.diag([2.4064e-5, 2.4064e-5, 1e-6])), dt=2 * tau)

    kpar = np.array([[1.0, 25, 25, 25, 25, 25]])
    algs = {
        "UKF": st.UnscentedKalman(dyn, obs, beta=0.0),
        "GPQKF": st.GaussianProcessKalman(dyn, obs, kpar, kpar, points="ut"),
    }
    df, _ = run_filter_bank(algs, y, x, engine=args.engine)
    cols = (["rmse", "rmse_2std", "nci", "nll", "wallclock_s"]
            + (["engine"] if args.engine != "f64" else []))
    print_tables(df[cols],
                 f"Reentry GPQ demo, dur={args.dur}s, mc={args.mc}, "
                 f"engine={args.engine}")


if __name__ == "__main__":
    main()
