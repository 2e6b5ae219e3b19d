"""Reentry-vehicle radar tracking: BSQKF with EMV overrides vs UKF.

Reproduces ``research/bsq/bsq_tracking.py:223-340``: Euler-Maruyama ground
truth (dt=0.05) sub-sampled x2, filters running at dt=0.1 with a mis-specified
initial mean; BSQ Kalman filters with three expected-model-variance settings
against the UKF.

EMV overrides: in the reference, ``alg.tf_dyn.model.model_var`` is mutated
after construction (``bsq_tracking.py:276-281``); transforms here are
immutable pytrees, so the equivalent is ``tf.replace(model_var=...)``.

Usage: python experiments/bsq_tracking.py [--dur 200] [--mc 10] [--seed 0]
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
    ap.add_argument("--mc", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--latex", action="store_true")
    args = ap.parse_args()

    setup_jax()
    import jax
    import jax.numpy as jnp
    import ssmtoybox_tpu as st
    from ssmtoybox_tpu.ssmod import ReentryVehicle2DTransition, Radar2DMeasurement
    from ssmtoybox_tpu.utils import GaussRV

    tau, disc_tau = 0.05, 0.1

    # reality (bsq_tracking.py:233-244)
    sys_dyn = ReentryVehicle2DTransition.create(
        GaussRV.create(5, mean=np.array([6500., 350., -1.8, -6.8, 0.7]),
                       cov=np.diag([1e-6, 1e-6, 1e-6, 1e-6, 1e-12])),
        GaussRV.create(3, cov=np.diag([2.4e-5, 2.4e-5, 1e-12])), dt=tau)
    obs = Radar2DMeasurement.create(GaussRV.create(2, cov=np.diag([1e-6, 0.17e-6])),
                                    dim_state=5, radar_loc=np.array([6374.0, 0.0]))

    key = jax.random.PRNGKey(args.seed)
    x = sys_dyn.simulate_continuous(key, duration=args.dur, dt=tau, mc_sims=args.mc)
    y = obs.simulate_measurements(jax.random.PRNGKey(args.seed + 1), x)
    x = np.asarray(x[:, ::2, :])
    y = np.asarray(y[:, ::2, :])

    # filter model with mis-specified init (bsq_tracking.py:255-261)
    dyn = ReentryVehicle2DTransition.create(
        GaussRV.create(5, mean=np.array([6500., 350., -1.1, -6.1, 0.7]),
                       cov=np.diag([1e-6, 1e-6, 1e-6, 1e-6, 1.0])),
        GaussRV.create(3, cov=np.diag([2.4e-5, 2.4e-5, 1e-6])), dt=disc_tau)

    par_dyn = np.array([[1.0, 1, 1, 1, 1, 1]])
    par_obs = np.array([[1.0, 0.9, 0.9, 1e4, 1e4, 1e4]])
    mul_ut = np.hstack((np.zeros((5, 1), int), np.eye(5, dtype=int), 2 * np.eye(5, dtype=int)))

    def bsq():
        return st.BayesSardKalman(dyn, obs, par_dyn, par_obs,
                                  mulind_dyn=mul_ut, mulind_obs=mul_ut, points="ut")

    algs = {
        "bsqkf": bsq(),
        "bsqkf_2e-6": bsq(),
        "bsqkf_2e-7": bsq(),
        "ukf": st.UnscentedKalman(dyn, obs, beta=0.0),
    }
    # fixed EMV overrides (bsq_tracking.py:276-281)
    overrides = {
        "bsqkf": (np.diag([2e-4] * 5), np.zeros((2, 2))),
        "bsqkf_2e-6": (2e-6 * np.eye(5), np.zeros((2, 2))),
        "bsqkf_2e-7": (2e-7 * np.eye(5), np.zeros((2, 2))),
    }
    for name, (mv_dyn, mv_obs) in overrides.items():
        algs[name].tf_dyn = algs[name].tf_dyn.replace(model_var=jnp.asarray(mv_dyn))
        algs[name].tf_obs = algs[name].tf_obs.replace(model_var=jnp.asarray(mv_obs))

    df, _ = run_filter_bank(algs, y, x)
    print_tables(df[["rmse", "rmse_2std", "inc", "inc_2std", "wallclock_s"]],
                 f"Reentry tracking, dur={args.dur}s, mc={args.mc}", args.latex)


if __name__ == "__main__":
    main()
