"""UNGM benchmark: classical sigma-point filters vs GPQ Kalman filters.

Reproduces the study design of ``research/gpq/icinco_demo.py:81-229`` (RMSE /
NCI / NLL tables for UKF, CKF, GHKF against GPQKF with SR/UT/GH point sets),
with the sequential MC loop replaced by one vmapped program per filter.

Usage: python experiments/icinco_ungm.py [--steps 500] [--mc 100] [--seed 42]
                                         [--engine f64|dd|auto]

``--engine dd`` routes every supported filter through the double-double
f32-pair engine (:mod:`ssmtoybox_tpu.ops.ddvec`; ~2x faster on TPU, study
scores match f64 — RESULTS.md records the equivalence); unsupported filters
fall back to f64 with a stderr note and the table's ``engine`` column says
which arithmetic each filter ran.
"""
import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from experiments.common import setup_jax, run_filter_bank, print_tables


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--mc", type=int, default=100)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--latex", action="store_true")
    ap.add_argument("--engine", choices=["f64", "dd", "auto"], default="f64",
                    help="batch-filter arithmetic (see module docstring)")
    args = ap.parse_args()

    setup_jax()
    import jax
    import ssmtoybox_tpu as st
    from ssmtoybox_tpu.ssmod import UNGMTransition, UNGMMeasurement
    from ssmtoybox_tpu.utils import GaussRV

    dyn = UNGMTransition.create(GaussRV.create(1, cov=5.0), GaussRV.create(1, cov=10.0))
    obs = UNGMMeasurement.create(GaussRV.create(1, cov=1.0), dim_state=1)

    key = jax.random.PRNGKey(args.seed)
    x = dyn.simulate_discrete(key, steps=args.steps, mc_sims=args.mc)
    y = obs.simulate_measurements(jax.random.PRNGKey(args.seed + 1), x)

    # kernel parameters per point set (icinco_demo.py:91-93)
    d = dyn.dim_in
    kp_sr = np.array([[1.0, 0.3 * d]])
    kp_ut = np.array([[1.0, 3.0 * d]])
    kp_gh = np.array([[1.0, 0.1 * d]])

    algs = {
        "UKF": st.UnscentedKalman(dyn, obs),
        "CKF": st.CubatureKalman(dyn, obs),
        "GHKF-5": st.GaussHermiteKalman(dyn, obs, deg=5),
        "GPQKF-SR": st.GaussianProcessKalman(dyn, obs, kp_sr, kp_sr, points="sr"),
        "GPQKF-UT": st.GaussianProcessKalman(dyn, obs, kp_ut, kp_ut, points="ut"),
        "GPQKF-GH5": st.GaussianProcessKalman(dyn, obs, kp_gh, kp_gh, points="gh",
                                              point_hyp={"degree": 5}),
        "GPQKF-GH7": st.GaussianProcessKalman(dyn, obs, kp_gh, kp_gh, points="gh",
                                              point_hyp={"degree": 7}),
    }
    df, _ = run_filter_bank(algs, y, x, engine=args.engine)
    cols = ["rmse", "rmse_2std", "nci", "nci_2std", "nll", "nll_2std",
            "wallclock_s"] + (["engine"] if args.engine != "f64" else [])
    print_tables(df[cols],
                 f"UNGM, steps={args.steps}, mc={args.mc} (filtered, "
                 f"engine={args.engine})", args.latex)


if __name__ == "__main__":
    main()
