"""UNGM filter+smoother study: Classical vs GPQ vs BSQ per point set.

Reproduces ``research/bsq/bsq_ungm.py:91-186`` (UT / GH-5 / GH-7 rules, each
with the classical filter, the GPQ filter and the BSQ filter; filtered and
smoothed RMSE/NCI/NLL tables).

Usage: python experiments/bsq_ungm.py [--steps 500] [--mc 100] [--seed 0]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from experiments.common import setup_jax, run_filter_bank, print_tables, study_scores


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--mc", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--latex", action="store_true")
    args = ap.parse_args()

    setup_jax()
    import jax
    import jax.numpy as jnp
    import ssmtoybox_tpu as st
    from ssmtoybox_tpu.ssmod import UNGMTransition, UNGMMeasurement
    from ssmtoybox_tpu.ssinf import gaussian_smoother
    from ssmtoybox_tpu.utils import GaussRV

    dyn = UNGMTransition.create(GaussRV.create(1, cov=5.0), GaussRV.create(1, cov=10.0))
    obs = UNGMMeasurement.create(GaussRV.create(1, cov=1.0), dim_state=1)
    key = jax.random.PRNGKey(args.seed)
    x = dyn.simulate_discrete(key, steps=args.steps, mc_sims=args.mc)
    y = obs.simulate_measurements(jax.random.PRNGKey(args.seed + 1), x)

    par_ut = np.array([[3.0, 0.3]])
    par_gh5 = np.array([[5.0, 0.6]])
    par_gh7 = np.array([[3.0, 0.4]])
    mulind_ut = np.array([[0, 1, 2]])
    mulind_gh = lambda deg: np.atleast_2d(np.arange(deg))

    algs = {
        "UT": st.UnscentedKalman(dyn, obs, alpha=1.0, beta=0.0),
        "GH-5": st.GaussHermiteKalman(dyn, obs, deg=5),
        "GH-7": st.GaussHermiteKalman(dyn, obs, deg=7),
        "GPQ-UT": st.GaussianProcessKalman(dyn, obs, par_ut, par_ut, points="ut"),
        "GPQ-GH5": st.GaussianProcessKalman(dyn, obs, par_gh5, par_gh5, points="gh",
                                            point_hyp={"degree": 5}),
        "GPQ-GH7": st.GaussianProcessKalman(dyn, obs, par_gh7, par_gh7, points="gh",
                                            point_hyp={"degree": 7}),
        "BSQ-UT": st.BayesSardKalman(dyn, obs, par_ut, par_ut,
                                     mulind_dyn=mulind_ut, mulind_obs=mulind_ut, points="ut"),
        "BSQ-GH5": st.BayesSardKalman(dyn, obs, par_gh5, par_gh5,
                                      mulind_dyn=mulind_gh(5), mulind_obs=mulind_gh(5),
                                      points="gh", point_hyp={"degree": 5}),
        "BSQ-GH7": st.BayesSardKalman(dyn, obs, par_gh7, par_gh7,
                                      mulind_dyn=mulind_gh(7), mulind_obs=mulind_gh(7),
                                      points="gh", point_hyp={"degree": 7}),
    }

    df_f, raw = run_filter_bank(algs, y, x)
    print_tables(df_f[["rmse", "rmse_2std", "nci", "nci_2std", "nll", "nll_2std"]],
                 f"UNGM filtered, steps={args.steps}, mc={args.mc}", args.latex)

    # smoothed scores (vmapped RTS over the stacked forward results)
    rows = {}
    smooth = jax.jit(jax.vmap(lambda r: gaussian_smoother(r, rts_full=False)))
    for name, (res, _) in raw.items():
        sm, sP = smooth(res)
        scores = study_scores(jnp.asarray(x), sm, sP)
        # a run is diverged if ANY score is non-finite (a lost-PD covariance
        # gives NaN nll/nci with a finite mean; cf. run_filter_bank)
        finite = np.ones(sm.shape[0], dtype=bool)
        for v in scores.values():
            finite &= np.isfinite(np.asarray(v))
        rows[name] = {k: float(np.mean(np.asarray(v)[finite])) if finite.any() else float("nan")
                      for k, v in scores.items()}
        rows[name]["diverged"] = int((~finite).sum())
    import pandas as pd
    print_tables(pd.DataFrame(rows).T[["rmse", "nci", "nll", "diverged"]],
                 "UNGM smoothed", args.latex)


if __name__ == "__main__":
    main()
