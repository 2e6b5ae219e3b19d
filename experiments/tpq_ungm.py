"""UNGM heavy-tail study: UKF vs fully-symmetric Student vs TPQ Student.

Reproduces ``research/tpq/tpq_ungm.py:38-247``: UNGM with 80/20
Gaussian-mixture ("glint") measurement noise, comparing the UKF, the
fully-symmetric Student filter (FSQ) and t-process-quadrature Student filters
(TPQSF) for several TP degrees of freedom.

Usage: python experiments/tpq_ungm.py [--steps 250] [--mc 100] [--seed 0]
       [--tpq-samples 2000000]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from experiments.common import setup_jax, run_filter_bank, print_tables


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=250)
    ap.add_argument("--mc", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tpq-samples", type=int, default=2_000_000,
                    help="MC samples for the Student kernel expectations")
    ap.add_argument("--latex", action="store_true")
    args = ap.parse_args()

    setup_jax()
    import jax
    import ssmtoybox_tpu as st
    from ssmtoybox_tpu.ssmod import UNGMTransition, UNGMMeasurement
    from ssmtoybox_tpu.utils import GaussRV, StudentRV, GaussianMixtureRV

    # data-generating system (tpq_ungm.py:39-55): BOTH noises are 80/20
    # Gaussian mixtures — process glint N(0,10)/N(0,100), measurement glint
    # N(0,0.01)/N(0,1)
    zeros = (np.zeros(1), np.zeros(1))
    w8020 = np.array([0.8, 0.2])
    q_mix = GaussianMixtureRV.create(1, zeros, (10.0 * np.eye(1), 100.0 * np.eye(1)), w8020)
    r_mix = GaussianMixtureRV.create(1, zeros, (0.01 * np.eye(1), 1.0 * np.eye(1)), w8020)
    dyn_data = UNGMTransition.create(GaussRV.create(1, cov=1.0), q_mix)
    obs_data = UNGMMeasurement.create(r_mix, dim_state=1)
    x = dyn_data.simulate_discrete(jax.random.PRNGKey(args.seed),
                                   steps=args.steps, mc_sims=args.mc)
    y = obs_data.simulate_measurements(jax.random.PRNGKey(args.seed + 1), x)

    # Student SSM for the Student filters: moment-matched scales
    # scale = (nu-2)/nu * cov with nu=4 (tpq_ungm.py:60-66); Gaussian SSM
    # for the UKF keeps the nominal (non-glint) covariances; kappa=0 point
    # sets throughout (tpq_ungm.py:86-87)
    nu_ssm = 4.0
    mm = (nu_ssm - 2.0) / nu_ssm
    dyn_s = UNGMTransition.create(StudentRV.create(1, scale=mm * 1.0, dof=nu_ssm),
                                  StudentRV.create(1, scale=mm * 10.0, dof=nu_ssm))
    obs_s = UNGMMeasurement.create(StudentRV.create(1, scale=mm * 0.01, dof=nu_ssm),
                                   dim_state=1)

    # TPQ kernel parameters (tpq_ungm.py:77-78)
    par_dyn_tp = np.array([[3.0, 1.0]])
    par_obs_tp = np.array([[3.0, 3.0]])

    algs = {"UKF": st.UnscentedKalman(
        UNGMTransition.create(GaussRV.create(1, cov=1.0), GaussRV.create(1, cov=10.0)),
        UNGMMeasurement.create(GaussRV.create(1, cov=0.01), dim_state=1), kappa=0.0),
        "FSQ": st.FullySymmetricStudent(dyn_s, obs_s, degree=3, kappa=0.0, dof=4.0)}

    for nu in (3.0, 10.0, 500.0):
        # compat_drop_nu=False: the reference's dof_tp never reaches the TP
        # model (bqmtran.py:271-272 drops it — its own FIXME at
        # tpq_ungm.py:89 complains the TPQ rows come out "too similar"),
        # which would make this sweep three identical rows; we honour the
        # FUSION-2017 sweep instead
        algs[f"TPQSF-{int(nu)}"] = st.StudentProcessStudent(
            dyn_s, obs_s, par_dyn_tp, par_obs_tp, point_par={"kappa": 0.0},
            dof=4.0, dof_tp=nu, compat_drop_nu=False,
            mc_opts={"num_samples": args.tpq_samples})

    df, _ = run_filter_bank(algs, np.asarray(y), np.asarray(x))
    print_tables(df[["rmse", "rmse_2std", "inc", "inc_2std", "wallclock_s"]],
                 f"UNGM glint noise, steps={args.steps}, mc={args.mc}", args.latex)


if __name__ == "__main__":
    main()
