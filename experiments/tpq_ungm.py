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
    import jax.numpy as jnp
    import ssmtoybox_tpu as st
    from ssmtoybox_tpu.ssmod import UNGMTransition, UNGMMeasurement
    from ssmtoybox_tpu.utils import GaussRV, StudentRV, bigauss_mixture

    # data-generating system: Gaussian state noise, glint measurement noise
    # (80% N(0, 0.01), 20% N(0, 10) — tpq_ungm.py:38-60)
    dyn_data = UNGMTransition.create(GaussRV.create(1, cov=1.0), GaussRV.create(1, cov=10.0))
    key = jax.random.PRNGKey(args.seed)
    x = dyn_data.simulate_discrete(key, steps=args.steps, mc_sims=args.mc)
    r = bigauss_mixture(jax.random.PRNGKey(args.seed + 1),
                        np.zeros(1), 0.01 * np.eye(1), np.zeros(1), 10.0 * np.eye(1),
                        0.8, (args.steps, args.mc))
    y = 0.05 * x ** 2 + jnp.moveaxis(r, -1, 0)

    # filter models: Student approximations of the noises (tpq_ungm.py:62-100)
    kpar = np.array([[1.0, 1.0]])
    algs = {"UKF": st.UnscentedKalman(
        UNGMTransition.create(GaussRV.create(1, cov=1.0), GaussRV.create(1, cov=10.0)),
        UNGMMeasurement.create(GaussRV.create(1, cov=0.01), dim_state=1))}

    for nu in (3.0, 10.0, 500.0):
        dyn_s = UNGMTransition.create(StudentRV.create(1, dof=4.0),
                                      StudentRV.create(1, scale=10.0, dof=4.0))
        obs_s = UNGMMeasurement.create(StudentRV.create(1, scale=0.01, dof=4.0), dim_state=1)
        if nu == 3.0:
            algs["FSQ"] = st.FullySymmetricStudent(dyn_s, obs_s, degree=3, dof=4.0)
        algs[f"TPQSF-{int(nu)}"] = st.StudentProcessStudent(
            dyn_s, obs_s, kpar, kpar, dof=4.0, dof_tp=nu, compat_drop_nu=False,
            mc_opts={"num_samples": args.tpq_samples})

    df, _ = run_filter_bank(algs, np.asarray(y), np.asarray(x))
    print_tables(df[["rmse", "rmse_2std", "inc", "inc_2std", "wallclock_s"]],
                 f"UNGM glint noise, steps={args.steps}, mc={args.mc}", args.latex)


if __name__ == "__main__":
    main()
