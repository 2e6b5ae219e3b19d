"""GPQ-with-derivatives demos (MLSP-2016 line of work).

Covers ``research/gpqd/mlsp2016_demo.py`` (GPQ vs GPQ+D transform accuracy)
and ``research/gpqd/hybrid_demo.py`` (EKF vs the single-point GPQ+D filter
``ExtendedKalmanGPQD`` on UNGM).

Usage: python experiments/gpqd_demo.py [--steps 100] [--mc 50]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from experiments.common import setup_jax, run_filter_bank, print_tables


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--mc", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    setup_jax()
    import jax
    import jax.numpy as jnp
    import pandas as pd
    import ssmtoybox_tpu as st
    from ssmtoybox_tpu.bq.transforms import GaussianProcessTransform
    from ssmtoybox_tpu.bq.gpqd import GaussianProcessDerTransform
    from ssmtoybox_tpu.ssmod import UNGMTransition, UNGMMeasurement
    from ssmtoybox_tpu.utils import GaussRV, symmetrized_kl_divergence

    # ---- transform-level: GPQ vs GPQ+D on a scalar nonlinearity ----------
    f = lambda x, p: jnp.sin(x) + 0.5 * x ** 2
    mean = jnp.asarray(np.array([0.5]))
    cov = jnp.asarray(np.array([[0.8]]))
    key = jax.random.PRNGKey(args.seed)
    xs = mean + jnp.sqrt(cov[0, 0]) * jax.random.normal(key, (200_000, 1))
    fs = jax.vmap(lambda v: f(v, None))(xs)
    mean_mc, cov_mc = jnp.mean(fs, axis=0), jnp.atleast_2d(jnp.var(fs, axis=0))

    kpar = np.array([[1.0, 1.5]])
    rows = {}
    for name, tf in {
        "GPQ": GaussianProcessTransform.create(1, 1, kpar, point_str="ut"),
        "GPQ+D": GaussianProcessDerTransform.create(1, 1, kpar, point_str="ut"),
    }.items():
        mf, cf, _ = tf.apply(f, mean, cov, None)
        rows[name] = {"mean_err": float(jnp.abs(mf - mean_mc)[0]),
                      "skl": float(symmetrized_kl_divergence(mean_mc, cov_mc, mf, cf))}
    print_tables(pd.DataFrame(rows).T, "GPQ vs GPQ+D transform (sin + quadratic)")

    # ---- filter-level: EKF vs ExtendedKalmanGPQD on UNGM (hybrid_demo) ---
    dyn = UNGMTransition.create(GaussRV.create(1, cov=5.0), GaussRV.create(1, cov=10.0))
    obs = UNGMMeasurement.create(GaussRV.create(1, cov=1.0), dim_state=1)
    x = dyn.simulate_discrete(jax.random.PRNGKey(args.seed + 1), steps=args.steps,
                              mc_sims=args.mc)
    y = obs.simulate_measurements(jax.random.PRNGKey(args.seed + 2), x)
    rbf_par = np.array([[1.0, 3.0]])
    algs = {
        "EKF": st.ExtendedKalman(dyn, obs),
        "EKF-GPQD": st.ssinf.ExtendedKalmanGPQD(dyn, obs, rbf_par, rbf_par),
    }
    df, _ = run_filter_bank(algs, np.asarray(y), np.asarray(x))
    print_tables(df[["rmse", "rmse_2std", "nci", "nll"]],
                 f"EKF vs EKF-GPQD on UNGM, steps={args.steps}, mc={args.mc}")


if __name__ == "__main__":
    main()
