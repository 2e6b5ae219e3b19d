"""Constant-velocity radar tracking with glint (outlier) measurement noise.

Reproduces ``research/tpq/tpq_constant_velocity.py:12-35``: CV dynamics, 2D
radar measurements contaminated by 15% outliers, comparing the UKF against
Student filters.

Usage: python experiments/tpq_constant_velocity.py [--steps 100] [--mc 100]
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
    ap.add_argument("--mc", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--latex", action="store_true")
    args = ap.parse_args()

    setup_jax()
    import jax
    import jax.numpy as jnp
    import ssmtoybox_tpu as st
    from ssmtoybox_tpu.ssmod import ConstantVelocity, Radar2DMeasurement
    from ssmtoybox_tpu.utils import GaussRV, StudentRV, bigauss_mixture

    x0 = GaussRV.create(4, mean=np.array([10000., 300., 1000., -40.]),
                        cov=np.diag([100.0, 25.0, 100.0, 25.0]))
    q = GaussRV.create(2, cov=np.diag([50.0, 5.0]))
    dyn = ConstantVelocity.create(x0, q, dt=0.5)

    R_nominal = np.diag([50.0, 0.4e-6])

    key = jax.random.PRNGKey(args.seed)
    x = dyn.simulate_discrete(key, steps=args.steps, mc_sims=args.mc)
    # glint: 85% nominal noise, 15% 100x-inflated outliers
    r = bigauss_mixture(jax.random.PRNGKey(args.seed + 1),
                        np.zeros(2), R_nominal, np.zeros(2), 100.0 * R_nominal,
                        0.85, (args.steps, args.mc))
    # radar measurements with the mixture (glint) noise added directly
    xs_sub = x[jnp.array([0, 2])]
    rng = jnp.sqrt(xs_sub[0] ** 2 + xs_sub[1] ** 2)
    th = jnp.arctan2(xs_sub[1], xs_sub[0])
    y = jnp.stack([rng, th]) + jnp.moveaxis(r, -1, 0)      # (2, steps, mc)

    obs_g = Radar2DMeasurement.create(GaussRV.create(2, cov=R_nominal),
                                      dim_state=4, state_index=[0, 2])
    dyn_s = ConstantVelocity.create(
        StudentRV.create(4, mean=np.array([10000., 300., 1000., -40.]),
                         scale=np.diag([100.0, 25.0, 100.0, 25.0]), dof=4.0),
        StudentRV.create(2, scale=np.diag([50.0, 5.0]), dof=4.0), dt=0.5)
    obs_s = Radar2DMeasurement.create(
        StudentRV.create(2, scale=R_nominal, dof=4.0), dim_state=4, state_index=[0, 2])

    algs = {
        "UKF": st.UnscentedKalman(dyn, obs_g),
        "FSQ": st.FullySymmetricStudent(dyn_s, obs_s, degree=3, dof=4.0),
    }
    df, _ = run_filter_bank(algs, np.asarray(y), np.asarray(x))
    print_tables(df[["rmse", "rmse_2std", "inc", "inc_2std", "wallclock_s"]],
                 f"CV radar + 15% glint, steps={args.steps}, mc={args.mc}", args.latex)


if __name__ == "__main__":
    main()
