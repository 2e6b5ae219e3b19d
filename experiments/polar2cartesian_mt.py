"""Transform-level comparison on the polar-to-Cartesian conversion.

Covers the reference's moment-transform studies outside the filtering loop:
``research/gpq/polar2cartesian.py`` (GPQ vs classical transforms via
symmetrized KL divergence to an MC ground truth), ``research/bsq/bsq_mtran.py``
(BSQ included) and ``research/truncated_mt_demo.py`` (truncated UT vs UT with
growing state dimension — only the first two state dims are observed).

Usage: python experiments/polar2cartesian_mt.py [--mc 100000]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from experiments.common import setup_jax, print_tables


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mc", type=int, default=100_000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    setup_jax()
    import jax
    import jax.numpy as jnp
    import pandas as pd
    from ssmtoybox_tpu.mtran import (
        UnscentedTransform, SphericalRadialTransform, GaussHermiteTransform,
        LinearizationTransform, MonteCarloTransform, TruncatedUnscentedTransform)
    from ssmtoybox_tpu.bq.transforms import GaussianProcessTransform, BayesSardTransform
    from ssmtoybox_tpu.utils import symmetrized_kl_divergence

    def polar2cartesian(x, pars):
        return x[0] * jnp.stack([jnp.cos(x[1]), jnp.sin(x[1])])

    mean = jnp.asarray(np.array([1.0, np.pi / 6]))
    cov = jnp.asarray(np.diag([0.05 ** 2, (np.pi / 10) ** 2]))

    # Monte-Carlo ground truth moments
    key = jax.random.PRNGKey(args.seed)
    xs = jax.random.multivariate_normal(key, mean, cov, (args.mc,))
    fs = jax.vmap(lambda v: polar2cartesian(v, None))(xs)
    mean_mc = jnp.mean(fs, axis=0)
    cov_mc = jnp.cov(fs.T)

    kpar = np.array([[1.0, 0.5, 0.5]])
    mulind = np.hstack([np.zeros((2, 1), dtype=int), np.eye(2, dtype=int),
                        2 * np.eye(2, dtype=int)])
    transforms = {
        "Linearization": LinearizationTransform.create(2),
        "MC-1000": MonteCarloTransform.create(2, n=1000, seed=1),
        "SR": SphericalRadialTransform(2),
        "UT": UnscentedTransform(2),
        "GH-5": GaussHermiteTransform(2, degree=5),
        "GPQ-UT": GaussianProcessTransform.create(2, 2, kpar, point_str="ut"),
        "BSQ-UT": BayesSardTransform.create(2, 2, kpar, multi_ind=mulind, point_str="ut"),
    }
    rows = {}
    for name, tf in transforms.items():
        mf, cf, _ = tf.apply(polar2cartesian, mean, cov, None)
        rows[name] = {
            "mean_err": float(jnp.linalg.norm(mf - mean_mc)),
            "skl": float(symmetrized_kl_divergence(mean_mc, cov_mc, mf, cf)),
        }
    print_tables(pd.DataFrame(rows).T, "polar2cartesian moment transforms (vs MC truth)")

    # truncated UT with growing irrelevant state dimension (truncated_mt_demo.py)
    rows = {}
    for dim in (2, 3, 5, 8):
        mean_d = jnp.concatenate([mean, jnp.zeros(dim - 2)])
        cov_d = jnp.asarray(np.diag([0.05 ** 2, (np.pi / 10) ** 2] + [1.0] * (dim - 2)))

        mf_full, cf_full, _ = UnscentedTransform(dim).apply(polar2cartesian, mean_d, cov_d, None)
        tut = TruncatedUnscentedTransform(dim, 2)
        mf_tr, cf_tr, _ = tut.apply(polar2cartesian, mean_d, cov_d, None)
        rows[f"dim={dim}"] = {
            "UT_skl": float(symmetrized_kl_divergence(mean_mc, cov_mc, mf_full, cf_full)),
            "TUT_skl": float(symmetrized_kl_divergence(mean_mc, cov_mc, mf_tr, cf_tr)),
        }
    print_tables(pd.DataFrame(rows).T, "truncated UT vs UT, growing irrelevant dims")


if __name__ == "__main__":
    main()
