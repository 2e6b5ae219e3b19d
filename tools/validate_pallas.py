"""On-hardware numerical validation of the Pallas TPU (Mosaic) kernels.

tests/test_pallas_ops.py exercises the kernels in interpret mode only (CPU
CI); a Mosaic-specific regression (tiling, padding, f32 accumulation) would
ship silently.  This tool runs on the real backend and records machine-
readable evidence (PALLAS_VALIDATION.json + stderr lines):

1. *Compiled vs interpret, identical inputs* — the sharp check: the same
   algorithm on the same sample stream, so any disagreement beyond f32
   accumulation-order noise is a Mosaic lowering bug.
2. *Compiled vs the jnp f64 scan paths* — a statistical check: independent
   Monte-Carlo streams must agree to the MC error of the sample budget
   (~3/sqrt(N) per estimate, doubled for two independent estimates).
3. *vandermonde vs the jnp/native path* — exact on sigma-point-scale inputs
   up to the documented f32 round trip.

Run directly (``python tools/validate_pallas.py``) or via ``bench.py``
(called automatically; failures fail the bench loudly).
"""
import json
import os
import sys

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def validate(num_samples_stat: int = 200_000, num_samples_exact: int = 2_000_000,
             out_path: str | None = None) -> dict:
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from ssmtoybox_tpu.bq.kernels import RBFStudent
    from ssmtoybox_tpu.ops import pallas_ops as P
    from ssmtoybox_tpu.points import fs_points
    from ssmtoybox_tpu.utils.combin import n_sum_k, vandermonde as vdm_jnp

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    checks = []

    def record(name, a, b, tol):
        diff = float(np.max(np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))))
        ok = bool(diff <= tol)
        checks.append({"name": name, "max_abs_diff": diff, "tol": tol, "ok": ok})
        log(f"pallas-validate {name}: max|diff|={diff:.3e} tol={tol:.1e} "
            f"{'OK' if ok else 'FAIL'}")

    dim = 2
    par = np.array([[1.0, 0.9, 1.4]])
    x = np.asarray(fs_points(dim, degree=3, kappa=0.0, dof=4.0))
    key = jax.random.PRNGKey(7)

    # 1. compiled Mosaic vs interpret mode, identical sample stream ---------
    qc, rc, Qc = P.student_expectations(par, jnp.asarray(x), 4.0,
                                        num_samples=num_samples_exact, key=key,
                                        interpret=False)
    qi, ri, Qi = P.student_expectations(par, jnp.asarray(x), 4.0,
                                        num_samples=num_samples_exact, key=key,
                                        interpret=True)
    record("student_expectations/q compiled-vs-interpret", qc, qi, 1e-4)
    record("student_expectations/R compiled-vs-interpret", rc, ri, 1e-4)
    record("student_expectations/Q compiled-vs-interpret", Qc, Qi, 1e-4)

    kc = P.student_kxy(par, dim, 4.0, num_samples=num_samples_exact, key=key,
                       interpret=False)
    ki = P.student_kxy(par, dim, 4.0, num_samples=num_samples_exact, key=key,
                       interpret=True)
    record("student_kxy compiled-vs-interpret", kc, ki, 1e-4)

    # 2. compiled Mosaic vs the jnp f64 scan paths (independent MC streams) -
    #    each estimate carries ~3/sqrt(N) MC error; two independent streams
    mc_tol = 6.0 / np.sqrt(num_samples_stat)
    # 'force' guarantees the Pallas kernels actually execute: plain True
    # defers to the backend at trace time, and a dispatch regression (or a
    # non-TPU backend) would silently turn check 2 into scan-vs-scan
    kern_p = RBFStudent.create(dim, par, dof=4.0, num_samples=num_samples_stat,
                               use_pallas="force")
    kern_j = RBFStudent.create(dim, par, dof=4.0, num_samples=num_samples_stat,
                               num_batches=50, use_pallas=False)
    qp, Rp, Qp = kern_p.exp_x_qRQ(jnp.asarray(par), jnp.asarray(x))
    qj, Rj, Qj = kern_j.exp_x_qRQ(jnp.asarray(par), jnp.asarray(x))
    record("student_expectations/q vs jnp-f64-scan", qp, qj, mc_tol)
    record("student_expectations/R vs jnp-f64-scan", Rp, Rj, mc_tol)
    record("student_expectations/Q vs jnp-f64-scan", Qp, Qj, mc_tol)
    record("student_kxy vs jnp-f64-scan",
           kern_p.exp_xy_kxy(jnp.asarray(par)),
           kern_j.exp_xy_kxy(jnp.asarray(par)), mc_tol)

    # 2b. custom-VJP backward kernels, compiled vs interpret (same stream) --
    #     a Mosaic lowering regression in the gradient kernels would
    #     otherwise only surface off-hardware
    a_q = jnp.asarray(np.random.default_rng(1).normal(size=qc.shape))
    a_R = jnp.asarray(np.random.default_rng(2).normal(size=rc.shape))
    a_Q = jnp.asarray(np.random.default_rng(3).normal(size=Qc.shape))

    def loss_qrq(par_, interp):
        q, R, Q = P.student_expectations(par_, jnp.asarray(x), 4.0,
                                         num_samples=num_samples_stat, key=key,
                                         interpret=interp)
        return jnp.sum(a_q * q) + jnp.sum(a_R * R) + jnp.sum(a_Q * Q)

    gc = jax.grad(lambda p: loss_qrq(p, False))(jnp.asarray(par))
    gi = jax.grad(lambda p: loss_qrq(p, True))(jnp.asarray(par))
    record("student_expectations/grad compiled-vs-interpret", gc, gi, 1e-4)
    gkc = jax.grad(lambda p: P.student_kxy(p, dim, 4.0, num_samples=num_samples_stat,
                                           key=key, interpret=False))(jnp.asarray(par))
    gki = jax.grad(lambda p: P.student_kxy(p, dim, 4.0, num_samples=num_samples_stat,
                                           key=key, interpret=True))(jnp.asarray(par))
    record("student_kxy/grad compiled-vs-interpret", gkc, gki, 1e-4)

    # 2c. dd whole-record Mosaic kernel (ops/ddscan_pallas.py), the r4
    #     engine: compiled-vs-interpret on a fixed UNGM record (sharp Mosaic
    #     lowering check — the kernel's own comments record three v5e
    #     legalization traps hit during development), plus compiled-pallas
    #     vs the dd lax.scan twin, plus the r5 VECTOR dd engine (ops/
    #     ddvec.py) vs the jnp-f64 filter on a short reentry record
    #     (VERDICT r4 #3)
    import ssmtoybox_tpu as st
    from ssmtoybox_tpu.ops.ddfilter import scalar_filter_batch
    from ssmtoybox_tpu.ops.ddvec import dd_filter_batch
    from ssmtoybox_tpu.ssinf import gaussian_filter_batch
    from ssmtoybox_tpu.ssmod import (UNGMTransition, UNGMMeasurement,
                                     ReentryVehicle2DTransition,
                                     Radar2DMeasurement)
    from ssmtoybox_tpu.utils import GaussRV

    dyn = UNGMTransition.create(GaussRV.create(1, cov=5.0),
                                GaussRV.create(1, cov=10.0))
    obs = UNGMMeasurement.create(GaussRV.create(1, cov=1.0), dim_state=1)
    xs_u = dyn.simulate_discrete(jax.random.PRNGKey(11), steps=64, mc_sims=600)
    ys_u = jnp.moveaxis(obs.simulate_measurements(jax.random.PRNGKey(12), xs_u),
                        -1, 0)
    ukf = st.UnscentedKalman(dyn, obs)
    dd_args = (dyn, obs, ukf.tf_dyn, ukf.tf_obs, ys_u)
    record("dd_pallas compiled-vs-interpret",
           scalar_filter_batch(*dd_args, engine="pallas", block_b=512,
                               interpret=False),
           scalar_filter_batch(*dd_args, engine="pallas", block_b=512,
                               interpret=True), 1e-10)
    record("dd_pallas vs dd_scan",
           scalar_filter_batch(*dd_args, engine="pallas", block_b=512),
           scalar_filter_batch(*dd_args, engine="scan"), 1e-10)

    dyn_re = ReentryVehicle2DTransition.create(
        GaussRV.create(5, mean=np.array([6500.4, 349.14, -1.8093, -6.7967, 0.6932]),
                       cov=np.diag([1e-6, 1e-6, 1e-6, 1e-6, 1.0])),
        GaussRV.create(3, cov=np.diag([2.4064e-5, 2.4064e-5, 1e-6])), dt=0.05)
    obs_re = Radar2DMeasurement.create(GaussRV.create(2, cov=np.diag([1e-3, 1e-5])),
                                       dim_state=5, state_index=[0, 1],
                                       radar_loc=np.array([6374.0, 0.0]))
    x_re = dyn_re.simulate_discrete(jax.random.PRNGKey(13), steps=30, mc_sims=32)
    ys_re = jnp.moveaxis(obs_re.simulate_measurements(jax.random.PRNGKey(14), x_re),
                         -1, 0)
    ukf_re = st.UnscentedKalman(dyn_re, obs_re)
    res_dd = jax.jit(lambda b: dd_filter_batch(
        dyn_re, obs_re, ukf_re.tf_dyn, ukf_re.tf_obs, b))(ys_re)
    res_64 = jax.jit(lambda b: gaussian_filter_batch(
        dyn_re, obs_re, ukf_re.tf_dyn, ukf_re.tf_obs, b))(ys_re)
    # short horizon: measured dev ~3e-9 on CPU-f64; on-TPU f64 is itself
    # emulated (different rounding), so the bound is the shared precision
    # class, not the dd grain
    record("ddvec reentry vs f64 fi_mean", res_dd.fi_mean, res_64.fi_mean, 1e-5)
    record("ddvec reentry vs f64 fi_cov", res_dd.fi_cov, res_64.fi_cov, 1e-6)

    # 3. vandermonde: Mosaic vs the jnp twin on a degree<=3 multi-index -----
    mul_ind = np.asarray(n_sum_k(dim, 3))
    xs = np.asarray(x, np.float64)
    record("vandermonde compiled-vs-jnp",
           P.vandermonde(mul_ind, jnp.asarray(xs), interpret=False),
           vdm_jnp(mul_ind, jnp.asarray(xs)), 1e-6)

    result = {"backend": backend, "on_tpu": on_tpu,
              "num_samples_exact": num_samples_exact,
              "num_samples_stat": num_samples_stat,
              "checks": checks, "ok": all(c["ok"] for c in checks)}
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)
        log(f"pallas-validate: wrote {out_path} (ok={result['ok']}, backend={backend})")
    return result


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    result = validate(out_path=os.path.join(repo, "PALLAS_VALIDATION.json"))
    if not result["ok"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
