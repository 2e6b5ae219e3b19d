"""Double-double engine benchmark on the headline study shapes.

Times, at the bench.py shapes, the engines that can run each lane:

UNGM UKF/GPQKF (10k trajectories x 500 steps):
- jnp-f64 ``gaussian_filter`` (the bench lane of record, emulated f64),
- dd ``scalar_filter_batch(engine="scan")`` — pure-f32 fused scan,
- dd ``scalar_filter_batch(engine="pallas")`` — whole-record single-launch
  Mosaic kernel per 512-trajectory tile,

Reentry UKF (10k trajectories x 100 steps, 5-D state; the lane that was
55% of the r4 headline):
- jnp-f64 ``gaussian_filter``,
- the r5 VECTOR dd engine ``ddvec.dd_filter_batch`` (full moment set).

Per engine: wall-clock plus two precision lines against the f64 lane —
study RMSE relative deviation (the statistical contract the studies
consume — ``research/bsq/bsq_ungm.py:130-138`` scores only filtered means)
and short-horizon (100-step) max pointwise deviation (the 1e-8-class
contract; long-horizon pointwise comparison is meaningless on UNGM, whose
recursion amplifies any rounding difference chaotically —
``ops/ddfilter.py`` module doc, tests/test_ddfilter.py).

Usage: python tools/bench_dd.py [--mc 10000] [--steps 500] [--json]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mc", type=int, default=10_000)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--unroll", type=int, default=8, help="scan engines' unroll")
    ap.add_argument("--json", action="store_true", help="emit one JSON line")
    args = ap.parse_args()

    import jax
    platform = os.environ.get("SSMTPU_PLATFORM", "").strip().lower()
    if platform:
        jax.config.update("jax_platforms", platform)
    jax.config.update("jax_enable_x64", True)
    # persistent compile cache shared with bench.py (compiles dominate
    # through the dev tunnel; SSMTPU_COMPILE_CACHE=0 disables)
    if os.environ.get("SSMTPU_COMPILE_CACHE", "1") != "0":
        import atexit
        from ssmtoybox_tpu.utils import hostenv
        cache = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_bench_cache")
        hostenv.enable_persistent_cache(jax, cache)
        atexit.register(hostenv.release_persistent_cache, cache)
    import jax.numpy as jnp
    import ssmtoybox_tpu as st
    from ssmtoybox_tpu.ops.ddfilter import scalar_filter_batch, supports
    from ssmtoybox_tpu.ssmod import UNGMTransition, UNGMMeasurement
    from ssmtoybox_tpu.utils import GaussRV

    print("devices:", jax.devices(), file=sys.stderr)

    dyn = UNGMTransition.create(GaussRV.create(1, cov=5.0),
                                GaussRV.create(1, cov=10.0))
    obs = UNGMMeasurement.create(GaussRV.create(1, cov=1.0), dim_state=1)
    x = dyn.simulate_discrete(jax.random.PRNGKey(0), steps=args.steps,
                              mc_sims=args.mc)
    y = obs.simulate_measurements(jax.random.PRNGKey(1), x)
    ys = jnp.moveaxis(y, -1, 0)                       # (M, 1, N)
    x_ref = jnp.moveaxis(x, -1, 0)                    # (M, 1, N)

    results = {}

    def timed(label, run, *a):
        out = run(*a)                                 # compile + warm
        float(jnp.sum(out))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(run(*a)))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(f"{label:<28} {t:.4f}s", flush=True)
        results[label] = t
        return out

    def report(cfg, tf_dyn, tf_obs):
        print(f"--- {cfg}: UNGM {args.mc}x{args.steps} ---", flush=True)
        assert supports(dyn, obs, tf_dyn, tf_obs)

        f64_run = jax.jit(lambda b: jax.vmap(
            lambda yy: st.gaussian_filter(dyn, obs, tf_dyn, tf_obs, yy,
                                          unroll=args.unroll))(b).fi_mean)
        out64 = timed(f"{cfg}/jnp_f64", f64_run, ys)

        dd_scan = jax.jit(lambda b: scalar_filter_batch(
            dyn, obs, tf_dyn, tf_obs, b, engine="scan", unroll=args.unroll))
        out_dd = timed(f"{cfg}/dd_scan", dd_scan, ys)

        dd_pal = jax.jit(lambda b: scalar_filter_batch(
            dyn, obs, tf_dyn, tf_obs, b, engine="pallas"))
        out_pal = timed(f"{cfg}/dd_pallas", dd_pal, ys)

        # statistical contract: study RMSE vs truth, relative deviation
        rmse = lambda o: float(jnp.sqrt(jnp.mean((x_ref - o) ** 2)))
        r64 = rmse(out64)
        for name, o in (("dd_scan", out_dd), ("dd_pallas", out_pal)):
            rel = abs(rmse(o) - r64) / r64
            results[f"{cfg}/{name}_rmse_rel_dev"] = rel
            print(f"  {name}: study-RMSE rel dev vs f64 = {rel:.2e}", flush=True)
        # short-horizon pointwise contract (first 100 steps)
        h = min(100, args.steps)
        for name, o in (("dd_scan", out_dd), ("dd_pallas", out_pal)):
            dev = float(jnp.max(jnp.abs(out64[..., :h] - o[..., :h])))
            results[f"{cfg}/{name}_ptwise_{h}"] = dev
            print(f"  {name}: max |dev| first {h} steps = {dev:.2e}", flush=True)

    ukf = st.UnscentedKalman(dyn, obs)
    report("ukf", ukf.tf_dyn, ukf.tf_obs)

    gpq = st.GaussianProcessKalman(dyn, obs, np.array([[1.0, 3.0]]),
                                   np.array([[1.0, 3.0]]), points="ut")
    report("gpqkf", gpq.tf_dyn, gpq.tf_obs)

    # ---- reentry lane: the r5 vector dd engine ---------------------------
    from ssmtoybox_tpu.ssmod import ReentryVehicle2DTransition, Radar2DMeasurement
    from ssmtoybox_tpu.ops.ddvec import dd_filter_batch, dd_supports

    re_steps = min(args.steps, 100)           # bench.py REENTRY_STEPS
    dyn_re = ReentryVehicle2DTransition.create(
        GaussRV.create(5, mean=np.array([6500.4, 349.14, -1.8093, -6.7967, 0.6932]),
                       cov=np.diag([1e-6, 1e-6, 1e-6, 1e-6, 1.0])),
        GaussRV.create(3, cov=np.diag([2.4064e-5, 2.4064e-5, 1e-6])), dt=0.05)
    obs_re = Radar2DMeasurement.create(GaussRV.create(2, cov=np.diag([1e-3, 1e-5])),
                                       dim_state=5, state_index=[0, 1],
                                       radar_loc=np.array([6374.0, 0.0]))
    x_re = dyn_re.simulate_discrete(jax.random.PRNGKey(2), steps=re_steps,
                                    mc_sims=args.mc)
    y_re = obs_re.simulate_measurements(jax.random.PRNGKey(3), x_re)
    ys_re = jnp.moveaxis(y_re, -1, 0)
    x_ref_re = jnp.moveaxis(x_re, -1, 0)
    ukf_re = st.UnscentedKalman(dyn_re, obs_re)
    assert dd_supports(dyn_re, obs_re, ukf_re.tf_dyn, ukf_re.tf_obs)
    print(f"--- reentry ukf: {args.mc}x{re_steps} ---", flush=True)

    f64_re = jax.jit(lambda b: jax.vmap(
        lambda yy: st.gaussian_filter(dyn_re, obs_re, ukf_re.tf_dyn,
                                      ukf_re.tf_obs, yy, unroll=1))(b).fi_mean)
    out64_re = timed("reentry/jnp_f64", f64_re, ys_re)
    dd_re = jax.jit(lambda b: dd_filter_batch(
        dyn_re, obs_re, ukf_re.tf_dyn, ukf_re.tf_obs, b).fi_mean)
    out_dd_re = timed("reentry/dd_vec", dd_re, ys_re)

    rmse_re = lambda o: float(jnp.sqrt(jnp.mean((x_ref_re - o) ** 2)))
    r64 = rmse_re(out64_re)
    rel = abs(rmse_re(out_dd_re) - r64) / r64
    results["reentry/dd_vec_rmse_rel_dev"] = rel
    print(f"  dd_vec: study-RMSE rel dev vs f64 = {rel:.2e}", flush=True)
    h = min(100, re_steps)
    dev = float(jnp.max(jnp.abs(out64_re[..., :h] - out_dd_re[..., :h])))
    results[f"reentry/dd_vec_ptwise_{h}"] = dev
    print(f"  dd_vec: max |dev| first {h} steps = {dev:.2e}", flush=True)

    if args.json:
        print(json.dumps({k: round(v, 6) for k, v in results.items()}),
              flush=True)


if __name__ == "__main__":
    main()
