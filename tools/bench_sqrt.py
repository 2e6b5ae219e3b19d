"""Square-root path benchmark: full-covariance vs factor-form, f64 vs f32.

Reproduces the `docs/performance.md` square-root tables on whatever backend
is active (run on the real chip for the published numbers): for UNGM-500 and
reentry-100 MC batches it times

- the full-covariance f64 filter (the parity configuration),
- the square-root filter in f64 and f32 (`sqrt.make_sqrt_filter`),
- the square-root GPQ (BQ) filter and RTS smoother in f32 (r3: the BQ
  factor/joint factorizations, `sqrt.py` module doc),

with forced completion (scalar fetch) and min-of-three timing like
`bench.py`.  `--mc N` overrides the batch size (default 10000);
`SSMTPU_SCAN_UNROLL` applies to the full-covariance scans.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    # SSMTPU_PLATFORM=cpu pins the backend through the config API — env vars
    # alone don't stop a dead TPU tunnel from hanging backend init
    # (sitecustomize imports jax at interpreter start; see tests/conftest.py)
    platform = os.environ.get("SSMTPU_PLATFORM", "").strip().lower()
    if platform:
        jax.config.update("jax_platforms", platform)
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import ssmtoybox_tpu as st
    from ssmtoybox_tpu.bq.transforms import GaussianProcessTransform
    from ssmtoybox_tpu.sqrt import make_sqrt_filter, make_sqrt_smoother
    from ssmtoybox_tpu.ssmod import (UNGMTransition, UNGMMeasurement,
                                     ReentryVehicle2DTransition, Radar2DMeasurement)
    from ssmtoybox_tpu.utils import GaussRV

    mc = 10_000
    if "--mc" in sys.argv:
        mc = int(sys.argv[sys.argv.index("--mc") + 1])
    print(f"backend={jax.default_backend()} mc={mc}", file=sys.stderr)

    def timed(thunk, n=3):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            float(jnp.sum(thunk()))          # forced completion (tunnel-safe)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    scenarios = []
    dyn_u = UNGMTransition.create(GaussRV.create(1, cov=5.0), GaussRV.create(1, cov=10.0))
    obs_u = UNGMMeasurement.create(GaussRV.create(1, cov=1.0), dim_state=1)
    scenarios.append(("UNGM-500", dyn_u, obs_u, 500))
    dyn_r = ReentryVehicle2DTransition.create(
        GaussRV.create(5, mean=np.array([6500.4, 349.14, -1.8093, -6.7967, 0.6932]),
                       cov=np.diag([1e-6, 1e-6, 1e-6, 1e-6, 1.0])),
        GaussRV.create(3, cov=np.diag([2.4064e-5, 2.4064e-5, 1e-6])), dt=0.05)
    obs_r = Radar2DMeasurement.create(GaussRV.create(2, cov=np.diag([1e-3, 1e-5])),
                                      dim_state=5, state_index=[0, 1],
                                      radar_loc=np.array([6374.0, 0.0]))
    scenarios.append(("Reentry-100", dyn_r, obs_r, 100))

    for name, dyn, obs, steps in scenarios:
        x = dyn.simulate_discrete(jax.random.PRNGKey(0), steps=steps, mc_sims=mc)
        y = obs.simulate_measurements(jax.random.PRNGKey(1), x)
        ys = jnp.moveaxis(y, -1, 0)
        ukf = st.UnscentedKalman(dyn, obs)

        full = jax.jit(lambda b: jax.vmap(
            lambda yy: st.gaussian_filter(dyn, obs, ukf.tf_dyn, ukf.tf_obs, yy).fi_mean)(b))
        full(ys)
        t_full = timed(lambda: full(ys))

        sr64 = make_sqrt_filter(dyn, obs, ukf.tf_dyn, ukf.tf_obs)
        v64 = jax.jit(lambda b: jax.vmap(lambda yy: sr64(yy).fi_mean)(b))
        v64(ys)
        t_sr64 = timed(lambda: v64(ys))

        sr32 = make_sqrt_filter(dyn, obs, ukf.tf_dyn, ukf.tf_obs, dtype=jnp.float32)
        ys32 = ys.astype(jnp.float32)
        v32 = jax.jit(lambda b: jax.vmap(lambda yy: sr32(yy).fi_mean)(b))
        v32(ys32)
        t_sr32 = timed(lambda: v32(ys32))
        print(f"{name} x{mc}: full-cov f64 {t_full:.3f}s | SR f64 {t_sr64:.3f}s "
              f"| SR f32 {t_sr32:.3f}s")

    # --- square-root BQ (GPQ) filter + smoother, f32, UNGM ---
    kp = np.array([[1.0, 3.0]])
    tfd = GaussianProcessTransform.create(1, 1, kp, point_str="ut")
    tfo = GaussianProcessTransform.create(1, 1, kp, point_str="ut")
    x = dyn_u.simulate_discrete(jax.random.PRNGKey(0), steps=500, mc_sims=mc)
    y = obs_u.simulate_measurements(jax.random.PRNGKey(1), x)
    ys32 = jnp.moveaxis(y, -1, 0).astype(jnp.float32)

    bq32 = make_sqrt_filter(dyn_u, obs_u, tfd, tfo, dtype=jnp.float32)
    vb = jax.jit(lambda b: jax.vmap(lambda yy: bq32(yy).fi_mean)(b))
    vb(ys32)
    t_bqf = timed(lambda: vb(ys32))

    sm32 = make_sqrt_smoother(dyn_u, obs_u, tfd, tfo, dtype=jnp.float32)
    vs = jax.jit(lambda b: jax.vmap(lambda yy: sm32(yy)[1])(b))
    vs(ys32)
    t_bqs = timed(lambda: vs(ys32))
    print(f"UNGM-500 x{mc} sqrt-GPQ f32: filter {t_bqf:.3f}s | "
          f"filter+RTS smoother {t_bqs:.3f}s")


if __name__ == "__main__":
    main()
