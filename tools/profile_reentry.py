"""Attribute the reentry-lane wall-clock (bench.py's dominant lane) to its
per-step components on the real chip.

Strategy: time the full UKF scan, then ablated variants that stub out one
component each (dynamics transcendentals, measurement arctan2/sqrt,
choleskys), all at the bench shapes (10k trajectories x 100 steps, f64).
The difference full-vs-ablated bounds that component's share.

Usage: python tools/profile_reentry.py [--mc 10000] [--steps 100]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mc", type=int, default=10_000)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--unroll", type=int, default=1)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import ssmtoybox_tpu as st
    from ssmtoybox_tpu.ssmod import ReentryVehicle2DTransition, Radar2DMeasurement
    from ssmtoybox_tpu.utils import GaussRV

    print("devices:", jax.devices(), file=sys.stderr)

    dyn = ReentryVehicle2DTransition.create(
        GaussRV.create(5, mean=np.array([6500.4, 349.14, -1.8093, -6.7967, 0.6932]),
                       cov=np.diag([1e-6, 1e-6, 1e-6, 1e-6, 1.0])),
        GaussRV.create(3, cov=np.diag([2.4064e-5, 2.4064e-5, 1e-6])), dt=0.05)
    obs = Radar2DMeasurement.create(GaussRV.create(2, cov=np.diag([1e-3, 1e-5])),
                                    dim_state=5, state_index=[0, 1],
                                    radar_loc=np.array([6374.0, 0.0]))
    x = dyn.simulate_discrete(jax.random.PRNGKey(2), steps=args.steps, mc_sims=args.mc)
    y = obs.simulate_measurements(jax.random.PRNGKey(3), x)
    ys = jnp.moveaxis(y, -1, 0)
    ukf = st.UnscentedKalman(dyn, obs)

    def timed(label, dyn_v, obs_v):
        run = jax.jit(lambda b: jax.vmap(
            lambda yy: st.gaussian_filter(dyn_v, obs_v, ukf.tf_dyn, ukf.tf_obs,
                                          yy, unroll=args.unroll))(b).fi_mean)
        out = run(ys)
        float(jnp.sum(out))                               # compile+warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(run(ys)))
            ts.append(time.perf_counter() - t0)
        print(f"{label:<34} {min(ts):.4f}s", flush=True)
        return min(ts)

    t_full = timed("full reentry UKF", dyn, obs)

    # 1) dynamics transcendentals -> elementwise linear (keeps shapes/flow
    # identical; deliberately NO matmul — generic f64 dot is itself the slow
    # path this codebase's small_matmul exists to avoid)
    class LinDyn(type(dyn)):
        def dyn_fcn(self, x, q, k):
            dt = self.dt
            return jnp.stack([x[0] + dt * x[2], x[1] + dt * x[3],
                              x[2] + q[0], x[3] + q[1], x[4] + q[2]])

    dyn_lin = LinDyn(**{f.name: getattr(dyn, f.name)
                        for f in dyn.__dataclass_fields__.values()})
    t_lindyn = timed("dynamics -> linear", dyn_lin, obs)

    # 2) measurement arctan2/sqrt -> linear slice
    class LinObs(type(obs)):
        def meas_fcn(self, x, r, k):
            return x[:2] + r

    obs_lin = LinObs(**{f.name: getattr(obs, f.name)
                        for f in obs.__dataclass_fields__.values()})
    t_linobs = timed("measurement -> linear", dyn, obs_lin)
    t_allin = timed("both linear", dyn_lin, obs_lin)

    print(f"\nshare: dynamics transcendentals ~{t_full - t_lindyn:.4f}s, "
          f"measurement transcendentals ~{t_full - t_linobs:.4f}s, "
          f"linear-algebra core ~{t_allin:.4f}s", flush=True)


if __name__ == "__main__":
    main()
