"""Time-parallel (associative-scan) Kalman filter/smoother vs sequential."""
import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

import ssmtoybox_tpu as st
from ssmtoybox_tpu.parallel.timescan import parallel_linear_filter, parallel_linear_smoother
from ssmtoybox_tpu.ssmod import ConstantVelocity, MeasurementModel
from ssmtoybox_tpu.utils import GaussRV


class LinearPositionMeasurement(MeasurementModel):
    """y = [p_x, p_y] + r — linear map for exactness of the UT."""

    dim_substate = 4
    dim_out = 2
    dim_noise = 2
    noise_additive = True

    def meas_fcn(self, x, r, time):
        return jnp.stack([x[0], x[2]]) + r


def _setup(steps=64):
    dt = 0.5
    x0 = GaussRV.create(4, mean=np.array([100., 10., -50., 4.]),
                        cov=np.diag([100.0, 25.0, 100.0, 25.0]))
    q = GaussRV.create(2, cov=np.diag([5.0, 5.0]))
    r = GaussRV.create(2, cov=np.diag([20.0, 20.0]))
    dyn = ConstantVelocity.create(x0, q, dt=dt)
    obs = LinearPositionMeasurement.create(r, dim_state=4)
    x = dyn.simulate_discrete(jax.random.PRNGKey(0), steps=steps, mc_sims=1)
    y = obs.simulate_measurements(jax.random.PRNGKey(1), x)[..., 0]

    F = np.array([[1, dt, 0, 0], [0, 1, 0, 0], [0, 0, 1, dt], [0, 0, 0, 1]])
    G = np.asarray(dyn.noise_gain)
    Q = G @ np.diag([5.0, 5.0]) @ G.T
    H = np.array([[1., 0, 0, 0], [0, 0, 1., 0]])
    R = np.diag([20.0, 20.0])
    return dyn, obs, x, y, F, Q, H, R, x0


def test_parallel_filter_matches_sequential():
    dyn, obs, x, y, F, Q, H, R, x0 = _setup()
    ukf = st.UnscentedKalman(dyn, obs)          # exact KF on a linear model
    fm_seq, fP_seq = ukf.forward_pass(y)
    fm_par, fP_par = parallel_linear_filter(F, Q, H, R, x0.mean, x0.cov, y)
    np.testing.assert_allclose(np.asarray(fm_par), np.asarray(fm_seq), rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(fP_par), np.asarray(fP_seq), rtol=1e-8, atol=1e-8)


def test_parallel_smoother_matches_sequential():
    dyn, obs, x, y, F, Q, H, R, x0 = _setup()
    ukf = st.UnscentedKalman(dyn, obs)
    ukf.forward_pass(y)
    sm_seq, sP_seq = ukf.backward_pass(rts_full=True)   # textbook RTS
    fm_par, fP_par = parallel_linear_filter(F, Q, H, R, x0.mean, x0.cov, y)
    sm_par, sP_par = parallel_linear_smoother(F, Q, fm_par, fP_par)
    np.testing.assert_allclose(np.asarray(sm_par), np.asarray(sm_seq), rtol=1e-7, atol=1e-7)
    np.testing.assert_allclose(np.asarray(sP_par), np.asarray(sP_seq), rtol=1e-7, atol=1e-7)


def test_parallel_filter_jits_and_scales():
    _, _, _, y, F, Q, H, R, x0 = _setup(steps=128)
    f = jax.jit(lambda data: parallel_linear_filter(F, Q, H, R, x0.mean, x0.cov, data))
    fm, fP = f(jnp.asarray(y))
    assert fm.shape == (4, 128)
    assert bool(jnp.isfinite(fm).all())
