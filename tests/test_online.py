"""Streaming filter API + checkpoint/resume tests."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import ssmtoybox_tpu as st
from ssmtoybox_tpu.online import make_online_filter
from ssmtoybox_tpu.ssmod import UNGMTransition, UNGMMeasurement
from ssmtoybox_tpu.utils import GaussRV
from ssmtoybox_tpu.utils.checkpoint import save_pytree, restore_pytree


def _setup():
    dyn = UNGMTransition.create(GaussRV.create(1, cov=5.0), GaussRV.create(1, cov=10.0))
    obs = UNGMMeasurement.create(GaussRV.create(1), dim_state=1)
    ukf = st.UnscentedKalman(dyn, obs)
    return dyn, obs, ukf


def test_online_matches_batch_forward():
    """Streaming per-measurement updates equal the scan-based forward pass."""
    dyn, obs, ukf = _setup()
    x = dyn.simulate_discrete(jax.random.PRNGKey(0), steps=25, mc_sims=1)
    y = obs.simulate_measurements(jax.random.PRNGKey(1), x)[..., 0]
    fm, fP = ukf.forward_pass(y)

    init, step = make_online_filter(dyn, obs, ukf.tf_dyn, ukf.tf_obs, donate=False)
    state = init()
    means = []
    for k in range(y.shape[1]):
        state, info = step(state, y[:, k])
        means.append(np.asarray(state.mean))
    np.testing.assert_allclose(np.stack(means, axis=-1), np.asarray(fm),
                               rtol=1e-9, atol=1e-9)


def test_online_dropout_keeps_prediction():
    dyn, obs, ukf = _setup()
    init, step = make_online_filter(dyn, obs, ukf.tf_dyn, ukf.tf_obs, donate=False)
    state = init()
    s1, _ = step(state, jnp.asarray([2.0]), observed=False)
    # with no measurement, the update must equal the pure prediction
    from ssmtoybox_tpu.ssinf import _gaussian_time_update
    m_pr, P_pr, *_ = _gaussian_time_update(dyn, obs, ukf.tf_dyn, ukf.tf_obs,
                                           state.mean, state.cov, 0)
    np.testing.assert_allclose(s1.mean, m_pr, rtol=1e-12)
    np.testing.assert_allclose(s1.cov, P_pr, rtol=1e-12)


def test_online_batched_multi_target():
    dyn, obs, ukf = _setup()
    init, step = make_online_filter(dyn, obs, ukf.tf_dyn, ukf.tf_obs,
                                    batch=True, donate=False)
    state = init(batch_size=6)
    ys = jnp.asarray(np.random.RandomState(0).randn(6, 1))
    state, info = step(state, ys)
    assert state.mean.shape == (6, 1)
    assert info.innov.shape == (6, 1)
    assert bool(jnp.isfinite(state.mean).all())


def test_checkpoint_roundtrip(tmp_path):
    dyn, obs, ukf = _setup()
    init, step = make_online_filter(dyn, obs, ukf.tf_dyn, ukf.tf_obs, donate=False)
    state = init()
    state, _ = step(state, jnp.asarray([1.0]))
    path = str(tmp_path / "ckpt")
    save_pytree(path, state)
    restored = restore_pytree(path, like=state)
    np.testing.assert_allclose(restored.mean, state.mean)
    np.testing.assert_allclose(restored.cov, state.cov)
    # resume: both continue identically
    s_a, _ = step(state, jnp.asarray([0.5]))
    s_b, _ = step(restored, jnp.asarray([0.5]))
    np.testing.assert_allclose(s_a.mean, s_b.mean, rtol=1e-12)


def test_online_donation_does_not_eat_model_buffers():
    """Regression: init() must copy the prior — donation previously deleted
    the model's own arrays after the first step."""
    dyn, obs, ukf = _setup()
    init, step = make_online_filter(dyn, obs, ukf.tf_dyn, ukf.tf_obs)  # donate=True
    state = init()
    state, _ = step(state, jnp.asarray([1.0]))
    state, _ = step(state, jnp.asarray([0.2]))
    # the model prior is still usable: a fresh stream can start
    state2 = init()
    state2, _ = step(state2, jnp.asarray([1.0]))
    assert bool(jnp.isfinite(state2.mean).all())
    np.testing.assert_allclose(np.asarray(dyn.init_rv.mean), 0.0)


def test_results_cache_roundtrip(tmp_path):
    """Study result caching (experiments/common.py, SURVEY §5.4)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from experiments.common import save_results, load_results
    path = str(tmp_path / "study.npz")
    save_results(path, fm=np.arange(6.0).reshape(2, 3), rmse=np.array([1.0, 2.0]))
    out = load_results(path)
    np.testing.assert_allclose(out["fm"], np.arange(6.0).reshape(2, 3))
    assert load_results(str(tmp_path / "missing.npz")) is None


def test_profiler_trace_writes(tmp_path):
    """jax.profiler trace context produces a trace directory (SURVEY §5.1)."""
    from ssmtoybox_tpu.utils import trace
    import os
    d = str(tmp_path / "trace")
    with trace(d):
        jnp.sum(jnp.arange(100.0)).block_until_ready()
    assert os.path.isdir(d) and len(os.listdir(d)) > 0


def test_checkpoint_refuses_silent_overwrite(tmp_path):
    from ssmtoybox_tpu.utils.checkpoint import save_pytree, restore_pytree
    import jax.numpy as jnp
    tree = {"a": jnp.arange(3.0)}
    p = str(tmp_path / "ckpt")
    save_pytree(p, tree)
    with pytest.raises(FileExistsError, match="overwrite=True"):
        save_pytree(p, tree)
    save_pytree(p, {"a": jnp.arange(3.0) + 1}, overwrite=True)
    out = restore_pytree(p, like=tree)
    np.testing.assert_allclose(np.asarray(out["a"]), [1.0, 2.0, 3.0])


def test_init_batch_size_guards():
    from ssmtoybox_tpu.online import make_online_filter
    import ssmtoybox_tpu as st
    from ssmtoybox_tpu.ssmod import UNGMTransition, UNGMMeasurement
    from ssmtoybox_tpu.utils import GaussRV
    dyn = UNGMTransition.create(GaussRV.create(1), GaussRV.create(1))
    obs = UNGMMeasurement.create(GaussRV.create(1), dim_state=1)
    tf = st.UnscentedTransform(1)
    init, _ = make_online_filter(dyn, obs, tf, tf, batch=False)
    with pytest.raises(ValueError, match="batch=True"):
        init(batch_size=4)


def test_fixed_lag_smoother_matches_offline_rts():
    """At each step n >= lag, the emitted estimate of x_{n-lag+1} given
    y_{1:n} must equal the offline textbook RTS run on the record truncated
    at n — the defining property of fixed-lag smoothing."""
    from ssmtoybox_tpu.online import make_fixed_lag_smoother
    from ssmtoybox_tpu.ssinf import gaussian_filter, gaussian_smoother
    dyn, obs, ukf = _setup()
    lag = 5
    steps = 14
    x = dyn.simulate_discrete(jax.random.PRNGKey(4), steps=steps, mc_sims=1)
    y = obs.simulate_measurements(jax.random.PRNGKey(5), x)[..., 0]

    init, step = make_fixed_lag_smoother(dyn, obs, ukf.tf_dyn, ukf.tf_obs,
                                         lag=lag, donate=False)
    state = init()
    for n in range(1, steps + 1):
        state, info, (sm_m, sm_P) = step(state, y[:, n - 1])
        if n >= lag:
            res = gaussian_filter(dyn, obs, ukf.tf_dyn, ukf.tf_obs, y[:, :n])
            sm_all, sP_all = gaussian_smoother(res, rts_full=True)
            np.testing.assert_allclose(np.asarray(sm_m), np.asarray(sm_all[:, n - lag]),
                                       rtol=1e-9, atol=1e-9, err_msg=f"n={n}")
            np.testing.assert_allclose(np.asarray(sm_P), np.asarray(sP_all[:, :, n - lag]),
                                       rtol=1e-9, atol=1e-9, err_msg=f"n={n}")


def test_fixed_lag_smoother_batched_and_guards():
    from ssmtoybox_tpu.online import make_fixed_lag_smoother
    dyn, obs, ukf = _setup()
    with pytest.raises(ValueError, match="lag >= 2"):
        make_fixed_lag_smoother(dyn, obs, ukf.tf_dyn, ukf.tf_obs, lag=1)
    init, step = make_fixed_lag_smoother(dyn, obs, ukf.tf_dyn, ukf.tf_obs,
                                         lag=3, batch=True, donate=False)
    with pytest.raises(ValueError, match="batch_size"):
        init()
    state = init(batch_size=4)
    y = jnp.ones((4, 1))
    for _ in range(6):
        state, info, (sm_m, sm_P) = step(state, y)
    assert sm_m.shape == (4, 1) and sm_P.shape == (4, 1, 1)
    assert bool(jnp.isfinite(sm_m).all())
