"""Multi-device tests on the 8-way virtual CPU mesh (SURVEY §4 strategy)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import ssmtoybox_tpu as st
from ssmtoybox_tpu.parallel import (
    make_mesh, shard_mc, filter_mc_sharded, mc_metrics_sharded, fit_kernel_params)
from ssmtoybox_tpu.ssmod import UNGMTransition, UNGMMeasurement
from ssmtoybox_tpu.utils import GaussRV


@pytest.fixture(scope="module")
def setup():
    dyn = UNGMTransition.create(GaussRV.create(1, cov=5.0), GaussRV.create(1, cov=10.0))
    obs = UNGMMeasurement.create(GaussRV.create(1), dim_state=1)
    x = dyn.simulate_discrete(jax.random.PRNGKey(0), steps=40, mc_sims=16)
    y = obs.simulate_measurements(jax.random.PRNGKey(1), x)
    return dyn, obs, x, y


def test_sharded_filter_matches_unsharded(setup):
    dyn, obs, x, y = setup
    mesh = make_mesh(dp=8, fb=1)
    ukf = st.UnscentedKalman(dyn, obs)
    batch = jnp.moveaxis(y, -1, 0)
    sharded = filter_mc_sharded(dyn, obs, ukf.tf_dyn, ukf.tf_obs, batch, mesh)
    local = ukf.forward_pass_batch(batch)
    np.testing.assert_allclose(np.asarray(sharded.fi_mean), np.asarray(local.fi_mean),
                               rtol=1e-10, atol=1e-10)
    # the MC axis must actually be sharded over dp
    assert "dp" in str(sharded.fi_mean.sharding.spec)


def test_sharded_metrics(setup):
    dyn, obs, x, y = setup
    mesh = make_mesh(dp=8, fb=1)
    ukf = st.UnscentedKalman(dyn, obs)
    batch = jnp.moveaxis(y, -1, 0)
    out = filter_mc_sharded(dyn, obs, ukf.tf_dyn, ukf.tf_obs, batch, mesh)
    m = mc_metrics_sharded(jnp.moveaxis(x, -1, 0), out, mesh)
    assert np.isfinite(float(m))


def test_dp_fb_mesh(setup):
    mesh = make_mesh(dp=4, fb=2)
    assert mesh.shape == {"dp": 4, "fb": 2}


def test_fit_on_mesh_decreases_loss(setup):
    dyn, _, _, _ = setup
    from ssmtoybox_tpu.bq.models import GaussianProcessModel
    mesh = make_mesh(dp=8, fb=1)
    gp = GaussianProcessModel.create(1, np.array([[1.0, 1.0]]), "rbf", "ut")
    fo = jax.vmap(lambda s: jax.vmap(lambda c: dyn.dyn_eval(c, 0), in_axes=1)(gp.points * s))(
        jnp.linspace(0.5, 2.0, 16))
    lp, losses = fit_kernel_params(gp, jnp.zeros(2), fo, gp.points, num_steps=40, mesh=mesh)
    assert float(losses[-1]) < float(losses[0])
    assert np.all(np.isfinite(np.asarray(lp)))


def test_fit_pads_non_divisible_batch(setup):
    """Regression: a batch not divisible by dp (the reference's canonical
    B=100 never is, on a power-of-two mesh) used to crash device_put; it is
    now padded with zero-weight rows, keeping the objective exactly equal
    to the unpadded one."""
    dyn, _, _, _ = setup
    from ssmtoybox_tpu.bq.models import GaussianProcessModel
    from ssmtoybox_tpu.parallel.fit import nlml_loss
    mesh = make_mesh(dp=8, fb=1)
    gp = GaussianProcessModel.create(1, np.array([[1.0, 1.0]]), "rbf", "ut")
    fo = jax.vmap(lambda s: jax.vmap(lambda c: dyn.dyn_eval(c, 0), in_axes=1)(gp.points * s))(
        jnp.linspace(0.5, 2.0, 10))         # B=10: not divisible by dp=8
    lp, losses = fit_kernel_params(gp, jnp.zeros(2), fo, gp.points, num_steps=5, mesh=mesh)
    assert np.all(np.isfinite(np.asarray(losses)))
    # the padded, weighted first loss equals the unpadded unweighted one
    l0 = float(nlml_loss(gp, jnp.zeros(2), fo, gp.points))
    np.testing.assert_allclose(float(losses[0]), l0, rtol=1e-10)


def test_graft_entry_points():
    """The driver-facing entry points compile and execute."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == (5,) and out[1].shape == (5, 5)
    g.dryrun_multichip(8)


_REPO = __import__("os").path.dirname(__import__("os").path.dirname(
    __import__("os").path.abspath(__file__)))


def _driver_like_env(xla_device_count=8):
    """The multichip driver's environment, replicated from the image's own:
    sitecustomize on PYTHONPATH (axon vars intact), ``JAX_PLATFORMS=cpu``,
    ``--xla_force_host_platform_device_count=N`` — NOT tunnel-stripped."""
    import os
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_PLATFORM_NAME", None)
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={xla_device_count}"
    site = "/root/.axon_site"
    if os.path.isdir(site):
        pyp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p]
        if site not in pyp:
            env["PYTHONPATH"] = os.pathsep.join([site] + pyp)
    return env


def test_dryrun_driver_invocation():
    """Regression for MULTICHIP_r01-r03 (red 3/3 rounds): the driver's EXACT
    invocation — sitecustomize on PYTHONPATH, ``JAX_PLATFORMS=cpu``,
    ``XLA_FLAGS=--xla_force_host_platform_device_count=8``,
    ``python -c "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"``
    — must exit 0.  Under sitecustomize the in-process backend ignores both
    knobs (r3: 1 tpu device), so dryrun_multichip must route through the
    cleaned-env bootstrap subprocess, never an in-process fast path."""
    import subprocess, sys
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd=_REPO, env=_driver_like_env(8), capture_output=True, text=True,
        timeout=900)
    assert proc.returncode == 0, (
        f"driver-style dryrun failed rc={proc.returncode}\n"
        f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-4000:]}")


def test_dryrun_inprocess_backend_too_small_bootstraps():
    """Deterministic reproduction of the r3 failure mode, tunnel-independent:
    a process whose env advertises 8 devices but whose ALREADY-INITIALIZED
    backend has only 1 (like sitecustomize's override) must bootstrap the
    cleaned-env subprocess instead of asserting in-process."""
    import subprocess, sys
    import __graft_entry__
    child = "\n".join([
        "import jax",
        "jax.config.update('jax_platforms', 'cpu')",
        "jax.config.update('jax_num_cpu_devices', 1)",
        "assert len(jax.devices()) == 1          # backend initialized, too small",
        "import __graft_entry__",
        "__graft_entry__.dryrun_multichip(8)      # must NOT assert in-process",
    ])
    env = __graft_entry__._cpu_env(num_devices=8)   # env says 8; backend will say 1
    env["PYTHONPATH"] = _REPO
    proc = subprocess.run([sys.executable, "-c", child], cwd=_REPO, env=env,
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (
        f"mismatch dryrun failed rc={proc.returncode}\n"
        f"stderr:\n{proc.stderr[-4000:]}")


def test_sqrt_filter_sharded(setup):
    """The f32 square-root serving path runs sharded over the dp axis: 16
    trajectories on an 8-device mesh, factors PD on every shard."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ssmtoybox_tpu.sqrt import make_sqrt_filter
    import ssmtoybox_tpu as st
    dyn, obs, x, y = setup
    mesh = make_mesh(dp=8, fb=1)
    tf = st.UnscentedTransform(1)
    f = jax.jit(jax.vmap(make_sqrt_filter(dyn, obs, tf, tf, dtype=jnp.float32)))
    batch = jax.device_put(jnp.moveaxis(y, -1, 0),
                           NamedSharding(mesh, P("dp", None, None)))
    out = f(batch)
    assert out.fi_mean.dtype == jnp.float32
    assert "dp" in str(out.fi_mean.sharding.spec) or out.fi_mean.sharding.is_fully_replicated is False
    diag = np.asarray(out.fi_sqrt)[:, 0, 0, :]
    assert np.isfinite(np.asarray(out.fi_mean)).all() and (diag > 0).all()
    # agrees with the unsharded run
    local = jax.vmap(make_sqrt_filter(dyn, obs, tf, tf, dtype=jnp.float32))(
        jnp.moveaxis(y, -1, 0))
    np.testing.assert_allclose(np.asarray(out.fi_mean), np.asarray(local.fi_mean),
                               rtol=1e-5, atol=1e-5)


def test_filter_bank_sharded(setup):
    """A bank of kernel-parameter variants runs as one (dp, fb) SPMD program
    and matches per-member unsharded runs."""
    from ssmtoybox_tpu.parallel import filter_bank_sharded
    from ssmtoybox_tpu.bq.transforms import GaussianProcessTransform
    dyn, obs, x, y = setup
    mesh = make_mesh(dp=4, fb=2)
    tfs = [GaussianProcessTransform.create(1, 1, np.array([[1.0, el]]), point_str="ut")
           for el in (1.0, 3.0)]
    bank = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *tfs)
    batch = jnp.moveaxis(y, -1, 0)
    out = filter_bank_sharded(dyn, obs, bank, bank, batch, mesh)
    assert out.fi_mean.shape == (2, 16, 1, 40)
    assert "fb" in str(out.fi_mean.sharding.spec)
    # member 1 must equal the plain sharded/vmapped run with that transform
    import ssmtoybox_tpu as st
    single = st.ssinf.gaussian_filter_batch(dyn, obs, tfs[1], tfs[1], batch)
    np.testing.assert_allclose(np.asarray(out.fi_mean[1]), np.asarray(single.fi_mean),
                               rtol=1e-10, atol=1e-10)


def test_iterated_smoother_sharded(setup):
    """The time-parallel iterated smoother composes with dp sharding: a batch
    of records sharded over the 8-device mesh matches the unsharded run."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ssmtoybox_tpu.parallel import iterated_parallel_smoother
    dyn, obs, x, y = setup
    mesh = make_mesh(dp=8, fb=1)
    tf = st.UnscentedTransform(1)
    run = jax.jit(jax.vmap(lambda d: iterated_parallel_smoother(
        dyn, obs, tf, tf, d, iterations=2)))
    batch = jax.device_put(jnp.moveaxis(y, -1, 0),
                           NamedSharding(mesh, P("dp", None, None)))
    out = run(batch)
    assert not out.sm_mean.sharding.is_fully_replicated
    local = run(jnp.moveaxis(y, -1, 0))
    np.testing.assert_allclose(np.asarray(out.sm_mean), np.asarray(local.sm_mean),
                               rtol=1e-8, atol=1e-8)
    assert np.isfinite(np.asarray(out.sm_cov)).all()


def test_non_divisible_mc_batch_is_padded(setup):
    """The reference's canonical studies use mc=100, which no power-of-two
    mesh divides — the study helpers must pad/un-pad transparently."""
    dyn, obs, x, y = setup
    mesh = make_mesh(dp=8, fb=1)
    ukf = st.UnscentedKalman(dyn, obs)
    batch = jnp.moveaxis(y, -1, 0)[:12]            # 12 % 8 != 0
    out = filter_mc_sharded(dyn, obs, ukf.tf_dyn, ukf.tf_obs, batch, mesh)
    assert out.fi_mean.shape[0] == 12
    local = ukf.forward_pass_batch(batch)
    np.testing.assert_allclose(np.asarray(out.fi_mean), np.asarray(local.fi_mean),
                               rtol=1e-9, atol=1e-9)
    r = mc_metrics_sharded(jnp.moveaxis(x, -1, 0)[:12], out, mesh)
    assert np.isfinite(float(r))


def test_mesh_and_metric_guards(setup):
    dyn, obs, x, y = setup
    with pytest.raises(ValueError, match="devices"):
        make_mesh(fb=16)                            # 8 devices -> dp = 0
    mesh = make_mesh(dp=8)
    ukf = st.UnscentedKalman(dyn, obs)
    batch = jnp.moveaxis(y, -1, 0)
    out = filter_mc_sharded(dyn, obs, ukf.tf_dyn, ukf.tf_obs, batch, mesh)
    bank_like = out.replace(fi_mean=out.fi_mean[None])   # (1, M, D, N)
    with pytest.raises(ValueError, match="must match"):
        mc_metrics_sharded(jnp.moveaxis(x, -1, 0), bank_like, mesh)


def test_multihost_virtual_topology(setup):
    """SURVEY §5.8 / DCN shape: a (2 hosts x 4 devices) virtual topology —
    host-major dp blocks, fb within a host — produces moments identical to
    the unsharded run, and rejects fb slices that would straddle hosts."""
    from ssmtoybox_tpu.parallel import make_multihost_mesh, shard_mc_local
    dyn, obs, x, y = setup
    mesh = make_multihost_mesh(process_shape=(2, 4))
    assert mesh.shape == {"dp": 8, "fb": 1}
    # host-major layout: first 4 dp rows are host-0 devices, in order
    devs = np.asarray(mesh.devices).ravel()
    assert [d.id for d in devs[:4]] == [d.id for d in jax.devices()[:4]]

    ukf = st.UnscentedKalman(dyn, obs)
    batch = shard_mc_local(jnp.moveaxis(y, -1, 0), mesh)   # single-process: degenerates
    out = filter_mc_sharded(dyn, obs, ukf.tf_dyn, ukf.tf_obs, batch, mesh)
    local = ukf.forward_pass_batch(jnp.moveaxis(y, -1, 0))
    np.testing.assert_allclose(np.asarray(out.fi_mean), np.asarray(local.fi_mean),
                               rtol=1e-10, atol=1e-10)
    m = mc_metrics_sharded(jnp.moveaxis(x, -1, 0), out, mesh)
    assert np.isfinite(float(m))

    # fb=2 within 4-device hosts is fine; fb=8 would straddle hosts
    assert make_multihost_mesh(fb=2, process_shape=(2, 4)).shape == {"dp": 4, "fb": 2}
    with pytest.raises(ValueError, match="straddling"):
        make_multihost_mesh(fb=8, process_shape=(2, 4))
    with pytest.raises(ValueError, match="tile"):
        make_multihost_mesh(process_shape=(3, 3))


def test_presharded_batch_consumed_as_is(setup):
    """A batch that is already a global array sharded over this mesh's dp
    axis (the multi-host ingestion path) is consumed without a repad —
    host-side padding would touch non-addressable shards in a real
    multi-process run.  (A NON-divisible pre-sharded batch cannot even be
    constructed — jax rejects the sharding at device_put/assembly time — so
    the library's divisibility guard is defense-in-depth only.)"""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ssmtoybox_tpu.parallel import make_multihost_mesh
    dyn, obs, x, y = setup
    mesh = make_multihost_mesh(process_shape=(2, 4))
    ukf = st.UnscentedKalman(dyn, obs)
    pre = jax.device_put(jnp.moveaxis(y, -1, 0),
                         NamedSharding(mesh, P("dp", None, None)))
    out = filter_mc_sharded(dyn, obs, ukf.tf_dyn, ukf.tf_obs, pre, mesh)
    local = ukf.forward_pass_batch(jnp.moveaxis(y, -1, 0))
    np.testing.assert_allclose(np.asarray(out.fi_mean), np.asarray(local.fi_mean),
                               rtol=1e-10, atol=1e-10)


@pytest.mark.slow
def test_multihost_two_process_cluster(tmp_path):
    """The real thing: a 2-process jax.distributed CPU cluster (4 devices
    each), global (dp=8, fb=1) mesh, per-process data via shard_mc_local —
    the globally-sharded filter metric must match the single-process value."""
    import subprocess, sys, os
    script = r"""
import os, sys
proc_id = int(sys.argv[1]); port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 4)
except AttributeError:
    pass
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=proc_id)
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp
import ssmtoybox_tpu as st
from ssmtoybox_tpu.parallel import (make_multihost_mesh, shard_mc_local,
                                    filter_mc_sharded, mc_metrics_sharded)
from ssmtoybox_tpu.ssmod import UNGMTransition, UNGMMeasurement
from ssmtoybox_tpu.utils import GaussRV

assert jax.process_count() == 2 and len(jax.devices()) == 8
dyn = UNGMTransition.create(GaussRV.create(1, cov=5.0), GaussRV.create(1, cov=10.0))
obs = UNGMMeasurement.create(GaussRV.create(1), dim_state=1)
x = dyn.simulate_discrete(jax.random.PRNGKey(0), steps=40, mc_sims=16)
y = obs.simulate_measurements(jax.random.PRNGKey(1), x)
batch = np.moveaxis(np.asarray(y), -1, 0)        # (16, 1, 40), same on both procs
mesh = make_multihost_mesh()
assert mesh.shape == {"dp": 8, "fb": 1}
local_rows = batch[proc_id * 8:(proc_id + 1) * 8]
gbatch = shard_mc_local(local_rows, mesh)
assert gbatch.shape[0] == 16
ukf = st.UnscentedKalman(dyn, obs)
out = filter_mc_sharded(dyn, obs, ukf.tf_dyn, ukf.tf_obs, gbatch, mesh)
xt = shard_mc_local(np.moveaxis(np.asarray(x), -1, 0)[proc_id * 8:(proc_id + 1) * 8], mesh)
m = float(mc_metrics_sharded(xt, out, mesh))
print(f"METRIC {m:.12f}", flush=True)
"""
    sp = str(tmp_path / "worker.py")
    with open(sp, "w") as f:
        f.write(script)
    port = "12765"
    # tunnel-immune child env (strips the axon relay vars so sitecustomize
    # can't dial a dead tunnel at interpreter start — the MULTICHIP_r02
    # failure mode); shared with the driver's multi-chip dryrun
    import __graft_entry__
    env = __graft_entry__._cpu_env(num_devices=4)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [subprocess.Popen([sys.executable, sp, str(i), port],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True, env=env) for i in range(2)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    metrics = [float(l.split()[1]) for o in outs for l in o.splitlines()
               if l.startswith("METRIC")]
    assert len(metrics) == 2
    np.testing.assert_allclose(metrics[0], metrics[1], rtol=1e-12)

    # single-process ground truth on the default mesh
    dyn = UNGMTransition.create(GaussRV.create(1, cov=5.0), GaussRV.create(1, cov=10.0))
    obs = UNGMMeasurement.create(GaussRV.create(1), dim_state=1)
    x = dyn.simulate_discrete(jax.random.PRNGKey(0), steps=40, mc_sims=16)
    y = obs.simulate_measurements(jax.random.PRNGKey(1), x)
    ukf = st.UnscentedKalman(dyn, obs)
    mesh = make_mesh(dp=8)
    out = filter_mc_sharded(dyn, obs, ukf.tf_dyn, ukf.tf_obs,
                            jnp.moveaxis(y, -1, 0), mesh)
    ref = float(mc_metrics_sharded(jnp.moveaxis(x, -1, 0), out, mesh))
    np.testing.assert_allclose(metrics[0], ref, rtol=1e-10)


def test_study_scores_isolate_diverged_runs():
    """Regression: one diverged MC run must not poison the NCI/INC of the
    healthy runs through the shared sample-MSE normalizer."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "experiments"))
    from common import study_scores
    rng = np.random.default_rng(0)
    d, n, m = 2, 6, 4
    x = jnp.asarray(rng.standard_normal((d, n, m)))
    fm = jnp.asarray(np.moveaxis(np.asarray(x), -1, 0) + 0.1 * rng.standard_normal((m, d, n)))
    fP = jnp.broadcast_to(jnp.eye(d)[None, :, :, None], (m, d, d, n))
    fm = fm.at[2, :, 3:].set(jnp.nan)          # run 2 diverges at t=3
    s = study_scores(x, fm, fP)
    finite_runs = np.array([0, 1, 3])
    assert not np.isfinite(np.asarray(s["rmse"])[2])
    for k in ("nci", "inc", "nll"):
        vals = np.asarray(s[k])[finite_runs]
        assert np.isfinite(vals).all(), (k, vals)


def test_filter_bank_masks_each_metric(monkeypatch):
    """Regression: a run with a FINITE mean but NaN covariance (lost PD)
    has finite rmse yet NaN nll/nci — masking on rmse alone let it poison
    the aggregated columns while reporting diverged=0."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "experiments"))
    import common
    rng = np.random.default_rng(1)
    d, n, m = 2, 6, 4
    x = jnp.asarray(rng.standard_normal((d, n, m)))
    fm = jnp.asarray(np.moveaxis(np.asarray(x), -1, 0) + 0.1 * rng.standard_normal((m, d, n)))
    fP = jnp.array(np.broadcast_to(np.eye(d)[None, :, :, None], (m, d, d, n)))
    fP = fP.at[1].set(jnp.nan)                 # run 1: finite mean, NaN cov

    class FakeResult:
        fi_mean, fi_cov = fm, fP

    class FakeAlg:
        def forward_pass_batch(self, ys):
            return FakeResult()

    y = np.asarray(x)[:1]                      # (1, n, m) measurement layout
    df, _ = common.run_filter_bank({"fake": FakeAlg()}, y, np.asarray(x),
                                   verbose=False, warmup=False)
    row = df.loc["fake"]
    assert row["diverged"] == 1
    for k in ("rmse", "nll", "nci", "inc"):
        assert np.isfinite(row[k]), (k, row[k])


def test_streaming_serving_sharded(setup):
    """Multi-target STREAMING serving shards over the dp axis: the jitted
    online step preserves a dp-sharded target batch (state and measurements
    alike), each step's outputs match the unsharded run, and the Student
    factor path stays finite — the serving-side scale story (the offline
    story is filter_mc_sharded)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ssmtoybox_tpu.sqrt import make_online_sqrt_student_filter
    from ssmtoybox_tpu.mtran import FullySymmetricStudentTransform
    from ssmtoybox_tpu.utils import StudentRV
    dyn = UNGMTransition.create(StudentRV.create(1, dof=4.0),
                                StudentRV.create(1, scale=10.0, dof=4.0))
    obs = UNGMMeasurement.create(StudentRV.create(1, scale=1.0, dof=4.0),
                                 dim_state=1)
    fs = FullySymmetricStudentTransform(1, 3, None, 4.0)
    mesh = make_mesh(dp=8, fb=1)
    n_targets, steps = 16, 12
    ys = np.asarray(jax.random.normal(jax.random.PRNGKey(7),
                                      (steps, n_targets, 1)))

    init, step = make_online_sqrt_student_filter(dyn, obs, fs, fs, batch=True,
                                                 donate=False)
    # unsharded reference trace
    s_ref = init(n_targets)
    ref_means = []
    for k in range(steps):
        s_ref, _ = step(s_ref, ys[k])
        ref_means.append(np.asarray(s_ref.mean))

    # dp-sharded serving: shard every state leaf and measurement batch
    shard = NamedSharding(mesh, P("dp"))
    s = init(n_targets)
    s = jax.tree.map(lambda a: jax.device_put(a, shard) if a.ndim else a, s)
    for k in range(steps):
        s, info = step(s, jax.device_put(jnp.asarray(ys[k]), shard))
        assert not s.mean.sharding.is_fully_replicated, "state lost dp sharding"
        np.testing.assert_allclose(np.asarray(s.mean), ref_means[k],
                                   rtol=1e-10, atol=1e-10)
    assert np.isfinite(np.asarray(s.sqrt)).all()
    assert float(jnp.min(s.dof)) > 4.0
