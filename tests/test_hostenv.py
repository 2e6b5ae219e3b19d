"""Unit tests for the shared host-env hardening helpers (hostenv.py).

These guard the exact invariants whose drift caused the round-3 multichip
failure: tunnel vars stripped, sitecustomize dropped from PYTHONPATH, device
count replaced vs preserved, and the in-process device check never
initializing an uninitialized backend.
"""
import os

from ssmtoybox_tpu.utils import hostenv


def test_strip_tunnel_env_removes_axon_knobs():
    env = {"PALLAS_AXON_POOL_IPS": "127.0.0.1", "AXON_LOOPBACK_RELAY": "1",
           "TPU_WORKER_HOSTNAMES": "h", "KEEP": "x",
           "PYTHONPATH": os.pathsep.join(["/root/.axon_site", "/keep/me"])}
    out = hostenv.strip_tunnel_env(env)
    assert out == {"KEEP": "x", "PYTHONPATH": "/keep/me"}


def test_strip_tunnel_env_drops_empty_pythonpath():
    out = hostenv.strip_tunnel_env({"PYTHONPATH": "/root/.axon_site"})
    assert "PYTHONPATH" not in out


def test_cpu_env_replaces_device_count():
    env = {"XLA_FLAGS": "--xla_force_host_platform_device_count=2 --foo=1"}
    out = hostenv.cpu_env(num_devices=8, env=env)
    assert out["JAX_PLATFORMS"] == "cpu"
    assert "--xla_force_host_platform_device_count=8" in out["XLA_FLAGS"].split()
    assert "--xla_force_host_platform_device_count=2" not in out["XLA_FLAGS"]
    assert "--foo=1" in out["XLA_FLAGS"].split()


def test_cpu_env_preserves_inherited_count_when_unspecified():
    env = {"XLA_FLAGS": "--xla_force_host_platform_device_count=4"}
    out = hostenv.cpu_env(env=env)
    assert "--xla_force_host_platform_device_count=4" in out["XLA_FLAGS"]


def test_in_process_device_count_matches_conftest_mesh():
    # under the test conftest the backend IS initialized with 8 CPU devices
    assert hostenv.backend_initialized()
    assert hostenv.in_process_device_count() >= 8


def test_in_process_count_never_initializes(tmp_path):
    """In a fresh child whose backend is uninitialized, the check must report
    0 WITHOUT triggering backend init (init can hang on a dead tunnel)."""
    import subprocess, sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = "\n".join([
        "import jax                                   # imported, NOT initialized",
        "from ssmtoybox_tpu.utils import hostenv",
        "assert not hostenv.backend_initialized()",
        "assert hostenv.in_process_device_count() == 0",
        "from jax._src import xla_bridge",
        "assert not xla_bridge._backends              # still uninitialized",
        "print('OK')",
    ])
    env = hostenv.cpu_env()
    env["PYTHONPATH"] = repo
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, timeout=120, env=env)
    assert proc.returncode == 0 and "OK" in proc.stdout, proc.stderr[-2000:]


def test_child_pin_lines_compile():
    src = "\n".join(hostenv.child_pin_lines(num_devices=4))
    compile(src, "<child>", "exec")   # syntactically valid child preamble


def test_probe_backend_compute_mode(monkeypatch):
    """``compute=True`` must run one real matmul to completion — device
    ENUMERATION can succeed while the compute queue is wedged behind an
    orphaned server-side compile (observed 2026-08-21: >1 h of answering
    ``jax.devices()`` with every enqueue hung), so the bench probes with a
    compute op.  Pinned to CPU here: the contract under test is that the
    probe subprocess completes the op, not tunnel state."""
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert hostenv.probe_backend(timeout_s=120, attempts=1, compute=True)


def test_probe_backend_detects_blocked_compute(monkeypatch):
    """A backend whose compute hangs must fail the compute probe within the
    bound (simulated: the probe subprocess sleeps forever in place of the
    matmul via a stub jax on PYTHONPATH)."""
    import textwrap, tempfile
    d = tempfile.mkdtemp()
    os.makedirs(os.path.join(d, "jax"), exist_ok=True)
    with open(os.path.join(d, "jax", "__init__.py"), "w") as f:
        f.write(textwrap.dedent("""
            class _Cfg:
                def update(self, *a, **k): pass
            config = _Cfg()
            def default_backend(): return "stub"
            def devices(): return ["stub0"]
        """))
    with open(os.path.join(d, "jax", "numpy.py"), "w") as f:
        f.write(textwrap.dedent("""
            def ones(*a, **k):          # enumeration fine, enqueue wedged
                import time
                time.sleep(3600)
            def sum(*a, **k): return 0.0
        """))
    monkeypatch.setenv("PYTHONPATH", d)
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    assert not hostenv.probe_backend(timeout_s=8, attempts=1, compute=True)
