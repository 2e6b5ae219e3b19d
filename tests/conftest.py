"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

Tests run on an 8-device virtual CPU mesh (the SURVEY §4 strategy for faking
multi-chip topologies without hardware) and in float64 because parity against
the reference is specified at 1e-8.
"""
import os
import resource

# XLA's CPU backend compiles on the calling thread; LLVM recursion over the
# framework's large unrolled programs can overflow the default 8 MB main-
# thread stack late in a long pytest session (observed: segfault inside
# backend_compile_and_load on the last test file, not reproducible in
# isolation).  Lift the stack limit before the first compile.
try:
    resource.setrlimit(resource.RLIMIT_STACK,
                       (resource.RLIM_INFINITY, resource.RLIM_INFINITY))
except (ValueError, OSError):  # hard limit not adjustable: keep going
    pass

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags += " --xla_force_host_platform_device_count=8"
if "xla_backend_optimization_level" not in _flags:
    # the suite is XLA-compile-bound on 1-core CI hosts (the framework's
    # unrolled small-linalg graphs are big); backend optimization level 0
    # cuts compile ~30% and reproduces the default-level numerics to 1e-14
    # on the heaviest program (the time-parallel iterated smoother)
    _flags += " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

# NOTE: this environment's sitecustomize imports jax at interpreter start and
# registers the TPU-tunnel platform, so the env vars above can be too late —
# force the platform + device count through the config API (effective until
# the backend is first initialized).
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except AttributeError:  # older jax: XLA_FLAGS fallback above applies
    pass
jax.config.update("jax_enable_x64", True)

assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) >= 8, "tests require 8 virtual CPU devices"

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables after each test module.

    One long pytest session accumulates hundreds of large compiled programs
    (the framework's unrolled small-linalg graphs are big); on this backend
    that eventually segfaults inside XLA's CPU ``backend_compile_and_load``
    on a later compile (observed repeatedly on the LAST module of the full
    run; any tail subset passes in a fresh process).  Dropping the caches
    between modules keeps per-process compiled-code footprint bounded.
    """
    yield
    jax.clear_caches()


@pytest.fixture
def unrolled_linalg():
    """Force the unrolled small-linalg kernels for a test.

    The suite runs on CPU, where the 'auto' dispatch routes chol/tria/solve
    through LAPACK custom calls; the unrolled elementwise kernels (the TPU
    f64 hot path) would otherwise go untested here.  Caches are cleared on
    both sides because the dispatch mode is read at trace time and is not
    part of jit cache keys.
    """
    from ssmtoybox_tpu.utils import linalg
    prev = linalg._SMALL_LINALG_MODE
    linalg.set_small_linalg_mode("unrolled")
    jax.clear_caches()
    yield
    linalg.set_small_linalg_mode(prev)
    jax.clear_caches()


@pytest.fixture(scope="session")
def goldens():
    """Load all golden npz files produced by tools/gen_goldens.py."""
    out = {}
    for fname in os.listdir(GOLDEN_DIR):
        if fname.endswith(".npz"):
            out[fname[:-4]] = dict(np.load(os.path.join(GOLDEN_DIR, fname), allow_pickle=False))
    return out
