"""Host-environment hardening shared by every entry point that must survive
this image's TPU-tunnel quirks.

The image's ``sitecustomize`` (``/root/.axon_site/sitecustomize.py``)
registers the axon TPU plugin and dials the relay at interpreter start
whenever ``PALLAS_AXON_POOL_IPS`` is set.  Two failure modes follow:

1. With the tunnel DOWN, backend init blocks indefinitely (observed >9 min)
   BEFORE any config-API pin in user code can run — so CPU-only subprocesses
   must run with the tunnel env vars stripped (``cpu_env``).
2. Even with ``JAX_PLATFORMS=cpu`` in the env, a parent process whose jax was
   initialized under sitecustomize may ignore a late
   ``--xla_force_host_platform_device_count`` — so device-count expectations
   must be verified against the IN-PROCESS ``jax.devices()``, never against a
   subprocess probe (the round-3 multichip failure was exactly that
   divergence: probe saw 8 devices, the in-process backend had 1).

Three consumers, one implementation (VERDICT r3 #3): ``__graft_entry__.py``
(driver dry run), ``bench.py`` (headline benchmark), ``tests/conftest.py`` +
``tests/test_parallel.py`` (virtual-mesh / multi-process tests).  This module
must stay importable WITHOUT initializing jax — all jax imports live inside
functions.
"""
import os
import subprocess
import sys
import time

#: env vars that exist only to boot the axon TPU tunnel
_TUNNEL_PREFIXES = ("AXON_", "PALLAS_AXON_")
_TUNNEL_VARS = ("TPU_WORKER_HOSTNAMES",)
#: the sitecustomize directory whose import dials the relay
_SITE_DIR_MARK = ".axon_site"


def strip_tunnel_env(env=None):
    """Copy of ``env`` (default ``os.environ``) with every axon/tunnel knob
    removed, including the sitecustomize dir on ``PYTHONPATH``."""
    src = os.environ if env is None else env
    out = {k: v for k, v in src.items()
           if not (any(k.startswith(p) for p in _TUNNEL_PREFIXES)
                   or k in _TUNNEL_VARS)}
    pyp = [p for p in out.get("PYTHONPATH", "").split(os.pathsep)
           if p and _SITE_DIR_MARK not in p]
    if pyp:
        out["PYTHONPATH"] = os.pathsep.join(pyp)
    else:
        out.pop("PYTHONPATH", None)
    return out


def cpu_env(num_devices=None, env=None):
    """Tunnel-stripped env with the CPU platform pinned; optionally force a
    virtual CPU device count.

    With ``num_devices=None`` an inherited
    ``--xla_force_host_platform_device_count`` flag is PRESERVED (a probe
    must count the devices the caller's environment would provide); passing
    a count replaces it.
    """
    out = strip_tunnel_env(env)
    out["JAX_PLATFORMS"] = "cpu"
    out["JAX_PLATFORM_NAME"] = "cpu"
    if num_devices is not None:
        flags = [f for f in out.get("XLA_FLAGS", "").split()
                 if "xla_force_host_platform_device_count" not in f]
        flags.append(f"--xla_force_host_platform_device_count={num_devices}")
        out["XLA_FLAGS"] = " ".join(flags)
    return out


def set_cpu_env_vars(num_devices=None, extra_xla_flags=()):
    """Mutate ``os.environ`` in place to pin the CPU platform (+ optional
    virtual device count + extra XLA flags) for THIS process.  Call before
    the first ``import jax``; follow with :func:`pin_cpu` because the
    image's sitecustomize may have imported jax already."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if num_devices is not None and \
            "xla_force_host_platform_device_count" not in flags:
        flags += f" --xla_force_host_platform_device_count={num_devices}"
    for f in extra_xla_flags:
        if f.split("=")[0] not in flags:
            flags += " " + f
    os.environ["XLA_FLAGS"] = flags.strip()


def pin_cpu(num_devices=None, x64=None):
    """Force the CPU platform through jax's config API (effective until the
    backend first initializes) and return the ``jax`` module.

    Needed IN ADDITION to env vars: sitecustomize imports jax at interpreter
    start, which can pre-empt env vars set afterwards.  ``num_devices`` uses
    ``jax_num_cpu_devices`` where available (newer jax), silently falling
    back to the env-var/XLA_FLAGS route on older versions.
    """
    import jax
    jax.config.update("jax_platforms", "cpu")
    if num_devices is not None:
        try:
            jax.config.update("jax_num_cpu_devices", int(num_devices))
        except AttributeError:  # older jax: XLA_FLAGS fallback applies
            pass
    if x64 is not None:
        jax.config.update("jax_enable_x64", bool(x64))
    return jax


def child_pin_lines(num_devices=None):
    """Python source lines for a subprocess child that pin the CPU platform
    through the config API before anything else touches the backend."""
    lines = ["import jax", "jax.config.update('jax_platforms', 'cpu')"]
    if num_devices is not None:
        lines += ["try:",
                  f"    jax.config.update('jax_num_cpu_devices', {int(num_devices)})",
                  "except AttributeError:",
                  "    pass"]
    return lines


def backend_initialized():
    """True if THIS process's jax backend has already been initialized.

    Reading ``jax.devices()`` of an initialized backend is instant and
    tunnel-free; initializing one can BLOCK on a dead tunnel (even with
    ``JAX_PLATFORMS=cpu`` in the env — this image's sitecustomize overrides
    it, observed in-process backend = 1 tpu device).  Callers deciding
    between an in-process fast path and a cleaned-env subprocess must
    therefore never be the ones to trigger init.
    """
    try:
        import sys as _sys
        if "jax" not in _sys.modules:
            return False
        from jax._src import xla_bridge
        return bool(xla_bridge._backends)
    except Exception:
        return False


def in_process_device_count():
    """``len(jax.devices())`` of THIS process's ALREADY-INITIALIZED backend;
    0 if the backend is uninitialized (never triggers init — see
    :func:`backend_initialized` for why) or init state can't be read.
    """
    if not backend_initialized():
        return 0
    try:
        import jax
        return len(jax.devices())
    except Exception:
        return 0


def probe_backend(timeout_s=90, attempts=2, log=None, compute=False):
    """Probe backend liveness in a disposable subprocess; True if the
    configured backend initializes.  Retries with bounded backoff — the
    tunnel can flap within a run window, but the probe must never eat the
    caller's whole budget (BENCH_r03 died to exactly that).

    ``compute=True`` additionally runs one tiny matmul to completion.
    Device ENUMERATION can succeed while the compute queue is blocked —
    observed 2026-08-21: an orphaned server-side compile (a killed client's
    in-flight XLA compile keeps running remotely) left ``jax.devices()``
    answering for over an hour while every enqueue hung.  A caller about
    to spend its budget on real work should probe with ``compute=True`` so
    that wedge class is detected in one bounded probe instead of one
    bounded work phase."""
    if log is None:
        log = lambda *a: print(*a, file=sys.stderr, flush=True)
    code = "import jax; print(jax.default_backend(), len(jax.devices()))"
    if compute:
        code = ("import jax, jax.numpy as jnp; "
                "print(jax.default_backend(), len(jax.devices())); "
                "print(float(jnp.sum(jnp.ones((64,64)) @ jnp.ones((64,64)))))")
    env = None
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        # caller pinned CPU: strip the tunnel + pin through the config API —
        # env vars alone don't stop a dead tunnel from hanging backend init
        code = "import jax; jax.config.update('jax_platforms', 'cpu'); " + code
        env = cpu_env()
    last_err = None
    for attempt in range(1, attempts + 1):
        try:
            out = subprocess.run([sys.executable, "-c", code],
                                 capture_output=True, text=True,
                                 timeout=timeout_s, env=env)
            if out.returncode == 0:
                log("backend probe:", out.stdout.strip())
                return True
            last_err = "jax backend init failed: " + out.stderr.strip()[-2000:]
        except subprocess.TimeoutExpired:
            last_err = (f"jax backend init did not complete within {timeout_s}s "
                        "— TPU tunnel down? (jax.devices() hangs)")
        log(f"backend probe attempt {attempt}/{attempts} failed: {last_err}")
        if attempt < attempts:
            backoff = 20 * attempt
            log(f"retrying in {backoff}s ...")
            time.sleep(backoff)
    log("backend unavailable after retries:", last_err)
    return False


def _proc_start_time(pid: int):
    """Kernel start time of ``pid`` (field 22 of /proc/<pid>/stat) — pid
    liveness alone is not enough, a recycled pid would mask a dead owner."""
    try:
        with open(f"/proc/{pid}/stat") as f:
            return f.read().rsplit(")", 1)[-1].split()[19]
    except (OSError, IndexError):
        return None


def enable_persistent_cache(jax, cache_dir):
    """Dead-session-safe persistent XLA compilation cache.

    Same sentinel protocol as ``tests/conftest.py`` (its docstring records
    the failure mode: a process killed MID-WRITE leaves a truncated entry,
    and XLA's executable deserialization hard-aborts on it — uncatchable
    from Python).  Every consumer drops ``.in_progress.<pid>`` stamped with
    its kernel start time; at startup, any sentinel whose recorded process
    is gone means an owner died mid-run — wipe the cache entries once and
    keep going cold.

    Used by ``bench.py``'s jax phases: compiles dominate the bench
    wall-clock through the dev tunnel (measured: validation 555 s wall,
    42 s CPU), and the driver runs ``bench.py`` from this same checkout —
    so a cache warmed by a dev-session run makes the driver's run fit its
    budget comfortably, and a cold cache is merely the status quo.
    """
    import glob

    stale, live = False, []
    for path in glob.glob(os.path.join(cache_dir, ".in_progress.*")):
        try:
            pid = int(path.rsplit(".", 1)[-1])
            with open(path) as f:
                recorded_start = f.read().strip()
        except (ValueError, OSError):
            stale = True
            continue
        if recorded_start and _proc_start_time(pid) == recorded_start:
            live.append(path)          # genuinely running concurrent owner
        else:
            stale = True
    if stale:
        keep = set(live)
        for path in glob.glob(os.path.join(cache_dir, "*")) + \
                glob.glob(os.path.join(cache_dir, ".in_progress.*")):
            if path not in keep:
                try:
                    os.remove(path)
                except OSError:
                    pass
    os.makedirs(cache_dir, exist_ok=True)
    with open(os.path.join(cache_dir, f".in_progress.{os.getpid()}"), "w") as f:
        f.write(_proc_start_time(os.getpid()) or "")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def release_persistent_cache(cache_dir):
    """Drop this process's sentinel after a CLEAN finish (a crash leaves it,
    which is the point — the next consumer wipes the possibly-torn cache)."""
    try:
        os.remove(os.path.join(cache_dir, f".in_progress.{os.getpid()}"))
    except OSError:
        pass
