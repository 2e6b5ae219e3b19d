"""Device-mesh scaling for Monte-Carlo filtering studies.

The reference has no parallelism at all — MC studies are sequential Python
loops (``research/bsq/bsq_ungm.py:133-138``, SURVEY §2.10).  The TPU-native
scaling model introduced here follows the standard JAX recipe: pick a mesh,
annotate shardings on the embarrassingly parallel axes, and let XLA GSPMD
insert the collectives.

Axes:
* ``dp``  — data parallelism over MC trajectories (the dominant axis: the
  filters' time recursion is inherently sequential, so throughput comes from
  batching trajectories; collectives only appear in metric reductions).
* ``fb``  — "filter bank" parallelism over kernel-parameter/filter variants
  (a tensor-like axis: each bank member holds different weights).

Per-step the filters need NO cross-device communication — trajectories are
independent — so the only collectives XLA inserts are the final metric
reductions (psum/pmean over the ``dp`` axis), which ride ICI.

Multi-host (DCN) scaling: after ``jax.distributed.initialize`` the same
recipe spans hosts — :func:`make_multihost_mesh` lays the global device list
out host-major so the ``fb`` axis (which carries the densest sharing) stays
WITHIN a host's ICI domain and only the ``dp`` axis crosses the DCN, where
its lone collective (the final metric psum) is a once-per-study scalar
reduction.  Per-process data feeds in through :func:`shard_mc_local`
(addressable-shard semantics); the filter helpers accept the resulting
global arrays directly.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ssinf import gaussian_filter_batch, FilterResult

__all__ = ["make_mesh", "make_multihost_mesh", "shard_mc", "shard_mc_local",
           "filter_mc_sharded", "filter_bank_sharded", "mc_metrics_sharded"]


def make_mesh(dp: Optional[int] = None, fb: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (dp, fb) device mesh.

    ``dp`` defaults to ``len(devices) // fb``.  On a single chip this is a
    1x1 mesh and the annotations below are no-ops — the same program scales
    to a pod slice without code changes.
    """
    devices = jax.devices() if devices is None else list(devices)
    if dp is None:
        dp = len(devices) // fb
    if dp <= 0 or fb <= 0 or dp * fb > len(devices):
        raise ValueError(
            f"mesh shape (dp={dp}, fb={fb}) needs {max(dp * fb, 1)} devices; "
            f"{len(devices)} available — a degenerate mesh would only fail "
            f"later with an opaque sharding error")
    mesh_devices = np.asarray(devices[: dp * fb]).reshape(dp, fb)
    return Mesh(mesh_devices, axis_names=("dp", "fb"))


def make_multihost_mesh(fb: int = 1,
                        devices: Optional[Sequence[jax.Device]] = None,
                        process_shape: Optional[tuple] = None) -> Mesh:
    """Build a (dp, fb) mesh over the GLOBAL device list, host-major.

    For ``jax.distributed``-initialized runs (SURVEY §5.8): devices are
    grouped by ``process_index`` and each host block is laid out contiguously
    along ``dp``, so

    * ``fb`` slices never straddle a host — the filter-bank axis (the one
      with dense per-member weight sharing) stays on ICI;
    * ``dp`` is host-major: trajectory shards are host-local, and the single
      cross-``dp`` collective (the final metric psum) does one scalar
      ripple over the DCN.

    ``fb`` must divide the per-host device count for exactly this reason —
    an ``fb`` slice that straddled hosts would put every bank-weight
    broadcast on the DCN.

    ``process_shape=(num_hosts, per_host)`` overrides the grouping for
    virtual-topology tests: a single process with ``num_hosts * per_host``
    devices (``xla_force_host_platform_device_count``) is laid out as if
    device blocks belonged to distinct hosts, exercising the identical mesh
    geometry without a cluster.
    """
    devices = jax.devices() if devices is None else list(devices)
    if process_shape is not None:
        num_hosts, per_host = process_shape
        if num_hosts * per_host != len(devices):
            raise ValueError(
                f"process_shape {process_shape} does not tile the "
                f"{len(devices)} available devices")
        groups = [devices[i * per_host:(i + 1) * per_host]
                  for i in range(num_hosts)]
    else:
        by_proc: dict = {}
        for d in devices:
            by_proc.setdefault(d.process_index, []).append(d)
        groups = [by_proc[k] for k in sorted(by_proc)]
        sizes = {len(g) for g in groups}
        if len(sizes) != 1:
            raise ValueError(
                f"hosts contribute unequal device counts {sorted(sizes)}; a "
                f"rectangular (dp, fb) mesh needs homogeneous hosts")
        per_host = len(groups[0])
    if fb < 1 or per_host % fb:
        raise ValueError(
            f"fb={fb} must divide the per-host device count {per_host}: an "
            f"fb slice straddling hosts would put bank-weight broadcasts on "
            f"the DCN instead of ICI")
    mesh_devices = np.concatenate(
        [np.asarray(g).reshape(per_host // fb, fb) for g in groups], axis=0)
    return Mesh(mesh_devices, axis_names=("dp", "fb"))


def shard_mc_local(local_batch, mesh: Mesh) -> jax.Array:
    """Assemble a GLOBAL (M, ...) sharded array from this process's local
    trajectory slice (multi-host data loading, addressable-shard semantics).

    Each process passes only the trajectories it simulated/loaded — shape
    ``(M / num_processes, ...)`` — and receives a global jax.Array sharded
    over ``dp`` whose addressable shards are exactly its local rows.  In a
    single-process run this degenerates to :func:`shard_mc`.
    """
    spec = P("dp", *([None] * (np.ndim(local_batch) - 1)))
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return shard_mc(jnp.asarray(local_batch), mesh)
    return jax.make_array_from_process_local_data(sharding,
                                                  np.asarray(local_batch))


def shard_mc(data_batch: jax.Array, mesh: Mesh) -> jax.Array:
    """Place an (M, ...) trajectory batch with the MC axis sharded over ``dp``.

    ``M`` must be divisible by the mesh's ``dp`` size; the study helpers
    (:func:`filter_mc_sharded`) pad and un-pad automatically for sizes that
    are not (e.g. the reference's 100-run studies on an 8-device mesh).
    """
    dp = mesh.shape["dp"]
    if data_batch.shape[0] % dp:
        raise ValueError(
            f"MC axis of size {data_batch.shape[0]} is not divisible by dp={dp}; "
            f"pad the batch (see filter_mc_sharded, which does this for you) or "
            f"pick a compatible mesh")
    spec = P("dp", *([None] * (data_batch.ndim - 1)))
    return jax.device_put(data_batch, NamedSharding(mesh, spec))


def _pad_mc(data_batch: jax.Array, dp: int):
    """Pad the MC axis up to a multiple of ``dp`` by repeating the last row;
    returns ``(padded, original_size)``."""
    m = data_batch.shape[0]
    pad = (-m) % dp
    if pad:
        data_batch = jnp.concatenate(
            [data_batch, jnp.broadcast_to(data_batch[-1:],
                                          (pad,) + data_batch.shape[1:])], axis=0)
    return data_batch, m


@functools.lru_cache(maxsize=8)
def _sharded_filter_fn(mesh: Mesh):
    """One jitted sharded-filter program per mesh (cached, so repeated study
    calls reuse the compilation).  Bounded: an unbounded cache keyed on Mesh
    pins device handles + compiled executables for the process lifetime,
    which defeats jax.clear_caches()-style footprint control in long
    sessions that build many meshes."""

    @jax.jit
    def run(md, mo, td, to, ys):
        out = gaussian_filter_batch(md, mo, td, to, ys)
        return jax.tree_util.tree_map(
            lambda a: jax.lax.with_sharding_constraint(
                a, NamedSharding(mesh, P("dp", *([None] * (a.ndim - 1))))), out)

    return run


def filter_mc_sharded(mod_dyn, mod_obs, tf_dyn, tf_obs, data_batch, mesh: Mesh) -> FilterResult:
    """Forward-filter an (M, dim_y, N) batch with trajectories sharded over
    the mesh's ``dp`` axis.

    ``M`` not divisible by ``dp`` is padded by repeating the last trajectory
    and un-padded on return (the reference's canonical studies use mc=100,
    which no power-of-two mesh divides).  Each device filters its local
    shard; no collectives are required (the per-trajectory recursion is
    independent).

    A ``data_batch`` that is ALREADY a global array sharded over this mesh's
    ``dp`` axis (from :func:`shard_mc_local` in a multi-host run) is consumed
    as-is — re-padding would require host-side concatenation of
    non-addressable shards.
    """
    if (isinstance(data_batch, jax.Array)
            and isinstance(getattr(data_batch, "sharding", None), NamedSharding)
            and data_batch.sharding.mesh == mesh
            and data_batch.sharding.spec[:1] == ("dp",)):
        m = data_batch.shape[0]
        if m % mesh.shape["dp"]:
            raise ValueError(
                f"pre-sharded batch of {m} trajectories is not divisible by "
                f"dp={mesh.shape['dp']}; pad per-process before shard_mc_local")
        return _sharded_filter_fn(mesh)(mod_dyn, mod_obs, tf_dyn, tf_obs,
                                        data_batch)
    data_batch, m = _pad_mc(jnp.asarray(data_batch), mesh.shape["dp"])
    data_batch = shard_mc(data_batch, mesh)
    out = _sharded_filter_fn(mesh)(mod_dyn, mod_obs, tf_dyn, tf_obs, data_batch)
    if m != data_batch.shape[0]:
        out = jax.tree_util.tree_map(lambda a: a[:m], out)
    return out


@functools.lru_cache(maxsize=8)
def _sharded_bank_fn(mesh: Mesh):
    @jax.jit
    def run(md, mo, tf_dyn_bank, tf_obs_bank, ys):
        def one_member(td, to):
            return gaussian_filter_batch(md, mo, td, to, ys)

        out = jax.vmap(one_member)(tf_dyn_bank, tf_obs_bank)
        return jax.tree_util.tree_map(
            lambda a: jax.lax.with_sharding_constraint(
                a, NamedSharding(mesh, P("fb", "dp", *([None] * (a.ndim - 2))))), out)

    return run


def filter_bank_sharded(mod_dyn, mod_obs, tf_dyn_bank, tf_obs_bank, data_batch,
                        mesh: Mesh) -> FilterResult:
    """Run a BANK of filter variants over an MC batch on the (dp, fb) mesh.

    ``tf_dyn_bank``/``tf_obs_bank`` are transform pytrees with a leading bank
    axis (e.g. built by stacking transforms with different kernel parameters:
    ``jax.tree_util.tree_map(lambda *a: jnp.stack(a), *transforms)``).  The
    result carries (K, M, ...) moments, sharded K over ``fb`` and M over
    ``dp`` — the filter-bank structure of the reference's comparison studies
    (``bsq_ungm.py:109-122``) as one SPMD program instead of nested loops.
    Like :func:`filter_mc_sharded`, the MC axis is padded/un-padded when not
    divisible by ``dp``.
    """
    data_batch, m = _pad_mc(jnp.asarray(data_batch), mesh.shape["dp"])
    data_batch = shard_mc(data_batch, mesh)
    out = _sharded_bank_fn(mesh)(mod_dyn, mod_obs, tf_dyn_bank, tf_obs_bank, data_batch)
    if m != data_batch.shape[0]:
        out = jax.tree_util.tree_map(lambda a: a[:, :m], out)
    return out


@jax.jit
def _mc_rmse(xt, fm):
    se = jnp.sum((xt - fm) ** 2, axis=1)          # (M, N)
    rmse_t = jnp.sqrt(jnp.mean(se, axis=1))       # (M,) time-averaged per run
    return jnp.mean(rmse_t)                       # global mean -> psum over dp


def mc_metrics_sharded(x_true, result: FilterResult, mesh: Mesh):
    """Sharded RMSE over an MC study: per-trajectory error locally, global
    mean via an XLA-inserted cross-``dp`` reduction.

    ``x_true`` is (M, D, N); ``result.fi_mean`` is (M, D, N).  Bank results
    ((K, M, D, N) from :func:`filter_bank_sharded`) are rejected — silently
    broadcasting them would average over the wrong axes.
    """
    x_true = jnp.asarray(x_true)
    if x_true.ndim != result.fi_mean.ndim or x_true.shape != result.fi_mean.shape:
        raise ValueError(
            f"x_true {x_true.shape} and fi_mean {result.fi_mean.shape} must match; "
            f"for filter_bank_sharded output compute metrics per bank member")
    already_sharded = (isinstance(getattr(x_true, "sharding", None), NamedSharding)
                       and x_true.sharding.mesh == mesh)
    if not already_sharded and x_true.shape[0] % mesh.shape["dp"] == 0:
        x_true = shard_mc(x_true, mesh)
    return _mc_rmse(x_true, result.fi_mean)
