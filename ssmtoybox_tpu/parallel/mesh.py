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
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ssinf import gaussian_filter_batch, FilterResult

__all__ = ["make_mesh", "shard_mc", "filter_mc_sharded", "filter_bank_sharded",
           "mc_metrics_sharded"]


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
    if dp * fb == 0 or dp * fb > len(devices):
        raise ValueError(
            f"mesh shape (dp={dp}, fb={fb}) needs {max(dp * fb, 1)} devices; "
            f"{len(devices)} available — a degenerate mesh would only fail "
            f"later with an opaque sharding error")
    mesh_devices = np.asarray(devices[: dp * fb]).reshape(dp, fb)
    return Mesh(mesh_devices, axis_names=("dp", "fb"))


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


@functools.lru_cache(maxsize=None)
def _sharded_filter_fn(mesh: Mesh):
    """One jitted sharded-filter program per mesh (cached, so repeated study
    calls reuse the compilation)."""

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
    """
    data_batch, m = _pad_mc(jnp.asarray(data_batch), mesh.shape["dp"])
    data_batch = shard_mc(data_batch, mesh)
    out = _sharded_filter_fn(mesh)(mod_dyn, mod_obs, tf_dyn, tf_obs, data_batch)
    if m != data_batch.shape[0]:
        out = jax.tree_util.tree_map(lambda a: a[:m], out)
    return out


@functools.lru_cache(maxsize=None)
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
    if x_true.shape[0] % mesh.shape["dp"] == 0:
        x_true = shard_mc(x_true, mesh)
    return _mc_rmse(x_true, result.fi_mean)
