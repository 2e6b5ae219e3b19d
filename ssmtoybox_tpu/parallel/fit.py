"""Distributed BQ hyper-parameter training.

The reference fits kernel parameters with single-process BFGS on the NLML
(``bqmod.py:250-285``).  Here the same objective becomes a data-parallel
training step: function-observation batches are sharded over the mesh's
``dp`` axis, per-shard NLML gradients are averaged by an XLA-inserted
reduction, and an optax optimizer updates the (replicated) log-parameters —
the standard mesh/psum recipe, with the filter-bank axis ``fb`` carrying
independent parameter sets when fitting several models at once.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["nlml_loss", "make_fit_step", "fit_kernel_params"]


def nlml_loss(model, log_par, fcn_obs_batch, x_obs, weights=None):
    """Mean NLML over a batch of function-observation sets.

    ``fcn_obs_batch`` is (B, num_pts, dim_out): B independent draws of the
    integrand observed at the sigma-points (e.g. from different trajectories
    or time steps).  The per-sample NLML is the reference's objective
    (``bqmod.py:537-596``); batching + averaging makes it SPMD-shardable.
    ``weights`` (B,) turns the mean into an exact weighted mean — used to
    zero out the rows added when padding a batch to the mesh size.
    """
    # honor the kernel's configured jitter (a user on the f32 path may have
    # raised it; 1e-8 is below f32 resolution for O(1) kernel matrices)
    jitter = model.kernel.jitter * jnp.eye(x_obs.shape[1], dtype=x_obs.dtype)
    per = jax.vmap(lambda fo: model.neg_log_marginal_likelihood(log_par, fo, x_obs, jitter))
    vals = per(fcn_obs_batch)
    if weights is None:
        return jnp.mean(vals)
    return jnp.sum(vals * weights) / jnp.sum(weights)


def make_fit_step(model, optimizer: optax.GradientTransformation, mesh: Mesh | None = None):
    """Build a jitted data-parallel NLML descent step.

    Returns ``step(log_par, opt_state, fcn_obs_batch, x_obs) ->
    (log_par, opt_state, loss)``.  With a mesh, the batch axis is sharded over
    ``dp`` and parameters/optimizer state are replicated; the gradient mean
    turns into a cross-device reduction inserted by XLA.
    """

    def step(log_par, opt_state, fcn_obs_batch, x_obs, weights=None):
        if mesh is not None:
            fcn_obs_batch = jax.lax.with_sharding_constraint(
                fcn_obs_batch, NamedSharding(mesh, P("dp", None, None)))
            if weights is not None:
                weights = jax.lax.with_sharding_constraint(
                    weights, NamedSharding(mesh, P("dp")))
        loss, grads = jax.value_and_grad(
            lambda lp: nlml_loss(model, lp, fcn_obs_batch, x_obs, weights))(log_par)
        updates, opt_state = optimizer.update(grads, opt_state, log_par)
        return optax.apply_updates(log_par, updates), opt_state, loss

    return jax.jit(step)


def fit_kernel_params(model, log_par_0, fcn_obs_batch, x_obs,
                      learning_rate: float = 1e-2, num_steps: int = 200,
                      mesh: Mesh | None = None) -> Tuple[jax.Array, jax.Array]:
    """Fit kernel log-parameters by Adam on the batched NLML.

    Gradient-descent counterpart of ``Model.optimize`` (``bqmod.py:250-285``)
    for the large-batch, multi-chip regime.  Returns (log_par, losses).
    """
    optimizer = optax.adam(learning_rate)
    log_par = jnp.asarray(log_par_0, dtype=x_obs.dtype).reshape(-1)
    opt_state = optimizer.init(log_par)
    step = make_fit_step(model, optimizer, mesh)
    weights = None
    if mesh is not None:
        # pad the batch to the mesh size with ZERO-WEIGHT rows (like the
        # mesh.py study helpers: the reference's canonical batches, e.g.
        # B=100, are not divisible by power-of-two meshes) — the weighted
        # mean keeps the objective exactly equal to the unpadded one
        b = fcn_obs_batch.shape[0]
        dp = mesh.shape["dp"]
        pad = (-b) % dp
        if pad:
            last = jnp.repeat(fcn_obs_batch[-1:], pad, axis=0)
            fcn_obs_batch = jnp.concatenate([fcn_obs_batch, last], axis=0)
            weights = jnp.concatenate(
                [jnp.ones(b, x_obs.dtype), jnp.zeros(pad, x_obs.dtype)])
            weights = jax.device_put(weights, NamedSharding(mesh, P("dp")))
        fcn_obs_batch = jax.device_put(
            fcn_obs_batch, NamedSharding(mesh, P("dp", None, None)))

    losses = []
    for _ in range(num_steps):
        log_par, opt_state, loss = step(log_par, opt_state, fcn_obs_batch,
                                        x_obs, weights)
        losses.append(loss)
    return log_par, jnp.stack(losses)
