"""Device-sharded time axis for the time-parallel filters/smoothers.

:mod:`~ssmtoybox_tpu.parallel.timescan` and
:mod:`~ssmtoybox_tpu.parallel.sqrttime` parallelize the Kalman recursions
over the time axis *within one chip* via ``lax.associative_scan`` (O(log N)
depth).  This module scales the same scans *across* a device mesh — true
sequence parallelism for a single long record, the axis the reference can
only loop over (SURVEY §5.7, ``ssinf.py:101-111``).

Design: the classic two-level decomposition of an associative scan onto a
mesh, laid out so the only cross-device traffic is one tiny collective:

1. **local scan** — each device runs ``lax.associative_scan`` over its
   contiguous chunk of scan elements (inside ``shard_map``);
2. **aggregate exchange** — each chunk's total aggregate (one element, a few
   small matrices) is ``all_gather``-ed over the mesh axis: the single
   collective, riding ICI;
3. **prefix combine** — every device scans the ``n_dev`` gathered aggregates
   (cheap: ``n_dev`` elements) and picks its *exclusive* prefix;
4. **apply** — one vectorized combine folds the prefix into the local
   results (edge chunk keeps its local scan).

Compared to letting GSPMD partition a global ``associative_scan`` (log-depth
rounds of resharded slice/concat traffic), this moves one element per device
once.  Results equal the unsharded scans to reassociation rounding.

The high-level wrappers reuse the element builders and combines of
``timescan``/``sqrttime`` verbatim, so sharded and single-chip paths cannot
drift: full-covariance (:func:`sharded_parallel_affine_filter` /
``..._smoother``) and square-root factor form
(:func:`sharded_parallel_affine_sqrt_filter` / ``..._smoother``) — the
latter PD by construction in f32, QR combines and all.  Records whose length
is not divisible by the mesh axis are padded with the combine's two-sided
identity element (exact: identities change no real prefix/suffix).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from . import sqrttime, timescan
from .sqrttime import (_combine_sqrt_filter, _combine_sqrt_smoother,
                       _filter_identity, _smoother_identity,
                       _sqrt_filter_elements)
from .timescan import _affine_filter_elements, _combine_filter, _combine_smoother
from ..utils.linalg import symmetrize

__all__ = ["sharded_associative_scan",
           "sharded_parallel_affine_filter", "sharded_parallel_affine_smoother",
           "sharded_parallel_affine_sqrt_filter",
           "sharded_parallel_affine_sqrt_smoother"]


def _leading_len(elems) -> int:
    sizes = {leaf.shape[0] for leaf in jax.tree_util.tree_leaves(elems)}
    if len(sizes) != 1:
        raise ValueError(f"scan elements disagree on the leading (time) axis: {sizes}")
    return sizes.pop()


def sharded_associative_scan(fn, elems, mesh: Mesh, axis_name: str,
                             reverse: bool = False, identity=None):
    """Associative scan with the leading axis sharded over ``mesh[axis_name]``.

    ``fn`` must have exactly ``lax.associative_scan``'s contract:
    associative, arg0 the running aggregate — of earlier elements
    (``reverse=False``) or later elements (``reverse=True``) — and operating
    on elements with an arbitrary leading batch dimension.  ``elems`` is a pytree of
    arrays sharing leading length ``N``.  Returns the inclusive scan
    (``reverse=True`` for the suffix scan), sharded like the input.

    ``N`` must divide by the axis size unless ``identity`` (a pytree of
    *unbatched* two-sided identity elements of ``fn``) is given, in which
    case the tail is padded with identities and the pad trimmed from the
    result — exact, since identities change no real prefix/suffix.
    """
    n_dev = mesh.shape[axis_name]
    n = _leading_len(elems)
    pad = (-n) % n_dev
    if pad:
        if identity is None:
            raise ValueError(
                f"scan length {n} does not divide by mesh axis "
                f"'{axis_name}' ({n_dev}) and no identity element was given")
        ident = jax.tree_util.tree_map(
            lambda i, a: jnp.broadcast_to(jnp.asarray(i, a.dtype), (pad,) + a.shape[1:]),
            identity, elems)
        elems = jax.tree_util.tree_map(
            lambda a, ip: jnp.concatenate([a, ip], axis=0), elems, ident)
    chunk = (n + pad) // n_dev

    def body(local):
        loc = jax.lax.associative_scan(fn, local, reverse=reverse)
        # chunk aggregate: the fully-combined element of this chunk
        agg = jax.tree_util.tree_map(lambda a: a[0] if reverse else a[-1], loc)
        gath = jax.lax.all_gather(agg, axis_name)            # (n_dev, ...)
        pref = jax.lax.associative_scan(fn, gath, reverse=reverse)
        idx = jax.lax.axis_index(axis_name)
        # exclusive prefix (forward) / suffix (reverse) of this chunk
        take = jnp.clip(idx + 1 if reverse else idx - 1, 0, n_dev - 1)
        sel = jax.tree_util.tree_map(
            lambda a: jax.lax.dynamic_index_in_dim(a, take, keepdims=False), pref)
        selb = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a[None], (chunk,) + a.shape), sel)
        # lax.associative_scan's fn contract: arg0 is the AGGREGATE — of
        # earlier elements (forward) or later elements (reverse) — so the
        # chunk prefix/suffix is arg0 in both directions
        comb = fn(selb, loc)
        # the edge chunk has no exclusive prefix/suffix: keep its local scan
        edge = idx == (n_dev - 1 if reverse else 0)
        return jax.tree_util.tree_map(lambda c, l: jnp.where(edge, l, c), comb, loc)

    out = jax.shard_map(body, mesh=mesh, in_specs=P(axis_name),
                        out_specs=P(axis_name), check_vma=False)(elems)
    if pad:
        out = jax.tree_util.tree_map(lambda a: a[:n], out)
    return out


def sharded_parallel_affine_filter(Fs, bs, Qs, Hs, cs, Rs, m0, P0, data,
                                   mesh: Mesh, axis_name: str = "t"
                                   ) -> Tuple[jax.Array, jax.Array]:
    """:func:`~ssmtoybox_tpu.parallel.timescan.parallel_affine_filter` with
    the time axis sharded over ``mesh[axis_name]``.  Same model/indexing and
    ``(fi_mean (D,N), fi_cov (D,D,N))`` contract; equal to the unsharded
    scan to reassociation rounding."""
    ys = jnp.asarray(data).T
    m0, P0 = jnp.asarray(m0), jnp.asarray(P0)
    elems = _affine_filter_elements(Fs, bs, Qs, Hs, cs, Rs, m0, P0, ys)
    d = m0.shape[0]
    ident = (jnp.eye(d, dtype=m0.dtype), jnp.zeros((d,), m0.dtype),
             jnp.zeros((d, d), m0.dtype), jnp.zeros((d,), m0.dtype),
             jnp.zeros((d, d), m0.dtype))
    _, b, C, _, _ = sharded_associative_scan(_combine_filter, elems, mesh,
                                             axis_name, identity=ident)
    return jnp.moveaxis(b, 0, -1), jnp.moveaxis(jax.vmap(symmetrize)(C), 0, -1)


def sharded_parallel_affine_smoother(Fs, bs, Qs, fi_mean, fi_cov,
                                     mesh: Mesh, axis_name: str = "t"
                                     ) -> Tuple[jax.Array, jax.Array]:
    """:func:`~ssmtoybox_tpu.parallel.timescan.parallel_affine_smoother`
    with the time axis sharded over ``mesh[axis_name]`` (reverse scan)."""
    m = jnp.moveaxis(jnp.asarray(fi_mean), -1, 0)
    Pc = jnp.moveaxis(jnp.asarray(fi_cov), -1, 0)
    E, g, L = timescan._affine_smoother_elements(Fs, bs, Qs, m, Pc)
    d = m.shape[-1]
    ident = (jnp.eye(d, dtype=m.dtype), jnp.zeros((d,), m.dtype),
             jnp.zeros((d, d), m.dtype))
    E_s, g_s, L_s = sharded_associative_scan(
        _combine_smoother, (E, g, L), mesh, axis_name, reverse=True,
        identity=ident)
    del E_s
    return jnp.moveaxis(g_s, 0, -1), jnp.moveaxis(jax.vmap(symmetrize)(L_s), 0, -1)


def sharded_parallel_affine_sqrt_filter(Fs, bs, SQs, Hs, cs, SRs, m0, S0,
                                        data, mesh: Mesh, axis_name: str = "t"
                                        ) -> Tuple[jax.Array, jax.Array]:
    """:func:`~ssmtoybox_tpu.parallel.sqrttime.parallel_affine_sqrt_filter`
    with the time axis sharded over ``mesh[axis_name]`` — factor-form
    elements, QR combines, PD by construction in f32."""
    ys = jnp.asarray(data).T
    m0, S0 = jnp.asarray(m0), jnp.asarray(S0)
    elems = _sqrt_filter_elements(Fs, bs, SQs, Hs, cs, SRs, m0, S0, ys)
    d = m0.shape[0]
    _, b, U, _, _ = sharded_associative_scan(
        _combine_sqrt_filter, elems, mesh, axis_name,
        identity=_filter_identity(d, elems[0].dtype))
    return jnp.moveaxis(b, 0, -1), jnp.moveaxis(U, 0, -1)


def sharded_parallel_affine_sqrt_smoother(Fs, bs, SQs, fi_mean, fi_sqrt,
                                          mesh: Mesh, axis_name: str = "t"
                                          ) -> Tuple[jax.Array, jax.Array]:
    """:func:`~ssmtoybox_tpu.parallel.sqrttime.parallel_affine_sqrt_smoother`
    with the time axis sharded over ``mesh[axis_name]`` (reverse scan)."""
    m = jnp.moveaxis(jnp.asarray(fi_mean), -1, 0)
    S = jnp.moveaxis(jnp.asarray(fi_sqrt), -1, 0)
    E, g, D = sqrttime._sqrt_smoother_elements(Fs, bs, SQs, m, S)
    d = m.shape[-1]
    E_s, g_s, D_s = sharded_associative_scan(
        _combine_sqrt_smoother, (E, g, D), mesh, axis_name, reverse=True,
        identity=_smoother_identity(d, m.dtype))
    del E_s
    return jnp.moveaxis(g_s, 0, -1), jnp.moveaxis(D_s, 0, -1)
