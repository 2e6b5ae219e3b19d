"""Checkpoint / resume for filter state and study results.

The reference has no library-level checkpointing (SURVEY §5.4 — research
scripts ad-hoc ``joblib.dump`` results).  Here any pytree — an
:class:`~ssmtoybox_tpu.online.OnlineState`, a stacked
:class:`~ssmtoybox_tpu.ssinf.FilterResult`, fitted kernel parameters — can be
saved and restored with orbax, including sharded arrays on a device mesh.
"""
from __future__ import annotations

import os

import jax

__all__ = ["save_pytree", "restore_pytree"]


def save_pytree(path: str, tree, overwrite: bool = False) -> str:
    """Save an array pytree checkpoint to ``path`` (a directory).

    Refuses to replace an existing checkpoint unless ``overwrite=True`` —
    a silent always-force save would turn a path mix-up into unrecoverable
    loss of study results.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if os.path.exists(path) and not overwrite:
        raise FileExistsError(
            f"checkpoint already exists at {path}; pass overwrite=True to replace it")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=overwrite)
    return path


def restore_pytree(path: str, like=None):
    """Restore a checkpoint; ``like`` (an abstract/concrete pytree of the same
    structure) restores exact dtypes/shardings when provided."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, like)
            return ckptr.restore(path, abstract)
        return ckptr.restore(path)
