"""Checkpoint / resume for sampler and SVI states.

The reference keeps resume in-memory only (``MCMC.post_warmup_state``,
``SVI.run(init_state=...)``; SURVEY.md §5).  Because every kernel state here
is a pytree namedtuple, file-based checkpointing is a straight orbax
round-trip — on a pod slice, orbax writes shards per host asynchronously.

Usage::

    mcmc.warmup(key, *args)
    save_checkpoint("/ckpt/warm", mcmc.post_warmup_state)
    ...
    mcmc.post_warmup_state = restore_checkpoint("/ckpt/warm", mcmc.post_warmup_state)
    mcmc.run(mcmc.post_warmup_state.rng_key, *args)
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np

__all__ = ["save_checkpoint", "restore_checkpoint"]


def _orbax():
    try:
        import orbax.checkpoint as ocp

        return ocp
    except ImportError:  # pragma: no cover
        return None


def save_checkpoint(path, state, *, async_save=False):
    """Persist a pytree state (HMCState, SVIState, SMCState, params dict...).

    Uses orbax when available (sharded, multi-host safe); otherwise a
    device_get + pickle fallback.
    """
    path = os.path.abspath(os.fspath(path))
    ocp = _orbax()
    if ocp is not None:
        ckptr = ocp.PyTreeCheckpointer()
        # namedtuples serialize as-is (they are pytrees)
        ckptr.save(path, jax.device_get(state), force=True)
        return path
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(jax.device_get(state), f)
    return path


def restore_checkpoint(path, target):
    """Restore a state saved by :func:`save_checkpoint`.

    :param target: a prototype pytree with the desired structure/dtypes
        (e.g. the current ``mcmc.last_state``); required to rebuild
        namedtuple structure.
    """
    path = os.path.abspath(os.fspath(path))
    ocp = _orbax()
    if ocp is not None and os.path.isdir(path):
        ckptr = ocp.PyTreeCheckpointer()
        restored = ckptr.restore(path, item=jax.device_get(target))
        leaves, treedef = jax.tree.flatten(target)
        restored_leaves = jax.tree.leaves(restored)
        return jax.tree.unflatten(treedef, restored_leaves)
    with open(path, "rb") as f:
        restored = pickle.load(f)
    leaves, treedef = jax.tree.flatten(target)
    restored_leaves = jax.tree.leaves(restored)
    return jax.tree.unflatten(treedef, restored_leaves)
