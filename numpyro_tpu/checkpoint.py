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


def _rebuild_like(target, restored):
    """Rebuild the target's pytree structure from restored leaves, checking
    leaf count/shape/dtype so structural drift (version change, different
    kernel fields) fails loudly instead of silently misassigning leaves."""
    leaves, treedef = jax.tree.flatten(target)
    restored_leaves = jax.tree.leaves(restored)
    if len(restored_leaves) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(restored_leaves)} leaves but the target "
            f"state has {len(leaves)}; the saved state's structure does not "
            "match this kernel/version — re-create the checkpoint"
        )
    for i, (want, got) in enumerate(zip(leaves, restored_leaves)):
        want_shape, got_shape = np.shape(want), np.shape(got)
        if want_shape != got_shape:
            raise ValueError(
                f"checkpoint leaf {i} has shape {got_shape} but the target "
                f"expects {want_shape}; the saved state does not match"
            )
    return jax.tree.unflatten(treedef, restored_leaves)


def restore_checkpoint(path, target):
    """Restore a state saved by :func:`save_checkpoint`.

    :param target: a prototype pytree with the desired structure/dtypes
        (e.g. the current ``mcmc.last_state``); required to rebuild
        namedtuple structure.  Leaf count and shapes are validated against
        it before unflattening.

    .. warning:: the pickle fallback executes code while loading — only
        restore checkpoint files you trust (orbax, used when available,
        does not have this property).
    """
    path = os.path.abspath(os.fspath(path))
    ocp = _orbax()
    if ocp is not None and os.path.isdir(path):
        ckptr = ocp.PyTreeCheckpointer()
        restored = ckptr.restore(path, item=jax.device_get(target))
        return _rebuild_like(target, restored)
    with open(path, "rb") as f:
        restored = pickle.load(f)
    return _rebuild_like(target, restored)
