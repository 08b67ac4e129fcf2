"""Utilities for ensemble kernels (reference: numpyro/infer/ensemble_util.py)."""


import jax
from jax.flatten_util import ravel_pytree


def batch_ravel_pytree(pytree):
    """Flatten a batch-leading pytree to (batch, flat_dim) + unravel fn."""
    flat = jax.vmap(lambda x: ravel_pytree(x)[0])(pytree)
    unravel_fn = jax.vmap(ravel_pytree(jax.tree.map(lambda z: z[0], pytree))[1])
    return flat, unravel_fn
