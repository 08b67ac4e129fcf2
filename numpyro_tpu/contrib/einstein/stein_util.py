"""Utilities for the Stein ensemble (reference: contrib/einstein/stein_util.py)."""

import jax
from jax.flatten_util import ravel_pytree


def batch_ravel_pytree(pytree, nbatch_dims=1):
    """Flatten a pytree whose leaves share ``nbatch_dims`` leading batch dims
    into a (batch..., flat) array; returns (flat, unravel_one, unravel_batch)."""
    if nbatch_dims == 0:
        flat, unravel = ravel_pytree(pytree)
        return flat, unravel, unravel
    prototype = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[nbatch_dims:])[0], pytree)
    _, unravel_one = ravel_pytree(prototype)
    flat = jax.vmap(lambda t: ravel_pytree(t)[0])(
        jax.tree.map(lambda x: x.reshape((-1,) + x.shape[nbatch_dims:]), pytree)
    )
    unravel_batch = jax.vmap(unravel_one)
    return flat, unravel_one, unravel_batch


def get_parameter_transform(site):
    """biject_to(site constraint) for param sites (identity otherwise)."""
    from numpyro_tpu.distributions.transforms import IdentityTransform, biject_to

    constraint = site["kwargs"].get("constraint")
    if constraint is None:
        return IdentityTransform()
    return biject_to(constraint)
