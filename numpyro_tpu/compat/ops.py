"""pyro-api ops namespace: jax.numpy standing in for torch, with
torch-calling-convention wrappers (reference: numpyro/compat/ops.py).

Pyro-generic code writes ``ops.ones(2, 3)`` (varargs sizes, torch style)
and ``ops.tensor(...)``; jax.numpy wants a single shape tuple.  The shims
below accept both spellings.
"""

import builtins as _builtins

import numpy as _np

import jax.numpy as jnp
from jax.numpy import *  # noqa: F401, F403

tensor = jnp.array


def _as_shape(sizes):
    if not sizes:
        raise ValueError("Positional `size` argument not provided.")
    if len(sizes) == 1 and isinstance(sizes[0], (tuple, list)):
        sizes = tuple(sizes[0])
    # NB: the star-import shadows builtins.any/all with the jnp reductions
    if not _builtins.all(isinstance(s, (int, _np.integer)) for s in sizes):
        raise ValueError("Invalid data type for `size` provided.")
    return tuple(int(s) for s in sizes)


def ones(*sizes, **kwargs):
    return jnp.ones(_as_shape(sizes), **kwargs)


def zeros(*sizes, **kwargs):
    return jnp.zeros(_as_shape(sizes), **kwargs)


def randn(*sizes, **kwargs):
    """torch.randn lookalike (host-side numpy; for test scaffolding only)."""
    return _np.random.randn(*_as_shape(sizes))
