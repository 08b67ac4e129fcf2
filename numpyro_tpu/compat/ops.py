"""pyro-api ops namespace: jax.numpy stands in for torch
(reference: numpyro/compat/ops.py)."""

from jax.numpy import *  # noqa: F401, F403
