"""Init strategies: per-site functions returning initial latent values.

Reference surface: numpyro/infer/initialization.py:14-154.
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp
from jax import random

import numpyro_tpu.distributions as dist
from numpyro_tpu.distributions.distribution import Distribution
from numpyro_tpu.util import find_stack_level

__all__ = [
    "init_to_feasible",
    "init_to_mean",
    "init_to_median",
    "init_to_sample",
    "init_to_uniform",
    "init_to_value",
]


def init_to_median(site=None, num_samples=15):
    """Initialize to the empirical prior median of ``num_samples`` draws."""
    if site is None:
        return partial(init_to_median, num_samples=num_samples)

    if (
        site["type"] == "sample"
        and not site["is_observed"]
        and not site["fn"].support.is_discrete
    ):
        if site["value"] is not None:
            import warnings

            warnings.warn(
                f"init_to_median() skipping initialization of site '{site['name']}'"
                " which already stores a value.",
                stacklevel=find_stack_level(),
            )
            return site["value"]

        rng_key = site["kwargs"].get("rng_key")
        sample_shape = site["kwargs"].get("sample_shape")
        try:
            samples = site["fn"](
                sample_shape=(num_samples,) + sample_shape, rng_key=rng_key
            )
            return jnp.median(samples, axis=0)
        except NotImplementedError:
            return init_to_uniform(site)


def init_to_mean(site=None):
    """Initialize to the prior mean; falls back to median when undefined."""
    if site is None:
        return partial(init_to_mean)

    if (
        site["type"] == "sample"
        and not site["is_observed"]
        and not site["fn"].support.is_discrete
    ):
        if site["value"] is not None:
            return site["value"]
        try:
            value = site["fn"].mean
            sample_shape = site["kwargs"].get("sample_shape")
            if sample_shape:
                value = jnp.broadcast_to(value, sample_shape + jnp.shape(value))
            if isinstance(value, jnp.ndarray) and jnp.any(jnp.isnan(value)):
                raise NotImplementedError
            return value
        except NotImplementedError:
            return init_to_median(site)


def init_to_sample(site=None):
    """Initialize to a prior sample."""
    if site is None:
        return partial(init_to_sample)
    return init_to_median(site, num_samples=1)


def init_to_uniform(site=None, radius=2.0):
    """Initialize to Uniform(-radius, radius) in unconstrained space —
    the NUTS default (Stan-compatible)."""
    if site is None:
        return partial(init_to_uniform, radius=radius)

    if (
        site["type"] == "sample"
        and not site["is_observed"]
        and not site["fn"].support.is_discrete
    ):
        if site["value"] is not None:
            return site["value"]

        from numpyro_tpu.distributions import biject_to

        rng_key = site["kwargs"].get("rng_key")
        sample_shape = site["kwargs"].get("sample_shape")

        # shapes are static — no need to draw a prior sample (which improper
        # priors cannot do anyway)
        prototype_shape = tuple(site["fn"].shape())
        transform = biject_to(site["fn"].support)
        unconstrained_shape = transform.inverse_shape(prototype_shape)
        unconstrained_samples = dist.Uniform(-radius, radius).sample(
            rng_key, sample_shape=sample_shape + unconstrained_shape
        )
        return transform(unconstrained_samples)


def init_to_feasible(site=None):
    """Initialize to an arbitrary feasible point (uniform radius 0)."""
    if site is None:
        return partial(init_to_feasible)
    return init_to_uniform(site, radius=0.0)


def init_to_value(site=None, values={}):
    """Initialize to given values; missing sites fall back to uniform."""
    if site is None:
        return partial(init_to_value, values=values)

    if site["type"] == "sample" and not site["is_observed"]:
        if site["name"] in values:
            return values[site["name"]]
        return init_to_uniform(site)
