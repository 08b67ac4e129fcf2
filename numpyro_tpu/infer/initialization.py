"""Init strategies: per-site functions returning initial latent values.

Reference surface: numpyro/infer/initialization.py:14-154.  Restructured
around a single currying decorator — each strategy states only its core
rule; eligibility (continuous, unobserved sample sites) and the
stored-value shortcut are factored out.
"""

from __future__ import annotations

import functools
import warnings

import jax.numpy as jnp

import numpyro_tpu.distributions as dist
from numpyro_tpu.util import find_stack_level

__all__ = [
    "init_to_feasible",
    "init_to_mean",
    "init_to_median",
    "init_to_sample",
    "init_to_uniform",
    "init_to_value",
]


def _strategy(rule):
    """Make ``rule(site, **options)`` curryable as ``strategy(**options)``
    and restrict it to continuous, unobserved sample sites."""

    @functools.wraps(rule)
    def apply(site=None, **options):
        if site is None:
            return functools.partial(apply, **options)
        if (
            site["type"] != "sample"
            or site["is_observed"]
            or site["fn"].support.is_discrete
        ):
            return None
        return rule(site, **options)

    return apply


def _site_shapes(site):
    """(rng_key, sample_shape, event+batch shape of one draw)."""
    return (
        site["kwargs"].get("rng_key"),
        site["kwargs"].get("sample_shape"),
        tuple(site["fn"].shape()),
    )


@_strategy
def init_to_median(site, num_samples=15):
    """Initialize to the empirical prior median of ``num_samples`` draws."""
    if site["value"] is not None:
        warnings.warn(
            f"init_to_median() skipping initialization of site '{site['name']}'"
            " which already stores a value.",
            stacklevel=find_stack_level(),
        )
        return site["value"]
    rng_key, sample_shape, _ = _site_shapes(site)
    try:
        draws = site["fn"](
            rng_key=rng_key, sample_shape=(num_samples,) + sample_shape
        )
    except NotImplementedError:
        return init_to_uniform(site)
    return jnp.median(draws, axis=0)


@_strategy
def init_to_mean(site):
    """Initialize to the prior mean; falls back to median when undefined."""
    if site["value"] is not None:
        return site["value"]
    try:
        mean = site["fn"].mean
        if isinstance(mean, jnp.ndarray) and jnp.any(jnp.isnan(mean)):
            raise NotImplementedError
    except NotImplementedError:
        return init_to_median(site)
    _, sample_shape, _ = _site_shapes(site)
    if sample_shape:
        mean = jnp.broadcast_to(mean, sample_shape + jnp.shape(mean))
    return mean


def init_to_sample(site=None):
    """Initialize to a single prior sample."""
    if site is None:
        return init_to_sample
    return init_to_median(site, num_samples=1)


@_strategy
def init_to_uniform(site, radius=2.0):
    """Initialize to Uniform(-radius, radius) in unconstrained space —
    the NUTS default (Stan-compatible)."""
    if site["value"] is not None:
        return site["value"]
    from numpyro_tpu.distributions import biject_to

    rng_key, sample_shape, draw_shape = _site_shapes(site)
    # shapes are static, so no prior draw is needed (improper priors could
    # not provide one anyway): sample the unconstrained box directly and
    # push it through the support bijector
    to_support = biject_to(site["fn"].support)
    box = dist.Uniform(-radius, radius).sample(
        rng_key, sample_shape + to_support.inverse_shape(draw_shape)
    )
    return to_support(box)


def init_to_feasible(site=None):
    """Initialize to an arbitrary feasible point (uniform radius 0)."""
    if site is None:
        return init_to_feasible
    return init_to_uniform(site, radius=0.0)


def init_to_value(site=None, values={}):
    """Initialize to given values; missing sites fall back to uniform."""
    if site is None:
        return functools.partial(init_to_value, values=values)
    if site["type"] == "sample" and not site["is_observed"]:
        try:
            return values[site["name"]]
        except KeyError:
            return init_to_uniform(site)
