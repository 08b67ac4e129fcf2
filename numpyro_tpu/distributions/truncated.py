"""Truncated distributions (left/right/two-sided) via CDF inversion.

Reference surface: numpyro/distributions/truncated.py:29-837.  Sampling is
inverse-CDF on a uniform draw rescaled to the truncated mass — one fused
elementwise program, no rejection loops.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax, random

from . import constraints
from .continuous import Cauchy, Laplace, Logistic, Normal, StudentT
from .distribution import Distribution
from .util import clamp_probs, is_prng_key, lazy_property, promote_shapes, validate_sample

__all__ = [
    "LeftTruncatedDistribution",
    "RightTruncatedDistribution",
    "TruncatedCauchy",
    "TruncatedDistribution",
    "TruncatedNormal",
    "TwoSidedTruncatedDistribution",
]

_SUPPORTED = (Cauchy, Laplace, Logistic, Normal, StudentT)


class LeftTruncatedDistribution(Distribution):
    arg_constraints = {"low": constraints.real}
    reparametrized_params = ["low"]
    pytree_data_fields = ("base_dist", "low", "_support")

    def __init__(self, base_dist, low=0.0, *, validate_args=None):
        assert isinstance(base_dist, _SUPPORTED), (
            "The base distribution should be univariate and has real support."
        )
        batch_shape = lax.broadcast_shapes(base_dist.batch_shape, jnp.shape(low))
        self.base_dist = base_dist.expand(batch_shape)
        (self.low,) = promote_shapes(low, shape=batch_shape)
        self._support = constraints.greater_than(low)
        super().__init__(batch_shape, validate_args=validate_args)

    @property
    def support(self):
        return self._support

    @lazy_property
    def _tail_prob_at_low(self):
        # if low < loc, returns cdf(low); otherwise returns 1 - cdf(low)
        loc = self.base_dist.loc
        sign = jnp.where(loc >= self.low, 1.0, -1.0)
        return self.base_dist.cdf(loc - sign * (loc - self.low))

    @lazy_property
    def _tail_prob_at_high(self):
        # tail prob at +inf in the (possibly flipped) frame
        loc = self.base_dist.loc
        return jnp.where(loc >= self.low, 1.0, 0.0)

    def sample(self, key, sample_shape=()):
        assert is_prng_key(key)
        dtype = jnp.result_type(float)
        finfo = jnp.finfo(dtype)
        minval = finfo.tiny
        u = random.uniform(key, shape=sample_shape + self.batch_shape, minval=minval)
        # flip symmetric bases so the truncation point is always computed in
        # the accurate (left) tail of the cdf, then reflect back
        loc = self.base_dist.loc
        sign = jnp.where(loc >= self.low, 1.0, -1.0)
        Flow = self._tail_prob_at_low
        Fhigh = self._tail_prob_at_high
        return (1 - sign) * loc + sign * self.base_dist.icdf(
            clamp_probs((1 - u) * Flow + u * Fhigh)
        )

    @validate_sample
    def log_prob(self, value):
        loc = self.base_dist.loc
        sign = jnp.where(loc >= self.low, 1.0, -1.0)
        return self.base_dist.log_prob(value) - jnp.log(
            sign * (self._tail_prob_at_high - self._tail_prob_at_low)
        )

    @property
    def mean(self):
        if isinstance(self.base_dist, Normal):
            low_prob = jnp.exp(self.log_prob(self.low))
            return self.base_dist.loc + low_prob * self.base_dist.scale**2
        elif isinstance(self.base_dist, Cauchy):
            return jnp.full(self.batch_shape, jnp.nan)
        raise NotImplementedError("mean only available for Normal and Cauchy")

    @property
    def variance(self):
        if isinstance(self.base_dist, Normal):
            low_prob = jnp.exp(self.log_prob(self.low))
            return self.base_dist.scale**2 * (
                1 + (self.low - self.base_dist.loc) * low_prob
            ) - (low_prob * self.base_dist.scale**2) ** 2
        elif isinstance(self.base_dist, Cauchy):
            return jnp.full(self.batch_shape, jnp.nan)
        raise NotImplementedError("variance only available for Normal and Cauchy")


class RightTruncatedDistribution(Distribution):
    arg_constraints = {"high": constraints.real}
    reparametrized_params = ["high"]
    pytree_data_fields = ("base_dist", "high", "_support")

    def __init__(self, base_dist, high=0.0, *, validate_args=None):
        assert isinstance(base_dist, _SUPPORTED), (
            "The base distribution should be univariate and has real support."
        )
        batch_shape = lax.broadcast_shapes(base_dist.batch_shape, jnp.shape(high))
        self.base_dist = base_dist.expand(batch_shape)
        (self.high,) = promote_shapes(high, shape=batch_shape)
        self._support = constraints.less_than(high)
        super().__init__(batch_shape, validate_args=validate_args)

    @property
    def support(self):
        return self._support

    @lazy_property
    def _cdf_at_high(self):
        return self.base_dist.cdf(self.high)

    def sample(self, key, sample_shape=()):
        assert is_prng_key(key)
        dtype = jnp.result_type(float)
        finfo = jnp.finfo(dtype)
        minval = finfo.tiny
        u = random.uniform(key, shape=sample_shape + self.batch_shape, minval=minval)
        return self.base_dist.icdf(clamp_probs(u * self._cdf_at_high))

    @validate_sample
    def log_prob(self, value):
        return self.base_dist.log_prob(value) - jnp.log(self._cdf_at_high)

    @property
    def mean(self):
        if isinstance(self.base_dist, Normal):
            high_prob = jnp.exp(self.log_prob(self.high))
            return self.base_dist.loc - high_prob * self.base_dist.scale**2
        elif isinstance(self.base_dist, Cauchy):
            return jnp.full(self.batch_shape, jnp.nan)
        raise NotImplementedError("mean only available for Normal and Cauchy")

    @property
    def variance(self):
        if isinstance(self.base_dist, Normal):
            high_prob = jnp.exp(self.log_prob(self.high))
            return self.base_dist.scale**2 * (
                1 - (self.high - self.base_dist.loc) * high_prob
            ) - (high_prob * self.base_dist.scale**2) ** 2
        elif isinstance(self.base_dist, Cauchy):
            return jnp.full(self.batch_shape, jnp.nan)
        raise NotImplementedError("variance only available for Normal and Cauchy")


class TwoSidedTruncatedDistribution(Distribution):
    arg_constraints = {
        "low": constraints.dependent(is_discrete=False, event_dim=0),
        "high": constraints.dependent(is_discrete=False, event_dim=0),
    }
    reparametrized_params = ["low", "high"]
    pytree_data_fields = ("base_dist", "low", "high", "_support")

    def __init__(self, base_dist, low=0.0, high=1.0, *, validate_args=None):
        assert isinstance(base_dist, _SUPPORTED), (
            "The base distribution should be univariate and has real support."
        )
        batch_shape = lax.broadcast_shapes(
            base_dist.batch_shape, jnp.shape(low), jnp.shape(high)
        )
        self.base_dist = base_dist.expand(batch_shape)
        (self.low,) = promote_shapes(low, shape=batch_shape)
        (self.high,) = promote_shapes(high, shape=batch_shape)
        self._support = constraints.interval(low, high)
        super().__init__(batch_shape, validate_args=validate_args)

    @property
    def support(self):
        return self._support

    @lazy_property
    def _cdf_low(self):
        return self.base_dist.cdf(self.low)

    @lazy_property
    def _cdf_high(self):
        return self.base_dist.cdf(self.high)

    def sample(self, key, sample_shape=()):
        assert is_prng_key(key)
        dtype = jnp.result_type(float)
        finfo = jnp.finfo(dtype)
        minval = finfo.tiny
        u = random.uniform(key, shape=sample_shape + self.batch_shape, minval=minval)
        return self.base_dist.icdf(
            clamp_probs(self._cdf_low + u * (self._cdf_high - self._cdf_low))
        )

    @validate_sample
    def log_prob(self, value):
        return self.base_dist.log_prob(value) - jnp.log(
            self._cdf_high - self._cdf_low
        )

    @property
    def mean(self):
        if isinstance(self.base_dist, Normal):
            low_prob = jnp.exp(self.base_dist.log_prob(self.low))
            high_prob = jnp.exp(self.base_dist.log_prob(self.high))
            Z = self._cdf_high - self._cdf_low
            return (
                self.base_dist.loc
                + (low_prob - high_prob) / Z * self.base_dist.scale**2
            )
        elif isinstance(self.base_dist, Cauchy):
            return jnp.full(self.batch_shape, jnp.nan)
        raise NotImplementedError("mean only available for Normal and Cauchy")

    @property
    def variance(self):
        if isinstance(self.base_dist, Normal):
            scale = self.base_dist.scale
            loc = self.base_dist.loc
            low_prob = jnp.exp(self.base_dist.log_prob(self.low))
            high_prob = jnp.exp(self.base_dist.log_prob(self.high))
            Z = self._cdf_high - self._cdf_low
            a = (self.low - loc) / scale
            b = (self.high - loc) / scale
            phi_a = low_prob * scale
            phi_b = high_prob * scale
            t1 = (a * phi_a - b * phi_b) / Z
            t2 = ((phi_a - phi_b) / Z) ** 2
            return scale**2 * (1 + t1 - t2)
        elif isinstance(self.base_dist, Cauchy):
            return jnp.full(self.batch_shape, jnp.nan)
        raise NotImplementedError("variance only available for Normal and Cauchy")


def TruncatedDistribution(base_dist, low=None, high=None, *, validate_args=None):
    """Factory dispatching on which bounds are given (reference:
    numpyro/distributions/truncated.py TruncatedDistribution)."""
    if high is None:
        if low is None:
            return base_dist
        return LeftTruncatedDistribution(base_dist, low=low, validate_args=validate_args)
    elif low is None:
        return RightTruncatedDistribution(
            base_dist, high=high, validate_args=validate_args
        )
    return TwoSidedTruncatedDistribution(
        base_dist, low=low, high=high, validate_args=validate_args
    )


def TruncatedNormal(loc=0.0, scale=1.0, *, low=None, high=None, validate_args=None):
    return TruncatedDistribution(
        Normal(loc, scale), low=low, high=high, validate_args=validate_args
    )


def TruncatedCauchy(loc=0.0, scale=1.0, *, low=None, high=None, validate_args=None):
    return TruncatedDistribution(
        Cauchy(loc, scale), low=low, high=high, validate_args=validate_args
    )
