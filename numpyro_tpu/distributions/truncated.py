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


class TruncatedPolyaGamma(Distribution):
    """Polya-Gamma PG(1, 0) truncated to (0, 2.5], with a fixed-term series
    log_prob — used for logistic-likelihood augmentation schemes
    (reference: numpyro/distributions/truncated.py:341)."""

    truncation_point = 2.5
    num_log_prob_terms = 7
    num_gamma_variates = 8

    arg_constraints = {}
    support = constraints.interval(0.0, truncation_point)

    def __init__(self, batch_shape=(), *, validate_args=None):
        super().__init__(batch_shape, validate_args=validate_args)

    def sample(self, key, sample_shape=()):
        assert is_prng_key(key)
        denom = jnp.square(jnp.arange(0.5, self.num_gamma_variates))
        x = random.gamma(
            key,
            jnp.ones(
                self.batch_shape + tuple(sample_shape) + (self.num_gamma_variates,)
            ),
        )
        x = jnp.sum(x / denom, axis=-1)
        return jnp.clip(x * (0.5 / jnp.pi**2), None, self.truncation_point)

    @validate_sample
    def log_prob(self, value):
        from jax.scipy.special import logsumexp

        value = value[..., None]
        all_indices = jnp.arange(0, self.num_log_prob_terms)
        two_n_plus_one = 2.0 * all_indices + 1.0
        log_terms = (
            jnp.log(two_n_plus_one)
            - 1.5 * jnp.log(value)
            - 0.125 * jnp.square(two_n_plus_one) / value
        )
        even_terms = jnp.take(log_terms, all_indices[::2], axis=-1)
        odd_terms = jnp.take(log_terms, all_indices[1::2], axis=-1)
        sum_even = jnp.exp(logsumexp(even_terms, axis=-1))
        sum_odd = jnp.exp(logsumexp(odd_terms, axis=-1))
        return jnp.log(sum_even - sum_odd) - 0.5 * jnp.log(2.0 * jnp.pi)


class LowerTruncatedPowerLaw(Distribution):
    """Power law x^alpha on [low, inf), alpha < -1
    (reference: numpyro/distributions/truncated.py:837)."""

    arg_constraints = {
        "alpha": constraints.less_than(-1.0),
        "low": constraints.greater_than(0.0),
    }
    reparametrized_params = ["alpha", "low"]
    pytree_aux_fields = ("_support",)

    def __init__(self, alpha, low, *, validate_args=None):
        self.alpha, self.low = promote_shapes(alpha, low)
        batch_shape = lax.broadcast_shapes(jnp.shape(alpha), jnp.shape(low))
        self._support = constraints.greater_than(low)
        super().__init__(batch_shape=batch_shape, validate_args=validate_args)

    @constraints.dependent_property(is_discrete=False, event_dim=0)
    def support(self):
        return self._support

    @validate_sample
    def log_prob(self, value):
        one_more_alpha = 1.0 + self.alpha
        return (
            self.alpha * jnp.log(value)
            + jnp.log(-one_more_alpha)
            - one_more_alpha * jnp.log(self.low)
        )

    def cdf(self, value):
        return jnp.where(
            value <= self.low,
            jnp.zeros_like(value),
            1.0 - jnp.power(value / self.low, 1.0 + self.alpha),
        )

    def icdf(self, q):
        nan_mask = jnp.isnan(q) | (q < 0.0) | (q > 1.0)
        return jnp.where(
            nan_mask,
            jnp.nan,
            self.low * jnp.power(1.0 - q, jnp.reciprocal(1.0 + self.alpha)),
        )

    def sample(self, key, sample_shape=()):
        assert is_prng_key(key)
        u = random.uniform(key, sample_shape + self.batch_shape)
        return self.icdf(u)

    @property
    def mean(self):
        k = 1.0
        neg_one_more_alpha = -(1.0 + self.alpha)
        return jnp.where(
            k < neg_one_more_alpha,
            neg_one_more_alpha / (neg_one_more_alpha - k) * self.low,
            jnp.inf,
        )

    @property
    def variance(self):
        neg_one_more_alpha = -(1.0 + self.alpha)
        m1 = neg_one_more_alpha / (neg_one_more_alpha - 1.0) * self.low
        m2 = neg_one_more_alpha / (neg_one_more_alpha - 2.0) * self.low**2
        return jnp.where(2.0 < neg_one_more_alpha, m2 - m1**2, jnp.inf)


class DoublyTruncatedPowerLaw(Distribution):
    """Power law x^alpha on [low, high].  The alpha == -1 singularity is
    handled by the masked-branch ("double where") pattern so both branches
    stay NaN-free under jit and grad — the TPU-friendly alternative to the
    reference's hand-written custom_jvp pair
    (reference: numpyro/distributions/truncated.py:381)."""

    arg_constraints = {
        "alpha": constraints.real,
        "low": constraints.greater_than_eq(0),
        "high": constraints.greater_than(0),
    }
    reparametrized_params = ["alpha", "low", "high"]
    pytree_aux_fields = ("_support",)
    pytree_data_fields = ("alpha", "low", "high")

    def __init__(self, alpha, low, high, *, validate_args=None):
        self.alpha, self.low, self.high = promote_shapes(alpha, low, high)
        self._support = constraints.interval(low, high)
        batch_shape = lax.broadcast_shapes(
            jnp.shape(alpha), jnp.shape(low), jnp.shape(high)
        )
        super().__init__(batch_shape=batch_shape, validate_args=validate_args)

    @constraints.dependent_property(is_discrete=False, event_dim=0)
    def support(self):
        return self._support

    def _branches(self):
        """(mask, safe_alpha) where safe_alpha replaces -1 by 0 so the
        generic branch never divides by zero."""
        mask = jnp.not_equal(self.alpha, -1.0)
        return mask, jnp.where(mask, self.alpha, 0.0)

    @validate_sample
    def log_prob(self, value):
        mask, safe_alpha = self._branches()
        one_more_alpha = 1.0 + safe_alpha

        def generic():
            z = (
                jnp.power(self.high, one_more_alpha)
                - jnp.power(self.low, one_more_alpha)
            ) / one_more_alpha
            return safe_alpha * jnp.log(value) - jnp.log(z)

        def log_branch():
            return -jnp.log(value) - jnp.log(
                jnp.log(self.high) - jnp.log(self.low)
            )

        return jnp.where(mask, generic(), log_branch())

    def cdf(self, value):
        mask, safe_alpha = self._branches()
        one_more_alpha = 1.0 + safe_alpha
        low_pow = jnp.power(self.low, one_more_alpha)
        generic = (jnp.power(value, one_more_alpha) - low_pow) / (
            jnp.power(self.high, one_more_alpha) - low_pow
        )
        log_branch = jnp.log(value / self.low) / jnp.log(self.high / self.low)
        return jnp.clip(jnp.where(mask, generic, log_branch), 0.0, 1.0)

    def icdf(self, q):
        mask, safe_alpha = self._branches()
        one_more_alpha = 1.0 + safe_alpha
        low_pow = jnp.power(self.low, one_more_alpha)
        high_pow = jnp.power(self.high, one_more_alpha)
        generic = jnp.power(
            low_pow + q * (high_pow - low_pow), jnp.reciprocal(one_more_alpha)
        )
        log_branch = jnp.power(self.high / self.low, q) * self.low
        return jnp.where(mask, generic, log_branch)

    def sample(self, key, sample_shape=()):
        assert is_prng_key(key)
        u = random.uniform(key, sample_shape + self.batch_shape)
        return self.icdf(u)
