"""Compound (conjugate-mixture) distributions.

Reference surface: numpyro/distributions/conjugate.py:26-276.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax, random
from jax.scipy.special import betaln, gammainc, gammaln

from . import constraints
from .continuous import Beta, Dirichlet, Gamma
from .discrete import BinomialProbs, MultinomialProbs, Poisson
from .distribution import Distribution
from .util import promote_shapes, validate_sample

__all__ = [
    "BetaBinomial",
    "DirichletMultinomial",
    "GammaPoisson",
    "NegativeBinomial",
    "NegativeBinomialProbs",
    "NegativeBinomialLogits",
]


class BetaBinomial(Distribution):
    """Binomial with Beta-distributed success probability."""

    arg_constraints = {
        "concentration1": constraints.positive,
        "concentration0": constraints.positive,
        "total_count": constraints.nonnegative_integer,
    }
    has_enumerate_support = True
    enumerate_support = BinomialProbs.enumerate_support
    pytree_data_fields = ("concentration1", "concentration0")
    pytree_aux_fields = ("total_count",)

    def __init__(self, concentration1, concentration0, total_count=1, *, validate_args=None):
        self.concentration1, self.concentration0, self.total_count = promote_shapes(
            concentration1, concentration0, total_count
        )
        batch_shape = lax.broadcast_shapes(
            jnp.shape(concentration1), jnp.shape(concentration0), jnp.shape(total_count)
        )
        super().__init__(batch_shape, validate_args=validate_args)

    def sample(self, key, sample_shape=()):
        key_beta, key_binom = random.split(key)
        probs = Beta(self.concentration1, self.concentration0).sample(
            key_beta, sample_shape
        )
        return BinomialProbs(total_count=self.total_count, probs=probs).sample(key_binom)

    @validate_sample
    def log_prob(self, value):
        return (
            -betaln(self.concentration1, self.concentration0)
            + betaln(value + self.concentration1, self.total_count - value + self.concentration0)
            + gammaln(jnp.asarray(self.total_count, dtype=jnp.result_type(float)) + 1)
            - gammaln(value + 1)
            - gammaln(self.total_count - value + 1)
        )

    @property
    def mean(self):
        return (
            self.total_count
            * self.concentration1
            / (self.concentration1 + self.concentration0)
        )

    @property
    def variance(self):
        total = self.concentration1 + self.concentration0
        return (
            self.total_count
            * self.concentration1
            * self.concentration0
            * (total + self.total_count)
            / (total**2 * (total + 1))
        )

    @property
    def support(self):
        return constraints.integer_interval(0, self.total_count)


class DirichletMultinomial(Distribution):
    """Multinomial with Dirichlet-distributed probabilities."""

    arg_constraints = {
        "concentration": constraints.independent(constraints.positive, 1),
        "total_count": constraints.nonnegative_integer,
    }
    pytree_data_fields = ("concentration",)
    pytree_aux_fields = ("total_count",)

    def __init__(self, concentration, total_count=1, *, validate_args=None):
        if jnp.ndim(concentration) < 1:
            raise ValueError("`concentration` parameter must be at least one-dimensional.")
        batch_shape = lax.broadcast_shapes(
            jnp.shape(concentration)[:-1], jnp.shape(total_count)
        )
        concentration_shape = batch_shape + jnp.shape(concentration)[-1:]
        (self.concentration,) = promote_shapes(concentration, shape=concentration_shape)
        (self.total_count,) = promote_shapes(total_count, shape=batch_shape)
        event_shape = jnp.shape(concentration)[-1:]
        super().__init__(batch_shape, event_shape, validate_args=validate_args)

    def sample(self, key, sample_shape=()):
        key_dirichlet, key_multinom = random.split(key)
        probs = Dirichlet(self.concentration).sample(key_dirichlet, sample_shape)
        return MultinomialProbs(
            total_count=jnp.broadcast_to(
                jnp.asarray(self.total_count), sample_shape + self.batch_shape
            ),
            probs=probs,
        ).sample(key_multinom)

    @validate_sample
    def log_prob(self, value):
        alpha = self.concentration
        n = jnp.asarray(self.total_count, dtype=jnp.result_type(float))
        return (
            gammaln(alpha.sum(-1))
            + gammaln(n + 1)
            - gammaln(n + alpha.sum(-1))
            + (gammaln(value + alpha) - gammaln(alpha) - gammaln(value + 1)).sum(-1)
        )

    @property
    def mean(self):
        return self.concentration * jnp.expand_dims(
            jnp.asarray(self.total_count)
            / self.concentration.sum(-1),
            -1,
        )

    @property
    def variance(self):
        alpha = self.concentration
        alpha_sum = alpha.sum(-1, keepdims=True)
        alpha_ratio = alpha / alpha_sum
        n = jnp.expand_dims(jnp.asarray(self.total_count), -1)
        return n * alpha_ratio * (1 - alpha_ratio) * (n + alpha_sum) / (1 + alpha_sum)

    @property
    def support(self):
        return constraints.multinomial(self.total_count)


class GammaPoisson(Distribution):
    """Poisson with Gamma-distributed rate (negative binomial)."""

    arg_constraints = {
        "concentration": constraints.positive,
        "rate": constraints.positive,
    }
    support = constraints.nonnegative_integer
    pytree_data_fields = ("_gamma", "concentration", "rate")

    def __init__(self, concentration, rate=1.0, *, validate_args=None):
        self._gamma = Gamma(concentration, rate)
        self.concentration = self._gamma.concentration
        self.rate = self._gamma.rate
        super().__init__(self._gamma.batch_shape, validate_args=validate_args)

    def sample(self, key, sample_shape=()):
        key_gamma, key_poisson = random.split(key)
        rate = self._gamma.sample(key_gamma, sample_shape)
        return random.poisson(key_poisson, rate)

    @validate_sample
    def log_prob(self, value):
        post_value = self.concentration + value
        return (
            -betaln(self.concentration, value + 1)
            - jnp.log(post_value)
            + self.concentration * jnp.log(self.rate)
            - post_value * jnp.log1p(self.rate)
        )

    @property
    def mean(self):
        return self.concentration / self.rate

    @property
    def variance(self):
        return self.concentration / jnp.square(self.rate) * (1 + self.rate)

    def cdf(self, value):
        import jax.scipy.special as sps

        p = self.rate / (self.rate + 1)
        return sps.betainc(self.concentration, value + 1, p)


class NegativeBinomialProbs(GammaPoisson):
    """Negative binomial (success-probability parameterization) as a
    Gamma-Poisson mixture (reference: numpyro/distributions/conjugate.py:240)."""

    arg_constraints = {
        "total_count": constraints.positive,
        "probs": constraints.unit_interval,
    }
    support = constraints.nonnegative_integer

    def __init__(self, total_count, probs, *, validate_args=None):
        self.total_count, self.probs = promote_shapes(total_count, probs)
        super().__init__(
            total_count, 1.0 / probs - 1.0, validate_args=validate_args
        )


class NegativeBinomialLogits(GammaPoisson):
    """Negative binomial (logits parameterization)
    (reference: numpyro/distributions/conjugate.py:254)."""

    arg_constraints = {
        "total_count": constraints.positive,
        "logits": constraints.real,
    }
    support = constraints.nonnegative_integer

    def __init__(self, total_count, logits, *, validate_args=None):
        self.total_count, self.logits = promote_shapes(total_count, logits)
        super().__init__(
            total_count, jnp.exp(-logits), validate_args=validate_args
        )

    @validate_sample
    def log_prob(self, value):
        from jax.nn import softplus

        total_count = self.total_count
        log_beta = (
            gammaln(total_count)
            + gammaln(value + 1.0)
            - gammaln(total_count + value + 1.0)
        )
        return -(
            total_count * softplus(self.logits)
            + value * softplus(-self.logits)
            + log_beta
            + jnp.log(total_count + value)
        )


def NegativeBinomial(total_count, probs=None, logits=None, *, validate_args=None):
    if probs is not None:
        return NegativeBinomialProbs(total_count, probs, validate_args=validate_args)
    elif logits is not None:
        return NegativeBinomialLogits(total_count, logits, validate_args=validate_args)
    else:
        raise ValueError("One of `probs` or `logits` must be specified.")
