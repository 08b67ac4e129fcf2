"""Gaussian copula distributions — couple the last batch axis of a
univariate marginal with a multivariate-normal correlation structure.

Reference surface: numpyro/distributions/copula.py:13-140.  Implemented
fresh: the copula density is evaluated via the marginal cdf → normal
quantile map, all batched elementwise math (VPU) plus one triangular solve
in the MVN log_prob (MXU).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from . import constraints
from .continuous import Beta, MultivariateNormal, Normal
from .distribution import Distribution
from .util import clamp_probs, lazy_property, validate_sample

__all__ = ["GaussianCopula", "GaussianCopulaBeta"]


class GaussianCopula(Distribution):
    """Couples ``marginal_dist``'s last batch axis with a Gaussian copula.

    :param marginal_dist: univariate distribution whose last batch axis is
        to be coupled.
    :param correlation_matrix: correlation matrix of the coupling MVN.
    :param correlation_cholesky: Cholesky factor alternative.
    """

    arg_constraints = {
        "correlation_matrix": constraints.corr_matrix,
        "correlation_cholesky": constraints.corr_cholesky,
    }
    reparametrized_params = ["correlation_matrix", "correlation_cholesky"]
    pytree_data_fields = ("marginal_dist", "base_dist")

    def __init__(
        self,
        marginal_dist,
        correlation_matrix=None,
        correlation_cholesky=None,
        *,
        validate_args=None,
    ):
        if len(marginal_dist.event_shape) > 0:
            raise ValueError("`marginal_dist` needs to be a univariate distribution.")
        self.marginal_dist = marginal_dist
        self.base_dist = MultivariateNormal(
            covariance_matrix=correlation_matrix,
            scale_tril=correlation_cholesky,
        )
        event_shape = self.base_dist.event_shape
        batch_shape = lax.broadcast_shapes(
            self.marginal_dist.batch_shape[:-1],
            self.base_dist.batch_shape,
        )
        super().__init__(
            batch_shape=batch_shape,
            event_shape=event_shape,
            validate_args=validate_args,
        )

    def sample(self, key, sample_shape=()):
        shape = sample_shape + self.batch_shape
        normal_samples = self.base_dist.expand(shape).sample(key)
        cdf = Normal().cdf(normal_samples)
        return self.marginal_dist.icdf(cdf)

    @validate_sample
    def log_prob(self, value):
        # copula density: MVN log-density of the normal quantiles minus the
        # independent standard-normal log-density, plus marginal log-probs.
        marginal_lps = self.marginal_dist.log_prob(value)
        probs = self.marginal_dist.cdf(value)
        quantiles = Normal().icdf(clamp_probs(probs))
        copula_lp = (
            self.base_dist.log_prob(quantiles)
            + 0.5 * (quantiles**2).sum(-1)
            + 0.5 * jnp.log(2 * jnp.pi) * quantiles.shape[-1]
        )
        return copula_lp + marginal_lps.sum(axis=-1)

    @property
    def mean(self):
        return jnp.broadcast_to(self.marginal_dist.mean, self.shape())

    @property
    def variance(self):
        return jnp.broadcast_to(self.marginal_dist.variance, self.shape())

    @constraints.dependent_property(is_discrete=False, event_dim=1)
    def support(self):
        return constraints.independent(self.marginal_dist.support, 1)

    @lazy_property
    def correlation_matrix(self):
        return self.base_dist.covariance_matrix

    @lazy_property
    def correlation_cholesky(self):
        return self.base_dist.scale_tril


class GaussianCopulaBeta(GaussianCopula):
    arg_constraints = {
        "concentration1": constraints.positive,
        "concentration0": constraints.positive,
        "correlation_matrix": constraints.corr_matrix,
        "correlation_cholesky": constraints.corr_cholesky,
    }
    support = constraints.independent(constraints.unit_interval, 1)
    pytree_data_fields = ("concentration1", "concentration0")

    def __init__(
        self,
        concentration1,
        concentration0,
        correlation_matrix=None,
        correlation_cholesky=None,
        *,
        validate_args=False,
    ):
        self.concentration1, self.concentration0 = concentration1, concentration0
        super().__init__(
            Beta(concentration1, concentration0),
            correlation_matrix,
            correlation_cholesky,
            validate_args=validate_args,
        )
