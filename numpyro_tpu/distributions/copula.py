"""Gaussian copula distributions — couple the last batch axis of a
univariate marginal through a multivariate-normal correlation structure.

Role parity: numpyro/distributions/copula.py:13-140.  The density is
evaluated through the probability-integral transform: marginal cdf →
standard-normal quantiles → correlated-MVN density, with the independent
standard-normal density divided back out.  Everything is batched
elementwise math (VPU) plus one triangular solve inside the MVN (MXU).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax
from jax.scipy.special import ndtr, ndtri

from . import constraints
from .continuous import Beta, MultivariateNormal, Normal
from .distribution import Distribution
from .util import clamp_probs, lazy_property, validate_sample

__all__ = ["GaussianCopula", "GaussianCopulaBeta"]


class GaussianCopula(Distribution):
    """Joint distribution with ``marginal_dist`` marginals (coupled along
    their last batch axis) and Gaussian-copula dependence.

    :param marginal_dist: univariate distribution for each coordinate.
    :param correlation_matrix: correlation matrix of the coupling MVN.
    :param correlation_cholesky: Cholesky-factor alternative.
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
        super().__init__(
            batch_shape=lax.broadcast_shapes(
                marginal_dist.batch_shape[:-1], self.base_dist.batch_shape
            ),
            event_shape=self.base_dist.event_shape,
            validate_args=validate_args,
        )

    def _to_quantiles(self, value):
        """Per-coordinate standard-normal quantiles of the marginal cdf."""
        return ndtri(clamp_probs(self.marginal_dist.cdf(value)))

    def sample(self, key, sample_shape=()):
        gauss = self.base_dist.expand(sample_shape + self.batch_shape).sample(key)
        return self.marginal_dist.icdf(ndtr(gauss))

    @validate_sample
    def log_prob(self, value):
        q = self._to_quantiles(value)
        # joint = marginals x (correlated gaussian / independent gaussian)
        dependence = self.base_dist.log_prob(q) - Normal().log_prob(q).sum(-1)
        return dependence + self.marginal_dist.log_prob(value).sum(-1)

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
    """Beta marginals under a Gaussian copula."""

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
