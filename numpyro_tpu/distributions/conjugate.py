"""Compound (conjugate-mixture) distributions.

Reference surface: numpyro/distributions/conjugate.py:26-276.  Densities are
written through the beta-function identity ``C(n,k) = 1/((n+1)·B(n-k+1,k+1))``
so every binomial-type coefficient is one ``betaln`` away.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import random
from jax.nn import softplus
from jax.scipy.special import betainc, betaln, gammaln

from . import constraints
from .continuous import Beta, Dirichlet, Gamma
from .discrete import BinomialProbs, MultinomialProbs
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

_POS = constraints.positive
_NN_INT = constraints.nonnegative_integer


def _fl(x):
    return jnp.asarray(x, dtype=jnp.result_type(float))


def _log_binom_coeff(n, k):
    """log C(n, k) via the beta function: C(n,k) = 1/((n+1) B(n-k+1, k+1))."""
    n = _fl(n)
    return -jnp.log1p(n) - betaln(n - k + 1.0, k + 1.0)


class BetaBinomial(Distribution):
    """Binomial whose success probability is itself Beta-distributed."""

    arg_constraints = dict(
        concentration1=_POS, concentration0=_POS, total_count=_NN_INT
    )
    has_enumerate_support = True
    enumerate_support = BinomialProbs.enumerate_support
    pytree_data_fields = ("concentration1", "concentration0")
    pytree_aux_fields = ("total_count",)

    def __init__(self, concentration1, concentration0, total_count=1, *, validate_args=None):
        self._init_broadcast(
            validate_args,
            concentration1=concentration1,
            concentration0=concentration0,
            total_count=total_count,
        )

    def sample(self, key, sample_shape=()):
        k_mix, k_obs = random.split(key)
        p = Beta(self.concentration1, self.concentration0).sample(k_mix, sample_shape)
        return BinomialProbs(p, total_count=self.total_count).sample(k_obs)

    @validate_sample
    def log_prob(self, value):
        a, b, n = self.concentration1, self.concentration0, self.total_count
        posterior = betaln(value + a, _fl(n) - value + b)
        return _log_binom_coeff(n, value) + posterior - betaln(a, b)

    @property
    def mean(self):
        frac = self.concentration1 / (self.concentration1 + self.concentration0)
        return self.total_count * frac

    @property
    def variance(self):
        a, b, n = self.concentration1, self.concentration0, self.total_count
        s = a + b
        return n * (a / s) * (b / s) * (s + n) / (s + 1.0)

    @property
    def support(self):
        return constraints.integer_interval(0, self.total_count)


class DirichletMultinomial(Distribution):
    """Multinomial whose probability vector is Dirichlet-distributed."""

    arg_constraints = dict(
        concentration=constraints.independent(_POS, 1), total_count=_NN_INT
    )
    pytree_data_fields = ("concentration",)
    pytree_aux_fields = ("total_count",)

    def __init__(self, concentration, total_count=1, *, validate_args=None):
        if jnp.ndim(concentration) == 0:
            raise ValueError("`concentration` must carry a category axis.")
        self._init_broadcast(
            validate_args,
            event_shape=jnp.shape(concentration)[-1:],
            event_dims={"concentration": 1},
            concentration=concentration,
            total_count=total_count,
        )

    def sample(self, key, sample_shape=()):
        k_mix, k_obs = random.split(key)
        p = Dirichlet(self.concentration).sample(k_mix, sample_shape)
        counts = jnp.broadcast_to(
            jnp.asarray(self.total_count), sample_shape + self.batch_shape
        )
        return MultinomialProbs(p, total_count=counts).sample(k_obs)

    @validate_sample
    def log_prob(self, value):
        alpha = self.concentration
        a_tot = alpha.sum(-1)
        n = _fl(self.total_count)
        log_coeff = gammaln(n + 1.0) - gammaln(value + 1.0).sum(-1)
        per_cat = (gammaln(value + alpha) - gammaln(alpha)).sum(-1)
        return log_coeff + per_cat + gammaln(a_tot) - gammaln(n + a_tot)

    @property
    def mean(self):
        share = self.concentration / self.concentration.sum(-1, keepdims=True)
        return jnp.asarray(self.total_count)[..., None] * share

    @property
    def variance(self):
        a_tot = self.concentration.sum(-1, keepdims=True)
        share = self.concentration / a_tot
        n = jnp.asarray(self.total_count)[..., None]
        overdisp = (n + a_tot) / (1.0 + a_tot)
        return n * share * (1.0 - share) * overdisp

    @property
    def support(self):
        return constraints.multinomial(self.total_count)


class GammaPoisson(Distribution):
    """Poisson whose rate is Gamma-distributed (negative binomial)."""

    arg_constraints = dict(concentration=_POS, rate=_POS)
    support = _NN_INT
    pytree_data_fields = ("concentration", "rate")

    def __init__(self, concentration, rate=1.0, *, validate_args=None):
        self._init_broadcast(validate_args, concentration=concentration, rate=rate)

    def sample(self, key, sample_shape=()):
        k_mix, k_obs = random.split(key)
        lam = Gamma(self.concentration, self.rate).sample(k_mix, sample_shape)
        return random.poisson(k_obs, lam)

    @validate_sample
    def log_prob(self, value):
        a, beta = self.concentration, self.rate
        # NB(a, p=1/(1+beta)):  log C(k+a-1, k) + a log(beta/(1+beta)-part)
        log_coeff = -jnp.log(a + value) - betaln(a, value + 1.0)
        return log_coeff + a * jnp.log(beta) - (a + value) * jnp.log1p(beta)

    @property
    def mean(self):
        return self.concentration / self.rate

    @property
    def variance(self):
        return self.mean * (1.0 + self.rate) / self.rate

    def cdf(self, value):
        return betainc(self.concentration, value + 1.0, self.rate / (1.0 + self.rate))


class NegativeBinomialProbs(GammaPoisson):
    """Negative binomial (success-probability parameterization) as a
    Gamma-Poisson mixture (reference: numpyro/distributions/conjugate.py:240)."""

    arg_constraints = dict(total_count=_POS, probs=constraints.unit_interval)
    support = _NN_INT

    def __init__(self, total_count, probs, *, validate_args=None):
        self.total_count, self.probs = promote_shapes(total_count, probs)
        odds_against = (1.0 - probs) / probs
        super().__init__(total_count, odds_against, validate_args=validate_args)


class NegativeBinomialLogits(GammaPoisson):
    """Negative binomial (logits parameterization)
    (reference: numpyro/distributions/conjugate.py:254)."""

    arg_constraints = dict(total_count=_POS, logits=constraints.real)
    support = _NN_INT

    def __init__(self, total_count, logits, *, validate_args=None):
        self.total_count, self.logits = promote_shapes(total_count, logits)
        super().__init__(total_count, jnp.exp(-logits), validate_args=validate_args)

    @validate_sample
    def log_prob(self, value):
        n, logit = _fl(self.total_count), self.logits
        log_coeff = -jnp.log(n + value) - betaln(n, value + 1.0)
        # k log sigmoid(logit) + n log sigmoid(-logit), stably
        log_pq = -value * softplus(-logit) - n * softplus(logit)
        return log_coeff + log_pq


def NegativeBinomial(total_count, probs=None, logits=None, *, validate_args=None):
    if probs is not None:
        return NegativeBinomialProbs(total_count, probs, validate_args=validate_args)
    if logits is not None:
        return NegativeBinomialLogits(total_count, logits, validate_args=validate_args)
    raise ValueError("One of `probs` or `logits` must be specified.")
