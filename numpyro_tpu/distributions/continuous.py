"""Continuous distributions.

Fresh TPU-first implementations with the same API surface as
numpyro/distributions/continuous.py.  Samplers use jax.random primitives
(threefry counter-based — identical draws regardless of chain layout, the
property the chain-massive engine relies on for reproducibility across
shardings); log-densities are closed-form jnp, batched over arbitrary
leading axes so a (num_chains, ...) prefix compiles to one fused kernel.
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax, random
from jax.scipy.linalg import solve_triangular
from jax.scipy.special import (
    betaln,
    digamma,
    erf,
    erfc,
    erfinv,
    gammainc,
    gammaln,
    log_ndtr,
    logsumexp,
    multigammaln,
    ndtr,
    ndtri,
    xlog1py,
    xlogy,
)

from . import constraints
from .distribution import Distribution, TransformedDistribution
from .transforms import (
    AffineTransform,
    CorrCholeskyTransform,
    ExpTransform,
    PowerTransform,
)
from .util import (
    add_diag,
    betaincinv,
    clamp_probs,
    gammaincinv,
    lazy_property,
    matrix_to_tril_vec,
    promote_shapes,
    validate_sample,
    vec_to_tril_matrix,
)

__all__ = [
    "AsymmetricLaplace",
    "Beta",
    "Cauchy",
    "Chi2",
    "Dirichlet",
    "Exponential",
    "Gamma",
    "GaussianRandomWalk",
    "Gumbel",
    "HalfCauchy",
    "HalfNormal",
    "InverseGamma",
    "Kumaraswamy",
    "Laplace",
    "LKJ",
    "LKJCholesky",
    "Logistic",
    "LogNormal",
    "LogUniform",
    "LowRankMultivariateNormal",
    "MultivariateNormal",
    "MultivariateStudentT",
    "Normal",
    "Pareto",
    "StudentT",
    "Uniform",
    "Weibull",
    "Wishart",
    "WishartCholesky",
]


class Normal(Distribution):
    arg_constraints = {"loc": constraints.real, "scale": constraints.positive}
    support = constraints.real
    reparametrized_params = ["loc", "scale"]

    def __init__(self, loc=0.0, scale=1.0, *, validate_args=None):
        self.loc, self.scale = promote_shapes(loc, scale)
        batch_shape = lax.broadcast_shapes(jnp.shape(loc), jnp.shape(scale))
        super().__init__(batch_shape=batch_shape, validate_args=validate_args)

    def sample(self, key, sample_shape=()):
        eps = random.normal(
            key, shape=sample_shape + self.batch_shape + self.event_shape
        )
        return self.loc + eps * self.scale

    @validate_sample
    def log_prob(self, value):
        normalize_term = jnp.log(jnp.sqrt(2 * jnp.pi) * self.scale)
        value_scaled = (value - self.loc) / self.scale
        return -0.5 * value_scaled**2 - normalize_term

    def cdf(self, value):
        scaled = (value - self.loc) / self.scale
        return ndtr(scaled)

    def log_cdf(self, value):
        return log_ndtr((value - self.loc) / self.scale)

    def icdf(self, q):
        return self.loc + self.scale * ndtri(q)

    @property
    def mean(self):
        return jnp.broadcast_to(self.loc, self.batch_shape)

    @property
    def variance(self):
        return jnp.broadcast_to(self.scale**2, self.batch_shape)

    def entropy(self):
        return jnp.broadcast_to(
            0.5 * jnp.log(2 * jnp.pi * self.scale**2) + 0.5, self.batch_shape
        )


class Uniform(Distribution):
    arg_constraints = {
        "low": constraints.dependent(is_discrete=False, event_dim=0),
        "high": constraints.dependent(is_discrete=False, event_dim=0),
    }
    reparametrized_params = ["low", "high"]
    pytree_data_fields = ("low", "high", "_support")

    def __init__(self, low=0.0, high=1.0, *, validate_args=None):
        self.low, self.high = promote_shapes(low, high)
        batch_shape = lax.broadcast_shapes(jnp.shape(low), jnp.shape(high))
        self._support = constraints.interval(low, high)
        super().__init__(batch_shape, validate_args=validate_args)

    @property
    def support(self):
        return self._support

    def sample(self, key, sample_shape=()):
        shape = sample_shape + self.batch_shape
        return random.uniform(key, shape=shape) * (self.high - self.low) + self.low

    @validate_sample
    def log_prob(self, value):
        # broadcast against the live parameter shapes, not the cached
        # batch_shape: under vmap_over the per-lane params are sliced while
        # the aux batch_shape is stale
        batch = lax.broadcast_shapes(jnp.shape(self.low), jnp.shape(self.high))
        shape = lax.broadcast_shapes(jnp.shape(value), batch)
        return -jnp.broadcast_to(jnp.log(self.high - self.low), shape)

    def cdf(self, value):
        cdf = (value - self.low) / (self.high - self.low)
        return jnp.clip(cdf, 0.0, 1.0)

    def icdf(self, value):
        return self.low + value * (self.high - self.low)

    @property
    def mean(self):
        return jnp.broadcast_to((self.high + self.low) / 2.0, self.batch_shape)

    @property
    def variance(self):
        return jnp.broadcast_to((self.high - self.low) ** 2 / 12.0, self.batch_shape)

    def entropy(self):
        return jnp.broadcast_to(jnp.log(self.high - self.low), self.batch_shape)


class Exponential(Distribution):
    arg_constraints = {"rate": constraints.positive}
    support = constraints.positive
    reparametrized_params = ["rate"]

    def __init__(self, rate=1.0, *, validate_args=None):
        self.rate = rate
        super().__init__(batch_shape=jnp.shape(rate), validate_args=validate_args)

    def sample(self, key, sample_shape=()):
        shape = sample_shape + self.batch_shape + self.event_shape
        return random.exponential(key, shape=shape) / self.rate

    @validate_sample
    def log_prob(self, value):
        return jnp.log(self.rate) - self.rate * value

    def cdf(self, value):
        return -jnp.expm1(-self.rate * value)

    def icdf(self, q):
        return -jnp.log1p(-q) / self.rate

    @property
    def mean(self):
        return jnp.broadcast_to(1.0 / self.rate, self.batch_shape)

    @property
    def variance(self):
        return jnp.broadcast_to(1.0 / self.rate**2, self.batch_shape)

    def entropy(self):
        return 1 - jnp.broadcast_to(jnp.log(self.rate), self.batch_shape)


class Gamma(Distribution):
    arg_constraints = {
        "concentration": constraints.positive,
        "rate": constraints.positive,
    }
    support = constraints.positive
    reparametrized_params = ["concentration", "rate"]

    def __init__(self, concentration, rate=1.0, *, validate_args=None):
        self.concentration, self.rate = promote_shapes(concentration, rate)
        batch_shape = lax.broadcast_shapes(jnp.shape(concentration), jnp.shape(rate))
        super().__init__(batch_shape=batch_shape, validate_args=validate_args)

    def sample(self, key, sample_shape=()):
        shape = sample_shape + self.batch_shape + self.event_shape
        return random.gamma(key, self.concentration, shape=shape) / self.rate

    @validate_sample
    def log_prob(self, value):
        normalize_term = gammaln(self.concentration) - self.concentration * jnp.log(
            self.rate
        )
        return (
            (self.concentration - 1) * jnp.log(value)
            - self.rate * value
            - normalize_term
        )

    @property
    def mean(self):
        return jnp.broadcast_to(self.concentration / self.rate, self.batch_shape)

    @property
    def variance(self):
        return jnp.broadcast_to(self.concentration / self.rate**2, self.batch_shape)

    def cdf(self, x):
        return gammainc(self.concentration, self.rate * x)

    def icdf(self, q):
        return gammaincinv(self.concentration, q) / self.rate

    def entropy(self):
        return jnp.broadcast_to(
            self.concentration
            - jnp.log(self.rate)
            + gammaln(self.concentration)
            + (1 - self.concentration) * digamma(self.concentration),
            self.batch_shape,
        )


class Chi2(Gamma):
    arg_constraints = {"df": constraints.positive}
    reparametrized_params = ["df"]

    def __init__(self, df, *, validate_args=None):
        self.df = df
        super().__init__(0.5 * df, 0.5, validate_args=validate_args)


class InverseGamma(TransformedDistribution):
    arg_constraints = {
        "concentration": constraints.positive,
        "rate": constraints.positive,
    }
    reparametrized_params = ["concentration", "rate"]
    support = constraints.positive
    pytree_data_fields = ("concentration", "rate")

    def __init__(self, concentration, rate=1.0, *, validate_args=None):
        base_dist = Gamma(concentration, rate)
        self.concentration = base_dist.concentration
        self.rate = base_dist.rate
        super().__init__(
            base_dist, PowerTransform(-1.0), validate_args=validate_args
        )

    @property
    def mean(self):
        a = self.concentration
        return jnp.where(a <= 1, jnp.inf, self.rate / (a - 1))

    @property
    def variance(self):
        a = self.concentration
        return jnp.where(
            a <= 2, jnp.inf, self.rate**2 / ((a - 1) ** 2 * (a - 2))
        )

    def entropy(self):
        a, b = self.concentration, self.rate
        return a + jnp.log(b) + gammaln(a) - (1 + a) * digamma(a)

    def cdf(self, x):
        return 1 - self.base_dist.cdf(1 / x)


class Beta(Distribution):
    arg_constraints = {
        "concentration1": constraints.positive,
        "concentration0": constraints.positive,
    }
    reparametrized_params = ["concentration1", "concentration0"]
    support = constraints.unit_interval

    def __init__(self, concentration1, concentration0, *, validate_args=None):
        self.concentration1, self.concentration0 = promote_shapes(
            concentration1, concentration0
        )
        batch_shape = lax.broadcast_shapes(
            jnp.shape(concentration1), jnp.shape(concentration0)
        )
        super().__init__(batch_shape=batch_shape, validate_args=validate_args)

    def sample(self, key, sample_shape=()):
        shape = sample_shape + self.batch_shape
        return clamp_probs(
            random.beta(key, self.concentration1, self.concentration0, shape=shape)
        )

    @validate_sample
    def log_prob(self, value):
        return (
            xlogy(self.concentration1 - 1.0, value)
            + xlog1py(self.concentration0 - 1.0, -value)
            - betaln(self.concentration1, self.concentration0)
        )

    @property
    def mean(self):
        total = self.concentration1 + self.concentration0
        return jnp.broadcast_to(self.concentration1 / total, self.batch_shape)

    @property
    def variance(self):
        total = self.concentration1 + self.concentration0
        return jnp.broadcast_to(
            self.concentration1 * self.concentration0 / (total**2 * (total + 1)),
            self.batch_shape,
        )

    def cdf(self, value):
        return jax.scipy.special.betainc(
            self.concentration1, self.concentration0, value
        )

    def icdf(self, q):
        return betaincinv(self.concentration1, self.concentration0, q)

    def entropy(self):
        a, b = self.concentration1, self.concentration0
        total = a + b
        return (
            betaln(a, b)
            - (a - 1) * digamma(a)
            - (b - 1) * digamma(b)
            + (total - 2) * digamma(total)
        )


class Dirichlet(Distribution):
    arg_constraints = {
        "concentration": constraints.independent(constraints.positive, 1)
    }
    reparametrized_params = ["concentration"]
    support = constraints.simplex

    def __init__(self, concentration, *, validate_args=None):
        if jnp.ndim(concentration) < 1:
            raise ValueError("concentration must be at least one-dimensional")
        self.concentration = concentration
        batch_shape, event_shape = concentration.shape[:-1], concentration.shape[-1:]
        super().__init__(batch_shape, event_shape, validate_args=validate_args)

    def sample(self, key, sample_shape=()):
        shape = sample_shape + self.batch_shape
        samples = random.dirichlet(key, self.concentration, shape=shape)
        return jnp.clip(
            samples, jnp.finfo(samples.dtype).tiny, 1 - jnp.finfo(samples.dtype).eps
        )

    @validate_sample
    def log_prob(self, value):
        return (
            jnp.sum(jnp.log(value) * (self.concentration - 1.0), axis=-1)
            + gammaln(jnp.sum(self.concentration, axis=-1))
            - jnp.sum(gammaln(self.concentration), axis=-1)
        )

    @property
    def mean(self):
        return self.concentration / jnp.sum(self.concentration, axis=-1, keepdims=True)

    @property
    def variance(self):
        con0 = jnp.sum(self.concentration, axis=-1, keepdims=True)
        return self.concentration * (con0 - self.concentration) / (con0**2 * (con0 + 1))

    def entropy(self):
        a = self.concentration
        a0 = a.sum(-1)
        K = a.shape[-1]
        return (
            gammaln(a).sum(-1)
            - gammaln(a0)
            + (a0 - K) * digamma(a0)
            - ((a - 1) * digamma(a)).sum(-1)
        )


class Cauchy(Distribution):
    arg_constraints = {"loc": constraints.real, "scale": constraints.positive}
    support = constraints.real
    reparametrized_params = ["loc", "scale"]

    def __init__(self, loc=0.0, scale=1.0, *, validate_args=None):
        self.loc, self.scale = promote_shapes(loc, scale)
        batch_shape = lax.broadcast_shapes(jnp.shape(loc), jnp.shape(scale))
        super().__init__(batch_shape=batch_shape, validate_args=validate_args)

    def sample(self, key, sample_shape=()):
        eps = random.cauchy(key, shape=sample_shape + self.batch_shape)
        return self.loc + eps * self.scale

    @validate_sample
    def log_prob(self, value):
        return (
            -jnp.log(jnp.pi)
            - jnp.log(self.scale)
            - jnp.log1p(((value - self.loc) / self.scale) ** 2)
        )

    def cdf(self, value):
        scaled = (value - self.loc) / self.scale
        return jnp.arctan(scaled) / jnp.pi + 0.5

    def icdf(self, q):
        return self.loc + self.scale * jnp.tan(jnp.pi * (q - 0.5))

    @property
    def mean(self):
        return jnp.full(self.batch_shape, jnp.nan)

    @property
    def variance(self):
        return jnp.full(self.batch_shape, jnp.nan)

    def entropy(self):
        return jnp.broadcast_to(
            jnp.log(4 * jnp.pi * self.scale), self.batch_shape
        )


class HalfCauchy(Distribution):
    arg_constraints = {"scale": constraints.positive}
    support = constraints.positive
    reparametrized_params = ["scale"]
    pytree_data_fields = ("_cauchy", "scale")

    def __init__(self, scale=1.0, *, validate_args=None):
        self._cauchy = Cauchy(0.0, scale)
        self.scale = scale
        super().__init__(jnp.shape(scale), validate_args=validate_args)

    def sample(self, key, sample_shape=()):
        return jnp.abs(self._cauchy.sample(key, sample_shape))

    @validate_sample
    def log_prob(self, value):
        return self._cauchy.log_prob(value) + jnp.log(2)

    def cdf(self, value):
        return self._cauchy.cdf(value) * 2 - 1

    def icdf(self, q):
        return self._cauchy.icdf((q + 1) / 2)

    @property
    def mean(self):
        return jnp.full(self.batch_shape, jnp.inf)

    @property
    def variance(self):
        return jnp.full(self.batch_shape, jnp.inf)


class HalfNormal(Distribution):
    arg_constraints = {"scale": constraints.positive}
    support = constraints.positive
    reparametrized_params = ["scale"]
    pytree_data_fields = ("_normal", "scale")

    def __init__(self, scale=1.0, *, validate_args=None):
        self._normal = Normal(0.0, scale)
        self.scale = scale
        super().__init__(jnp.shape(scale), validate_args=validate_args)

    def sample(self, key, sample_shape=()):
        return jnp.abs(self._normal.sample(key, sample_shape))

    @validate_sample
    def log_prob(self, value):
        return self._normal.log_prob(value) + jnp.log(2)

    def cdf(self, value):
        return self._normal.cdf(value) * 2 - 1

    def icdf(self, q):
        return self._normal.icdf((q + 1) / 2)

    @property
    def mean(self):
        return jnp.sqrt(2 / jnp.pi) * self.scale

    @property
    def variance(self):
        return (1 - 2 / jnp.pi) * self.scale**2

    def entropy(self):
        return 0.5 * jnp.log(jnp.pi * self.scale**2 / 2) + 0.5


class LogNormal(TransformedDistribution):
    arg_constraints = {"loc": constraints.real, "scale": constraints.positive}
    support = constraints.positive
    reparametrized_params = ["loc", "scale"]
    pytree_data_fields = ("loc", "scale")

    def __init__(self, loc=0.0, scale=1.0, *, validate_args=None):
        base_dist = Normal(loc, scale)
        self.loc, self.scale = base_dist.loc, base_dist.scale
        super().__init__(base_dist, ExpTransform(), validate_args=validate_args)

    @property
    def mean(self):
        return jnp.exp(self.loc + self.scale**2 / 2)

    @property
    def variance(self):
        return (jnp.exp(self.scale**2) - 1) * jnp.exp(2 * self.loc + self.scale**2)

    def entropy(self):
        return (1 + jnp.log(2 * jnp.pi)) / 2 + self.loc + jnp.log(self.scale)

    def cdf(self, x):
        return self.base_dist.cdf(jnp.log(x))


class LogUniform(TransformedDistribution):
    arg_constraints = {"low": constraints.positive, "high": constraints.positive}
    reparametrized_params = ["low", "high"]
    pytree_data_fields = ("low", "high", "_support")

    def __init__(self, low, high, *, validate_args=None):
        base_dist = Uniform(jnp.log(low), jnp.log(high))
        self.low, self.high = promote_shapes(low, high)
        self._support = constraints.interval(self.low, self.high)
        super().__init__(base_dist, ExpTransform(), validate_args=validate_args)

    @property
    def support(self):
        return self._support

    @property
    def mean(self):
        return (self.high - self.low) / jnp.log(self.high / self.low)

    @property
    def variance(self):
        log_ratio = jnp.log(self.high / self.low)
        return (
            0.5 * (self.high**2 - self.low**2) / log_ratio
            - ((self.high - self.low) / log_ratio) ** 2
        )

    def entropy(self):
        log_ratio = jnp.log(self.high / self.low)
        return 0.5 * (jnp.log(self.low) + jnp.log(self.high)) + jnp.log(log_ratio)

    def cdf(self, x):
        return self.base_dist.cdf(jnp.log(x))


class StudentT(Distribution):
    arg_constraints = {
        "df": constraints.positive,
        "loc": constraints.real,
        "scale": constraints.positive,
    }
    support = constraints.real
    reparametrized_params = ["df", "loc", "scale"]

    def __init__(self, df, loc=0.0, scale=1.0, *, validate_args=None):
        batch_shape = lax.broadcast_shapes(
            jnp.shape(df), jnp.shape(loc), jnp.shape(scale)
        )
        self.df, self.loc, self.scale = promote_shapes(df, loc, scale)
        super().__init__(batch_shape, validate_args=validate_args)

    def sample(self, key, sample_shape=()):
        key_normal, key_chi2 = random.split(key)
        shape = sample_shape + self.batch_shape
        std_normal = random.normal(key_normal, shape)
        z = random.chisquare(key_chi2, self.df, shape)
        y = std_normal * jnp.sqrt(self.df / z)
        return self.loc + self.scale * y

    @validate_sample
    def log_prob(self, value):
        y = (value - self.loc) / self.scale
        z = (
            jnp.log(self.scale)
            + 0.5 * jnp.log(self.df)
            + 0.5 * jnp.log(jnp.pi)
            + gammaln(0.5 * self.df)
            - gammaln(0.5 * (self.df + 1.0))
        )
        return -0.5 * (self.df + 1.0) * jnp.log1p(y**2.0 / self.df) - z

    @property
    def mean(self):
        return jnp.broadcast_to(
            jnp.where(self.df <= 1, jnp.nan, self.loc), self.batch_shape
        )

    @property
    def variance(self):
        var = jnp.where(
            self.df > 2, self.scale**2 * self.df / (self.df - 2.0), jnp.inf
        )
        var = jnp.where(self.df <= 1, jnp.nan, var)
        return jnp.broadcast_to(var, self.batch_shape)

    def cdf(self, value):
        # scipy-style via incomplete beta
        t = (value - self.loc) / self.scale
        x = self.df / (self.df + t**2)
        tail = 0.5 * jax.scipy.special.betainc(0.5 * self.df, 0.5, x)
        return jnp.where(t >= 0, 1 - tail, tail)

    def entropy(self):
        df = self.df
        return jnp.broadcast_to(
            0.5 * (df + 1) * (digamma(0.5 * (df + 1)) - digamma(0.5 * df))
            + 0.5 * jnp.log(df)
            + betaln(0.5 * df, 0.5)
            + jnp.log(self.scale),
            self.batch_shape,
        )


class Laplace(Distribution):
    arg_constraints = {"loc": constraints.real, "scale": constraints.positive}
    support = constraints.real
    reparametrized_params = ["loc", "scale"]

    def __init__(self, loc=0.0, scale=1.0, *, validate_args=None):
        self.loc, self.scale = promote_shapes(loc, scale)
        batch_shape = lax.broadcast_shapes(jnp.shape(loc), jnp.shape(scale))
        super().__init__(batch_shape=batch_shape, validate_args=validate_args)

    def sample(self, key, sample_shape=()):
        eps = random.laplace(key, shape=sample_shape + self.batch_shape)
        return self.loc + eps * self.scale

    @validate_sample
    def log_prob(self, value):
        normalize_term = jnp.log(2 * self.scale)
        value_abs = jnp.abs(value - self.loc)
        return -value_abs / self.scale - normalize_term

    def cdf(self, value):
        scaled = (value - self.loc) / self.scale
        return 0.5 - 0.5 * jnp.sign(scaled) * jnp.expm1(-jnp.abs(scaled))

    def icdf(self, q):
        a = q - 0.5
        return self.loc - self.scale * jnp.sign(a) * jnp.log1p(-2 * jnp.abs(a))

    @property
    def mean(self):
        return jnp.broadcast_to(self.loc, self.batch_shape)

    @property
    def variance(self):
        return jnp.broadcast_to(2 * self.scale**2, self.batch_shape)

    def entropy(self):
        return jnp.log(2 * self.scale) + 1


class AsymmetricLaplace(Distribution):
    arg_constraints = {
        "loc": constraints.real,
        "scale": constraints.positive,
        "asymmetry": constraints.positive,
    }
    support = constraints.real
    reparametrized_params = ["loc", "scale", "asymmetry"]

    def __init__(self, loc=0.0, scale=1.0, asymmetry=1.0, *, validate_args=None):
        batch_shape = lax.broadcast_shapes(
            jnp.shape(loc), jnp.shape(scale), jnp.shape(asymmetry)
        )
        self.loc, self.scale, self.asymmetry = promote_shapes(loc, scale, asymmetry)
        super().__init__(batch_shape=batch_shape, validate_args=validate_args)

    @lazy_property
    def left_scale(self):
        return self.scale * self.asymmetry

    @lazy_property
    def right_scale(self):
        return self.scale / self.asymmetry

    def log_prob(self, value):
        if self._validate_args:
            self._validate_sample(value)
        z = value - self.loc
        z = -jnp.abs(z) / jnp.where(z < 0, self.left_scale, self.right_scale)
        return z - jnp.log(self.left_scale + self.right_scale)

    def sample(self, key, sample_shape=()):
        shape = (2,) + sample_shape + self.batch_shape + self.event_shape
        u, v = random.exponential(key, shape=shape)
        return self.loc - self.left_scale * u + self.right_scale * v

    @property
    def mean(self):
        total = self.right_scale - self.left_scale
        return jnp.broadcast_to(self.loc + total, self.batch_shape)

    @property
    def variance(self):
        left = self.left_scale
        right = self.right_scale
        total = left + right
        p = left / total
        q = right / total
        return jnp.broadcast_to(
            p * left**2 + q * right**2 + p * q * total**2, self.batch_shape
        )

    def cdf(self, value):
        z = value - self.loc
        k = self.asymmetry**2
        return jnp.where(
            z >= 0,
            1 - jnp.exp(-jnp.abs(z) / self.right_scale) / (1 + k),
            k / (1 + k) * jnp.exp(-jnp.abs(z) / self.left_scale),
        )

    def icdf(self, value):
        k = self.asymmetry**2
        temp = k / (1 + k)
        return jnp.where(
            value <= temp,
            self.loc + self.left_scale * jnp.log(value / temp),
            self.loc - self.right_scale * jnp.log((1 - value) * (1 + k)),
        )


class Gumbel(Distribution):
    arg_constraints = {"loc": constraints.real, "scale": constraints.positive}
    support = constraints.real
    reparametrized_params = ["loc", "scale"]

    def __init__(self, loc=0.0, scale=1.0, *, validate_args=None):
        self.loc, self.scale = promote_shapes(loc, scale)
        batch_shape = lax.broadcast_shapes(jnp.shape(loc), jnp.shape(scale))
        super().__init__(batch_shape=batch_shape, validate_args=validate_args)

    def sample(self, key, sample_shape=()):
        standard_gumbel_sample = random.gumbel(
            key, shape=sample_shape + self.batch_shape + self.event_shape
        )
        return self.loc + self.scale * standard_gumbel_sample

    @validate_sample
    def log_prob(self, value):
        z = (value - self.loc) / self.scale
        return -(z + jnp.exp(-z)) - jnp.log(self.scale)

    @property
    def mean(self):
        return jnp.broadcast_to(
            self.loc + self.scale * jnp.euler_gamma, self.batch_shape
        )

    @property
    def variance(self):
        return jnp.broadcast_to(
            jnp.pi**2 / 6.0 * self.scale**2, self.batch_shape
        )

    def cdf(self, value):
        return jnp.exp(-jnp.exp((self.loc - value) / self.scale))

    def icdf(self, q):
        return self.loc - self.scale * jnp.log(-jnp.log(q))

    def entropy(self):
        return jnp.log(self.scale) + 1 + jnp.euler_gamma


class Logistic(Distribution):
    arg_constraints = {"loc": constraints.real, "scale": constraints.positive}
    support = constraints.real
    reparametrized_params = ["loc", "scale"]

    def __init__(self, loc=0.0, scale=1.0, *, validate_args=None):
        self.loc, self.scale = promote_shapes(loc, scale)
        batch_shape = lax.broadcast_shapes(jnp.shape(loc), jnp.shape(scale))
        super().__init__(batch_shape, validate_args=validate_args)

    def sample(self, key, sample_shape=()):
        z = random.logistic(key, shape=sample_shape + self.batch_shape + self.event_shape)
        return self.loc + z * self.scale

    @validate_sample
    def log_prob(self, value):
        log_exponent = (self.loc - value) / self.scale
        log_denominator = jnp.log(self.scale) + 2 * jax.nn.softplus(log_exponent)
        return log_exponent - log_denominator

    @property
    def mean(self):
        return jnp.broadcast_to(self.loc, self.batch_shape)

    @property
    def variance(self):
        var = (self.scale**2) * (jnp.pi**2) / 3
        return jnp.broadcast_to(var, self.batch_shape)

    def cdf(self, value):
        scaled = (value - self.loc) / self.scale
        return jax.nn.sigmoid(scaled)

    def icdf(self, q):
        return self.loc + self.scale * jax.scipy.special.logit(q)

    def entropy(self):
        return jnp.broadcast_to(jnp.log(self.scale) + 2, self.batch_shape)


class Pareto(TransformedDistribution):
    arg_constraints = {"scale": constraints.positive, "alpha": constraints.positive}
    reparametrized_params = ["scale", "alpha"]
    pytree_data_fields = ("scale", "alpha")

    def __init__(self, scale, alpha, *, validate_args=None):
        self.scale, self.alpha = promote_shapes(scale, alpha)
        batch_shape = lax.broadcast_shapes(jnp.shape(scale), jnp.shape(alpha))
        scale, alpha = (
            jnp.broadcast_to(scale, batch_shape),
            jnp.broadcast_to(alpha, batch_shape),
        )
        base_dist = Exponential(alpha)
        transforms = [ExpTransform(), AffineTransform(loc=0, scale=scale)]
        super().__init__(base_dist, transforms, validate_args=validate_args)

    @property
    def mean(self):
        a = jnp.divide(self.alpha * self.scale, (self.alpha - 1))
        return jnp.where(self.alpha <= 1, jnp.inf, a)

    @property
    def variance(self):
        a = jnp.divide(
            (self.scale**2) * self.alpha, (self.alpha - 1) ** 2 * (self.alpha - 2)
        )
        return jnp.where(self.alpha <= 2, jnp.inf, a)

    @property
    def support(self):
        return constraints.greater_than(self.scale)

    def entropy(self):
        return jnp.log(self.scale / self.alpha) + 1 / self.alpha + 1

    def cdf(self, value):
        return 1 - jnp.power(self.scale / value, self.alpha)

    def icdf(self, q):
        return self.scale / jnp.power(1 - q, 1 / self.alpha)


class Weibull(Distribution):
    arg_constraints = {
        "scale": constraints.positive,
        "concentration": constraints.positive,
    }
    support = constraints.positive
    reparametrized_params = ["scale", "concentration"]

    def __init__(self, scale, concentration, *, validate_args=None):
        self.concentration, self.scale = promote_shapes(concentration, scale)
        batch_shape = lax.broadcast_shapes(jnp.shape(concentration), jnp.shape(scale))
        super().__init__(batch_shape=batch_shape, validate_args=validate_args)

    def sample(self, key, sample_shape=()):
        return random.weibull_min(
            key,
            scale=self.scale,
            concentration=self.concentration,
            shape=sample_shape + self.batch_shape,
        )

    @validate_sample
    def log_prob(self, value):
        ll = -jnp.power(value / self.scale, self.concentration)
        ll = ll + jnp.log(self.concentration)
        ll = ll + (self.concentration - 1.0) * jnp.log(value)
        ll = ll - self.concentration * jnp.log(self.scale)
        return ll

    def cdf(self, value):
        return 1 - jnp.exp(-((value / self.scale) ** self.concentration))

    @property
    def mean(self):
        return self.scale * jnp.exp(gammaln(1.0 + 1.0 / self.concentration))

    @property
    def variance(self):
        return self.scale**2 * (
            jnp.exp(gammaln(1.0 + 2.0 / self.concentration))
            - jnp.exp(gammaln(1.0 + 1.0 / self.concentration)) ** 2
        )

    def entropy(self):
        return (
            jnp.euler_gamma * (1 - 1 / self.concentration)
            + jnp.log(self.scale / self.concentration)
            + 1
        )


class Kumaraswamy(Distribution):
    arg_constraints = {
        "concentration1": constraints.positive,
        "concentration0": constraints.positive,
    }
    reparametrized_params = ["concentration1", "concentration0"]
    support = constraints.unit_interval
    # number of KL-style reparam gradient terms; mirrors reference knob
    KL_KUMARASWAMY_BETA_TAYLOR_ORDER = 10

    def __init__(self, concentration1, concentration0, *, validate_args=None):
        self.concentration1, self.concentration0 = promote_shapes(
            concentration1, concentration0
        )
        batch_shape = lax.broadcast_shapes(
            jnp.shape(concentration1), jnp.shape(concentration0)
        )
        super().__init__(batch_shape=batch_shape, validate_args=validate_args)

    def sample(self, key, sample_shape=()):
        u = random.uniform(key, shape=sample_shape + self.batch_shape)
        u = clamp_probs(u)
        log_sample = jnp.log1p(-(u ** (1 / self.concentration0))) / self.concentration1
        finfo = jnp.finfo(u)
        return jnp.clip(jnp.exp(log_sample), finfo.tiny, 1 - finfo.eps)

    @validate_sample
    def log_prob(self, value):
        normalize_term = jnp.log(self.concentration0 * self.concentration1)
        return (
            xlogy(self.concentration1 - 1, value)
            + xlog1py(self.concentration0 - 1, -(value**self.concentration1))
            + normalize_term
        )

    @property
    def mean(self):
        log_beta = betaln(1 + 1 / self.concentration1, self.concentration0)
        return self.concentration0 * jnp.exp(log_beta)

    @property
    def variance(self):
        log_beta = betaln(1 + 2 / self.concentration1, self.concentration0)
        return self.concentration0 * jnp.exp(log_beta) - self.mean**2


def _batch_mahalanobis(bL, bx):
    """Batched squared Mahalanobis distance: x^T (L L^T)^{-1} x.

    Solves L y = x with a triangular solve over arbitrary broadcast batch
    shapes — the MVN hot path, maps to batched trsm on the MXU.
    """
    if bL.shape[:-1] == bx.shape:
        solve_bL_bx = solve_triangular(bL, bx[..., None], lower=True)
        return jnp.sum(solve_bL_bx**2, axis=(-1, -2))

    # When a single L is shared across a large sample batch (the MVN
    # posterior-predictive hot path), solve all samples in one trsm call:
    # reshape samples to columns of a matrix.
    if bL.ndim == 2:
        y = solve_triangular(bL, bx.reshape(-1, bx.shape[-1]).T, lower=True)
        return jnp.sum(y**2, axis=0).reshape(bx.shape[:-1])

    # general broadcasting case: align batch dims, let XLA's batched
    # triangular solve handle it (broadcast_to is fused, not materialized,
    # when it feeds a batched solve)
    out_shape = jnp.broadcast_shapes(bx.shape[:-1], bL.shape[:-2])
    n = bx.shape[-1]
    bx_b = jnp.broadcast_to(bx, out_shape + (n,))
    bL_b = jnp.broadcast_to(bL, out_shape + (n, n))
    y = solve_triangular(bL_b, bx_b[..., None], lower=True)
    return jnp.sum(y**2, axis=(-1, -2))


class MultivariateNormal(Distribution):
    arg_constraints = {
        "loc": constraints.real_vector,
        "covariance_matrix": constraints.positive_definite,
        "precision_matrix": constraints.positive_definite,
        "scale_tril": constraints.lower_cholesky,
    }
    support = constraints.real_vector
    reparametrized_params = [
        "loc",
        "covariance_matrix",
        "precision_matrix",
        "scale_tril",
    ]
    pytree_data_fields = ("loc", "scale_tril")

    def __init__(
        self,
        loc=0.0,
        covariance_matrix=None,
        precision_matrix=None,
        scale_tril=None,
        validate_args=None,
    ):
        if jnp.ndim(loc) == 0:
            (loc,) = promote_shapes(loc, shape=(1,))
        # align loc (..., D) against (..., D, D) matrices via a dummy axis
        if covariance_matrix is not None:
            loc, self.covariance_matrix = promote_shapes(
                loc[..., jnp.newaxis], covariance_matrix
            )
            self.scale_tril = jnp.linalg.cholesky(self.covariance_matrix)
        elif precision_matrix is not None:
            from .util import cholesky_of_inverse

            loc, self.precision_matrix = promote_shapes(
                loc[..., jnp.newaxis], precision_matrix
            )
            self.scale_tril = cholesky_of_inverse(self.precision_matrix)
        elif scale_tril is not None:
            loc, self.scale_tril = promote_shapes(loc[..., jnp.newaxis], scale_tril)
        else:
            raise ValueError(
                "One of covariance_matrix, precision_matrix, scale_tril must be specified."
            )
        batch_shape = lax.broadcast_shapes(
            jnp.shape(loc)[:-2], jnp.shape(self.scale_tril)[:-2]
        )
        event_shape = jnp.shape(self.scale_tril)[-1:]
        self.loc = loc[..., 0]
        super().__init__(
            batch_shape=batch_shape,
            event_shape=event_shape,
            validate_args=validate_args,
        )

    def sample(self, key, sample_shape=()):
        eps = random.normal(
            key, shape=sample_shape + self.batch_shape + self.event_shape
        )
        return self.loc + jnp.squeeze(
            jnp.matmul(self.scale_tril, eps[..., jnp.newaxis]), axis=-1
        )

    @validate_sample
    def log_prob(self, value):
        M = _batch_mahalanobis(self.scale_tril, value - self.loc)
        half_log_det = jnp.log(
            jnp.diagonal(self.scale_tril, axis1=-2, axis2=-1)
        ).sum(-1)
        normalize_term = half_log_det + 0.5 * self.scale_tril.shape[-1] * jnp.log(
            2 * jnp.pi
        )
        return -0.5 * M - normalize_term

    @lazy_property
    def covariance_matrix(self):
        return jnp.matmul(self.scale_tril, jnp.swapaxes(self.scale_tril, -1, -2))

    @lazy_property
    def precision_matrix(self):
        identity = jnp.broadcast_to(
            jnp.eye(self.scale_tril.shape[-1]), self.scale_tril.shape
        )
        inv_tril = solve_triangular(self.scale_tril, identity, lower=True)
        return jnp.matmul(jnp.swapaxes(inv_tril, -1, -2), inv_tril)

    @property
    def mean(self):
        return jnp.broadcast_to(self.loc, self.shape())

    @property
    def variance(self):
        return jnp.broadcast_to(
            jnp.sum(self.scale_tril**2, axis=-1), self.batch_shape + self.event_shape
        )

    def entropy(self):
        n = self.event_shape[-1]
        half_log_det = jnp.log(
            jnp.diagonal(self.scale_tril, axis1=-2, axis2=-1)
        ).sum(-1)
        return jnp.broadcast_to(
            0.5 * n * (1 + jnp.log(2 * jnp.pi)) + half_log_det, self.batch_shape
        )


class MultivariateStudentT(Distribution):
    arg_constraints = {
        "df": constraints.positive,
        "loc": constraints.real_vector,
        "scale_tril": constraints.lower_cholesky,
    }
    support = constraints.real_vector
    reparametrized_params = ["df", "loc", "scale_tril"]

    def __init__(self, df, loc=0.0, scale_tril=None, *, validate_args=None):
        if jnp.ndim(loc) == 0:
            (loc,) = promote_shapes(loc, shape=(1,))
        batch_shape = lax.broadcast_shapes(
            jnp.shape(df), jnp.shape(loc)[:-1], jnp.shape(scale_tril)[:-2]
        )
        (self.df,) = promote_shapes(df, shape=batch_shape)
        (self.loc,) = promote_shapes(loc, shape=batch_shape + loc.shape[-1:])
        (self.scale_tril,) = promote_shapes(
            scale_tril, shape=batch_shape + scale_tril.shape[-2:]
        )
        event_shape = jnp.shape(scale_tril)[-1:]
        super().__init__(
            batch_shape=batch_shape,
            event_shape=event_shape,
            validate_args=validate_args,
        )

    def sample(self, key, sample_shape=()):
        key_normal, key_chi2 = random.split(key)
        std_normal = random.normal(
            key_normal, shape=sample_shape + self.batch_shape + self.event_shape
        )
        z = random.chisquare(key_chi2, self.df, shape=sample_shape + self.batch_shape)
        y = std_normal * jnp.expand_dims(jnp.sqrt(self.df / z), -1)
        return self.loc + jnp.squeeze(
            jnp.matmul(self.scale_tril, y[..., jnp.newaxis]), axis=-1
        )

    @validate_sample
    def log_prob(self, value):
        n = self.scale_tril.shape[-1]
        M = _batch_mahalanobis(self.scale_tril, value - self.loc)
        half_log_det = jnp.log(
            jnp.diagonal(self.scale_tril, axis1=-2, axis2=-1)
        ).sum(-1)
        return (
            gammaln(0.5 * (self.df + n))
            - gammaln(0.5 * self.df)
            - 0.5 * n * (jnp.log(self.df) + jnp.log(jnp.pi))
            - half_log_det
            - 0.5 * (self.df + n) * jnp.log1p(M / self.df)
        )

    @property
    def mean(self):
        return jnp.broadcast_to(
            jnp.where(jnp.expand_dims(self.df, -1) <= 1, jnp.nan, self.loc),
            self.shape(),
        )

    @property
    def variance(self):
        cov_diag = jnp.sum(self.scale_tril**2, axis=-1)
        df = jnp.expand_dims(self.df, -1)
        var = cov_diag * df / (df - 2)
        var = jnp.where(df > 2, var, jnp.inf)
        var = jnp.where(df <= 1, jnp.nan, var)
        return jnp.broadcast_to(var, self.batch_shape + self.event_shape)


class LowRankMultivariateNormal(Distribution):
    """MVN with covariance = cov_factor @ cov_factor.T + diag(cov_diag).

    log_prob uses the Woodbury identity / matrix-determinant lemma so cost is
    O(D K^2) not O(D^3) — a matmul-dominant form that rides the MXU.
    """

    arg_constraints = {
        "loc": constraints.real_vector,
        "cov_factor": constraints.independent(constraints.real, 2),
        "cov_diag": constraints.independent(constraints.positive, 1),
    }
    support = constraints.real_vector
    reparametrized_params = ["loc", "cov_factor", "cov_diag"]

    def __init__(self, loc, cov_factor, cov_diag, *, validate_args=None):
        if jnp.ndim(loc) < 1:
            raise ValueError("`loc` must be at least one-dimensional.")
        event_shape = jnp.shape(loc)[-1:]
        if jnp.ndim(cov_factor) < 2 or jnp.shape(cov_factor)[-2:-1] != event_shape:
            raise ValueError("`cov_factor` must have shape (..., D, K)")
        if jnp.shape(cov_diag)[-1:] != event_shape:
            raise ValueError("`cov_diag` must have shape (..., D)")
        loc, cov_factor, cov_diag = promote_shapes(
            loc[..., None], cov_factor, cov_diag[..., None]
        )
        batch_shape = lax.broadcast_shapes(
            jnp.shape(loc), jnp.shape(cov_factor), jnp.shape(cov_diag)
        )[:-2]
        self.loc = loc[..., 0]
        self.cov_factor = cov_factor
        self.cov_diag = cov_diag[..., 0]
        super().__init__(
            batch_shape=batch_shape,
            event_shape=event_shape,
            validate_args=validate_args,
        )

    @property
    def mean(self):
        return jnp.broadcast_to(self.loc, self.shape())

    @lazy_property
    def variance(self):
        raw = jnp.square(self.cov_factor).sum(-1) + self.cov_diag
        return jnp.broadcast_to(raw, self.batch_shape + self.event_shape)

    @lazy_property
    def _capacitance_tril(self):
        # K x K: I + W^T D^{-1} W
        Wt_Dinv = jnp.swapaxes(self.cov_factor, -1, -2) / jnp.expand_dims(
            self.cov_diag, axis=-2
        )
        K = jnp.matmul(Wt_Dinv, self.cov_factor)
        K = add_diag(K, jnp.ones(K.shape[-1], dtype=K.dtype))
        return jnp.linalg.cholesky(K)

    @lazy_property
    def scale_tril(self):
        cov = jnp.matmul(
            self.cov_factor, jnp.swapaxes(self.cov_factor, -1, -2)
        )
        cov = add_diag(cov, self.cov_diag)
        return jnp.linalg.cholesky(cov)

    @lazy_property
    def covariance_matrix(self):
        cov = jnp.matmul(self.cov_factor, jnp.swapaxes(self.cov_factor, -1, -2))
        return add_diag(cov, self.cov_diag)

    @lazy_property
    def precision_matrix(self):
        # Woodbury: D^-1 - D^-1 W (I + W^T D^-1 W)^-1 W^T D^-1
        Wt_Dinv = jnp.swapaxes(self.cov_factor, -1, -2) / jnp.expand_dims(
            self.cov_diag, axis=-2
        )
        A = solve_triangular(self._capacitance_tril, Wt_Dinv, lower=True)
        inverse_cov_diag = jnp.reciprocal(self.cov_diag)
        diag_embed = inverse_cov_diag[..., None] * jnp.identity(
            self.loc.shape[-1], dtype=inverse_cov_diag.dtype
        )
        return diag_embed - jnp.matmul(jnp.swapaxes(A, -1, -2), A)

    def sample(self, key, sample_shape=()):
        key_W, key_D = random.split(key)
        batch_shape = sample_shape + self.batch_shape
        W_shape = batch_shape + self.cov_factor.shape[-1:]
        eps_W = random.normal(key_W, W_shape)
        eps_D = random.normal(key_D, batch_shape + self.event_shape)
        return (
            self.loc
            + jnp.squeeze(jnp.matmul(self.cov_factor, eps_W[..., None]), axis=-1)
            + jnp.sqrt(self.cov_diag) * eps_D
        )

    @validate_sample
    def log_prob(self, value):
        diff = value - self.loc
        # Mahalanobis via Woodbury
        Wt_Dinv = jnp.swapaxes(self.cov_factor, -1, -2) / jnp.expand_dims(
            self.cov_diag, axis=-2
        )
        Wt_Dinv_diff = jnp.squeeze(jnp.matmul(Wt_Dinv, diff[..., None]), -1)
        # solve_triangular does not broadcast batch dims: align the factor
        # with the (possibly sample-batched) right-hand side
        chol = jnp.broadcast_to(
            self._capacitance_tril,
            Wt_Dinv_diff.shape[:-1] + self._capacitance_tril.shape[-2:],
        )
        mahalanobis_tmp = solve_triangular(
            chol, Wt_Dinv_diff[..., None], lower=True
        )[..., 0]
        mahalanobis = (diff**2 / self.cov_diag).sum(-1) - (mahalanobis_tmp**2).sum(
            -1
        )
        # determinant lemma
        log_det = (
            2
            * jnp.log(
                jnp.diagonal(self._capacitance_tril, axis1=-2, axis2=-1)
            ).sum(-1)
            + jnp.log(self.cov_diag).sum(-1)
        )
        return -0.5 * (
            self.loc.shape[-1] * jnp.log(2 * jnp.pi) + log_det + mahalanobis
        )

    def entropy(self):
        log_det = (
            2
            * jnp.log(
                jnp.diagonal(self._capacitance_tril, axis1=-2, axis2=-1)
            ).sum(-1)
            + jnp.log(self.cov_diag).sum(-1)
        )
        H = 0.5 * (self.loc.shape[-1] * (1.0 + jnp.log(2 * jnp.pi)) + log_det)
        return jnp.broadcast_to(H, self.batch_shape)


class GaussianRandomWalk(Distribution):
    """A length-T Gaussian random walk as one event — the canonical long-
    latent time-series prior (stochastic volatility).  log_prob is the sum of
    increment normals: O(T), fully vectorized, no scan."""

    arg_constraints = {"scale": constraints.positive}
    support = constraints.real_vector
    reparametrized_params = ["scale"]
    pytree_aux_fields = ("num_steps",)

    def __init__(self, scale=1.0, num_steps=1, *, validate_args=None):
        assert isinstance(num_steps, int) and num_steps > 0, (
            "`num_steps` argument should be a positive integer."
        )
        self.scale = scale
        self.num_steps = num_steps
        batch_shape, event_shape = jnp.shape(scale), (num_steps,)
        super().__init__(batch_shape, event_shape, validate_args=validate_args)

    def sample(self, key, sample_shape=()):
        shape = sample_shape + self.batch_shape + self.event_shape
        walks = random.normal(key, shape=shape)
        return jnp.cumsum(walks, axis=-1) * jnp.expand_dims(self.scale, axis=-1)

    @validate_sample
    def log_prob(self, value):
        init_prob = Normal(0.0, self.scale).log_prob(value[..., 0])
        scale = jnp.expand_dims(self.scale, -1)
        step_probs = Normal(value[..., :-1], scale).log_prob(value[..., 1:])
        return init_prob + jnp.sum(step_probs, axis=-1)

    @property
    def mean(self):
        return jnp.zeros(self.batch_shape + self.event_shape)

    @property
    def variance(self):
        return jnp.broadcast_to(
            jnp.expand_dims(self.scale, -1) ** 2 * jnp.arange(1, self.num_steps + 1),
            self.batch_shape + self.event_shape,
        )


class LKJCholesky(Distribution):
    """LKJ prior over Cholesky factors of correlation matrices.

    Sampling uses the onion method (fully batched); density matches the
    reference (numpyro/distributions/continuous.py:1090).
    """

    arg_constraints = {"concentration": constraints.positive}
    support = constraints.corr_cholesky
    reparametrized_params = ["concentration"]
    pytree_data_fields = (
        "concentration",
        "_beta_concentration0",
        "_beta_concentration1",
    )
    pytree_aux_fields = ("dimension", "sample_method")

    def __init__(
        self, dimension=2, concentration=1.0, sample_method="onion", *, validate_args=None
    ):
        if dimension < 2:
            raise ValueError("Dimension must be greater than or equal to 2.")
        self.dimension = dimension
        self.concentration = concentration
        batch_shape = jnp.shape(concentration)
        event_shape = (dimension, dimension)

        # normalization constant (Lewandowski, Kurowicka & Joe 2009)
        Dm1 = self.dimension - 1
        marginal_concentration = concentration + 0.5 * (self.dimension - 2)
        offset = 0.5 * jnp.arange(Dm1)
        if sample_method == "onion":
            self._beta_concentration0 = (
                jnp.expand_dims(marginal_concentration, axis=-1) - offset
            )
            self._beta_concentration1 = offset + 0.5
            self.sample_method = "onion"
        elif sample_method == "cvine":
            offset_tril = matrix_to_tril_vec(
                jnp.broadcast_to(offset, (Dm1, Dm1)), diagonal=0
            )
            beta_concentration = (
                jnp.expand_dims(marginal_concentration, axis=-1) - offset_tril
            )
            self._beta_concentration0 = beta_concentration
            self._beta_concentration1 = beta_concentration
            self.sample_method = "cvine"
        else:
            raise ValueError("`method` should be one of 'cvine' or 'onion'.")
        super().__init__(batch_shape, event_shape, validate_args=validate_args)

    def _onion(self, key, size):
        key_beta, key_normal = random.split(key)
        # beta draws give the squared norm of each new row's off-diag part
        beta_sample = random.beta(
            key_beta,
            self._beta_concentration1,
            self._beta_concentration0,
            shape=size + self._beta_concentration0.shape,
        )
        # sample directions uniformly on spheres via normalized normals
        normal_sample = random.normal(
            key_normal,
            shape=size + (self.dimension * (self.dimension - 1) // 2,),
        )
        normal_sample = vec_to_tril_matrix(normal_sample, diagonal=0)
        u_hypersphere = normal_sample / jnp.linalg.norm(
            normal_sample, axis=-1, keepdims=True
        )
        # replace nan in the first row (norm of empty part)
        u_hypersphere = jnp.nan_to_num(u_hypersphere)
        w = jnp.expand_dims(jnp.sqrt(beta_sample), axis=-1) * u_hypersphere

        # pad to D x D and set diagonal
        pad_width = [(0, 0)] * (w.ndim - 2) + [(1, 0), (0, 1)]
        w = jnp.pad(w, pad_width)
        diag = jnp.sqrt(jnp.clip(1 - jnp.sum(w**2, axis=-1), 0.0))
        cholesky = w + jnp.expand_dims(diag, axis=-1) * jnp.identity(self.dimension)
        return cholesky

    def _cvine(self, key):  # pragma: no cover - onion is the default
        raise NotImplementedError

    def sample(self, key, sample_shape=()):
        return self._onion(key, sample_shape + self.batch_shape)

    @validate_sample
    def log_prob(self, value):
        diag = jnp.diagonal(value, axis1=-2, axis2=-1)[..., 1:]
        # unnormalized: sum over rows i>=2 of (D - i + 2(eta - 1)) log L_ii
        row = jnp.arange(2, self.dimension + 1, dtype=diag.dtype)
        concentration = jnp.expand_dims(jnp.asarray(self.concentration), -1)
        order = self.dimension - row + 2 * (concentration - 1)
        unnormalized = (order * jnp.log(diag)).sum(-1)

        # normalization (reference formula, LKJ 2009 Thm 5)
        Dm1 = self.dimension - 1
        alpha = self.concentration + 0.5 * Dm1
        denominator = gammaln(alpha) * Dm1
        numerator = multigammaln(alpha - 0.5, Dm1)
        pi_constant = 0.5 * Dm1 * jnp.log(jnp.pi)
        normalize_term = pi_constant + numerator - denominator
        return unnormalized - normalize_term

    @property
    def mean(self):
        return jnp.broadcast_to(
            jnp.identity(self.dimension),
            self.batch_shape + (self.dimension, self.dimension),
        )


class LKJ(TransformedDistribution):
    """LKJ prior over full correlation matrices."""

    arg_constraints = {"concentration": constraints.positive}
    reparametrized_params = ["concentration"]
    support = constraints.corr_matrix
    pytree_aux_fields = ("dimension", "sample_method")

    def __init__(
        self, dimension=2, concentration=1.0, sample_method="onion", *, validate_args=None
    ):
        self.dimension = dimension
        self.concentration = concentration
        self.sample_method = sample_method
        base_dist = LKJCholesky(dimension, concentration, sample_method)
        from .transforms import CorrMatrixCholeskyTransform

        super().__init__(
            base_dist, CorrMatrixCholeskyTransform().inv, validate_args=validate_args
        )

    @property
    def mean(self):
        return jnp.broadcast_to(
            jnp.identity(self.dimension),
            self.batch_shape + (self.dimension, self.dimension),
        )


class Wishart(TransformedDistribution):
    arg_constraints = {
        "concentration": constraints.dependent(is_discrete=False),
        "scale_matrix": constraints.positive_definite,
        "rate_matrix": constraints.positive_definite,
        "scale_tril": constraints.lower_cholesky,
    }
    support = constraints.positive_definite
    reparametrized_params = ["scale_matrix", "rate_matrix", "scale_tril"]

    def __init__(
        self,
        concentration,
        scale_matrix=None,
        rate_matrix=None,
        scale_tril=None,
        *,
        validate_args=None,
    ):
        base_dist = WishartCholesky(
            concentration, scale_matrix, rate_matrix, scale_tril
        )
        from .transforms import CholeskyTransform

        super().__init__(
            base_dist, CholeskyTransform().inv, validate_args=validate_args
        )

    @property
    def concentration(self):
        return self.base_dist.concentration

    @property
    def scale_tril(self):
        return self.base_dist.scale_tril

    @property
    def mean(self):
        return self.concentration[..., None, None] * jnp.matmul(
            self.scale_tril, jnp.swapaxes(self.scale_tril, -2, -1)
        )


class WishartCholesky(Distribution):
    """Cholesky factor of a Wishart via the Bartlett decomposition."""

    arg_constraints = {
        "concentration": constraints.dependent(is_discrete=False),
        "scale_matrix": constraints.positive_definite,
        "rate_matrix": constraints.positive_definite,
        "scale_tril": constraints.lower_cholesky,
    }
    support = constraints.lower_cholesky
    reparametrized_params = ["scale_matrix", "rate_matrix", "scale_tril"]
    pytree_data_fields = ("concentration", "scale_tril")

    def __init__(
        self,
        concentration,
        scale_matrix=None,
        rate_matrix=None,
        scale_tril=None,
        *,
        validate_args=None,
    ):
        if scale_matrix is not None:
            scale_tril_ = jnp.linalg.cholesky(scale_matrix)
        elif rate_matrix is not None:
            from .util import cholesky_of_inverse

            scale_tril_ = cholesky_of_inverse(rate_matrix)
        elif scale_tril is not None:
            scale_tril_ = scale_tril
        else:
            raise ValueError(
                "One of scale_matrix, rate_matrix, scale_tril must be specified."
            )
        batch_shape = lax.broadcast_shapes(
            jnp.shape(concentration), jnp.shape(scale_tril_)[:-2]
        )
        event_shape = jnp.shape(scale_tril_)[-2:]
        (self.concentration,) = promote_shapes(concentration, shape=batch_shape)
        (self.scale_tril,) = promote_shapes(
            scale_tril_, shape=batch_shape + event_shape
        )
        super().__init__(batch_shape, event_shape, validate_args=validate_args)

    def sample(self, key, sample_shape=()):
        key_n, key_g = random.split(key)
        D = self.event_shape[-1]
        shape = sample_shape + self.batch_shape
        # Bartlett: A lower-triangular with N(0,1) below diag, sqrt(chi2) on diag
        normals = random.normal(key_n, shape + (D * (D - 1) // 2,))
        A = vec_to_tril_matrix(normals, diagonal=-1)
        chi2_df = jnp.expand_dims(jnp.asarray(self.concentration), -1) - jnp.arange(D)
        chi2 = random.chisquare(key_g, chi2_df, shape=shape + (D,))
        A = A + jnp.sqrt(chi2)[..., None] * jnp.identity(D)
        return jnp.matmul(self.scale_tril, A)

    @validate_sample
    def log_prob(self, value):
        D = self.event_shape[-1]
        df = self.concentration
        # transform to A = L_S^{-1} value ; Jacobian of L -> S handled by class usage
        # density of Wishart cholesky factor L:
        # log p(L) = (df - D - 1) sum log diag(L) ... use change of variables from
        # Wishart density p(W) with W = L L^T:
        # log p(L) = log p(W) + D log 2 + sum_{i} (D - i + 1) log L_ii
        W_logdet = 2 * jnp.log(jnp.diagonal(value, axis1=-2, axis2=-1)).sum(-1)
        S_half_logdet = jnp.log(
            jnp.diagonal(self.scale_tril, axis1=-2, axis2=-1)
        ).sum(-1)
        # trace(S^{-1} W) = || L_S^{-1} L ||_F^2
        Linv_L = solve_triangular(
            jnp.broadcast_to(self.scale_tril, value.shape), value, lower=True
        )
        trace_term = (Linv_L**2).sum((-2, -1))
        log_w = (
            0.5 * (df - D - 1) * W_logdet
            - 0.5 * trace_term
            - 0.5 * df * D * jnp.log(2.0)
            - df * S_half_logdet
            - multigammaln(0.5 * df, D)
        )
        i = jnp.arange(1, D + 1, dtype=jnp.result_type(float))
        jac = D * jnp.log(2.0) + (
            (D - i + 1) * jnp.log(jnp.diagonal(value, axis1=-2, axis2=-1))
        ).sum(-1)
        return log_w + jac

    @property
    def mean(self):
        raise NotImplementedError


# ---------------------------------------------------------------------------
# Additional continuous families (reference: numpyro/distributions/continuous.py
# — EulerMaruyama :327, GaussianStateSpace :558, Gompertz :818, MatrixNormal
# :1443, CAR :1698, RelaxedBernoulliLogits :2268, SoftLaplace :2287,
# BetaProportion :2535, AsymmetricLaplaceQuantile :2565, ZeroSumNormal :2627,
# Levy :2978, CirculantNormal :3076).  Implemented TPU-first: dense linear
# algebra, lax.scan for recurrences, FFT diagonalization for circulant
# covariance — no sparse host paths.
# ---------------------------------------------------------------------------


class SoftLaplace(Distribution):
    """Smooth log-convex density with Laplace-like tails (infinitely
    differentiable — well-suited to HMC)."""

    arg_constraints = {"loc": constraints.real, "scale": constraints.positive}
    support = constraints.real
    reparametrized_params = ["loc", "scale"]

    def __init__(self, loc, scale, *, validate_args=None):
        self.loc, self.scale = promote_shapes(loc, scale)
        batch_shape = lax.broadcast_shapes(jnp.shape(loc), jnp.shape(scale))
        super().__init__(batch_shape=batch_shape, validate_args=validate_args)

    @validate_sample
    def log_prob(self, value):
        z = (value - self.loc) / self.scale
        return jnp.log(2 / jnp.pi) - jnp.log(self.scale) - jnp.logaddexp(z, -z)

    def sample(self, key, sample_shape=()):
        dtype = jnp.result_type(float)
        minval = jnp.finfo(dtype).tiny
        u = random.uniform(key, shape=sample_shape + self.batch_shape, minval=minval)
        return self.icdf(u)

    def cdf(self, value):
        z = (value - self.loc) / self.scale
        return jnp.arctan(jnp.exp(z)) * (2 / jnp.pi)

    def icdf(self, value):
        return jnp.log(jnp.tan(value * (jnp.pi / 2))) * self.scale + self.loc

    @property
    def mean(self):
        return self.loc

    @property
    def variance(self):
        return (jnp.pi / 2 * self.scale) ** 2


class Gompertz(Distribution):
    """Gompertz distribution: CDF ``1 - exp(-con * expm1(rate * x))``."""

    arg_constraints = {
        "concentration": constraints.positive,
        "rate": constraints.positive,
    }
    support = constraints.positive
    reparametrized_params = ["concentration", "rate"]

    def __init__(self, concentration, rate=1.0, *, validate_args=None):
        self.concentration, self.rate = promote_shapes(concentration, rate)
        super().__init__(
            batch_shape=lax.broadcast_shapes(
                jnp.shape(concentration), jnp.shape(rate)
            ),
            validate_args=validate_args,
        )

    def sample(self, key, sample_shape=()):
        u = random.uniform(key, shape=sample_shape + self.batch_shape)
        return self.icdf(u)

    @validate_sample
    def log_prob(self, value):
        scaled = value * self.rate
        return (
            jnp.log(self.concentration)
            + jnp.log(self.rate)
            + scaled
            - self.concentration * jnp.expm1(scaled)
        )

    def cdf(self, value):
        return -jnp.expm1(-self.concentration * jnp.expm1(value * self.rate))

    def icdf(self, q):
        return jnp.log1p(-jnp.log1p(-q) / self.concentration) / self.rate

    @property
    def mean(self):
        from jax.scipy.special import expi

        return -jnp.exp(self.concentration) * expi(-self.concentration) / self.rate


class Levy(Distribution):
    """Lévy distribution (alpha-stable with alpha=1/2, beta=1)."""

    arg_constraints = {"loc": constraints.positive, "scale": constraints.positive}

    def __init__(self, loc, scale, *, validate_args=None):
        self.loc, self.scale = promote_shapes(loc, scale)
        batch_shape = lax.broadcast_shapes(jnp.shape(loc), jnp.shape(scale))
        self._support = constraints.greater_than(loc)
        super().__init__(batch_shape, validate_args=validate_args)

    @constraints.dependent_property(is_discrete=False)
    def support(self):
        return self._support

    @validate_sample
    def log_prob(self, value):
        shifted = value - self.loc
        return -0.5 * (
            jnp.log(2.0 * jnp.pi) - jnp.log(self.scale) + self.scale / shifted
        ) - 1.5 * jnp.log(shifted)

    def sample(self, key, sample_shape=()):
        u = random.uniform(key, shape=sample_shape + self.batch_shape)
        return self.icdf(u)

    def icdf(self, q):
        return self.loc + self.scale * jnp.power(ndtri(1 - 0.5 * q), -2)

    def cdf(self, value):
        inv_standardized = self.scale / (value - self.loc)
        return 2.0 - 2.0 * ndtr(jnp.sqrt(inv_standardized))

    @property
    def mean(self):
        return jnp.broadcast_to(jnp.inf, self.batch_shape)

    @property
    def variance(self):
        return jnp.broadcast_to(jnp.inf, self.batch_shape)


class BetaProportion(Beta):
    """Beta reparameterized by variate mean and precision (Ferrari &
    Cribari-Neto 2004)."""

    arg_constraints = {
        "mean": constraints.open_interval(0.0, 1.0),
        "concentration": constraints.positive,
    }
    reparametrized_params = ["mean", "concentration"]
    support = constraints.unit_interval
    pytree_data_fields = ("concentration",)

    def __init__(self, mean, concentration, *, validate_args=None):
        self.concentration = jnp.broadcast_to(
            concentration, lax.broadcast_shapes(jnp.shape(concentration))
        )
        super().__init__(
            mean * concentration,
            (1.0 - mean) * concentration,
            validate_args=validate_args,
        )


class AsymmetricLaplaceQuantile(Distribution):
    """AsymmetricLaplace parameterized by the quantile (Bayesian quantile
    regression parameterization)."""

    arg_constraints = {
        "loc": constraints.real,
        "scale": constraints.positive,
        "quantile": constraints.open_interval(0.0, 1.0),
    }
    reparametrized_params = ["loc", "scale", "quantile"]
    support = constraints.real
    pytree_data_fields = ("loc", "scale", "quantile", "_ald")

    def __init__(self, loc=0.0, scale=1.0, quantile=0.5, *, validate_args=None):
        batch_shape = lax.broadcast_shapes(
            jnp.shape(loc), jnp.shape(scale), jnp.shape(quantile)
        )
        self.loc, self.scale, self.quantile = promote_shapes(
            loc, scale, quantile, shape=batch_shape
        )
        super().__init__(batch_shape=batch_shape, validate_args=validate_args)
        asymmetry = (1 / ((1 / quantile) - 1)) ** 0.5
        scale_classic = scale * asymmetry / quantile
        self._ald = AsymmetricLaplace(
            loc=loc, scale=scale_classic, asymmetry=asymmetry
        )

    def log_prob(self, value):
        if self._validate_args:
            self._validate_sample(value)
        return self._ald.log_prob(value)

    def sample(self, key, sample_shape=()):
        return self._ald.sample(key, sample_shape=sample_shape)

    @property
    def mean(self):
        return self._ald.mean

    @property
    def variance(self):
        return self._ald.variance

    def cdf(self, value):
        return self._ald.cdf(value)

    def icdf(self, value):
        return self._ald.icdf(value)


class RelaxedBernoulliLogits(TransformedDistribution):
    """Continuous relaxation of Bernoulli (Concrete distribution)."""

    arg_constraints = {
        "temperature": constraints.positive,
        "logits": constraints.real,
    }
    support = constraints.unit_interval

    def __init__(self, temperature, logits, *, validate_args=None):
        self.temperature, self.logits = promote_shapes(temperature, logits)
        base_dist = Logistic(logits / temperature, 1 / temperature)
        from .transforms import SigmoidTransform

        super().__init__(
            base_dist, [SigmoidTransform()], validate_args=validate_args
        )


def RelaxedBernoulli(temperature, probs=None, logits=None, *, validate_args=None):
    from .util import assert_one_of, probs_to_logits

    assert_one_of(probs=probs, logits=logits)
    if probs is not None:
        logits = probs_to_logits(probs, is_binary=True)
    return RelaxedBernoulliLogits(temperature, logits, validate_args=validate_args)


class ZeroSumNormal(TransformedDistribution):
    """Normal with one or more event axes constrained to sum to zero
    (PyMC-style, via an orthonormal Householder basis — see ZeroSumTransform)."""

    arg_constraints = {"scale": constraints.positive}
    reparametrized_params = ["scale"]

    def __init__(self, scale, event_shape, *, validate_args=None):
        from .transforms import ZeroSumTransform

        event_ndim = len(event_shape)
        transformed_shape = tuple(size - 1 for size in event_shape)
        self.scale = scale
        super().__init__(
            Normal(0, scale).expand(transformed_shape).to_event(event_ndim),
            ZeroSumTransform(event_ndim),
            validate_args=validate_args,
        )

    @constraints.dependent_property(is_discrete=False)
    def support(self):
        return constraints.zero_sum(len(self.event_shape))

    @property
    def mean(self):
        return jnp.zeros(self.batch_shape + self.event_shape)

    @property
    def variance(self):
        event_ndim = len(self.event_shape)
        theoretical_var = jnp.square(self.scale)
        for axis in range(-event_ndim, 0):
            theoretical_var *= 1 - 1 / self.event_shape[axis]
        return jnp.broadcast_to(
            theoretical_var, self.batch_shape + self.event_shape
        )


class MatrixNormal(Distribution):
    """Matrix-variate normal with row/column scale Cholesky factors:
    vec(X) ~ MVN(vec(loc), kron(V, U)) with U = R Rᵀ, V = C Cᵀ."""

    arg_constraints = {
        "loc": constraints.real_vector,
        "scale_tril_row": constraints.lower_cholesky,
        "scale_tril_column": constraints.lower_cholesky,
    }
    support = constraints.real_matrix
    reparametrized_params = ["loc", "scale_tril_row", "scale_tril_column"]

    def __init__(self, loc, scale_tril_row, scale_tril_column, validate_args=None):
        event_shape = loc.shape[-2:]
        batch_shape = lax.broadcast_shapes(
            jnp.shape(loc)[:-2],
            jnp.shape(scale_tril_row)[:-2],
            jnp.shape(scale_tril_column)[:-2],
        )
        (self.loc,) = promote_shapes(loc, shape=batch_shape + loc.shape[-2:])
        (self.scale_tril_row,) = promote_shapes(
            scale_tril_row, shape=batch_shape + scale_tril_row.shape[-2:]
        )
        (self.scale_tril_column,) = promote_shapes(
            scale_tril_column, shape=batch_shape + scale_tril_column.shape[-2:]
        )
        super().__init__(
            batch_shape=batch_shape,
            event_shape=event_shape,
            validate_args=validate_args,
        )

    @property
    def mean(self):
        return jnp.broadcast_to(self.loc, self.shape())

    def sample(self, key, sample_shape=()):
        eps = random.normal(
            key, shape=sample_shape + self.batch_shape + self.event_shape
        )
        return self.loc + self.scale_tril_row @ eps @ jnp.swapaxes(
            self.scale_tril_column, -2, -1
        )

    @validate_sample
    def log_prob(self, values):
        n, p = self.event_shape
        row_log_det = jnp.log(
            jnp.diagonal(self.scale_tril_row, axis1=-2, axis2=-1)
        ).sum(-1)
        col_log_det = jnp.log(
            jnp.diagonal(self.scale_tril_column, axis1=-2, axis2=-1)
        ).sum(-1)
        log_det_term = (
            p * row_log_det + n * col_log_det + 0.5 * n * p * jnp.log(2 * jnp.pi)
        )
        diff = values - self.loc

        def _bsolve(A, B):
            batch = lax.broadcast_shapes(A.shape[:-2], B.shape[:-2])
            A = jnp.broadcast_to(A, batch + A.shape[-2:])
            B = jnp.broadcast_to(B, batch + B.shape[-2:])
            return solve_triangular(A, B, lower=True)

        diff_row_solve = _bsolve(self.scale_tril_row, diff)
        diff_col_solve = _bsolve(
            self.scale_tril_column, jnp.swapaxes(diff_row_solve, -2, -1)
        )
        trace_term = jnp.square(diff_col_solve).sum((-2, -1))
        return -0.5 * trace_term - log_det_term


class CAR(Distribution):
    """Conditional autoregressive distribution — MVN whose precision is
    structured by a site-adjacency matrix (dense TPU path; precision-based
    log_prob needs no Cholesky of the full covariance)."""

    arg_constraints = {
        "loc": constraints.real_vector,
        "correlation": constraints.open_interval(-1, 1),
        "conditional_precision": constraints.positive,
        "adj_matrix": constraints.dependent(is_discrete=False, event_dim=2),
    }
    support = constraints.real_vector
    reparametrized_params = [
        "loc",
        "correlation",
        "conditional_precision",
        "adj_matrix",
    ]
    pytree_aux_fields = ("is_sparse",)
    pytree_data_fields = ("loc", "correlation", "conditional_precision", "adj_matrix")

    def __init__(
        self,
        loc,
        correlation,
        conditional_precision,
        adj_matrix,
        *,
        is_sparse=False,
        validate_args=None,
    ):
        if is_sparse:
            raise NotImplementedError(
                "numpyro_tpu CAR uses the dense adjacency path: sparse "
                "gather/scatter does not map onto the TPU MXU; pass a dense "
                "(batched) adjacency matrix."
            )
        if jnp.ndim(loc) == 0:
            (loc,) = promote_shapes(loc, shape=(1,))
        self.is_sparse = False
        batch_shape = lax.broadcast_shapes(
            jnp.shape(loc)[:-1],
            jnp.shape(correlation),
            jnp.shape(conditional_precision),
            jnp.shape(adj_matrix)[:-2],
        )
        (self.adj_matrix,) = promote_shapes(
            adj_matrix, shape=batch_shape + adj_matrix.shape[-2:]
        )
        event_shape = jnp.shape(self.adj_matrix)[-1:]
        (self.loc,) = promote_shapes(loc, shape=batch_shape + event_shape)
        self.correlation, self.conditional_precision = promote_shapes(
            correlation, conditional_precision, shape=batch_shape
        )
        super().__init__(
            batch_shape=batch_shape,
            event_shape=event_shape,
            validate_args=validate_args,
        )

    def sample(self, key, sample_shape=()):
        mvn = MultivariateNormal(self.mean, precision_matrix=self.precision_matrix)
        return mvn.sample(key, sample_shape=sample_shape)

    @validate_sample
    def log_prob(self, value):
        phi = value - self.loc
        adj_matrix = self.adj_matrix
        D = adj_matrix.sum(axis=-1)
        D_rsqrt = D ** (-0.5)
        adj_scaled = adj_matrix * (D_rsqrt[..., None, :] * D_rsqrt[..., None])
        lam = jnp.linalg.eigvalsh(adj_scaled)
        n = D.shape[-1]
        logprec = n * jnp.log(self.conditional_precision)
        logdet = jnp.log1p(-jnp.expand_dims(self.correlation, -1) * lam).sum(-1)
        logdet = logdet + jnp.log(D).sum(-1)
        logquad = self.conditional_precision * jnp.sum(
            phi
            * (
                D * phi
                - jnp.expand_dims(self.correlation, -1)
                * jnp.einsum("...ij,...j->...i", adj_matrix, phi)
            ),
            -1,
        )
        return 0.5 * (-n * jnp.log(2 * jnp.pi) + logprec + logdet - logquad)

    @property
    def mean(self):
        return jnp.broadcast_to(self.loc, self.shape())

    @lazy_property
    def precision_matrix(self):
        D = self.adj_matrix.sum(axis=-1)
        conditional_precision = jnp.expand_dims(self.conditional_precision, (-2, -1))
        correlation = jnp.expand_dims(self.correlation, (-2, -1))
        eye = jnp.broadcast_to(
            jnp.eye(self.adj_matrix.shape[-1]), self.adj_matrix.shape
        )
        return conditional_precision * (
            D[..., None] * eye - correlation * self.adj_matrix
        )

    @staticmethod
    def infer_shapes(loc, correlation, conditional_precision, adj_matrix):
        event_shape = adj_matrix[-1:]
        batch_shape = lax.broadcast_shapes(
            loc[:-1], correlation, conditional_precision, adj_matrix[:-2]
        )
        return batch_shape, event_shape


class EulerMaruyama(Distribution):
    """Euler–Maruyama discretization of an SDE: the whole trajectory is one
    event; log_prob is a product of conditional Gaussian transition terms
    (fully vectorized — no sequential scan needed for density evaluation)."""

    arg_constraints = {"t": constraints.ordered_vector}
    pytree_data_fields = ("t", "init_dist")
    pytree_aux_fields = ("sde_fn",)

    def __init__(self, t, sde_fn, init_dist, *, validate_args=None):
        self.t = t
        self.sde_fn = sde_fn
        self.init_dist = init_dist
        if not isinstance(init_dist, Distribution):
            raise TypeError("init_dist must be a Distribution instance")
        batch_shape_t = jnp.shape(t)[:-1]
        batch_shape = lax.broadcast_shapes(batch_shape_t, init_dist.batch_shape)
        event_shape = (jnp.shape(t)[-1],) + init_dist.event_shape
        super().__init__(batch_shape, event_shape, validate_args=validate_args)

    @constraints.dependent_property(is_discrete=False)
    def support(self):
        return constraints.independent(constraints.real, self.event_dim)

    def sample(self, key, sample_shape=()):
        batch_shape = sample_shape + self.batch_shape

        def step(y_curr, xs):
            noise_curr, t_curr, dt_curr = xs
            f, g = self.sde_fn(y_curr, t_curr)
            y_next = y_curr + dt_curr * f + jnp.sqrt(dt_curr) * g * noise_curr
            return y_next, y_next

        rng_noise, rng_init = random.split(key)
        noises = random.normal(
            rng_noise,
            shape=batch_shape + (self.event_shape[0] - 1,) + self.event_shape[1:],
        )
        inits = self.init_dist.expand(batch_shape).sample(rng_init)

        def scan_fn(init, noise, tm1, dt):
            return lax.scan(step, init, (noise, tm1, dt))

        batch_dim = len(batch_shape)
        if batch_dim:
            inits_flat = inits.reshape((-1,) + inits.shape[batch_dim:])
            noises_flat = noises.reshape((-1,) + noises.shape[batch_dim:])
            t = jnp.broadcast_to(self.t, batch_shape + (self.event_shape[0],))
            t = t.reshape((-1,) + t.shape[batch_dim:])
            dt = jnp.diff(t, axis=-1)
            _, sde_out = jax.vmap(scan_fn)(inits_flat, noises_flat, t[..., :-1], dt)
            sde_out = jnp.concatenate([inits_flat[:, None], sde_out], axis=1)
            sde_out = jnp.reshape(sde_out, batch_shape + self.event_shape)
        else:
            dt = jnp.diff(self.t, axis=-1)
            _, sde_out = scan_fn(inits, noises, self.t[:-1], dt)
            sde_out = jnp.concatenate([inits[None], sde_out], axis=0)
        return sde_out

    @validate_sample
    def log_prob(self, value):
        sample_shape = lax.broadcast_shapes(
            value.shape[: value.ndim - self.event_dim], self.batch_shape
        )
        value = jnp.broadcast_to(value, sample_shape + self.event_shape)

        if sample_shape:
            flat = value.reshape((-1,) + self.event_shape)
            xtm1, xt = flat[:, :-1], flat[:, 1:]
            value0 = flat[:, 0]
            t = jnp.broadcast_to(self.t, sample_shape + (self.event_shape[0],))
            t = t.reshape((-1, self.event_shape[0]))
            f, g = jax.vmap(jax.vmap(self.sde_fn))(xtm1, t[:, :-1])
            f = f.reshape(sample_shape + f.shape[1:])
            g = g.reshape(sample_shape + g.shape[1:])
            xtm1 = xtm1.reshape(sample_shape + xtm1.shape[1:])
            xt = xt.reshape(sample_shape + xt.shape[1:])
            value0 = value0.reshape(sample_shape + value0.shape[1:])
        else:
            xtm1, xt = value[:-1], value[1:]
            value0 = value[0]
            f, g = jax.vmap(self.sde_fn)(xtm1, self.t[:-1])

        batch_dim = len(sample_shape)
        f = f.reshape(
            f.shape[: batch_dim + 1]
            + (1,) * (xt.ndim - f.ndim)
            + f.shape[batch_dim + 1 :]
        )
        g = g.reshape(
            g.shape[: batch_dim + 1]
            + (1,) * (xt.ndim - g.ndim)
            + g.shape[batch_dim + 1 :]
        )

        dt = jnp.diff(self.t, axis=-1)
        dt = dt.reshape(dt.shape + (1,) * (self.event_dim - 1))
        mu = xtm1 + dt * f
        sigma = jnp.sqrt(dt) * g
        sde_log_prob = Normal(mu, sigma).to_event(self.event_dim).log_prob(xt)
        init_log_prob = self.init_dist.log_prob(value0)
        return sde_log_prob + init_log_prob


class GaussianStateSpace(Distribution):
    """Linear-Gaussian state space model z_t = A z_{t-1} + eps_t, treated as
    one event of shape (num_steps, dim).  Because the map eps -> z is
    unit-Jacobian (lower-unitriangular block structure), log_prob is the
    innovations' MVN density — evaluated fully in parallel on TPU, no scan."""

    arg_constraints = {
        "covariance_matrix": constraints.positive_definite,
        "precision_matrix": constraints.positive_definite,
        "scale_tril": constraints.lower_cholesky,
        "transition_matrix": constraints.real_matrix,
    }
    support = constraints.real_matrix
    pytree_aux_fields = ("num_steps",)
    pytree_data_fields = ("transition_matrix", "scale_tril")

    def __init__(
        self,
        num_steps,
        transition_matrix,
        covariance_matrix=None,
        precision_matrix=None,
        scale_tril=None,
        *,
        validate_args=None,
    ):
        assert isinstance(num_steps, int) and num_steps > 0
        assert transition_matrix.ndim == 2
        self.num_steps = num_steps
        self.transition_matrix = transition_matrix
        # normalize innovation-noise parameterization to scale_tril
        inner = MultivariateNormal(
            covariance_matrix=covariance_matrix,
            precision_matrix=precision_matrix,
            scale_tril=scale_tril,
        )
        self.scale_tril = inner.scale_tril
        batch_shape = inner.batch_shape
        dim = transition_matrix.shape[-1]
        super().__init__(
            batch_shape, (num_steps, dim), validate_args=validate_args
        )

    def _innovations(self, value):
        z_prev = value[..., :-1, :]
        propagated = jnp.einsum("ij,...tj->...ti", self.transition_matrix, z_prev)
        return jnp.concatenate(
            [value[..., :1, :], value[..., 1:, :] - propagated], axis=-2
        )

    def sample(self, key, sample_shape=()):
        shape = sample_shape + self.batch_shape + self.event_shape
        eps = random.normal(key, shape)
        eps = jnp.einsum("...ij,...tj->...ti", self.scale_tril[..., None, :, :].squeeze(-3) if self.scale_tril.ndim > 2 else self.scale_tril, eps)

        def step(z, e):
            z_next = self.transition_matrix @ z[..., None]
            z_next = z_next[..., 0] + e
            return z_next, z_next

        # scan over time (the only sequential axis)
        eps_t_first = jnp.moveaxis(eps, -2, 0)
        z0 = eps_t_first[0]
        _, z_rest = lax.scan(step, z0, eps_t_first[1:])
        z = jnp.concatenate([z0[None], z_rest], axis=0)
        return jnp.moveaxis(z, 0, -2)

    @validate_sample
    def log_prob(self, value):
        eps = self._innovations(value)
        mvn = MultivariateNormal(
            jnp.zeros(self.event_shape[-1]), scale_tril=self.scale_tril
        )
        return mvn.log_prob(eps).sum(-1)

    @property
    def mean(self):
        return jnp.zeros(self.batch_shape + self.event_shape)

    @lazy_property
    def covariance_matrix(self):
        return self.scale_tril @ jnp.swapaxes(self.scale_tril, -2, -1)

    @property
    def variance(self):
        def step(carry, _):
            return self.transition_matrix @ carry, carry

        _, scale_tril = lax.scan(
            step, self.scale_tril, jnp.arange(self.num_steps)
        )
        return (
            jnp.diagonal(
                scale_tril @ jnp.swapaxes(scale_tril, -2, -1), axis1=-1, axis2=-2
            )
            .cumsum(axis=0)
            .swapaxes(0, -2)
        )


class CirculantNormal(Distribution):
    """Multivariate normal with positive-definite circulant covariance,
    diagonalized by the discrete Fourier transform: sampling and log_prob run
    in O(n log n) via rFFT — the natural TPU-stationary-covariance layout
    (reference: numpyro/distributions/continuous.py:3076, Wood & Chan 1994)."""

    arg_constraints = {
        "loc": constraints.real_vector,
        "covariance_row": constraints.positive_definite_circulant_vector,
        "covariance_rfft": constraints.independent(constraints.positive, 1),
    }
    support = constraints.real_vector
    pytree_data_fields = ("loc", "covariance_rfft")

    def __init__(self, loc, covariance_row=None, covariance_rfft=None, *, validate_args=None):
        assert jnp.ndim(loc) > 0
        n = jnp.shape(loc)[-1]
        from .util import assert_one_of

        assert_one_of(
            covariance_row=covariance_row, covariance_rfft=covariance_rfft
        )
        if covariance_rfft is None:
            assert covariance_row.shape[-1] == n
            loc, covariance_row = promote_shapes(loc, covariance_row)
            covariance_rfft = jnp.fft.rfft(covariance_row).real
            self.covariance_row = covariance_row
        else:
            batch_shape = lax.broadcast_shapes(
                jnp.shape(loc)[:-1], jnp.shape(covariance_rfft)[:-1]
            )
            loc = jnp.broadcast_to(loc, batch_shape + (n,))
            covariance_rfft = jnp.broadcast_to(
                covariance_rfft, batch_shape + (n // 2 + 1,)
            )
        self.loc = loc
        self.covariance_rfft = covariance_rfft
        batch_shape = lax.broadcast_shapes(
            jnp.shape(loc)[:-1], jnp.shape(covariance_rfft)[:-1]
        )
        super().__init__(batch_shape, (n,), validate_args=validate_args)

    def _eigenvals(self):
        # eigenvalues of the circulant covariance = n-point rFFT of first row
        (n,) = self.event_shape
        return jnp.maximum(self.covariance_rfft, 0.0), n

    def sample(self, key, sample_shape=()):
        (n,) = self.event_shape
        shape = sample_shape + self.batch_shape + (n,)
        eps = random.normal(key, shape)
        # color white noise in the Fourier domain: C^{1/2} = F* diag(sqrt(λ)) F / sqrt(n)
        eps_rfft = jnp.fft.rfft(eps)
        lam, _ = self._eigenvals()
        colored = jnp.fft.irfft(eps_rfft * jnp.sqrt(lam), n=n)
        return self.loc + colored

    @validate_sample
    def log_prob(self, value):
        (n,) = self.event_shape
        diff = value - self.loc
        diff_rfft = jnp.fft.rfft(diff)
        lam, _ = self._eigenvals()
        lam = jnp.maximum(lam, jnp.finfo(lam.dtype).tiny)
        # real-FFT packing: bins 1..ceil(n/2)-1 appear twice in the full
        # spectrum; DC (and Nyquist for even n) appear once.
        weights = jnp.full(lam.shape[-1:], 2.0).at[0].set(1.0)
        if n % 2 == 0:
            weights = weights.at[-1].set(1.0)
        power = jnp.square(jnp.abs(diff_rfft))
        quad = (weights * power / lam).sum(-1) / n
        half_log_det = 0.5 * (weights * jnp.log(lam)).sum(-1)
        return -0.5 * (n * jnp.log(2 * jnp.pi) + quad) - half_log_det

    @lazy_property
    def covariance_row(self):
        return jnp.fft.irfft(self.covariance_rfft, n=self.event_shape[-1])

    @lazy_property
    def covariance_matrix(self):
        (n,) = self.event_shape
        row = self.covariance_row
        idx = (jnp.arange(n)[:, None] - jnp.arange(n)[None, :]) % n
        return row[..., idx]

    @property
    def mean(self):
        return jnp.broadcast_to(self.loc, self.shape())

    @lazy_property
    def variance(self):
        return jnp.broadcast_to(self.covariance_row[..., :1], self.shape())

    @staticmethod
    def infer_shapes(loc=(), covariance_row=None, covariance_rfft=None):
        from .util import assert_one_of

        assert_one_of(
            covariance_row=covariance_row, covariance_rfft=covariance_rfft
        )
        for cov in [covariance_rfft, covariance_row]:
            if cov is not None:
                return jnp.broadcast_shapes(loc[:-1], cov[:-1]), loc[-1:]

    def entropy(self):
        lam, n = self._eigenvals()
        lam = jnp.maximum(lam, jnp.finfo(lam.dtype).tiny)
        weights = jnp.full(lam.shape[-1:], 2.0).at[0].set(1.0)
        if n % 2 == 0:
            weights = weights.at[-1].set(1.0)
        half_log_det = 0.5 * (weights * jnp.log(lam)).sum(-1)
        return 0.5 * n * (1.0 + jnp.log(2 * jnp.pi)) + half_log_det
