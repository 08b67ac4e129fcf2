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
        shape = lax.broadcast_shapes(jnp.shape(value), self.batch_shape)
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
        mahalanobis_tmp = solve_triangular(
            self._capacitance_tril, Wt_Dinv_diff[..., None], lower=True
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
