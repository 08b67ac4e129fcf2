"""Discrete distributions.

Fresh TPU-first implementations with the API surface of
numpyro/distributions/discrete.py.  ``enumerate_support`` returns the full
support stacked along a fresh leading dim — the contract the enumeration
engine (sum-product over reserved negative dims) builds on.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, random
from jax.nn import softmax, softplus
from jax.scipy.special import expit, gammainc, gammaln, logsumexp, xlog1py, xlogy

from . import constraints
from .distribution import Distribution
from .util import (
    binary_cross_entropy_with_logits,
    binomial,
    categorical,
    clamp_probs,
    lazy_property,
    multinomial,
    promote_shapes,
    validate_sample,
)

__all__ = [
    "Bernoulli",
    "BernoulliLogits",
    "BernoulliProbs",
    "Binomial",
    "BinomialLogits",
    "BinomialProbs",
    "Categorical",
    "CategoricalLogits",
    "CategoricalProbs",
    "DiscreteUniform",
    "Geometric",
    "GeometricLogits",
    "GeometricProbs",
    "Multinomial",
    "MultinomialLogits",
    "MultinomialProbs",
    "NegativeBinomial2",
    "OrderedLogistic",
    "Poisson",
    "ZeroInflatedPoisson",
]


def _to_probs_bernoulli(logits):
    return expit(logits)


def _to_logits_bernoulli(probs):
    ps_clamped = clamp_probs(probs)
    return jnp.log(ps_clamped) - jnp.log1p(-ps_clamped)


def _to_probs_multinom(logits):
    return softmax(logits, axis=-1)


def _to_logits_multinom(probs):
    minval = jnp.finfo(jnp.result_type(probs, float)).min
    return jnp.clip(jnp.log(probs), minval)


class BernoulliProbs(Distribution):
    arg_constraints = {"probs": constraints.unit_interval}
    support = constraints.boolean
    has_enumerate_support = True

    def __init__(self, probs, *, validate_args=None):
        self.probs = probs
        super().__init__(batch_shape=jnp.shape(probs), validate_args=validate_args)

    def sample(self, key, sample_shape=()):
        samples = random.bernoulli(
            key, self.probs, shape=sample_shape + self.batch_shape
        )
        return samples.astype(jnp.result_type(samples, int))

    @validate_sample
    def log_prob(self, value):
        value = value * 1.0  # float0-safe under enumeration + grad
        return xlogy(value, self.probs) + xlog1py(1 - value, -self.probs)

    @lazy_property
    def logits(self):
        return _to_logits_bernoulli(self.probs)

    @property
    def mean(self):
        return jnp.broadcast_to(self.probs, self.batch_shape)

    @property
    def variance(self):
        return jnp.broadcast_to(self.probs * (1 - self.probs), self.batch_shape)

    def enumerate_support(self, expand=True):
        values = jnp.arange(2).reshape((-1,) + (1,) * len(self.batch_shape))
        if expand:
            values = jnp.broadcast_to(values, values.shape[:1] + self.batch_shape)
        return values

    def entropy(self):
        p = clamp_probs(self.probs)
        return -p * jnp.log(p) - (1 - p) * jnp.log1p(-p)


class BernoulliLogits(Distribution):
    arg_constraints = {"logits": constraints.real}
    support = constraints.boolean
    has_enumerate_support = True

    def __init__(self, logits=None, *, validate_args=None):
        self.logits = logits
        super().__init__(batch_shape=jnp.shape(logits), validate_args=validate_args)

    def sample(self, key, sample_shape=()):
        samples = random.bernoulli(
            key, self.probs, shape=sample_shape + self.batch_shape
        )
        return samples.astype(jnp.result_type(samples, int))

    @validate_sample
    def log_prob(self, value):
        return -binary_cross_entropy_with_logits(self.logits, value)

    @lazy_property
    def probs(self):
        return _to_probs_bernoulli(self.logits)

    @property
    def mean(self):
        return jnp.broadcast_to(self.probs, self.batch_shape)

    @property
    def variance(self):
        return jnp.broadcast_to(self.probs * (1 - self.probs), self.batch_shape)

    def enumerate_support(self, expand=True):
        values = jnp.arange(2).reshape((-1,) + (1,) * len(self.batch_shape))
        if expand:
            values = jnp.broadcast_to(values, values.shape[:1] + self.batch_shape)
        return values

    def entropy(self):
        nexp = softplus(-self.logits)
        pexp = softplus(self.logits)
        p = expit(self.logits)
        return p * nexp + (1 - p) * pexp


def Bernoulli(probs=None, logits=None, *, validate_args=None):
    if probs is not None:
        return BernoulliProbs(probs, validate_args=validate_args)
    elif logits is not None:
        return BernoulliLogits(logits, validate_args=validate_args)
    raise ValueError("One of `probs` or `logits` must be specified.")


class BinomialProbs(Distribution):
    arg_constraints = {
        "probs": constraints.unit_interval,
        "total_count": constraints.nonnegative_integer,
    }
    has_enumerate_support = True
    pytree_data_fields = ("probs",)
    pytree_aux_fields = ("total_count",)

    def __init__(self, probs, total_count=1, *, validate_args=None):
        self.probs, self.total_count = promote_shapes(probs, total_count)
        batch_shape = lax.broadcast_shapes(jnp.shape(probs), jnp.shape(total_count))
        super().__init__(batch_shape=batch_shape, validate_args=validate_args)

    def sample(self, key, sample_shape=()):
        return binomial(
            key, self.probs, n=self.total_count, shape=sample_shape + self.batch_shape
        ).astype(jnp.result_type(int))

    @validate_sample
    def log_prob(self, value):
        log_factorial_n = gammaln(self.total_count + 1)
        log_factorial_k = gammaln(value + 1)
        log_factorial_nmk = gammaln(self.total_count - value + 1)
        return (
            log_factorial_n
            - log_factorial_k
            - log_factorial_nmk
            + xlogy(value * 1.0, self.probs)
            + xlog1py(self.total_count - value * 1.0, -self.probs)
        )

    @lazy_property
    def logits(self):
        return _to_logits_bernoulli(self.probs)

    @property
    def mean(self):
        return jnp.broadcast_to(self.total_count * self.probs, self.batch_shape)

    @property
    def variance(self):
        return jnp.broadcast_to(
            self.total_count * self.probs * (1 - self.probs), self.batch_shape
        )

    @property
    def support(self):
        return constraints.integer_interval(0, self.total_count)

    def enumerate_support(self, expand=True):
        if not_jax_tracer := not isinstance(self.total_count, jax.core.Tracer):
            total_count = np.amax(np.asarray(self.total_count))
            if not_jax_tracer and np.amin(np.asarray(self.total_count)) != total_count:
                raise NotImplementedError(
                    "Inhomogeneous total count not supported by `enumerate_support`."
                )
        else:
            raise NotImplementedError("traced total_count in enumerate_support")
        values = jnp.arange(total_count + 1).reshape(
            (-1,) + (1,) * len(self.batch_shape)
        )
        if expand:
            values = jnp.broadcast_to(values, values.shape[:1] + self.batch_shape)
        return values


class BinomialLogits(Distribution):
    arg_constraints = {
        "logits": constraints.real,
        "total_count": constraints.nonnegative_integer,
    }
    has_enumerate_support = True
    enumerate_support = BinomialProbs.enumerate_support
    pytree_data_fields = ("logits",)
    pytree_aux_fields = ("total_count",)

    def __init__(self, logits, total_count=1, *, validate_args=None):
        self.logits, self.total_count = promote_shapes(logits, total_count)
        batch_shape = lax.broadcast_shapes(jnp.shape(logits), jnp.shape(total_count))
        super().__init__(batch_shape=batch_shape, validate_args=validate_args)

    def sample(self, key, sample_shape=()):
        return binomial(
            key, self.probs, n=self.total_count, shape=sample_shape + self.batch_shape
        ).astype(jnp.result_type(int))

    @validate_sample
    def log_prob(self, value):
        log_factorial_n = gammaln(self.total_count + 1)
        log_factorial_k = gammaln(value + 1)
        log_factorial_nmk = gammaln(self.total_count - value + 1)
        normalize_term = (
            self.total_count * jnp.clip(self.logits, 0)
            + xlog1py(self.total_count, jnp.exp(-jnp.abs(self.logits)))
            - log_factorial_n
        )
        return (
            value * self.logits - log_factorial_k - log_factorial_nmk - normalize_term
        )

    @lazy_property
    def probs(self):
        return _to_probs_bernoulli(self.logits)

    @property
    def mean(self):
        return jnp.broadcast_to(self.total_count * self.probs, self.batch_shape)

    @property
    def variance(self):
        return jnp.broadcast_to(
            self.total_count * self.probs * (1 - self.probs), self.batch_shape
        )

    @property
    def support(self):
        return constraints.integer_interval(0, self.total_count)


def Binomial(total_count=1, probs=None, logits=None, *, validate_args=None):
    if probs is not None:
        return BinomialProbs(probs, total_count, validate_args=validate_args)
    elif logits is not None:
        return BinomialLogits(logits, total_count, validate_args=validate_args)
    raise ValueError("One of `probs` or `logits` must be specified.")


class CategoricalProbs(Distribution):
    arg_constraints = {"probs": constraints.simplex}
    has_enumerate_support = True

    def __init__(self, probs, *, validate_args=None):
        if jnp.ndim(probs) < 1:
            raise ValueError("`probs` parameter must be at least one-dimensional.")
        self.probs = probs
        super().__init__(
            batch_shape=jnp.shape(self.probs)[:-1], validate_args=validate_args
        )

    def sample(self, key, sample_shape=()):
        return categorical(key, self.probs, shape=sample_shape + self.batch_shape)

    @validate_sample
    def log_prob(self, value):
        batch_shape = lax.broadcast_shapes(jnp.shape(value), self.batch_shape)
        value = jnp.expand_dims(value, -1)
        value = jnp.broadcast_to(value, batch_shape + (1,))
        logits = _to_logits_multinom(self.probs)
        log_pmf = jnp.broadcast_to(logits, batch_shape + jnp.shape(logits)[-1:])
        return jnp.take_along_axis(log_pmf, value.astype(int), axis=-1)[..., 0]

    @lazy_property
    def logits(self):
        return _to_logits_multinom(self.probs)

    @property
    def mean(self):
        return jnp.full(self.batch_shape, jnp.nan)

    @property
    def variance(self):
        return jnp.full(self.batch_shape, jnp.nan)

    @property
    def support(self):
        return constraints.integer_interval(0, jnp.shape(self.probs)[-1] - 1)

    def enumerate_support(self, expand=True):
        values = jnp.arange(self.probs.shape[-1]).reshape(
            (-1,) + (1,) * len(self.batch_shape)
        )
        if expand:
            values = jnp.broadcast_to(values, values.shape[:1] + self.batch_shape)
        return values

    def entropy(self):
        p = clamp_probs(self.probs)
        return -(p * jnp.log(p)).sum(-1)


class CategoricalLogits(Distribution):
    arg_constraints = {"logits": constraints.real_vector}
    has_enumerate_support = True

    def __init__(self, logits, *, validate_args=None):
        if jnp.ndim(logits) < 1:
            raise ValueError("`logits` parameter must be at least one-dimensional.")
        self.logits = logits
        super().__init__(
            batch_shape=jnp.shape(logits)[:-1], validate_args=validate_args
        )

    def sample(self, key, sample_shape=()):
        return random.categorical(
            key, self.logits, axis=-1, shape=sample_shape + self.batch_shape
        )

    @validate_sample
    def log_prob(self, value):
        batch_shape = lax.broadcast_shapes(jnp.shape(value), self.batch_shape)
        value = jnp.expand_dims(value, -1)
        value = jnp.broadcast_to(value, batch_shape + (1,))
        log_pmf = self.logits - logsumexp(self.logits, axis=-1, keepdims=True)
        log_pmf = jnp.broadcast_to(log_pmf, batch_shape + jnp.shape(log_pmf)[-1:])
        return jnp.take_along_axis(log_pmf, value.astype(int), -1)[..., 0]

    @lazy_property
    def probs(self):
        return _to_probs_multinom(self.logits)

    @property
    def mean(self):
        return jnp.full(self.batch_shape, jnp.nan)

    @property
    def variance(self):
        return jnp.full(self.batch_shape, jnp.nan)

    @property
    def support(self):
        return constraints.integer_interval(0, jnp.shape(self.logits)[-1] - 1)

    def enumerate_support(self, expand=True):
        values = jnp.arange(self.logits.shape[-1]).reshape(
            (-1,) + (1,) * len(self.batch_shape)
        )
        if expand:
            values = jnp.broadcast_to(values, values.shape[:1] + self.batch_shape)
        return values

    def entropy(self):
        log_pmf = self.logits - logsumexp(self.logits, axis=-1, keepdims=True)
        p = jnp.exp(log_pmf)
        return -(p * log_pmf).sum(-1)


def Categorical(probs=None, logits=None, *, validate_args=None):
    if probs is not None:
        return CategoricalProbs(probs, validate_args=validate_args)
    elif logits is not None:
        return CategoricalLogits(logits, validate_args=validate_args)
    raise ValueError("One of `probs` or `logits` must be specified.")


class DiscreteUniform(Distribution):
    arg_constraints = {
        "low": constraints.dependent(is_discrete=True, event_dim=0),
        "high": constraints.dependent(is_discrete=True, event_dim=0),
    }
    has_enumerate_support = True
    pytree_data_fields = ("low", "high", "_support")

    def __init__(self, low=0, high=1, *, validate_args=None):
        self.low, self.high = promote_shapes(low, high)
        batch_shape = lax.broadcast_shapes(jnp.shape(low), jnp.shape(high))
        self._support = constraints.integer_interval(low, high)
        super().__init__(batch_shape, validate_args=validate_args)

    @property
    def support(self):
        return self._support

    def sample(self, key, sample_shape=()):
        shape = sample_shape + self.batch_shape
        return random.randint(key, shape, self.low, self.high + 1)

    @validate_sample
    def log_prob(self, value):
        shape = lax.broadcast_shapes(jnp.shape(value), self.batch_shape)
        return -jnp.broadcast_to(jnp.log(self.high + 1 - self.low), shape)

    def cdf(self, value):
        cdf = (jnp.floor(value) + 1 - self.low) / (self.high - self.low + 1)
        return jnp.clip(cdf, 0.0, 1.0)

    def icdf(self, value):
        return self.low + value * (self.high - self.low + 1) - 1

    @property
    def mean(self):
        return self.low + (self.high - self.low) / 2.0

    @property
    def variance(self):
        return ((self.high - self.low + 1) ** 2 - 1) / 12.0

    def enumerate_support(self, expand=True):
        if not isinstance(self.low, jax.core.Tracer):
            low = np.amin(np.asarray(self.low))
            if np.amax(np.asarray(self.low)) != low:
                raise NotImplementedError("Inhomogeneous `low` not supported.")
            high = np.amax(np.asarray(self.high))
            if np.amin(np.asarray(self.high)) != high:
                raise NotImplementedError("Inhomogeneous `high` not supported.")
        else:
            raise NotImplementedError
        values = (low + jnp.arange(high - low + 1)).reshape(
            (-1,) + (1,) * len(self.batch_shape)
        )
        if expand:
            values = jnp.broadcast_to(values, values.shape[:1] + self.batch_shape)
        return values

    def entropy(self):
        return jnp.broadcast_to(jnp.log(self.high - self.low + 1), self.batch_shape)


class MultinomialProbs(Distribution):
    arg_constraints = {
        "probs": constraints.simplex,
        "total_count": constraints.nonnegative_integer,
    }
    pytree_data_fields = ("probs",)
    pytree_aux_fields = ("total_count", "total_count_max")

    def __init__(self, probs, total_count=1, *, total_count_max=None, validate_args=None):
        if jnp.ndim(probs) < 1:
            raise ValueError("`probs` parameter must be at least one-dimensional.")
        batch_shape = lax.broadcast_shapes(jnp.shape(probs)[:-1], jnp.shape(total_count))
        self.probs = probs
        self.total_count = total_count
        self.total_count_max = total_count_max
        super().__init__(
            batch_shape=batch_shape,
            event_shape=jnp.shape(self.probs)[-1:],
            validate_args=validate_args,
        )

    def sample(self, key, sample_shape=()):
        return multinomial(
            key,
            self.probs,
            jnp.asarray(self.total_count),
            shape=sample_shape + self.batch_shape,
            total_count_max=self.total_count_max,
        )

    @validate_sample
    def log_prob(self, value):
        return gammaln(jnp.asarray(self.total_count) + 1) + jnp.sum(
            xlogy(value * 1.0, self.probs) - gammaln(value + 1), axis=-1
        )

    @lazy_property
    def logits(self):
        return _to_logits_multinom(self.probs)

    @property
    def mean(self):
        return self.probs * jnp.expand_dims(jnp.asarray(self.total_count), -1)

    @property
    def variance(self):
        return jnp.expand_dims(jnp.asarray(self.total_count), -1) * self.probs * (
            1 - self.probs
        )

    @property
    def support(self):
        return constraints.multinomial(self.total_count)


class MultinomialLogits(Distribution):
    arg_constraints = {
        "logits": constraints.real_vector,
        "total_count": constraints.nonnegative_integer,
    }
    pytree_data_fields = ("logits",)
    pytree_aux_fields = ("total_count", "total_count_max")

    def __init__(self, logits, total_count=1, *, total_count_max=None, validate_args=None):
        if jnp.ndim(logits) < 1:
            raise ValueError("`logits` parameter must be at least one-dimensional.")
        batch_shape = lax.broadcast_shapes(
            jnp.shape(logits)[:-1], jnp.shape(total_count)
        )
        self.logits = logits
        self.total_count = total_count
        self.total_count_max = total_count_max
        super().__init__(
            batch_shape=batch_shape,
            event_shape=jnp.shape(self.logits)[-1:],
            validate_args=validate_args,
        )

    def sample(self, key, sample_shape=()):
        return multinomial(
            key,
            self.probs,
            jnp.asarray(self.total_count),
            shape=sample_shape + self.batch_shape,
            total_count_max=self.total_count_max,
        )

    @validate_sample
    def log_prob(self, value):
        normalize_term = jnp.asarray(self.total_count) * logsumexp(
            self.logits, axis=-1
        ) - gammaln(jnp.asarray(self.total_count) + 1)
        return (
            jnp.sum(value * self.logits - gammaln(value + 1), axis=-1)
            - normalize_term
        )

    @lazy_property
    def probs(self):
        return _to_probs_multinom(self.logits)

    @property
    def mean(self):
        return jnp.expand_dims(jnp.asarray(self.total_count), -1) * self.probs

    @property
    def variance(self):
        return jnp.expand_dims(jnp.asarray(self.total_count), -1) * self.probs * (
            1 - self.probs
        )

    @property
    def support(self):
        return constraints.multinomial(self.total_count)


def Multinomial(
    total_count=1, probs=None, logits=None, *, total_count_max=None, validate_args=None
):
    if probs is not None:
        return MultinomialProbs(
            probs, total_count, total_count_max=total_count_max, validate_args=validate_args
        )
    elif logits is not None:
        return MultinomialLogits(
            logits, total_count, total_count_max=total_count_max, validate_args=validate_args
        )
    raise ValueError("One of `probs` or `logits` must be specified.")


class Poisson(Distribution):
    arg_constraints = {"rate": constraints.positive}
    support = constraints.nonnegative_integer
    pytree_aux_fields = ("is_sparse",)

    def __init__(self, rate, *, is_sparse=False, validate_args=None):
        self.rate = rate
        self.is_sparse = is_sparse
        super().__init__(jnp.shape(rate), validate_args=validate_args)

    def sample(self, key, sample_shape=()):
        return random.poisson(key, self.rate, shape=sample_shape + self.batch_shape)

    @validate_sample
    def log_prob(self, value):
        if self.is_sparse and not isinstance(value, jax.core.Tracer):
            # host-side sparse path: compute log-factorial only at nonzeros
            value = jnp.asarray(value)
        value = jnp.asarray(value, dtype=jnp.result_type(float))
        value = value * 1.0  # float0-safe under enumeration + grad
        return xlogy(value, self.rate) - gammaln(value + 1) - self.rate

    @property
    def mean(self):
        return jnp.broadcast_to(self.rate, self.batch_shape)

    @property
    def variance(self):
        return jnp.broadcast_to(self.rate, self.batch_shape)

    def cdf(self, value):
        k = jnp.floor(value) + 1
        return 1 - gammainc(k, self.rate)


class GeometricProbs(Distribution):
    arg_constraints = {"probs": constraints.unit_interval}
    support = constraints.nonnegative_integer

    def __init__(self, probs, *, validate_args=None):
        self.probs = probs
        super().__init__(batch_shape=jnp.shape(self.probs), validate_args=validate_args)

    def sample(self, key, sample_shape=()):
        probs = self.probs
        dtype = jnp.result_type(probs)
        shape = sample_shape + self.batch_shape
        u = random.uniform(key, shape, dtype)
        return jnp.floor(jnp.log1p(-u) / jnp.log1p(-probs)).astype(
            jnp.result_type(int)
        )

    @validate_sample
    def log_prob(self, value):
        probs = jnp.where((self.probs == 1) & (value == 0), 0, self.probs)
        return value * jnp.log1p(-probs) + jnp.log(self.probs)

    @lazy_property
    def logits(self):
        return _to_logits_bernoulli(self.probs)

    @property
    def mean(self):
        return jnp.asarray(1.0 / self.probs - 1.0, jnp.result_type(float))

    @property
    def variance(self):
        return jnp.asarray(
            (1.0 / self.probs - 1.0) / self.probs, jnp.result_type(float)
        )


class GeometricLogits(Distribution):
    arg_constraints = {"logits": constraints.real}
    support = constraints.nonnegative_integer

    def __init__(self, logits, *, validate_args=None):
        self.logits = logits
        super().__init__(batch_shape=jnp.shape(logits), validate_args=validate_args)

    @lazy_property
    def probs(self):
        return _to_probs_bernoulli(self.logits)

    def sample(self, key, sample_shape=()):
        return GeometricProbs(self.probs).sample(key, sample_shape)

    @validate_sample
    def log_prob(self, value):
        return (-value - 1) * softplus(self.logits) + self.logits

    @property
    def mean(self):
        return 1.0 / expit(self.logits) - 1.0

    @property
    def variance(self):
        p = expit(self.logits)
        return (1.0 / p - 1.0) / p


def Geometric(probs=None, logits=None, *, validate_args=None):
    if probs is not None:
        return GeometricProbs(probs, validate_args=validate_args)
    elif logits is not None:
        return GeometricLogits(logits, validate_args=validate_args)
    raise ValueError("One of `probs` or `logits` must be specified.")


class OrderedLogistic(CategoricalProbs):
    """Categorical over ordered categories from a latent `predictor` and a
    vector of `cutpoints`."""

    arg_constraints = {
        "predictor": constraints.real,
        "cutpoints": constraints.ordered_vector,
    }

    def __init__(self, predictor, cutpoints, *, validate_args=None):
        if jnp.ndim(predictor) == 0:
            (predictor,) = promote_shapes(predictor, shape=(1,))
        else:
            predictor = predictor[..., None]
        predictor, self.cutpoints = promote_shapes(predictor, cutpoints)
        self.predictor = predictor[..., 0]
        cumulative_probs = expit(self.cutpoints - predictor)
        # add two boundary columns 0 and 1
        pad_width = [(0, 0)] * (jnp.ndim(cumulative_probs) - 1) + [(1, 1)]
        cumulative_probs = jnp.pad(cumulative_probs, pad_width, constant_values=(0, 1))
        probs = cumulative_probs[..., 1:] - cumulative_probs[..., :-1]
        super().__init__(probs, validate_args=validate_args)

    @staticmethod
    def infer_shapes(predictor, cutpoints):
        batch_shape = lax.broadcast_shapes(predictor, cutpoints[:-1])
        return batch_shape, ()

    def entropy(self):
        raise NotImplementedError


class NegativeBinomial2(Distribution):
    """Gamma-Poisson mixture parameterized by mean and concentration."""

    arg_constraints = {
        "mean": constraints.positive,
        "concentration": constraints.positive,
    }
    support = constraints.nonnegative_integer
    pytree_data_fields = ("_gamma", "concentration")

    def __init__(self, mean, concentration, *, validate_args=None):
        self._gamma = _GammaMixer(concentration, concentration / mean)
        self.concentration = self._gamma.concentration
        batch_shape = self._gamma.batch_shape
        super().__init__(batch_shape, validate_args=validate_args)

    @property
    def mean(self):
        return self._gamma.mean

    @property
    def variance(self):
        return self._gamma.mean + jnp.square(self._gamma.mean) / self.concentration

    def sample(self, key, sample_shape=()):
        key_gamma, key_poisson = random.split(key)
        rate = self._gamma.sample(key_gamma, sample_shape)
        return random.poisson(key_poisson, rate)

    @validate_sample
    def log_prob(self, value):
        a = self.concentration
        mu = self._gamma.mean
        return (
            gammaln(value + a)
            - gammaln(value + 1)
            - gammaln(a)
            + a * (jnp.log(a) - jnp.log(a + mu))
            + value * (jnp.log(mu) - jnp.log(a + mu))
        )


def _GammaMixer(concentration, rate):
    from .continuous import Gamma

    return Gamma(concentration, rate)


class ZeroInflatedPoisson(Distribution):
    arg_constraints = {"gate": constraints.unit_interval, "rate": constraints.positive}
    support = constraints.nonnegative_integer

    def __init__(self, gate, rate=1.0, *, validate_args=None):
        batch_shape = lax.broadcast_shapes(jnp.shape(gate), jnp.shape(rate))
        self.gate, self.rate = promote_shapes(gate, rate)
        super().__init__(batch_shape, validate_args=validate_args)

    def sample(self, key, sample_shape=()):
        key_bern, key_poisson = random.split(key)
        shape = sample_shape + self.batch_shape
        mask = random.bernoulli(key_bern, self.gate, shape)
        samples = random.poisson(key_poisson, self.rate, shape)
        return jnp.where(mask, 0, samples)

    @validate_sample
    def log_prob(self, value):
        log_prob = xlogy(value * 1.0, self.rate) - gammaln(value + 1.0) - self.rate
        log_prob = jnp.log1p(-self.gate) + log_prob
        zero_prob = jnp.logaddexp(
            jnp.log(self.gate), jnp.log1p(-self.gate) - self.rate
        )
        return jnp.where(value == 0, zero_prob, log_prob)

    @property
    def mean(self):
        return (1 - self.gate) * self.rate

    @property
    def variance(self):
        return (1 - self.gate) * self.rate * (1 + self.rate * self.gate)


class ZeroInflatedProbs(Distribution):
    """Mix a point mass at zero (probability ``gate``) into any discrete
    scalar-event base distribution
    (reference: numpyro/distributions/discrete.py:758)."""

    arg_constraints = {"gate": constraints.unit_interval}
    pytree_data_fields = ("base_dist", "gate")

    def __init__(self, base_dist, gate, *, validate_args=None):
        batch_shape = lax.broadcast_shapes(jnp.shape(gate), base_dist.batch_shape)
        (self.gate,) = promote_shapes(gate, shape=batch_shape)
        assert base_dist.support.is_discrete
        if base_dist.event_shape:
            raise ValueError(
                "ZeroInflatedProbs expected empty base_dist.event_shape "
                f"but got {base_dist.event_shape}"
            )
        self.base_dist = base_dist.expand(batch_shape)
        super().__init__(batch_shape, validate_args=validate_args)

    def sample(self, key, sample_shape=()):
        key_bern, key_base = random.split(key)
        shape = sample_shape + self.batch_shape
        mask = random.bernoulli(key_bern, self.gate, shape)
        samples = self.base_dist.sample(key_base, sample_shape=sample_shape)
        return jnp.where(mask, 0, samples)

    @validate_sample
    def log_prob(self, value):
        log_prob = jnp.log1p(-self.gate) + self.base_dist.log_prob(value)
        return jnp.where(
            value == 0, jnp.log(self.gate + jnp.exp(log_prob)), log_prob
        )

    @constraints.dependent_property(is_discrete=True, event_dim=0)
    def support(self):
        return self.base_dist.support

    @lazy_property
    def mean(self):
        return (1 - self.gate) * self.base_dist.mean

    @lazy_property
    def variance(self):
        return (1 - self.gate) * (
            self.base_dist.mean**2 + self.base_dist.variance
        ) - self.mean**2

    @property
    def has_enumerate_support(self):
        return self.base_dist.has_enumerate_support

    def enumerate_support(self, expand=True):
        return self.base_dist.enumerate_support(expand=expand)


class ZeroInflatedLogits(ZeroInflatedProbs):
    """ZeroInflatedProbs with the gate given as logits, evaluated stably in
    log space (reference: numpyro/distributions/discrete.py:814)."""

    arg_constraints = {"gate_logits": constraints.real}

    def __init__(self, base_dist, gate_logits, *, validate_args=None):
        gate = _to_probs_bernoulli(gate_logits)
        batch_shape = lax.broadcast_shapes(
            jnp.shape(gate), base_dist.batch_shape
        )
        (self.gate_logits,) = promote_shapes(gate_logits, shape=batch_shape)
        super().__init__(base_dist, gate, validate_args=validate_args)

    @validate_sample
    def log_prob(self, value):
        log_prob_minus_log_gate = -self.gate_logits + self.base_dist.log_prob(value)
        log_gate = -softplus(-self.gate_logits)
        log_prob = log_prob_minus_log_gate + log_gate
        zero_log_prob = softplus(log_prob_minus_log_gate) + log_gate
        return jnp.where(value == 0, zero_log_prob, log_prob)


def ZeroInflatedDistribution(
    base_dist, *, gate=None, gate_logits=None, validate_args=None
):
    """Generic zero-inflated wrapper
    (reference: numpyro/distributions/discrete.py:832)."""
    from .util import assert_one_of

    assert_one_of(gate=gate, gate_logits=gate_logits)
    if gate is not None:
        return ZeroInflatedProbs(base_dist, gate, validate_args=validate_args)
    return ZeroInflatedLogits(base_dist, gate_logits, validate_args=validate_args)


def ZeroInflatedNegativeBinomial2(
    mean, concentration, *, gate=None, gate_logits=None, validate_args=None
):
    return ZeroInflatedDistribution(
        NegativeBinomial2(mean, concentration, validate_args=validate_args),
        gate=gate,
        gate_logits=gate_logits,
        validate_args=validate_args,
    )
