"""Finite mixture distributions.

Reference surface: numpyro/distributions/mixtures.py:158,263.  log_prob is a
logsumexp contraction over the component axis — one fused reduction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import random
from jax.scipy.special import logsumexp

from . import constraints
from .discrete import CategoricalLogits, CategoricalProbs
from .distribution import Distribution
from .util import validate_sample

__all__ = ["Mixture", "MixtureGeneral", "MixtureSameFamily"]


def Mixture(mixing_distribution, component_distributions, *, validate_args=None):
    if isinstance(component_distributions, Distribution):
        return MixtureSameFamily(
            mixing_distribution, component_distributions, validate_args=validate_args
        )
    return MixtureGeneral(
        mixing_distribution, component_distributions, validate_args=validate_args
    )


class _MixtureBase(Distribution):
    @property
    def mixture_size(self):
        return self._mixture_size

    @property
    def mixing_distribution(self):
        return self._mixing_distribution

    @property
    def mixture_dim(self):
        return -self.event_dim - 1

    def component_log_probs(self, value):
        raise NotImplementedError

    def component_sample(self, key, sample_shape=()):
        raise NotImplementedError

    @property
    def component_mean(self):
        raise NotImplementedError

    @property
    def component_variance(self):
        raise NotImplementedError

    @property
    def mean(self):
        probs = self.mixing_distribution.probs
        probs = probs.reshape(probs.shape + (1,) * self.event_dim)
        weighted = probs * self.component_mean
        return jnp.sum(weighted, axis=self.mixture_dim)

    @property
    def variance(self):
        probs = self.mixing_distribution.probs
        probs = probs.reshape(probs.shape + (1,) * self.event_dim)
        mean_cond_var = jnp.sum(probs * self.component_variance, axis=self.mixture_dim)
        sq_deviation = (
            self.component_mean - jnp.expand_dims(self.mean, axis=self.mixture_dim)
        ) ** 2
        var_cond_mean = jnp.sum(probs * sq_deviation, axis=self.mixture_dim)
        return mean_cond_var + var_cond_mean

    def cdf(self, samples):
        raise NotImplementedError

    def sample_with_intermediates(self, key, sample_shape=()):
        key_ind, key_comp = random.split(key)
        samples = self.component_sample(key_comp, sample_shape=sample_shape)
        indices = self.mixing_distribution.expand(
            sample_shape + self.batch_shape
        ).sample(key_ind)
        n_expand = self.event_dim + 1
        indices_expanded = indices.reshape(indices.shape + (1,) * n_expand)
        samples_selected = jnp.take_along_axis(
            samples, indices=indices_expanded, axis=self.mixture_dim
        )
        return jnp.squeeze(samples_selected, axis=self.mixture_dim), [indices]

    def sample(self, key, sample_shape=()):
        return self.sample_with_intermediates(key=key, sample_shape=sample_shape)[0]

    @validate_sample
    def log_prob(self, value, intermediates=None):
        del intermediates
        sum_log_probs = self.component_log_probs(value)
        return logsumexp(sum_log_probs, axis=-1)


class MixtureSameFamily(_MixtureBase):
    """Mixture whose components are one batched distribution."""

    arg_constraints = {}
    pytree_data_fields = ("_mixing_distribution", "_component_distribution")
    pytree_aux_fields = ("_mixture_size",)

    def __init__(
        self, mixing_distribution, component_distribution, *, validate_args=None
    ):
        _check_mixing_distribution(mixing_distribution)
        mixture_size = mixing_distribution.probs.shape[-1]
        if not isinstance(component_distribution, Distribution):
            raise ValueError(
                "The component distribution need to be a numpyro_tpu.distributions.Distribution. "
                f"However, it is of type {type(component_distribution)}"
            )
        if not component_distribution.batch_shape[-1] == mixture_size:
            raise ValueError(
                "Component distribution batch shape last dimension "
                f"(size={component_distribution.batch_shape[-1]}) "
                f"needs to correspond to the mixture_size={mixture_size}!"
            )
        self._mixing_distribution = mixing_distribution
        self._component_distribution = component_distribution
        self._mixture_size = mixture_size
        batch_shape = component_distribution.batch_shape[:-1]
        event_shape = component_distribution.event_shape
        super().__init__(batch_shape, event_shape, validate_args=validate_args)

    @property
    def component_distribution(self):
        return self._component_distribution

    @property
    def support(self):
        return self.component_distribution.support

    @property
    def is_discrete(self):
        return self.component_distribution.is_discrete

    @property
    def component_mean(self):
        return self.component_distribution.mean

    @property
    def component_variance(self):
        return self.component_distribution.variance

    def cdf(self, samples):
        cdf_components = self.component_distribution.cdf(
            jnp.expand_dims(samples, axis=self.mixture_dim)
        )
        return jnp.sum(cdf_components * self.mixing_distribution.probs, axis=-1)

    def component_sample(self, key, sample_shape=()):
        return self.component_distribution.expand(
            sample_shape + self.batch_shape + (self.mixture_size,)
        ).sample(key)

    def component_log_probs(self, value):
        value = jnp.expand_dims(value, self.mixture_dim)
        component_log_probs = self.component_distribution.log_prob(value)
        return jax.nn.log_softmax(self.mixing_distribution.logits, axis=-1) + (
            component_log_probs
        )


class MixtureGeneral(_MixtureBase):
    """Mixture of a list of heterogeneous component distributions."""

    arg_constraints = {}
    pytree_data_fields = ("_mixing_distribution", "_component_distributions")
    pytree_aux_fields = ("_mixture_size", "_support")

    def __init__(
        self,
        mixing_distribution,
        component_distributions,
        *,
        support=None,
        validate_args=None,
    ):
        _check_mixing_distribution(mixing_distribution)
        self._mixing_distribution = mixing_distribution
        self._mixture_size = jnp.shape(mixing_distribution.probs)[-1]
        try:
            component_distributions = list(component_distributions)
        except TypeError:
            raise ValueError(
                "The 'component_distributions' argument must be a list of Distribution objects"
            )
        for d in component_distributions:
            if not isinstance(d, Distribution):
                raise ValueError(
                    "All elements of 'component_distributions' must be instances of "
                    "numpyro_tpu.distributions.Distribution subclasses"
                )
        if len(component_distributions) != self.mixture_size:
            raise ValueError(
                "The number of elements in 'component_distributions' needs to match "
                "the mixture_size of the mixing_distribution "
                f"({len(component_distributions)} != {self.mixture_size})"
            )
        self._component_distributions = component_distributions
        if support is not None:
            self._support = support
        else:
            support = component_distributions[0].support
            if any(d.support is not support for d in component_distributions[1:]):
                raise ValueError(
                    "All component distributions must have the same support "
                    "(or pass `support` explicitly)."
                )
            self._support = support
        batch_shape = component_distributions[0].batch_shape
        event_shape = component_distributions[0].event_shape
        super().__init__(batch_shape, event_shape, validate_args=validate_args)

    @property
    def component_distributions(self):
        return self._component_distributions

    @property
    def support(self):
        return self._support

    @property
    def is_discrete(self):
        return self.support.is_discrete

    @property
    def component_mean(self):
        return jnp.stack(
            [d.mean for d in self.component_distributions], axis=self.mixture_dim
        )

    @property
    def component_variance(self):
        return jnp.stack(
            [d.variance for d in self.component_distributions], axis=self.mixture_dim
        )

    def cdf(self, samples):
        cdfs = jnp.stack(
            [d.cdf(samples) for d in self.component_distributions],
            axis=self.mixture_dim,
        )
        return jnp.sum(cdfs * self.mixing_distribution.probs, axis=-1)

    def component_sample(self, key, sample_shape=()):
        keys = random.split(key, self.mixture_size)
        samples = [
            d.expand(sample_shape + self.batch_shape).sample(k)
            for k, d in zip(keys, self.component_distributions)
        ]
        return jnp.stack(samples, axis=self.mixture_dim)

    def component_log_probs(self, value):
        component_log_probs = jnp.stack(
            [d.log_prob(value) for d in self.component_distributions], axis=-1
        )
        return (
            jax.nn.log_softmax(self.mixing_distribution.logits, axis=-1)
            + component_log_probs
        )


def _check_mixing_distribution(mixing_distribution):
    if not isinstance(mixing_distribution, (CategoricalLogits, CategoricalProbs)):
        raise ValueError(
            "The mixing distribution must be a Categorical distribution; got "
            f"{type(mixing_distribution)}"
        )
