"""Wrap tfp-on-jax distributions as numpyro_tpu distributions
(reference: numpyro/contrib/tfp/distributions.py:47-296)."""

from __future__ import annotations

import jax.numpy as jnp

try:
    from tensorflow_probability.substrates.jax import distributions as tfd
    from tensorflow_probability.substrates.jax import bijectors as tfb
except ImportError as e:  # pragma: no cover
    raise ImportError(
        "numpyro_tpu.contrib.tfp requires tensorflow_probability "
        "(jax substrate). Install with `pip install tensorflow-probability`."
    ) from e

from numpyro_tpu.distributions import Distribution, constraints
from numpyro_tpu.distributions.transforms import Transform, biject_to


class BijectorConstraint(constraints.Constraint):
    """A constraint defined by a TFP bijector's codomain."""

    def __init__(self, bijector):
        self.bijector = bijector

    @property
    def event_dim(self):
        return self.bijector.forward_min_event_ndims

    def __call__(self, x):
        return jnp.isfinite(self.bijector.inverse(x)).reshape(
            jnp.shape(x)[: jnp.ndim(x) - self.event_dim] + (-1,)
        ).all(-1)

    def feasible_like(self, prototype):
        return self.bijector.forward(jnp.zeros_like(prototype))


class BijectorTransform(Transform):
    """A numpyro_tpu Transform backed by a TFP bijector."""

    def __init__(self, bijector):
        self.bijector = bijector

    @property
    def domain(self):
        return constraints.independent(
            constraints.real, self.bijector.forward_min_event_ndims
        )

    @property
    def codomain(self):
        return BijectorConstraint(self.bijector)

    def __call__(self, x):
        return self.bijector.forward(x)

    def _inverse(self, y):
        return self.bijector.inverse(y)

    def log_abs_det_jacobian(self, x, y, intermediates=None):
        return self.bijector.forward_log_det_jacobian(
            x, self.bijector.forward_min_event_ndims
        )


@biject_to.register(BijectorConstraint)
def _transform_to_bijector_constraint(constraint):
    return BijectorTransform(constraint.bijector)


class TFPDistribution(Distribution):
    """Adapter exposing a tfp-on-jax distribution through the numpyro_tpu
    Distribution interface.  Use ``TFPDistribution[tfd.Normal](0, 1)``."""

    tfp_dist = None

    def __class_getitem__(cls, tfd_class):
        name = f"TFP{tfd_class.__name__}"
        return type(name, (TFPDistribution,), {"_tfd_class": tfd_class})

    def __init__(self, *args, **kwargs):
        self.tfp_dist = type(self)._tfd_class(*args, **kwargs)
        event_shape = tuple(self.tfp_dist.event_shape)
        batch_shape = tuple(self.tfp_dist.batch_shape)
        super().__init__(batch_shape, event_shape)

    @property
    def support(self):
        bijector = self.tfp_dist.experimental_default_event_space_bijector()
        return BijectorConstraint(bijector)

    def sample(self, key, sample_shape=()):
        return self.tfp_dist.sample(sample_shape=sample_shape, seed=key)

    def log_prob(self, value):
        return self.tfp_dist.log_prob(value)

    @property
    def mean(self):
        return self.tfp_dist.mean()

    @property
    def variance(self):
        return self.tfp_dist.variance()
