"""Wrap tfp-on-jax distributions as numpyro_tpu distributions
(reference: numpyro/contrib/tfp/distributions.py:47-296).

Any distribution in ``tensorflow_probability.substrates.jax.distributions``
can be used in a model either explicitly::

    from numpyro_tpu.contrib.tfp.distributions import TFPDistribution
    d = TFPDistribution[tfd.Normal](0., 1.)

or by importing the wrapper by name — wrappers are generated lazily on
first attribute access (``from numpyro_tpu.contrib.tfp.distributions
import Normal``), rather than eagerly for the whole tfd inventory.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

try:
    from tensorflow_probability.substrates.jax import bijectors as tfb
    from tensorflow_probability.substrates.jax import distributions as tfd
except ImportError as e:  # pragma: no cover
    raise ImportError(
        "numpyro_tpu.contrib.tfp requires tensorflow_probability "
        "(jax substrate). Install with `pip install tensorflow-probability`."
    ) from e

from numpyro_tpu.distributions import Distribution, constraints
from numpyro_tpu.distributions.transforms import Transform, biject_to


def _codomain_of(bijector):
    """Map a TFP bijector to the numpyro constraint of its image, falling
    back to a generic BijectorConstraint when no native match exists."""
    name = type(bijector).__name__
    if name == "Sigmoid":
        low = getattr(bijector, "low", 0.0)
        high = getattr(bijector, "high", 1.0)
        return constraints.interval(low, high)
    if name == "Identity":
        return constraints.real
    if name in ("Exp", "Softplus"):
        return constraints.positive
    if name == "GeneralizedPareto":
        scale, shift = bijector.scale, bijector.loc
        return constraints.greater_than(shift - scale / bijector.concentration)
    if name == "SoftmaxCentered":
        return constraints.simplex
    if name == "Chain":
        # tfp applies bijectors last-to-first; a shift of a positive image
        # is a half-line, otherwise take the outermost bijector's codomain
        outer, rest = bijector.bijectors[0], bijector.bijectors[1:]
        if type(outer).__name__ == "Shift" and rest:
            inner = _codomain_of(tfb.Chain(rest) if len(rest) > 1 else rest[0])
            if inner is constraints.positive:
                return constraints.greater_than(outer.shift)
        return _codomain_of(outer)
    if name == "Shift":
        return constraints.real
    if name in ("FillScaleTriL", "ScaleTriL"):
        return constraints.lower_cholesky
    if name == "CorrelationCholesky":
        return constraints.corr_cholesky
    if name == "Ordered" or name == "Invert" and type(
        bijector.bijector
    ).__name__ == "Ordered":
        return constraints.ordered_vector
    return BijectorConstraint(bijector)


class BijectorConstraint(constraints.Constraint):
    """A constraint defined by the codomain of a TFP bijector."""

    def __init__(self, bijector):
        self.bijector = bijector

    @property
    def event_dim(self):
        return self.bijector.forward_min_event_ndims

    def __call__(self, x):
        inv = self.bijector.inverse(x)
        batch = jnp.shape(x)[: jnp.ndim(x) - self.event_dim]
        return jnp.isfinite(inv).reshape(batch + (-1,)).all(-1)

    def feasible_like(self, prototype):
        return self.bijector.forward(jnp.zeros_like(prototype))

    def tree_flatten(self):
        return (), self.bijector

    @classmethod
    def tree_unflatten(cls, bijector, _):
        return cls(bijector)


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
        return _codomain_of(self.bijector)

    def __call__(self, x):
        return self.bijector.forward(x)

    def _inverse(self, y):
        return self.bijector.inverse(y)

    def log_abs_det_jacobian(self, x, y, intermediates=None):
        return self.bijector.forward_log_det_jacobian(
            x, self.bijector.forward_min_event_ndims
        )

    def forward_shape(self, shape):
        out = self.bijector.forward_event_shape(shape)
        return tuple(out)

    def inverse_shape(self, shape):
        out = self.bijector.inverse_event_shape(shape)
        return tuple(out)

    def tree_flatten(self):
        return (), self.bijector

    @classmethod
    def tree_unflatten(cls, bijector, _):
        return cls(bijector)


@biject_to.register(BijectorConstraint)
def _transform_to_bijector_constraint(constraint):
    return BijectorTransform(constraint.bijector)


class TFPDistribution(Distribution):
    """Adapter exposing a tfp-on-jax distribution through the numpyro_tpu
    Distribution interface.  ``TFPDistribution[tfd.Normal](0., 1.)``
    returns an instance whose extra attributes forward to the wrapped
    object, so tfp-specific methods (quantile, entropy, ...) stay usable.
    """

    _tfd_class = None

    def __class_getitem__(cls, tfd_class):
        return type(
            f"TFP{tfd_class.__name__}", (cls,), {"_tfd_class": tfd_class}
        )

    def __init__(self, *args, **kwargs):
        self.tfp_dist = type(self)._tfd_class(*args, **kwargs)
        super().__init__(
            tuple(self.tfp_dist.batch_shape), tuple(self.tfp_dist.event_shape)
        )

    def __getattr__(self, name):
        # forward unknown attributes (parameters, tfp methods) to the
        # wrapped distribution; raise normally for dunder lookups
        if name.startswith("__") or name == "tfp_dist":
            raise AttributeError(name)
        return getattr(self.tfp_dist, name)

    @property
    def has_rsample(self):
        return getattr(self.tfp_dist, "reparameterization_type", None) is not None and (
            self.tfp_dist.reparameterization_type
            == tfd.FULLY_REPARAMETERIZED
        )

    def sample(self, key, sample_shape=()):
        return self.tfp_dist.sample(sample_shape=sample_shape, seed=key)

    def rsample(self, key, sample_shape=()):
        if not self.has_rsample:
            raise NotImplementedError
        return self.sample(key, sample_shape)

    def log_prob(self, value):
        return self.tfp_dist.log_prob(value)

    def cdf(self, value):
        return self.tfp_dist.cdf(value)

    def icdf(self, q):
        return self.tfp_dist.quantile(q)

    @property
    def mean(self):
        return self.tfp_dist.mean()

    @property
    def variance(self):
        return self.tfp_dist.variance()

    @property
    def support(self):
        bij = self.tfp_dist.experimental_default_event_space_bijector()
        if bij is None:  # discrete distributions expose no bijector
            return None
        return _codomain_of(bij)

    @property
    def is_discrete(self):
        return self.support is None

    def enumerate_support(self, expand=True):
        if not isinstance(
            self.tfp_dist, (tfd.Bernoulli, tfd.Categorical, tfd.OneHotCategorical)
        ):
            raise NotImplementedError
        if isinstance(self.tfp_dist, tfd.Bernoulli):
            n = 2
        else:
            n = self.tfp_dist.num_categories
        values = jnp.arange(n).reshape((n,) + (1,) * len(self.batch_shape))
        if isinstance(self.tfp_dist, tfd.OneHotCategorical):
            values = jnp.eye(n).reshape(
                (n,) + (1,) * len(self.batch_shape) + (n,)
            )
        if expand:
            values = jnp.broadcast_to(
                values, values.shape[:1] + self.batch_shape + self.event_shape
            )
        return values

    def tree_flatten(self):
        params = dict(self.tfp_dist.parameters)
        keys = sorted(
            k for k, v in params.items()
            if isinstance(v, (jnp.ndarray, np.ndarray, float, int))
        )
        aux = {k: v for k, v in params.items() if k not in keys}
        return tuple(params[k] for k in keys), (type(self), tuple(keys), aux)

    @classmethod
    def tree_unflatten(cls, aux_data, children):
        klass, keys, aux = aux_data
        params = dict(zip(keys, children))
        params.update(aux)
        return klass(**params)


def __getattr__(name):
    """Generate ``TFPDistribution[tfd.<name>]`` wrappers on demand."""
    if name.startswith("_"):
        raise AttributeError(name)
    base = name[3:] if name.startswith("TFP") else name
    tfd_class = getattr(tfd, base, None)
    if tfd_class is None or not isinstance(tfd_class, type):
        raise AttributeError(name)
    wrapper = TFPDistribution[tfd_class]
    globals()[name] = wrapper
    return wrapper


__all__ = [
    "BijectorConstraint",
    "BijectorTransform",
    "TFPDistribution",
]
