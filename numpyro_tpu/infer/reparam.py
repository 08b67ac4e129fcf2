"""Reparameterizers — used via the ``reparam`` handler to transform model
geometry (reference surface: numpyro/infer/reparam.py).
"""

from __future__ import annotations

import math
from abc import ABC, abstractmethod

import jax.numpy as jnp

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.distributions import biject_to, constraints

__all__ = [
    "CircularReparam",
    "ExplicitReparam",
    "LocScaleReparam",
    "NeuTraReparam",
    "ProjectedNormalReparam",
    "Reparam",
    "TransformReparam",
]


class Reparam(ABC):
    """Base: called as reparam(name, fn, obs) -> (new_fn, value)."""

    @abstractmethod
    def __call__(self, name, fn, obs):
        return fn, obs

    def _unwrap(self, fn):
        """Unwrap Independent/Expanded wrappers, returning (base_fn, expand_shape, event_dim)."""
        shape = fn.shape()
        event_dim = fn.event_dim
        while isinstance(fn, (dist.Independent, dist.ExpandedDistribution)):
            fn = fn.base_dist
        return fn, shape, event_dim

    def _wrap(self, fn, expand_shape, event_dim):
        """Re-apply Independent/Expanded wrappers."""
        if fn.shape() != expand_shape:
            fn = fn.expand(expand_shape[: len(expand_shape) - fn.event_dim])
        if fn.event_dim < event_dim:
            fn = fn.to_event(event_dim - fn.event_dim)
        assert fn.event_dim == event_dim
        return fn


class LocScaleReparam(Reparam):
    """Decenter a loc-scale distribution: interpolates between centered
    (centered=1) and non-centered (centered=0) parameterizations
    (reference: reparam.py:64)."""

    def __init__(self, centered=None, shape_params=()):
        assert centered is None or (0 <= centered <= 1) if isinstance(
            centered, (int, float)
        ) else True
        self.centered = centered
        self.shape_params = shape_params

    def __call__(self, name, fn, obs):
        assert obs is None, "LocScaleReparam does not support observe statements"
        support = fn.support
        if isinstance(support, constraints.independent):
            support = support.base_constraint
        if support is not constraints.real:
            raise ValueError(
                f"LocScaleReparam only supports real-valued distributions, "
                f"but got site {name} with support {support}."
            )
        centered = self.centered
        if centered is None:
            centered = numpyro_tpu.param(
                f"{name}_centered",
                lambda key: jnp.full(fn.shape(), 0.5),
                constraint=constraints.unit_interval,
            )
        if isinstance(centered, (int, float)) and centered == 1.0:
            return fn, obs
        event_shape = fn.event_shape
        fn, expand_shape, event_dim = self._unwrap(fn)
        params = {k: getattr(fn, k) for k in self.shape_params}
        if isinstance(centered, (int, float)) and centered == 0.0:
            params["loc"] = jnp.zeros_like(fn.loc)
            params["scale"] = jnp.ones_like(fn.scale)
        else:
            params["loc"] = fn.loc * centered
            params["scale"] = fn.scale**centered
        decentered_fn = self._wrap(type(fn)(**params), expand_shape, event_dim)

        # draw decentered noise
        decentered_value = numpyro_tpu.sample(f"{name}_decentered", decentered_fn)

        # recenter
        delta = decentered_value - centered * fn.loc
        value = fn.loc + jnp.power(fn.scale, 1 - centered) * delta
        return None, value


class TransformReparam(Reparam):
    """Reparameterize a TransformedDistribution via its base
    (reference: reparam.py:148)."""

    def __call__(self, name, fn, obs):
        assert obs is None, "TransformReparam does not support observe statements"
        fn, expand_shape, event_dim = self._unwrap(fn)
        assert isinstance(fn, dist.TransformedDistribution)

        # draw the base
        x = numpyro_tpu.sample(f"{name}_base", fn.base_dist)
        # transform
        for t in fn.transforms:
            x = t(x)
        return None, x


class ExplicitReparam(Reparam):
    """Reparameterize through an explicit bijection (reference: reparam.py:359)."""

    def __init__(self, transform):
        self.transform = transform

    def __call__(self, name, fn, obs):
        assert obs is None, "ExplicitReparam does not support observe statements"
        transformed = dist.TransformedDistribution(fn, self.transform.inv)
        x = numpyro_tpu.sample(f"{name}_base", transformed)
        return None, self.transform(x)


class ProjectedNormalReparam(Reparam):
    """Auxiliary-normal reparam of ProjectedNormal (reference: reparam.py:188)."""

    def __call__(self, name, fn, obs):
        assert obs is None, "ProjectedNormalReparam does not support observe statements"
        fn, expand_shape, event_dim = self._unwrap(fn)
        assert isinstance(fn, dist.ProjectedNormal)

        # draw the auxiliary gaussian
        new_fn = dist.Normal(fn.concentration, 1.0).to_event(1)
        x = numpyro_tpu.sample(
            f"{name}_normal",
            self._wrap(new_fn, expand_shape, event_dim),
            infer={"is_auxiliary": True},
        )
        from numpyro_tpu.distributions.util import safe_normalize

        value = safe_normalize(x)
        return None, value


class CircularReparam(Reparam):
    """Map VonMises sites onto the real line (reference: reparam.py:329)."""

    def __call__(self, name, fn, obs):
        support = fn.support
        if isinstance(support, constraints.independent):
            support = support.base_constraint
        assert support is constraints.circular

        value = numpyro_tpu.sample(
            f"{name}_unwrapped",
            dist.ImproperUniform(constraints.real, fn.batch_shape, fn.event_shape),
            obs=obs,
        )
        value = jnp.remainder(value + math.pi, 2 * math.pi) - math.pi

        # simulate the log prob through a factor
        numpyro_tpu.factor(f"{name}_factor", fn.log_prob(value))
        return None, value


class NeuTraReparam(Reparam):
    """Neural-transport reparameterization through a fitted AutoContinuous
    guide (reference: reparam.py:214)."""

    def __init__(self, guide, params):
        self.guide = guide
        self.params = params
        try:
            self.transform = self.guide.get_transform(params)
        except (NotImplementedError, TypeError) as e:
            raise ValueError(
                "NeuTraReparam only supports AutoContinuous guides"
            ) from e
        self._x_unconstrained = {}

    def _reparam_config(self, site):
        if (
            site["name"] in self.guide.prototype_trace
            and site["type"] == "sample"
            and not site["is_observed"]
        ):
            return self

    def reparam(self, fn=None):
        from numpyro_tpu.handlers import reparam as reparam_handler

        return reparam_handler(fn, config=self._reparam_config)

    def __call__(self, name, fn, obs):
        if name not in self.guide.prototype_trace:
            return fn, obs
        assert obs is None, "NeuTraReparam does not support observe statements"

        log_density = 0.0
        if not self._x_unconstrained:  # On first sample site.
            # Sample a shared latent.
            z_unconstrained = numpyro_tpu.sample(
                f"{name}_shared_latent",
                self.guide.get_base_dist().mask(False),
                infer={"is_auxiliary": True},
            )

            # Differentiably transform.
            x_unconstrained = self.transform(z_unconstrained)
            log_density = self.transform.log_abs_det_jacobian(
                z_unconstrained, x_unconstrained
            )
            self._x_unconstrained = self.guide._unpack_latent(x_unconstrained)

        # Extract a single site's value from the shared latent.
        unconstrained_value = self._x_unconstrained.pop(name)
        transform = biject_to(fn.support)
        value = transform(unconstrained_value)
        logdet = transform.log_abs_det_jacobian(unconstrained_value, value)
        from numpyro_tpu.distributions.util import sum_rightmost

        logdet = sum_rightmost(
            logdet, jnp.ndim(logdet) - jnp.ndim(value) + len(fn.event_shape)
        )
        log_density = log_density + fn.log_prob(value) + logdet
        numpyro_tpu.factor(f"{name}_log_prob", log_density)
        return None, value

    def transform_sample(self, latent):
        """Push base-space draws (e.g. `*_shared_latent` MCMC samples)
        through the learned transport; returns constrained site values
        (reference: reparam.py:301)."""
        x_unconstrained = self.transform(latent)
        unpacked = self.guide._unpack_latent(x_unconstrained)
        return {
            name: biject_to(self.guide.prototype_trace[name]["fn"].support)(value)
            for name, value in unpacked.items()
        }
