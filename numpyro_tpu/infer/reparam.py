"""Reparameterizers — used via the ``reparam`` handler to transform model
geometry (reference surface: numpyro/infer/reparam.py).

Each reparameterizer is called as ``reparam(name, fn, obs) -> (new_fn,
value)``: returning ``(None, value)`` replaces the site with a
deterministic value computed from auxiliary sample sites it introduced.
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


def _base_support(fn):
    s = fn.support
    return s.base_constraint if isinstance(s, constraints.independent) else s


def _reject_obs(reparam, obs):
    if obs is not None:
        raise AssertionError(
            f"{type(reparam).__name__} does not support observe statements"
        )


class Reparam(ABC):
    """Base: called as reparam(name, fn, obs) -> (new_fn, value)."""

    @abstractmethod
    def __call__(self, name, fn, obs):
        return fn, obs

    @staticmethod
    def _peel(fn):
        """Strip Independent/Expanded wrappers; returns (base, rewrap)
        where ``rewrap`` restores the original batch/event structure."""
        full_shape, event_dim = fn.shape(), fn.event_dim

        def rewrap(new_fn):
            if new_fn.shape() != full_shape:
                new_fn = new_fn.expand(
                    full_shape[: len(full_shape) - new_fn.event_dim]
                )
            if new_fn.event_dim < event_dim:
                new_fn = new_fn.to_event(event_dim - new_fn.event_dim)
            assert new_fn.event_dim == event_dim
            return new_fn

        base = fn
        while isinstance(base, (dist.Independent, dist.ExpandedDistribution)):
            base = base.base_dist
        return base, rewrap


class LocScaleReparam(Reparam):
    """Decenter a loc-scale family: ``centered`` in [0, 1] interpolates from
    fully non-centered (0) to the original parameterization (1); ``None``
    learns a per-coordinate value as a param site (reference: reparam.py:64).
    """

    def __init__(self, centered=None, shape_params=()):
        if isinstance(centered, (int, float)):
            assert 0 <= centered <= 1
        self.centered = centered
        self.shape_params = shape_params

    def __call__(self, name, fn, obs):
        _reject_obs(self, obs)
        if _base_support(fn) is not constraints.real:
            raise ValueError(
                f"LocScaleReparam only supports real-valued distributions, "
                f"but got site {name} with support {fn.support}."
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

        base, rewrap = self._peel(fn)
        aux_params = {k: getattr(base, k) for k in self.shape_params}
        fully = isinstance(centered, (int, float)) and centered == 0.0
        aux_params["loc"] = (
            jnp.zeros_like(base.loc) if fully else base.loc * centered
        )
        aux_params["scale"] = (
            jnp.ones_like(base.scale) if fully else base.scale**centered
        )
        noise = numpyro_tpu.sample(
            f"{name}_decentered", rewrap(type(base)(**aux_params))
        )
        # invert the partial standardization
        residual = noise - centered * base.loc
        return None, base.loc + base.scale ** (1 - centered) * residual


class TransformReparam(Reparam):
    """Split a TransformedDistribution into a base draw plus deterministic
    pushforward (reference: reparam.py:148)."""

    def __call__(self, name, fn, obs):
        _reject_obs(self, obs)
        base, _ = self._peel(fn)
        assert isinstance(base, dist.TransformedDistribution)
        x = numpyro_tpu.sample(f"{name}_base", base.base_dist)
        for t in base.transforms:
            x = t(x)
        return None, x


class ExplicitReparam(Reparam):
    """Reparameterize through a user-supplied bijection
    (reference: reparam.py:359)."""

    def __init__(self, transform):
        self.transform = transform

    def __call__(self, name, fn, obs):
        _reject_obs(self, obs)
        pulled_back = dist.TransformedDistribution(fn, self.transform.inv)
        x = numpyro_tpu.sample(f"{name}_base", pulled_back)
        return None, self.transform(x)


class ProjectedNormalReparam(Reparam):
    """Auxiliary-normal reparam of ProjectedNormal
    (reference: reparam.py:188)."""

    def __call__(self, name, fn, obs):
        _reject_obs(self, obs)
        base, rewrap = self._peel(fn)
        assert isinstance(base, dist.ProjectedNormal)
        gauss = dist.Normal(base.concentration, 1.0).to_event(1)
        x = numpyro_tpu.sample(
            f"{name}_normal", rewrap(gauss), infer={"is_auxiliary": True}
        )
        from numpyro_tpu.distributions.util import safe_normalize

        return None, safe_normalize(x)


class CircularReparam(Reparam):
    """Map VonMises sites onto the real line; the density enters through an
    explicit factor on the wrapped value (reference: reparam.py:329)."""

    def __call__(self, name, fn, obs):
        assert _base_support(fn) is constraints.circular
        line_value = numpyro_tpu.sample(
            f"{name}_unwrapped",
            dist.ImproperUniform(constraints.real, fn.batch_shape, fn.event_shape),
            obs=obs,
        )
        wrapped = jnp.remainder(line_value + math.pi, 2 * math.pi) - math.pi
        numpyro_tpu.factor(f"{name}_factor", fn.log_prob(wrapped))
        return None, wrapped


class NeuTraReparam(Reparam):
    """Neural-transport reparameterization through a fitted AutoContinuous
    guide: one shared base-space latent is pushed through the learned flow,
    and every model site reads its slice (reference: reparam.py:214)."""

    def __init__(self, guide, params):
        self.guide = guide
        self.params = params
        try:
            self.transform = self.guide.get_transform(params)
        except (NotImplementedError, TypeError) as e:
            raise ValueError(
                "NeuTraReparam only supports AutoContinuous guides"
            ) from e
        self._pending_sites = {}

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
        _reject_obs(self, obs)

        flow_logdet = 0.0
        if not self._pending_sites:
            # first reparameterized site: draw the shared latent and run
            # the transport once; later sites just consume their slice
            z = numpyro_tpu.sample(
                f"{name}_shared_latent",
                self.guide.get_base_dist().mask(False),
                infer={"is_auxiliary": True},
            )
            x = self.transform(z)
            flow_logdet = self.transform.log_abs_det_jacobian(z, x)
            self._pending_sites = self.guide._unpack_latent(x)

        unconstrained = self._pending_sites.pop(name)
        to_support = biject_to(fn.support)
        value = to_support(unconstrained)
        logdet = to_support.log_abs_det_jacobian(unconstrained, value)
        from numpyro_tpu.distributions.util import sum_rightmost

        logdet = sum_rightmost(
            logdet, jnp.ndim(logdet) - jnp.ndim(value) + len(fn.event_shape)
        )
        numpyro_tpu.factor(
            f"{name}_log_prob", flow_logdet + fn.log_prob(value) + logdet
        )
        return None, value

    def transform_sample(self, latent):
        """Push base-space draws (e.g. `*_shared_latent` MCMC samples)
        through the learned transport; returns constrained site values
        (reference: reparam.py:301)."""
        unpacked = self.guide._unpack_latent(self.transform(latent))
        return {
            name: biject_to(self.guide.prototype_trace[name]["fn"].support)(value)
            for name, value in unpacked.items()
        }
