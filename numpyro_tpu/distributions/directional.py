"""Directional distributions (VonMises, ProjectedNormal).

Reference surface: numpyro/distributions/directional.py:80-544.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import lax, random
from jax.scipy.special import erf, i0e, i1e

from . import constraints
from .distribution import Distribution
from .util import promote_shapes, safe_normalize, validate_sample, von_mises_centered

__all__ = ["ProjectedNormal", "VonMises"]


class VonMises(Distribution):
    arg_constraints = {
        "loc": constraints.real,
        "concentration": constraints.positive,
    }
    reparametrized_params = ["loc"]
    support = constraints.circular

    def __init__(self, loc, concentration, *, validate_args=None):
        self.loc, self.concentration = promote_shapes(loc, concentration)
        batch_shape = lax.broadcast_shapes(jnp.shape(concentration), jnp.shape(loc))
        super().__init__(batch_shape=batch_shape, validate_args=validate_args)

    def sample(self, key, sample_shape=()):
        """Best-Fisher rejection sampler, fully batched inside one program."""
        samples = von_mises_centered(
            key,
            self.concentration,
            sample_shape + self.shape(),
            dtype=jnp.result_type(float),
        )
        samples = samples + self.loc  # VM(0, kappa) -> VM(loc, kappa)
        samples = (samples + jnp.pi) % (2.0 * jnp.pi) - jnp.pi
        return samples

    @validate_sample
    def log_prob(self, value):
        return -(
            jnp.log(2 * jnp.pi)
            + jnp.log(i0e(self.concentration))
        ) + self.concentration * (jnp.cos((value - self.loc) % (2 * jnp.pi)) - 1)

    @property
    def mean(self):
        """Circular mean."""
        return jnp.broadcast_to(self.loc, self.batch_shape)

    @property
    def variance(self):
        """Circular variance."""
        return jnp.broadcast_to(
            1.0 - i1e(self.concentration) / i0e(self.concentration),
            self.batch_shape,
        )


class ProjectedNormal(Distribution):
    """Radially-projected isotropic normal on the sphere S^{d-1}; closed-form
    densities for d in {2, 3}."""

    arg_constraints = {"concentration": constraints.real_vector}
    reparametrized_params = ["concentration"]
    support = constraints.sphere

    def __init__(self, concentration, *, validate_args=None):
        assert jnp.ndim(concentration) >= 1
        self.concentration = concentration
        batch_shape = concentration.shape[:-1]
        event_shape = concentration.shape[-1:]
        super().__init__(batch_shape, event_shape, validate_args=validate_args)

    @property
    def mean(self):
        """Mean in the sense of a decision point (not the barycenter)."""
        return safe_normalize(self.concentration)

    @property
    def mode(self):
        return safe_normalize(self.concentration)

    def sample(self, key, sample_shape=()):
        shape = sample_shape + self.batch_shape + self.event_shape
        eps = random.normal(key, shape=shape, dtype=self.concentration.dtype)
        return safe_normalize(self.concentration + eps)

    @validate_sample
    def log_prob(self, value):
        if self._validate_args:
            event_shape = value.shape[-1:]
            if event_shape != self.event_shape:
                raise ValueError(f"Expected event shape {self.event_shape}")
        dim = int(self.concentration.shape[-1])
        if dim == 2:
            return _projected_normal_log_prob_2(self.concentration, value)
        if dim == 3:
            return _projected_normal_log_prob_3(self.concentration, value)
        raise NotImplementedError(
            f"ProjectedNormal.log_prob is implemented only for dim 2 and 3, got {dim}"
        )


def _dot(x, y):
    return (x[..., None, :] @ y[..., None])[..., 0, 0]


def _projected_normal_log_prob_2(concentration, value):
    def _dot(x, y):
        return (x[..., None, :] @ y[..., None])[..., 0, 0]

    # We integrate along a ray, r = x + t u, where x is the concentration and u
    # is the unit value vector
    t = _dot(concentration, value)
    t2 = t * t
    r2 = _dot(concentration, concentration)
    perp_part = r2 - t2

    # This is the log of a definite integral, computed by mathematica:
    # Integrate[x/(E^((x-t)^2/2) Sqrt[2 Pi]), {x, 0, Infinity}]
    # = (t + Sqrt[2/Pi]/E^(t^2/2) + t Erf[t/Sqrt[2]]) / 2
    para_part = jnp.log(
        (jnp.exp(-t2 / 2) * ((2 / math.pi) ** 0.5) + t * (1 + erf(t * 0.5**0.5)))
        / 2
    )
    return para_part - 0.5 * perp_part - jnp.log(2 * math.pi)


def _projected_normal_log_prob_3(concentration, value):
    def _dot(x, y):
        return (x[..., None, :] @ y[..., None])[..., 0, 0]

    t = _dot(concentration, value)
    t2 = t * t
    r2 = _dot(concentration, concentration)
    perp_part = r2 - t2

    # Integrate[x^2/(E^((x-t)^2/2) Sqrt[2 Pi]), {x, 0, Infinity}]
    # = t/E^(t^2/2)/Sqrt[2 Pi] + ((1 + t^2) (1 + Erf[t/Sqrt[2]])) / 2
    para_part = jnp.log(
        t * jnp.exp(-t2 / 2) / (2 * math.pi) ** 0.5
        + (1 + t2) * (1 + erf(t * 0.5**0.5)) / 2
    )
    return para_part - 0.5 * perp_part - 1.5 * jnp.log(2 * math.pi)
