"""Automatic guide generation for SVI/ADVI.

Fresh implementation of the autoguide family of numpyro/infer/autoguide.py:
AutoNormal, AutoDelta, AutoContinuous (packed-latent base), AutoDiagonalNormal,
AutoMultivariateNormal, AutoLowRankMultivariateNormal, AutoLaplaceApproximation,
AutoGuideList.

Chain/particle-massive note: every guide's ``sample_posterior`` vmaps over a
sample axis inside one program; the packed latent of AutoContinuous is a flat
(D,) vector so ELBO particles batch as (P, D) matmuls on the MXU.
"""

from __future__ import annotations

import warnings
from abc import ABC, abstractmethod
from contextlib import ExitStack
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import grad, hessian, random, vmap
from jax.flatten_util import ravel_pytree

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu import handlers
from numpyro_tpu.distributions import constraints
from numpyro_tpu.distributions.transforms import (
    AffineTransform,
    ComposeTransform,
    IndependentTransform,
    LowerCholeskyAffine,
    biject_to,
)
from numpyro_tpu.distributions.util import sum_rightmost
from numpyro_tpu.infer.initialization import init_to_median, init_to_uniform
from numpyro_tpu.infer import util as infer_util
from numpyro_tpu.util import find_stack_level, not_jax_tracer

__all__ = [
    "AutoBatchedLowRankMultivariateNormal",
    "AutoBatchedMultivariateNormal",
    "AutoBNAFNormal",
    "AutoDAIS",
    "AutoContinuous",
    "AutoDelta",
    "AutoDiagonalNormal",
    "AutoGuide",
    "AutoGuideList",
    "AutoIAFNormal",
    "AutoLaplaceApproximation",
    "AutoLowRankMultivariateNormal",
    "AutoMultivariateNormal",
    "AutoNormal",
    "AutoSemiDAIS",
    "AutoSurrogateLikelihoodDAIS",
]


class AutoGuide(ABC):
    """Base: traces the model once (prototype), recreates its plates, and
    generates guide sample statements (reference: autoguide.py:73-223)."""

    def __init__(
        self,
        model,
        *,
        prefix="auto",
        init_loc_fn=init_to_uniform,
        create_plates=None,
    ):
        self.model = model
        self.prefix = prefix
        self.init_loc_fn = init_loc_fn
        self.create_plates = create_plates
        self.prototype_trace = None
        self._prototype_frames = {}
        self._prototype_frame_full_sizes = {}

    def _create_plates(self, *args, **kwargs):
        # NB: returned fresh each call and NOT stored on self — plate
        # objects hold their subsample indices, and retaining them would
        # leak tracers out of a surrounding jit/scan trace (e.g. SVI.run's
        # fused update loop under JAX_CHECK_TRACER_LEAKS)
        if self.create_plates is None:
            plates = {}
        else:
            created = self.create_plates(*args, **kwargs)
            if isinstance(created, numpyro_tpu.plate):
                created = [created]
            assert all(
                isinstance(p, numpyro_tpu.plate) for p in created
            ), "create_plates() returned a non-plate"
            plates = {p.name: p for p in created}
        for name, frame in sorted(self._prototype_frames.items()):
            if name not in plates:
                full_size = self._prototype_frame_full_sizes[name]
                plates[name] = numpyro_tpu.plate(
                    name, full_size, dim=frame.dim,
                    subsample_size=frame.subsample_size if frame.subsample_size != full_size else None,
                )
        return plates

    @abstractmethod
    def __call__(self, *args, **kwargs):
        raise NotImplementedError

    @abstractmethod
    def sample_posterior(self, rng_key, params, *args, sample_shape=(), **kwargs):
        raise NotImplementedError

    def _setup_prototype(self, *args, **kwargs):
        rng_key = numpyro_tpu.prng_key()
        if rng_key is None:
            rng_key = random.PRNGKey(0)
        with handlers.block():
            (
                init_params,
                self._potential_fn,
                postprocess_fn,
                self.prototype_trace,
            ) = infer_util.initialize_model(
                rng_key,
                self.model,
                init_strategy=self.init_loc_fn,
                dynamic_args=False,
                model_args=args,
                model_kwargs=kwargs,
                validate_grad=False,
            )
        self._init_locs = init_params[0]

        self._prototype_frames = {}
        self._prototype_plate_sizes = {}
        self._prototype_frame_full_sizes = {}
        for name, site in self.prototype_trace.items():
            if site["type"] == "sample":
                if not site["is_observed"] and site["fn"].support.is_discrete:
                    warnings.warn(
                        f"Model has discrete latent site {name}; autoguides "
                        "marginalize nothing — consider DiscreteHMCGibbs or "
                        "TraceEnum-style inference.",
                        stacklevel=2,
                    )
                for frame in site["cond_indep_stack"]:
                    self._prototype_frames[frame.name] = frame
                    self._prototype_frame_full_sizes[frame.name] = frame.size
            elif site["type"] == "plate":
                self._prototype_frame_full_sizes[name] = site["args"][0]

    def median(self, params):
        raise NotImplementedError

    def quantiles(self, params, quantiles):
        raise NotImplementedError


class AutoGuideList(AutoGuide):
    """Container composing several part-guides over disjoint site sets
    (reference: autoguide.py:226)."""

    def __init__(self, model, *, prefix="auto", create_plates=None):
        self._guides = []
        super().__init__(model, prefix=prefix, create_plates=create_plates)

    def append(self, part):
        self._guides.append(part)

    def __call__(self, *args, **kwargs):
        if self.prototype_trace is None:
            self._setup_prototype(*args, **kwargs)
        result = {}
        for part in self._guides:
            result.update(part(*args, **kwargs))
        return result

    def __getitem__(self, key):
        return self._guides[key]

    def __len__(self):
        return len(self._guides)

    def __iter__(self):
        yield from self._guides

    def sample_posterior(self, rng_key, params, *args, sample_shape=(), **kwargs):
        result = {}
        for part in self._guides:
            rng_key, key = random.split(rng_key)
            result.update(
                part.sample_posterior(
                    key, params, *args, sample_shape=sample_shape, **kwargs
                )
            )
        return result

    def median(self, params):
        result = {}
        for part in self._guides:
            result.update(part.median(params))
        return result

    def quantiles(self, params, quantiles):
        result = {}
        for part in self._guides:
            result.update(part.quantiles(params, quantiles))
        return result


class AutoNormal(AutoGuide):
    """Per-site mean-field Normal in unconstrained space (reference:
    autoguide.py:342)."""

    scale_constraint = constraints.softplus_positive

    def __init__(
        self,
        model,
        *,
        prefix="auto",
        init_loc_fn=init_to_uniform,
        init_scale=0.1,
        create_plates=None,
    ):
        self._init_scale = init_scale
        self._event_dims = {}
        super().__init__(
            model, prefix=prefix, init_loc_fn=init_loc_fn, create_plates=create_plates
        )

    def _setup_prototype(self, *args, **kwargs):
        super()._setup_prototype(*args, **kwargs)
        for name, site in self.prototype_trace.items():
            if (
                site["type"] != "sample"
                or site["is_observed"]
                or site["fn"].support.is_discrete
            ):
                continue
            event_dim = (
                site["fn"].event_dim
                + jnp.ndim(self._init_locs[name])
                - jnp.ndim(site["value"])
            )
            self._event_dims[name] = event_dim

    def __call__(self, *args, **kwargs):
        if self.prototype_trace is None:
            self._setup_prototype(*args, **kwargs)

        plates = self._create_plates(*args, **kwargs)
        result = {}
        for name, site in self.prototype_trace.items():
            if (
                site["type"] != "sample"
                or site["is_observed"]
                or site["fn"].support.is_discrete
            ):
                continue
            event_dim = self._event_dims[name]
            init_loc = self._init_locs[name]
            with ExitStack() as stack:
                for frame in site["cond_indep_stack"]:
                    stack.enter_context(plates[frame.name])

                site_loc = numpyro_tpu.param(
                    f"{self.prefix}_{name}_loc", init_loc, event_dim=event_dim
                )
                site_scale = numpyro_tpu.param(
                    f"{self.prefix}_{name}_scale",
                    jnp.full(jnp.shape(init_loc), self._init_scale),
                    constraint=self.scale_constraint,
                    event_dim=event_dim,
                )

                site_fn = dist.Normal(site_loc, site_scale).to_event(event_dim)
                if site["fn"].support is constraints.real or (
                    isinstance(site["fn"].support, constraints.independent)
                    and isinstance(
                        site["fn"].support.base_constraint, type(constraints.real)
                    )
                ):
                    result[name] = numpyro_tpu.sample(name, site_fn)
                else:
                    with handlers.block():
                        transform = biject_to(site["fn"].support)
                    guide_dist = dist.TransformedDistribution(site_fn, transform)
                    result[name] = numpyro_tpu.sample(name, guide_dist)
        return result

    def _constrain(self, latent_samples):
        name = list(latent_samples)[0]
        sample_shape = jnp.shape(latent_samples[name])[
            : jnp.ndim(latent_samples[name]) - jnp.ndim(self._init_locs[name])
        ]
        if sample_shape:
            flat = {
                k: v.reshape((-1,) + jnp.shape(self._init_locs[k]))
                for k, v in latent_samples.items()
            }
            contrained_samples = vmap(self._postprocess_fn)(flat)
            return {
                k: v.reshape(sample_shape + jnp.shape(v)[1:])
                for k, v in contrained_samples.items()
            }
        return self._postprocess_fn(latent_samples)

    def _postprocess_fn(self, latent):
        def substitute_fn(site):
            if site["name"] in latent:
                with handlers.block():
                    return biject_to(site["fn"].support)(latent[site["name"]])

        # transform via site supports
        out = {}
        for name, value in latent.items():
            site = self.prototype_trace[name]
            with handlers.block():
                out[name] = biject_to(site["fn"].support)(value)
        return out

    def sample_posterior(self, rng_key, params, *args, sample_shape=(), **kwargs):
        locs = {
            name: params[f"{self.prefix}_{name}_loc"] for name in self._init_locs
        }
        scales = {
            name: params[f"{self.prefix}_{name}_scale"] for name in self._init_locs
        }
        with handlers.seed(rng_seed=rng_key):
            latent_samples = {}
            for name in locs:
                latent_samples[name] = numpyro_tpu.sample(
                    name + "_latent",
                    dist.Normal(locs[name], scales[name]).to_event(
                        self._event_dims[name]
                    ),
                    sample_shape=sample_shape,
                )
        return self._constrain(latent_samples)

    def median(self, params):
        locs = {
            name: params[f"{self.prefix}_{name}_loc"] for name in self._init_locs
        }
        return self._postprocess_fn(locs)

    def quantiles(self, params, quantiles):
        quantiles = jnp.array(quantiles)
        out = {}
        for name in self._init_locs:
            loc = params[f"{self.prefix}_{name}_loc"]
            scale = params[f"{self.prefix}_{name}_scale"]
            latent = dist.Normal(loc, scale).icdf(
                quantiles.reshape((-1,) + (1,) * jnp.ndim(loc))
            )
            site = self.prototype_trace[name]
            with handlers.block():
                out[name] = biject_to(site["fn"].support)(latent)
        return out


class AutoDelta(AutoGuide):
    """MAP guide: Delta distributions at learned locations (reference:
    autoguide.py:498)."""

    def __init__(
        self,
        model,
        *,
        prefix="auto",
        init_loc_fn=init_to_median,
        create_plates=None,
    ):
        super().__init__(
            model, prefix=prefix, init_loc_fn=init_loc_fn, create_plates=create_plates
        )

    def _setup_prototype(self, *args, **kwargs):
        super()._setup_prototype(*args, **kwargs)
        with handlers.block():
            self._init_locs = {
                k: v
                for k, v in self._postprocess_fn(self._init_locs).items()
                if k in self._init_locs
            }
        self._event_dims = {}
        for name, site in self.prototype_trace.items():
            if (
                site["type"] != "sample"
                or site["is_observed"]
                or site["fn"].support.is_discrete
            ):
                continue
            self._event_dims[name] = site["fn"].event_dim

    def _postprocess_fn(self, latent):
        out = {}
        for name, value in latent.items():
            site = self.prototype_trace[name]
            with handlers.block():
                out[name] = biject_to(site["fn"].support)(value)
        return out

    def __call__(self, *args, **kwargs):
        if self.prototype_trace is None:
            self._setup_prototype(*args, **kwargs)

        plates = self._create_plates(*args, **kwargs)
        result = {}
        for name, site in self.prototype_trace.items():
            if (
                site["type"] != "sample"
                or site["is_observed"]
                or site["fn"].support.is_discrete
            ):
                continue
            event_dim = self._event_dims[name]
            init_loc = self._init_locs[name]
            with ExitStack() as stack:
                for frame in site["cond_indep_stack"]:
                    stack.enter_context(plates[frame.name])
                site_loc = numpyro_tpu.param(
                    f"{self.prefix}_{name}_loc",
                    init_loc,
                    constraint=site["fn"].support,
                    event_dim=event_dim,
                )
                result[name] = numpyro_tpu.sample(
                    name, dist.Delta(site_loc, event_dim=event_dim)
                )
        return result

    def sample_posterior(self, rng_key, params, *args, sample_shape=(), **kwargs):
        locs = {
            name: params[f"{self.prefix}_{name}_loc"] for name in self._init_locs
        }
        latent_samples = {
            k: jnp.broadcast_to(v, sample_shape + jnp.shape(v))
            for k, v in locs.items()
        }
        return latent_samples

    def median(self, params):
        return {
            name: params[f"{self.prefix}_{name}_loc"] for name in self._init_locs
        }


class AutoContinuous(AutoGuide):
    """Base for guides over a single packed unconstrained latent vector
    (reference: autoguide.py:642).  The packed layout is what makes ELBO
    particles MXU-friendly: (P, D) batched matmuls against guide params."""

    def _setup_prototype(self, *args, **kwargs):
        super()._setup_prototype(*args, **kwargs)
        self._init_latent, unpack_latent = ravel_pytree(self._init_locs)
        # this is to match the behavior of Pyro, where we can apply
        # unpack_latent for a batch of samples
        self._unpack_latent = UnpackTransform(unpack_latent)
        self.latent_dim = jnp.size(self._init_latent)
        if self.latent_dim == 0:
            raise RuntimeError(
                f"{type(self).__name__} found no latent variables; "
                "Use an empty guide instead."
            )

    @abstractmethod
    def _get_posterior(self):
        raise NotImplementedError

    def _sample_latent(self, *args, **kwargs):
        sample_shape = kwargs.pop("sample_shape", ())
        posterior = self._get_posterior()
        return numpyro_tpu.sample(
            "_auto_latent", posterior.mask(False), sample_shape=sample_shape
        )

    def __call__(self, *args, **kwargs):
        if self.prototype_trace is None:
            self._setup_prototype(*args, **kwargs)

        latent = self._sample_latent(*args, **kwargs)

        # unpack into constrained sites, with explicit density correction
        result = {}
        for name, unconstrained_value in self._unpack_latent(latent).items():
            site = self.prototype_trace[name]
            with handlers.block():
                transform = biject_to(site["fn"].support)
            value = transform(unconstrained_value)
            event_ndim = site["fn"].event_dim
            if numpyro_tpu.get_mask() is False:
                log_density = 0.0
            else:
                log_density = -transform.log_abs_det_jacobian(
                    unconstrained_value, value
                )
                log_density = sum_rightmost(
                    log_density, jnp.ndim(log_density) - jnp.ndim(value) + event_ndim
                )
            delta_dist = dist.Delta(
                value, log_density=log_density, event_dim=event_ndim
            )
            result[name] = numpyro_tpu.sample(name, delta_dist)

        return result

    def _unpack_and_constrain(self, latent_sample, params):
        def unpack_single_latent(latent):
            unpacked_samples = self._unpack_latent(latent)
            out = {}
            for name, value in unpacked_samples.items():
                site = self.prototype_trace[name]
                with handlers.block():
                    out[name] = biject_to(site["fn"].support)(value)
            return out

        sample_shape = jnp.shape(latent_sample)[:-1]
        if sample_shape:
            latent_sample = jnp.reshape(
                latent_sample, (-1, jnp.shape(latent_sample)[-1])
            )
            unpacked_samples = vmap(unpack_single_latent)(latent_sample)
            return {
                k: jnp.reshape(v, sample_shape + jnp.shape(v)[1:])
                for k, v in unpacked_samples.items()
            }
        return unpack_single_latent(latent_sample)

    def get_base_dist(self):
        """The (fixed) base distribution of the learned transport."""
        raise NotImplementedError

    def get_transform(self, params):
        """Bijection from base to posterior (for NeuTra) — generic: rebuild
        the posterior under ``params`` and compose its transforms
        (reference: autoguide.py:776-794)."""
        posterior = handlers.substitute(self._get_posterior, params)()
        if not isinstance(posterior, dist.TransformedDistribution):
            raise NotImplementedError(
                "posterior is not a transformed distribution"
            )
        transforms = posterior.transforms
        return (
            ComposeTransform(transforms)
            if len(transforms) > 1
            else transforms[0]
        )

    def get_posterior(self, params):
        """Unconstrained posterior over the packed latent."""
        return dist.TransformedDistribution(
            self.get_base_dist(), self.get_transform(params)
        )

    def sample_posterior(self, rng_key, params, *args, sample_shape=(), **kwargs):
        latent_sample = handlers.substitute(
            handlers.seed(self._sample_latent, rng_key), params
        )(sample_shape=sample_shape)
        return self._unpack_and_constrain(latent_sample, params)

    def median(self, params):
        raise NotImplementedError

    def quantiles(self, params, quantiles):
        raise NotImplementedError


class UnpackTransform:
    """Callable wrapping a ravel_pytree unpack fn, usable under vmap."""

    def __init__(self, unpack_fn):
        self.unpack_fn = unpack_fn

    def __call__(self, x):
        batch_shape = x.shape[:-1]
        if batch_shape:
            unpacked = vmap(self.unpack_fn)(x.reshape((-1,) + x.shape[-1:]))
            return jax.tree.map(
                lambda y: jnp.reshape(y, batch_shape + y.shape[1:]), unpacked
            )
        return self.unpack_fn(x)


class AutoDiagonalNormal(AutoContinuous):
    """Diagonal Normal over the packed latent — classic ADVI (reference:
    autoguide.py:1725)."""

    scale_constraint = constraints.softplus_positive

    def __init__(
        self,
        model,
        *,
        prefix="auto",
        init_loc_fn=init_to_uniform,
        init_scale=0.1,
        create_plates=None,
    ):
        if init_scale <= 0:
            raise ValueError("Expected init_scale > 0.")
        self._init_scale = init_scale
        super().__init__(
            model, prefix=prefix, init_loc_fn=init_loc_fn, create_plates=create_plates
        )

    def _get_posterior(self):
        loc = numpyro_tpu.param(f"{self.prefix}_loc", self._init_latent)
        scale = numpyro_tpu.param(
            f"{self.prefix}_scale",
            jnp.full(self.latent_dim, self._init_scale),
            constraint=self.scale_constraint,
        )
        return dist.Normal(loc, scale).to_event(1)

    def get_base_dist(self):
        return dist.Normal(jnp.zeros(self.latent_dim), 1.0).to_event(1)

    def get_transform(self, params):
        loc = params[f"{self.prefix}_loc"]
        scale = params[f"{self.prefix}_scale"]
        return IndependentTransform(AffineTransform(loc, scale), 1)

    def get_posterior(self, params):
        return dist.Normal(
            params[f"{self.prefix}_loc"], params[f"{self.prefix}_scale"]
        ).to_event(1)

    def median(self, params):
        loc = params[f"{self.prefix}_loc"]
        return self._unpack_and_constrain(loc, params)

    def quantiles(self, params, quantiles):
        quantiles = jnp.array(quantiles)[..., None]
        latent = self.get_posterior(params).base_dist.icdf(quantiles)
        return self._unpack_and_constrain(latent, params)


class AutoMultivariateNormal(AutoContinuous):
    """Full-covariance MVN (reference: autoguide.py:1786)."""

    scale_tril_constraint = constraints.scaled_unit_lower_cholesky

    def __init__(
        self,
        model,
        *,
        prefix="auto",
        init_loc_fn=init_to_uniform,
        init_scale=0.1,
        create_plates=None,
    ):
        if init_scale <= 0:
            raise ValueError("Expected init_scale > 0.")
        self._init_scale = init_scale
        super().__init__(
            model, prefix=prefix, init_loc_fn=init_loc_fn, create_plates=create_plates
        )

    def _get_posterior(self):
        loc = numpyro_tpu.param(f"{self.prefix}_loc", self._init_latent)
        scale_tril = numpyro_tpu.param(
            f"{self.prefix}_scale_tril",
            jnp.identity(self.latent_dim) * self._init_scale,
            constraint=self.scale_tril_constraint,
        )
        return dist.MultivariateNormal(loc, scale_tril=scale_tril)

    def get_base_dist(self):
        return dist.Normal(jnp.zeros(self.latent_dim), 1.0).to_event(1)

    def get_transform(self, params):
        loc = params[f"{self.prefix}_loc"]
        scale_tril = params[f"{self.prefix}_scale_tril"]
        return LowerCholeskyAffine(loc, scale_tril)

    def get_posterior(self, params):
        return dist.MultivariateNormal(
            params[f"{self.prefix}_loc"],
            scale_tril=params[f"{self.prefix}_scale_tril"],
        )

    def median(self, params):
        loc = params[f"{self.prefix}_loc"]
        return self._unpack_and_constrain(loc, params)

    def quantiles(self, params, quantiles):
        quantiles = jnp.array(quantiles)[..., None]
        loc = params[f"{self.prefix}_loc"]
        scale = jnp.linalg.norm(params[f"{self.prefix}_scale_tril"], axis=-1)
        latent = dist.Normal(loc, scale).icdf(quantiles)
        return self._unpack_and_constrain(latent, params)


class AutoLowRankMultivariateNormal(AutoContinuous):
    """Low-rank-plus-diagonal MVN (reference: autoguide.py:1962)."""

    scale_constraint = constraints.softplus_positive

    def __init__(
        self,
        model,
        *,
        prefix="auto",
        init_loc_fn=init_to_uniform,
        init_scale=0.1,
        rank=None,
        create_plates=None,
    ):
        if init_scale <= 0:
            raise ValueError("Expected init_scale > 0.")
        self._init_scale = init_scale
        self.rank = rank
        super().__init__(
            model, prefix=prefix, init_loc_fn=init_loc_fn, create_plates=create_plates
        )

    def _get_posterior(self, *args, **kwargs):
        rank = int(round(self.latent_dim**0.5)) if self.rank is None else self.rank
        loc = numpyro_tpu.param(f"{self.prefix}_loc", self._init_latent)
        cov_factor = numpyro_tpu.param(
            f"{self.prefix}_cov_factor", jnp.zeros((self.latent_dim, rank))
        )
        scale = numpyro_tpu.param(
            f"{self.prefix}_scale",
            jnp.full(self.latent_dim, self._init_scale),
            constraint=self.scale_constraint,
        )
        cov_diag = scale * scale
        cov_factor = cov_factor * scale[..., None]
        return dist.LowRankMultivariateNormal(loc, cov_factor, cov_diag)

    def get_base_dist(self):
        return dist.Normal(jnp.zeros(self.latent_dim), 1.0).to_event(1)

    def get_posterior(self, params):
        loc = params[f"{self.prefix}_loc"]
        cov_factor = params[f"{self.prefix}_cov_factor"]
        scale = params[f"{self.prefix}_scale"]
        return dist.LowRankMultivariateNormal(
            loc, cov_factor * scale[..., None], scale * scale
        )

    def median(self, params):
        loc = params[f"{self.prefix}_loc"]
        return self._unpack_and_constrain(loc, params)

    def quantiles(self, params, quantiles):
        quantiles = jnp.array(quantiles)[..., None]
        posterior = self.get_posterior(params)
        latent = dist.Normal(
            posterior.loc, jnp.sqrt(posterior.variance)
        ).icdf(quantiles)
        return self._unpack_and_constrain(latent, params)


class AutoLaplaceApproximation(AutoContinuous):
    """Delta-fit then Gaussian at the MAP with covariance from the Hessian
    of the negative log joint (reference: autoguide.py:2099)."""

    def __init__(
        self,
        model,
        *,
        prefix="auto",
        init_loc_fn=init_to_uniform,
        create_plates=None,
        hessian_fn=None,
    ):
        self._hessian_fn = (
            hessian_fn if hessian_fn is not None else (lambda f, x: hessian(f)(x))
        )
        super().__init__(
            model, prefix=prefix, init_loc_fn=init_loc_fn, create_plates=create_plates
        )

    def _setup_prototype(self, *args, **kwargs):
        super()._setup_prototype(*args, **kwargs)
        self._args = args
        self._kwargs = kwargs

    def _get_posterior(self, *args, **kwargs):
        # sample from Delta guide centered at the MAP estimate
        loc = numpyro_tpu.param(f"{self.prefix}_loc", self._init_latent)
        return dist.Delta(loc, event_dim=1)

    def get_base_dist(self):
        return dist.Normal(jnp.zeros(self.latent_dim), 1.0).to_event(1)

    def _loss_fn(self, z):
        params = self._unpack_latent(z)
        return self._potential_fn(params)

    def get_posterior(self, params):
        """Gaussian posterior using the Hessian at the fitted loc."""
        loc = params[f"{self.prefix}_loc"]
        precision = self._hessian_fn(self._loss_fn, loc)
        scale_tril = jnp.linalg.cholesky(jnp.linalg.inv(precision))
        if not_jax_tracer(scale_tril):
            if np.any(np.isnan(np.asarray(scale_tril))):
                warnings.warn(
                    "Hessian of log posterior at the MAP point is singular. "
                    "Posterior samples from AutoLaplaceApproximation will be "
                    "constant (equal to the MAP point).",
                    stacklevel=find_stack_level(),
                )
        scale_tril = jnp.where(jnp.isnan(scale_tril), 0.0, scale_tril)
        return dist.MultivariateNormal(loc, scale_tril=scale_tril)

    def sample_posterior(self, rng_key, params, *args, sample_shape=(), **kwargs):
        latent_sample = self.get_posterior(params).sample(rng_key, sample_shape)
        return self._unpack_and_constrain(latent_sample, params)

    def median(self, params):
        loc = params[f"{self.prefix}_loc"]
        return self._unpack_and_constrain(loc, params)

    def quantiles(self, params, quantiles):
        quantiles = jnp.array(quantiles)[..., None]
        posterior = self.get_posterior(params)
        latent = dist.Normal(
            posterior.loc, jnp.sqrt(posterior.variance)
        ).icdf(quantiles)
        return self._unpack_and_constrain(latent, params)


class AutoIAFNormal(AutoContinuous):
    """Diagonal-Normal base pushed through a stack of Inverse Autoregressive
    Flows over the packed latent (reference: autoguide.py:2202; Kingma et
    al. 2016).  The flow matmuls batch over ELBO particles on the MXU."""

    def __init__(
        self,
        model,
        *,
        prefix="auto",
        init_loc_fn=None,
        num_flows=3,
        hidden_dims=None,
        skip_connections=False,
        nonlinearity=None,
    ):
        from jax.example_libraries import stax

        self.num_flows = num_flows
        self._hidden_dims = hidden_dims
        self._skip_connections = skip_connections
        self._nonlinearity = nonlinearity if nonlinearity is not None else stax.Elu
        if init_loc_fn is None:
            init_loc_fn = init_to_uniform
        super().__init__(model, prefix=prefix, init_loc_fn=init_loc_fn)

    def _get_posterior(self):
        from numpyro_tpu.distributions.flows import InverseAutoregressiveTransform
        from numpyro_tpu.distributions.transforms import PermuteTransform
        from numpyro_tpu.nn import AutoregressiveNN

        if self.latent_dim == 1:
            raise ValueError(
                "latent dim = 1. Consider using AutoDiagonalNormal instead"
            )
        hidden_dims = (
            [self.latent_dim, self.latent_dim]
            if self._hidden_dims is None
            else self._hidden_dims
        )
        flows = []
        for i in range(self.num_flows):
            if i > 0:
                flows.append(
                    PermuteTransform(jnp.arange(self.latent_dim)[::-1])
                )
            arn = AutoregressiveNN(
                self.latent_dim,
                hidden_dims,
                permutation=jnp.arange(self.latent_dim),
                skip_connections=self._skip_connections,
                nonlinearity=self._nonlinearity,
            )
            arnn = numpyro_tpu.module(
                f"{self.prefix}_arn__{i}", arn, (self.latent_dim,)
            )
            flows.append(InverseAutoregressiveTransform(arnn))
        return dist.TransformedDistribution(self.get_base_dist(), flows)

    def get_base_dist(self):
        return dist.Normal(jnp.zeros(self.latent_dim), 1).to_event(1)


class AutoBNAFNormal(AutoContinuous):
    """Diagonal-Normal base through a Block Neural Autoregressive Flow
    (reference: autoguide.py:2280; De Cao et al.)."""

    def __init__(
        self,
        model,
        *,
        prefix="auto",
        init_loc_fn=None,
        num_flows=1,
        hidden_factors=[8, 8],
    ):
        self.num_flows = num_flows
        self._hidden_factors = hidden_factors
        if init_loc_fn is None:
            init_loc_fn = init_to_uniform
        super().__init__(model, prefix=prefix, init_loc_fn=init_loc_fn)

    def _get_posterior(self):
        from numpyro_tpu.distributions.flows import (
            BlockNeuralAutoregressiveTransform,
        )
        from numpyro_tpu.distributions.transforms import PermuteTransform
        from numpyro_tpu.nn import BlockNeuralAutoregressiveNN

        if self.latent_dim == 1:
            raise ValueError(
                "latent dim = 1. Consider using AutoDiagonalNormal instead"
            )
        flows = []
        for i in range(self.num_flows):
            if i > 0:
                flows.append(
                    PermuteTransform(jnp.arange(self.latent_dim)[::-1])
                )
            residual = "gated" if i < (self.num_flows - 1) else None
            arn = BlockNeuralAutoregressiveNN(
                self.latent_dim, self._hidden_factors, residual
            )
            arnn = numpyro_tpu.module(
                f"{self.prefix}_arn__{i}", arn, (self.latent_dim,)
            )
            flows.append(BlockNeuralAutoregressiveTransform(arnn))
        return dist.TransformedDistribution(self.get_base_dist(), flows)

    def get_base_dist(self):
        return dist.Normal(jnp.zeros(self.latent_dim), 1).to_event(1)


class AutoDAIS(AutoContinuous):
    """Differentiable Annealed Importance Sampling guide (Geffner & Domke;
    Zhang et al.) — uncorrected-HMC annealing from a learnable Normal base to
    the posterior, all inside one ``lax.scan``
    (reference: autoguide.py:815)."""

    def __init__(
        self,
        model,
        *,
        K=4,
        base_dist="diagonal",
        eta_init=0.01,
        eta_max=0.1,
        gamma_init=0.9,
        prefix="auto",
        init_loc_fn=init_to_uniform,
        init_scale=0.1,
    ):
        if K < 1:
            raise ValueError(f"K must satisfy K >= 1 (got K = {K})")
        if base_dist not in ["diagonal", "cholesky"]:
            raise ValueError('base_dist must be one of "diagonal" or "cholesky".')
        if eta_init <= 0.0 or eta_init >= eta_max:
            raise ValueError("eta_init must be positive with eta_init < eta_max.")
        if eta_max <= 0.0:
            raise ValueError("eta_max must be positive.")
        if gamma_init <= 0.0 or gamma_init >= 1.0:
            raise ValueError("gamma_init must be in the open interval (0, 1).")
        if init_scale <= 0.0:
            raise ValueError("init_scale must be positive.")
        self.eta_init = eta_init
        self.eta_max = eta_max
        self.gamma_init = gamma_init
        self.K = K
        self.base_dist = base_dist
        self._init_scale = init_scale
        super().__init__(model, prefix=prefix, init_loc_fn=init_loc_fn)

    def _setup_prototype(self, *args, **kwargs):
        super()._setup_prototype(*args, **kwargs)
        for name, site in self.prototype_trace.items():
            if (
                site["type"] == "plate"
                and isinstance(site["args"][1], int)
                and site["args"][0] > site["args"][1]
            ):
                raise NotImplementedError(
                    "AutoDAIS cannot be used with data subsampling."
                )

    def _get_posterior(self):
        raise NotImplementedError

    def _dais_log_density(self, x):
        x_unpack = self._unpack_latent(x)
        with handlers.block():
            return -self._potential_fn(x_unpack)

    def _sample_latent(self, *args, **kwargs):
        from jax import grad

        log_density = self._dais_log_density

        eta0 = numpyro_tpu.param(
            f"{self.prefix}_eta0",
            self.eta_init,
            constraint=constraints.interval(0, self.eta_max),
        )
        eta_coeff = numpyro_tpu.param(f"{self.prefix}_eta_coeff", 0.0)
        gamma = numpyro_tpu.param(
            f"{self.prefix}_gamma",
            self.gamma_init,
            constraint=constraints.interval(0, 1),
        )
        betas = numpyro_tpu.param(
            f"{self.prefix}_beta_increments",
            jnp.ones(self.K),
            constraint=constraints.positive,
        )
        betas = jnp.cumsum(betas)
        betas = betas / betas[-1]

        mass_matrix = numpyro_tpu.param(
            f"{self.prefix}_mass_matrix",
            jnp.ones(self.latent_dim),
            constraint=constraints.positive,
        )
        inv_mass_matrix = 0.5 / mass_matrix

        init_z_loc = numpyro_tpu.param(f"{self.prefix}_z_0_loc", self._init_latent)
        if self.base_dist == "diagonal":
            init_z_scale = numpyro_tpu.param(
                f"{self.prefix}_z_0_scale",
                jnp.full(self.latent_dim, self._init_scale),
                constraint=constraints.positive,
            )
            base_z_dist = dist.Normal(init_z_loc, init_z_scale).to_event()
        else:
            scale_tril = numpyro_tpu.param(
                f"{self.prefix}_z_0_scale_tril",
                jnp.identity(self.latent_dim) * self._init_scale,
                constraint=constraints.scaled_unit_lower_cholesky,
            )
            base_z_dist = dist.MultivariateNormal(init_z_loc, scale_tril=scale_tril)

        z_0 = numpyro_tpu.sample(
            f"{self.prefix}_z_0", base_z_dist, infer={"is_auxiliary": True}
        )
        momentum_dist = dist.Normal(0, mass_matrix).to_event()
        eps = numpyro_tpu.sample(
            f"{self.prefix}_momentum",
            momentum_dist.expand((self.K,)).to_event().mask(False),
            infer={"is_auxiliary": True},
        )

        def scan_body(carry, eps_beta):
            eps, beta = eps_beta
            eta = eta0 + eta_coeff * beta
            eta = jnp.clip(eta, 0.0, self.eta_max)
            z_prev, v_prev, log_factor = carry
            # leapfrog under the annealed density (1-beta)*base + beta*target
            z_half = z_prev + v_prev * eta * inv_mass_matrix
            q_grad = (1.0 - beta) * grad(base_z_dist.log_prob)(z_half)
            p_grad = beta * grad(log_density)(z_half)
            v_hat = v_prev + eta * (q_grad + p_grad)
            z = z_half + v_hat * eta * inv_mass_matrix
            # partial momentum refresh
            v = gamma * v_hat + jnp.sqrt(1 - gamma**2) * eps
            delta_ke = momentum_dist.log_prob(v_prev) - momentum_dist.log_prob(v_hat)
            log_factor = log_factor + delta_ke
            return (z, v, log_factor), None

        v_0 = eps[-1]  # scan output does not depend on eps[-1]
        (z, _, log_factor), _ = jax.lax.scan(
            scan_body, (z_0, v_0, 0.0), (eps, betas)
        )
        numpyro_tpu.factor(f"{self.prefix}_factor", log_factor)
        return z

    def sample_posterior(self, rng_key, params, *args, sample_shape=(), **kwargs):
        import numpy as np

        def _single_sample(_rng_key):
            latent_sample = handlers.substitute(
                handlers.seed(self._sample_latent, _rng_key), params
            )(sample_shape=())
            return self._unpack_and_constrain(latent_sample, params)

        if sample_shape:
            rng_key = random.split(rng_key, int(np.prod(sample_shape)))
            samples = jax.lax.map(_single_sample, rng_key)
            return jax.tree.map(
                lambda x: jnp.reshape(x, sample_shape + jnp.shape(x)[1:]), samples
            )
        return _single_sample(rng_key)


class AutoSurrogateLikelihoodDAIS(AutoDAIS):
    """DAIS guided by a cheap surrogate likelihood (Jankowiak & Phan) —
    unlike AutoDAIS this composes with data subsampling
    (reference: autoguide.py:1015)."""

    def __init__(
        self,
        model,
        surrogate_model,
        *,
        K=4,
        eta_init=0.01,
        eta_max=0.1,
        gamma_init=0.9,
        prefix="auto",
        base_dist="diagonal",
        init_loc_fn=init_to_uniform,
        init_scale=0.1,
    ):
        super().__init__(
            model,
            K=K,
            eta_init=eta_init,
            eta_max=eta_max,
            gamma_init=gamma_init,
            prefix=prefix,
            init_loc_fn=init_loc_fn,
            init_scale=init_scale,
            base_dist=base_dist,
        )
        self.surrogate_model = surrogate_model

    def _setup_prototype(self, *args, **kwargs):
        AutoContinuous._setup_prototype(self, *args, **kwargs)
        rng_key = numpyro_tpu.prng_key()
        if rng_key is None:
            rng_key = random.PRNGKey(0)
        with handlers.block():
            (
                _,
                self._surrogate_potential_fn,
                _,
                self._surrogate_prototype_trace,
            ) = infer_util.initialize_model(
                rng_key,
                self.surrogate_model,
                init_strategy=self.init_loc_fn,
                dynamic_args=False,
                model_args=(),
                model_kwargs={},
            )

    def _dais_log_density(self, x):
        x_unpack = self._unpack_latent(x)
        with handlers.block():
            return -self._surrogate_potential_fn(x_unpack)

    def _sample_latent(self, *args, **kwargs):
        # register surrogate params so they are optimized jointly
        for name, site in self._surrogate_prototype_trace.items():
            if site["type"] == "param":
                numpyro_tpu.param(name, site["value"], **site["kwargs"])
        return super()._sample_latent(*args, **kwargs)


class AutoBatchedMixin:
    """Infer batch/event split for guides batched over a leading plate
    (reference: autoguide.py:1850)."""

    def __init__(self, *args, **kwargs):
        self._batch_shape = None
        self._event_shape = None
        self.batch_ndim = kwargs.pop("batch_ndim")
        super().__init__(*args, **kwargs)

    def _setup_prototype(self, *args, **kwargs):
        import math

        super()._setup_prototype(*args, **kwargs)
        batch_shape = None
        for site in self.prototype_trace.values():
            if site["type"] == "sample" and not site["is_observed"]:
                shape = site["value"].shape
                if site["value"].ndim < self.batch_ndim + site["fn"].event_dim:
                    raise ValueError(
                        f"Expected {self.batch_ndim} batch dimensions, but "
                        f"site `{site['name']}` only has shape {shape}."
                    )
                shape = shape[: self.batch_ndim]
                if batch_shape is None:
                    batch_shape = shape
                elif shape != batch_shape:
                    raise ValueError("Encountered inconsistent batch shapes.")
        self._batch_shape = batch_shape
        batch_size = math.prod(self._batch_shape)
        if self.latent_dim % batch_size:
            raise RuntimeError(
                f"Incompatible batch shape {batch_shape} (size {batch_size}) "
                f"and latent dims {self.latent_dim}."
            )
        self._event_shape = (self.latent_dim // batch_size,)

    def _get_batched_posterior(self):
        raise NotImplementedError

    def _get_posterior(self):
        from numpyro_tpu.distributions.transforms import ReshapeTransform  # noqa: F401

        return dist.TransformedDistribution(
            self._get_batched_posterior(),
            ReshapeTransform(
                (self.latent_dim,), self._batch_shape + self._event_shape
            ),
        )


class AutoBatchedMultivariateNormal(AutoBatchedMixin, AutoContinuous):
    """Batched full-covariance Normal guide: one MVN per element of a
    leading batch axis (reference: autoguide.py:1909)."""

    scale_tril_constraint = constraints.scaled_unit_lower_cholesky

    def __init__(
        self,
        model,
        *,
        prefix="auto",
        init_loc_fn=init_to_uniform,
        init_scale=0.1,
        batch_ndim=1,
    ):
        if init_scale <= 0:
            raise ValueError(f"Expected init_scale > 0. but got {init_scale}")
        self._init_scale = init_scale
        super().__init__(
            model, prefix=prefix, init_loc_fn=init_loc_fn, batch_ndim=batch_ndim
        )

    def _get_batched_posterior(self):
        init_latent = self._init_latent.reshape(
            self._batch_shape + self._event_shape
        )
        loc = numpyro_tpu.param(f"{self.prefix}_loc", init_latent)
        init_scale = (
            jnp.ones(self._batch_shape + (1, 1))
            * jnp.identity(init_latent.shape[-1])
            * self._init_scale
        )
        scale_tril = numpyro_tpu.param(
            f"{self.prefix}_scale_tril",
            init_scale,
            constraint=self.scale_tril_constraint,
        )
        return dist.MultivariateNormal(loc, scale_tril=scale_tril)

    def median(self, params):
        loc = params[f"{self.prefix}_loc"].reshape((self.latent_dim,))
        return self._unpack_and_constrain(loc, params)


class AutoBatchedLowRankMultivariateNormal(AutoBatchedMixin, AutoContinuous):
    """Batched low-rank + diagonal Normal guide
    (reference: autoguide.py:2040)."""

    scale_constraint = constraints.softplus_positive

    def __init__(
        self,
        model,
        *,
        prefix="auto",
        init_loc_fn=init_to_uniform,
        init_scale=0.1,
        rank=None,
        batch_ndim=1,
    ):
        if init_scale <= 0:
            raise ValueError(f"Expected init_scale > 0. but got {init_scale}")
        self._init_scale = init_scale
        self.rank = rank
        super().__init__(
            model, prefix=prefix, init_loc_fn=init_loc_fn, batch_ndim=batch_ndim
        )

    def _get_batched_posterior(self):
        rank = (
            int(round(self._event_shape[0] ** 0.5))
            if self.rank is None
            else self.rank
        )
        init_latent = self._init_latent.reshape(
            self._batch_shape + self._event_shape
        )
        loc = numpyro_tpu.param(f"{self.prefix}_loc", init_latent)
        cov_factor = numpyro_tpu.param(
            f"{self.prefix}_cov_factor",
            jnp.zeros(self._batch_shape + self._event_shape + (rank,)),
        )
        scale = numpyro_tpu.param(
            f"{self.prefix}_scale",
            jnp.full(self._batch_shape + self._event_shape, self._init_scale),
            constraint=self.scale_constraint,
        )
        cov_diag = scale * scale
        cov_factor = cov_factor * scale[..., None]
        return dist.LowRankMultivariateNormal(loc, cov_factor, cov_diag)

    def median(self, params):
        loc = params[f"{self.prefix}_loc"].reshape((self.latent_dim,))
        return self._unpack_and_constrain(loc, params)


def _flatten_local_dict(values):
    """Concatenate a dict of arrays (sorted by name) into one flat vector,
    returning (flat, shape_dict)."""
    names = sorted(values)
    flat = jnp.concatenate([jnp.reshape(values[n], (-1,)) for n in names])
    shapes = {n: jnp.shape(values[n]) for n in names}
    return flat, shapes


def _unflatten_local_dict(flat, shapes):
    out, pos = {}, 0
    for n in sorted(shapes):
        size = int(np.prod(shapes[n])) if shapes[n] else 1
        out[n] = jnp.reshape(flat[pos : pos + size], shapes[n])
        pos += size
    return out


def _subsample_model(model, *args, **kwargs):
    """Pin plate subsample indices via the ``_subsample_idx`` kwarg
    (reference: autoguide.py:1229)."""
    data = kwargs.pop("_subsample_idx", {})
    with handlers.substitute(data=data):
        return model(*args, **kwargs)


class AutoSemiDAIS(AutoGuide):
    """Semi-parametric DAIS (Jankowiak & Phan): a parametric guide over the
    global latents combined with Differentiable Annealed Importance Sampling
    over the *local* latents inside a subsample plate — the subsample-capable
    sibling of :class:`AutoDAIS` (reference: autoguide.py:1235).

    TPU shape note: the K annealed uncorrected-HMC steps run in one
    ``lax.scan`` over a ``(subsample, D)`` local-latent matrix, so all
    per-datum dynamics are batched elementwise programs with no host loop.

    :param callable model: full model (globals + locals).
    :param callable local_model: the local portion; called with the return
        value of the global model.
    :param global_guide: autoguide for the global latents (or None).
    :param local_guide: optional guide whose samples serve as the DAIS base
        distribution for the locals.
    """

    def __init__(
        self,
        model,
        local_model,
        global_guide=None,
        local_guide=None,
        *,
        prefix="auto",
        K=4,
        eta_init=0.01,
        eta_max=0.1,
        gamma_init=0.9,
        init_scale=0.1,
        subsample_plate=None,
        use_global_dais_params=False,
    ):
        super().__init__(model, prefix=prefix, init_loc_fn=init_to_uniform)
        if K < 1:
            raise ValueError(f"K must satisfy K >= 1 (got K = {K})")
        if eta_init <= 0.0 or eta_init >= eta_max:
            raise ValueError("eta_init must be positive with eta_init < eta_max.")
        if eta_max <= 0.0:
            raise ValueError("eta_max must be positive.")
        if gamma_init <= 0.0 or gamma_init >= 1.0:
            raise ValueError("gamma_init must be in the open interval (0, 1).")
        if init_scale <= 0.0:
            raise ValueError("init_scale must be positive.")
        self.local_model = local_model
        self.global_guide = global_guide
        self.local_guide = local_guide
        self.K = K
        self.eta_init = eta_init
        self.eta_max = eta_max
        self.gamma_init = gamma_init
        self._init_scale = init_scale
        self.subsample_plate = subsample_plate
        self.use_global_dais_params = use_global_dais_params

    def _setup_prototype(self, *args, **kwargs):
        super()._setup_prototype(*args, **kwargs)
        subsample_plates = {
            name: site
            for name, site in self.prototype_trace.items()
            if site["type"] == "plate"
            and isinstance(site["args"][1], int)
            and site["args"][0] > site["args"][1]
        }
        if self.subsample_plate is not None:
            subsample_plates[self.subsample_plate] = self.prototype_trace[
                self.subsample_plate
            ]
        elif not subsample_plates:
            subsample_plates = {
                name: site
                for name, site in self.prototype_trace.items()
                if site["type"] == "plate"
            }
        if len(subsample_plates) != 1:
            raise ValueError(
                "AutoSemiDAIS expects exactly one data (subsample) plate, "
                f"found {len(subsample_plates)}"
            )
        plate_name = next(iter(subsample_plates))
        N, subsample_size = subsample_plates[plate_name]["args"]
        if subsample_size is None:
            subsample_size = N

        # identify local latents (inside the plate) and the axis the plate
        # occupies in each one
        self._local_axes = {}
        plate_dim = None
        for name, site in self.prototype_trace.items():
            if site["type"] == "sample" and not site["is_observed"]:
                for frame in site["cond_indep_stack"]:
                    if frame.name == plate_name:
                        if plate_dim is None:
                            plate_dim = frame.dim
                        self._local_axes[name] = plate_dim - site["fn"].event_dim
                        break
        if not self._local_axes:
            raise RuntimeError(
                f"No local latent variables found in plate `{plate_name}`; "
                "AutoSemiDAIS requires local variables."
            )

        local_init = {
            n: v for n, v in self._init_locs.items() if n in self._local_axes
        }
        one = {
            n: jnp.take(v, 0, axis=self._local_axes[n])
            for n, v in local_init.items()
        }
        _, self._local_shapes = _flatten_local_dict(one)
        self._pack_local = vmap(
            lambda x: _flatten_local_dict(x)[0], in_axes=(self._local_axes,)
        )
        unpack_one = partial(_unflatten_local_dict, shapes=self._local_shapes)
        self._unpack_local = vmap(unpack_one, out_axes=self._local_axes)
        local_flat = self._pack_local(local_init)
        self._local_latent_dim = jnp.size(local_flat) // subsample_size
        self._local_plate = (plate_name, N, subsample_size)

        if self.global_guide is not None:
            with handlers.block():
                local_args = (self.global_guide.model(*args, **kwargs),)
                local_kwargs = {}
        else:
            local_args = args
            local_kwargs = kwargs.copy()
        if self.local_guide is not None:
            with handlers.block(), handlers.trace() as tr:
                self.local_guide(*local_args, **local_kwargs)
            self._proto_local_guide_trace = tr
        with handlers.block(), handlers.trace() as tr:
            self.local_model(*local_args, **local_kwargs)
        self._proto_local_model_trace = tr

    def _get_posterior(self):
        raise NotImplementedError

    def __call__(self, *args, **kwargs):
        if self.prototype_trace is None:
            self._setup_prototype(*args, **kwargs)
        global_latents, local_flat = self._sample_latent(*args, **kwargs)

        result = dict(global_latents)
        _, N, subsample_size = self._local_plate
        for name, unconstrained in self._unpack_local(local_flat).items():
            site = self.prototype_trace[name]
            transform = biject_to(site["fn"].support)
            value = transform(unconstrained)
            event_ndim = site["fn"].event_dim
            if numpyro_tpu.get_mask() is False:
                log_density = 0.0
            else:
                log_density = -transform.log_abs_det_jacobian(unconstrained, value)
                log_density = (N / subsample_size) * sum_rightmost(
                    log_density,
                    jnp.ndim(log_density) - jnp.ndim(value) + event_ndim,
                )
            result[name] = numpyro_tpu.sample(
                name, dist.Delta(value, log_density=log_density, event_dim=event_ndim)
            )
        return result

    def _sample_latent(self, *args, **kwargs):
        kwargs.pop("sample_shape", ())
        if self.global_guide is not None:
            global_latents = self.global_guide(*args, **kwargs)
            with handlers.block(), handlers.substitute(data=global_latents):
                global_outputs = self.global_guide.model(*args, **kwargs)
            local_args = (global_outputs,)
            local_kwargs = {}
        else:
            global_latents = {}
            local_args = args
            local_kwargs = kwargs.copy()

        local_guide_params = {}
        if self.local_guide is not None:
            for name, site in self._proto_local_guide_trace.items():
                if site["type"] == "param":
                    local_guide_params[name] = numpyro_tpu.param(
                        name, site["value"], **site["kwargs"]
                    )
        local_model_params = {}
        for name, site in self._proto_local_model_trace.items():
            if site["type"] == "param":
                local_model_params[name] = numpyro_tpu.param(
                    name, site["value"], **site["kwargs"]
                )

        def local_log_density(x):
            latent = self._unpack_local(x)
            with handlers.block():
                return -infer_util.potential_energy(
                    partial(_subsample_model, self.local_model),
                    local_args,
                    local_kwargs,
                    {**latent, **local_model_params},
                )

        plate_name, N, subsample_size = self._local_plate
        D, K = self._local_latent_dim, self.K
        pfx = self.prefix

        with numpyro_tpu.plate(plate_name, N, subsample_size=subsample_size) as idx:
            if self.use_global_dais_params:
                eta0 = numpyro_tpu.param(
                    f"{pfx}_eta0",
                    self.eta_init,
                    constraint=constraints.interval(0, self.eta_max),
                )
                eta0 = jnp.broadcast_to(eta0, idx.shape)
                eta_coeff = jnp.broadcast_to(
                    numpyro_tpu.param(f"{pfx}_eta_coeff", 0.0), idx.shape
                )
                gamma = jnp.broadcast_to(
                    numpyro_tpu.param(
                        f"{pfx}_gamma",
                        self.gamma_init,
                        constraint=constraints.interval(0, 1),
                    ),
                    idx.shape,
                )
                betas = jnp.broadcast_to(
                    numpyro_tpu.param(
                        f"{pfx}_beta_increments",
                        jnp.ones(K),
                        constraint=constraints.positive,
                    ),
                    idx.shape + (K,),
                )
                mass_matrix = jnp.broadcast_to(
                    numpyro_tpu.param(
                        f"{pfx}_mass_matrix",
                        jnp.ones(D),
                        constraint=constraints.positive,
                    ),
                    idx.shape + (D,),
                )
            else:
                eta0 = numpyro_tpu.param(
                    f"{pfx}_eta0",
                    jnp.full(N, self.eta_init),
                    constraint=constraints.interval(0, self.eta_max),
                    event_dim=0,
                )
                eta_coeff = numpyro_tpu.param(
                    f"{pfx}_eta_coeff", jnp.zeros(N), event_dim=0
                )
                gamma = numpyro_tpu.param(
                    f"{pfx}_gamma",
                    jnp.full(N, self.gamma_init),
                    constraint=constraints.interval(0, 1),
                    event_dim=0,
                )
                betas = numpyro_tpu.param(
                    f"{pfx}_beta_increments",
                    jnp.ones((N, K)),
                    constraint=constraints.positive,
                    event_dim=1,
                )
                mass_matrix = numpyro_tpu.param(
                    f"{pfx}_mass_matrix",
                    jnp.ones((N, D)),
                    constraint=constraints.positive,
                    event_dim=1,
                )

            betas = jnp.cumsum(betas, axis=-1)
            betas = betas / betas[..., -1:]
            inv_mass_matrix = 0.5 / mass_matrix

            local_kwargs["_subsample_idx"] = {plate_name: idx}
            if self.local_guide is not None:
                subsample_guide = partial(_subsample_model, self.local_guide)
                with handlers.block(), handlers.trace() as tr, handlers.substitute(
                    data=local_guide_params
                ):
                    subsample_guide(*local_args, **local_kwargs)
                latent = {
                    name: biject_to(site["fn"].support).inv(site["value"])
                    for name, site in tr.items()
                    if site["type"] == "sample"
                    and not site.get("is_observed", False)
                }
                z_0 = self._pack_local(latent)

                def base_log_prob(z):
                    latent = self._unpack_local(z)
                    with handlers.block():
                        scale = N / subsample_size
                        return (
                            -infer_util.potential_energy(
                                subsample_guide,
                                local_args,
                                local_kwargs,
                                {**local_guide_params, **latent},
                            )
                            / scale
                        )

                # emitted under the plate: broadcast over subsample_size, so
                # pre-divide to keep the total contribution exact
                numpyro_tpu.factor(
                    f"{pfx}_z_0_factor", base_log_prob(z_0) / subsample_size
                )
            else:
                z_0_loc = numpyro_tpu.param(
                    f"{pfx}_z_0_loc", jnp.zeros((N, D)), event_dim=1
                )
                z_0_scale = numpyro_tpu.param(
                    f"{pfx}_z_0_scale",
                    jnp.full((N, D), self._init_scale),
                    constraint=constraints.positive,
                    event_dim=1,
                )
                base_z_dist = dist.Normal(z_0_loc, z_0_scale).to_event(1)
                z_0 = numpyro_tpu.sample(
                    f"{pfx}_z_0", base_z_dist, infer={"is_auxiliary": True}
                )

                def base_log_prob(x):
                    return base_z_dist.log_prob(x).sum()

            momentum_dist = dist.Normal(0, mass_matrix).to_event(1)
            eps = numpyro_tpu.sample(
                f"{pfx}_momentum",
                dist.Normal(0, mass_matrix[..., None])
                .expand([subsample_size, D, K])
                .to_event(2)
                .mask(False),
                infer={"is_auxiliary": True},
            )

            def scan_body(carry, eps_beta):
                eps_k, beta = eps_beta
                eta = jnp.clip(eta0 + eta_coeff * beta, 0.0, self.eta_max)
                z_prev, v_prev, log_factor = carry
                z_half = z_prev + v_prev * eta[:, None] * inv_mass_matrix
                q_grad = (1.0 - beta[:, None]) * grad(base_log_prob)(z_half)
                p_grad = (
                    beta[:, None]
                    * (subsample_size / N)
                    * grad(local_log_density)(z_half)
                )
                v_hat = v_prev + eta[:, None] * (q_grad + p_grad)
                z = z_half + v_hat * eta[:, None] * inv_mass_matrix
                v = gamma[:, None] * v_hat + jnp.sqrt(
                    1 - gamma[:, None] ** 2
                ) * eps_k
                log_factor = (
                    log_factor
                    + momentum_dist.log_prob(v_prev)
                    - momentum_dist.log_prob(v_hat)
                )
                return (z, v, log_factor), None

            v_0 = eps[:, :, -1]  # the scan result does not depend on this slot
            eps_T = jnp.moveaxis(eps, -1, 0)
            (z, _, log_factor), _ = jax.lax.scan(
                scan_body, (z_0, v_0, jnp.zeros(subsample_size)), (eps_T, betas.T)
            )
            numpyro_tpu.factor(f"{pfx}_local_dais_factor", log_factor)
            return global_latents, z

    def sample_posterior(self, rng_key, params, *args, sample_shape=(), **kwargs):
        def _single(_key):
            global_latents, local_flat = handlers.substitute(
                handlers.seed(self._sample_latent, _key), params
            )(*args, **kwargs)
            out = dict(global_latents)
            for name, unconstrained in self._unpack_local(local_flat).items():
                site = self.prototype_trace[name]
                out[name] = biject_to(site["fn"].support)(unconstrained)
            return out

        if sample_shape:
            keys = random.split(rng_key, int(np.prod(sample_shape)))
            samples = jax.lax.map(_single, keys)
            return jax.tree.map(
                lambda x: jnp.reshape(x, sample_shape + jnp.shape(x)[1:]), samples
            )
        return _single(rng_key)
