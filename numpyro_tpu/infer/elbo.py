"""ELBO objectives for SVI.

Fresh implementation of the loss surface of numpyro/infer/elbo.py:
Trace_ELBO, TraceMeanField_ELBO, RenyiELBO.  Particle fan-out defaults to
vmap (one fused program); ``vectorize_particles`` may also be a callable
transform (e.g. a shard_map over a ``particles`` mesh axis) for pod-scale
particle parallelism.
"""

from __future__ import annotations

from functools import partial
from operator import itemgetter

import jax
import jax.numpy as jnp
from jax import random, vmap
from jax.lax import stop_gradient
from jax.scipy.special import logsumexp

from numpyro_tpu import handlers
from numpyro_tpu.distributions.kl import kl_divergence
from numpyro_tpu.distributions.util import scale_and_mask, sum_rightmost
from numpyro_tpu.infer.util import (
    _without_rsample_stop_gradient,
    get_importance_trace,
    is_identically_one,
    log_density,
)

__all__ = ["ELBO", "Trace_ELBO", "TraceEnum_ELBO", "TraceGraph_ELBO", "TraceMeanField_ELBO", "RenyiELBO"]


class ELBO:
    """Base class (reference: elbo.py:33-119)."""

    can_infer_discrete = False

    def __init__(self, num_particles=1, vectorize_particles=True):
        self.num_particles = num_particles
        self.vectorize_particles = vectorize_particles

    def _assign_particle_fn(self):
        if callable(self.vectorize_particles):
            return self.vectorize_particles
        elif self.vectorize_particles is True:
            return vmap
        elif self.vectorize_particles is False:
            return jax.lax.map
        raise ValueError("vectorize_particles must be True, False, or a callable")

    def loss(self, rng_key, param_map, model, guide, *args, **kwargs):
        return self.loss_with_mutable_state(
            rng_key, param_map, model, guide, *args, **kwargs
        )["loss"]

    def loss_with_mutable_state(
        self, rng_key, param_map, model, guide, *args, **kwargs
    ):
        raise NotImplementedError


class Trace_ELBO(ELBO):
    """MC estimate of ELBO from joint guide/model traces; fully differentiable
    when all guide sites are reparameterizable (reference: elbo.py:122-274)."""

    def loss_with_mutable_state(
        self, rng_key, param_map, model, guide, *args, **kwargs
    ):
        def single_particle_elbo(rng_key):
            params = param_map.copy()
            model_seed, guide_seed = random.split(rng_key)
            seeded_model = handlers.seed(model, model_seed)
            seeded_guide = handlers.seed(guide, guide_seed)
            guide_log_density, guide_trace = log_density(
                seeded_guide, args, kwargs, param_map
            )
            mutable_params = {
                name: site["value"]
                for name, site in guide_trace.items()
                if site["type"] == "mutable"
            }
            params.update(mutable_params)
            seeded_model = handlers.replay(seeded_model, guide_trace)
            model_log_density, model_trace = log_density(
                seeded_model, args, kwargs, params
            )
            check_model_guide_match(model_trace, guide_trace)
            mutable_params.update(
                {
                    name: site["value"]
                    for name, site in model_trace.items()
                    if site["type"] == "mutable"
                }
            )

            elbo_particle = model_log_density - guide_log_density
            if mutable_params:
                if self.num_particles == 1:
                    return elbo_particle, mutable_params
                else:
                    raise ValueError(
                        "mutable state is currently not supported for multi-particle ELBO"
                    )
            return elbo_particle, None

        if self.num_particles == 1:
            elbo, mutable_state = single_particle_elbo(rng_key)
            return {"loss": -elbo, "mutable_state": mutable_state}
        else:
            rng_keys = random.split(rng_key, self.num_particles)
            particle_fn = self._assign_particle_fn()
            elbos, mutable_state = particle_fn(single_particle_elbo)(rng_keys)
            return {"loss": -jnp.mean(elbos), "mutable_state": mutable_state}


def check_model_guide_match(model_trace, guide_trace):
    # light structural check; the reference's full check lives in util
    for name, site in guide_trace.items():
        if site["type"] == "sample" and not site.get("is_observed", False):
            if name in model_trace and model_trace[name]["type"] == "sample":
                guide_shape = jnp.shape(site["value"])
                model_shape = jnp.shape(model_trace[name]["value"])
                if guide_shape != model_shape:
                    raise ValueError(
                        f"Model and guide shapes disagree at site: '{name}': "
                        f"{model_shape} vs {guide_shape}"
                    )


class TraceMeanField_ELBO(ELBO):
    """Uses analytic KL where registered, MC elsewhere; requires mean-field
    dependency structure (reference: elbo.py:315)."""

    def loss_with_mutable_state(
        self, rng_key, param_map, model, guide, *args, **kwargs
    ):
        def single_particle_elbo(rng_key):
            params = param_map.copy()
            model_seed, guide_seed = random.split(rng_key)
            seeded_model = handlers.seed(model, model_seed)
            seeded_guide = handlers.seed(guide, guide_seed)
            subs_guide = handlers.substitute(seeded_guide, data=param_map)
            with _without_rsample_stop_gradient():
                guide_trace = handlers.trace(subs_guide).get_trace(*args, **kwargs)
            mutable_params = {
                name: site["value"]
                for name, site in guide_trace.items()
                if site["type"] == "mutable"
            }
            params.update(mutable_params)
            subs_model = handlers.substitute(
                handlers.replay(seeded_model, guide_trace), data=params
            )
            model_trace = handlers.trace(subs_model).get_trace(*args, **kwargs)
            mutable_params.update(
                {
                    name: site["value"]
                    for name, site in model_trace.items()
                    if site["type"] == "mutable"
                }
            )
            check_model_guide_match(model_trace, guide_trace)

            elbo_particle = 0
            for name, model_site in model_trace.items():
                if model_site["type"] == "sample":
                    if model_site["is_observed"]:
                        log_prob = model_site["fn"].log_prob(model_site["value"])
                        log_prob = scale_and_mask(log_prob, scale=model_site["scale"])
                        elbo_particle = elbo_particle + jnp.sum(log_prob)
                    else:
                        guide_site = guide_trace[name]
                        try:
                            kl_qp = kl_divergence(guide_site["fn"], model_site["fn"])
                            kl_qp = scale_and_mask(kl_qp, scale=guide_site["scale"])
                            elbo_particle = elbo_particle - jnp.sum(kl_qp)
                        except NotImplementedError:
                            model_log_prob = model_site["fn"].log_prob(
                                model_site["value"]
                            )
                            guide_log_prob = guide_site["fn"].log_prob(
                                guide_site["value"]
                            )
                            model_log_prob = scale_and_mask(
                                model_log_prob, scale=model_site["scale"]
                            )
                            guide_log_prob = scale_and_mask(
                                guide_log_prob, scale=guide_site["scale"]
                            )
                            elbo_particle = elbo_particle + jnp.sum(
                                model_log_prob
                            ) - jnp.sum(guide_log_prob)

            if mutable_params:
                if self.num_particles == 1:
                    return elbo_particle, mutable_params
                raise ValueError(
                    "mutable state is currently not supported for multi-particle ELBO"
                )
            return elbo_particle, None

        if self.num_particles == 1:
            elbo, mutable_state = single_particle_elbo(rng_key)
            return {"loss": -elbo, "mutable_state": mutable_state}
        else:
            rng_keys = random.split(rng_key, self.num_particles)
            particle_fn = self._assign_particle_fn()
            elbos, mutable_state = particle_fn(single_particle_elbo)(rng_keys)
            return {"loss": -jnp.mean(elbos), "mutable_state": mutable_state}


class RenyiELBO(ELBO):
    """Renyi alpha-divergence bound (reference: elbo.py:430)."""

    def __init__(self, alpha=0.0, num_particles=2):
        if alpha == 1:
            raise ValueError(
                "The order alpha should not be equal to 1. Please use Trace_ELBO."
            )
        self.alpha = alpha
        super().__init__(num_particles=num_particles)

    def loss_with_mutable_state(
        self, rng_key, param_map, model, guide, *args, **kwargs
    ):
        def single_particle_elbo(rng_key):
            model_seed, guide_seed = random.split(rng_key)
            seeded_model = handlers.seed(model, model_seed)
            seeded_guide = handlers.seed(guide, guide_seed)
            guide_log_density, guide_trace = log_density(
                seeded_guide, args, kwargs, param_map
            )
            seeded_model = handlers.replay(seeded_model, guide_trace)
            model_log_density, _ = log_density(
                seeded_model, args, kwargs, param_map
            )
            return model_log_density - guide_log_density

        rng_keys = random.split(rng_key, self.num_particles)
        elbos = vmap(single_particle_elbo)(rng_keys)
        scaled_elbos = (1.0 - self.alpha) * elbos
        avg_log_exp = logsumexp(scaled_elbos) - jnp.log(self.num_particles)
        weights = jnp.exp(scaled_elbos - avg_log_exp)
        renyi_elbo = avg_log_exp / (1.0 - self.alpha)
        weighted_elbo = jnp.dot(stop_gradient(weights), elbos) / self.num_particles
        loss = -(stop_gradient(renyi_elbo - weighted_elbo) + weighted_elbo)
        return {"loss": loss, "mutable_state": None}


class TraceEnum_ELBO(ELBO):
    """ELBO with exact marginalization of enumerable discrete latents in the
    model via the funsor-free sum-product engine
    (reference surface: numpyro/infer/elbo.py:1073).

    Discrete model sites with finite support that do not appear in the guide
    are enumerated and summed out; continuous latents come from the guide as
    usual.  The contraction compiles into the same fused XLA program as the
    rest of the loss.
    """

    can_infer_discrete = True

    def __init__(self, num_particles=1, vectorize_particles=True, max_plate_nesting=None):
        self.max_plate_nesting = max_plate_nesting
        super().__init__(num_particles, vectorize_particles)

    def loss_with_mutable_state(
        self, rng_key, param_map, model, guide, *args, **kwargs
    ):
        from numpyro_tpu.contrib.enum import config_enumerate, enum
        from numpyro_tpu.contrib.enum import log_density as enum_log_density

        def single_particle_elbo(rng_key):
            params = param_map.copy()
            model_seed, guide_seed = random.split(rng_key)
            seeded_guide = handlers.seed(guide, guide_seed)
            guide_log_density, guide_trace = log_density(
                seeded_guide, args, kwargs, param_map
            )
            mutable_params = {
                name: site["value"]
                for name, site in guide_trace.items()
                if site["type"] == "mutable"
            }
            params.update(mutable_params)

            # max plate nesting: from trace if not given
            if self.max_plate_nesting is None:
                dims = [
                    frame.dim
                    for site in guide_trace.values()
                    if site["type"] == "sample"
                    for frame in site["cond_indep_stack"]
                    if frame.dim is not None
                ]
                # probe the model once to find its plates too
                probe = handlers.trace(
                    handlers.substitute(
                        handlers.seed(model, model_seed), data=params
                    )
                ).get_trace(*args, **kwargs)
                dims += [
                    frame.dim
                    for site in probe.values()
                    if site["type"] == "sample"
                    for frame in site["cond_indep_stack"]
                    if frame.dim is not None
                ]
                max_plate_nesting = -min(dims) if dims else 0
            else:
                max_plate_nesting = self.max_plate_nesting

            enum_model = enum(
                config_enumerate(handlers.seed(model, model_seed)),
                first_available_dim=-1 - max_plate_nesting,
            )
            replayed = handlers.replay(enum_model, guide_trace)
            model_log_density, model_trace = enum_log_density(
                replayed, args, kwargs, params
            )
            mutable_params.update(
                {
                    name: site["value"]
                    for name, site in model_trace.items()
                    if site["type"] == "mutable"
                }
            )
            elbo_particle = model_log_density - guide_log_density
            if mutable_params:
                if self.num_particles == 1:
                    return elbo_particle, mutable_params
                raise ValueError(
                    "mutable state is not supported for multi-particle ELBO"
                )
            return elbo_particle, None

        if self.num_particles == 1:
            elbo, mutable_state = single_particle_elbo(rng_key)
            return {"loss": -elbo, "mutable_state": mutable_state}
        rng_keys = random.split(rng_key, self.num_particles)
        particle_fn = self._assign_particle_fn()
        elbos, mutable_state = particle_fn(single_particle_elbo)(rng_keys)
        return {"loss": -jnp.mean(elbos), "mutable_state": mutable_state}


class MultiFrameTensor(dict):
    """Sums of tensors living in different plate contexts; ``sum_to``
    reduces every entry onto a target cond_indep_stack
    (reference: elbo.py:598)."""

    def __init__(self, *items):
        super().__init__()
        self.add(*items)

    def add(self, *items):
        for cond_indep_stack, value in items:
            frames = frozenset(f for f in cond_indep_stack)
            assert all(f.dim < 0 and -jnp.ndim(value) <= f.dim for f in frames)
            if frames in self:
                self[frames] = self[frames] + value
            else:
                self[frames] = value

    def sum_to(self, target_frames):
        total = None
        for frames, value in self.items():
            for f in frames:
                if f not in target_frames and jnp.shape(value)[f.dim] != 1:
                    value = value.sum(f.dim, keepdims=True)
            while jnp.shape(value) and jnp.shape(value)[0] == 1:
                value = value.squeeze(0)
            total = value if total is None else total + value
        return 0.0 if total is None else total


def get_importance_log_probs(model, guide, args, kwargs, params):
    """Per-site log-probs of guide and the model replayed against it."""
    model_tr, guide_tr = get_importance_trace(model, guide, args, kwargs, params)
    model_lps = {
        n: s["log_prob"] for n, s in model_tr.items() if s["type"] == "sample"
    }
    guide_lps = {
        n: s["log_prob"] for n, s in guide_tr.items() if s["type"] == "sample"
    }
    return model_lps, guide_lps


def _substitute_nonreparam(data, msg):
    if msg["name"] in data and not msg["fn"].has_rsample:
        value = msg["fn"](*msg["args"], **msg["kwargs"])
        value = 0 * value + data[msg["name"]]
        return value


def _get_latents(model, guide, args, kwargs, params):
    model = handlers.seed(handlers.substitute(model, data=params), rng_seed=0)
    guide = handlers.seed(handlers.substitute(guide, data=params), rng_seed=0)
    guide_tr = handlers.trace(guide).get_trace(*args, **kwargs)
    model_tr = handlers.trace(handlers.replay(model, guide_tr)).get_trace(
        *args, **kwargs
    )
    model_tr.update(guide_tr)
    return {
        name: site["value"]
        for name, site in model_tr.items()
        if site["type"] == "sample" and not site.get("is_observed", False)
    }


def get_nonreparam_deps(model, guide, args, kwargs, param_map, latents=None):
    """Provenance: which non-reparameterizable latents does each cost term
    depend on? (reference: elbo.py:797)."""
    from numpyro_tpu.ops.provenance import eval_provenance

    if latents is None:
        latents = jax.eval_shape(
            partial(_get_latents, model, guide, args, kwargs, param_map)
        )

    def fn(**latents):
        subs_fn = partial(_substitute_nonreparam, latents)
        subs_model = handlers.substitute(
            handlers.seed(model, rng_seed=0), substitute_fn=subs_fn
        )
        subs_guide = handlers.substitute(
            handlers.seed(guide, rng_seed=0), substitute_fn=subs_fn
        )
        return get_importance_log_probs(
            subs_model, subs_guide, args, kwargs, param_map
        )

    return eval_provenance(fn, **latents)


class TraceGraph_ELBO(ELBO):
    """ELBO with variance-reduced score-function terms for
    non-reparameterizable guide sites (Schulman et al., "Gradient Estimation
    Using Stochastic Computation Graphs"); downstream costs are identified
    by provenance tracking and Rao-Blackwellized per plate
    (reference: numpyro/infer/elbo.py:814)."""

    can_infer_discrete = True

    def loss_with_mutable_state(
        self, rng_key, param_map, model, guide, *args, **kwargs
    ):
        from collections import defaultdict

        def single_particle_elbo(rng_key):
            model_seed, guide_seed = random.split(rng_key)
            seeded_model = handlers.seed(model, model_seed)
            seeded_guide = handlers.seed(guide, guide_seed)
            model_trace, guide_trace = get_importance_trace(
                seeded_model, seeded_guide, args, kwargs, param_map
            )
            latents = {
                name: site["value"]
                for name, site in guide_trace.items()
                if site["type"] == "sample" and not site.get("is_observed", False)
            }
            model_deps, guide_deps = get_nonreparam_deps(
                model, guide, args, kwargs, param_map, latents=latents
            )

            elbo = 0.0
            # per non-reparam site: total downstream cost it influences
            downstream_costs = defaultdict(MultiFrameTensor)
            for name, site in model_trace.items():
                if site["type"] == "sample":
                    elbo = elbo + jnp.sum(site["log_prob"])
                    for key in model_deps[name]:
                        downstream_costs[key].add(
                            (site["cond_indep_stack"], site["log_prob"])
                        )
            for name, site in guide_trace.items():
                if site["type"] == "sample":
                    log_prob_sum = jnp.sum(site["log_prob"])
                    if not site["fn"].has_rsample:
                        log_prob_sum = stop_gradient(log_prob_sum)
                    elbo = elbo - log_prob_sum
                    for key in guide_deps[name]:
                        downstream_costs[key].add(
                            (site["cond_indep_stack"], -site["log_prob"])
                        )

            for node, downstream_cost in downstream_costs.items():
                guide_site = guide_trace[node]
                downstream_cost = downstream_cost.sum_to(
                    guide_site["cond_indep_stack"]
                )
                surrogate = jnp.sum(
                    guide_site["log_prob"] * stop_gradient(downstream_cost)
                )
                elbo = elbo + surrogate - stop_gradient(surrogate)
            return elbo

        if self.num_particles == 1:
            return {"loss": -single_particle_elbo(rng_key), "mutable_state": None}
        rng_keys = random.split(rng_key, self.num_particles)
        particle_fn = self._assign_particle_fn()
        elbos = particle_fn(single_particle_elbo)(rng_keys)
        return {"loss": -jnp.mean(elbos), "mutable_state": None}
