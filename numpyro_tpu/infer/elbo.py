"""ELBO objectives for SVI.

Implementation of the loss surface of numpyro/infer/elbo.py: Trace_ELBO,
TraceMeanField_ELBO, RenyiELBO, TraceEnum_ELBO, TraceGraph_ELBO.  Particle
fan-out defaults to vmap (one fused program); ``vectorize_particles`` may
also be a callable transform (e.g. a shard_map over a ``particles`` mesh
axis) for pod-scale particle parallelism.

Organisation: the single-vs-many particle dispatch and mutable-state
bookkeeping live once on the base class; each objective only implements
``_particle_elbo``.
"""

from __future__ import annotations

from collections import defaultdict
from functools import partial

import jax
import jax.numpy as jnp
from jax import random, vmap
from jax.lax import stop_gradient
from jax.scipy.special import logsumexp

from numpyro_tpu import handlers
from numpyro_tpu.distributions.kl import kl_divergence
from numpyro_tpu.distributions.util import scale_and_mask
from numpyro_tpu.infer.util import (
    _without_rsample_stop_gradient,
    get_importance_trace,
    log_density,
)

__all__ = [
    "ELBO",
    "Trace_ELBO",
    "TraceEnum_ELBO",
    "TraceGraph_ELBO",
    "TraceMeanField_ELBO",
    "RenyiELBO",
]


def _sites_of_type(trace, site_type):
    return {
        name: site["value"]
        for name, site in trace.items()
        if site["type"] == site_type
    }


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


class ELBO:
    """Base class (reference: elbo.py:33-119)."""

    can_infer_discrete = False

    def __init__(self, num_particles=1, vectorize_particles=True):
        self.num_particles = num_particles
        self.vectorize_particles = vectorize_particles

    def _assign_particle_fn(self):
        if callable(self.vectorize_particles):
            return self.vectorize_particles
        if self.vectorize_particles is True:
            return vmap
        if self.vectorize_particles is False:
            return jax.lax.map
        raise ValueError("vectorize_particles must be True, False, or a callable")

    def loss(self, rng_key, param_map, model, guide, *args, **kwargs):
        return self.loss_with_mutable_state(
            rng_key, param_map, model, guide, *args, **kwargs
        )["loss"]

    def _particle_elbo(self, rng_key, param_map, model, guide, args, kwargs):
        """One MC particle: returns (elbo, mutable_state-or-None)."""
        raise NotImplementedError

    def loss_with_mutable_state(
        self, rng_key, param_map, model, guide, *args, **kwargs
    ):
        one = partial(
            self._particle_elbo,
            param_map=param_map,
            model=model,
            guide=guide,
            args=args,
            kwargs=kwargs,
        )
        if self.num_particles == 1:
            elbo, mutable_state = one(rng_key)
            return {"loss": -elbo, "mutable_state": mutable_state}
        keys = random.split(rng_key, self.num_particles)
        elbos, mutable_state = self._assign_particle_fn()(one)(keys)
        return {"loss": -jnp.mean(elbos), "mutable_state": mutable_state}

    def _wrap_mutable(self, elbo, mutable_params):
        """Shared tail: mutable state is only defined for one particle."""
        if not mutable_params:
            return elbo, None
        if self.num_particles != 1:
            raise ValueError(
                "mutable state is currently not supported for multi-particle ELBO"
            )
        return elbo, mutable_params


class Trace_ELBO(ELBO):
    """MC estimate of ELBO from joint guide/model traces; fully differentiable
    when all guide sites are reparameterizable (reference: elbo.py:122-274)."""

    def _particle_elbo(self, rng_key, param_map, model, guide, args, kwargs):
        model_seed, guide_seed = random.split(rng_key)
        guide_ld, guide_trace = log_density(
            handlers.seed(guide, guide_seed), args, kwargs, param_map
        )
        mutable_params = _sites_of_type(guide_trace, "mutable")
        replayed = handlers.replay(handlers.seed(model, model_seed), guide_trace)
        model_ld, model_trace = log_density(
            replayed, args, kwargs, {**param_map, **mutable_params}
        )
        check_model_guide_match(model_trace, guide_trace)
        mutable_params.update(_sites_of_type(model_trace, "mutable"))
        return self._wrap_mutable(model_ld - guide_ld, mutable_params)


class TraceMeanField_ELBO(ELBO):
    """Uses analytic KL where registered, MC elsewhere; requires mean-field
    dependency structure (reference: elbo.py:315)."""

    @staticmethod
    def _site_term(model_site, guide_site):
        """Contribution of one latent site: -KL(q||p), analytic when known."""
        try:
            kl_qp = kl_divergence(guide_site["fn"], model_site["fn"])
            return -jnp.sum(scale_and_mask(kl_qp, scale=guide_site["scale"]))
        except NotImplementedError:
            p_lp = model_site["fn"].log_prob(model_site["value"])
            q_lp = guide_site["fn"].log_prob(guide_site["value"])
            return jnp.sum(
                scale_and_mask(p_lp, scale=model_site["scale"])
            ) - jnp.sum(scale_and_mask(q_lp, scale=guide_site["scale"]))

    def _particle_elbo(self, rng_key, param_map, model, guide, args, kwargs):
        model_seed, guide_seed = random.split(rng_key)
        seeded_guide = handlers.substitute(
            handlers.seed(guide, guide_seed), data=param_map
        )
        with _without_rsample_stop_gradient():
            guide_trace = handlers.trace(seeded_guide).get_trace(*args, **kwargs)
        mutable_params = _sites_of_type(guide_trace, "mutable")
        seeded_model = handlers.substitute(
            handlers.replay(handlers.seed(model, model_seed), guide_trace),
            data={**param_map, **mutable_params},
        )
        model_trace = handlers.trace(seeded_model).get_trace(*args, **kwargs)
        mutable_params.update(_sites_of_type(model_trace, "mutable"))
        check_model_guide_match(model_trace, guide_trace)

        elbo = 0.0
        for name, model_site in model_trace.items():
            if model_site["type"] != "sample":
                continue
            if model_site["is_observed"]:
                obs_lp = model_site["fn"].log_prob(model_site["value"])
                obs_lp = scale_and_mask(obs_lp, scale=model_site["scale"])
                elbo = elbo + jnp.sum(obs_lp)
            else:
                elbo = elbo + self._site_term(model_site, guide_trace[name])
        return self._wrap_mutable(elbo, mutable_params)


class RenyiELBO(ELBO):
    """Renyi alpha-divergence bound (reference: elbo.py:430)."""

    def __init__(self, alpha=0.0, num_particles=2):
        if alpha == 1:
            raise ValueError(
                "The order alpha should not be equal to 1. Please use Trace_ELBO."
            )
        self.alpha = alpha
        super().__init__(num_particles=num_particles)

    def _log_weight(self, rng_key, param_map, model, guide, args, kwargs):
        model_seed, guide_seed = random.split(rng_key)
        guide_ld, guide_trace = log_density(
            handlers.seed(guide, guide_seed), args, kwargs, param_map
        )
        replayed = handlers.replay(handlers.seed(model, model_seed), guide_trace)
        model_ld, _ = log_density(replayed, args, kwargs, param_map)
        return model_ld - guide_ld

    def loss_with_mutable_state(
        self, rng_key, param_map, model, guide, *args, **kwargs
    ):
        keys = random.split(rng_key, self.num_particles)
        log_w = vmap(
            lambda k: self._log_weight(k, param_map, model, guide, args, kwargs)
        )(keys)
        tempered = (1.0 - self.alpha) * log_w
        log_mean = logsumexp(tempered) - jnp.log(self.num_particles)
        weights = jnp.exp(tempered - log_mean)
        renyi_bound = log_mean / (1.0 - self.alpha)
        inner = jnp.dot(stop_gradient(weights), log_w) / self.num_particles
        loss = -(stop_gradient(renyi_bound - inner) + inner)
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

    @staticmethod
    def _plate_depth(*traces):
        dims = [
            frame.dim
            for trace in traces
            for site in trace.values()
            if site["type"] == "sample"
            for frame in site["cond_indep_stack"]
            if frame.dim is not None
        ]
        return -min(dims) if dims else 0

    @staticmethod
    def _guide_enum_sites(guide_trace):
        return [
            name
            for name, site in guide_trace.items()
            if site["type"] == "sample"
            and not site.get("is_observed", False)
            and site.get("infer", {}).get("enumerate") == "parallel"
            and getattr(site["fn"], "has_enumerate_support", False)
        ]

    def _particle_elbo(self, rng_key, param_map, model, guide, args, kwargs):
        from numpyro_tpu.contrib.enum import config_enumerate, enum
        from numpyro_tpu.contrib.enum import log_density as enum_log_density

        model_seed, guide_seed = random.split(rng_key)
        guide_ld, guide_trace = log_density(
            handlers.seed(guide, guide_seed), args, kwargs, param_map
        )
        mutable_params = _sites_of_type(guide_trace, "mutable")
        params = {**param_map, **mutable_params}

        if self.max_plate_nesting is None:
            # probe the model once to find its plates too
            probe = handlers.trace(
                handlers.substitute(
                    handlers.seed(model, model_seed), data=params
                )
            ).get_trace(*args, **kwargs)
            max_plate_nesting = self._plate_depth(guide_trace, probe)
        else:
            max_plate_nesting = self.max_plate_nesting

        if self._guide_enum_sites(guide_trace):
            # exact expectations over guide-enumerated discretes
            elbo = self._enumerated_guide_elbo(
                model_seed, guide_seed, params, model, guide, args, kwargs,
                max_plate_nesting,
            )
            return self._wrap_mutable(elbo, mutable_params)

        enum_model = enum(
            config_enumerate(handlers.seed(model, model_seed)),
            first_available_dim=-1 - max_plate_nesting,
        )
        model_ld, model_trace = enum_log_density(
            handlers.replay(enum_model, guide_trace), args, kwargs, params
        )
        mutable_params.update(_sites_of_type(model_trace, "mutable"))
        return self._wrap_mutable(model_ld - guide_ld, mutable_params)

    def _enumerated_guide_elbo(
        self, model_seed, guide_seed, params, model, guide, args, kwargs,
        max_plate_nesting,
    ):
        """ELBO with EXACT (pathwise-differentiable) expectations over
        guide sites marked ``infer={"enumerate": "parallel"}`` (reference
        surface: numpyro/infer/elbo.py:1073 TraceEnum_ELBO guide
        enumeration via TVE).

        Semantics: guide-enumerated discretes are expanded over their
        supports; the ELBO integrand's log-factors (model ``+``, guide
        ``-``) are each contracted against the product of the relevant
        guide marginals ``q_s`` — exact gradients flow through the
        weights, no score-function terms.  Model-only enumerable
        discretes are still summed out of ``log p`` on their own dims
        (logsumexp elimination) before the expectation.  Like the
        model-side machinery, couplings must stay plate-local (the plated
        factor-graph restriction of TVE).
        """
        from numpyro_tpu.contrib.enum import config_enumerate, enum
        from numpyro_tpu.contrib.enum.enum_messenger import (
            ENUM_DIM_KEY,
            ENUM_SERIAL_KEY,
        )
        from numpyro_tpu.contrib.enum.infer_util import (
            _eliminate,
            _Factor,
            _factor_enum_dims,
        )
        from numpyro_tpu.distributions.util import scale_and_mask

        fad = -1 - max_plate_nesting
        genum_guide = enum(
            handlers.substitute(
                handlers.seed(guide, guide_seed), data=params
            ),
            first_available_dim=fad,
        )
        with handlers.trace() as gtr:
            genum_guide(*args, **kwargs)

        def site_log_prob(site):
            value = site["value"]
            intermediates = site.get("intermediates")
            if intermediates:
                lp = site["fn"].log_prob(value, intermediates)
            else:
                lp = site["fn"].log_prob(value)
            return scale_and_mask(lp, site.get("scale"))

        def plate_axes_of(site, lp):
            axes = {
                fr.dim
                for fr in site["cond_indep_stack"]
                if fr.dim is not None
            }
            nd = jnp.ndim(lp)
            for ax in range(max(0, nd - max_plate_nesting), nd):
                if lp.shape[ax] > 1:
                    axes.add(ax - nd)
            return axes

        guide_dims = {}  # dim -> (weight array, plate axes)
        factors = []
        for name, site in gtr.items():
            if site["type"] != "sample" or site.get("is_observed", False):
                continue
            d = site.get("infer", {}).get(ENUM_DIM_KEY)
            lp = site_log_prob(site)
            axes = plate_axes_of(site, lp)
            if d is not None:
                if site.get("infer", {}).get(ENUM_SERIAL_KEY) is not None and (
                    d in guide_dims
                ):
                    raise NotImplementedError(
                        "markov dim recycling in an enumerated guide is not "
                        "supported; enumerate guide chains in the model"
                    )
                guide_dims[d] = (jnp.exp(lp), axes)
            # the -log q cost term (enumerated or reparameterized alike)
            factors.append(
                _Factor(-lp, _factor_enum_dims(lp, max_plate_nesting), axes)
            )

        # model: replay guide values (enumerated sites ride in expanded),
        # enumerate any model-only discretes on dims BELOW the guide's
        model_fad = (min(guide_dims) - 1) if guide_dims else fad
        enum_model = enum(
            config_enumerate(
                handlers.substitute(
                    handlers.seed(model, model_seed), data=params
                )
            ),
            first_available_dim=model_fad,
        )
        with handlers.trace() as mtr:
            handlers.replay(enum_model, gtr)(*args, **kwargs)

        model_dims = set()
        dim_owner_axes = {}
        for name, site in mtr.items():
            if site["type"] != "sample":
                continue
            lp = site_log_prob(site)
            axes = plate_axes_of(site, lp)
            d = site.get("infer", {}).get(ENUM_DIM_KEY)
            if d is not None and d not in guide_dims:
                model_dims.add(d)
                dim_owner_axes[d] = axes
            factors.append(
                _Factor(lp, _factor_enum_dims(lp, max_plate_nesting), axes)
            )

        # 1. sum model-only discretes out of log p (logsumexp elimination)
        for d in sorted(model_dims):
            factors = _eliminate(factors, d, dim_owner_axes.get(d, set()))

        # 2. exact expectation: contract each remaining factor against the
        # guide weights on its dims (linear in the log-factors, so
        # E[sum] = sum of per-factor expectations; plate axes stay
        # elementwise through the weighting).  Contracting a conditional
        # weight q(z2 | z1) can INTRODUCE the parent's dim into the
        # running value, so dims are re-detected after every contraction;
        # deepest (latest-allocated, i.e. conditional-side) dims first so
        # children integrate out before their parents.
        total = 0.0
        for f in factors:
            r = f.lp
            while True:
                live = [
                    d
                    for d in sorted(
                        _factor_enum_dims(r, max_plate_nesting)
                    )
                    if d in guide_dims
                ]
                if not live:
                    break
                d = live[0]
                w, _ = guide_dims[d]
                r = jnp.sum(r * w, axis=jnp.ndim(r) + d, keepdims=True)
            total = total + jnp.sum(r)
        return total


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

    def log_probs(trace):
        return {
            n: s["log_prob"] for n, s in trace.items() if s["type"] == "sample"
        }

    return log_probs(model_tr), log_probs(guide_tr)


def _substitute_nonreparam(data, msg):
    if msg["name"] in data and not msg["fn"].has_rsample:
        drawn = msg["fn"](*msg["args"], **msg["kwargs"])
        return 0 * drawn + data[msg["name"]]


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

    def _particle_elbo(self, rng_key, param_map, model, guide, args, kwargs):
        model_seed, guide_seed = random.split(rng_key)
        model_trace, guide_trace = get_importance_trace(
            handlers.seed(model, model_seed),
            handlers.seed(guide, guide_seed),
            args,
            kwargs,
            param_map,
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
            if site["type"] != "sample":
                continue
            elbo = elbo + jnp.sum(site["log_prob"])
            for key in model_deps[name]:
                downstream_costs[key].add(
                    (site["cond_indep_stack"], site["log_prob"])
                )
        for name, site in guide_trace.items():
            if site["type"] != "sample":
                continue
            q_lp_sum = jnp.sum(site["log_prob"])
            if not site["fn"].has_rsample:
                q_lp_sum = stop_gradient(q_lp_sum)
            elbo = elbo - q_lp_sum
            for key in guide_deps[name]:
                downstream_costs[key].add(
                    (site["cond_indep_stack"], -site["log_prob"])
                )

        for node, cost in downstream_costs.items():
            guide_site = guide_trace[node]
            reduced = cost.sum_to(guide_site["cond_indep_stack"])
            surrogate = jnp.sum(guide_site["log_prob"] * stop_gradient(reduced))
            elbo = elbo + surrogate - stop_gradient(surrogate)
        return elbo, None
