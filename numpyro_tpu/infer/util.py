"""Model → density bridge (L3).

Fresh implementation of the surface of numpyro/infer/util.py:
``log_density`` / ``potential_energy`` / ``initialize_model`` /
``Predictive`` / ``log_likelihood`` / constrain-unconstrain machinery.

Chain-massive design: ``find_valid_initial_params`` and ``Predictive`` are
vectorized over the chain/sample axis from day one (vmap inside one program,
never a host loop), so 4096-chain initialization is one XLA launch.
"""

from __future__ import annotations

import warnings
from collections import namedtuple
from functools import partial
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp
from jax import device_get, jacfwd, lax, random, value_and_grad, vmap
from jax.flatten_util import ravel_pytree

import numpyro_tpu.distributions as dist
from numpyro_tpu import handlers
from numpyro_tpu.distributions import constraints
from numpyro_tpu.distributions.transforms import biject_to
from numpyro_tpu.distributions.util import is_prng_key, sum_rightmost
from numpyro_tpu.infer.initialization import init_to_uniform, init_to_value
from numpyro_tpu.primitives import _PYRO_STACK, Messenger
from numpyro_tpu.util import not_jax_tracer, soft_vmap

__all__ = [
    "constrain_fn",
    "find_valid_initial_params",
    "get_transforms",
    "initialize_model",
    "log_density",
    "log_likelihood",
    "potential_energy",
    "Predictive",
    "transform_fn",
    "unconstrain_fn",
]

ModelInfo = namedtuple(
    "ModelInfo", ["param_info", "potential_fn", "postprocess_fn", "model_trace"]
)
ParamInfo = namedtuple("ParamInfo", ["z", "potential_energy", "z_grad"])


def log_density(model, model_args, model_kwargs, params):
    """Sum of scaled log-probs of all sample sites given substituted params.

    Returns (log_joint, model_trace).
    """
    model = handlers.substitute(model, data=params)
    model_trace = handlers.trace(model).get_trace(*model_args, **model_kwargs)
    log_joint = jnp.zeros(())
    for site in model_trace.values():
        if site["type"] == "sample":
            value = site["value"]
            intermediates = site["intermediates"]
            scale = site["scale"]
            if intermediates:
                log_prob = site["fn"].log_prob(value, intermediates)
            else:
                guide_shape = jnp.shape(value)
                model_shape = tuple(
                    site["fn"].shape()
                )
                try:
                    jnp.broadcast_shapes(guide_shape, model_shape)
                except ValueError:
                    raise ValueError(
                        f"Model and guide shapes disagree at site: '{site['name']}': "
                        f"{model_shape} vs {guide_shape}"
                    )
                log_prob = site["fn"].log_prob(value)

            if (scale is not None) and (not is_identically_one(scale)):
                log_prob = scale * log_prob

            log_prob = jnp.sum(log_prob)
            log_joint = log_joint + log_prob
    return log_joint, model_trace


def compute_log_probs(model, model_args, model_kwargs, params, batch_ndims=0):
    """Per-site (optionally per-batch) log probs; returns (dict, trace)."""
    model = handlers.substitute(model, data=params)
    model_trace = handlers.trace(model).get_trace(*model_args, **model_kwargs)
    log_probs = {}
    for site in model_trace.values():
        if site["type"] == "sample":
            value = site["value"]
            intermediates = site["intermediates"]
            scale = site["scale"]
            if intermediates:
                log_prob = site["fn"].log_prob(value, intermediates)
            else:
                log_prob = site["fn"].log_prob(value)
            if (scale is not None) and (not is_identically_one(scale)):
                log_prob = scale * log_prob
            if batch_ndims == 0:
                log_prob = jnp.sum(log_prob)
            else:
                log_prob = sum_rightmost(
                    log_prob, jnp.ndim(log_prob) - batch_ndims
                )
            log_probs[site["name"]] = log_prob
    return log_probs, model_trace


def is_identically_one(x):
    if isinstance(x, (int, float)):
        return x == 1
    if not_jax_tracer(x) and np.ndim(x) == 0:
        return bool(np.asarray(x) == 1)
    return False


class _without_rsample_stop_gradient(Messenger):
    """Stop gradient for sites with non-reparameterizable samplers."""

    def postprocess_message(self, msg):
        if (
            msg["type"] == "sample"
            and (not msg["is_observed"])
            and (not msg["fn"].has_rsample)
        ):
            msg["value"] = lax.stop_gradient(msg["value"])


def get_importance_trace(model, guide, args, kwargs, params):
    """Run guide, replay model against it; return both traces."""
    guide = handlers.substitute(guide, data=params)
    with _without_rsample_stop_gradient():
        guide_trace = handlers.trace(guide).get_trace(*args, **kwargs)
    model = handlers.substitute(handlers.replay(model, guide_trace), data=params)
    model_trace = handlers.trace(model).get_trace(*args, **kwargs)
    for tr in (guide_trace, model_trace):
        for site in tr.values():
            if site["type"] == "sample":
                if "log_prob" not in site:
                    value = site["value"]
                    intermediates = site["intermediates"]
                    scale = site["scale"]
                    if intermediates:
                        log_prob = site["fn"].log_prob(value, intermediates)
                    else:
                        log_prob = site["fn"].log_prob(value)
                    if (scale is not None) and (not is_identically_one(scale)):
                        log_prob = scale * log_prob
                    site["log_prob"] = log_prob
    return model_trace, guide_trace


def transform_fn(transforms, params, invert=False):
    """Apply (or invert) a dict of per-site transforms to params."""
    if invert:
        transforms = {k: v.inv for k, v in transforms.items()}
    return {k: transforms[k](v) if k in transforms else v for k, v in params.items()}


def constrain_fn(model, model_args, model_kwargs, params, return_deterministic=False):
    """Transform unconstrained params to constrained space and recover
    deterministic sites by re-running the model."""
    def substitute_fn(site):
        if site["name"] in params:
            if site["type"] == "sample":
                with handlers.block():
                    return biject_to(site["fn"].support)(params[site["name"]])
            else:
                return params[site["name"]]

    substituted_model = handlers.substitute(model, substitute_fn=substitute_fn)
    model_trace = handlers.trace(substituted_model).get_trace(
        *model_args, **model_kwargs
    )
    return {
        name: site["value"]
        for name, site in model_trace.items()
        if (name in params) or (return_deterministic and site["type"] == "deterministic")
    }


def unconstrain_fn(model, model_args, model_kwargs, params):
    """Constrained params -> unconstrained space."""
    model = handlers.substitute(model, data=params)
    model_trace = handlers.trace(model).get_trace(*model_args, **model_kwargs)
    transforms = {}
    for name, site in model_trace.items():
        if (
            site["type"] == "sample"
            and not site["is_observed"]
            and site["fn"].support is not None
        ):
            transforms[name] = biject_to(site["fn"].support)
    return transform_fn(transforms, params, invert=True)


def _unconstrain_reparam(params, site):
    """Substitute-fn that maps unconstrained values into site supports and
    adds the log|det J| as a factor — the inner transformation of
    potential_energy (reference: infer/util.py:269-299)."""
    name = site["name"]
    if name in params:
        if site["type"] != "sample":
            return params[name]
        p = params[name]
        support = site["fn"].support
        with handlers.block():
            t = biject_to(support)
        if t is None:
            return p
        # inside scan we substitute one step's slice of the whole series
        i = site["infer"].get("_scan_current_index", None) if "infer" in site else None
        if i is not None:
            event_dim_shift = t.codomain.event_dim - t.domain.event_dim
            expected_unconstrained_dim = len(site["fn"].shape()) - event_dim_shift
            if jnp.ndim(p) > expected_unconstrained_dim:
                p = p[i]
        if isinstance(support, constraints._IndependentConstraint):
            base = support.base_constraint
        else:
            base = support
        if isinstance(base, constraints._Real):
            # identity transform: no jacobian term
            return p
        value = t(p)

        log_det = t.log_abs_det_jacobian(p, value)
        log_det = sum_rightmost(
            log_det, jnp.ndim(log_det) - jnp.ndim(value) + len(site["fn"].event_shape)
        )
        from numpyro_tpu import factor as numpyro_factor

        numpyro_factor(f"_{name}_log_det", log_det)
        return value


def potential_energy(model, model_args, model_kwargs, params, enum=False):
    """-log p(constrained(params)) - log|det J| — the NUTS target."""
    if enum:
        from numpyro_tpu.contrib.enum import log_density as enum_log_density

        substituted_model = handlers.substitute(
            model, substitute_fn=partial(_unconstrain_reparam, params)
        )
        log_joint, _ = enum_log_density(
            substituted_model, model_args, model_kwargs, {}
        )
        return -log_joint
    substituted_model = handlers.substitute(
        model, substitute_fn=partial(_unconstrain_reparam, params)
    )
    log_joint, _ = log_density(substituted_model, model_args, model_kwargs, {})
    return -log_joint


def find_valid_initial_params(
    rng_key,
    model,
    *,
    init_strategy=init_to_uniform,
    enum=False,
    model_args=(),
    model_kwargs=None,
    prototype_params=None,
    forward_mode_differentiation=False,
    validate_grad=True,
):
    """Rejection-sample initial latents until potential & grad are finite
    (≤100 tries), batched over an arbitrary rng_key batch — the whole search
    for all chains is ONE while_loop program (reference: infer/util.py:335).

    Returns ((init_params, pe, grad), is_valid).
    """
    model_kwargs = {} if model_kwargs is None else model_kwargs
    init_strategy = (
        init_strategy if isinstance(init_strategy, partial) else init_strategy()
    )
    # init_to_uniform draws directly in unconstrained space — no model trace
    # per rejection iteration, and per-chain keys apply even when the model
    # closure carries its own inner seed (reference: infer/util.py:377-431)
    from numpyro_tpu.infer.initialization import init_to_uniform as _itu

    if getattr(init_strategy, "func", None) is _itu:
        radius = init_strategy.keywords.get("radius", 2.0)
    else:
        radius = None

    def cond_fn(state):
        i, _, _, is_valid = state
        return (i < 100) & (~is_valid)

    def body_fn(state):
        i, key, _, _ = state
        key, subkey = random.split(key)

        if radius is not None and prototype_params is not None:
            # draw uniformly in unconstrained space, shaped like the prototype
            params = {}
            for k, v in prototype_params.items():
                params[k] = random.uniform(
                    subkey, jnp.shape(v), minval=-radius, maxval=radius
                )
                key, subkey = random.split(key)
        else:
            # trace the model with the init strategy to get initial
            # constrained values, then unconstrain
            seeded_model = handlers.substitute(
                handlers.seed(model, subkey), substitute_fn=init_strategy
            )
            model_trace = handlers.trace(seeded_model).get_trace(
                *model_args, **model_kwargs
            )
            constrained_values, inv_transforms = {}, {}
            for k, v in model_trace.items():
                if (
                    v["type"] == "sample"
                    and not v["is_observed"]
                    and not v["fn"].support.is_discrete
                ):
                    constrained_values[k] = v["value"]
                    with handlers.block():
                        inv_transforms[k] = biject_to(v["fn"].support)
            params = transform_fn(
                inv_transforms,
                {k: v for k, v in constrained_values.items()},
                invert=True,
            )
        potential_fn = partial(
            potential_energy, model, model_args, model_kwargs, enum=enum
        )
        if validate_grad:
            if forward_mode_differentiation:
                pe = potential_fn(params)
                z_grad = jacfwd(potential_fn)(params)
            else:
                pe, z_grad = value_and_grad(potential_fn)(params)
            z_grad_flat = ravel_pytree(z_grad)[0]
            is_valid = jnp.isfinite(pe) & jnp.all(jnp.isfinite(z_grad_flat))
        else:
            pe = potential_fn(params)
            is_valid = jnp.isfinite(pe)
            z_grad = None

        return i + 1, key, (params, pe, z_grad), is_valid

    def _find_valid_params(rng_key, exit_early=False):
        prototype_grads = prototype_params if validate_grad else None
        init_state = (
            0,
            rng_key,
            (prototype_params, jnp.zeros(()), prototype_grads),
            jnp.asarray(False),
        )
        if exit_early and not_jax_tracer(rng_key):
            # early return if valid params found (host loop, compile once)
            _, _, (init_params, pe, z_grad), is_valid = init_state = body_fn(
                init_state
            )
            if not_jax_tracer(is_valid):
                if device_get(is_valid):
                    return (init_params, pe, z_grad), is_valid

        _, _, (init_params, pe, z_grad), is_valid = lax.while_loop(
            cond_fn, body_fn, init_state
        )
        return (init_params, pe, z_grad), is_valid

    # batched over the leading dim of rng_key: one fused program for all chains
    if is_prng_key(rng_key):
        (init_params, pe, z_grad), is_valid = _find_valid_params(
            rng_key, exit_early=True
        )
    else:
        (init_params, pe, z_grad), is_valid = lax.map(_find_valid_params, rng_key)

    return (init_params, pe, z_grad), is_valid


def _get_model_transforms(model, model_args=(), model_kwargs=None):
    model_kwargs = {} if model_kwargs is None else model_kwargs
    model_trace = handlers.trace(model).get_trace(*model_args, **model_kwargs)
    inv_transforms = {}
    has_enumerate_support = False
    replay_model = False
    for k, v in model_trace.items():
        if v["type"] == "sample" and not v["is_observed"]:
            if v["fn"].support.is_discrete:
                enum_type = v["infer"].get("enumerate")
                if enum_type is not None and enum_type != "parallel":
                    raise RuntimeError(f"This algorithm might only work for discrete sites with enumerate marked 'parallel'.")
                if enum_type is None and not v["fn"].has_enumerate_support:
                    raise RuntimeError(
                        f"MCMC marginalization requires discrete site '{k}' "
                        "to have enumerate support."
                    )
                has_enumerate_support = True
            else:
                support = v["fn"].support
                with handlers.block():
                    inv_transforms[k] = biject_to(support)
                # heuristics: if the support depends on traced values, the
                # model must be replayed for postprocessing
                if callable(support) and hasattr(support, "__dict__"):
                    for attr in support.__dict__.values():
                        if isinstance(attr, jax.core.Tracer):
                            replay_model = True
        elif v["type"] == "deterministic":
            replay_model = True
    return inv_transforms, replay_model, has_enumerate_support, model_trace


def get_transforms(model, model_args, model_kwargs, params=None):
    """Dict of per-site biject_to transforms of the model."""
    substituted = (
        handlers.substitute(model, data=params) if params is not None else model
    )
    inv_transforms, _, _, _ = _get_model_transforms(
        substituted, model_args, model_kwargs
    )
    return inv_transforms


def get_potential_fn(
    model,
    inv_transforms,
    *,
    enum=False,
    replay_model=False,
    dynamic_args=False,
    model_args=(),
    model_kwargs=None,
):
    """Build (potential_fn, postprocess_fn) closures (reference:
    infer/util.py:546-611)."""
    if dynamic_args:

        def potential_fn(*args, **kwargs):
            result = partial(potential_energy, model, args, kwargs, enum=enum)
            return result

        def postprocess_fn(*args, **kwargs):
            if replay_model:
                return partial(
                    constrain_fn, model, args, kwargs, return_deterministic=True
                )
            else:
                return partial(transform_fn, inv_transforms)

    else:
        model_kwargs = {} if model_kwargs is None else model_kwargs
        potential_fn = partial(
            potential_energy, model, model_args, model_kwargs, enum=enum
        )
        if replay_model:
            postprocess_fn = partial(
                constrain_fn,
                model,
                model_args,
                model_kwargs,
                return_deterministic=True,
            )
        else:
            postprocess_fn = partial(transform_fn, inv_transforms)

    return potential_fn, postprocess_fn


def initialize_model(
    rng_key,
    model,
    *,
    init_strategy=init_to_uniform,
    dynamic_args=False,
    model_args=(),
    model_kwargs=None,
    forward_mode_differentiation=False,
    validate_grad=True,
):
    """Trace the model, build potential/postprocess closures, and find valid
    initial params (reference: infer/util.py:632-800).

    ``rng_key`` may be a batch of keys — initialization is then vectorized
    over chains inside a single program.
    """
    model_kwargs = {} if model_kwargs is None else model_kwargs
    substituted_model = handlers.substitute(
        handlers.seed(model, rng_key if is_prng_key(rng_key) else rng_key[0]),
        substitute_fn=init_strategy
        if isinstance(init_strategy, partial)
        else init_strategy(),
    )
    (
        inv_transforms,
        replay_model,
        has_enumerate_support,
        model_trace,
    ) = _get_model_transforms(substituted_model, model_args, model_kwargs)

    if has_enumerate_support:
        from numpyro_tpu.contrib.enum import enum as enum_handler, config_enumerate

        max_plate_nesting = _guess_max_plate_nesting(model_trace)
        model = enum_handler(
            config_enumerate(model), first_available_dim=-1 - max_plate_nesting
        )

    enum = has_enumerate_support
    potential_fn, postprocess_fn = get_potential_fn(
        model,
        inv_transforms,
        enum=enum,
        replay_model=replay_model,
        dynamic_args=dynamic_args,
        model_args=model_args,
        model_kwargs=model_kwargs,
    )

    init_strategy_ = (
        init_strategy if isinstance(init_strategy, partial) else init_strategy()
    )

    prototype_params = transform_fn(
        inv_transforms,
        {
            k: v["value"]
            for k, v in model_trace.items()
            if v["type"] == "sample"
            and not v["is_observed"]
            and not v["fn"].support.is_discrete
        },
        invert=True,
    )

    (init_params, pe, grad), is_valid = find_valid_initial_params(
        rng_key,
        substituted_model if not enum else model,
        init_strategy=init_strategy_,
        enum=enum,
        model_args=model_args,
        model_kwargs=model_kwargs,
        prototype_params=prototype_params,
        forward_mode_differentiation=forward_mode_differentiation,
        validate_grad=validate_grad,
    )

    if not_jax_tracer(is_valid):
        if device_get(~jnp.all(is_valid)):
            raise RuntimeError(
                "Cannot find valid initial parameters. Please check your model "
                "again."
            )

    return ModelInfo(
        ParamInfo(init_params, pe, grad), potential_fn, postprocess_fn, model_trace
    )


def _guess_max_plate_nesting(model_trace):
    """Largest -dim over all plates in a trace."""
    sites = [site for site in model_trace.values() if site["type"] == "sample"]
    dims = [
        frame.dim
        for site in sites
        for frame in site["cond_indep_stack"]
        if frame.dim is not None
    ]
    return -min(dims) if dims else 0


def _predictive(
    rng_key,
    model,
    posterior_samples,
    batch_shape,
    return_sites=None,
    infer_discrete=False,
    parallel=True,
    model_args=(),
    model_kwargs={},
    exclude_deterministic=True,
):
    masked_model = handlers.mask(model, mask=False)

    def single_prediction(val):
        rng_key, samples = val
        if infer_discrete:
            # sample enumerated discrete sites from their conditional
            # posterior given the continuous draw (contrib.enum VE engine)
            from numpyro_tpu.contrib.enum import infer_discrete as _infer_discrete

            rng_key, discrete_key = random.split(rng_key)
            conditioned = handlers.substitute(model, samples)
            first_available_dim = -1 - _guess_max_plate_nesting_from_model(
                conditioned, model_args, model_kwargs, rng_key
            )
            sampled_model = _infer_discrete(
                conditioned,
                first_available_dim=first_available_dim,
                temperature=1,
                rng_key=discrete_key,
            )
            model_trace = handlers.trace(
                handlers.seed(handlers.mask(sampled_model, mask=False), rng_key)
            ).get_trace(*model_args, **model_kwargs)
        else:
            substituted_model = handlers.substitute(masked_model, samples)
            model_trace = handlers.trace(
                handlers.seed(substituted_model, rng_key)
            ).get_trace(*model_args, **model_kwargs)
        if return_sites is not None:
            if return_sites == "":
                sites = {
                    k for k, site in model_trace.items() if site["type"] != "plate"
                }
            else:
                sites = return_sites
        else:
            sites = {
                k
                for k, site in model_trace.items()
                if (site["type"] == "sample" and k not in samples)
                or (site["type"] == "deterministic")
            }
        return {
            name: site["value"]
            for name, site in model_trace.items()
            if name in sites
        }

    num_samples = int(np.prod(batch_shape))
    key_shape = rng_key.shape
    if num_samples > 1:
        rng_key = random.split(rng_key, num_samples)
    rng_key = rng_key.reshape(batch_shape + key_shape)
    chunk_size = num_samples if parallel else 1
    return soft_vmap(
        single_prediction,
        (rng_key, posterior_samples),
        len(batch_shape),
        chunk_size,
    )


class Predictive:
    """Prior/posterior predictive sampler (reference: infer/util.py:803-1091).

    Vectorized via soft_vmap (chunked vmap) — memory-bounded fan-out on chip.
    """

    def __init__(
        self,
        model: Callable,
        posterior_samples=None,
        *,
        guide=None,
        params=None,
        num_samples=None,
        return_sites=None,
        infer_discrete=False,
        parallel=False,
        batch_ndims=None,
        exclude_deterministic=True,
    ):
        if posterior_samples is None and num_samples is None:
            raise ValueError(
                "Either posterior_samples or num_samples must be specified."
            )
        if posterior_samples is not None and num_samples is not None:
            sample_len = len(next(iter(posterior_samples.values()), np.empty((0,))))

        batch_ndims = (
            batch_ndims
            if batch_ndims is not None
            else 1
            if (posterior_samples is not None or guide is not None)
            else 0
        )

        posterior_samples = {} if posterior_samples is None else posterior_samples

        prototype_site = batch_shape = batch_size = None
        for name, sample in posterior_samples.items():
            if batch_shape is not None and sample.shape[:batch_ndims] != batch_shape:
                raise ValueError(
                    f"Batch shapes at site {name} and {prototype_site} "
                    f"should be the same, but got "
                    f"{sample.shape[:batch_ndims]} and {batch_shape}"
                )
            else:
                prototype_site = name
                batch_shape = sample.shape[:batch_ndims]
                batch_size = int(np.prod(batch_shape))
                if (num_samples is not None) and (num_samples != batch_size):
                    warnings.warn(
                        "Sample's batch dimension size {} is different from the "
                        "provided {} num_samples argument. Defaulting to {}.".format(
                            batch_size, num_samples, batch_size
                        ),
                        UserWarning,
                        stacklevel=2,
                    )
                num_samples = batch_size

        if num_samples is None:
            raise ValueError(
                "No sample sites in posterior samples to infer `num_samples`."
            )

        if batch_shape is None:
            batch_shape = (1,) * (batch_ndims - 1) + (num_samples,)

        if return_sites is not None:
            assert isinstance(return_sites, (list, tuple, set))

        self.model = model
        self.posterior_samples = {} if posterior_samples is None else posterior_samples
        self.num_samples = num_samples
        self.guide = guide
        self.params = {} if params is None else params
        self.infer_discrete = infer_discrete
        self.return_sites = return_sites
        self.parallel = parallel
        self.batch_ndims = batch_ndims
        self._batch_shape = batch_shape
        self.exclude_deterministic = exclude_deterministic

    def _call_with_params(self, rng_key, params, args, kwargs):
        posterior_samples = self.posterior_samples
        if self.guide is not None:
            rng_key, guide_rng_key = random.split(rng_key)
            # use return_sites='' as a special signal to return all sites
            guide = handlers.substitute(self.guide, params)
            posterior_samples = _predictive(
                guide_rng_key,
                guide,
                posterior_samples,
                self._batch_shape,
                return_sites="",
                parallel=self.parallel,
                model_args=args,
                model_kwargs=kwargs,
            )
        model = handlers.substitute(self.model, self.params)
        return _predictive(
            rng_key,
            model,
            posterior_samples,
            self._batch_shape,
            return_sites=self.return_sites,
            infer_discrete=self.infer_discrete,
            parallel=self.parallel,
            model_args=args,
            model_kwargs=kwargs,
            exclude_deterministic=self.exclude_deterministic,
        )

    def __call__(self, rng_key, *args, **kwargs):
        if self.batch_ndims == 0 or self.params == {} or self.guide is None:
            return self._call_with_params(rng_key, self.params, args, kwargs)
        elif self.batch_ndims == 1:  # batch over parameters
            batch_size = jnp.shape(jax.tree.flatten(self.params)[0][0])[0]
            rng_keys = random.split(rng_key, batch_size)
            return jax.vmap(
                partial(self._call_with_params, args=args, kwargs=kwargs),
                in_axes=0,
                out_axes=1,
            )(rng_keys, self.params)
        else:
            raise NotImplementedError


def log_likelihood(
    model, posterior_samples, *args, parallel=False, batch_ndims=1, **kwargs
):
    """Per-observation log-probs of observed sites over posterior samples
    (reference: infer/util.py:1094-1147)."""
    batch_size = int(
        np.prod(
            jax.tree.flatten(
                jax.tree.map(lambda x: jnp.shape(x)[:batch_ndims], posterior_samples)
            )[0][0:batch_ndims]
        )
    ) if posterior_samples else 1

    def single_loglik(samples):
        substituted_model = (
            handlers.substitute(model, samples) if isinstance(samples, dict) else model
        )
        model_trace = handlers.trace(substituted_model).get_trace(*args, **kwargs)
        return {
            name: site["fn"].log_prob(site["value"])
            for name, site in model_trace.items()
            if site["type"] == "sample" and site["is_observed"]
        }

    prototype_site = batch_shape = None
    for name, sample in posterior_samples.items():
        if batch_shape is not None and jnp.shape(sample)[:batch_ndims] != batch_shape:
            raise ValueError(
                f"Batch shapes at site {name} and {prototype_site} "
                f"should be the same, but got "
                f"{sample.shape[:batch_ndims]} and {batch_shape}"
            )
        else:
            prototype_site = name
            batch_shape = jnp.shape(sample)[:batch_ndims]

    if batch_shape is None:  # posterior_samples is an empty dict
        batch_shape = (1,) * batch_ndims
        posterior_samples = np.zeros(batch_shape)

    batch_size = int(np.prod(batch_shape))
    chunk_size = batch_size if parallel else 1
    return soft_vmap(single_loglik, posterior_samples, len(batch_shape), chunk_size)


def _guess_max_plate_nesting_from_model(model, model_args, model_kwargs, rng_key):
    """Trace once (seeded) to find the deepest plate dim."""
    with handlers.block():
        tr = handlers.trace(handlers.seed(model, rng_key)).get_trace(
            *model_args, **model_kwargs
        )
    return _guess_max_plate_nesting(tr)
