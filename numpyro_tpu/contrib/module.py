"""Bridges registering flax / haiku neural-net parameters as numpyro_tpu
sites (reference: numpyro/contrib/module.py:27-517).

``*_module`` registers net params as ``param`` sites (optimized by SVI);
``random_*_module`` lifts them to ``sample`` sites under a prior — a
Bayesian neural network in one line.
"""

from __future__ import annotations

from collections import namedtuple
from copy import deepcopy
from functools import partial

import jax
import jax.numpy as jnp
from jax import random
from jax.tree_util import register_pytree_node

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.primitives import mutable as numpyro_mutable

__all__ = [
    "flax_module",
    "haiku_module",
    "random_flax_module",
    "random_haiku_module",
]

ParamShape = namedtuple("ParamShape", ["shape"])
register_pytree_node(
    ParamShape, lambda x: ((None,), x.shape), lambda shape, x: ParamShape(shape)
)


def flax_module(
    name, nn_module, *args, input_shape=None, apply_rng=None, mutable=None, **kwargs
):
    """Register a flax.linen Module's params as a ``param`` site; returns a
    bound apply callable."""
    try:
        import flax
    except ImportError as e:  # pragma: no cover
        raise ImportError("flax_module requires flax to be installed.") from e

    module_key = name + "$params"
    nn_params = numpyro_tpu.param(module_key)
    nn_state = None
    if mutable:
        nn_state = numpyro_mutable(name + "$state")
        assert nn_state is None or isinstance(nn_state, dict)
        assert (nn_state is None) == (nn_params is None)

    if nn_params is None:
        args = (jnp.ones(input_shape),) if input_shape is not None else args
        rng_key = numpyro_tpu.prng_key()
        if rng_key is None:
            rng_key = random.key(0)
        rngs = {}
        if apply_rng:
            assert isinstance(apply_rng, list)
            for kind in apply_rng:
                rng_key, subkey = random.split(rng_key)
                rngs[kind] = subkey
        rngs["params"] = rng_key
        nn_vars = flax.core.unfreeze(nn_module.init(rngs, *args, **kwargs))
        if "params" not in nn_vars:
            raise ValueError(
                "nn_module has no parameters; numpyro_tpu requires at least one."
            )
        nn_params = nn_vars["params"]
        if mutable:
            nn_state = {k: v for k, v in nn_vars.items() if k != "params"}
            assert set(mutable) == set(nn_state)
            numpyro_mutable(name + "$state", nn_state)
        numpyro_tpu.param(module_key, nn_params)

    if mutable:

        def apply_with_state(params, *args, **kwargs):
            params = {"params": params, **nn_state}
            out, new_state = nn_module.apply(params, mutable=mutable, *args, **kwargs)
            new_state = jax.lax.stop_gradient(new_state)
            nn_state.update(**new_state)
            return out

        return partial(apply_with_state, nn_params)

    def apply_without_state(params, *args, **kwargs):
        return nn_module.apply({"params": params}, *args, **kwargs)

    return partial(apply_without_state, nn_params)


def haiku_module(name, nn_module, *args, input_shape=None, apply_rng=False, **kwargs):
    """Register a haiku Transformed(WithState) module's params as a ``param``
    site; returns a bound apply callable."""
    try:
        import haiku as hk
    except ImportError as e:  # pragma: no cover
        raise ImportError("haiku_module requires dm-haiku to be installed.") from e

    if not apply_rng:
        nn_module = hk.without_apply_rng(nn_module)

    module_key = name + "$params"
    nn_params = numpyro_tpu.param(module_key)
    with_state = isinstance(nn_module, hk.TransformedWithState)
    nn_state = None
    if with_state:
        nn_state = numpyro_mutable(name + "$state")
        assert nn_state is None or isinstance(nn_state, dict)
        assert (nn_state is None) == (nn_params is None)

    if nn_params is None:
        args = (jnp.ones(input_shape),) if input_shape is not None else args
        rng_key = numpyro_tpu.prng_key()
        if rng_key is None:
            rng_key = random.key(0)
        if with_state:
            nn_params, nn_state = nn_module.init(rng_key, *args, **kwargs)
            nn_state = dict(nn_state)
            numpyro_mutable(name + "$state", nn_state)
        else:
            nn_params = nn_module.init(rng_key, *args, **kwargs)
        nn_params = hk.data_structures.to_mutable_dict(nn_params)
        numpyro_tpu.param(module_key, nn_params)

    if with_state:

        def apply_with_state(params, *args, **kwargs):
            out, new_state = nn_module.apply(params, nn_state, *args, **kwargs)
            new_state = jax.lax.stop_gradient(new_state)
            nn_state.update(**new_state)
            return out

        return partial(apply_with_state, nn_params)

    return partial(nn_module.apply, nn_params)


def _update_params(params, new_params, prior, prefix=""):
    """Recursively replace leaf params with prior samples (records shapes
    via ParamShape so re-runs keep the site structure)."""
    for name, item in params.items():
        flatten_name = ".".join([prefix, name]) if prefix else name
        if isinstance(item, dict):
            assert not isinstance(prior, dict) or flatten_name not in prior
            _update_params(item, new_params[name], prior, prefix=flatten_name)
        elif (not isinstance(prior, dict)) or flatten_name in prior:
            if isinstance(params[name], ParamShape):
                param_shape = params[name].shape
            else:
                param_shape = jnp.shape(params[name])
                params[name] = ParamShape(param_shape)
            if isinstance(prior, dict):
                d = prior[flatten_name]
            elif callable(prior) and not isinstance(prior, dist.Distribution):
                d = prior(flatten_name, param_shape)
            else:
                d = prior
            param_batch_shape = param_shape[: len(param_shape) - d.event_dim]
            new_params[name] = numpyro_tpu.sample(
                flatten_name, d.expand(param_batch_shape).to_event()
            )


def random_flax_module(
    name,
    nn_module,
    prior,
    *args,
    input_shape=None,
    apply_rng=None,
    mutable=None,
    **kwargs,
):
    """flax module with a prior over its parameters (Bayesian NN)."""
    nn = flax_module(
        name,
        nn_module,
        *args,
        input_shape=input_shape,
        apply_rng=apply_rng,
        mutable=mutable,
        **kwargs,
    )
    params = nn.args[0]
    new_params = deepcopy(params)
    with numpyro_tpu.handlers.scope(prefix=name):
        _update_params(params, new_params, prior)
    return partial(nn.func, new_params, *nn.args[1:], **nn.keywords)


def random_haiku_module(
    name, nn_module, prior, *args, input_shape=None, apply_rng=False, **kwargs
):
    """haiku module with a prior over its parameters (Bayesian NN)."""
    nn = haiku_module(
        name, nn_module, *args, input_shape=input_shape, apply_rng=apply_rng, **kwargs
    )
    params = nn.args[0]
    new_params = deepcopy(params)
    with numpyro_tpu.handlers.scope(prefix=name):
        _update_params(params, new_params, prior)
    return partial(nn.func, new_params, *nn.args[1:], **nn.keywords)
