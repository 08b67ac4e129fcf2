"""Bridges registering flax.linen / haiku / flax.nnx network parameters as
numpyro_tpu sites.

Role parity: numpyro/contrib/module.py:27-580.  The three framework
bridges share one registration core here: `_lift_to_sites` handles the
param/mutable bookkeeping and `_bayesianize` the prior lifting, so each
framework contributes only an init/apply adapter.

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
    "nnx_module",
    "random_flax_module",
    "random_haiku_module",
    "random_nnx_module",
]

ParamShape = namedtuple("ParamShape", ["shape"])
"""Shape-only placeholder left in a param site once its leaf has been
lifted to a sample site — keeps structure for re-runs without giving the
optimizer anything to update."""

register_pytree_node(
    ParamShape, lambda x: ((None,), x.shape), lambda shape, x: ParamShape(shape)
)


def _model_rng():
    key = numpyro_tpu.prng_key()
    return random.key(0) if key is None else key


def _dummy_args(args, input_shape):
    return (jnp.ones(input_shape),) if input_shape is not None else args


def _sample_leaf(site_name, leaf, prior):
    """Draw a prior sample shaped like ``leaf`` (all dims -> event dims)."""
    shape = leaf.shape if isinstance(leaf, ParamShape) else jnp.shape(leaf)
    if isinstance(prior, dict):
        d = prior[site_name]
    elif callable(prior) and not isinstance(prior, dist.Distribution):
        d = prior(site_name, shape)
    else:
        d = prior
    batch = shape[: len(shape) - d.event_dim]
    return numpyro_tpu.sample(site_name, d.expand(batch).to_event())


def _bayesianize(scope_name, params, prior):
    """Replace selected leaves of a nested param dict with prior samples.

    Mutates ``params`` in place to hold :class:`ParamShape` markers (so the
    optimizer skips them on later traces) and returns a new dict with the
    sampled values.  Selection: every leaf, or only the dotted names listed
    when ``prior`` is a dict.
    """
    sampled = deepcopy(params)

    def visit(node, out, prefix):
        for key, leaf in node.items():
            path = f"{prefix}.{key}" if prefix else key
            if isinstance(leaf, dict):
                assert not isinstance(prior, dict) or path not in prior
                visit(leaf, out[key], path)
            elif not isinstance(prior, dict) or path in prior:
                out[key] = _sample_leaf(path, leaf, prior)
                if not isinstance(leaf, ParamShape):
                    node[key] = ParamShape(jnp.shape(leaf))

    with numpyro_tpu.handlers.scope(prefix=scope_name):
        visit(params, sampled, "")
    return sampled


def _rebind(bound_apply, new_params):
    """Swap the params of a partial returned by a ``*_module`` bridge."""
    return partial(
        bound_apply.func, new_params, *bound_apply.args[1:],
        **bound_apply.keywords,
    )


# ---------------------------------------------------------------------------
# flax.linen


def flax_module(
    name, nn_module, *args, input_shape=None, apply_rng=None, mutable=None, **kwargs
):
    """Register a flax.linen Module's params as a ``param`` site; returns a
    bound apply callable."""
    try:
        import flax
    except ImportError as e:  # pragma: no cover
        raise ImportError("flax_module requires flax to be installed.") from e

    nn_params = numpyro_tpu.param(name + "$params")
    nn_state = None
    if mutable:
        nn_state = numpyro_mutable(name + "$state")
        assert nn_state is None or isinstance(nn_state, dict)
        assert (nn_state is None) == (nn_params is None)

    if nn_params is None:
        init_args = _dummy_args(args, input_shape)
        rng_key = _model_rng()
        rngs = {}
        for kind in apply_rng or ():
            rng_key, rngs[kind] = random.split(rng_key)
        rngs["params"] = rng_key
        variables = flax.core.unfreeze(nn_module.init(rngs, *init_args, **kwargs))
        if "params" not in variables:
            raise ValueError(
                "nn_module has no parameters; numpyro_tpu requires at least one."
            )
        nn_params = variables.pop("params")
        if mutable:
            nn_state = variables
            assert set(mutable) == set(nn_state)
            numpyro_mutable(name + "$state", nn_state)
        numpyro_tpu.param(name + "$params", nn_params)

    if mutable:

        def apply_mutable(params, *a, **kw):
            out, new_state = nn_module.apply(
                {"params": params, **nn_state}, mutable=mutable, *a, **kw
            )
            nn_state.update(**jax.lax.stop_gradient(new_state))
            return out

        return partial(apply_mutable, nn_params)

    def apply_pure(params, *a, **kw):
        return nn_module.apply({"params": params}, *a, **kw)

    return partial(apply_pure, nn_params)


def random_flax_module(
    name, nn_module, prior, *args, input_shape=None, apply_rng=None,
    mutable=None, **kwargs,
):
    """flax.linen module with a prior over its parameters (Bayesian NN)."""
    nn = flax_module(
        name, nn_module, *args, input_shape=input_shape, apply_rng=apply_rng,
        mutable=mutable, **kwargs,
    )
    return _rebind(nn, _bayesianize(name, nn.args[0], prior))


# ---------------------------------------------------------------------------
# haiku


def haiku_module(name, nn_module, *args, input_shape=None, apply_rng=False, **kwargs):
    """Register a haiku Transformed(WithState) module's params as a
    ``param`` site; returns a bound apply callable."""
    try:
        import haiku as hk
    except ImportError as e:  # pragma: no cover
        raise ImportError("haiku_module requires dm-haiku to be installed.") from e

    if not apply_rng:
        nn_module = hk.without_apply_rng(nn_module)
    with_state = isinstance(nn_module, hk.TransformedWithState)

    nn_params = numpyro_tpu.param(name + "$params")
    nn_state = None
    if with_state:
        nn_state = numpyro_mutable(name + "$state")
        assert nn_state is None or isinstance(nn_state, dict)
        assert (nn_state is None) == (nn_params is None)

    if nn_params is None:
        init_args = _dummy_args(args, input_shape)
        rng_key = _model_rng()
        if with_state:
            nn_params, nn_state = nn_module.init(rng_key, *init_args, **kwargs)
            nn_state = dict(nn_state)
            numpyro_mutable(name + "$state", nn_state)
        else:
            nn_params = nn_module.init(rng_key, *init_args, **kwargs)
        # haiku's immutable mapping -> plain dict so priors can be attached
        nn_params = hk.data_structures.to_mutable_dict(nn_params)
        numpyro_tpu.param(name + "$params", nn_params)

    if with_state:

        def apply_mutable(params, *a, **kw):
            out, new_state = nn_module.apply(params, nn_state, *a, **kw)
            nn_state.update(**jax.lax.stop_gradient(new_state))
            return out

        return partial(apply_mutable, nn_params)

    return partial(nn_module.apply, nn_params)


def random_haiku_module(
    name, nn_module, prior, *args, input_shape=None, apply_rng=False, **kwargs
):
    """haiku module with a prior over its parameters (Bayesian NN)."""
    nn = haiku_module(
        name, nn_module, *args, input_shape=input_shape, apply_rng=apply_rng,
        **kwargs,
    )
    return _rebind(nn, _bayesianize(name, nn.args[0], prior))


# ---------------------------------------------------------------------------
# flax.nnx


def nnx_module(name, nn_module):
    """Register a pre-initialized flax.nnx Module's params as a ``param``
    site; non-Param state rides in a ``mutable`` site.  Usage::

        module = MyNNXModule(...)        # eager init outside the model
        net = nnx_module("net", module)  # inside the model
        y = net(x)
    """
    try:
        from flax import nnx
    except ImportError as e:  # pragma: no cover
        raise ImportError("nnx_module requires flax>=0.9 (flax.nnx).") from e

    graph_def, param_state, other_state = nnx.split(
        nn_module, nnx.Param, nnx.Not(nnx.Param)
    )
    eager_params = nnx.to_pure_dict(param_state)
    eager_other = nnx.to_pure_dict(other_state)

    nn_params = numpyro_tpu.param(name + "$params") if eager_params else None
    if nn_params is None:
        nn_params = numpyro_tpu.param(name + "$params", eager_params)
    holder = numpyro_mutable(name + "$state") if eager_other else None
    if holder is None:
        holder = numpyro_mutable(name + "$state", {"state": eager_other})

    def apply_fn(params, *a, **kw):
        if params:
            nnx.replace_by_pure_dict(param_state, params)
        if holder:
            nnx.replace_by_pure_dict(other_state, holder["state"])
        net = nnx.merge(graph_def, param_state, other_state)
        out = net(*a, **kw)
        if holder:
            _, _, new_other = nnx.split(net, nnx.Param, nnx.Not(nnx.Param))
            holder["state"] = nnx.to_pure_dict(
                jax.lax.stop_gradient(new_other)
            )
        return out

    return partial(apply_fn, nn_params)


def random_nnx_module(name, nn_module, prior):
    """flax.nnx module with a prior over its parameters (Bayesian NN)."""
    nn = nnx_module(name, nn_module)
    return _rebind(nn, _bayesianize(name, nn.args[0], prior))
