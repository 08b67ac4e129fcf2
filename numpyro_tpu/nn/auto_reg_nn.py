"""MADE-style autoregressive network (Germain et al., arXiv:1502.03509),
backing the IAF flow.

Role parity: numpyro/nn/auto_reg_nn.py, but stax-free: the network is a
plain list of ``(weight, bias)`` pairs applied in an explicit loop, and the
autoregressive masks are host-side numpy (so they never become baked
device constants in jitted programs).  API: ``AutoregressiveNN(...)``
returns a stax-compatible ``(init_fn, apply_fn)`` pair.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax import random
from jax.nn.initializers import glorot_normal, normal


def _build_masks(input_dim, hidden_dims, permutation, out_mult):
    """Connectivity masks: hidden units pass degree >=, outputs require
    strict > (so output i never sees input i).

    Input degree of position p is its rank (1-based) under ``permutation``;
    hidden degrees spread evenly over 1..input_dim-1.  Masks stay host
    numpy when the permutation is concrete; a traced permutation (e.g. the
    IAF guide permuting under jit) switches the degree comparisons to jnp.
    """
    hidden_degs = [
        np.round(np.linspace(1, max(input_dim - 1, 1), h)) for h in hidden_dims
    ]
    try:
        perm = np.asarray(permutation)
        rank = np.empty(input_dim)
        rank[perm] = np.arange(input_dim)
        xp = np
    except Exception:  # traced permutation: build masks in the trace
        rank = jnp.zeros(input_dim).at[permutation].set(jnp.arange(input_dim))
        xp = jnp
    in_deg = rank + 1.0
    out_deg = xp.tile(in_deg, out_mult)
    chain = [in_deg] + [xp.asarray(h) for h in hidden_degs]
    masks = [
        (b[None, :] >= a[:, None]).astype(xp.float32)
        for a, b in zip(chain[:-1], chain[1:])
    ]
    masks.append((out_deg[None, :] > chain[-1][:, None]).astype(xp.float32))
    skip = (out_deg[None, :] > in_deg[:, None]).astype(xp.float32)
    return masks, skip


def AutoregressiveNN(
    input_dim,
    hidden_dims,
    param_dims=[1, 1],
    permutation=None,
    skip_connections=False,
    nonlinearity=None,
):
    """Masked MLP whose k-th output block is autoregressive under
    ``permutation``; ``apply_fn`` returns one array per entry of
    ``param_dims`` (each of trailing shape ``(dim_k, input_dim)`` squeezed
    when ``dim_k == 1``)."""
    for h in hidden_dims:
        if h < input_dim:
            raise ValueError(
                "Hidden dimension must not be less than input dimension."
            )
    if permutation is None:
        permutation = np.arange(input_dim)
    if nonlinearity is None:
        activate = jax.nn.relu
    elif isinstance(nonlinearity, tuple):
        # stax-style (init, apply) pair
        _, _stax_apply = nonlinearity
        activate = lambda x: _stax_apply((), x)  # noqa: E731
    else:
        activate = nonlinearity

    out_mult = int(sum(param_dims))
    splits = np.cumsum(np.asarray(param_dims))[:-1]
    masks, skip_mask = _build_masks(
        input_dim, hidden_dims, permutation, out_mult
    )

    w_init = glorot_normal()
    b_init = normal()

    def init_fn(rng_key, input_shape):
        assert input_shape[-1] == input_dim
        params = []
        keys = random.split(rng_key, len(masks) + 1)
        for mask, key in zip(masks, keys):
            kw, kb = random.split(key)
            params.append(
                (w_init(kw, mask.shape), b_init(kb, (mask.shape[1],)))
            )
        if skip_connections:
            params.append((w_init(keys[-1], skip_mask.shape), None))
        return input_shape[:-1] + (out_mult * input_dim,), params

    def apply_fn(params, x, **kwargs):
        layers = params[: len(masks)]
        h = x
        for depth, ((w, b), mask) in enumerate(zip(layers, masks)):
            h = h @ (w * jnp.asarray(mask)) + b
            if depth < len(masks) - 1:
                h = activate(h)
        if skip_connections:
            w_skip, _ = params[len(masks)]
            h = h + x @ (w_skip * jnp.asarray(skip_mask))
        blocks = jnp.moveaxis(
            h.reshape(x.shape[:-1] + (out_mult, input_dim)), -2, 0
        )
        if len(param_dims) == 1:
            return blocks[0] if param_dims[0] == 1 else blocks
        pieces = jnp.split(blocks, splits, axis=0)
        return tuple(
            p[0] if d == 1 else p for p, d in zip(pieces, param_dims)
        )

    return init_fn, apply_fn
