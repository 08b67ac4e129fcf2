"""MADE-style autoregressive network (Germain et al., arXiv:1502.03509),
backing the IAF flow (reference: numpyro/nn/auto_reg_nn.py)."""

import numpy as np

import jax.numpy as jnp
from jax.example_libraries import stax

from numpyro_tpu.nn.masked_dense import MaskedDense


def sample_mask_indices(input_dim, hidden_dim):
    """Evenly assign degrees 1..input_dim to hidden units."""
    return jnp.round(jnp.linspace(1, input_dim, num=hidden_dim))


def create_mask(input_dim, hidden_dims, permutation, output_dim_multiplier):
    """MADE masks for the given ordering; returns (layer masks, skip mask)."""
    var_index = jnp.zeros(permutation.shape[0])
    var_index = var_index.at[permutation].set(jnp.arange(input_dim))
    input_indices = 1 + var_index
    hidden_indices = [sample_mask_indices(input_dim - 1, h) for h in hidden_dims]
    output_indices = jnp.tile(var_index + 1, output_dim_multiplier)

    mask_skip = output_indices[None, :] > input_indices[:, None]
    masks = [hidden_indices[0][None, :] >= input_indices[:, None]]
    for i in range(1, len(hidden_dims)):
        masks.append(hidden_indices[i][None, :] >= hidden_indices[i - 1][:, None])
    masks.append(output_indices[None, :] > hidden_indices[-1][:, None])
    return masks, mask_skip


def AutoregressiveNN(
    input_dim,
    hidden_dims,
    param_dims=[1, 1],
    permutation=None,
    skip_connections=False,
    nonlinearity=stax.Relu,
):
    """stax-style ``(init_fn, apply_fn)`` MADE network whose outputs respect
    the autoregressive ordering (each output i depends only on inputs < i
    under ``permutation``)."""
    output_multiplier = sum(param_dims)
    all_ones = (np.array(param_dims) == 1).all()
    ends = np.cumsum(np.array(param_dims), axis=0)
    starts = np.concatenate((np.zeros(1), ends[:-1]))
    param_slices = [slice(int(s), int(e)) for s, e in zip(starts, ends)]

    for h in hidden_dims:
        if h < input_dim:
            raise ValueError("Hidden dimension must not be less than input dimension.")
    if permutation is None:
        permutation = jnp.arange(input_dim)

    masks, mask_skip = create_mask(
        input_dim=input_dim,
        hidden_dims=hidden_dims,
        permutation=permutation,
        output_dim_multiplier=output_multiplier,
    )

    main_layers = []
    for i, mask in enumerate(masks):
        main_layers.append(MaskedDense(mask))
        if i < len(masks) - 1:
            main_layers.append(nonlinearity)

    if skip_connections:
        net_init, net = stax.serial(
            stax.FanOut(2),
            stax.parallel(
                stax.serial(*main_layers), MaskedDense(mask_skip, bias=False)
            ),
            stax.FanInSum,
        )
    else:
        net_init, net = stax.serial(*main_layers)

    def init_fun(rng_key, input_shape):
        assert input_dim == input_shape[-1]
        return net_init(rng_key, input_shape)

    def apply_fun(params, inputs, **kwargs):
        out = net(params, inputs, **kwargs)
        out = jnp.reshape(out, inputs.shape[:-1] + (output_multiplier, input_dim))
        out = jnp.moveaxis(out, -2, 0)
        if all_ones:
            out = tuple(out[i] for i in range(output_multiplier))
        else:
            out = tuple(out[s] for s in param_slices)
        return out[0] if len(param_dims) == 1 else out

    return init_fun, apply_fun
