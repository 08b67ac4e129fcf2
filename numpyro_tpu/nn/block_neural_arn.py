"""Block Neural Autoregressive network (De Cao, Titov & Aziz), backing the
BNAF flow (reference: numpyro/nn/block_neural_arn.py).  Each layer is a
block lower-triangular linear map with positive diagonal blocks (weight
normalized); the per-block log-Jacobians accumulate through the network with
``logmatmulexp``."""

import numpy as np

import jax.numpy as jnp
from jax import random
from jax.example_libraries import stax
from jax.nn import sigmoid, softplus
from jax.nn.initializers import glorot_uniform, normal, uniform

from numpyro_tpu.distributions.util import logmatmulexp, vec_to_tril_matrix


def BlockMaskedDense(num_blocks, in_factor, out_factor, bias=True, W_init=glorot_uniform()):
    """Linear layer over block lower-triangular matrices with positive
    diagonal blocks + weight normalization (arXiv:1602.07868)."""
    input_dim, out_dim = num_blocks * in_factor, num_blocks * out_factor
    # diagonal-block mask and strictly-lower-block mask
    mask_d = np.identity(num_blocks)[..., None]
    mask_d = np.tile(mask_d, (1, in_factor, out_factor)).reshape(input_dim, out_dim)
    mask_o = vec_to_tril_matrix(
        jnp.ones(num_blocks * (num_blocks - 1) // 2), diagonal=-1
    ).T[..., None]
    mask_o = jnp.tile(mask_o, (1, in_factor, out_factor)).reshape(input_dim, out_dim)

    def init_fun(rng, input_shape):
        assert input_dim == input_shape[-1]
        *k1, k2, k3 = random.split(rng, num_blocks + 2)
        W = jnp.zeros((input_dim, out_dim))
        for i in range(num_blocks):
            W = W.at[: (i + 1) * in_factor, i * out_factor : (i + 1) * out_factor].set(
                W_init(k1[i], ((i + 1) * in_factor, out_factor))
            )
        ws = jnp.log(uniform(1.0)(k2, (out_dim,)))
        if bias:
            b = (uniform(1.0)(k3, (out_dim,)) - 0.5) * (2 / jnp.sqrt(out_dim))
            params = (W, ws, b)
        else:
            params = (W, ws)
        return input_shape[:-1] + (out_dim,), params

    def apply_fun(params, inputs, **kwargs):
        x, logdet = inputs
        if bias:
            W, ws, b = params
        else:
            W, ws = params
        # exp on diagonal blocks keeps them positive; weight-normalize columns
        w = jnp.exp(W) * mask_d + W * mask_o
        w_norm = jnp.linalg.norm(w, axis=-2, keepdims=True)
        w = jnp.exp(ws) * w / w_norm
        out = jnp.dot(x, w)
        if bias:
            out = out + b
        dense_logdet = ws + W - jnp.log(w_norm)
        dense_logdet = dense_logdet[mask_d.astype(bool)].reshape(
            num_blocks, in_factor, out_factor
        )
        if logdet is None:
            logdet = jnp.broadcast_to(dense_logdet, x.shape[:-1] + dense_logdet.shape)
        else:
            logdet = logmatmulexp(logdet, dense_logdet)
        return out, logdet

    return init_fun, apply_fun


def Tanh():
    """tanh with its blockwise log-Jacobian."""

    def init_fun(rng, input_shape):
        return input_shape, ()

    def apply_fun(params, inputs, **kwargs):
        x, logdet = inputs
        out = jnp.tanh(x)
        tanh_logdet = -2 * (x + softplus(-2 * x) - jnp.log(2.0))
        tanh_logdet = tanh_logdet.reshape(logdet.shape[:-2] + (1, logdet.shape[-1]))
        return out, logdet + tanh_logdet

    return init_fun, apply_fun


def LeakyTanh(min_grad: float = 0.01):
    """tanh(x) + c*x — keeps the flow surjective onto the reals."""

    def init_fun(rng, input_shape):
        return input_shape, ()

    def apply_fun(params, inputs, **kwargs):
        x, logdet = inputs
        out = jnp.tanh(x) + min_grad * x
        tanh_logdet = -2 * (x + softplus(-2 * x) - jnp.log(2.0))
        act_logdet = jnp.logaddexp(tanh_logdet, jnp.log(min_grad))
        act_logdet = act_logdet.reshape(logdet.shape[:-2] + (1, logdet.shape[-1]))
        return out, logdet + act_logdet

    return init_fun, apply_fun


def FanInResidualNormal():
    """Residual fan-in (second branch must be identity), tracking logdet."""

    def init_fun(rng, input_shape):
        return input_shape[0], ()

    def apply_fun(params, inputs, **kwargs):
        (fx, logdet), (x, _) = inputs
        return fx + x, softplus(logdet)

    return init_fun, apply_fun


def FanInResidualGated(gate_init=normal(1.0)):
    """Gated residual fan-in with a learnable interpolation gate."""

    def init_fun(rng, input_shape):
        return input_shape[0], gate_init(rng, ())

    def apply_fun(params, inputs, **kwargs):
        (fx, logdet), (x, _) = inputs
        gate = sigmoid(params)
        out = gate * fx + (1 - gate) * x
        logdet = softplus(logdet + params) - softplus(params)
        return out, logdet

    return init_fun, apply_fun


def BlockNeuralAutoregressiveNN(
    input_dim, hidden_factors=[8, 8], residual=None, activation=None
):
    """stax-style ``(init_fn, apply_fn)``: apply returns ``(y, logdet)``
    where logdet has the input's shape."""
    layers = []
    in_factor = 1
    activation = LeakyTanh() if activation is None else activation
    for hidden_factor in hidden_factors:
        layers.append(BlockMaskedDense(input_dim, in_factor, hidden_factor))
        layers.append(activation)
        in_factor = hidden_factor
    layers.append(BlockMaskedDense(input_dim, in_factor, 1))
    arn = stax.serial(*layers)
    if residual is not None:
        FanInResidual = (
            FanInResidualGated if residual == "gated" else FanInResidualNormal
        )
        arn = stax.serial(
            stax.FanOut(2), stax.parallel(arn, stax.Identity), FanInResidual()
        )

    def init_fun(rng, input_shape):
        return arn[0](rng, input_shape)

    def apply_fun(params, inputs, **kwargs):
        out, logdet = arn[1](params, (inputs, None), **kwargs)
        return out, logdet.reshape(inputs.shape)

    return init_fun, apply_fun
