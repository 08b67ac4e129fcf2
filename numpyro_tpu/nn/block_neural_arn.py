"""Block Neural Autoregressive network (De Cao, Titov & Aziz 2019),
backing the BNAF flow.

Role parity: numpyro/nn/block_neural_arn.py, but stax-free: the network is
an explicit pipeline of layer records threading ``(x, block_logdet)``, with
host-numpy block masks (never baked as device constants).  Each linear
layer is block lower-triangular with positive (exp-parameterized,
weight-normalized) diagonal blocks; per-block log-Jacobians chain through
the depth with ``logmatmulexp``.
"""

import numpy as np

import jax.numpy as jnp
from jax import random
from jax.nn import sigmoid, softplus
from jax.nn.initializers import glorot_uniform, normal, uniform

from numpyro_tpu.distributions.util import logmatmulexp


def _block_masks(num_blocks, in_factor, out_factor):
    """(diagonal-block mask, strictly-lower-block mask) as host numpy."""
    rows, cols = np.arange(num_blocks), np.arange(num_blocks)
    block_eq = rows[:, None] == cols[None, :]
    block_lt = rows[:, None] > cols[None, :]

    def expand(block):
        return np.kron(block, np.ones((in_factor, out_factor))).astype(
            np.float32
        )

    return expand(block_eq), expand(block_lt)


def _linear_layer(num_blocks, in_factor, out_factor, bias=True):
    in_dim, out_dim = num_blocks * in_factor, num_blocks * out_factor
    mask_diag, mask_low = _block_masks(num_blocks, in_factor, out_factor)
    w_init = glorot_uniform()

    def init(rng):
        k_w, k_s, k_b = random.split(rng, 3)
        # initialize only the allowed (lower-block-triangular) region
        w = w_init(k_w, (in_dim, out_dim)) * jnp.asarray(mask_diag + mask_low)
        log_scale = jnp.log(uniform(1.0)(k_s, (out_dim,)))
        b = (
            (uniform(1.0)(k_b, (out_dim,)) - 0.5) * (2 / np.sqrt(out_dim))
            if bias
            else None
        )
        return {"w": w, "log_scale": log_scale, "b": b}

    def apply(p, x, logdet):
        md, ml = jnp.asarray(mask_diag), jnp.asarray(mask_low)
        # positive diagonal blocks via exp; weight-normalized columns
        w = jnp.exp(p["w"]) * md + p["w"] * ml
        col_norm = jnp.linalg.norm(w, axis=-2, keepdims=True)
        w = jnp.exp(p["log_scale"]) * w / col_norm
        y = x @ w
        if p["b"] is not None:
            y = y + p["b"]
        # log of the (positive) diagonal-block jacobian entries
        layer_ld = p["log_scale"] + p["w"] - jnp.log(col_norm)
        layer_ld = layer_ld.reshape(num_blocks, in_factor, num_blocks, out_factor)
        layer_ld = layer_ld[np.arange(num_blocks), :, np.arange(num_blocks), :]
        if logdet is None:
            logdet = jnp.broadcast_to(
                layer_ld, x.shape[:-1] + layer_ld.shape
            )
        else:
            logdet = logmatmulexp(logdet, layer_ld)
        return y, logdet

    return init, apply


def _tanh_layer(min_grad=0.0):
    """tanh (or tanh + min_grad * x) with its per-element log-Jacobian."""

    def init(rng):
        return ()

    def apply(p, x, logdet):
        base_ld = 2.0 * (np.log(2.0) - x - softplus(-2.0 * x))
        if min_grad > 0:
            y = jnp.tanh(x) + min_grad * x
            ld = jnp.logaddexp(base_ld, np.log(min_grad))
        else:
            y = jnp.tanh(x)
            ld = base_ld
        ld = ld.reshape(logdet.shape[:-2] + (1, logdet.shape[-1]))
        return y, logdet + ld

    return init, apply


def Tanh():
    return _tanh_layer(0.0)


def LeakyTanh(min_grad: float = 0.01):
    return _tanh_layer(min_grad)


def BlockNeuralAutoregressiveNN(
    input_dim, hidden_factors=[8, 8], residual=None, activation=None
):
    """stax-compatible ``(init_fn, apply_fn)``; ``apply_fn(params, x)``
    returns ``(y, logdet)`` with ``logdet`` of ``x``'s shape."""
    if residual not in (None, "normal", "gated"):
        raise ValueError(f"unknown residual mode {residual!r}")
    act = LeakyTanh() if activation is None else activation
    layers = []
    widths = [1] + list(hidden_factors) + [1]
    for a, b in zip(widths[:-1], widths[1:]):
        layers.append(_linear_layer(input_dim, a, b))
        layers.append(act)
    layers = layers[:-1]  # no activation after the final block layer

    def init_fn(rng, input_shape):
        assert input_shape[-1] == input_dim
        keys = random.split(rng, len(layers) + 1)
        params = [lay[0](k) for lay, k in zip(layers, keys)]
        if residual == "gated":
            params.append(normal(1.0)(keys[-1], ()))
        return input_shape[:-1] + (input_dim,), params

    def apply_fn(params, x, **kwargs):
        y, logdet = x, None
        for lay, p in zip(layers, params):
            y, logdet = lay[1](p, y, logdet)
        if residual == "normal":
            y = y + x
            logdet = softplus(logdet)
        elif residual == "gated":
            gate_raw = params[-1]
            gate = sigmoid(gate_raw)
            y = gate * y + (1 - gate) * x
            logdet = softplus(logdet + gate_raw) - softplus(gate_raw)
        return y, logdet.reshape(x.shape)

    return init_fn, apply_fn
