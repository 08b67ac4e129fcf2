"""Barker-proposal MH kernel (gradient-based, robust to step-size tuning).

Reference surface: numpyro/infer/barker.py:58-293 (Livingstone & Zanella,
"The Barker proposal: combining robustness and efficiency in gradient-based
MCMC").  Chain-massive extension over the reference: ``init``/``sample``
vmap over a leading batch of rng keys, so thousands of BarkerMH chains run
inside one XLA program (the reference restricts to one chain per call).
"""

from __future__ import annotations

from collections import namedtuple

import jax
import jax.numpy as jnp
from jax import random, vmap
from jax.flatten_util import ravel_pytree
from jax.nn import softplus
from jax.scipy.special import expit

from numpyro_tpu.infer.hmc_util import warmup_adapter
from numpyro_tpu.infer.initialization import init_to_uniform
from numpyro_tpu.infer.mcmc import MCMCKernel
from numpyro_tpu.infer.util import initialize_model
from numpyro_tpu.util import identity, is_prng_key

BarkerMHState = namedtuple(
    "BarkerMHState",
    [
        "i",
        "z",
        "potential_energy",
        "z_grad",
        "accept_prob",
        "mean_accept_prob",
        "adapt_state",
        "rng_key",
    ],
)


class BarkerMH(MCMCKernel):
    """Metropolis-Hastings with the skew-symmetric Barker proposal: the
    proposal is skewed toward the gradient direction coordinatewise, giving
    HMC-like gradient exploitation with random-walk robustness."""

    def __init__(
        self,
        model=None,
        potential_fn=None,
        step_size=1.0,
        adapt_step_size=True,
        adapt_mass_matrix=True,
        dense_mass=False,
        target_accept_prob=0.4,
        init_strategy=init_to_uniform,
    ):
        if not (model is None) ^ (potential_fn is None):
            raise ValueError("Only one of `model` or `potential_fn` must be specified.")
        self._model = model
        self._potential_fn = potential_fn
        self._step_size = step_size
        self._adapt_step_size = adapt_step_size
        self._adapt_mass_matrix = adapt_mass_matrix
        self._dense_mass = dense_mass
        self._target_accept_prob = target_accept_prob
        self._init_strategy = init_strategy
        self._postprocess_fn = None
        self._num_warmup = None
        self._wa_update = None

    @property
    def model(self):
        return self._model

    @property
    def sample_field(self):
        return "z"

    def get_diagnostics_str(self, state):
        return "step size {:.2e}. acc. prob={:.2f}".format(
            state.adapt_state.step_size, state.mean_accept_prob
        )

    def _init_state(self, rng_key, model_args, model_kwargs, init_params):
        if self._model is not None:
            (
                params_info,
                potential_fn_gen,
                self._postprocess_fn,
                _,
            ) = initialize_model(
                rng_key,
                self._model,
                dynamic_args=True,
                init_strategy=self._init_strategy,
                model_args=model_args,
                model_kwargs=model_kwargs,
            )
            if init_params is None:
                init_params = params_info[0]
            model_kwargs = {} if model_kwargs is None else model_kwargs
            self._potential_fn_gen = potential_fn_gen
            self._potential_fn = potential_fn_gen(*model_args, **model_kwargs)
        return init_params

    def _single_init(self, init_params, rng_key):
        rng_key, rng_key_wa = random.split(rng_key)
        pe, grad = jax.value_and_grad(self._potential_fn)(init_params)
        wa_init, wa_update = warmup_adapter(
            self._num_warmup,
            adapt_step_size=self._adapt_step_size,
            adapt_mass_matrix=self._adapt_mass_matrix,
            dense_mass=self._dense_mass,
            target_accept_prob=self._target_accept_prob,
        )
        self._wa_update = wa_update
        size = len(ravel_pytree(init_params)[0])
        wa_state = wa_init(
            (init_params,), rng_key_wa, self._step_size, mass_matrix_size=size
        )
        wa_state = wa_state._replace(rng_key=None)
        return BarkerMHState(
            jnp.array(0),
            init_params,
            pe,
            grad,
            jnp.zeros(()),
            jnp.zeros(()),
            wa_state,
            rng_key,
        )

    def init(self, rng_key, num_warmup, init_params=None, model_args=(), model_kwargs={}):
        self._num_warmup = num_warmup
        vectorized = not is_prng_key(rng_key)
        if vectorized:
            rng_key, rng_key_init_model = jnp.swapaxes(
                vmap(random.split)(rng_key), 0, 1
            )
        else:
            rng_key, rng_key_init_model = random.split(rng_key)
        init_params = self._init_state(
            rng_key_init_model, model_args, model_kwargs, init_params
        )
        if self._potential_fn and init_params is None:
            raise ValueError(
                "Valid value of `init_params` must be provided with `potential_fn`."
            )
        self._sample_fn = self._sample_one
        if vectorized:
            init_state = vmap(self._single_init)(init_params, rng_key)
            self._sample_fn = vmap(self._sample_one, in_axes=(0, None, None))
        else:
            init_state = self._single_init(init_params, rng_key)
        return init_state

    def postprocess_fn(self, args, kwargs):
        if self._postprocess_fn is None:
            return identity
        return self._postprocess_fn(*args, **kwargs)

    def _sample_one(self, state, model_args, model_kwargs):
        i, x, x_pe, x_grad, _, mean_accept_prob, adapt_state, rng_key = state
        if getattr(self, "_potential_fn_gen", None):
            pe_fn = self._potential_fn_gen(*model_args, **model_kwargs)
        else:
            pe_fn = self._potential_fn
        x_flat, unravel_fn = ravel_pytree(x)
        x_grad_flat, _ = ravel_pytree(x_grad)
        shape = jnp.shape(x_flat)
        rng_key, key_normal, key_bernoulli, key_accept = random.split(rng_key, 4)

        mass_sqrt_inv = adapt_state.mass_matrix_sqrt_inv
        dense = jnp.ndim(mass_sqrt_inv) == 2

        def scale_fwd(v):
            return mass_sqrt_inv @ v if dense else mass_sqrt_inv * v

        def scale_bwd(v):
            return mass_sqrt_inv.T @ v if dense else mass_sqrt_inv * v

        x_grad_flat_scaled = scale_fwd(x_grad_flat)

        # Barker proposal: |step| from N(0, eps), sign skewed by the gradient
        z = adapt_state.step_size * random.normal(key_normal, shape)
        p = expit(-z * x_grad_flat_scaled)
        b = jnp.where(random.uniform(key_bernoulli, shape) < p, 1.0, -1.0)
        dx_flat = b * z
        y_flat = x_flat + scale_bwd(dx_flat)

        y = unravel_fn(y_flat)
        y_pe, y_grad = jax.value_and_grad(pe_fn)(y)
        y_grad_flat_scaled = scale_fwd(ravel_pytree(y_grad)[0])

        log_accept_ratio = (
            x_pe
            - y_pe
            + jnp.sum(
                softplus(dx_flat * x_grad_flat_scaled)
                - softplus(-dx_flat * y_grad_flat_scaled)
            )
        )
        accept_prob = jnp.clip(jnp.exp(log_accept_ratio), None, 1.0)

        accept = random.bernoulli(key_accept, accept_prob)
        x = jax.tree.map(lambda a, b_: jnp.where(accept, a, b_), y, x)
        pe = jnp.where(accept, y_pe, x_pe)
        x_grad = jax.tree.map(lambda a, b_: jnp.where(accept, a, b_), y_grad, x_grad)

        adapt_state = jax.lax.cond(
            i < self._num_warmup,
            (i, accept_prob, (x,), adapt_state),
            lambda args: self._wa_update(*args),
            adapt_state,
            identity,
        )

        itr = i + 1
        n = jnp.where(i < self._num_warmup, itr, itr - self._num_warmup)
        mean_accept_prob = mean_accept_prob + (accept_prob - mean_accept_prob) / n
        return BarkerMHState(
            itr, x, pe, x_grad, accept_prob, mean_accept_prob, adapt_state, rng_key
        )

    def sample(self, state, model_args, model_kwargs):
        return self._sample_fn(state, model_args, model_kwargs)

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_wa_update"] = None
        state["_sample_fn"] = None
        return state
