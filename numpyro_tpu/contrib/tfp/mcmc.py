"""Expose tfp-on-jax MCMC kernels through the MCMCKernel interface
(reference: numpyro/contrib/tfp/mcmc.py:56-254)."""

from __future__ import annotations

from collections import namedtuple

from jax import random
import jax.numpy as jnp

try:
    from tensorflow_probability.substrates.jax import mcmc as tfp_mcmc
except ImportError as e:  # pragma: no cover
    raise ImportError(
        "numpyro_tpu.contrib.tfp requires tensorflow_probability "
        "(jax substrate)."
    ) from e

from numpyro_tpu.infer.initialization import init_to_uniform
from numpyro_tpu.infer.mcmc import MCMCKernel
from numpyro_tpu.infer.util import initialize_model
from numpyro_tpu.util import identity

TFPKernelState = namedtuple("TFPKernelState", ["z", "kernel_results", "rng_key"])


class TFPKernel(MCMCKernel):
    """Wrap a tfp TransitionKernel class: ``TFPKernel[tfp.mcmc.NUTS](model,
    step_size=...)``."""

    kernel_class = None

    def __class_getitem__(cls, kernel_class):
        return type(
            f"TFP{kernel_class.__name__}",
            (TFPKernel,),
            {"kernel_class": kernel_class},
        )

    def __init__(self, model=None, potential_fn=None, init_strategy=init_to_uniform, **kernel_kwargs):
        if not (model is None) ^ (potential_fn is None):
            raise ValueError("Only one of `model` or `potential_fn` must be given.")
        self._model = model
        self._potential_fn = potential_fn
        self._init_strategy = init_strategy
        self._kernel_kwargs = kernel_kwargs
        self._postprocess_fn = None

    @property
    def model(self):
        return self._model

    @property
    def sample_field(self):
        return "z"

    def init(self, rng_key, num_warmup, init_params=None, model_args=(), model_kwargs={}):
        rng_key, key_init = random.split(rng_key)
        if self._model is not None:
            params_info, potential_fn_gen, self._postprocess_fn, _ = initialize_model(
                key_init,
                self._model,
                dynamic_args=True,
                init_strategy=self._init_strategy,
                model_args=model_args,
                model_kwargs=model_kwargs,
            )
            if init_params is None:
                init_params = params_info[0]
            self._potential_fn = potential_fn_gen(*model_args, **model_kwargs)
        from jax.flatten_util import ravel_pytree

        z_flat, unravel = ravel_pytree(init_params)
        self._unravel = unravel

        def tlp(z):
            return -self._potential_fn(unravel(z))

        self._tfp_kernel = self.kernel_class(
            target_log_prob_fn=tlp, **self._kernel_kwargs
        )
        results = self._tfp_kernel.bootstrap_results(z_flat)
        return TFPKernelState(z_flat, results, rng_key)

    def postprocess_fn(self, args, kwargs):
        if self._postprocess_fn is None:
            return identity

        def fn(z_flat_samples):
            import jax

            unraveled = jax.vmap(self._unravel)(z_flat_samples) if jnp.ndim(
                z_flat_samples
            ) > 1 else self._unravel(z_flat_samples)
            return self._postprocess_fn(*args, **kwargs)(unraveled)

        return fn

    def sample(self, state, model_args, model_kwargs):
        rng_key, key = random.split(state.rng_key)
        z, results = self._tfp_kernel.one_step(
            state.z, state.kernel_results, seed=key
        )
        return TFPKernelState(z, results, rng_key)
