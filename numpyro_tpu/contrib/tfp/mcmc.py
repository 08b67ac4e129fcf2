"""Expose tfp-on-jax MCMC transition kernels through the MCMCKernel
interface (reference: numpyro/contrib/tfp/mcmc.py:56-254).

Use a wrapper generated per TFP kernel class::

    from numpyro_tpu.contrib.tfp.mcmc import NoUTurnSampler
    MCMC(NoUTurnSampler(model, step_size=0.1), ...)

Named wrappers are created lazily via module ``__getattr__``; the generic
spelling ``TFPKernel[tfp.mcmc.SomeKernel]`` also works.  Vectorized chains
are supported by vmapping the wrapped kernel's init/one_step.
"""

from __future__ import annotations

from collections import namedtuple

import jax.numpy as jnp
from jax import random, vmap
from jax.flatten_util import ravel_pytree

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
from numpyro_tpu.util import identity, is_prng_key

TFPKernelState = namedtuple("TFPKernelState", ["z", "kernel_results", "rng_key"])


class TFPKernel(MCMCKernel):
    """Wrap a tfp TransitionKernel class:
    ``TFPKernel[tfp_mcmc.NoUTurnSampler](model, step_size=...)``.

    ``Uncalibrated*`` kernels are automatically wrapped in
    MetropolisHastings, mirroring tfp's documented usage.
    """

    kernel_class = None

    def __class_getitem__(cls, kernel_class):
        return type(
            f"TFP{kernel_class.__name__}",
            (cls,),
            {"kernel_class": kernel_class},
        )

    def __init__(
        self,
        model=None,
        potential_fn=None,
        init_strategy=init_to_uniform,
        **kernel_kwargs,
    ):
        if not (model is None) ^ (potential_fn is None):
            raise ValueError("Only one of `model` or `potential_fn` must be given.")
        self._model = model
        self._potential_fn = potential_fn
        self._init_strategy = init_strategy
        self._kernel_kwargs = kernel_kwargs
        self._postprocess_fn = None
        self._unravel = None
        self._batched = None

    @property
    def model(self):
        return self._model

    @property
    def sample_field(self):
        return "z"

    @property
    def default_fields(self):
        return ("z",)

    def get_diagnostics_str(self, state):
        return ""

    def _build_tfp_kernel(self, proto_params):
        flat, unravel = ravel_pytree(proto_params)
        self._unravel = unravel
        pe_fn = self._potential_fn

        def target_log_prob(z):
            return -pe_fn(unravel(z))

        kernel = self.kernel_class(
            target_log_prob_fn=target_log_prob, **self._kernel_kwargs
        )
        if self.kernel_class.__name__.startswith("Uncalibrated"):
            kernel = tfp_mcmc.MetropolisHastings(kernel)
        self._tfp_kernel = kernel
        return flat

    def init(
        self, rng_key, num_warmup, init_params=None, model_args=(), model_kwargs={}
    ):
        self._batched = not is_prng_key(rng_key)
        if self._batched:
            keys = vmap(random.split)(rng_key)
            key_model, rng_key = keys[:, 0], keys[:, 1]
        else:
            key_model, rng_key = random.split(rng_key)

        if self._model is not None:
            info, pf_gen, self._postprocess_fn, _ = initialize_model(
                key_model,
                self._model,
                dynamic_args=True,
                init_strategy=self._init_strategy,
                model_args=model_args,
                model_kwargs=model_kwargs,
            )
            if init_params is None:
                init_params = info[0]
            self._potential_fn = pf_gen(*model_args, **(model_kwargs or {}))
        elif init_params is None:
            raise ValueError(
                "Valid value of `init_params` must be provided with "
                "`potential_fn`."
            )

        if self._batched:
            import jax

            proto = jax.tree.map(lambda x: x[0], init_params)
            self._build_tfp_kernel(proto)
            z = vmap(lambda p: ravel_pytree(p)[0])(init_params)
            results = vmap(self._tfp_kernel.bootstrap_results)(z)
        else:
            z = self._build_tfp_kernel(init_params)
            results = self._tfp_kernel.bootstrap_results(z)
        return TFPKernelState(z, results, rng_key)

    def postprocess_fn(self, args, kwargs):
        unravel = self._unravel
        inner = (
            self._postprocess_fn(*args, **kwargs)
            if self._postprocess_fn is not None
            else identity
        )

        def fn(z_flat):
            import jax

            unraveled = (
                jax.vmap(unravel)(z_flat)
                if jnp.ndim(z_flat) > 1
                else unravel(z_flat)
            )
            return inner(unraveled)

        return fn

    def sample(self, state, model_args, model_kwargs):
        if self._batched:
            keys = vmap(random.split)(state.rng_key)
            key_next, key_step = keys[:, 0], keys[:, 1]
            z, results = vmap(
                lambda zz, res, k: self._tfp_kernel.one_step(zz, res, seed=k)
            )(state.z, state.kernel_results, key_step)
        else:
            key_next, key_step = random.split(state.rng_key)
            z, results = self._tfp_kernel.one_step(
                state.z, state.kernel_results, seed=key_step
            )
        return TFPKernelState(z, results, key_next)

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_tfp_kernel"] = None
        return state


__all__ = ["TFPKernel"]


def __getattr__(name):
    """Generate ``TFPKernel[tfp_mcmc.<name>]`` wrappers on demand."""
    if name.startswith("_"):
        raise AttributeError(name)
    base = name[3:] if name.startswith("TFP") else name
    kernel_class = getattr(tfp_mcmc, base, None)
    if kernel_class is None or not isinstance(kernel_class, type):
        raise AttributeError(name)
    wrapper = TFPKernel[kernel_class]
    globals()[name] = wrapper
    return wrapper
