"""Predictive for Stein mixture guides (reference:
contrib/einstein/mixture_guide_predictive.py:18): draws guide samples from a
randomly-assigned mixture component per predictive sample."""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp
from jax import random, vmap

from numpyro_tpu import handlers
from numpyro_tpu.infer.util import _predictive


class MixtureGuidePredictive:
    def __init__(
        self,
        model,
        guide,
        params,
        guide_sites,
        num_samples=None,
        return_sites=None,
        mixture_assignment_sitename="mixture_assignments",
    ):
        self.model_predictive = partial(
            _predictive,
            model=model,
            posterior_samples={},
            batch_shape=(num_samples,) if num_samples else (),
            return_sites=return_sites,
            parallel=False,
            model_args=(),
            model_kwargs={},
        )
        self._batch_shape = (num_samples,) if num_samples else ()
        self.guide_params = {
            k: v for k, v in params.items() if k in guide_sites
        }
        self.params = {k: v for k, v in params.items() if k not in guide_sites}
        self.guide = guide
        self.model = model
        self.return_sites = return_sites
        self.num_samples = num_samples
        self.guide_sites = guide_sites
        self.mixture_assignment_sitename = mixture_assignment_sitename
        some = next(iter(self.guide_params.values()))
        self.num_mixture_components = jnp.shape(some)[0]

    def __call__(self, rng_key, *args, **kwargs):
        guide_key, assign_key, model_key = random.split(rng_key, 3)
        num_samples = self.num_samples or 1
        assigns = random.randint(
            assign_key,
            (num_samples,),
            minval=0,
            maxval=self.num_mixture_components,
        )

        def single_guide_sample(key, assign):
            params_i = {
                k: v[assign] for k, v in self.guide_params.items()
            }
            with handlers.block(), handlers.trace() as tr:
                handlers.substitute(
                    handlers.seed(self.guide, key),
                    data={**self.params, **params_i},
                )(*args, **kwargs)
            return {
                name: site["value"]
                for name, site in tr.items()
                if site["type"] == "sample" and not site["is_observed"]
            }

        guide_keys = random.split(guide_key, num_samples)
        guide_samples = vmap(single_guide_sample)(guide_keys, assigns)

        samples = _predictive(
            model_key,
            self.model,
            guide_samples,
            (num_samples,),
            return_sites=self.return_sites,
            parallel=False,
            model_args=args,
            model_kwargs=kwargs,
        )
        samples[self.mixture_assignment_sitename] = assigns
        return samples
