"""Divide-Conquer-Combine inference for models with stochastic support
(reference: contrib/stochastic_support/dcc.py:154; Zhou et al. 2020).

A model's control-flow branches on discrete sites marked
``infer={"branching": True}``; each realized branch combination is a
straight-line program (SLP).  DCC runs MCMC per SLP and weights SLPs by
importance-sampled normalization constants."""

from __future__ import annotations

from abc import ABC, abstractmethod
from collections import OrderedDict, namedtuple

import jax
import jax.numpy as jnp
from jax import random

import numpyro_tpu.distributions as dist
from numpyro_tpu.handlers import condition, seed, trace
from numpyro_tpu.infer import MCMC, NUTS
from numpyro_tpu.infer.autoguide import AutoNormal
from numpyro_tpu.infer.initialization import init_to_value
from numpyro_tpu.infer.util import log_density

DCCResult = namedtuple("DCCResult", ["samples", "slp_weights"])
SDVIResult = namedtuple("SDVIResult", ["guides", "slp_weights"])


class StochasticSupportInference(ABC):
    """Base: discover SLPs by prior sampling, infer per-SLP, combine."""

    def __init__(self, model, num_slp_samples, max_slps):
        self.model = model
        self.num_slp_samples = num_slp_samples
        self.max_slps = max_slps

    def _find_slps(self, rng_key, *args, **kwargs):
        branching_traces = {}
        for _ in range(self.num_slp_samples):
            rng_key, subkey = random.split(rng_key)
            tr = trace(seed(self.model, subkey)).get_trace(*args, **kwargs)
            btr = self._get_branching_trace(tr)
            btr_str = ",".join(str(x) for x in btr.values())
            if btr_str not in branching_traces:
                branching_traces[btr_str] = btr
                if len(branching_traces) >= self.max_slps:
                    break
        return branching_traces

    def _get_branching_trace(self, tr):
        branching_trace = OrderedDict()
        for site in tr.values():
            if (
                site["type"] == "sample"
                and site["infer"].get("branching", False)
                and site["fn"].support is not None
            ):
                if (
                    not isinstance(site["fn"], dist.Distribution)
                    or not site["fn"].support.is_discrete
                ):
                    raise RuntimeError(
                        "Branching is only supported for discrete sampling sites."
                    )
                branching_trace[site["name"]] = int(site["value"])
        return branching_trace

    @abstractmethod
    def _run_inference(self, rng_key, branching_trace, *args, **kwargs):
        raise NotImplementedError

    @abstractmethod
    def _combine_inferences(self, rng_key, inferences, branching_traces, *args, **kwargs):
        raise NotImplementedError

    def run(self, rng_key, *args, **kwargs):
        rng_key, subkey = random.split(rng_key)
        branching_traces = self._find_slps(subkey, *args, **kwargs)
        inferences = {}
        for key, bt in branching_traces.items():
            rng_key, subkey = random.split(rng_key)
            inferences[key] = self._run_inference(subkey, bt, *args, **kwargs)
        rng_key, subkey = random.split(rng_key)
        return self._combine_inferences(
            subkey, inferences, branching_traces, *args, **kwargs
        )


class DCC(StochasticSupportInference):
    """MCMC per SLP + layered-adaptive-IS normalization weighting."""

    def __init__(
        self,
        model,
        mcmc_kwargs,
        kernel_cls=NUTS,
        num_slp_samples=1_000,
        max_slps=124,
        proposal_scale=1.0,
    ):
        self.kernel_cls = kernel_cls
        self.mcmc_kwargs = mcmc_kwargs
        self.proposal_scale = proposal_scale
        super().__init__(model, num_slp_samples, max_slps)

    def _run_inference(self, rng_key, branching_trace, *args, **kwargs):
        slp_model = condition(self.model, data=branching_trace)
        kernel = self.kernel_cls(slp_model)
        mcmc = MCMC(kernel, **self.mcmc_kwargs)
        mcmc.run(rng_key, *args, **kwargs)
        return mcmc.get_samples()

    def _combine_inferences(self, rng_key, samples, branching_traces, *args, **kwargs):
        def log_weight(rng_key, i, slp_model, slp_samples):
            trace_i = {k: v[i] for k, v in slp_samples.items()}
            guide = AutoNormal(
                slp_model,
                init_loc_fn=init_to_value(values=trace_i),
                init_scale=self.proposal_scale,
            )
            rng_key, subkey = random.split(rng_key)
            guide_trace = seed(guide, subkey)(*args, **kwargs)
            guide_log_density, _ = log_density(guide, args, kwargs, guide_trace)
            model_log_density, _ = log_density(slp_model, args, kwargs, guide_trace)
            return model_log_density - guide_log_density

        log_weights = jax.vmap(log_weight, in_axes=(None, 0, None, None))
        log_Zs = {}
        for bt, slp_samples in samples.items():
            num_samples = slp_samples[next(iter(slp_samples))].shape[0]
            slp_model = condition(self.model, data=branching_traces[bt])
            lws = log_weights(rng_key, jnp.arange(num_samples), slp_model, slp_samples)
            log_Zs[bt] = jax.scipy.special.logsumexp(lws) - jnp.log(num_samples)

        normalizer = jax.scipy.special.logsumexp(jnp.array(list(log_Zs.values())))
        slp_weights = {k: jnp.exp(v - normalizer) for k, v in log_Zs.items()}
        return DCCResult(samples, slp_weights)
