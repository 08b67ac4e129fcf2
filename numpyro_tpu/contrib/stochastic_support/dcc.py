"""Divide-Conquer-Combine inference for models with stochastic support
(role parity: numpyro/contrib/stochastic_support/dcc.py; Zhou et al. 2020).

A model's control flow may branch on discrete sites marked
``infer={"branching": True}``; each realized branch combination is a
straight-line program (SLP).  The driver here discovers SLPs by prior
simulation, runs per-SLP inference, and reweights the sub-posteriors by
estimated normalization constants.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from collections import namedtuple

import jax
import jax.numpy as jnp
from jax import random
from jax.scipy.special import logsumexp

import numpyro_tpu.distributions as dist
from numpyro_tpu.handlers import condition, seed, trace
from numpyro_tpu.infer import MCMC, NUTS
from numpyro_tpu.infer.autoguide import AutoNormal
from numpyro_tpu.infer.initialization import init_to_value
from numpyro_tpu.infer.util import log_density

DCCResult = namedtuple("DCCResult", ["samples", "slp_weights"])
SDVIResult = namedtuple("SDVIResult", ["guides", "slp_weights"])


def _branch_signature(tr):
    """Map a trace to its branch decision record {site: int value}."""
    decisions = {}
    for site in tr.values():
        if site["type"] != "sample" or not site["infer"].get("branching"):
            continue
        fn = site["fn"]
        if not (
            isinstance(fn, dist.Distribution)
            and fn.support is not None
            and fn.support.is_discrete
        ):
            raise RuntimeError(
                "Branching is only supported for discrete sampling sites."
            )
        decisions[site["name"]] = int(site["value"])
    return decisions


def _normalize_log_weights(log_zs):
    """{slp: log Z} -> {slp: weight}, softmax over discovered SLPs."""
    total = logsumexp(jnp.asarray(list(log_zs.values())))
    return {k: jnp.exp(v - total) for k, v in log_zs.items()}


class StochasticSupportInference(ABC):
    """Shared driver: discover SLPs by forward simulation, run per-SLP
    inference, combine with normalization weights."""

    def __init__(self, model, num_slp_samples, max_slps):
        self.model = model
        self.num_slp_samples = num_slp_samples
        self.max_slps = max_slps

    def _find_slps(self, rng_key, *args, **kwargs):
        """Forward-simulate the prior until max_slps distinct branch
        signatures are seen (or the simulation budget runs out)."""
        found = {}
        for key in random.split(rng_key, self.num_slp_samples):
            tr = trace(seed(self.model, key)).get_trace(*args, **kwargs)
            decisions = _branch_signature(tr)
            tag = ",".join(str(v) for v in decisions.values())
            found.setdefault(tag, decisions)
            if len(found) >= self.max_slps:
                break
        return found

    @abstractmethod
    def _run_inference(self, rng_key, branching_trace, *args, **kwargs):
        raise NotImplementedError

    @abstractmethod
    def _combine_inferences(
        self, rng_key, inferences, branching_traces, *args, **kwargs
    ):
        raise NotImplementedError

    def run(self, rng_key, *args, **kwargs):
        key_find, key_combine, *keys_infer = random.split(
            rng_key, 2 + self.max_slps
        )
        slps = self._find_slps(key_find, *args, **kwargs)
        inferences = {
            tag: self._run_inference(key, decisions, *args, **kwargs)
            for key, (tag, decisions) in zip(keys_infer, slps.items())
        }
        return self._combine_inferences(
            key_combine, inferences, slps, *args, **kwargs
        )


class DCC(StochasticSupportInference):
    """MCMC within each SLP; normalization constants estimated by
    importance sampling from posterior-centered AutoNormal proposals."""

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
        mcmc = MCMC(self.kernel_cls(slp_model), **self.mcmc_kwargs)
        mcmc.run(rng_key, *args, **kwargs)
        return mcmc.get_samples()

    def _estimate_log_z(self, rng_key, slp_model, slp_samples, args, kwargs):
        """Layered adaptive importance sampling: one AutoNormal proposal per
        posterior draw, log Z ≈ logmeanexp of importance ratios."""

        def one_ratio(key, draw_idx):
            anchor = {k: v[draw_idx] for k, v in slp_samples.items()}
            proposal = AutoNormal(
                slp_model,
                init_loc_fn=init_to_value(values=anchor),
                init_scale=self.proposal_scale,
            )
            draw = seed(proposal, key)(*args, **kwargs)
            lq, _ = log_density(proposal, args, kwargs, draw)
            lp, _ = log_density(slp_model, args, kwargs, draw)
            return lp - lq

        n = jax.tree.leaves(slp_samples)[0].shape[0]
        ratios = jax.vmap(one_ratio, in_axes=(None, 0))(
            rng_key, jnp.arange(n)
        )
        return logsumexp(ratios) - jnp.log(n)

    def _combine_inferences(self, rng_key, samples, branching_traces, *args, **kwargs):
        log_zs = {
            tag: self._estimate_log_z(
                rng_key,
                condition(self.model, data=branching_traces[tag]),
                slp_samples,
                args,
                kwargs,
            )
            for tag, slp_samples in samples.items()
        }
        return DCCResult(samples, _normalize_log_weights(log_zs))
