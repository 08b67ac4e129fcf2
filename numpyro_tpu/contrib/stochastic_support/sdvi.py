"""Support Decomposition Variational Inference (Reichelt et al.):
one guide per SLP, weighted by its ELBO
(reference: contrib/stochastic_support/sdvi.py:29)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from numpyro_tpu.contrib.stochastic_support.dcc import (
    SDVIResult,
    StochasticSupportInference,
)
from numpyro_tpu.handlers import condition
from numpyro_tpu.infer import (
    ELBO,
    SVI,
    Trace_ELBO,
    TraceEnum_ELBO,
    TraceGraph_ELBO,
    TraceMeanField_ELBO,
)
from numpyro_tpu.infer.autoguide import AutoNormal

VALID_ELBOS = (Trace_ELBO, TraceMeanField_ELBO, TraceEnum_ELBO, TraceGraph_ELBO)


class SDVI(StochasticSupportInference):
    def __init__(
        self,
        model,
        optimizer,
        svi_num_steps=1_000,
        combine_elbo_particles=1_000,
        guide_init=AutoNormal,
        loss=None,
        svi_progress_bar=False,
        num_slp_samples=1_000,
        max_slps=124,
    ):
        self.guide_init = guide_init
        self.optimizer = optimizer
        self.svi_num_steps = svi_num_steps
        self.svi_progress_bar = svi_progress_bar
        loss = Trace_ELBO() if loss is None else loss
        if not isinstance(loss, VALID_ELBOS):
            err = ", ".join(x.__name__ for x in VALID_ELBOS)
            raise ValueError(f"loss must be an instance of: ({err})")
        self.loss = loss
        self.combine_elbo_particles = combine_elbo_particles
        super().__init__(model, num_slp_samples, max_slps)

    def _run_inference(self, rng_key, branching_trace, *args, **kwargs):
        slp_model = condition(self.model, branching_trace)
        guide = self.guide_init(slp_model)
        svi = SVI(slp_model, guide, self.optimizer, self.loss)
        svi_result = svi.run(
            rng_key,
            self.svi_num_steps,
            *args,
            progress_bar=self.svi_progress_bar,
            **kwargs,
        )
        return guide, svi_result.params

    def _combine_inferences(self, rng_key, guides, branching_traces, *args, **kwargs):
        elbos = {}
        for bt, (guide, param_map) in guides.items():
            slp_model = condition(self.model, branching_traces[bt])
            elbos[bt] = -Trace_ELBO(
                num_particles=self.combine_elbo_particles
            ).loss(rng_key, param_map, slp_model, guide, *args, **kwargs)
        normalizer = jax.scipy.special.logsumexp(jnp.array(list(elbos.values())))
        slp_weights = {k: jnp.exp(v - normalizer) for k, v in elbos.items()}
        return SDVIResult(guides, slp_weights)
