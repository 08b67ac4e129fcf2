"""Stein mixture loss (reference: contrib/einstein/stein_loss.py:13).

The attractive force of SteinVI pulls each particle toward high mixture-ELBO:
for particle i, ``ELBO_i = E_{z ~ q_i}[ log p(x, z) - log (1/m Σ_j q_j(z)) ]``
— the guide is the uniform mixture of the per-particle guides.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import random, vmap
from jax.scipy.special import logsumexp

from numpyro_tpu import handlers
from numpyro_tpu.infer.util import log_density


class SteinLoss:
    def __init__(self, elbo_num_particles=1, stein_num_particles=1):
        self.elbo_num_particles = elbo_num_particles
        self.stein_num_particles = stein_num_particles

    def particle_loss(
        self,
        rng_key,
        model,
        guide,
        selected_particle,
        unravel_pytree,
        flat_particles,
        select_index,
        model_args,
        model_kwargs,
        param_map,
    ):
        """Mixture ELBO for one particle, MC-averaged over elbo draws."""

        def single_draw_elbo(rng_key):
            guide_key, model_key = random.split(rng_key, 2)

            # draw z from q_i
            _, tri = log_density(
                handlers.seed(guide, guide_key),
                model_args,
                model_kwargs,
                {**param_map, **selected_particle},
            )

            def log_q_j(pj):
                ld, _ = log_density(
                    handlers.replay(guide, tri),
                    model_args,
                    model_kwargs,
                    {**param_map, **unravel_pytree(pj)},
                )
                return ld

            log_mix_q = logsumexp(vmap(log_q_j)(flat_particles)) - jnp.log(
                self.stein_num_particles
            )
            log_p, _ = log_density(
                handlers.replay(handlers.seed(model, model_key), tri),
                model_args,
                model_kwargs,
                {**param_map, **selected_particle},
            )
            return log_p - log_mix_q

        keys = random.split(rng_key, self.elbo_num_particles)
        return vmap(single_draw_elbo)(keys).mean()

    def loss(self, rng_key, param_map, model, guide, particles, *args, **kwargs):
        """Full mixture ELBO averaged over randomly-assigned particles."""
        from numpyro_tpu.contrib.einstein.stein_util import batch_ravel_pytree

        if not particles:
            raise ValueError("Stein mixture undefined for empty guide.")
        flat_particles, unravel_pytree, _ = batch_ravel_pytree(
            particles, nbatch_dims=1
        )
        select_key, score_key = random.split(rng_key)
        assigns = random.randint(
            select_key,
            (self.elbo_num_particles,),
            minval=0,
            maxval=self.stein_num_particles,
        )
        score_keys = random.split(score_key, self.elbo_num_particles)
        elbos = vmap(
            lambda key, assign: self.particle_loss(
                rng_key=key,
                model=model,
                guide=guide,
                selected_particle=unravel_pytree(flat_particles[assign]),
                unravel_pytree=unravel_pytree,
                flat_particles=flat_particles,
                select_index=assign,
                model_args=args,
                model_kwargs=kwargs,
                param_map=param_map,
            )
        )(score_keys, assigns)
        return -jnp.mean(elbos)
