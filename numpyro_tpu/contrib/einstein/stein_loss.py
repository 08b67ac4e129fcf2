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


def _joint_ld(program, seeded_args, overrides):
    """log density of `program` with `overrides` substituted in."""
    args, kwargs, base_params = seeded_args
    ld, trace = log_density(program, args, kwargs, {**base_params, **overrides})
    return ld, trace


class SteinLoss:
    """Monte-Carlo mixture-ELBO estimator over the Stein particle cloud."""

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
        ctx = (model_args, model_kwargs, param_map)
        log_m = jnp.log(self.stein_num_particles)

        def one_draw(draw_key):
            q_key, p_key = random.split(draw_key)

            # z ~ q_i, recorded in the guide trace
            _, guide_tr = _joint_ld(
                handlers.seed(guide, q_key), ctx, selected_particle
            )
            replayed = handlers.replay(guide, guide_tr)

            # mixture density: logsumexp over every particle's q_j(z)
            comp_lds = vmap(
                lambda flat_j: _joint_ld(replayed, ctx, unravel_pytree(flat_j))[0]
            )(flat_particles)
            mixture_ld = logsumexp(comp_lds) - log_m

            joint_ld, _ = _joint_ld(
                handlers.replay(handlers.seed(model, p_key), guide_tr),
                ctx,
                selected_particle,
            )
            return joint_ld - mixture_ld

        draw_keys = random.split(rng_key, self.elbo_num_particles)
        return jnp.mean(vmap(one_draw)(draw_keys))

    def loss(self, rng_key, param_map, model, guide, particles, *args, **kwargs):
        """Full mixture ELBO averaged over randomly-assigned particles."""
        from numpyro_tpu.contrib.einstein.stein_util import batch_ravel_pytree

        if not particles:
            raise ValueError("Stein mixture needs at least one particle.")
        flat, unravel_one, _ = batch_ravel_pytree(particles, nbatch_dims=1)

        pick_key, mc_key = random.split(rng_key)
        n_draws = self.elbo_num_particles
        picks = random.randint(pick_key, (n_draws,), 0, self.stein_num_particles)

        def scored(draw_key, pick):
            return self.particle_loss(
                draw_key,
                model,
                guide,
                unravel_one(flat[pick]),
                unravel_one,
                flat,
                pick,
                args,
                kwargs,
                param_map,
            )

        elbos = vmap(scored)(random.split(mc_key, n_draws), picks)
        return -jnp.mean(elbos)
