"""Eight schools — the canonical hierarchical model
(reference: examples/eight_schools.py)."""

import argparse

import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.infer import MCMC, NUTS

J = 8
y = jnp.array([28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0])
sigma = jnp.array([15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0])


def model(y, sigma):
    mu = numpyro_tpu.sample("mu", dist.Normal(0.0, 5.0))
    tau = numpyro_tpu.sample("tau", dist.HalfCauchy(5.0))
    with numpyro_tpu.plate("J", J):
        theta = numpyro_tpu.sample("theta", dist.Normal(mu, tau))
        numpyro_tpu.sample("obs", dist.Normal(theta, sigma), obs=y)


def main(args):
    mcmc = MCMC(
        NUTS(model, target_accept_prob=0.9),
        num_warmup=args.num_warmup,
        num_samples=args.num_samples,
        num_chains=args.num_chains,
        chain_method="vectorized",
        progress_bar=False,
    )
    mcmc.run(random.PRNGKey(0), y, sigma)
    mcmc.print_summary()


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--num-warmup", type=int, default=1000)
    p.add_argument("--num-samples", type=int, default=1000)
    p.add_argument("--num-chains", type=int, default=4)
    main(p.parse_args())
