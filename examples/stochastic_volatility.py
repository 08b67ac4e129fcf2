"""Stochastic volatility on (synthetic) returns via GaussianRandomWalk —
the deep-tree NUTS stress case (reference: examples/stochastic_volatility.py)."""

import argparse

import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.infer import MCMC, NUTS


def model(returns):
    T = returns.shape[0]
    sigma = numpyro_tpu.sample("sigma", dist.Exponential(50.0))
    nu = numpyro_tpu.sample("nu", dist.Exponential(0.1))
    s = numpyro_tpu.sample(
        "s", dist.GaussianRandomWalk(scale=sigma, num_steps=T)
    )
    numpyro_tpu.sample(
        "r", dist.StudentT(df=nu, loc=0.0, scale=jnp.exp(s)), obs=returns
    )


def main(args):
    key = random.PRNGKey(1)
    T = args.num_steps
    vol = jnp.exp(0.1 * jnp.cumsum(random.normal(key, (T,))) * 0.3 - 2)
    returns = vol * random.normal(random.PRNGKey(2), (T,))
    mcmc = MCMC(
        NUTS(model),
        num_warmup=args.num_warmup,
        num_samples=args.num_samples,
        progress_bar=False,
    )
    mcmc.run(random.PRNGKey(0), returns)
    mcmc.print_summary(exclude_deterministic=True) if False else mcmc.print_summary()


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--num-warmup", type=int, default=600)
    p.add_argument("--num-samples", type=int, default=600)
    p.add_argument("--num-steps", type=int, default=100)
    main(p.parse_args())
