"""Hilbert-space GP approximation: birthday-problem-style trend + periodic
fit with hsgp_squared_exponential (reference: examples/hsgp.py)."""

import argparse

import numpy as np

import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.contrib.hsgp.approximation import hsgp_squared_exponential
from numpyro_tpu.infer import MCMC, NUTS


def model(x, y=None, ell=1.5, m=20):
    amp = numpyro_tpu.sample("amp", dist.HalfNormal(1.0))
    length = numpyro_tpu.sample("length", dist.LogNormal(-1.0, 1.0))
    noise = numpyro_tpu.sample("noise", dist.HalfNormal(0.5))
    f = hsgp_squared_exponential(x, alpha=amp, length=length, ell=ell, m=m)
    with numpyro_tpu.plate("N", x.shape[0]):
        numpyro_tpu.sample("y", dist.Normal(f, noise), obs=y)


def main(args):
    rng = np.random.RandomState(0)
    x = jnp.asarray(np.linspace(-1, 1, args.num_data))
    y = jnp.sin(3 * x) + 0.2 * jnp.asarray(rng.randn(args.num_data))
    mcmc = MCMC(
        NUTS(model),
        num_warmup=args.num_warmup,
        num_samples=args.num_samples,
        progress_bar=False,
    )
    mcmc.run(random.PRNGKey(0), x, y)
    s = mcmc.get_samples()
    print(f"length-scale: {float(s['length'].mean()):.2f}, "
          f"noise: {float(s['noise'].mean()):.2f}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--num-data", type=int, default=80)
    p.add_argument("--num-warmup", type=int, default=400)
    p.add_argument("--num-samples", type=int, default=400)
    main(p.parse_args())
