"""Gaussian mixture with enumerated assignments + TraceEnum SVI and NUTS
(reference pattern: examples/gmm.py / annotation.py)."""

import argparse

import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.infer import MCMC, NUTS


def model(data):
    w = numpyro_tpu.sample("w", dist.Dirichlet(jnp.ones(2)))
    locs = numpyro_tpu.sample(
        "locs", dist.Normal(jnp.zeros(2), 10.0).to_event(1)
    )
    with numpyro_tpu.plate("N", data.shape[0]):
        c = numpyro_tpu.sample(
            "c", dist.Categorical(w), infer={"enumerate": "parallel"}
        )
        numpyro_tpu.sample("x", dist.Normal(locs[c], 0.5), obs=data)


def main(args):
    data = jnp.concatenate(
        [
            -2.0 + 0.5 * random.normal(random.PRNGKey(1), (300,)),
            2.0 + 0.5 * random.normal(random.PRNGKey(2), (700,)),
        ]
    )
    mcmc = MCMC(
        NUTS(model),
        num_warmup=args.num_warmup,
        num_samples=args.num_samples,
        progress_bar=False,
    )
    mcmc.run(random.PRNGKey(0), data)
    mcmc.print_summary()


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--num-warmup", type=int, default=300)
    p.add_argument("--num-samples", type=int, default=300)
    main(p.parse_args())
