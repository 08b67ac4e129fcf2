"""Zero-inflated Poisson regression with enumeration-free ZeroInflated
distribution (reference: examples/zero_inflated_poisson.py)."""

import argparse

import numpy as np

import jax
import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.infer import MCMC, NUTS


def model(X, y=None):
    D = X.shape[1]
    beta = numpyro_tpu.sample("beta", dist.Normal(jnp.zeros(D), 1.0).to_event(1))
    gate_logit = numpyro_tpu.sample("gate_logit", dist.Normal(0.0, 1.0))
    rate = jnp.exp(X @ beta)
    gate = jnp.broadcast_to(jax.nn.sigmoid(gate_logit), rate.shape)
    with numpyro_tpu.plate("N", X.shape[0]):
        numpyro_tpu.sample(
            "y", dist.ZeroInflatedPoisson(gate=gate, rate=rate), obs=y
        )


def main(args):
    rng = np.random.RandomState(0)
    X = rng.randn(args.num_data, 3)
    true_beta = np.array([0.5, -0.5, 0.3])
    rate = np.exp(X @ true_beta)
    y = rng.poisson(rate)
    y[rng.rand(args.num_data) < 0.3] = 0  # inflate zeros
    mcmc = MCMC(
        NUTS(model),
        num_warmup=args.num_warmup,
        num_samples=args.num_samples,
        progress_bar=False,
    )
    mcmc.run(random.PRNGKey(0), jnp.asarray(X), jnp.asarray(y))
    beta_hat = np.asarray(mcmc.get_samples()["beta"]).mean(0)
    print("beta_hat:", np.round(beta_hat, 2), " truth:", true_beta)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--num-data", type=int, default=300)
    p.add_argument("--num-warmup", type=int, default=400)
    p.add_argument("--num-samples", type=int, default=400)
    main(p.parse_args())
