"""Gaussian process regression: NUTS over RBF kernel hyperparameters
(reference: examples/gp.py).  The kernel build + Cholesky is one fused
XLA block per likelihood evaluation."""

import argparse

import numpy as np

import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.infer import MCMC, NUTS


def kernel_fn(X, Z, var, length, noise, jitter=1e-6, include_noise=True):
    d = (X[:, None] - Z[None, :]) / length
    k = var * jnp.exp(-0.5 * d**2)
    if include_noise:
        k = k + (noise + jitter) * jnp.eye(X.shape[0])
    return k


def model(X, y):
    var = numpyro_tpu.sample("kernel_var", dist.LogNormal(0.0, 1.0))
    noise = numpyro_tpu.sample("kernel_noise", dist.LogNormal(-2.0, 1.0))
    length = numpyro_tpu.sample("kernel_length", dist.LogNormal(0.0, 1.0))
    k = kernel_fn(X, X, var, length, noise)
    numpyro_tpu.sample(
        "y",
        dist.MultivariateNormal(loc=jnp.zeros(X.shape[0]), covariance_matrix=k),
        obs=y,
    )


def main(args):
    rng = np.random.RandomState(0)
    X = jnp.asarray(np.sort(rng.uniform(-3, 3, args.num_data)))
    y = jnp.sin(2 * X) + 0.2 * jnp.asarray(rng.randn(args.num_data))
    mcmc = MCMC(
        NUTS(model),
        num_warmup=args.num_warmup,
        num_samples=args.num_samples,
        progress_bar=False,
    )
    mcmc.run(random.PRNGKey(0), X, y)
    mcmc.print_summary()
    s = mcmc.get_samples()
    print("posterior mean length-scale:", float(s["kernel_length"].mean()))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--num-data", type=int, default=50)
    p.add_argument("--num-warmup", type=int, default=500)
    p.add_argument("--num-samples", type=int, default=500)
    main(p.parse_args())
