"""SteinVI Bayesian neural network: particle ensemble over BNN weights
(reference: examples/stein_bnn.py)."""

import argparse

import numpy as np

import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.contrib.einstein import RBFKernel, SteinVI
from numpyro_tpu.infer.autoguide import AutoNormal
from numpyro_tpu.optim import Adagrad


def model(x, y=None, hidden=8):
    D = x.shape[1]
    w1 = numpyro_tpu.sample(
        "w1", dist.Normal(jnp.zeros((D, hidden)), 1.0).to_event(2)
    )
    b1 = numpyro_tpu.sample("b1", dist.Normal(jnp.zeros(hidden), 1.0).to_event(1))
    w2 = numpyro_tpu.sample("w2", dist.Normal(jnp.zeros(hidden), 1.0).to_event(1))
    prec = numpyro_tpu.sample("prec", dist.Gamma(1.0, 0.1))
    mean = jnp.tanh(x @ w1 + b1) @ w2
    with numpyro_tpu.plate("N", x.shape[0]):
        numpyro_tpu.sample("y", dist.Normal(mean, 1 / jnp.sqrt(prec)), obs=y)


def main(args):
    rng = np.random.RandomState(0)
    x = np.linspace(-1, 1, args.num_data)[:, None]
    y = 0.5 * np.sin(4 * x[:, 0]) + 0.1 * rng.randn(args.num_data)
    x, y = jnp.asarray(x), jnp.asarray(y)

    stein = SteinVI(
        model,
        AutoNormal(model),
        Adagrad(0.5),
        RBFKernel(),
        num_stein_particles=args.num_particles,
        num_elbo_particles=2,
    )
    result = stein.run(random.PRNGKey(0), args.num_iters, x, y, progress_bar=False)
    losses = np.asarray(result.losses)
    print(f"Stein loss: {losses[0]:.1f} -> {losses[-1]:.1f}")
    assert np.isfinite(losses[-1])


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--num-data", type=int, default=60)
    p.add_argument("--num-particles", type=int, default=8)
    p.add_argument("--num-iters", type=int, default=500)
    main(p.parse_args())
