"""Efron-Morris baseball batting averages: pooled / unpooled / partially
pooled binomial models compared by held-out log-likelihood
(reference: examples/baseball.py)."""

import argparse

import numpy as np

import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.examples.datasets import BASEBALL, load_dataset
from numpyro_tpu.infer import MCMC, NUTS, Predictive, log_likelihood


def fully_pooled(at_bats, hits=None):
    phi = numpyro_tpu.sample("phi", dist.Uniform(0.0, 1.0))
    with numpyro_tpu.plate("players", at_bats.shape[0]):
        numpyro_tpu.sample("obs", dist.Binomial(at_bats, probs=phi), obs=hits)


def partially_pooled(at_bats, hits=None):
    m = numpyro_tpu.sample("m", dist.Uniform(0.0, 1.0))
    kappa = numpyro_tpu.sample("kappa", dist.Pareto(1.0, 1.5))
    with numpyro_tpu.plate("players", at_bats.shape[0]):
        phi = numpyro_tpu.sample(
            "phi", dist.Beta(m * kappa, (1 - m) * kappa)
        )
        numpyro_tpu.sample("obs", dist.Binomial(at_bats, probs=phi), obs=hits)


def run(model, name, train, test, args):
    at_bats, hits = train
    mcmc = MCMC(
        NUTS(model),
        num_warmup=args.num_warmup,
        num_samples=args.num_samples,
        progress_bar=False,
    )
    mcmc.run(random.PRNGKey(0), at_bats, hits)
    samples = mcmc.get_samples()
    at_bats_s, hits_s = test
    ll = log_likelihood(model, samples, at_bats_s, hits_s)["obs"]
    score = float(jnp.mean(jnp.sum(ll, -1)))
    print(f"{name}: held-out log-likelihood {score:.1f}")
    return score


def main(args):
    _, fetch_train = load_dataset(BASEBALL, split="train", shuffle=False)
    train = fetch_train()
    _, fetch_test = load_dataset(BASEBALL, split="test", shuffle=False)
    test = fetch_test()
    train = (jnp.asarray(train[0][:, 0]), jnp.asarray(train[0][:, 1]))
    test = (jnp.asarray(test[0][:, 0]), jnp.asarray(test[0][:, 1]))
    s_pool = run(fully_pooled, "fully pooled    ", train, test, args)
    s_part = run(partially_pooled, "partially pooled", train, test, args)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--num-warmup", type=int, default=500)
    p.add_argument("--num-samples", type=int, default=1000)
    main(p.parse_args())
