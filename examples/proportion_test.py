"""A/B proportion test: is there a difference in conversion? Bayesian
binomial comparison with Predictive checks (reference:
examples/proportion_test.py)."""

import argparse

import numpy as np

import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.diagnostics import hpdi
from numpyro_tpu.infer import MCMC, NUTS


def model(design, obs=None):
    intercept = numpyro_tpu.sample("intercept", dist.Normal(0.0, 1.0))
    effect = numpyro_tpu.sample("effect", dist.Normal(0.0, 1.0))
    logits = intercept + effect * design[:, 1]
    with numpyro_tpu.plate("N", design.shape[0]):
        numpyro_tpu.sample("obs", dist.Bernoulli(logits=logits), obs=obs)


def main(args):
    rng = np.random.RandomState(0)
    n = args.num_data
    group = np.repeat([0, 1], n // 2)
    p = np.where(group == 0, 0.40, 0.48)
    obs = jnp.asarray(rng.binomial(1, p).astype(np.float32))
    design = jnp.asarray(np.stack([np.ones(n), group], 1))
    mcmc = MCMC(
        NUTS(model),
        num_warmup=args.num_warmup,
        num_samples=args.num_samples,
        progress_bar=False,
    )
    mcmc.run(random.PRNGKey(0), design, obs)
    eff = np.asarray(mcmc.get_samples()["effect"])
    lo, hi = np.asarray(hpdi(eff, 0.9))
    print(f"effect (log-odds): mean {eff.mean():.3f}, 90% HPDI [{lo:.3f}, {hi:.3f}]")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--num-data", type=int, default=1000)
    p.add_argument("--num-warmup", type=int, default=400)
    p.add_argument("--num-samples", type=int, default=600)
    main(p.parse_args())
