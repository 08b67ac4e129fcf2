"""Hierarchical mortality: deaths ~ Binomial with age x time random-walk
structure on the logit scale (reference: examples/mortality.py)."""

import argparse

import numpy as np

import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.infer import MCMC, NUTS


def model(age_idx, time_idx, exposure, deaths=None, *, A, T):
    # A/T are static python ints (array sizes must not be traced)
    sigma_a = numpyro_tpu.sample("sigma_age", dist.HalfNormal(1.0))
    sigma_t = numpyro_tpu.sample("sigma_time", dist.HalfNormal(0.5))
    intercept = numpyro_tpu.sample("intercept", dist.Normal(-4.0, 2.0))
    # random-walk age profile (GaussianRandomWalk is first-class here)
    age_eff = numpyro_tpu.sample("age_eff", dist.GaussianRandomWalk(sigma_a, A))
    time_eff = numpyro_tpu.sample("time_eff", dist.GaussianRandomWalk(sigma_t, T))
    logits = intercept + age_eff[age_idx] + time_eff[time_idx]
    with numpyro_tpu.plate("obs", age_idx.shape[0]):
        numpyro_tpu.sample(
            "deaths", dist.Binomial(exposure, logits=logits), obs=deaths
        )


def main(args):
    rng = np.random.RandomState(0)
    A, T = args.num_ages, args.num_times
    age_idx, time_idx = np.meshgrid(np.arange(A), np.arange(T), indexing="ij")
    age_idx, time_idx = age_idx.ravel(), time_idx.ravel()
    exposure = rng.randint(500, 2000, size=A * T).astype(np.float32)
    true_logit = -4.0 + 0.15 * age_idx - 0.05 * time_idx
    deaths = rng.binomial(
        exposure.astype(int), 1 / (1 + np.exp(-true_logit))
    ).astype(np.float32)
    mcmc = MCMC(
        NUTS(model),
        num_warmup=args.num_warmup,
        num_samples=args.num_samples,
        progress_bar=False,
    )
    mcmc.run(
        random.PRNGKey(0),
        jnp.asarray(age_idx),
        jnp.asarray(time_idx),
        jnp.asarray(exposure),
        jnp.asarray(deaths),
        A=A,
        T=T,
    )
    s = mcmc.get_samples()
    age_slope = np.polyfit(
        np.arange(A), np.asarray(s["age_eff"]).mean(0), 1
    )[0]
    print(f"recovered age slope: {age_slope:.3f} (true 0.15)")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--num-ages", type=int, default=8)
    p.add_argument("--num-times", type=int, default=6)
    p.add_argument("--num-warmup", type=int, default=400)
    p.add_argument("--num-samples", type=int, default=400)
    main(p.parse_args())
