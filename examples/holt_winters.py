"""Holt-Winters exponential smoothing as a probabilistic scan model
(reference: examples/holt_winters.py)."""

import argparse

import numpy as np

import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.contrib.control_flow import scan
from numpyro_tpu.infer import MCMC, NUTS

S = 4  # season length


def holt_winters(y, n_seasons):
    alpha = numpyro_tpu.sample("alpha", dist.Beta(5, 5))
    beta = numpyro_tpu.sample("beta", dist.Beta(1, 10))
    gamma = numpyro_tpu.sample("gamma", dist.Beta(1, 10))
    l0 = numpyro_tpu.sample("l0", dist.Normal(0.0, 1.0))
    b0 = numpyro_tpu.sample("b0", dist.Normal(0.0, 0.1))
    s0 = numpyro_tpu.sample("s0", dist.Normal(jnp.zeros(S), 1.0).to_event(1))
    sigma = numpyro_tpu.sample("sigma", dist.HalfNormal(1.0))

    def transition(carry, yt):
        l, b, s = carry
        m = l + b + s[0]
        numpyro_tpu.sample("y", dist.Normal(m, sigma), obs=yt)
        l_new = alpha * (yt - s[0]) + (1 - alpha) * (l + b)
        b_new = beta * (l_new - l) + (1 - beta) * b
        s_new = jnp.concatenate(
            [s[1:], (gamma * (yt - l - b) + (1 - gamma) * s[0])[None]]
        )
        return (l_new, b_new, s_new), None

    scan(transition, (l0, b0, s0), y)


def main(args):
    rng = np.random.RandomState(0)
    t = np.arange(args.num_steps)
    season = np.array([1.0, -0.5, 0.8, -1.3])
    y = jnp.asarray(0.02 * t + season[t % S] + 0.1 * rng.randn(args.num_steps))
    mcmc = MCMC(
        NUTS(holt_winters),
        num_warmup=args.num_warmup,
        num_samples=args.num_samples,
        progress_bar=False,
    )
    mcmc.run(random.PRNGKey(0), y, args.num_steps // S)
    s = mcmc.get_samples()
    print(f"alpha={float(s['alpha'].mean()):.2f} sigma={float(s['sigma'].mean()):.2f}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--num-steps", type=int, default=80)
    p.add_argument("--num-warmup", type=int, default=500)
    p.add_argument("--num-samples", type=int, default=500)
    main(p.parse_args())
