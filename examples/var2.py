"""VAR(2) vector autoregression via the effectful scan
(reference: examples/var2.py)."""

import argparse

import numpy as np

import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.contrib.control_flow import scan
from numpyro_tpu.infer import MCMC, NUTS


def var2(y):
    K = y.shape[1]
    a1 = numpyro_tpu.sample("a1", dist.Normal(jnp.zeros((K, K)), 0.5).to_event(2))
    a2 = numpyro_tpu.sample("a2", dist.Normal(jnp.zeros((K, K)), 0.5).to_event(2))
    sigma = numpyro_tpu.sample("sigma", dist.HalfNormal(jnp.ones(K)).to_event(1))

    def transition(carry, yt):
        y1, y2 = carry
        m = a1 @ y1 + a2 @ y2
        numpyro_tpu.sample("y", dist.Normal(m, sigma).to_event(1), obs=yt)
        return (yt, y1), None

    scan(transition, (y[1], y[0]), y[2:])


def main(args):
    rng = np.random.RandomState(0)
    K = 2
    A1 = np.array([[0.5, 0.1], [0.0, 0.4]])
    A2 = np.array([[-0.2, 0.0], [0.1, -0.1]])
    y = [np.zeros(K), 0.1 * rng.randn(K)]
    for _ in range(args.num_steps):
        y.append(A1 @ y[-1] + A2 @ y[-2] + 0.2 * rng.randn(K))
    y = jnp.asarray(np.stack(y))
    mcmc = MCMC(
        NUTS(var2),
        num_warmup=args.num_warmup,
        num_samples=args.num_samples,
        progress_bar=False,
    )
    mcmc.run(random.PRNGKey(0), y)
    a1_hat = np.asarray(mcmc.get_samples()["a1"]).mean(0)
    print("max |A1_hat - A1| =", round(float(np.abs(a1_hat - A1).max()), 3))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--num-steps", type=int, default=150)
    p.add_argument("--num-warmup", type=int, default=400)
    p.add_argument("--num-samples", type=int, default=400)
    main(p.parse_args())
