"""AR(2) time series via the effectful scan — the python loop becomes one
compiled lax.scan (reference: examples/ar2.py)."""

import argparse

import numpy as np

import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.contrib.control_flow import scan
from numpyro_tpu.infer import MCMC, NUTS


def ar2(y):
    a1 = numpyro_tpu.sample("a1", dist.Normal(0.0, 1.0))
    a2 = numpyro_tpu.sample("a2", dist.Normal(0.0, 1.0))
    const = numpyro_tpu.sample("const", dist.Normal(0.0, 1.0))
    sigma = numpyro_tpu.sample("sigma", dist.HalfNormal(1.0))

    def transition(carry, yt):
        y_prev, y_prev2 = carry
        m = const + a1 * y_prev + a2 * y_prev2
        numpyro_tpu.sample("y", dist.Normal(m, sigma), obs=yt)
        return (yt, y_prev), None

    scan(transition, (y[1], y[0]), y[2:])


def main(args):
    rng = np.random.RandomState(0)
    a1_true, a2_true = 0.5, -0.3
    y = [0.0, 0.1]
    for _ in range(args.num_steps):
        y.append(0.1 + a1_true * y[-1] + a2_true * y[-2] + 0.2 * rng.randn())
    y = jnp.asarray(y)
    mcmc = MCMC(
        NUTS(ar2),
        num_warmup=args.num_warmup,
        num_samples=args.num_samples,
        progress_bar=False,
    )
    mcmc.run(random.PRNGKey(0), y)
    s = mcmc.get_samples()
    print(
        f"a1={float(s['a1'].mean()):.2f} (true {a1_true}), "
        f"a2={float(s['a2'].mean()):.2f} (true {a2_true})"
    )


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--num-steps", type=int, default=200)
    p.add_argument("--num-warmup", type=int, default=500)
    p.add_argument("--num-samples", type=int, default=500)
    main(p.parse_args())
