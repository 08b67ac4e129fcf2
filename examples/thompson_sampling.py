"""Thompson sampling with a GP surrogate: sequential optimization of a
1-D function (reference: examples/thompson_sampling.py)."""

import argparse

import numpy as np

import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.infer import SVI, Trace_ELBO
from numpyro_tpu.infer.autoguide import AutoDelta
from numpyro_tpu.optim import Adam


def target(x):
    return -0.5 * (x - 0.7) ** 2 + 0.05 * jnp.sin(12 * x)


def gp_model(X, y):
    var = numpyro_tpu.sample("var", dist.LogNormal(0.0, 1.0))
    length = numpyro_tpu.sample("length", dist.LogNormal(-1.5, 1.0))
    noise = numpyro_tpu.sample("noise", dist.LogNormal(-4.0, 1.0))
    d = (X[:, None] - X[None, :]) / length
    k = var * jnp.exp(-0.5 * d**2) + (noise + 1e-6) * jnp.eye(X.shape[0])
    numpyro_tpu.sample(
        "y", dist.MultivariateNormal(jnp.zeros(X.shape[0]), covariance_matrix=k),
        obs=y,
    )


def gp_posterior_draw(key, X, y, params, grid):
    var, length, noise = params["var"], params["length"], params["noise"]
    def k(a, b, noise_diag=0.0):
        d = (a[:, None] - b[None, :]) / length
        out = var * jnp.exp(-0.5 * d**2)
        if noise_diag:
            out = out + noise_diag * jnp.eye(a.shape[0])
        return out
    Kxx = k(X, X, noise + 1e-6)
    Kxg = k(X, grid)
    Kgg = k(grid, grid, 1e-6)
    sol = jnp.linalg.solve(Kxx, Kxg)
    mu = sol.T @ y
    cov = Kgg - sol.T @ Kxg
    return dist.MultivariateNormal(mu, covariance_matrix=cov).sample(key)


def main(args):
    rng_np = np.random.RandomState(0)
    X = jnp.asarray(rng_np.rand(4))
    y = target(X) + 0.01 * jnp.asarray(rng_np.randn(4))
    grid = jnp.linspace(0, 1, 100)
    key = random.PRNGKey(1)
    for step in range(args.num_rounds):
        guide = AutoDelta(gp_model)
        svi = SVI(gp_model, guide, Adam(5e-2), Trace_ELBO())
        res = svi.run(random.PRNGKey(step), 400, X, y, progress_bar=False)
        params = guide.median(res.params)
        key, sub = random.split(key)
        draw = gp_posterior_draw(sub, X, y, params, grid)
        x_next = grid[jnp.argmax(draw)]
        X = jnp.concatenate([X, x_next[None]])
        y = jnp.concatenate([y, target(x_next)[None] + 0.01 * random.normal(sub)])
    best = float(X[jnp.argmax(y)])
    print(f"best x after {args.num_rounds} rounds: {best:.2f} (optimum ~0.72)")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--num-rounds", type=int, default=5)
    main(p.parse_args())
