"""AutoDAIS vs AutoDiagonalNormal on a correlated posterior: annealed
importance steps recover correlation mean-field misses
(reference: examples/dais_demo.py)."""

import argparse

import numpy as np

import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.infer import SVI, Trace_ELBO
from numpyro_tpu.infer.autoguide import AutoDAIS, AutoDiagonalNormal
from numpyro_tpu.optim import Adam


def model(X, y):
    w = numpyro_tpu.sample(
        "w", dist.Normal(jnp.zeros(X.shape[1]), 1.0).to_event(1)
    )
    with numpyro_tpu.plate("N", X.shape[0]):
        numpyro_tpu.sample("y", dist.Bernoulli(logits=X @ w), obs=y)


def fit(guide_cls, name, X, y, args, **kwargs):
    guide = guide_cls(model, **kwargs)
    svi = SVI(model, guide, Adam(5e-3), Trace_ELBO())
    res = svi.run(random.PRNGKey(1), args.num_iters, X, y, progress_bar=False)
    samples = guide.sample_posterior(
        random.PRNGKey(2), res.params, sample_shape=(1000,)
    )
    w = np.asarray(samples["w"])
    print(f"{name}: final ELBO {float(res.losses[-1]):.2f}, "
          f"posterior sd per dim {np.round(w.std(0), 3)}")
    return w


def main(args):
    rng = np.random.RandomState(0)
    # strongly correlated design -> correlated posterior
    base = rng.randn(args.num_data, 1)
    X = jnp.asarray(np.concatenate([base + 0.1 * rng.randn(args.num_data, 1),
                                    base + 0.1 * rng.randn(args.num_data, 1)], 1))
    y = jnp.asarray((rng.rand(args.num_data) < 0.5).astype(np.float32))
    fit(AutoDiagonalNormal, "mean-field", X, y, args)
    fit(AutoDAIS, "AutoDAIS  ", X, y, args, K=4, eta_init=0.01)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--num-data", type=int, default=100)
    p.add_argument("--num-iters", type=int, default=2000)
    main(p.parse_args())
