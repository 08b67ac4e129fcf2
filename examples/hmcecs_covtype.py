"""HMCECS with Taylor-proxy control variates on covtype-scale data —
the reference's subsampled north-star config (reference: examples/covtype.py
HMCECS path; examples/hmcecs.py)."""

import argparse
import time

import jax
import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.examples.datasets import COVTYPE, load_dataset
from numpyro_tpu.infer import HMCECS, MCMC, NUTS, SVI, Trace_ELBO
from numpyro_tpu.infer.autoguide import AutoDelta
from numpyro_tpu.optim import Adam


def model(X, y, subsample_size):
    D = X.shape[1]
    w = numpyro_tpu.sample("w", dist.Normal(jnp.zeros(D), 1.0).to_event(1))
    with numpyro_tpu.plate("N", X.shape[0], subsample_size=subsample_size):
        xb = numpyro_tpu.subsample(X, event_dim=1)
        yb = numpyro_tpu.subsample(y, event_dim=0)
        numpyro_tpu.sample("y", dist.Bernoulli(logits=xb @ w), obs=yb)


def find_map(X, y, subsample_size, num_steps=500):
    guide = AutoDelta(model)
    svi = SVI(model, guide, Adam(0.01), Trace_ELBO())
    res = svi.run(random.PRNGKey(9), num_steps, X, y, subsample_size,
                  progress_bar=False)
    return guide.median(res.params)


def main(args):
    _, get_batch = load_dataset(COVTYPE, shuffle=False, num_datapoints=args.num_data)
    X, y = get_batch()
    X, y = jnp.asarray(X), jnp.asarray(y)
    ref = find_map(X, y, args.subsample_size)
    kernel = HMCECS(
        NUTS(model, max_tree_depth=args.max_tree_depth),
        num_blocks=args.num_blocks,
        proxy=HMCECS.taylor_proxy(ref),
    )
    mcmc = MCMC(
        kernel,
        num_warmup=args.num_warmup,
        num_samples=args.num_samples,
        progress_bar=False,
    )
    t0 = time.time()
    mcmc.run(random.PRNGKey(0), X, y, args.subsample_size)
    jax.block_until_ready(mcmc.get_samples()["w"])
    print(f"MCMC elapsed time: {time.time() - t0:.1f}s")
    mcmc.print_summary()


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--num-warmup", type=int, default=200)
    p.add_argument("--num-samples", type=int, default=200)
    p.add_argument("--subsample-size", type=int, default=1000)
    p.add_argument("--num-blocks", type=int, default=100)
    p.add_argument("--max-tree-depth", type=int, default=7)
    p.add_argument("--num-data", type=int, default=-1)
    main(p.parse_args())
