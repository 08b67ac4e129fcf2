"""Covtype-scale logistic regression with the fused Pallas GLM likelihood —
the headline workload (reference: examples/covtype.py; here the likelihood
is one fused kernel pass for all chains)."""

import argparse
import time

import jax
import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.examples.datasets import COVTYPE, load_dataset
from numpyro_tpu.infer import MCMC, NUTS
from numpyro_tpu.ops.glm import bernoulli_logits_loglik, prepare_glm_data


def model(data, D):
    w = numpyro_tpu.sample("w", dist.Normal(jnp.zeros(D), 1.0).to_event(1))
    numpyro_tpu.factor("lik", bernoulli_logits_loglik(w, data))


def main(args):
    _, get_batch = load_dataset(COVTYPE, shuffle=False, num_datapoints=args.num_data)
    X, y = get_batch()
    data = prepare_glm_data(jnp.asarray(X), jnp.asarray(y))
    D = X.shape[1]
    mcmc = MCMC(
        NUTS(model, max_tree_depth=args.max_tree_depth),
        num_warmup=args.num_warmup,
        num_samples=args.num_samples,
        num_chains=args.num_chains,
        chain_method="vectorized",
        progress_bar=False,
    )
    t0 = time.time()
    mcmc.run(random.PRNGKey(0), data, D)
    jax.block_until_ready(mcmc.get_samples()["w"])
    print(f"MCMC elapsed time: {time.time() - t0:.1f}s")
    mcmc.print_summary()


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--num-warmup", type=int, default=100)
    p.add_argument("--num-samples", type=int, default=100)
    p.add_argument("--num-chains", type=int, default=128)
    p.add_argument("--max-tree-depth", type=int, default=7)
    p.add_argument("--num-data", type=int, default=-1)
    main(p.parse_args())
