"""Dawid-Skene annotation model: per-annotator confusion matrices with the
true classes enumerated out (reference: examples/annotation.py)."""

import argparse

import numpy as np

import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.infer import MCMC, NUTS
from numpyro_tpu.ops.indexing import Vindex


def dawid_skene(positions, annotations, num_classes, num_annotators):
    """positions: (J,) annotator id per annotation slot;
    annotations: (N_items, J) observed labels.  ``num_annotators`` is a
    static python int: model data rides through the compiled program as a
    traced input, so static structure must come in as plain ints."""
    J = positions.shape[0]
    N = annotations.shape[0]
    pi = numpyro_tpu.sample("pi", dist.Dirichlet(jnp.ones(num_classes)))
    with numpyro_tpu.plate("annotator", num_annotators, dim=-2):
        with numpyro_tpu.plate("class", num_classes):
            beta = numpyro_tpu.sample(
                "beta",
                dist.Dirichlet(jnp.eye(num_classes) * 4 + jnp.ones(num_classes)),
            )
    with numpyro_tpu.plate("item", N, dim=-2):
        c = numpyro_tpu.sample(
            "c", dist.Categorical(pi), infer={"enumerate": "parallel"}
        )
        with numpyro_tpu.plate("position", J, dim=-1):
            numpyro_tpu.sample(
                "y", dist.Categorical(Vindex(beta)[positions, c, :]),
                obs=annotations,
            )


def main(args):
    rng = np.random.RandomState(0)
    K, J, N = 3, 5, args.num_items
    true_c = rng.randint(0, K, size=N)
    conf = 0.75 * np.eye(K) + 0.25 / K
    annotations = np.stack(
        [[rng.choice(K, p=conf[true_c[n]]) for _ in range(J)] for n in range(N)]
    )
    positions = jnp.arange(J)
    mcmc = MCMC(
        NUTS(dawid_skene),
        num_warmup=args.num_warmup,
        num_samples=args.num_samples,
        progress_bar=False,
    )
    mcmc.run(random.PRNGKey(0), positions, jnp.asarray(annotations), K, J)
    pi_hat = np.asarray(mcmc.get_samples()["pi"]).mean(0)
    print("class prevalence estimate:", np.round(pi_hat, 2))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--num-items", type=int, default=60)
    p.add_argument("--num-warmup", type=int, default=300)
    p.add_argument("--num-samples", type=int, default=300)
    main(p.parse_args())
