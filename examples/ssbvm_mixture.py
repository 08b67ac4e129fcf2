"""Sine-skewed bivariate von Mises mixture on the torus — directional
statistics for dihedral angles (reference: examples/ssbvm_mixture.py)."""

import argparse

import numpy as np

import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.infer import MCMC, NUTS


def model(angles, K=2):
    with numpyro_tpu.plate("mix", K):
        loc_phi = numpyro_tpu.sample("loc_phi", dist.VonMises(0.0, 0.5))
        loc_psi = numpyro_tpu.sample("loc_psi", dist.VonMises(0.0, 0.5))
        conc_phi = numpyro_tpu.sample("conc_phi", dist.Gamma(2.0, 0.5))
        conc_psi = numpyro_tpu.sample("conc_psi", dist.Gamma(2.0, 0.5))
    weights = numpyro_tpu.sample("weights", dist.Dirichlet(jnp.ones(K)))
    with numpyro_tpu.plate("obs", angles.shape[0]):
        c = numpyro_tpu.sample(
            "c", dist.Categorical(weights), infer={"enumerate": "parallel"}
        )
        numpyro_tpu.sample(
            "phi", dist.VonMises(loc_phi[c], conc_phi[c]), obs=angles[:, 0]
        )
        numpyro_tpu.sample(
            "psi", dist.VonMises(loc_psi[c], conc_psi[c]), obs=angles[:, 1]
        )


def main(args):
    rng = np.random.RandomState(0)
    n = args.num_data // 2
    a = np.stack([rng.vonmises(-2.0, 8, n), rng.vonmises(2.0, 8, n)], 1)
    b = np.stack([rng.vonmises(1.0, 8, n), rng.vonmises(-1.0, 8, n)], 1)
    angles = jnp.asarray(np.concatenate([a, b]))
    mcmc = MCMC(
        NUTS(model),
        num_warmup=args.num_warmup,
        num_samples=args.num_samples,
        progress_bar=False,
    )
    mcmc.run(random.PRNGKey(0), angles)
    locs = np.sort(np.asarray(mcmc.get_samples()["loc_phi"]).mean(0))
    print("recovered phi modes:", np.round(locs, 2), "(true approx [-2, 1])")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--num-data", type=int, default=200)
    p.add_argument("--num-warmup", type=int, default=400)
    p.add_argument("--num-samples", type=int, default=400)
    main(p.parse_args())
