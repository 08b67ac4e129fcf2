"""NeuTra: neutralize bad posterior geometry with a BNAF guide, then run
NUTS in the flow's latent space (reference: examples/neutra.py)."""

import argparse

import numpy as np

import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.infer import MCMC, NUTS, SVI, Trace_ELBO
from numpyro_tpu.infer.autoguide import AutoBNAFNormal
from numpyro_tpu.infer.reparam import NeuTraReparam
from numpyro_tpu.optim import Adam


def dual_moon_pe(x):
    term1 = 0.5 * ((jnp.linalg.norm(x, axis=-1) - 2) / 0.4) ** 2
    term2 = -0.5 * ((x[..., :1] + jnp.array([-2.0, 2.0])) / 0.6) ** 2
    return term1 - jnp.log(jnp.exp(term2).sum(-1))


def model():
    x = numpyro_tpu.sample(
        "x", dist.Normal(jnp.zeros(2), 10.0).to_event(1)
    )
    numpyro_tpu.factor("dual_moon", -dual_moon_pe(x))


def main(args):
    guide = AutoBNAFNormal(model, hidden_factors=[8, 8])
    svi = SVI(model, guide, Adam(3e-3), Trace_ELBO())
    res = svi.run(random.PRNGKey(0), args.num_iters, progress_bar=False)
    print(f"ELBO loss: {float(res.losses[0]):.1f} -> {float(res.losses[-1]):.1f}")

    neutra = NeuTraReparam(guide, res.params)
    neutra_model = neutra.reparam(model)
    mcmc = MCMC(
        NUTS(neutra_model),
        num_warmup=args.num_warmup,
        num_samples=args.num_samples,
        progress_bar=False,
    )
    mcmc.run(random.PRNGKey(1))
    zs = mcmc.get_samples()["x_shared_latent"]
    x = np.asarray(neutra.transform_sample(zs)["x"])
    # the two moons sit at x0 = +-2: both modes must be visited
    frac_right = float((x[:, 0] > 0).mean())
    print(f"mode balance: {frac_right:.2f} right / {1 - frac_right:.2f} left")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--num-iters", type=int, default=2000)
    p.add_argument("--num-warmup", type=int, default=300)
    p.add_argument("--num-samples", type=int, default=500)
    main(p.parse_args())
