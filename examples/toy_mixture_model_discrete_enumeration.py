"""Toy A -> B -> C mixture with all discretes enumerated; SVI with
TraceEnum_ELBO learns the CPDs (reference:
examples/toy_mixture_model_discrete_enumeration.py)."""

import argparse

import numpy as np

import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.infer import SVI, TraceEnum_ELBO
from numpyro_tpu.optim import Adam


def model(data):
    p_a = numpyro_tpu.sample("p_A", dist.Beta(1, 1))
    p_b = numpyro_tpu.sample("p_B", dist.Beta(jnp.ones(2), jnp.ones(2)).to_event(1))
    p_c = numpyro_tpu.sample("p_C", dist.Beta(jnp.ones(2), jnp.ones(2)).to_event(1))
    with numpyro_tpu.plate("data", data.shape[0]):
        a = numpyro_tpu.sample(
            "A", dist.Bernoulli(p_a), infer={"enumerate": "parallel"}
        )
        b = numpyro_tpu.sample(
            "B", dist.Bernoulli(p_b[a]), infer={"enumerate": "parallel"}
        )
        numpyro_tpu.sample("C", dist.Bernoulli(p_c[b]), obs=data)


def guide(data):
    a = numpyro_tpu.param(
        "a", jnp.array([1.0, 1.0]), constraint=dist.constraints.positive
    )
    numpyro_tpu.sample("p_A", dist.Beta(a[0], a[1]))
    bp = numpyro_tpu.param(
        "bp", jnp.ones((2, 2)), constraint=dist.constraints.positive
    )
    numpyro_tpu.sample("p_B", dist.Beta(bp[:, 0], bp[:, 1]).to_event(1))
    cp = numpyro_tpu.param(
        "cp", jnp.ones((2, 2)), constraint=dist.constraints.positive
    )
    numpyro_tpu.sample("p_C", dist.Beta(cp[:, 0], cp[:, 1]).to_event(1))


def main(args):
    rng = np.random.RandomState(0)
    p_a, p_b, p_c = 0.3, np.array([0.2, 0.8]), np.array([0.1, 0.9])
    a = rng.binomial(1, p_a, args.num_data)
    b = rng.binomial(1, p_b[a])
    data = jnp.asarray(rng.binomial(1, p_c[b]).astype(np.float32))
    svi = SVI(model, guide, Adam(5e-3), TraceEnum_ELBO())
    res = svi.run(random.PRNGKey(0), args.num_iters, data, progress_bar=False)
    print(f"ELBO: {float(res.losses[0]):.1f} -> {float(res.losses[-1]):.1f}")
    assert np.isfinite(np.asarray(res.losses[-200:])).all()


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--num-data", type=int, default=500)
    p.add_argument("--num-iters", type=int, default=2000)
    main(p.parse_args())
