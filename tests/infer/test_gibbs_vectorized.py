"""Chain-batched Gibbs-composed kernels: vectorized multi-chain HMCGibbs /
DiscreteHMCGibbs / HMCECS (the reference runs these single-chain only; here
the Gibbs state carries a chain axis and updates are vmapped)."""

import numpy as np
import pytest

import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.infer import MCMC, NUTS
from numpyro_tpu.infer.hmc_gibbs import HMCECS, DiscreteHMCGibbs, HMCGibbs


def test_hmc_gibbs_vectorized_chains():
    def model():
        x = numpyro_tpu.sample("x", dist.Normal(0.0, 2.0))
        y = numpyro_tpu.sample("y", dist.Normal(0.0, 2.0))
        numpyro_tpu.sample("obs", dist.Normal(x + y, 1.0), obs=jnp.array([1.0]))

    def gibbs_fn(rng_key, gibbs_sites, hmc_sites):
        y = hmc_sites["y"]
        return {"x": dist.Normal(0.8 * (1 - y), jnp.sqrt(0.8)).sample(rng_key)}

    kernel = HMCGibbs(NUTS(model), gibbs_fn=gibbs_fn, gibbs_sites=["x"])
    m = MCMC(
        kernel, num_warmup=300, num_samples=1500, num_chains=4,
        chain_method="vectorized", progress_bar=False,
    )
    m.run(random.PRNGKey(0))
    s = m.get_samples(group_by_chain=True)
    assert s["x"].shape == (4, 1500)
    # 4 chains x 1500 draws tame the slow-mixing posterior's MC error
    assert abs(float(s["x"].mean()) - 4 / 9) < 0.12
    assert abs(float(s["y"].mean()) - 4 / 9) < 0.12


def test_discrete_gibbs_vectorized_chains():
    probs = jnp.array([0.25, 0.5, 0.25])
    locs = jnp.array([-1.0, 0.0, 1.0])

    def model():
        c = numpyro_tpu.sample("c", dist.Categorical(probs))
        numpyro_tpu.sample("x", dist.Normal(locs[c], 0.5))

    kernel = DiscreteHMCGibbs(NUTS(model))
    m = MCMC(
        kernel, num_warmup=300, num_samples=2000, num_chains=4,
        chain_method="vectorized", progress_bar=False,
    )
    m.run(random.PRNGKey(0))
    c = np.asarray(m.get_samples()["c"])
    freqs = np.bincount(c, minlength=3) / len(c)
    np.testing.assert_allclose(freqs, np.asarray(probs), atol=0.06)


@pytest.mark.parametrize(
    "num_chains", [1, pytest.param(4, marks=pytest.mark.slow)]
)
def test_hmcecs_vectorized_chains(num_chains):
    N = 2000
    true_mean = 1.5
    ys = true_mean + random.normal(random.PRNGKey(0), (N,))

    def model(ys):
        mu = numpyro_tpu.sample("mu", dist.Normal(0.0, 10.0))
        with numpyro_tpu.plate("N", len(ys), subsample_size=200):
            batch = numpyro_tpu.subsample(ys, event_dim=0)
            numpyro_tpu.sample("obs", dist.Normal(mu, 1.0), obs=batch)

    proxy = HMCECS.taylor_proxy({"mu": jnp.asarray(true_mean)}, degree=2)
    kernel = HMCECS(NUTS(model), num_blocks=4, proxy=proxy)
    m = MCMC(
        kernel, num_warmup=300, num_samples=1500, num_chains=num_chains,
        chain_method="vectorized", progress_bar=False,
    )
    m.run(random.PRNGKey(1), ys)
    mu = np.asarray(m.get_samples()["mu"])
    assert abs(mu.mean() - ys.mean()) < 0.1
    # posterior std should match the subsampling-free analytic 1/sqrt(N)
    assert abs(mu.std() - 1 / np.sqrt(N)) < 0.05
    ef = m.get_extra_fields()
    if "accept_prob" in ef:
        assert np.asarray(ef["accept_prob"]).mean() > 0.2


@pytest.mark.slow
def test_hmcecs_per_chain_indices_differ():
    # each chain must carry its own subsample index panel after updates
    N = 1000
    ys = random.normal(random.PRNGKey(0), (N,))

    def model(ys):
        mu = numpyro_tpu.sample("mu", dist.Normal(0.0, 10.0))
        with numpyro_tpu.plate("N", len(ys), subsample_size=100):
            batch = numpyro_tpu.subsample(ys, event_dim=0)
            numpyro_tpu.sample("obs", dist.Normal(mu, 1.0), obs=batch)

    kernel = HMCECS(NUTS(model), num_blocks=2)
    m = MCMC(
        kernel, num_warmup=50, num_samples=50, num_chains=3,
        chain_method="vectorized", progress_bar=False,
    )
    m.run(random.PRNGKey(1), ys)
    # postprocess drops the index sites from samples (reference parity);
    # the per-chain panels live in the final kernel state
    idx = np.asarray(m.last_state.z["N"])
    assert idx.shape == (3, 100)
    # chains explore different index sets
    assert not np.array_equal(idx[0], idx[1])
    assert not np.array_equal(idx[1], idx[2])
