"""MixedHMC correctness: Gaussian mixture with a discrete component label
(posterior-moment assertions; pattern: reference test/infer/test_mcmc.py)."""

import numpy as np
import pytest

import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.infer import MCMC
from numpyro_tpu.infer.hmc import HMC
from numpyro_tpu.infer.mixed_hmc import MixedHMC


@pytest.mark.parametrize("modified", [False, True])
def test_mixed_hmc_gaussian_mixture(modified):
    probs = jnp.array([0.3, 0.7])
    locs = jnp.array([-0.5, 1.0])

    def model():
        c = numpyro_tpu.sample("c", dist.Categorical(probs))
        numpyro_tpu.sample("x", dist.Normal(locs[c], 0.8))

    kernel = MixedHMC(
        HMC(model, trajectory_length=1.2), num_discrete_updates=4,
        modified=modified,
    )
    m = MCMC(kernel, num_warmup=800, num_samples=6000, progress_bar=False)
    m.run(random.PRNGKey(0))
    s = m.get_samples()
    c = np.asarray(s["c"])
    x = np.asarray(s["x"])
    true_mean = float(jnp.dot(probs, locs))
    freqs = np.bincount(c, minlength=2) / len(c)
    np.testing.assert_allclose(freqs, np.asarray(probs), atol=0.06)
    assert abs(x.mean() - true_mean) < 0.1
    true_var = float(jnp.dot(probs, (locs - true_mean) ** 2) + 0.8**2)
    assert abs(x.var() - true_var) < 0.2


def test_mixed_hmc_vectorized_chains():
    probs = jnp.array([0.4, 0.6])
    locs = jnp.array([0.0, 1.0])

    def model():
        c = numpyro_tpu.sample("c", dist.Categorical(probs))
        numpyro_tpu.sample("x", dist.Normal(locs[c], 1.0))

    kernel = MixedHMC(HMC(model, trajectory_length=1.2), num_discrete_updates=3)
    m = MCMC(
        kernel, num_warmup=500, num_samples=2000, num_chains=4,
        chain_method="vectorized", progress_bar=False,
    )
    m.run(random.PRNGKey(1))
    s = m.get_samples(group_by_chain=True)
    assert s["x"].shape == (4, 2000)
    c = np.asarray(s["c"]).reshape(-1)
    freqs = np.bincount(c, minlength=2) / len(c)
    np.testing.assert_allclose(freqs, np.asarray(probs), atol=0.06)
