"""Predictive semantics: prior predictive, posterior predictive from MCMC
samples and from an SVI guide, return_sites filtering, parallel fan-out,
batch_ndims handling, and log_likelihood (mirrors the coverage of reference
test/infer/test_infer_util.py)."""

import numpy as np
import pytest

import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.infer import MCMC, NUTS, SVI, Predictive, Trace_ELBO, log_likelihood
from numpyro_tpu.infer.autoguide import AutoNormal

N = 40
TRUE_MU = 1.5


def model(y=None):
    mu = numpyro_tpu.sample("mu", dist.Normal(0.0, 10.0))
    sigma = numpyro_tpu.sample("sigma", dist.HalfNormal(2.0))
    with numpyro_tpu.plate("N", N):
        numpyro_tpu.sample("y", dist.Normal(mu, sigma), obs=y)
    numpyro_tpu.deterministic("mu2", mu * 2)


@pytest.fixture(scope="module")
def y_data():
    return TRUE_MU + 0.5 * random.normal(random.PRNGKey(0), (N,))


@pytest.fixture(scope="module")
def posterior(y_data):
    m = MCMC(NUTS(model), num_warmup=300, num_samples=400, progress_bar=False)
    m.run(random.PRNGKey(1), y_data)
    return m.get_samples()


def test_prior_predictive_shapes_and_moments():
    pred = Predictive(model, num_samples=1500)
    out = pred(random.PRNGKey(2))
    assert out["y"].shape == (1500, N)
    assert out["mu"].shape == (1500,)
    # prior predictive mean of mu is 0 with sd 10
    assert abs(float(out["mu"].mean())) < 1.0


@pytest.mark.parametrize("parallel", [False, True])
def test_posterior_predictive(posterior, y_data, parallel):
    pred = Predictive(model, posterior, parallel=parallel)
    out = pred(random.PRNGKey(3))
    # only predictive sites are returned (latents come from the posterior)
    assert "y" in out and "mu" not in out
    assert out["y"].shape == (400, N)
    assert abs(float(out["y"].mean()) - TRUE_MU) < 0.3


def test_return_sites_and_deterministic(posterior):
    pred = Predictive(model, posterior, return_sites=["y", "mu2"])
    out = pred(random.PRNGKey(4))
    assert set(out) == {"y", "mu2"}
    assert np.allclose(
        np.asarray(out["mu2"]), 2 * np.asarray(posterior["mu"]), atol=1e-5
    )


def test_guide_based_predictive(y_data):
    guide = AutoNormal(model)
    svi = SVI(model, guide, numpyro_tpu.optim.Adam(5e-2), Trace_ELBO())
    res = svi.run(random.PRNGKey(5), 1000, y_data, progress_bar=False)
    pred = Predictive(model, guide=guide, params=res.params, num_samples=500)
    out = pred(random.PRNGKey(6))
    assert out["y"].shape == (500, N)
    assert abs(float(out["y"].mean()) - TRUE_MU) < 0.3


def test_batch_ndims_two(posterior):
    grouped = {k: v.reshape((4, 100) + v.shape[1:]) for k, v in posterior.items()}
    pred = Predictive(model, grouped, batch_ndims=2)
    out = pred(random.PRNGKey(7))
    assert out["y"].shape == (4, 100, N)


def test_log_likelihood_matches_manual(posterior, y_data):
    ll = log_likelihood(model, posterior, y_data)
    assert ll["y"].shape == (400, N)
    manual = dist.Normal(
        posterior["mu"][:, None], posterior["sigma"][:, None]
    ).log_prob(y_data)
    assert np.allclose(np.asarray(ll["y"]), np.asarray(manual), atol=1e-5)


def test_predictive_requires_samples_or_num():
    with pytest.raises(ValueError):
        Predictive(model)
