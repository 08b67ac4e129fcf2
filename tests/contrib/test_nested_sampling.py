"""Nested sampler: analytic-evidence and posterior-moment checks.

Reference surface: numpyro/contrib/nested_sampling.py (jaxns-backed there;
native batched sampler here)."""

import numpy as np
import pytest

import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.contrib.nested_sampling import NestedSampler

SP, SO = 2.0, 0.5
Y = np.array([0.7, 1.1, 0.9, 1.3, 0.8, 1.0, 1.2, 0.95, 1.05, 0.85])


def conjugate_model(y):
    mu = numpyro_tpu.sample("mu", dist.Normal(0.0, SP))
    with numpyro_tpu.plate("N", len(y)):
        numpyro_tpu.sample("y", dist.Normal(mu, SO), obs=y)


def analytic():
    n = len(Y)
    cov = SO**2 * np.eye(n) + SP**2 * np.ones((n, n))
    sign, logdet = np.linalg.slogdet(2 * np.pi * cov)
    logz = -0.5 * (logdet + Y @ np.linalg.solve(cov, Y))
    post_var = 1.0 / (1.0 / SP**2 + n / SO**2)
    post_mean = post_var * Y.sum() / SO**2
    return logz, post_mean, np.sqrt(post_var)


@pytest.fixture(scope="module")
def fitted():
    ns = NestedSampler(
        conjugate_model,
        constructor_kwargs={"num_live_points": 200, "max_samples": 8000},
    )
    ns.run(random.PRNGKey(0), jnp.asarray(Y))
    return ns


@pytest.mark.slow
def test_evidence(fitted):
    logz_true, _, _ = analytic()
    res = fitted.diagnostics()
    assert abs(float(res.log_Z) - logz_true) < 0.3
    assert 0.0 < float(res.log_Z_err) < 0.5
    assert float(res.ess) > 100


@pytest.mark.slow
def test_posterior_moments(fitted):
    _, post_mean, post_std = analytic()
    s = fitted.get_samples(random.PRNGKey(1), 2000)
    assert abs(float(s["mu"].mean()) - post_mean) < 0.08
    assert abs(float(s["mu"].std()) - post_std) < 0.06


@pytest.mark.slow
def test_weighted_samples(fitted):
    samples, logw = fitted.get_weighted_samples()
    w = jnp.exp(logw)
    assert abs(float(w.sum()) - 1.0) < 1e-3
    _, post_mean, _ = analytic()
    assert abs(float((w * samples["mu"]).sum()) - post_mean) < 0.08


def test_requires_run():
    ns = NestedSampler(conjugate_model)
    with pytest.raises(RuntimeError):
        ns.get_samples(random.PRNGKey(0), 10)
    with pytest.raises(RuntimeError):
        ns.diagnostics()


def test_rejects_discrete():
    def m():
        z = numpyro_tpu.sample("z", dist.Bernoulli(0.3))
        numpyro_tpu.sample("x", dist.Normal(z.astype(float), 1.0), obs=0.5)

    ns = NestedSampler(m)
    with pytest.raises(ValueError, match="continuous"):
        ns.run(random.PRNGKey(0))
