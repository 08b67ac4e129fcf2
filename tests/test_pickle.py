"""Fitted objects survive pickling (pattern: reference test/test_pickle.py)."""

import pickle

import numpy as np

import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.infer import MCMC, NUTS, SVI, Trace_ELBO
from numpyro_tpu.infer.autoguide import AutoNormal
from numpyro_tpu.optim import Adam


def normal_model(x):
    mu = numpyro_tpu.sample("mu", dist.Normal(0.0, 5.0))
    with numpyro_tpu.plate("N", x.shape[0]):
        numpyro_tpu.sample("x", dist.Normal(mu, 1.0), obs=x)


def test_pickle_mcmc():
    x = 2.0 + random.normal(random.PRNGKey(0), (50,))
    m = MCMC(NUTS(normal_model), num_warmup=50, num_samples=60,
             progress_bar=False)
    m.run(random.PRNGKey(1), x)
    dumped = pickle.dumps(m)
    m2 = pickle.loads(dumped)
    np.testing.assert_allclose(
        np.asarray(m.get_samples()["mu"]), np.asarray(m2.get_samples()["mu"])
    )
    m2.print_summary()


def test_pickle_svi_params():
    x = 2.0 + random.normal(random.PRNGKey(0), (50,))
    guide = AutoNormal(normal_model)
    svi = SVI(normal_model, guide, Adam(1e-2), Trace_ELBO())
    res = svi.run(random.PRNGKey(1), 300, x, progress_bar=False)
    params2 = pickle.loads(pickle.dumps(res.params))
    s1 = guide.sample_posterior(random.PRNGKey(2), res.params)
    s2 = guide.sample_posterior(random.PRNGKey(2), params2)
    np.testing.assert_allclose(np.asarray(s1["mu"]), np.asarray(s2["mu"]))


def test_pickle_distribution():
    d = dist.TransformedDistribution(
        dist.Normal(jnp.zeros(3), 1.0), dist.transforms.ExpTransform()
    )
    d2 = pickle.loads(pickle.dumps(d))
    x = d.sample(random.PRNGKey(0))
    np.testing.assert_allclose(
        np.asarray(d.log_prob(x)), np.asarray(d2.log_prob(x))
    )
