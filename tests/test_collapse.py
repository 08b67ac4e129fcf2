"""collapse handler: direct conjugacy rules replacing the reference's
funsor-lazy collapse (reference: handlers.py:331)."""

import numpy as np
import scipy.stats as st

import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu import handlers
from numpyro_tpu.infer import MCMC, NUTS
from numpyro_tpu.infer.util import log_density


def _ld(model, *args):
    return log_density(handlers.seed(model, random.PRNGKey(0)), args, {}, {})


def test_collapse_beta_bernoulli():
    def model(x):
        with handlers.collapse():
            p = numpyro_tpu.sample("p", dist.Beta(2.0, 3.0))
            numpyro_tpu.sample("obs", dist.Bernoulli(p), obs=x)

    ld, tr = _ld(model, jnp.array(1.0))
    np.testing.assert_allclose(float(ld), np.log(2 / 5), rtol=1e-5)
    assert "p" not in tr and "obs" in tr


def test_collapse_gamma_poisson():
    def model(x):
        with handlers.collapse():
            lam = numpyro_tpu.sample("lam", dist.Gamma(3.0, 2.0))
            numpyro_tpu.sample("obs", dist.Poisson(lam), obs=x)

    ld, _ = _ld(model, jnp.array(4.0))
    np.testing.assert_allclose(float(ld), st.nbinom(3, 2 / 3).logpmf(4), rtol=1e-4)


def test_collapse_normal_normal():
    def model(x):
        with handlers.collapse():
            mu = numpyro_tpu.sample("mu", dist.Normal(1.0, 2.0))
            numpyro_tpu.sample("obs", dist.Normal(mu, 1.5), obs=x)

    ld, _ = _ld(model, jnp.array(0.3))
    np.testing.assert_allclose(
        float(ld), st.norm(1.0, np.sqrt(6.25)).logpdf(0.3), rtol=1e-5
    )


def test_collapse_dirichlet_categorical():
    def model(x):
        with handlers.collapse():
            p = numpyro_tpu.sample("p", dist.Dirichlet(jnp.array([1.0, 2.0, 3.0])))
            numpyro_tpu.sample("obs", dist.Categorical(p), obs=x)

    ld, _ = _ld(model, jnp.array(2))
    np.testing.assert_allclose(float(ld), np.log(0.5), rtol=1e-5)


def test_collapse_batched_elementwise():
    def model(x):
        with handlers.collapse():
            p = numpyro_tpu.sample(
                "p",
                dist.Beta(jnp.array([2.0, 5.0]), jnp.array([3.0, 1.0])).to_event(1),
            )
            numpyro_tpu.sample("obs", dist.Bernoulli(p).to_event(1), obs=x)

    ld, _ = _ld(model, jnp.array([1.0, 0.0]))
    np.testing.assert_allclose(float(ld), np.log(2 / 5) + np.log(1 / 6), rtol=1e-5)


def test_collapse_unused_raises():
    def model():
        with handlers.collapse():
            numpyro_tpu.sample("p", dist.Beta(2.0, 3.0))

    with np.testing.assert_raises(RuntimeError):
        _ld(model)


def test_collapse_under_nuts():
    """Collapsing the conjugate site leaves a smaller model for NUTS."""
    x = (random.uniform(random.PRNGKey(0), (100,)) < 0.7).astype(jnp.float32)

    def model(x):
        logit = numpyro_tpu.sample("logit", dist.Normal(0.0, 2.0))
        with handlers.collapse():
            lam = numpyro_tpu.sample("lam", dist.Gamma(3.0, 2.0))
            numpyro_tpu.sample("k", dist.Poisson(lam), obs=jnp.array(2.0))
        with numpyro_tpu.plate("N", x.shape[0]):
            numpyro_tpu.sample("x", dist.Bernoulli(logits=logit), obs=x)

    m = MCMC(NUTS(model), num_warmup=200, num_samples=200, progress_bar=False)
    m.run(random.PRNGKey(1), x)
    assert "lam" not in m.get_samples()
    p_hat = float(1 / (1 + np.exp(-np.asarray(m.get_samples()["logit"]).mean())))
    assert abs(p_hat - 0.7) < 0.1
