"""SMC adaptive-tempering tests: posterior moments + exact log-evidence on a
conjugate Gaussian (no SMC exists in the reference — design per Del Moral
et al. 2006; BASELINE.md north star)."""

import numpy as np
import scipy.stats as st

import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.infer import SMC


def test_smc_conjugate_gaussian_evidence():
    def model(y):
        mu = numpyro_tpu.sample("mu", dist.Normal(0.0, 1.0))
        with numpyro_tpu.plate("N", y.shape[0]):
            numpyro_tpu.sample("y", dist.Normal(mu, 1.0), obs=y)

    y = jnp.array([0.5, 1.5, 1.0, 0.8, 1.2])
    smc = SMC(model, num_particles=2000, num_mcmc_steps=10)
    res = smc.run(random.PRNGKey(0), y)
    mu = np.asarray(res.samples["mu"])
    post_mean = float(y.sum()) / 6
    post_sd = (1 / 6) ** 0.5
    assert abs(mu.mean() - post_mean) < 0.05
    assert abs(mu.std() - post_sd) < 0.07
    n = len(y)
    S = np.eye(n) + np.ones((n, n))
    exact = st.multivariate_normal(np.zeros(n), S).logpdf(np.asarray(y))
    assert abs(res.log_evidence - exact) < 0.2
    assert res.betas[-1] == 1.0


def test_smc_constrained_support():
    def model(y):
        s = numpyro_tpu.sample("s", dist.HalfNormal(2.0))
        with numpyro_tpu.plate("N", y.shape[0]):
            numpyro_tpu.sample("y", dist.Normal(0.0, s), obs=y)

    y = jnp.array([0.5, 1.5, 1.0, 0.8, 1.2])
    res = SMC(model, num_particles=1000, num_mcmc_steps=8).run(
        random.PRNGKey(1), y
    )
    s = np.asarray(res.samples["s"])
    assert (s > 0).all()
    assert 0.5 < s.mean() < 2.0
