"""HSGP approximation tests (reference: test/contrib/hsgp/)."""

import pytest
import numpy as np

import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.contrib.hsgp import (
    hsgp_matern,
    hsgp_periodic_non_centered,
    hsgp_squared_exponential,
)
from numpyro_tpu.contrib.hsgp.laplacian import eigenfunctions, eigenindices
from numpyro_tpu.contrib.hsgp.spectral_densities import (
    diag_spectral_density_squared_exponential,
)
from numpyro_tpu.infer import MCMC, NUTS


def test_eigenindices_shapes():
    assert eigenindices(10, 1).shape == (1, 10)
    assert eigenindices(10, 2).shape == (2, 100)
    S = eigenindices([2, 2, 3], 3)
    assert S.shape == (3, 12)


def test_eigenfunctions_shapes():
    x = jnp.linspace(-1, 1, 50)
    assert eigenfunctions(x, ell=1.2, m=10).shape == (50, 10)
    x2 = jnp.ones((50, 3))
    assert eigenfunctions(x2, ell=1.2, m=[2, 2, 3]).shape == (50, 12)


def test_spectral_density_positive():
    spd = diag_spectral_density_squared_exponential(1.0, 0.5, 1.5, 10, 1)
    assert (np.asarray(spd) > 0).all()


@pytest.mark.slow
def test_hsgp_se_recovers_function():
    x = jnp.linspace(-1, 1, 80)
    ytrue = jnp.sin(3 * x)
    y = ytrue + 0.1 * random.normal(random.PRNGKey(0), x.shape)

    def model(x, y=None):
        f = hsgp_squared_exponential(x, alpha=1.0, length=0.3, ell=1.5, m=12)
        with numpyro_tpu.plate("N", x.shape[0]):
            numpyro_tpu.sample("y", dist.Normal(f, 0.1), obs=y)
        numpyro_tpu.deterministic("f", f)

    m = MCMC(NUTS(model), num_warmup=300, num_samples=300, progress_bar=False)
    m.run(random.PRNGKey(1), x, y)
    err = float(jnp.abs(m.get_samples()["f"].mean(0) - ytrue).mean())
    assert err < 0.12


@pytest.mark.slow
def test_hsgp_matern_and_periodic_run():
    x = jnp.linspace(-1, 1, 50)
    y = jnp.sin(3 * x)

    def model_m(x, y=None):
        f = hsgp_matern(x, nu=1.5, alpha=1.0, length=0.3, ell=1.5, m=8)
        with numpyro_tpu.plate("N", x.shape[0]):
            numpyro_tpu.sample("y", dist.Normal(f, 0.1), obs=y)

    m = MCMC(NUTS(model_m), num_warmup=200, num_samples=200, progress_bar=False)
    m.run(random.PRNGKey(2), x, y)

    xp = jnp.linspace(0, 4, 60)
    yp = jnp.sin(2 * jnp.pi * xp / 2.0)

    def model_p(x, y=None):
        f = hsgp_periodic_non_centered(
            x, alpha=1.0, length=0.5, w0=2 * jnp.pi / 2.0, m=6
        )
        with numpyro_tpu.plate("N", x.shape[0]):
            numpyro_tpu.sample("y", dist.Normal(f, 0.1), obs=y)

    m = MCMC(NUTS(model_p), num_warmup=200, num_samples=200, progress_bar=False)
    m.run(random.PRNGKey(3), xp, yp)
