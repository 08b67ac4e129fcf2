"""SA / BarkerMH / AIES / ESS kernel correctness — posterior-moment
assertions on analytic targets (pattern: reference test/infer/test_mcmc.py:28-72)."""

import numpy as np
import pytest

import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.infer import AIES, ESS, MCMC, SA, BarkerMH

TRUE_MEAN, TRUE_STD = 1.0, 2.0


def gaussian_potential(z):
    return 0.5 * jnp.sum(((z - TRUE_MEAN) / TRUE_STD) ** 2)


def normal_model():
    x = numpyro_tpu.sample("x", dist.Normal().expand([3]))
    numpyro_tpu.sample("obs", dist.Normal(x, 1.0), obs=jnp.ones(3))


def test_barker_gaussian():
    m = MCMC(
        BarkerMH(potential_fn=gaussian_potential),
        num_warmup=1000,
        num_samples=6000,
        progress_bar=False,
    )
    m.run(random.PRNGKey(0), init_params=jnp.array(0.0))
    s = np.asarray(m.get_samples())
    assert abs(s.mean() - TRUE_MEAN) < 0.15
    assert abs(s.std() - TRUE_STD) < 0.15


def test_barker_vectorized_chains():
    m = MCMC(
        BarkerMH(potential_fn=gaussian_potential),
        num_warmup=1000,
        num_samples=2000,
        num_chains=4,
        chain_method="vectorized",
        progress_bar=False,
    )
    m.run(random.PRNGKey(0), init_params=jnp.zeros(4))
    s = np.asarray(m.get_samples())
    assert abs(s.mean() - TRUE_MEAN) < 0.15
    assert abs(s.std() - TRUE_STD) < 0.15


def test_sa_gaussian():
    m = MCMC(
        SA(potential_fn=gaussian_potential, adapt_state_size=20),
        num_warmup=2000,
        num_samples=12000,
        progress_bar=False,
    )
    m.run(random.PRNGKey(0), init_params=jnp.array(0.0))
    s = np.asarray(m.get_samples())
    assert abs(s.mean() - TRUE_MEAN) < 0.15
    assert abs(s.std() - TRUE_STD) < 0.2


@pytest.mark.parametrize("kernel_cls", [AIES, ESS])
def test_ensemble_gaussian(kernel_cls):
    n_chains = 10
    m = MCMC(
        kernel_cls(potential_fn=gaussian_potential),
        num_warmup=1000,
        num_samples=3000,
        num_chains=n_chains,
        chain_method="vectorized",
        progress_bar=False,
    )
    m.run(
        random.PRNGKey(0),
        init_params=random.normal(random.PRNGKey(9), (n_chains,)),
    )
    s = np.asarray(m.get_samples())
    assert abs(s.mean() - TRUE_MEAN) < 0.2
    assert abs(s.std() - TRUE_STD) < 0.2


@pytest.mark.parametrize(
    "kernel_factory,n_chains,method",
    [
        (lambda: BarkerMH(normal_model), 1, "sequential"),
        (lambda: SA(normal_model), 1, "sequential"),
        (lambda: AIES(normal_model), 12, "vectorized"),
        (lambda: ESS(normal_model), 12, "vectorized"),
    ],
)
def test_model_posterior(kernel_factory, n_chains, method):
    m = MCMC(
        kernel_factory(),
        num_warmup=1000,
        num_samples=2000,
        num_chains=n_chains,
        chain_method=method,
        progress_bar=False,
    )
    m.run(random.PRNGKey(1))
    x = np.asarray(m.get_samples()["x"])
    # posterior: N(0.5, 1/sqrt(2)) per coordinate
    assert abs(x.mean() - 0.5) < 0.12


def test_ensemble_requires_even_vectorized():
    with pytest.raises(AssertionError):
        AIES(normal_model).init(random.PRNGKey(0), 10, None, (), {})


def test_multichain_inits_are_dispersed():
    # regression: chains must not start at identical points
    kernel = BarkerMH(normal_model)
    keys = random.split(random.PRNGKey(3), 4)
    state = kernel.init(keys, 10, None, (), {})
    x0 = np.asarray(state.z["x"])
    assert np.unique(x0[:, 0]).size == 4


@pytest.mark.parametrize("dense_mass", [True, False])
def test_sa_vectorized_chains(dense_mass):
    def pot(z):
        return 0.5 * jnp.sum(((z - TRUE_MEAN) / TRUE_STD) ** 2)

    m = MCMC(
        SA(potential_fn=pot, adapt_state_size=16, dense_mass=dense_mass),
        num_warmup=1000,
        num_samples=4000,
        num_chains=4,
        chain_method="vectorized",
        progress_bar=False,
    )
    m.run(random.PRNGKey(0), init_params=jnp.zeros((4, 2)))
    s = np.asarray(m.get_samples())
    assert s.shape == (16000, 2)
    assert abs(s.mean() - TRUE_MEAN) < 0.2
    assert abs(s.std() - TRUE_STD) < 0.3
