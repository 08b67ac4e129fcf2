"""ChEES-HMC: cross-chain adaptive HMC (Hoffman/Radul/Sountsov 2021).
No reference equivalent; correctness = posterior moments on analytic
targets, same strategy as tests/infer/test_kernels.py."""

import numpy as np
import pytest

import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.infer import MCMC, CheesHMC, NUTS


def test_chees_gaussian_moments():
    cov = jnp.array([[2.0, 1.2], [1.2, 4.0]])
    prec = jnp.linalg.inv(cov)
    mu = jnp.array([1.0, -2.0])

    def pot(z):
        d = z["x"] - mu
        return 0.5 * d @ prec @ d

    m = MCMC(
        CheesHMC(potential_fn=pot),
        num_warmup=500,
        num_samples=500,
        num_chains=64,
        progress_bar=False,
    )
    m.run(random.PRNGKey(0), init_params={"x": jnp.zeros((64, 2))})
    xs = np.asarray(m.get_samples()["x"]).reshape(-1, 2)
    assert np.allclose(xs.mean(0), mu, atol=0.15)
    assert np.allclose(np.cov(xs.T), cov, rtol=0.15, atol=0.25)
    # pooled dual averaging should land on the accept target
    assert abs(float(m.last_state.mean_accept_prob.mean()) - 0.651) < 0.05


@pytest.mark.slow
def test_chees_matches_nuts_logistic():
    N, D = 500, 6
    X = random.normal(random.PRNGKey(1), (N, D))
    true_w = jnp.linspace(-1.5, 1.5, D)
    y = dist.Bernoulli(logits=X @ true_w).sample(random.PRNGKey(2))

    def model(X, y):
        w = numpyro_tpu.sample("w", dist.Normal(jnp.zeros(D), 1.0).to_event(1))
        with numpyro_tpu.plate("N", N):
            numpyro_tpu.sample("y", dist.Bernoulli(logits=X @ w), obs=y)

    mc = MCMC(
        CheesHMC(model),
        num_warmup=300,
        num_samples=300,
        num_chains=32,
        progress_bar=False,
    )
    mc.run(random.PRNGKey(3), X, y)
    w_chees = np.asarray(mc.get_samples()["w"]).reshape(-1, D).mean(0)

    mn = MCMC(
        NUTS(model), num_warmup=300, num_samples=300, num_chains=2,
        progress_bar=False,
    )
    mn.run(random.PRNGKey(4), X, y)
    w_nuts = np.asarray(mn.get_samples()["w"]).reshape(-1, D).mean(0)
    assert np.allclose(w_chees, w_nuts, atol=0.15)


def test_chees_requires_chain_batch():
    def pot(z):
        return 0.5 * jnp.sum(z["x"] ** 2)

    with pytest.raises(ValueError, match="num_chains"):
        CheesHMC(potential_fn=pot).init(
            random.PRNGKey(0), 10, init_params={"x": jnp.zeros(2)}
        )


def test_chees_sharded_parallel_chains():
    """chain_method='parallel': the chain axis is GSPMD-sharded over the
    device mesh, so pooled accept/ChEES/Welford statistics lower to
    cross-device collectives."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple (virtual) devices")

    D = 4

    def pot(z):
        return 0.5 * jnp.sum((z["x"] - jnp.arange(D)) ** 2)

    C = 64
    m = MCMC(
        CheesHMC(potential_fn=pot),
        num_warmup=300,
        num_samples=300,
        num_chains=C,
        chain_method="parallel",
        progress_bar=False,
    )
    m.run(random.PRNGKey(0), init_params={"x": jnp.zeros((C, D))})
    xs = np.asarray(m.get_samples()["x"]).reshape(-1, D)
    assert np.allclose(xs.mean(0), np.arange(D), atol=0.1)
    assert np.allclose(xs.std(0), 1.0, atol=0.15)
