"""Kernel correctness tests = posterior-moment assertions on analytic
targets (the reference pattern: test/infer/test_mcmc.py:28-130)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import random

import numpyro_tpu as npt
import numpyro_tpu.distributions as dist
from numpyro_tpu.infer import MCMC, NUTS
from numpyro_tpu.infer.hmc import HMC


@pytest.mark.parametrize("kernel_cls", [HMC, NUTS])
@pytest.mark.parametrize("dense_mass", [False, True])
def test_unnormalized_normal(kernel_cls, dense_mass):
    true_mean, true_std = 1.0, 0.5
    num_warmup, num_samples = 500, 4000

    def potential_fn(z):
        return 0.5 * jnp.sum(((z - true_mean) / true_std) ** 2)

    kernel = kernel_cls(potential_fn=potential_fn, dense_mass=dense_mass)
    mcmc = MCMC(
        kernel, num_warmup=num_warmup, num_samples=num_samples, progress_bar=False
    )
    mcmc.run(random.PRNGKey(0), init_params=jnp.array(0.0))
    hmc_states = mcmc.get_samples()
    assert abs(jnp.mean(hmc_states) - true_mean) < 0.08
    assert abs(jnp.std(hmc_states) - true_std) < 0.08


def test_correlated_mvn_dense_mass():
    # dense mass adaptation must recover a correlated Gaussian
    D = 5
    rng = np.random.RandomState(0)
    A = rng.randn(D, D)
    cov = A @ A.T + 0.1 * np.eye(D)
    prec = np.linalg.inv(cov)
    prec_j = jnp.asarray(prec)

    def potential_fn(z):
        return 0.5 * z @ prec_j @ z

    kernel = NUTS(potential_fn=potential_fn, dense_mass=True)
    mcmc = MCMC(kernel, num_warmup=500, num_samples=3000, progress_bar=False)
    mcmc.run(random.PRNGKey(0), init_params=jnp.zeros(D))
    samples = mcmc.get_samples()
    np.testing.assert_allclose(
        np.asarray(samples).mean(0), np.zeros(D), atol=0.3
    )
    np.testing.assert_allclose(
        np.asarray(samples).std(0), np.sqrt(np.diag(cov)), rtol=0.15
    )


def test_logistic_regression():
    N, dim = 1500, 3
    true_coefs = jnp.arange(1.0, dim + 1.0)
    data = random.normal(random.PRNGKey(1), (N, dim))
    labels = dist.Bernoulli(logits=data @ true_coefs).sample(random.PRNGKey(2))

    def model(data, labels):
        coefs = npt.sample("coefs", dist.Normal(jnp.zeros(dim), jnp.ones(dim)))
        logits = npt.deterministic("logits", jnp.sum(coefs * data, axis=-1))
        return npt.sample("obs", dist.Bernoulli(logits=logits), obs=labels)

    kernel = NUTS(model)
    mcmc = MCMC(kernel, num_warmup=600, num_samples=1200, progress_bar=False)
    mcmc.run(random.PRNGKey(0), data, labels)
    samples = mcmc.get_samples()
    assert samples["logits"].shape == (1200, N)
    # prior N(0,1) shrinks the largest coefficient; match the reference's
    # tolerance regime (test/infer/test_mcmc.py:104-130 uses atol≈0.21 at 10k
    # draws; we run 1.2k draws)
    np.testing.assert_allclose(
        samples["coefs"].mean(0), true_coefs, atol=0.3
    )


@pytest.mark.slow
def test_eight_schools():
    # the canonical hierarchical model; non-centered via TransformedDistribution
    J = 8
    y = jnp.array([28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0])
    sigma = jnp.array([15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0])

    def model(y, sigma):
        mu = npt.sample("mu", dist.Normal(0.0, 5.0))
        tau = npt.sample("tau", dist.HalfCauchy(5.0))
        with npt.plate("J", J):
            theta = npt.sample("theta", dist.Normal(mu, tau))
            npt.sample("obs", dist.Normal(theta, sigma), obs=y)

    kernel = NUTS(model, target_accept_prob=0.9)
    mcmc = MCMC(
        kernel,
        num_warmup=1000,
        num_samples=2000,
        num_chains=4,
        chain_method="vectorized",
        progress_bar=False,
    )
    mcmc.run(random.PRNGKey(0), y, sigma)
    samples = mcmc.get_samples()
    assert samples["mu"].shape == (8000,)
    assert samples["theta"].shape == (8000, J)
    # posterior means from long reference runs: mu ~ 4.4, tau ~ 3.6
    assert abs(samples["mu"].mean() - 4.4) < 1.0
    assert 2.0 < samples["tau"].mean() < 6.5


@pytest.mark.parametrize(
    "chain_method",
    [
        "vectorized",
        pytest.param("sequential", marks=pytest.mark.slow),
        pytest.param("parallel", marks=pytest.mark.slow),
    ],
)
def test_chain_methods(chain_method):
    true_mean, true_std = 2.0, 1.0

    def model():
        npt.sample("x", dist.Normal(true_mean, true_std))

    kernel = NUTS(model)
    mcmc = MCMC(
        kernel,
        num_warmup=300,
        num_samples=800,
        num_chains=4,
        chain_method=chain_method,
        progress_bar=False,
    )
    mcmc.run(random.PRNGKey(0))
    samples = mcmc.get_samples(group_by_chain=True)
    assert samples["x"].shape == (4, 800)
    assert abs(samples["x"].mean() - true_mean) < 0.1
    assert abs(samples["x"].std() - true_std) < 0.1


def test_improper_prior():
    true_mean, true_std = 1.0, 2.0
    data = dist.Normal(true_mean, true_std).sample(random.PRNGKey(1), (1000,))

    def model(data):
        mean = npt.sample(
            "mean", dist.ImproperUniform(dist.constraints.real, (), ())
        )
        std = npt.sample(
            "std", dist.ImproperUniform(dist.constraints.positive, (), ())
        )
        return npt.sample("obs", dist.Normal(mean, std), obs=data)

    kernel = NUTS(model)
    mcmc = MCMC(kernel, num_warmup=500, num_samples=1000, progress_bar=False)
    mcmc.run(random.PRNGKey(0), data)
    samples = mcmc.get_samples()
    np.testing.assert_allclose(samples["mean"].mean(), true_mean, atol=0.15)
    np.testing.assert_allclose(samples["std"].mean(), true_std, rtol=0.1)


def test_thinning_and_extra_fields():
    def model():
        npt.sample("x", dist.Normal(0.0, 1.0))

    kernel = NUTS(model)
    mcmc = MCMC(
        kernel, num_warmup=200, num_samples=1000, thinning=4, progress_bar=False
    )
    mcmc.run(
        random.PRNGKey(0),
        extra_fields=("num_steps", "adapt_state.step_size", "accept_prob"),
    )
    samples = mcmc.get_samples()
    assert samples["x"].shape == (250,)
    extra = mcmc.get_extra_fields()
    assert extra["num_steps"].shape == (250,)
    assert extra["adapt_state.step_size"].shape == (250,)
    assert np.all(np.asarray(extra["accept_prob"]) >= 0)


def test_reuse_post_warmup_state():
    def model():
        npt.sample("x", dist.Normal(0.0, 1.0))

    kernel = NUTS(model)
    mcmc = MCMC(kernel, num_warmup=300, num_samples=300, progress_bar=False)
    mcmc.warmup(random.PRNGKey(0))
    assert mcmc.post_warmup_state is not None
    mcmc.run(random.PRNGKey(1))
    s1 = mcmc.get_samples()["x"]
    assert s1.shape == (300,)


def test_constrained_sites_postprocessed():
    def model():
        npt.sample("p", dist.Beta(2.0, 2.0))
        npt.sample("s", dist.HalfNormal(1.0))

    kernel = NUTS(model)
    mcmc = MCMC(kernel, num_warmup=300, num_samples=500, progress_bar=False)
    mcmc.run(random.PRNGKey(0))
    s = mcmc.get_samples()
    assert np.all((np.asarray(s["p"]) > 0) & (np.asarray(s["p"]) < 1))
    assert np.all(np.asarray(s["s"]) > 0)


def test_chain_padding_uses_all_devices():
    """num_chains not divisible by the device count pads the chain axis to
    the next multiple (using every device) instead of falling back to fewer
    devices; the padded chains are dropped at collection."""
    n_dev = jax.local_device_count()
    if n_dev < 2:
        pytest.skip("needs >=2 devices to exercise chain padding")
    # a chain count coprime with the device count: the old fallback would
    # then use ONE device (gcd(num_chains, n_dev) == 1 for any n_dev >= 2)
    num_chains = n_dev - 1 if n_dev > 2 else 3

    def model():
        npt.sample("x", dist.Normal(0.0, 1.0))

    mcmc = MCMC(
        NUTS(model),
        num_warmup=20,
        num_samples=25,
        num_chains=num_chains,
        chain_method="parallel",
        progress_bar=False,
    )
    # the sharded key batch must span all devices
    padded_c = num_chains + (-num_chains) % n_dev
    keys = random.split(random.PRNGKey(0), num_chains)
    with pytest.warns(UserWarning, match="padding the chain axis"):
        sharded = mcmc._shard_over_chains(keys)
    assert sharded.shape[0] == padded_c
    assert len(sharded.sharding.device_set) == n_dev
    # padded chains carry DISTINCT keys (fold_in of the duplicated ones) so
    # pooled cross-chain statistics are never double-weighted
    assert not np.any(
        np.all(
            np.asarray(sharded[num_chains:])[:, None]
            == np.asarray(sharded[:num_chains])[None, :],
            axis=-1,
        )
    )

    with pytest.warns(UserWarning, match="padding the chain axis"):
        mcmc.run(random.PRNGKey(0))
    samples = mcmc.get_samples(group_by_chain=True)
    assert samples["x"].shape == (num_chains, 25)
    # last_state is stripped back to the requested chain count too
    assert mcmc.last_state.z["x"].shape == (num_chains,)
    assert abs(np.asarray(samples["x"]).mean()) < 0.5
