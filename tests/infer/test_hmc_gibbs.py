"""HMCGibbs / DiscreteHMCGibbs / HMCECS correctness
(pattern: reference test/infer/test_hmc_gibbs.py + class doctests)."""

import numpy as np
import pytest

import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu as npt
import numpyro_tpu.distributions as dist
from numpyro_tpu.infer import MCMC, NUTS, DiscreteHMCGibbs, HMCECS, HMCGibbs


def test_hmc_gibbs_linear_gaussian():
    def model():
        x = numpyro_tpu.sample("x", dist.Normal(0.0, 2.0))
        y = numpyro_tpu.sample("y", dist.Normal(0.0, 2.0))
        numpyro_tpu.sample("obs", dist.Normal(x + y, 1.0), obs=jnp.array([1.0]))

    def gibbs_fn(rng_key, gibbs_sites, hmc_sites):
        y = hmc_sites["y"]
        new_x = dist.Normal(0.8 * (1 - y), jnp.sqrt(0.8)).sample(rng_key)
        return {"x": new_x}

    kernel = HMCGibbs(NUTS(model), gibbs_fn=gibbs_fn, gibbs_sites=["x"])
    # the posterior is strongly correlated (marginal std 1.49, conditional
    # std 0.89) so the Gibbs scan mixes slowly; 8k draws keep the MC error
    # of the mean safely under the 0.1 tolerance
    m = MCMC(kernel, num_warmup=500, num_samples=8000, progress_bar=False)
    m.run(random.PRNGKey(0))
    s = m.get_samples()
    # exact posterior mean of each of x, y is 4/9
    assert abs(float(s["x"].mean()) - 4 / 9) < 0.1
    assert abs(float(s["y"].mean()) - 4 / 9) < 0.1


@pytest.mark.parametrize("modified", [False, True])
def test_discrete_hmc_gibbs_mixture(modified):
    def model(probs, locs):
        c = numpyro_tpu.sample("c", dist.Categorical(probs))
        numpyro_tpu.sample("x", dist.Normal(locs[c], 0.5))

    probs = jnp.array([0.15, 0.3, 0.3, 0.25])
    # modes 2 conditional stds apart: the Gibbs scan switches components
    # often enough that 15k draws pin the mean (4-std-separated modes have
    # switch times in the thousands of steps and make the test pure noise)
    locs = jnp.array([-1.0, 0.0, 1.0, 2.0])
    true_mean = float(jnp.dot(probs, locs))
    true_var = float(jnp.dot(probs, (locs - true_mean) ** 2) + 0.25)
    kernel = DiscreteHMCGibbs(NUTS(model), modified=modified)
    m = MCMC(kernel, num_warmup=1000, num_samples=15000, progress_bar=False)
    m.run(random.PRNGKey(0), probs, locs)
    x = m.get_samples()["x"]
    assert abs(float(jnp.mean(x)) - true_mean) < 0.1
    assert abs(float(jnp.var(x)) - true_var) < 0.3


@pytest.mark.parametrize(
    "use_proxy", [False, pytest.param(True, marks=pytest.mark.slow)]
)
def test_hmcecs_subsampled_gaussian(use_proxy):
    def model(data):
        x = numpyro_tpu.sample("x", dist.Normal(0, 1))
        with numpyro_tpu.plate("N", data.shape[0], subsample_size=100):
            batch = numpyro_tpu.subsample(data, event_dim=0)
            numpyro_tpu.sample("obs", dist.Normal(x, 1), obs=batch)

    data = random.normal(random.PRNGKey(0), (10000,)) + 1
    proxy = HMCECS.taylor_proxy({"x": jnp.array(1.0)}) if use_proxy else None
    kernel = HMCECS(NUTS(model), num_blocks=10, proxy=proxy)
    m = MCMC(kernel, num_warmup=500, num_samples=500, progress_bar=False)
    m.run(random.PRNGKey(0), data)
    s = m.get_samples()["x"]
    assert abs(float(jnp.mean(s)) - 1.0) < 0.1


@pytest.mark.slow
def test_hmcecs_reinit_after_warmup():
    """Regression: a second init (warmup() after run()) used to hand the
    Taylor proxy the estimator-wrapped model from the first init, so the
    degree-2 per-eval directional derivative recursed into the estimator."""
    N, D = 400, 3
    X = random.normal(random.PRNGKey(0), (N, D))
    tw = jnp.array([0.5, -0.3, 0.8])
    y = dist.Bernoulli(logits=X @ tw).sample(random.PRNGKey(1)).astype(
        jnp.float32
    )

    def model(X, y):
        w = npt.sample("w", dist.Normal(jnp.zeros(D), 1.0).to_event(1))
        with npt.plate("N", X.shape[0], subsample_size=100):
            xb = npt.subsample(X, event_dim=1)
            yb = npt.subsample(y, event_dim=0)
            npt.sample("obs", dist.Bernoulli(logits=xb @ w), obs=yb)

    proxy = HMCECS.taylor_proxy({"w": tw})
    m = MCMC(
        HMCECS(NUTS(model, max_tree_depth=5), num_blocks=5, proxy=proxy),
        num_warmup=25, num_samples=25, num_chains=2,
        chain_method="vectorized", progress_bar=False,
    )
    m.run(random.PRNGKey(2), X, y)
    # re-initialize: warmup again, then continue from the warmed state
    m.warmup(random.PRNGKey(3), X, y)
    m.run(m.post_warmup_state.rng_key, X, y)
    s = np.asarray(m.get_samples()["w"])
    assert np.isfinite(s).all()
