"""SVI / ELBO / autoguide tests (reference pattern: test/infer/test_svi.py,
test/infer/test_autoguide.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import random

import numpyro_tpu as npt
import numpyro_tpu.distributions as dist
from numpyro_tpu import optim
from numpyro_tpu.infer import (
    SVI,
    RenyiELBO,
    Trace_ELBO,
    TraceMeanField_ELBO,
)
from numpyro_tpu.infer.autoguide import (
    AutoDelta,
    AutoDiagonalNormal,
    AutoGuideList,
    AutoLaplaceApproximation,
    AutoLowRankMultivariateNormal,
    AutoMultivariateNormal,
    AutoNormal,
)
from numpyro_tpu.infer.reparam import LocScaleReparam, TransformReparam


def beta_bernoulli_model(data):
    f = npt.sample("beta", dist.Beta(1.0, 1.0))
    with npt.plate("N", data.shape[0]):
        npt.sample("obs", dist.Bernoulli(f), obs=data)


def test_svi_beta_bernoulli_custom_guide():
    data = jnp.concatenate([jnp.ones(6), jnp.zeros(4)])

    def guide(data):
        alpha_q = npt.param("alpha_q", 1.0, constraint=dist.constraints.positive)
        beta_q = npt.param("beta_q", 1.0, constraint=dist.constraints.positive)
        npt.sample("beta", dist.Beta(alpha_q, beta_q))

    svi = SVI(beta_bernoulli_model, guide, optim.Adam(0.05), Trace_ELBO())
    res = svi.run(random.PRNGKey(0), 2000, data)
    # true posterior Beta(7, 5): mean 7/12
    post_mean = res.params["alpha_q"] / (res.params["alpha_q"] + res.params["beta_q"])
    np.testing.assert_allclose(post_mean, 7.0 / 12, atol=0.06)
    assert np.isfinite(np.asarray(res.losses)).all()


GUIDES = [
    AutoNormal,
    AutoDelta,
    AutoDiagonalNormal,
    AutoMultivariateNormal,
    AutoLowRankMultivariateNormal,
    AutoLaplaceApproximation,
]


@pytest.mark.parametrize("guide_cls", GUIDES)
def test_autoguides_normal_model(guide_cls):
    data = random.normal(random.PRNGKey(1), (100,)) * 1.5 + 3.0

    def model(data):
        mu = npt.sample("mu", dist.Normal(0.0, 10.0))
        sigma = npt.sample("sigma", dist.HalfNormal(5.0))
        with npt.plate("N", data.shape[0]):
            npt.sample("obs", dist.Normal(mu, sigma), obs=data)

    guide = guide_cls(model)
    svi = SVI(model, guide, optim.Adam(0.05), Trace_ELBO())
    res = svi.run(random.PRNGKey(0), 1500, data)
    median = guide.median(res.params)
    np.testing.assert_allclose(median["mu"], data.mean(), atol=0.3)
    np.testing.assert_allclose(median["sigma"], data.std(), rtol=0.25)
    # posterior sampling keeps supports
    post = guide.sample_posterior(
        random.PRNGKey(2), res.params, data, sample_shape=(100,)
    )
    assert post["mu"].shape == (100,)
    assert np.all(np.asarray(post["sigma"]) > 0)


def test_autoguide_list():
    data = random.normal(random.PRNGKey(1), (100,)) * 1.5 + 3.0

    def model(data):
        mu = npt.sample("mu", dist.Normal(0.0, 10.0))
        sigma = npt.sample("sigma", dist.HalfNormal(5.0))
        with npt.plate("N", data.shape[0]):
            npt.sample("obs", dist.Normal(mu, sigma), obs=data)

    from numpyro_tpu.handlers import block, seed

    guide = AutoGuideList(model)
    guide.append(
        AutoNormal(block(seed(model, random.PRNGKey(0)), expose=["mu"]))
    )
    guide.append(
        AutoDelta(block(seed(model, random.PRNGKey(1)), expose=["sigma"]))
    )
    svi = SVI(model, guide, optim.Adam(0.05), Trace_ELBO())
    res = svi.run(random.PRNGKey(0), 1500, data)
    median = guide.median(res.params)
    np.testing.assert_allclose(median["mu"], data.mean(), atol=0.3)


@pytest.mark.parametrize("elbo", [Trace_ELBO(num_particles=4), RenyiELBO(alpha=2.0)])
def test_multi_particle_elbos(elbo):
    data = jnp.concatenate([jnp.ones(6), jnp.zeros(4)])
    guide = AutoNormal(beta_bernoulli_model)
    svi = SVI(beta_bernoulli_model, guide, optim.Adam(0.05), elbo)
    res = svi.run(random.PRNGKey(0), 1000, data)
    median = guide.median(res.params)
    np.testing.assert_allclose(median["beta"], 7.0 / 12, atol=0.1)


def test_trace_meanfield_analytic_kl():
    data = random.normal(random.PRNGKey(1), (50,)) + 2.0

    def model(data):
        mu = npt.sample("mu", dist.Normal(0.0, 10.0))
        with npt.plate("N", data.shape[0]):
            npt.sample("obs", dist.Normal(mu, 1.0), obs=data)

    guide = AutoNormal(model)
    svi = SVI(model, guide, optim.Adam(0.05), TraceMeanField_ELBO())
    res = svi.run(random.PRNGKey(0), 1200, data)
    median = guide.median(res.params)
    # conjugate posterior mean: n*xbar/ (n + 1/100)
    n = 50
    expected = n * data.mean() / (n + 1 / 100)
    np.testing.assert_allclose(median["mu"], expected, atol=0.1)


def test_stable_update_recovers_from_nan():
    def model():
        npt.sample("x", dist.Normal(0.0, 1.0))

    def guide():
        loc = npt.param("loc", 0.0)
        scale = npt.param("scale", 0.1, constraint=dist.constraints.positive)
        npt.sample("x", dist.Normal(loc, scale))

    svi = SVI(model, guide, optim.Adam(10.0), Trace_ELBO())
    res = svi.run(random.PRNGKey(0), 100, stable_update=True)
    assert np.isfinite(np.asarray(res.params["loc"]))


def test_loc_scale_reparam():
    # classic Neal's funnel decentering
    from numpyro_tpu.handlers import reparam
    from numpyro_tpu.infer import MCMC, NUTS

    def model():
        x = npt.sample("x", dist.Normal(0.0, 3.0))
        with npt.plate("N", 5):
            npt.sample("y", dist.Normal(0.0, jnp.exp(x / 2)))

    reparam_model = reparam(model, config={"y": LocScaleReparam(0)})
    kernel = NUTS(reparam_model)
    mcmc = MCMC(kernel, num_warmup=500, num_samples=1000, progress_bar=False)
    mcmc.run(random.PRNGKey(0))
    samples = mcmc.get_samples()
    assert "y_decentered" in samples
    assert abs(samples["x"].mean()) < 0.7


def test_transform_reparam():
    from numpyro_tpu.handlers import reparam, seed, trace

    def model():
        npt.sample(
            "z",
            dist.TransformedDistribution(
                dist.Normal(0.0, 1.0),
                dist.transforms.AffineTransform(2.0, 3.0),
            ),
        )

    reparam_model = reparam(model, config={"z": TransformReparam()})
    tr = trace(seed(reparam_model, random.PRNGKey(0))).get_trace()
    assert "z_base" in tr
    assert tr["z"]["type"] == "deterministic"
    np.testing.assert_allclose(
        tr["z"]["value"], 2.0 + 3.0 * tr["z_base"]["value"], rtol=1e-6
    )


def test_mutable_state_threading():
    def model():
        c = npt.mutable("counter", jnp.zeros(()))
        npt.sample("x", dist.Normal(c, 1.0))

    def guide():
        c = npt.mutable("counter", jnp.zeros(()))
        npt.mutable("counter", c + 1)
        loc = npt.param("loc", 0.0)
        npt.sample("x", dist.Normal(loc, 1.0))

    svi = SVI(model, guide, optim.Adam(0.01), Trace_ELBO())
    state = svi.init(random.PRNGKey(0))
    state, _ = svi.update(state)
    assert state.mutable_state is not None
