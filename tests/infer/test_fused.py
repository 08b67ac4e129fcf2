"""Fused (single-program, asynchronous-harvest) sampler path.

The driver routes vectorized HMC/NUTS multi-chain runs through
``HMC.fused_run`` (one compiled program for warmup + sampling).  These
tests pin the routing, shapes, thinning semantics, and statistical
agreement with the per-step path.
"""

import numpy as np
import pytest

import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.infer import MCMC, NUTS
from numpyro_tpu.infer.hmc import HMC


def _model(x, y=None):
    w = numpyro_tpu.sample("w", dist.Normal(0.0, 1.0))
    sigma = numpyro_tpu.sample("sigma", dist.HalfNormal(1.0))
    with numpyro_tpu.plate("N", x.shape[0]):
        numpyro_tpu.sample("y", dist.Normal(w * x, sigma), obs=y)


@pytest.fixture(scope="module")
def _data():
    x = jnp.linspace(-2, 2, 100)
    y = 1.5 * x + 0.3 * random.normal(random.PRNGKey(0), x.shape)
    return x, y


@pytest.mark.parametrize("kernel_cls", [NUTS, HMC])
def test_fused_model_run(kernel_cls, _data):
    x, y = _data
    m = MCMC(
        kernel_cls(_model), num_warmup=300, num_samples=400, num_chains=4,
        progress_bar=False,
    )
    m.run(random.PRNGKey(1), x, y)
    s = m.get_samples(group_by_chain=True)
    assert s["w"].shape == (4, 400)
    assert s["sigma"].shape == (4, 400)
    assert abs(float(s["w"].mean()) - 1.5) < 0.05
    assert abs(float(s["sigma"].mean()) - 0.3) < 0.05
    # constrained space: sigma positive
    assert float(s["sigma"].min()) > 0.0
    # extra fields flow through the fused collection
    assert m.last_state is not None


def test_fused_extra_fields_and_thinning(_data):
    x, y = _data
    m = MCMC(
        NUTS(_model), num_warmup=200, num_samples=300, num_chains=2,
        thinning=3, progress_bar=False,
    )
    m.run(
        random.PRNGKey(2), x, y,
        extra_fields=("energy", "num_steps", "accept_prob",
                      "adapt_state.step_size"),
    )
    s = m.get_samples(group_by_chain=True)
    assert s["w"].shape == (2, 100)
    ef = m.get_extra_fields(group_by_chain=True)
    assert ef["energy"].shape == (2, 100)
    assert ef["num_steps"].shape == (2, 100)
    assert np.all(np.asarray(ef["num_steps"]) >= 1)
    assert np.all(np.asarray(ef["adapt_state.step_size"]) > 0)
    assert np.all(np.isfinite(np.asarray(ef["energy"])))


def test_fused_matches_perstep_moments():
    def pot(z):
        return 0.5 * jnp.sum(((z - 2.0) / 1.5) ** 2)

    fused = MCMC(
        NUTS(potential_fn=pot), num_warmup=300, num_samples=1000,
        num_chains=4, progress_bar=False,
    )
    fused.run(random.PRNGKey(0), init_params=jnp.zeros((4, 3)))
    assert fused.get_samples().shape == (4000, 3)

    stepwise = MCMC(
        NUTS(potential_fn=pot), num_warmup=300, num_samples=1000,
        progress_bar=False,
    )
    stepwise.run(random.PRNGKey(1), init_params=jnp.zeros(3))

    f, s = np.asarray(fused.get_samples()), np.asarray(stepwise.get_samples())
    np.testing.assert_allclose(f.mean(), 2.0, atol=0.12)
    np.testing.assert_allclose(f.std(), 1.5, atol=0.12)
    np.testing.assert_allclose(f.mean(0), s.mean(0), atol=0.25)
    np.testing.assert_allclose(f.std(0), s.std(0), atol=0.25)


def test_fused_divergences_surface():
    # funnel-like geometry produces divergences that must be reported
    def model():
        v = numpyro_tpu.sample("v", dist.Normal(0.0, 3.0))
        numpyro_tpu.sample("x", dist.Normal(0.0, jnp.exp(v / 2.0)))

    m = MCMC(
        NUTS(model, max_tree_depth=6), num_warmup=200, num_samples=500,
        num_chains=2, progress_bar=False,
    )
    m.run(random.PRNGKey(0))
    ef = m.get_extra_fields()
    assert "diverging" in ef
    assert ef["diverging"].dtype == bool


@pytest.mark.slow
def test_fused_rng_reproducible(_data):
    x, y = _data
    outs = []
    for _ in range(2):
        m = MCMC(
            NUTS(_model), num_warmup=100, num_samples=100, num_chains=2,
            progress_bar=False,
        )
        m.run(random.PRNGKey(7), x, y)
        outs.append(np.asarray(m.get_samples()["w"]))
    np.testing.assert_array_equal(outs[0], outs[1])
