"""pyro-api conformance: drive the compat namespaces the way pyroapi's
generic test-suite does (pattern: reference test/pyroapi/test_pyroapi.py +
pyroapi/tests.py).  The genuine pyroapi registration check is gated on the
package being installed."""

import numpy as np
import pytest

from jax import random
import jax.numpy as jnp

from numpyro_tpu.compat import distributions as dist
from numpyro_tpu.compat import handlers, infer, ops, optim, pyro
from numpyro_tpu.compat.util import UnsupportedAPIWarning

pytestmark = pytest.mark.filterwarnings(
    "ignore::numpyro_tpu.compat.util.UnsupportedAPIWarning"
)


def test_ops_torch_conventions():
    assert ops.ones(2, 3).shape == (2, 3)
    assert ops.ones((2, 3)).shape == (2, 3)
    assert ops.zeros(4).shape == (4,)
    np.testing.assert_allclose(ops.tensor([1.0, 2.0]), jnp.array([1.0, 2.0]))
    with pytest.raises(ValueError):
        ops.ones()
    with pytest.raises(ValueError):
        ops.zeros(2.5)


def test_sample_and_trace():
    def model():
        return pyro.sample("x", dist.Normal(0.0, 1.0))

    with handlers.seed(rng_seed=0):
        x = model()
    assert jnp.shape(x) == ()

    tr = handlers.trace(handlers.seed(model, 0)).get_trace()
    assert tr["x"]["type"] == "sample"


def test_plate_ok():
    def model():
        with pyro.plate("N", 10):
            return pyro.sample("x", dist.Normal(0.0, 1.0))

    with handlers.seed(rng_seed=0):
        x = model()
    assert x.shape == (10,)


def test_param_store_warns():
    with pytest.warns(UnsupportedAPIWarning):
        store = pyro.get_param_store()
    assert isinstance(store, dict)
    pyro.clear_param_store()


@pytest.mark.parametrize(
    "elbo_cls", [infer.Trace_ELBO, infer.JitTrace_ELBO]
)
def test_svi_pyro_style(elbo_cls):
    data = 1.0 + 0.1 * np.random.RandomState(0).randn(50)

    def model(data):
        mu = pyro.sample("mu", dist.Normal(0.0, 10.0))
        with pyro.plate("N", len(data)):
            pyro.sample("obs", dist.Normal(mu, 0.1), obs=ops.tensor(data))

    def guide(data):
        loc = pyro.param("loc", ops.tensor(0.0))
        pyro.sample("mu", dist.Normal(loc, 0.05))

    svi = infer.SVI(model, guide, optim.Adam({"lr": 0.05}), elbo_cls())
    losses = [
        svi.step(data, rng_key=random.PRNGKey(0) if i == 0 else None)
        for i in range(200)
    ]
    assert float(losses[-1]) < float(losses[0])
    assert abs(float(svi.get_params()["loc"]) - 1.0) < 0.1


@pytest.mark.slow
def test_mcmc_pyro_style():
    def model(data):
        mu = pyro.sample("mu", dist.Normal(0.0, 10.0))
        with pyro.plate("N", len(data)):
            pyro.sample("obs", dist.Normal(mu, 1.0), obs=data)

    data = 2.0 + np.random.RandomState(1).randn(100)
    kernel = infer.NUTS(model)
    mcmc = infer.MCMC(kernel, num_samples=300, warmup_steps=300)
    mcmc.run(random.PRNGKey(0), jnp.asarray(data))
    mu = np.asarray(mcmc.get_samples()["mu"])
    assert abs(mu.mean() - data.mean()) < 0.3
    mcmc.summary()


def test_hmc_full_mass_alias():
    k = infer.HMC(model=lambda: pyro.sample("x", dist.Normal(0, 1)), full_mass=True)
    assert k._dense_mass is True


def test_pyroapi_registration():
    pyroapi = pytest.importorskip("pyroapi")
    from pyroapi import pyro_backend

    with pyro_backend("numpyro_tpu"):
        import pyroapi as api

        with handlers.seed(rng_seed=0):
            x = api.pyro.sample("x", api.distributions.Normal(0.0, 1.0))
        assert jnp.shape(x) == ()
