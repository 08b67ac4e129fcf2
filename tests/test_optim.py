"""Optimizer surface: every factory drives SVI to the analytic optimum on a
conjugate target; Minimize (BFGS) and the optax adapter round out the API."""

import numpy as np
import pytest

import jax.numpy as jnp
import optax
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu import optim
from numpyro_tpu.infer import SVI, Trace_ELBO
from numpyro_tpu.infer.autoguide import AutoDelta, AutoNormal

Y = jnp.asarray(np.random.RandomState(0).normal(2.0, 1.0, 40))
POST_MEAN = float((Y.sum() * 25) / (1 + 40 * 25))  # N(0,5) prior, sigma=1


def model(y):
    mu = numpyro_tpu.sample("mu", dist.Normal(0.0, 5.0))
    with numpyro_tpu.plate("N", y.shape[0]):
        numpyro_tpu.sample("y", dist.Normal(mu, 1.0), obs=y)


@pytest.mark.parametrize(
    "factory",
    [
        lambda: optim.Adam(5e-2),
        lambda: optim.ClippedAdam(5e-2, clip_norm=5.0),
        lambda: optim.Adagrad(0.5),
        lambda: optim.Momentum(5e-3, mass=0.9),
        lambda: optim.RMSProp(1e-2),
        lambda: optim.RMSPropMomentum(5e-3),
        lambda: optim.SGD(1e-2),
        lambda: optim.SM3(0.3),
        lambda: optim.optax_to_numpyro(optax.adamw(5e-2)),
    ],
    ids=[
        "Adam", "ClippedAdam", "Adagrad", "Momentum", "RMSProp",
        "RMSPropMomentum", "SGD", "SM3", "optax_adapter",
    ],
)
def test_optimizer_reaches_posterior_mode(factory):
    guide = AutoDelta(model)
    svi = SVI(model, guide, factory(), Trace_ELBO())
    res = svi.run(random.PRNGKey(0), 1500, Y, progress_bar=False)
    assert abs(float(guide.median(res.params)["mu"]) - POST_MEAN) < 0.1
    assert np.isfinite(np.asarray(res.losses)).all()


def test_minimize_bfgs():
    guide = AutoNormal(model)
    svi = SVI(model, guide, optim.Minimize(), Trace_ELBO(num_particles=32))
    res = svi.run(random.PRNGKey(0), 1, Y, progress_bar=False)
    assert abs(float(guide.median(res.params)["mu"]) - POST_MEAN) < 0.15


def test_minimize_rejects_plain_update():
    m = optim.Minimize()
    state = m.init({"x": jnp.zeros(2)})
    with pytest.raises(ValueError):
        m.update({"x": jnp.zeros(2)}, state)
