"""flax/haiku module bridge tests (reference: test/contrib/test_module.py)."""

import numpy as np

import jax
import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.contrib.module import (
    flax_module,
    haiku_module,
    random_flax_module,
)
from numpyro_tpu.infer import MCMC, NUTS, SVI, Trace_ELBO
from numpyro_tpu.optim import Adam


def _data():
    X = random.normal(random.PRNGKey(0), (50, 3))
    y = (X[:, 0] * 2).reshape(-1, 1)
    return X, y


def test_flax_module_svi():
    import flax.linen as nn

    class MLP(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(1)(nn.relu(nn.Dense(8)(x)))

    X, y = _data()

    def model(X, y=None):
        net = flax_module("net", MLP(), input_shape=(1, 3))
        numpyro_tpu.sample("y", dist.Normal(net(X), 0.2).to_event(2), obs=y)

    svi = SVI(model, lambda X, y=None: None, Adam(0.01), Trace_ELBO())
    res = svi.run(random.PRNGKey(1), 300, X, y, progress_bar=False)
    assert np.isfinite(np.asarray(res.losses)).all()
    assert "net$params" in res.params


def test_haiku_module_svi():
    import haiku as hk

    X, y = _data()
    hk_mod = hk.transform(
        lambda x: hk.Sequential([hk.Linear(8), jax.nn.relu, hk.Linear(1)])(x)
    )

    def model(X, y=None):
        net = haiku_module("hnet", hk_mod, input_shape=(1, 3))
        numpyro_tpu.sample("y", dist.Normal(net(X), 0.2).to_event(2), obs=y)

    svi = SVI(model, lambda X, y=None: None, Adam(0.01), Trace_ELBO())
    res = svi.run(random.PRNGKey(2), 200, X, y, progress_bar=False)
    assert np.isfinite(np.asarray(res.losses)).all()


def test_random_flax_module_bnn():
    import flax.linen as nn

    class MLP(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(1)(nn.relu(nn.Dense(4)(x)))

    X, y = _data()

    def model(X, y=None):
        net = random_flax_module("bnn", MLP(), dist.Normal(0, 1), input_shape=(1, 3))
        numpyro_tpu.sample("y", dist.Normal(net(X), 0.2).to_event(2), obs=y)

    m = MCMC(NUTS(model, max_tree_depth=6), num_warmup=150, num_samples=100, progress_bar=False)
    m.run(random.PRNGKey(3), X, y)
    s = m.get_samples()
    assert any(k.startswith("bnn/") for k in s)
