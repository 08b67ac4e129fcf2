"""flax/haiku module bridge tests (reference: test/contrib/test_module.py)."""

import pytest
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


@pytest.mark.slow
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


def test_nnx_module_svi():
    from flax import nnx

    class Linear(nnx.Module):
        def __init__(self, din, dout, *, rngs):
            self.w = nnx.Param(random.uniform(rngs.params(), (din, dout)))
            self.b = nnx.Param(jnp.zeros((dout,)))

        def __call__(self, x):
            return x @ self.w + self.b

    from numpyro_tpu.contrib.module import nnx_module

    X, y = _data()
    linear = Linear(3, 1, rngs=nnx.Rngs(params=random.PRNGKey(0)))

    def model(X, y=None):
        net = nnx_module("net", linear)
        numpyro_tpu.sample("y", dist.Normal(net(X), 0.2).to_event(2), obs=y)

    svi = SVI(model, lambda X, y=None: None, Adam(0.05), Trace_ELBO())
    res = svi.run(random.PRNGKey(1), 500, X, y, progress_bar=False)
    assert np.isfinite(np.asarray(res.losses)).all()
    assert "net$params" in res.params
    # learned the generating weight [2, 0, 0]
    w = np.asarray(jax.tree.leaves(res.params["net$params"])[1]).ravel()
    assert abs(w[0] - 2.0) < 0.3


@pytest.mark.slow
def test_random_nnx_module_bnn():
    from flax import nnx

    class Linear(nnx.Module):
        def __init__(self, din, dout, *, rngs):
            self.w = nnx.Param(random.uniform(rngs.params(), (din, dout)))
            self.b = nnx.Param(jnp.zeros((dout,)))

        def __call__(self, x):
            return x @ self.w + self.b

    from numpyro_tpu.contrib.module import random_nnx_module

    X, y = _data()
    linear = Linear(3, 1, rngs=nnx.Rngs(params=random.PRNGKey(0)))

    def model(X, y=None):
        net = random_nnx_module("net", linear, prior=dist.Normal(0, 3.0))
        numpyro_tpu.sample("y", dist.Normal(net(X), 0.2).to_event(2), obs=y)

    m = MCMC(NUTS(model), num_warmup=300, num_samples=300, progress_bar=False)
    m.run(random.PRNGKey(2), X, y)
    s = m.get_samples()
    w_site = [k for k in s if k.endswith("w")][0]
    w = np.asarray(s[w_site]).reshape(len(s[w_site]), -1)
    assert abs(w[:, 0].mean() - 2.0) < 0.3
