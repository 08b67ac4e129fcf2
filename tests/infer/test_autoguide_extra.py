"""Flow/DAIS/batched autoguides (reference: test/infer/test_autoguide.py)."""

import numpy as np

import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu import handlers
from numpyro_tpu.infer import SVI, Trace_ELBO
from numpyro_tpu.infer.autoguide import (
    AutoBatchedLowRankMultivariateNormal,
    AutoNormal,
    AutoBatchedMultivariateNormal,
    AutoBNAFNormal,
    AutoDAIS,
    AutoIAFNormal,
)
from numpyro_tpu.optim import Adam
import pytest


def sum_model(y):
    x = numpyro_tpu.sample("x", dist.Normal(jnp.zeros(2), 1.0).to_event(1))
    numpyro_tpu.sample("y", dist.Normal(x.sum(), 0.5), obs=y)


POST_MEAN = 2 * 2 / 2.25  # posterior mean of x0+x1 given y=2


@pytest.mark.parametrize(
    "guide_factory",
    [
        lambda: AutoIAFNormal(sum_model, num_flows=2),
        lambda: AutoBNAFNormal(sum_model),
        lambda: AutoDAIS(sum_model, K=4),
    ],
)
def test_flow_dais_guides_converge(guide_factory):
    guide = guide_factory()
    svi = SVI(sum_model, guide, Adam(0.01), Trace_ELBO(num_particles=4))
    res = svi.run(random.PRNGKey(0), 800, 2.0, progress_bar=False)
    assert np.isfinite(np.asarray(res.losses[-50:])).all()
    s = guide.sample_posterior(random.PRNGKey(1), res.params, sample_shape=(500,))
    m = float(s["x"].sum(-1).mean())
    assert abs(m - POST_MEAN) < 0.3


def batched_model(y):
    with numpyro_tpu.plate("B", 3):
        x = numpyro_tpu.sample("x", dist.Normal(jnp.zeros(2), 1.0).to_event(1))
        numpyro_tpu.sample("y", dist.Normal(x.sum(-1), 0.5), obs=y)


@pytest.mark.parametrize(
    "guide_cls",
    [AutoBatchedMultivariateNormal, AutoBatchedLowRankMultivariateNormal],
)
def test_batched_guides(guide_cls):
    y = jnp.array([1.0, 2.0, -1.0])
    guide = guide_cls(batched_model, batch_ndim=1)
    svi = SVI(batched_model, guide, Adam(0.05), Trace_ELBO())
    res = svi.run(random.PRNGKey(0), 800, y, progress_bar=False)
    est = np.asarray(guide.median(res.params)["x"].sum(-1))
    np.testing.assert_allclose(est, 2 * np.asarray(y) / 2.25, atol=0.3)


def test_iaf_transform_exact():
    from numpyro_tpu.distributions.flows import InverseAutoregressiveTransform
    from numpyro_tpu.nn import AutoregressiveNN
    import jax

    D = 3
    arn_init, arn_apply = AutoregressiveNN(D, [8, 8], permutation=jnp.arange(D))
    _, params = arn_init(random.PRNGKey(0), (D,))
    t = InverseAutoregressiveTransform(lambda x: arn_apply(params, x))
    x = random.normal(random.PRNGKey(1), (5, D))
    y = t(x)
    np.testing.assert_allclose(t._inverse(y), x, atol=1e-5)
    J = jax.vmap(jax.jacfwd(t))(x)
    _, logdet = np.linalg.slogdet(np.asarray(J))
    np.testing.assert_allclose(t.log_abs_det_jacobian(x, y), logdet, atol=1e-5)


def test_bnaf_logdet_exact():
    from numpyro_tpu.distributions.flows import BlockNeuralAutoregressiveTransform
    from numpyro_tpu.nn import BlockNeuralAutoregressiveNN
    import jax

    D = 3
    init, apply_fn = BlockNeuralAutoregressiveNN(D, [4, 4])
    _, params = init(random.PRNGKey(0), (D,))
    t = BlockNeuralAutoregressiveTransform(lambda x: apply_fn(params, x))
    x = random.normal(random.PRNGKey(1), (5, D))
    y = t(x)
    J = jax.vmap(jax.jacfwd(t))(x)
    _, logdet = np.linalg.slogdet(np.asarray(J))
    np.testing.assert_allclose(t.log_abs_det_jacobian(x, y), logdet, atol=1e-4)


@pytest.mark.slow
def test_auto_semi_dais():
    """AutoSemiDAIS: parametric global guide + local DAIS under a subsample
    plate (reference: autoguide.py:1235)."""
    from numpyro_tpu.infer.autoguide import AutoSemiDAIS

    N = 16
    data = 1.5 + 0.5 * random.normal(random.PRNGKey(0), (N,))

    def global_model():
        return numpyro_tpu.sample("theta", dist.Normal(0, 3))

    def local_model(theta):
        with numpyro_tpu.plate("data", N, subsample_size=8):
            tau = numpyro_tpu.sample("tau", dist.Gamma(5.0, 5.0))
            batch = numpyro_tpu.subsample(data, event_dim=0)
            numpyro_tpu.sample(
                "obs", dist.Normal(theta, 1 / jnp.sqrt(tau)), obs=batch
            )

    def model():
        return local_model(global_model())

    guide = AutoSemiDAIS(model, local_model, AutoNormal(global_model), K=3)
    svi = SVI(model, guide, Adam(5e-3), Trace_ELBO())
    res = svi.run(random.PRNGKey(1), 700, progress_bar=False)
    losses = np.asarray(res.losses)
    assert np.isfinite(losses[-50:]).all()
    assert losses[-50:].mean() < losses[:3].mean()

    with handlers.substitute(data={"data": jnp.arange(8)}):
        s = guide.sample_posterior(random.PRNGKey(2), res.params)
    assert s["tau"].shape == (8,)
    assert np.isfinite(float(s["theta"]))
