"""Effectful scan/cond tests (pattern: reference test/contrib/test_control_flow.py)."""

import numpy as np
import pytest
import scipy.stats as st

import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu import handlers
from numpyro_tpu.contrib.control_flow import cond, scan
from numpyro_tpu.infer import MCMC, NUTS, SVI, Trace_ELBO
from numpyro_tpu.infer.autoguide import AutoNormal
from numpyro_tpu.infer.util import log_density
from numpyro_tpu.optim import Adam


def gaussian_hmm(y=None, T=10):
    def transition(x_prev, y_curr):
        x_curr = numpyro_tpu.sample("x", dist.Normal(x_prev, 1))
        y_curr = numpyro_tpu.sample("y", dist.Normal(x_curr, 1), obs=y_curr)
        return x_curr, (x_curr, y_curr)

    x0 = numpyro_tpu.sample("x_0", dist.Normal(0, 1))
    _, (x, y) = scan(transition, x0, y, length=T)
    return x, y


def test_scan_seed_and_trace():
    with handlers.seed(rng_seed=0):
        x, y = gaussian_hmm(np.arange(10.0))
    assert x.shape == (10,) and y.shape == (10,)
    assert np.all(np.asarray(y) == np.arange(10))

    with handlers.seed(rng_seed=0):
        x, y = gaussian_hmm()
    assert x.shape == (10,) and y.shape == (10,)

    tr = handlers.trace(handlers.seed(gaussian_hmm, 0)).get_trace(np.arange(10.0))
    assert tr["x"]["value"].shape == (10,)
    assert tr["y"]["is_observed"]
    # the stacked fn reports the promoted batch shape
    assert tr["x"]["fn"].batch_shape == (10,)


def test_scan_log_density_matches_manual():
    ld, _ = log_density(
        gaussian_hmm, (np.arange(10.0),), {}, {"x_0": 0.0, "x": np.zeros(10)}
    )
    expected = (
        st.norm(0, 1).logpdf(0)
        + st.norm(0, 1).logpdf(np.zeros(10)).sum()
        + st.norm(0, 1).logpdf(np.arange(10.0)).sum()
    )
    np.testing.assert_allclose(float(ld), expected, rtol=1e-5)


@pytest.mark.slow
def test_scan_nuts_smoothing():
    yobs = np.sin(np.linspace(0, 3, 15)) + 0.1 * np.asarray(
        random.normal(random.PRNGKey(3), (15,))
    )
    m = MCMC(NUTS(gaussian_hmm), num_warmup=300, num_samples=300, progress_bar=False)
    m.run(random.PRNGKey(0), yobs, 15)
    s = m.get_samples()
    assert s["x"].shape == (300, 15)
    assert float(np.abs(s["x"].mean(0) - yobs).mean()) < 0.5


def test_scan_svi_autoguide():
    yobs = np.cos(np.linspace(0, 2, 12))
    guide = AutoNormal(gaussian_hmm)
    svi = SVI(gaussian_hmm, guide, Adam(0.05), Trace_ELBO())
    res = svi.run(random.PRNGKey(0), 400, yobs, 12, progress_bar=False)
    assert np.isfinite(np.asarray(res.losses)).all()


@pytest.mark.slow
def test_scan_constrained_site():
    # non-real support inside scan exercises the per-step unconstrain slice
    def model(T=5):
        def transition(s_prev, _):
            s = numpyro_tpu.sample("s", dist.LogNormal(jnp.log(s_prev), 0.1))
            numpyro_tpu.sample("y", dist.Normal(0, s), obs=0.3)
            return s, s

        s0 = numpyro_tpu.sample("s0", dist.LogNormal(0.0, 1.0))
        scan(transition, s0, None, length=T)

    m = MCMC(NUTS(model), num_warmup=200, num_samples=200, progress_bar=False)
    m.run(random.PRNGKey(0))
    s = m.get_samples()
    assert s["s"].shape == (200, 5)
    assert float(s["s"].min()) > 0  # constrained space respected


def test_scan_reverse():
    def model(T=7):
        def transition(x_prev, _):
            x = numpyro_tpu.sample("x", dist.Normal(x_prev, 1.0))
            return x, x

        x0 = numpyro_tpu.sample("x0", dist.Normal(0.0, 1.0))
        _, xs = scan(transition, x0, None, length=T, reverse=True)
        return xs

    with handlers.seed(rng_seed=0):
        xs = model()
    assert xs.shape == (7,)


def test_cond_in_model():
    def cmodel():
        def tf(_):
            return numpyro_tpu.sample("x", dist.Normal(20.0, 1.0))

        def ff(_):
            return numpyro_tpu.sample("x", dist.Normal(0.0, 1.0))

        c = numpyro_tpu.sample("cluster", dist.Normal())
        return cond(c > 0, tf, ff, None)

    with handlers.seed(rng_seed=0):
        v = cmodel()
    assert np.isfinite(float(v))
    tr = handlers.trace(handlers.seed(cmodel, 1)).get_trace()
    assert "x" in tr and "cluster" in tr


def test_cond_substitute():
    def cmodel():
        def tf(_):
            return numpyro_tpu.sample("x", dist.Normal(10.0, 1.0))

        def ff(_):
            return numpyro_tpu.sample("x", dist.Normal(-10.0, 1.0))

        c = numpyro_tpu.sample("cluster", dist.Normal())
        return cond(c > 0, tf, ff, None)

    with handlers.seed(rng_seed=0):
        v = handlers.substitute(cmodel, data={"x": 3.21})()
    np.testing.assert_allclose(float(v), 3.21)


def test_scan_replay_unseeded():
    # SteinLoss replays an unseeded guide against a previous trace; the scan
    # replay path must not require rng keys (regression: the old path
    # pre-traced the body to discover sites, sampling with key=None).
    tr = handlers.trace(handlers.seed(gaussian_hmm, 0)).get_trace(np.arange(10.0))
    ld_replay, replay_tr = log_density(
        handlers.replay(gaussian_hmm, tr), (np.arange(10.0),), {}, {}
    )
    ld_direct, _ = log_density(
        gaussian_hmm,
        (np.arange(10.0),),
        {},
        {"x_0": tr["x_0"]["value"], "x": tr["x"]["value"]},
    )
    np.testing.assert_allclose(float(ld_replay), float(ld_direct), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(replay_tr["x"]["value"]), np.asarray(tr["x"]["value"])
    )
