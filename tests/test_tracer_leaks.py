"""Tracer-leak regression (pattern: reference CI re-runs selected tests with
JAX_CHECK_TRACER_LEAKS=1).  A leak means some handler/guide retained a traced
value past its trace — a memory bug even when numerics stay correct."""

import jax
import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.infer import MCMC, NUTS, SVI, Trace_ELBO, TraceMeanField_ELBO
from numpyro_tpu.infer.autoguide import AutoDelta, AutoNormal
from numpyro_tpu.optim import Adam


def model(x):
    mu = numpyro_tpu.sample("mu", dist.Normal(0.0, 1.0))
    sigma = numpyro_tpu.sample("sigma", dist.HalfNormal(1.0))
    with numpyro_tpu.plate("N", x.shape[0]):
        numpyro_tpu.sample("x", dist.Normal(mu, sigma), obs=x)


def test_svi_run_no_tracer_leaks():
    x = jnp.ones(10)
    with jax.checking_leaks():
        for guide_cls, loss in (
            (AutoNormal, Trace_ELBO()),
            (AutoDelta, Trace_ELBO()),
            (AutoNormal, TraceMeanField_ELBO()),
        ):
            svi = SVI(model, guide_cls(model), Adam(1e-2), loss)
            svi.run(random.PRNGKey(0), 5, x, progress_bar=False)


def test_mcmc_run_no_tracer_leaks():
    x = jnp.ones(10)
    with jax.checking_leaks():
        m = MCMC(NUTS(model), num_warmup=10, num_samples=10, progress_bar=False)
        m.run(random.PRNGKey(0), x)
