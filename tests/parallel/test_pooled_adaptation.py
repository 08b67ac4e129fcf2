"""Opt-in cross-chain pooled warmup adaptation (SURVEY §2.8 multi-host item):
one shared step size from the fleet-mean accept statistic + one mass matrix
from the pooled Welford moments, reductions expressed as chain-axis means so
GSPMD lowers them to collectives on a sharded mesh."""

import numpy as np
import pytest

import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.infer import MCMC, NUTS


def model(y):
    loc = numpyro_tpu.sample("loc", dist.Normal(0.0, 5.0))
    scale = numpyro_tpu.sample("scale", dist.HalfNormal(5.0))
    with numpyro_tpu.plate("N", y.shape[0]):
        numpyro_tpu.sample("y", dist.Normal(loc, scale), obs=y)


@pytest.fixture(scope="module")
def data():
    return 2.0 + 0.7 * random.normal(random.PRNGKey(0), (200,))


@pytest.mark.parametrize(
    "dense_mass", [False, pytest.param(True, marks=pytest.mark.slow)]
)
def test_pooled_adaptation_shares_step_size(data, dense_mass):
    m = MCMC(
        NUTS(model, pooled_adaptation=True, dense_mass=dense_mass),
        num_warmup=300,
        num_samples=200,
        num_chains=8,
        progress_bar=False,
    )
    m.run(random.PRNGKey(1), data, extra_fields=("adapt_state.step_size",))
    ss = np.asarray(
        m.get_extra_fields(group_by_chain=True)["adapt_state.step_size"]
    )  # (C, N)
    # one pooled step size: identical across every chain at every step
    np.testing.assert_allclose(ss, np.broadcast_to(ss[:1], ss.shape))
    s = m.get_samples()
    assert abs(float(s["loc"].mean()) - 2.0) < 0.1
    assert abs(float(s["scale"].mean()) - 0.7) < 0.15


@pytest.mark.slow
def test_unpooled_adaptation_differs_across_chains(data):
    m = MCMC(
        NUTS(model, pooled_adaptation=False),
        num_warmup=300,
        num_samples=50,
        num_chains=8,
        progress_bar=False,
    )
    m.run(random.PRNGKey(1), data, extra_fields=("adapt_state.step_size",))
    ss = np.asarray(
        m.get_extra_fields(group_by_chain=True)["adapt_state.step_size"]
    )  # (C, N)
    assert np.ptp(ss[:, -1]) > 0.0  # per-chain adaptation really is per-chain


@pytest.mark.slow
def test_pooled_adaptation_sharded_chains(data):
    """Pooling reductions must compile and agree under a GSPMD-sharded
    chain axis — this is the actual multi-host adaptation path."""
    draws = {}
    for method in ("vectorized", "parallel"):
        m = MCMC(
            NUTS(model, pooled_adaptation=True),
            num_warmup=200,
            num_samples=150,
            num_chains=8,
            chain_method=method,
            progress_bar=False,
        )
        m.run(random.PRNGKey(2), data)
        draws[method] = np.asarray(m.get_samples()["loc"])
    # chaotic trajectories diverge across partitionings; require the
    # posterior itself to agree
    assert abs(draws["vectorized"].mean() - draws["parallel"].mean()) < 0.03
    assert abs(draws["vectorized"].std() - draws["parallel"].std()) < 0.03


def test_pooled_short_warmup_matches_unpooled_long(data):
    """The pooled-adaptation payoff: 8 chains pooling their Welford moments
    and accept statistics reach (in 100 warmup steps) an adapted step size
    and mass matrix equivalent to what per-chain adaptation needs 300 steps
    for — the configuration the bench's warmup A/B measures."""

    def run(pooled, warmup):
        m = MCMC(
            NUTS(model, pooled_adaptation=pooled),
            num_warmup=warmup,
            num_samples=50,
            num_chains=8,
            progress_bar=False,
        )
        m.run(random.PRNGKey(3), data)
        st = m.last_state.adapt_state
        return (
            np.asarray(st.step_size),
            np.concatenate(
                [np.ravel(b) for b in np.asarray(st.inverse_mass_matrix)]
            )
            if not hasattr(st.inverse_mass_matrix, "shape")
            else np.asarray(st.inverse_mass_matrix),
        )

    ss_pool, imm_pool = run(True, 100)
    ss_per, imm_per = run(False, 300)
    # pooled step size (shared across chains) lands inside the per-chain
    # population's spread at the longer schedule
    ratio = float(np.ravel(ss_pool)[0] / np.median(ss_per))
    assert 0.35 < ratio < 2.8, (ss_pool, ss_per)
    # pooled mass matrix (shared) matches the per-chain median estimate of
    # the same posterior variances
    imm_pool_one = imm_pool.reshape(imm_pool.shape[0], -1)[0]
    imm_per_med = np.median(imm_per.reshape(imm_per.shape[0], -1), axis=0)
    np.testing.assert_allclose(imm_pool_one, imm_per_med, rtol=0.6)
