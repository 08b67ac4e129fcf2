"""Statistical correctness of the device-side diagnostics (split-R̂, FFT
ESS, HPDI, summary) against analytic expectations on synthetic chains."""

import numpy as np
import pytest
import jax.numpy as jnp
from jax import random

from numpyro_tpu.diagnostics import (
    autocorrelation,
    effective_sample_size,
    gelman_rubin,
    hpdi,
    split_gelman_rubin,
    summary,
)


def _iid_chains(key, n_chains=4, n_draws=2000):
    return random.normal(key, (n_chains, n_draws))


@pytest.mark.slow
def test_ess_iid_close_to_n():
    x = _iid_chains(random.PRNGKey(0))
    ess = float(effective_sample_size(x))
    total = x.shape[0] * x.shape[1]
    assert 0.8 * total < ess < 1.3 * total


@pytest.mark.slow
def test_ess_ar1_matches_theory():
    # AR(1) with coefficient rho has ESS/N = (1-rho)/(1+rho)
    rho = 0.7
    key = random.PRNGKey(1)
    eps = np.asarray(random.normal(key, (4, 20000)))
    x = np.zeros_like(eps)
    x[:, 0] = eps[:, 0]
    for t in range(1, eps.shape[1]):
        x[:, t] = rho * x[:, t - 1] + np.sqrt(1 - rho**2) * eps[:, t]
    ess = float(effective_sample_size(jnp.asarray(x)))
    expected = x.size * (1 - rho) / (1 + rho)
    assert abs(ess - expected) / expected < 0.2, (ess, expected)


def test_gelman_rubin_mixed_vs_unmixed():
    key = random.PRNGKey(2)
    good = _iid_chains(key)
    assert abs(float(split_gelman_rubin(good)) - 1.0) < 0.05
    # chains with different means → large R-hat
    shifted = good + jnp.arange(4.0)[:, None] * 5.0
    assert float(gelman_rubin(shifted)) > 2.0


def test_autocorrelation_lag0_is_one():
    x = _iid_chains(random.PRNGKey(3), 1, 512)[0]
    ac = autocorrelation(x)
    assert abs(float(ac[0]) - 1.0) < 1e-5
    assert np.abs(np.asarray(ac[10:50])).max() < 0.2


def test_hpdi_gaussian_width():
    x = random.normal(random.PRNGKey(4), (100000,))
    lo, hi = np.asarray(hpdi(x, prob=0.9))
    # 90% HPDI of N(0,1) is ±1.645
    assert abs(lo + 1.645) < 0.06 and abs(hi - 1.645) < 0.06


def test_summary_fields():
    samples = {"theta": np.asarray(_iid_chains(random.PRNGKey(5)))}
    stats = summary(samples, group_by_chain=True)["theta"]
    assert abs(stats["mean"]) < 0.05
    assert abs(stats["std"] - 1.0) < 0.05
    assert stats["n_eff"] > 1000
    assert abs(stats["r_hat"] - 1.0) < 0.05


def test_ess_antithetic_is_positive_and_capped():
    # perfectly antithetic pairs: naive tau would be <= 0; ESS must stay
    # positive and bounded by N*log10(N)
    key = random.PRNGKey(7)
    base = random.normal(key, (2, 500))
    x = jnp.stack([base, -base], axis=-1).reshape(2, 1000)
    ess = float(effective_sample_size(x))
    total = 2 * 1000
    assert 0 < ess <= total * np.log10(total) * 1.001
