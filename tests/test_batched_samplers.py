"""Statistical correctness of the whole-array masked-lane rejection
samplers (distributions/util.py): binomial across its BTRS/inversion
regimes by exact chi-square, von Mises by Kolmogorov-Smirnov, plus the
gammaln-based Stirling tail and the bisection inverses."""

import numpy as np
import pytest
import scipy.special as sp
import scipy.stats as st

import jax.numpy as jnp
from jax import random

from numpyro_tpu.distributions.util import (
    betaincinv,
    binomial,
    gammaincinv,
    multinomial,
    stirling_approx_tail,
    von_mises_centered,
)


@pytest.mark.parametrize("k", [0, 1, 3, 9, 10, 50, 1000])
def test_stirling_tail_matches_gammaln(k):
    k = float(k)
    want = sp.gammaln(k + 1) - (
        0.5 * np.log(2 * np.pi) + (k + 0.5) * np.log(k + 1) - (k + 1)
    )
    assert abs(float(stirling_approx_tail(jnp.asarray(k))) - want) < 1e-5


@pytest.mark.parametrize(
    "n,p",
    [(5, 0.3), (20, 0.02), (10, 1.0), (10, 0.0), (100, 0.2), (50, 0.9)],
)
def test_binomial_regimes(n, p):
    draws = binomial(
        random.PRNGKey(0), jnp.full((20000,), p), jnp.full((20000,), float(n))
    )
    mean = float(draws.mean())
    assert abs(mean - n * p) < 0.05 * max(n * p, 1) + 0.1
    if 0 < p < 1 and n <= 20:
        obs = np.bincount(np.asarray(draws).astype(int), minlength=n + 1)
        expected = st.binom.pmf(np.arange(n + 1), n, p) * 20000
        mask = expected > 5
        chi2 = ((obs[mask] - expected[mask]) ** 2 / expected[mask]).sum()
        pval = 1 - st.chi2.cdf(chi2, mask.sum() - 1)
        assert pval > 1e-4, (n, p, pval)


@pytest.mark.slow
def test_binomial_btrs_chi_square():
    draws = binomial(
        random.PRNGKey(7), jnp.full((40000,), 0.2), jnp.full((40000,), 100.0)
    )
    obs = np.bincount(np.asarray(draws).astype(int), minlength=101)
    expected = st.binom.pmf(np.arange(101), 100, 0.2) * 40000
    mask = expected > 5
    chi2 = ((obs[mask] - expected[mask]) ** 2 / expected[mask]).sum()
    pval = 1 - st.chi2.cdf(chi2, mask.sum() - 1)
    assert pval > 1e-4, pval


@pytest.mark.parametrize("kappa", [0.01, 0.5, 2.0, 100.0])
def test_von_mises_ks(kappa):
    x = von_mises_centered(
        random.PRNGKey(3), jnp.full((20000,), kappa), dtype=jnp.float32
    )
    _, pval = st.kstest(np.asarray(x), st.vonmises(kappa).cdf)
    assert pval > 1e-4, (kappa, pval)


def test_multinomial_counts():
    counts = multinomial(
        random.PRNGKey(4), jnp.array([0.2, 0.3, 0.5]), jnp.asarray(40), (5000,)
    )
    assert np.allclose(np.asarray(counts).mean(0), [8, 12, 20], atol=0.3)
    assert (np.asarray(counts).sum(-1) == 40).all()


def test_incomplete_function_inverses():
    assert abs(float(betaincinv(2.0, 3.0, 0.7)) - sp.betaincinv(2, 3, 0.7)) < 1e-5
    assert abs(float(gammaincinv(2.0, 0.7)) - sp.gammaincinv(2, 0.7)) < 1e-3
