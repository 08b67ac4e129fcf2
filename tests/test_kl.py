"""KL registry correctness: every analytic divergence is validated against a
high-sample Monte Carlo estimate E_p[log p - log q] (and exact values where
known)."""

import numpy as np
import pytest

import jax.numpy as jnp
from jax import random

import numpyro_tpu.distributions as dist
from numpyro_tpu.distributions.kl import kl_divergence


def _mc_kl(p, q, n=200_000, key=0):
    x = p.sample(random.PRNGKey(key), (n,))
    return float(jnp.mean(p.log_prob(x) - q.log_prob(x)))


PAIRS = [
    (dist.Normal(0.3, 1.2), dist.Normal(-0.5, 2.0)),
    (dist.Beta(2.0, 3.0), dist.Beta(4.0, 1.5)),
    (dist.Gamma(2.5, 1.2), dist.Gamma(1.1, 0.7)),
    (dist.Dirichlet(jnp.array([1.5, 2.5, 3.0])), dist.Dirichlet(jnp.array([3.0, 1.0, 2.0]))),
    (dist.Categorical(probs=jnp.array([0.2, 0.3, 0.5])),
     dist.Categorical(probs=jnp.array([0.5, 0.25, 0.25]))),
    (dist.Categorical(logits=jnp.array([0.1, -0.4, 1.0])),
     dist.Categorical(logits=jnp.array([-1.0, 0.3, 0.2]))),
    (dist.Weibull(1.5, 2.0), dist.Gamma(2.0, 1.0)),
    (dist.Kumaraswamy(2.0, 3.0), dist.Beta(1.5, 2.5)),
]


@pytest.mark.parametrize("p,q", PAIRS, ids=lambda d: type(d).__name__)
def test_kl_matches_monte_carlo(p, q):
    if isinstance(p, dist.Kumaraswamy):
        # the analytic form is a truncated Taylor series; raise the order so
        # the check isolates correctness from truncation bias
        p.KL_KUMARASWAMY_BETA_TAYLOR_ORDER = 200
    analytic = float(kl_divergence(p, q))
    mc = _mc_kl(p, q)
    scale = max(abs(mc), 0.05)
    assert abs(analytic - mc) / scale < 0.05, (analytic, mc)


def test_kl_normal_exact():
    got = float(kl_divergence(dist.Normal(1.0, 2.0), dist.Normal(0.0, 1.0)))
    expected = np.log(1 / 2) + (4 + 1) / 2 - 0.5
    assert abs(got - expected) < 1e-6


def test_kl_mvn_matches_normal_diag():
    # diagonal MVN KL must agree with the summed scalar-normal KL
    locp, locq = jnp.array([0.5, -1.0]), jnp.zeros(2)
    sp, sq = jnp.array([1.5, 0.7]), jnp.array([1.0, 2.0])
    mvn = float(
        kl_divergence(
            dist.MultivariateNormal(locp, scale_tril=jnp.diag(sp)),
            dist.MultivariateNormal(locq, scale_tril=jnp.diag(sq)),
        )
    )
    diag = float(
        kl_divergence(
            dist.Normal(locp, sp).to_event(1), dist.Normal(locq, sq).to_event(1)
        )
    )
    assert abs(mvn - diag) < 1e-5


def test_kl_independent_and_expanded():
    p = dist.Normal(jnp.zeros(3), 1.0)
    q = dist.Normal(jnp.ones(3), 2.0)
    per_site = kl_divergence(p, q)
    assert per_site.shape == (3,)
    eventwise = float(kl_divergence(p.to_event(1), q.to_event(1)))
    assert abs(eventwise - float(per_site.sum())) < 1e-6
    expanded = kl_divergence(p.expand((2, 3)), q.expand((2, 3)))
    assert expanded.shape == (2, 3)
    assert np.allclose(np.asarray(expanded), np.asarray(per_site), atol=1e-6)


def test_kl_delta():
    d = dist.Delta(1.3)
    q = dist.Normal(0.0, 1.0)
    assert abs(float(kl_divergence(d, q)) - float(-q.log_prob(1.3))) < 1e-6


def test_kl_unregistered_raises():
    with pytest.raises(NotImplementedError):
        kl_divergence(dist.Cauchy(0.0, 1.0), dist.Gamma(1.0, 1.0))
