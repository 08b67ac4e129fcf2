"""Goodness-of-fit coverage for the families the direct-space sweep skips
(VERDICT r4 #6; reference: numpyro/distributions/gof.py:367 used broadly by
test/test_distributions.py).

Three uniform mechanisms close the gaps:

1. **Unconstrained-space density test** — for supports where the ambient
   density is degenerate (simplex, zero-sum plane, Cholesky/PSD cones,
   circles) or plain multivariate: map samples through
   ``T = biject_to(support)`` inverse and test the corrected density
   ``p_u(u) = p_x(T(u)) * |det dT/du|`` with the generic 1D/vector tests.
   One rule covers Dirichlet, MVN variants, Wishart, LKJCholesky,
   ZeroSumNormal, GaussianRandomWalk, VonMises, MatrixNormal.
2. **CDF/PIT test** — heavy-tailed 1D families with an analytic CDF
   (Levy): ``cdf(x) ~ Uniform(0,1)`` exactly; nearest-neighbor density
   tests are unreliable under infinite variance.
3. **Multinomial count test** — discrete families: compare per-value
   sample counts to the pmf (tail-bucketed for unbounded supports).

Families with a stated mathematical reason to remain untested here:
- ``LKJ`` (full correlation matrix) is the deterministic pushforward
  L -> L L^T of ``LKJCholesky``, which IS tested; the map is a bijection
  on the support, so the Cholesky test covers the sampler.
- ``ProjectedNormal`` (sphere support, no biject_to) is tested in its
  angle parametrization for dim 2 (arc length = dtheta, unit Jacobian).
"""

import numpy as np
import pytest
import scipy.stats as osp

import jax.numpy as jnp
from jax import random

import numpyro_tpu.distributions as dist
from numpyro_tpu.distributions.gof import (
    InvalidTest,
    auto_goodness_of_fit,
    multinomial_goodness_of_fit,
    unif01_goodness_of_fit,
)
from numpyro_tpu.distributions.transforms import biject_to

TEST_FAILURE_RATE = 5e-3
_cov = np.array([[2.0, 0.5], [0.5, 1.0]])


# --------------------------------------------------------------------------
# 1. unconstrained-space density tests

UNCONSTRAINED_CASES = {
    "Dirichlet": lambda: dist.Dirichlet(jnp.array([2.0, 3.0, 4.0])),
    "MultivariateNormal": lambda: dist.MultivariateNormal(
        jnp.array([1.0, -1.0]), covariance_matrix=jnp.asarray(_cov)
    ),
    "LowRankMultivariateNormal": lambda: dist.LowRankMultivariateNormal(
        jnp.zeros(3), cov_factor=jnp.ones((3, 1)), cov_diag=jnp.ones(3)
    ),
    "MultivariateStudentT": lambda: dist.MultivariateStudentT(
        8.0, jnp.zeros(2), scale_tril=jnp.linalg.cholesky(jnp.asarray(_cov))
    ),
    "GaussianRandomWalk": lambda: dist.GaussianRandomWalk(0.7, num_steps=4),
    "ZeroSumNormal": lambda: dist.ZeroSumNormal(1.0, event_shape=(4,)),
    "VonMises": lambda: dist.VonMises(0.5, 2.0),
    "LKJCholesky": lambda: dist.LKJCholesky(3, concentration=1.5),
    "Wishart": lambda: dist.Wishart(5.0, scale_matrix=jnp.eye(2)),
    "MatrixNormal": lambda: dist.MatrixNormal(
        jnp.zeros((2, 2)),
        scale_tril_row=jnp.eye(2) + 0.1,
        scale_tril_column=jnp.eye(2),
    ),
}


@pytest.mark.slow
@pytest.mark.parametrize("name", list(UNCONSTRAINED_CASES))
def test_gof_unconstrained(name):
    d = UNCONSTRAINED_CASES[name]()
    transform = biject_to(d.support)
    # unconstrained dimensionality fixes the sample-size requirement
    probe_u = transform.inv(d.sample(random.PRNGKey(0)))
    u_dim = max(int(np.prod(np.shape(probe_u))), 1)
    n = max(4000, 1500 * u_dim)
    x = d.sample(random.PRNGKey(5), (n,))
    u = transform.inv(x)
    # p_u(u) = p_x(x) * |det dT/du|
    ladj = transform.log_abs_det_jacobian(u, x)
    # reduce any leftover batch-of-event dims of the jacobian to one scalar
    # per draw (transforms with event_dim < site event size)
    while np.ndim(ladj) > 1:
        ladj = ladj.sum(-1)
    log_probs = np.asarray(d.log_prob(x), dtype=np.float64) + np.asarray(
        ladj, dtype=np.float64
    )
    # the density tests are scale-sensitive: keep absolute normalization
    probs = np.exp(log_probs)
    try:
        gof = auto_goodness_of_fit(
            np.asarray(u, dtype=np.float64).reshape(n, -1), probs
        )
    except InvalidTest:
        pytest.skip("sample size too small for this dimension")
    assert gof > TEST_FAILURE_RATE, f"gof={gof} for {name} (dim {u_dim})"


@pytest.mark.slow
def test_gof_projected_normal_angle():
    d = dist.ProjectedNormal(jnp.array([1.0, 0.5]))
    n = 6000
    x = d.sample(random.PRNGKey(3), (n,))
    theta = np.arctan2(np.asarray(x[:, 1]), np.asarray(x[:, 0]))
    probs = np.exp(np.asarray(d.log_prob(x), dtype=np.float64))
    gof = auto_goodness_of_fit(theta, probs)
    assert gof > TEST_FAILURE_RATE, f"gof={gof}"


@pytest.mark.slow
def test_gof_levy_pit():
    d = dist.Levy(0.0, 1.0)
    n = 5000
    x = np.asarray(d.sample(random.PRNGKey(7), (n,)), dtype=np.float64)
    gof = unif01_goodness_of_fit(osp.levy(0.0, 1.0).cdf(x))
    assert gof > TEST_FAILURE_RATE, f"gof={gof}"


# --------------------------------------------------------------------------
# 3. multinomial count tests for discrete families

def _finite_values(name):
    if name in ("Bernoulli", "BernoulliLogits"):
        return np.arange(2)
    if name in ("Binomial", "BetaBinomial"):
        return np.arange(11)
    if name == "Categorical":
        return np.arange(3)
    if name == "DiscreteUniform":
        return np.arange(0, 6)
    if name == "OrderedLogistic":
        return np.arange(3)
    return None  # unbounded: tail-bucketed below


DISCRETE_CASES = {
    "Bernoulli": lambda: dist.Bernoulli(0.3),
    "BernoulliLogits": lambda: dist.Bernoulli(logits=0.4),
    "Binomial": lambda: dist.Binomial(10, 0.4),
    "BetaBinomial": lambda: dist.BetaBinomial(2.0, 3.0, 10),
    "Categorical": lambda: dist.Categorical(jnp.array([0.2, 0.5, 0.3])),
    "DiscreteUniform": lambda: dist.DiscreteUniform(0, 5),
    "OrderedLogistic": lambda: dist.OrderedLogistic(
        0.5, jnp.array([-1.0, 1.0])
    ),
    "Geometric": lambda: dist.Geometric(0.3),
    "Poisson": lambda: dist.Poisson(3.5),
    "GammaPoisson": lambda: dist.GammaPoisson(2.0, 1.0),
    "NegativeBinomial2": lambda: dist.NegativeBinomial2(3.0, 2.0),
    "ZeroInflatedPoisson": lambda: dist.ZeroInflatedPoisson(0.3, 2.0),
}


@pytest.mark.slow
@pytest.mark.parametrize("name", list(DISCRETE_CASES))
def test_gof_discrete_counts(name):
    d = DISCRETE_CASES[name]()
    n = 20000
    s = np.asarray(d.sample(random.PRNGKey(11), (n,))).astype(np.int64)
    values = _finite_values(name)
    if values is None:
        # unbounded support: explicit cells up to the 99.9th percentile,
        # everything beyond in one tail bucket
        hi = int(np.quantile(s, 0.999)) + 1
        values = np.arange(hi)
        pmf = np.exp(
            np.asarray(
                d.log_prob(jnp.asarray(values, dtype=jnp.result_type(int))),
                dtype=np.float64,
            )
        )
        tail_p = max(1.0 - pmf.sum(), 1e-12)
        counts = np.bincount(np.clip(s, 0, hi), minlength=hi + 1)
        probs = np.concatenate([pmf, [tail_p]])
    else:
        pmf = np.exp(
            np.asarray(
                d.log_prob(jnp.asarray(values, dtype=jnp.result_type(int))),
                dtype=np.float64,
            )
        )
        counts = np.bincount(s - values[0], minlength=len(values))[
            : len(values)
        ]
        probs = pmf / pmf.sum()
    gof = multinomial_goodness_of_fit(probs, counts, total_count=n)
    assert gof > TEST_FAILURE_RATE, f"gof={gof} for {name}"


@pytest.mark.slow
@pytest.mark.parametrize("name", ["Multinomial", "DirichletMultinomial"])
def test_gof_vector_counts(name):
    # vector-valued count families: every composition of total_count into
    # K cells is one multinomial category
    from itertools import combinations_with_replacement

    total, K = 6, 3
    if name == "Multinomial":
        d = dist.Multinomial(total, jnp.array([0.2, 0.3, 0.5]))
    else:
        d = dist.DirichletMultinomial(jnp.array([1.0, 2.0, 3.0]), total)
    comps = sorted(
        {
            tuple(
                np.bincount(list(c), minlength=K)
            )
            for c in combinations_with_replacement(range(K), total)
        }
    )
    comp_arr = jnp.asarray(np.array(comps, dtype=np.float32))
    pmf = np.exp(np.asarray(d.log_prob(comp_arr), dtype=np.float64))
    lookup = {tuple(int(v) for v in c): i for i, c in enumerate(comps)}
    n = 20000
    s = np.asarray(d.sample(random.PRNGKey(13), (n,))).astype(np.int64)
    counts = np.zeros(len(comps), dtype=np.int64)
    for row in s:
        counts[lookup[tuple(row)]] += 1
    gof = multinomial_goodness_of_fit(pmf / pmf.sum(), counts, total_count=n)
    assert gof > TEST_FAILURE_RATE, f"gof={gof} for {name}"
