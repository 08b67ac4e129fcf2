"""Distribution unit tests: log_prob vs scipy, sample-shape laws, pytree
round-trips, transform bijectivity (mirrors the reference strategy of
test/test_distributions.py)."""

import numpy as np
import pytest
import scipy.stats as osp

import jax
import jax.numpy as jnp
from jax import random, vmap

import numpyro_tpu.distributions as dist
from numpyro_tpu.distributions import biject_to, constraints

KEY = random.PRNGKey(0)


# (our dist factory, scipy dist factory, params)
SCIPY_CASES = [
    (dist.Normal, lambda loc, scale: osp.norm(loc, scale), (1.2, 3.0)),
    (dist.Uniform, lambda low, high: osp.uniform(low, high - low), (-1.0, 2.5)),
    (dist.Exponential, lambda rate: osp.expon(scale=1 / rate), (2.5,)),
    (dist.Gamma, lambda a, b: osp.gamma(a, scale=1 / b), (2.0, 3.0)),
    (dist.Beta, lambda a, b: osp.beta(a, b), (1.5, 2.5)),
    (dist.Cauchy, lambda loc, scale: osp.cauchy(loc, scale), (0.5, 2.0)),
    (dist.HalfCauchy, lambda scale: osp.halfcauchy(scale=scale), (1.5,)),
    (dist.HalfNormal, lambda scale: osp.halfnorm(scale=scale), (1.5,)),
    (dist.LogNormal, lambda loc, scale: osp.lognorm(scale, scale=np.exp(loc)), (0.5, 0.8)),
    (dist.StudentT, lambda df, loc, scale: osp.t(df, loc, scale), (4.0, 0.5, 2.0)),
    (dist.Laplace, lambda loc, scale: osp.laplace(loc, scale), (0.5, 2.0)),
    (dist.Gumbel, lambda loc, scale: osp.gumbel_r(loc, scale), (0.5, 2.0)),
    (dist.Logistic, lambda loc, scale: osp.logistic(loc, scale), (0.5, 2.0)),
    (dist.Pareto, lambda scale, alpha: osp.pareto(alpha, scale=scale), (1.5, 3.0)),
    (dist.Weibull, lambda scale, conc: osp.weibull_min(conc, scale=scale), (1.5, 2.0)),
    (dist.InverseGamma, lambda a, b: osp.invgamma(a, scale=b), (3.0, 2.0)),
    (dist.Chi2, lambda df: osp.chi2(df), (4.0,)),
]

DISCRETE_CASES = [
    (lambda: dist.Poisson(3.5), lambda: osp.poisson(3.5), [0, 1, 4, 10]),
    (
        lambda: dist.Binomial(10, probs=0.3),
        lambda: osp.binom(10, 0.3),
        [0, 3, 10],
    ),
    (
        lambda: dist.Geometric(probs=0.3),
        lambda: osp.geom(0.3, loc=-1),
        [0, 2, 7],
    ),
    (
        lambda: dist.BetaBinomial(2.0, 3.0, 10),
        lambda: osp.betabinom(10, 2.0, 3.0),
        [0, 4, 10],
    ),
    (
        lambda: dist.GammaPoisson(2.0, 0.5),
        lambda: osp.nbinom(2.0, 0.5 / 1.5),
        [0, 3, 9],
    ),
]


@pytest.mark.parametrize("our_cls, scipy_fn, params", SCIPY_CASES)
def test_log_prob_vs_scipy(our_cls, scipy_fn, params):
    d = our_cls(*params)
    sp = scipy_fn(*params)
    samples = d.sample(KEY, (5,))
    np.testing.assert_allclose(
        d.log_prob(samples), sp.logpdf(np.asarray(samples)), rtol=1e-3, atol=5e-4
    )


@pytest.mark.parametrize("our_fn, scipy_fn, values", DISCRETE_CASES)
def test_discrete_log_prob_vs_scipy(our_fn, scipy_fn, values):
    d = our_fn()
    sp = scipy_fn()
    values = np.array(values)
    np.testing.assert_allclose(
        d.log_prob(values), sp.logpmf(values), rtol=1e-3, atol=1e-4
    )


@pytest.mark.parametrize("our_cls, scipy_fn, params", SCIPY_CASES)
def test_sample_moments(our_cls, scipy_fn, params):
    d = our_cls(*params)
    if our_cls in (dist.Cauchy, dist.HalfCauchy):
        return
    samples = d.sample(KEY, (30_000,))
    np.testing.assert_allclose(samples.mean(0), d.mean, rtol=0.06, atol=0.02)


def test_mvn_log_prob_vs_scipy():
    L = jnp.array([[1.0, 0.0], [0.5, 2.0]])
    loc = jnp.array([0.3, -0.7])
    d = dist.MultivariateNormal(loc, scale_tril=L)
    sp = osp.multivariate_normal(np.asarray(loc), np.asarray(L @ L.T))
    x = d.sample(KEY, (7,))
    np.testing.assert_allclose(d.log_prob(x), sp.logpdf(np.asarray(x)), rtol=1e-3)
    assert d.log_prob(x).shape == (7,)


def test_dirichlet_log_prob_vs_scipy():
    conc = jnp.array([1.5, 2.0, 3.0])
    d = dist.Dirichlet(conc)
    sp = osp.dirichlet(np.asarray(conc))
    x = np.asarray(d.sample(KEY, (7,)), dtype=np.float64)
    x = x / x.sum(-1, keepdims=True)
    np.testing.assert_allclose(
        d.log_prob(jnp.asarray(x)), sp.logpdf(x.T), rtol=1e-3
    )


def test_categorical_bernoulli():
    c = dist.Categorical(probs=jnp.array([0.2, 0.3, 0.5]))
    np.testing.assert_allclose(c.log_prob(2), np.log(0.5), rtol=1e-6)
    b = dist.Bernoulli(logits=0.3)
    p = 1 / (1 + np.exp(-0.3))
    np.testing.assert_allclose(b.log_prob(1), np.log(p), rtol=1e-5)
    np.testing.assert_allclose(b.log_prob(0), np.log(1 - p), rtol=1e-5)


def test_truncated_normal():
    d = dist.TruncatedNormal(0.0, 1.0, low=-1.0, high=2.0)
    sp = osp.truncnorm(-1.0, 2.0)
    x = d.sample(KEY, (100,))
    assert (x >= -1).all() and (x <= 2).all()
    np.testing.assert_allclose(d.log_prob(x), sp.logpdf(np.asarray(x)), rtol=1e-3, atol=1e-4)


def test_von_mises():
    d = dist.VonMises(0.5, 2.0)
    sp = osp.vonmises(2.0, loc=0.5)
    x = d.sample(KEY, (50,))
    assert (x >= -np.pi).all() and (x <= np.pi).all()
    np.testing.assert_allclose(d.log_prob(x), sp.logpdf(np.asarray(x)), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize(
    "shape_dist",
    [
        lambda: dist.Normal(jnp.zeros((3, 2)), 1.0),
        lambda: dist.MultivariateNormal(jnp.zeros((4, 3)), scale_tril=jnp.eye(3)),
        lambda: dist.Dirichlet(jnp.ones((5, 4))),
        lambda: dist.GaussianRandomWalk(2.0, 10),
        lambda: dist.Normal(0.0, 1.0).expand((6, 2)),
        lambda: dist.Normal(jnp.zeros(3), 1.0).to_event(1),
    ],
)
@pytest.mark.parametrize("sample_shape", [(), (7,), (2, 5)])
def test_shape_laws(shape_dist, sample_shape):
    d = shape_dist()
    x = d.sample(KEY, sample_shape)
    assert x.shape == sample_shape + d.batch_shape + d.event_shape
    lp = d.log_prob(x)
    assert lp.shape == sample_shape + d.batch_shape


@pytest.mark.parametrize(
    "d",
    [
        dist.Normal(jnp.ones(3), 2.0),
        dist.Gamma(jnp.full(2, 2.0), 1.0),
        dist.MultivariateNormal(jnp.zeros(2), scale_tril=jnp.eye(2)),
        dist.Dirichlet(jnp.ones(3)),
        dist.Uniform(0.0, jnp.ones(2)),
    ],
)
def test_pytree_roundtrip(d):
    flat, treedef = jax.tree_util.tree_flatten(d)
    d2 = jax.tree_util.tree_unflatten(treedef, flat)
    assert type(d2) is type(d)
    assert d2.batch_shape == d.batch_shape
    assert d2.event_shape == d.event_shape
    x = d.sample(KEY)
    np.testing.assert_allclose(d.log_prob(x), d2.log_prob(x), rtol=1e-6)


def test_vmap_over_distribution():
    locs = jnp.arange(4.0)
    lp = vmap(lambda loc: dist.Normal(loc, 1.0).log_prob(0.0))(locs)
    expected = osp.norm(np.arange(4.0), 1.0).logpdf(0.0)
    np.testing.assert_allclose(lp, expected, rtol=1e-4)


@pytest.mark.parametrize(
    "constraint, event_shape",
    [
        (constraints.real, ()),
        (constraints.positive, ()),
        (constraints.unit_interval, ()),
        (constraints.interval(-2.0, 3.0), ()),
        (constraints.greater_than(2.0), ()),
        (constraints.less_than(-1.0), ()),
        (constraints.circular, ()),
        (constraints.simplex, (5,)),
        (constraints.ordered_vector, (5,)),
        (constraints.positive_ordered_vector, (5,)),
        (constraints.corr_cholesky, (4, 4)),
        (constraints.lower_cholesky, (3, 3)),
        (constraints.positive_definite, (3, 3)),
        (constraints.corr_matrix, (3, 3)),
        (constraints.l1_ball, (4,)),
        (constraints.softplus_positive, ()),
        (constraints.zero_sum(1), (4,)),
    ],
)
def test_biject_to_roundtrip(constraint, event_shape):
    t = biject_to(constraint)
    unconstrained_shape = t.inverse_shape(event_shape)
    x = random.normal(KEY, (7,) + unconstrained_shape)
    y = t(x)
    # codomain check
    assert np.all(np.asarray(constraint(y)))
    # round trip
    x2 = t.inv(y)
    np.testing.assert_allclose(x2, x, rtol=1e-4, atol=1e-4)
    # log det consistency forward/backward
    ladj = t.log_abs_det_jacobian(x, y)
    ladj_inv = t.inv.log_abs_det_jacobian(y, x)
    np.testing.assert_allclose(ladj, -ladj_inv, rtol=1e-4, atol=1e-4)
    assert ladj.shape == (7,)


@pytest.mark.parametrize(
    "constraint, dim",
    [
        (constraints.simplex, 4),
        (constraints.ordered_vector, 4),
        (constraints.l1_ball, 4),
    ],
)
def test_biject_log_det_vs_autodiff(constraint, dim):
    t = biject_to(constraint)
    unconstrained_dim = t.inverse_shape((dim,))[0]
    x = random.normal(KEY, (unconstrained_dim,)) * 0.5

    def flat_forward(x):
        y = t(x)
        return y[: unconstrained_dim] if y.shape[0] > unconstrained_dim else y

    jac = jax.jacfwd(t)(x)
    # use the square part (K-1 x K-1 for simplex-like maps)
    jac = jac[: x.shape[0], :] if jac.shape[0] > x.shape[0] else jac
    expected = np.linalg.slogdet(np.asarray(jac))[1]
    actual = t.log_abs_det_jacobian(x, t(x))
    np.testing.assert_allclose(actual, expected, rtol=1e-4, atol=1e-4)


def test_kl_normal_normal():
    from numpyro_tpu.distributions import kl_divergence

    p = dist.Normal(0.0, 1.0)
    q = dist.Normal(1.0, 2.0)
    actual = kl_divergence(p, q)
    # MC estimate
    x = p.sample(KEY, (100_000,))
    expected = (p.log_prob(x) - q.log_prob(x)).mean()
    np.testing.assert_allclose(actual, expected, rtol=0.05)


def test_mixture_same_family():
    mixing = dist.Categorical(probs=jnp.array([0.3, 0.7]))
    components = dist.Normal(jnp.array([-1.0, 2.0]), jnp.array([1.0, 0.5]))
    m = dist.MixtureSameFamily(mixing, components)
    x = jnp.array([0.5])
    expected = np.logaddexp(
        np.log(0.3) + osp.norm(-1.0, 1.0).logpdf(0.5),
        np.log(0.7) + osp.norm(2.0, 0.5).logpdf(0.5),
    )
    np.testing.assert_allclose(m.log_prob(x), [expected], rtol=1e-4)
    samples = m.sample(KEY, (10_000,))
    np.testing.assert_allclose(samples.mean(), m.mean, atol=0.05)


def test_lkj_cholesky_log_prob_normalized():
    # integral check via importance sampling against the onion sampler
    d = dist.LKJCholesky(3, concentration=1.5)
    L = d.sample(KEY, (10,))
    assert L.shape == (10, 3, 3)
    assert np.all(np.asarray(constraints.corr_cholesky(L)))
    lp = d.log_prob(L)
    assert np.all(np.isfinite(np.asarray(lp)))


def test_zero_inflated_poisson():
    d = dist.ZeroInflatedPoisson(0.3, 4.0)
    sp_pois = osp.poisson(4.0)
    np.testing.assert_allclose(
        d.log_prob(0),
        np.log(0.3 + 0.7 * sp_pois.pmf(0)),
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        d.log_prob(3), np.log(0.7 * sp_pois.pmf(3)), rtol=1e-4
    )


def test_transformed_distribution_log_prob():
    base = dist.Normal(0.0, 1.0)
    d = dist.TransformedDistribution(
        base, dist.transforms.AffineTransform(2.0, 3.0)
    )
    sp = osp.norm(2.0, 3.0)
    x = d.sample(KEY, (11,))
    np.testing.assert_allclose(d.log_prob(x), sp.logpdf(np.asarray(x)), rtol=1e-3, atol=1e-5)


def test_independent_and_mask():
    d = dist.Normal(jnp.zeros((4, 3)), 1.0).to_event(1)
    assert d.batch_shape == (4,) and d.event_shape == (3,)
    x = d.sample(KEY)
    np.testing.assert_allclose(
        d.log_prob(x), osp.norm().logpdf(np.asarray(x)).sum(-1), rtol=1e-4
    )
    mask = jnp.array([True, False, True, False])
    dm = dist.Normal(jnp.zeros(4), 1.0).mask(mask)
    lp = dm.log_prob(jnp.ones(4))
    np.testing.assert_allclose(np.asarray(lp)[~np.asarray(mask)], 0.0)
