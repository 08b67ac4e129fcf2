"""Tests for the second wave of distributions (matrix/time-series/copula/
directional/power-law families).  Pattern follows the reference suite
(test/test_distributions.py): log_prob vs scipy, sampling-moment checks,
normalization integrals."""

import numpy as np
import pytest
import scipy.stats as st

import jax
import jax.numpy as jnp
from jax import random

import numpyro_tpu.distributions as dist


def test_matrix_normal_matches_kron_mvn():
    R = jnp.array([[1.0, 0.0, 0.0], [0.5, 1.2, 0.0], [0.1, -0.2, 0.8]])
    C = jnp.array([[1.0, 0.0], [0.3, 0.7]])
    mn = dist.MatrixNormal(jnp.zeros((3, 2)), R, C)
    x = mn.sample(random.PRNGKey(0), (7,))
    U = np.asarray(R @ R.T)
    V = np.asarray(C @ C.T)
    cov = np.kron(V, U)  # vec(X) column-major == kron(V, U)
    vecx = np.asarray(x).reshape(7, -1, order="F")
    ref = st.multivariate_normal(np.zeros(6), cov).logpdf(vecx)
    np.testing.assert_allclose(mn.log_prob(x), ref, atol=1e-4)


def test_circulant_normal_matches_dense_mvn():
    row = jnp.array([2.0, 0.5, 0.2, 0.1, 0.05, 0.1, 0.2, 0.5])
    cn = dist.CirculantNormal(jnp.zeros(8), covariance_row=row)
    x = cn.sample(random.PRNGKey(1), (6,))
    C = np.asarray(cn.covariance_matrix)
    ref = st.multivariate_normal(np.zeros(8), C).logpdf(np.asarray(x))
    np.testing.assert_allclose(cn.log_prob(x), ref, atol=1e-3)
    # sampled covariance converges to C
    xs = cn.sample(random.PRNGKey(2), (100_000,))
    emp = np.cov(np.asarray(xs).T)
    assert np.abs(emp - C).max() < 0.05


def test_car_matches_precision_mvn():
    adj = np.zeros((4, 4))
    for i in range(4):
        adj[i, (i + 1) % 4] = 1
        adj[(i + 1) % 4, i] = 1
    car = dist.CAR(jnp.zeros(4), 0.5, 2.0, jnp.array(adj))
    x = car.sample(random.PRNGKey(3), (5,))
    P = np.asarray(car.precision_matrix)
    ref = st.multivariate_normal(np.zeros(4), np.linalg.inv(P)).logpdf(
        np.asarray(x)
    )
    np.testing.assert_allclose(car.log_prob(x), ref, atol=1e-4)


def test_gaussian_state_space_innovations_density():
    gss = dist.GaussianStateSpace(
        6, jnp.array([[0.9]]), covariance_matrix=jnp.array([[1.0]])
    )
    x = gss.sample(random.PRNGKey(4), (3,))
    z = np.asarray(x)
    eps = np.concatenate([z[:, :1], z[:, 1:] - 0.9 * z[:, :-1]], 1)
    ref = st.norm(0, 1).logpdf(eps[..., 0]).sum(-1)
    np.testing.assert_allclose(gss.log_prob(x), ref, atol=1e-4)


def test_euler_maruyama_shapes_and_ou_moments():
    t = jnp.linspace(0, 5, 500)

    def sde(y, tt):
        return -y, jnp.ones_like(y)

    em = dist.EulerMaruyama(t, sde, dist.Normal(0.0, jnp.sqrt(0.5)))
    x = em.sample(random.PRNGKey(5), (200,))
    assert x.shape == (200, 500)
    assert em.log_prob(x).shape == (200,)
    # stationary OU: var = g^2/(2*theta) = 0.5
    assert abs(float(jnp.var(x[:, -1])) - 0.5) < 0.1


def test_zero_sum_normal():
    zsn = dist.ZeroSumNormal(1.0, (5,))
    x = zsn.sample(random.PRNGKey(6), (64,))
    np.testing.assert_allclose(np.asarray(x.sum(-1)), 0.0, atol=1e-5)
    assert np.isfinite(np.asarray(zsn.log_prob(x))).all()
    np.testing.assert_allclose(
        zsn.variance, (1 - 1 / 5) * np.ones(5), rtol=1e-6
    )


def test_negative_binomial_parameterizations_agree():
    k = jnp.arange(40.0)
    p = 0.3
    nbp = dist.NegativeBinomialProbs(10.0, p)
    ref = st.nbinom(10, 1 - p).logpmf(np.arange(40))
    np.testing.assert_allclose(nbp.log_prob(k), ref, atol=1e-4)
    logits = float(np.log(p / (1 - p)))
    nbl = dist.NegativeBinomialLogits(10.0, logits)
    np.testing.assert_allclose(nbl.log_prob(k), ref, atol=1e-4)


@pytest.mark.parametrize("use_logits", [False, True])
def test_zero_inflated_distribution(use_logits):
    base = dist.Poisson(3.0)
    gate = 0.35
    if use_logits:
        zi = dist.ZeroInflatedDistribution(
            base, gate_logits=float(np.log(gate / (1 - gate)))
        )
    else:
        zi = dist.ZeroInflatedDistribution(base, gate=gate)
    k = jnp.arange(20.0)
    pois = st.poisson(3.0).pmf(np.arange(20))
    ref = (1 - gate) * pois
    ref[0] += gate
    np.testing.assert_allclose(np.exp(zi.log_prob(k)), ref, atol=1e-5)
    x = zi.sample(random.PRNGKey(7), (5000,))
    assert abs(float(x.mean()) - (1 - gate) * 3.0) < 0.1


def test_gaussian_copula_beta_independent_reduces_to_beta():
    d = dist.GaussianCopulaBeta(
        jnp.full(3, 2.0), jnp.full(3, 2.0), correlation_matrix=jnp.eye(3)
    )
    x = d.sample(random.PRNGKey(8), (50,))
    ref = st.beta(2, 2).logpdf(np.asarray(x)).sum(-1)
    np.testing.assert_allclose(d.log_prob(x), ref, atol=5e-3)


def test_sine_bivariate_von_mises_normalized():
    d = dist.SineBivariateVonMises(0.0, 0.0, 2.0, 2.0, correlation=0.5)
    g = jnp.linspace(-jnp.pi, jnp.pi, 120)
    G = jnp.stack(jnp.meshgrid(g, g), -1).reshape(-1, 2)
    Z = jnp.exp(d.log_prob(G)).sum() * (2 * jnp.pi / 120) ** 2
    assert abs(float(Z) - 1.0) < 0.05
    x = d.sample(random.PRNGKey(9), (100,))
    assert x.shape == (100, 2)
    assert np.isfinite(np.asarray(d.log_prob(x))).all()


def test_sine_skewed_normalized():
    base = dist.VonMises(jnp.zeros(1), jnp.full(1, 2.0)).to_event(1)
    d = dist.SineSkewed(base, jnp.array([0.4]))
    g = jnp.linspace(-jnp.pi, jnp.pi, 20001)[:, None]
    Z = jnp.trapezoid(jnp.exp(d.log_prob(g)), g[:, 0])
    assert abs(float(Z) - 1.0) < 1e-3


def test_power_laws():
    dt = dist.DoublyTruncatedPowerLaw(
        jnp.array(-1.0), jnp.array(1.0), jnp.array(10.0)
    )
    g = jnp.linspace(1.0001, 9.9999, 50001)
    Z = jnp.trapezoid(jnp.exp(dt.log_prob(g)), g)
    assert abs(float(Z) - 1.0) < 1e-3
    dt2 = dist.DoublyTruncatedPowerLaw(
        jnp.array(2.0), jnp.array(1.0), jnp.array(10.0)
    )
    Z2 = jnp.trapezoid(jnp.exp(dt2.log_prob(g)), g)
    assert abs(float(Z2) - 1.0) < 1e-3
    # icdf/cdf roundtrip + gradability through the singular branch
    q = jnp.linspace(0.01, 0.99, 11)
    np.testing.assert_allclose(dt.cdf(dt.icdf(q)), q, atol=1e-5)
    grad = jax.grad(
        lambda a: dist.DoublyTruncatedPowerLaw(a, 1.0, 10.0).log_prob(5.0)
    )
    assert np.isfinite(float(grad(-1.0)))
    assert np.isfinite(float(grad(2.0)))

    lt = dist.LowerTruncatedPowerLaw(jnp.array(-3.5), jnp.array(2.0))
    x = lt.sample(random.PRNGKey(10), (20000,))
    assert float(x.min()) >= 2.0
    assert abs(float(x.mean()) - float(lt.mean)) < 0.1


def test_truncated_polya_gamma():
    pg = dist.TruncatedPolyaGamma()
    x = pg.sample(random.PRNGKey(11), (200,))
    assert float(x.min()) > 0 and float(x.max()) <= pg.truncation_point
    assert np.isfinite(np.asarray(pg.log_prob(x))).all()


def test_misc_scalar_families_match_scipy():
    xs = jnp.array([0.1, 0.5, 1.5, 3.0])
    np.testing.assert_allclose(
        dist.Levy(0.05, 1.0).log_prob(xs),
        st.levy(0.05, 1.0).logpdf(np.asarray(xs)),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        dist.Gompertz(2.0, 1.0).log_prob(xs),
        st.gompertz(2.0).logpdf(np.asarray(xs)),
        atol=1e-4,
    )
    g = jnp.linspace(-20, 20, 50001)
    Z = jnp.trapezoid(jnp.exp(dist.SoftLaplace(0.0, 1.0).log_prob(g)), g)
    assert abs(float(Z) - 1.0) < 1e-4
    bp = dist.BetaProportion(0.3, 10.0)
    np.testing.assert_allclose(
        bp.log_prob(xs[:2] / 2),
        st.beta(3.0, 7.0).logpdf(np.asarray(xs[:2] / 2)),
        atol=1e-4,
    )
    alq = dist.AsymmetricLaplaceQuantile(0.0, 1.0, 0.25)
    np.testing.assert_allclose(float(alq.cdf(0.0)), 0.25, atol=1e-6)


def test_relaxed_bernoulli_support_and_shapes():
    rb = dist.RelaxedBernoulli(0.5, probs=jnp.array([0.3, 0.7]))
    x = rb.sample(random.PRNGKey(12), (9,))
    assert x.shape == (9, 2)
    assert float(x.min()) > 0 and float(x.max()) < 1
    assert np.isfinite(np.asarray(rb.log_prob(x))).all()


def test_new_transforms_roundtrip():
    from numpyro_tpu.distributions.transforms import (
        ComplexTransform,
        PackRealFastFourierCoefficientsTransform,
        RealFastFourierTransform,
        RecursiveLinearTransform,
    )

    t = RecursiveLinearTransform(jnp.array([[1.0, 1.0], [0.0, 1.0]]))
    x = random.normal(random.PRNGKey(13), (10, 2))
    np.testing.assert_allclose(t._inverse(t(x)), x, atol=1e-5)

    f = RealFastFourierTransform((8,))
    x = random.normal(random.PRNGKey(14), (3, 8))
    np.testing.assert_allclose(f._inverse(f(x)), x, atol=1e-5)

    p = PackRealFastFourierCoefficientsTransform((8,))
    x = random.normal(random.PRNGKey(15), (8,))
    np.testing.assert_allclose(p._inverse(p(x)), x, atol=1e-6)

    c = ComplexTransform()
    x = random.normal(random.PRNGKey(16), (4, 2))
    np.testing.assert_allclose(c._inverse(c(x)), x, atol=1e-7)


def test_vmap_over_axes_spec():
    import jax
    from numpyro_tpu.distributions.batch_util import vmap_over
    import numpyro_tpu.distributions as dist

    locs = jnp.arange(3.0)
    d = dist.Normal(locs, 1.0)
    in_axes = vmap_over(d, loc=0)
    lp = jax.vmap(lambda dd: dd.log_prob(0.0), in_axes=(in_axes,))(d)
    np.testing.assert_allclose(
        np.asarray(lp).reshape(-1), dist.Normal(locs, 1.0).log_prob(0.0), rtol=1e-6
    )


def test_promote_batch_shape():
    from numpyro_tpu.distributions.batch_util import promote_batch_shape
    import numpyro_tpu.distributions as dist

    d = dist.Normal(jnp.zeros(3), 1.0)
    # simulate a scan-stacked distribution: leaves gained a leading dim
    stacked = jax.tree.map(lambda x: jnp.broadcast_to(x, (5,) + jnp.shape(x)), d)
    promoted = promote_batch_shape(stacked)
    assert promoted.batch_shape == (5, 3)
    ind = dist.Normal(jnp.zeros(3), 1.0).to_event(1)
    stacked = jax.tree.map(lambda x: jnp.broadcast_to(x, (5,) + jnp.shape(x)), ind)
    promoted = promote_batch_shape(stacked)
    assert promoted.batch_shape == (5,) and promoted.event_shape == (3,)


def test_distribution_like_protocol():
    """DistributionLike is a runtime-checkable structural type: native
    distributions satisfy it, arbitrary objects do not (reference surface:
    numpyro/distributions/distribution.py:575)."""
    import numpyro_tpu.distributions as dist
    from numpyro_tpu.distributions import DistributionLike

    assert isinstance(dist.Normal(0.0, 1.0), DistributionLike)
    assert isinstance(
        dist.MultivariateNormal(jnp.zeros(2), covariance_matrix=jnp.eye(2)),
        DistributionLike,
    )
    assert not isinstance(object(), DistributionLike)

    class Duck:
        batch_shape = ()
        event_shape = ()
        event_dim = 0
        mean = 0.0
        variance = 1.0

        def sample(self, key, sample_shape=()):
            return 0.0

        def log_prob(self, value):
            return 0.0

        def cdf(self, value):
            return 0.5

        def icdf(self, q):
            return 0.0

    assert isinstance(Duck(), DistributionLike)
