"""Numerics suite for distributions/util.py (reference strategy:
test/test_distributions_util.py — special functions and batched samplers are
checked against scipy/closed forms)."""

import numpy as np
import pytest
import scipy.special as osp
import scipy.stats as ss

import jax.numpy as jnp
from jax import grad, jit, lax, random, vmap

from numpyro_tpu.distributions.util import (
    add_diag,
    betainc,
    betaincinv,
    binary_cross_entropy_with_logits,
    binomial,
    categorical,
    cholesky_of_inverse,
    cholesky_update,
    clamp_probs,
    gammaincinv,
    logits_to_probs,
    logmatmulexp,
    matrix_to_tril_vec,
    multigammaln,
    multinomial,
    probs_to_logits,
    promote_shapes,
    safe_normalize,
    scale_and_mask,
    sum_rightmost,
    vec_to_tril_matrix,
    von_mises_centered,
)


# ------------------------------------------------------------ shape algebra


@pytest.mark.parametrize(
    "shapes, out_shape",
    [
        ([(2,), (3, 2)], (3, 2)),
        ([(), (1,)], (1,)),
        ([(5, 1), (1, 4)], (5, 4)),
    ],
)
def test_promote_shapes(shapes, out_shape):
    args = [jnp.zeros(s) for s in shapes]
    promoted = promote_shapes(*args)
    b = jnp.broadcast_shapes(*(jnp.shape(p) for p in promoted))
    assert b == out_shape


def test_promote_shapes_with_target():
    (a,) = promote_shapes(jnp.zeros((3,)), shape=(2, 3))
    # promoted to the target rank, still broadcastable
    assert jnp.ndim(a) == 2


def test_sum_rightmost():
    x = jnp.arange(24.0).reshape(2, 3, 4)
    np.testing.assert_allclose(sum_rightmost(x, 0), x)
    np.testing.assert_allclose(sum_rightmost(x, 1), x.sum(-1))
    np.testing.assert_allclose(sum_rightmost(x, 2), x.sum((-1, -2)))


def test_scale_and_mask():
    x = jnp.array([1.0, 2.0, 3.0])
    np.testing.assert_allclose(scale_and_mask(x, scale=2.0), 2 * x)
    m = jnp.array([True, False, True])
    out = scale_and_mask(x, mask=m)
    np.testing.assert_allclose(out, jnp.where(m, x, 0.0))
    assert scale_and_mask(x) is x


def test_tril_vec_roundtrip():
    key = random.PRNGKey(0)
    A = random.normal(key, (4, 4))
    L = jnp.tril(A)
    v = matrix_to_tril_vec(L)
    assert v.shape == (10,)
    np.testing.assert_allclose(vec_to_tril_matrix(v), L, rtol=1e-6)
    # strict lower triangle
    v1 = matrix_to_tril_vec(A, diagonal=-1)
    assert v1.shape == (6,)
    back = vec_to_tril_matrix(v1, diagonal=-1)
    np.testing.assert_allclose(back, jnp.tril(A, -1), rtol=1e-6)


# ------------------------------------------------------------ linear algebra


def _random_spd(key, n):
    A = random.normal(key, (n, n))
    return A @ A.T + n * jnp.eye(n)


def test_cholesky_of_inverse():
    P = _random_spd(random.PRNGKey(1), 5)
    L = cholesky_of_inverse(P)
    np.testing.assert_allclose(L @ L.T, jnp.linalg.inv(P), rtol=1e-4, atol=1e-5)


def test_add_diag():
    M = jnp.ones((2, 3, 3))
    out = add_diag(M, 2.0)
    np.testing.assert_allclose(out[0], jnp.ones((3, 3)) + 2 * jnp.eye(3))


@pytest.mark.parametrize("coef", [1, -1])
def test_cholesky_update(coef):
    key1, key2 = random.split(random.PRNGKey(2))
    P = _random_spd(key1, 4)
    x = 0.3 * random.normal(key2, (4,))
    L = jnp.linalg.cholesky(P)
    L_new = cholesky_update(L, x, coef)
    np.testing.assert_allclose(
        L_new @ L_new.T, P + coef * jnp.outer(x, x), rtol=1e-4, atol=1e-5
    )


def test_logmatmulexp_matches_dense():
    key1, key2 = random.split(random.PRNGKey(3))
    x = random.normal(key1, (3, 5))
    y = random.normal(key2, (5, 4))
    expect = jnp.log(jnp.exp(x) @ jnp.exp(y))
    np.testing.assert_allclose(logmatmulexp(x, y), expect, rtol=1e-5)


def test_safe_normalize_at_zero():
    v = safe_normalize(jnp.zeros(3))
    assert np.all(np.isfinite(v))
    g = grad(lambda x: safe_normalize(x).sum())(jnp.zeros(3))
    assert np.all(np.isfinite(g))
    u = safe_normalize(jnp.array([3.0, 4.0]))
    np.testing.assert_allclose(jnp.linalg.norm(u), 1.0, rtol=1e-6)


# ---------------------------------------------------------- special functions


def test_multigammaln_vs_scipy():
    for d in (1, 2, 4):
        a = 3.7
        np.testing.assert_allclose(
            multigammaln(jnp.asarray(a), d), osp.multigammaln(a, d), rtol=1e-5
        )


def test_betainc_and_inverse():
    a, b = 2.5, 1.7
    x = jnp.linspace(0.05, 0.95, 7)
    y = betainc(a, b, x)
    np.testing.assert_allclose(y, osp.betainc(a, b, np.asarray(x)), rtol=1e-5)
    x_back = betaincinv(a, b, y)
    np.testing.assert_allclose(x_back, x, rtol=1e-4, atol=1e-5)


def test_gammaincinv_roundtrip():
    a = 3.0
    q = jnp.array([0.1, 0.5, 0.9])
    x = gammaincinv(a, q)
    np.testing.assert_allclose(
        x, osp.gammaincinv(a, np.asarray(q)), rtol=1e-4, atol=1e-5
    )


def test_probs_logits_roundtrip():
    p = jnp.array([0.2, 0.5, 0.3])
    np.testing.assert_allclose(logits_to_probs(probs_to_logits(p)), p, rtol=1e-5)
    pb = jnp.array(0.73)
    np.testing.assert_allclose(
        logits_to_probs(probs_to_logits(pb, is_binary=True), is_binary=True),
        pb,
        rtol=1e-5,
    )


def test_clamp_probs_keeps_gradient_finite():
    g = grad(lambda p: jnp.log(clamp_probs(p)))(0.0)
    assert np.isfinite(g)
    assert clamp_probs(jnp.array(0.0)) > 0
    assert clamp_probs(jnp.array(1.0)) < 1


def test_bce_with_logits_matches_softplus():
    x = jnp.array([-3.0, 0.0, 4.0])
    y = jnp.array([0.0, 1.0, 1.0])
    expect = -(y * jnp.log(1 / (1 + jnp.exp(-x))) + (1 - y) * jnp.log(1 - 1 / (1 + jnp.exp(-x))))
    np.testing.assert_allclose(
        binary_cross_entropy_with_logits(x, y), expect, rtol=1e-5
    )


# ------------------------------------------------------------ batched samplers


def test_binomial_moments():
    n, p = 17, 0.32
    draws = binomial(random.PRNGKey(0), p, n, shape=(20000,))
    assert draws.min() >= 0 and draws.max() <= n
    np.testing.assert_allclose(np.mean(draws), n * p, rtol=0.03)
    np.testing.assert_allclose(np.var(draws), n * p * (1 - p), rtol=0.08)


def test_binomial_large_n_btrs_path():
    # n*p >= 10 exercises the BTRS rejection sampler
    n, p = 400, 0.45
    draws = binomial(random.PRNGKey(1), p, n, shape=(20000,))
    np.testing.assert_allclose(np.mean(draws), n * p, rtol=0.02)
    np.testing.assert_allclose(np.std(draws), np.sqrt(n * p * (1 - p)), rtol=0.05)


def test_binomial_vmap_and_jit():
    ps = jnp.array([0.1, 0.5, 0.9])
    out = jit(vmap(lambda p: binomial(random.PRNGKey(2), p, 10, shape=(100,))))(ps)
    assert out.shape == (3, 100)
    np.testing.assert_allclose(out.mean(-1), 10 * ps, atol=1.0)


def test_categorical_frequencies():
    p = jnp.array([0.1, 0.6, 0.3])
    draws = categorical(random.PRNGKey(3), p, shape=(30000,))
    freq = np.bincount(np.asarray(draws), minlength=3) / 30000
    np.testing.assert_allclose(freq, p, atol=0.015)


def test_multinomial_counts():
    p = jnp.array([0.2, 0.3, 0.5])
    n = 50
    draws = multinomial(random.PRNGKey(4), p, n, shape=(5000,))
    assert draws.shape == (5000, 3)
    np.testing.assert_array_equal(draws.sum(-1), n)
    np.testing.assert_allclose(draws.mean(0), n * p, rtol=0.05)


def test_multinomial_heterogeneous_counts():
    p = jnp.array([0.5, 0.5])
    n = jnp.array([3, 10])
    draws = multinomial(random.PRNGKey(5), p, n, total_count_max=10)
    np.testing.assert_array_equal(draws.sum(-1), n)


def test_von_mises_centered_ks():
    kappa = 2.5
    draws = von_mises_centered(
        random.PRNGKey(6), jnp.full((20000,), kappa), dtype=jnp.float32
    )
    assert np.all(np.abs(draws) <= np.pi + 1e-6)
    _, pval = ss.kstest(np.asarray(draws), ss.vonmises(kappa).cdf)
    assert pval > 0.01


def test_von_mises_centered_small_kappa():
    draws = von_mises_centered(
        random.PRNGKey(7), jnp.full((8000,), 1e-3), dtype=jnp.float32
    )
    # nearly uniform on the circle
    _, pval = ss.kstest(np.asarray(draws), ss.uniform(-np.pi, 2 * np.pi).cdf)
    assert pval > 0.01


def test_binomial_inside_scan_is_traceable():
    def body(carry, _):
        key, tot = carry
        key, sub = random.split(key)
        tot = tot + binomial(sub, 0.5, 10, shape=())
        return (key, tot), None

    (key, tot), _ = lax.scan(body, (random.PRNGKey(8), jnp.asarray(0)), None, length=5)
    assert 0 <= int(tot) <= 50
