"""Fused GLM log-likelihood op (CPU/XLA fallback path;
the Pallas path is exercised on TPU by bench.py and verify runs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.infer import MCMC, NUTS
from numpyro_tpu.ops.glm import bernoulli_logits_loglik, prepare_glm_data


def test_matches_direct_loglik_and_grad():
    N, D, C = 5000, 7, 5
    kx, kw, ky = random.split(random.PRNGKey(0), 3)
    X = random.normal(kx, (N, D))
    W = random.normal(kw, (C, D)) * 0.3
    y = (random.uniform(ky, (N,)) < 0.5).astype(jnp.float32)
    data = prepare_glm_data(X, y)

    def ref_ll(w):
        logits = X @ w
        return -jnp.sum(jax.nn.softplus(logits) - y * logits)

    ll_ref = jax.vmap(ref_ll)(W)
    g_ref = jax.vmap(jax.grad(ref_ll))(W)
    f = jax.jit(
        jax.vmap(jax.value_and_grad(bernoulli_logits_loglik), in_axes=(0, None))
    )
    ll, g = f(W, data)
    np.testing.assert_allclose(ll, ll_ref, rtol=1e-5)
    np.testing.assert_allclose(g, g_ref, rtol=1e-3, atol=1e-3)
    # single-chain (unbatched) path
    ll1, g1 = jax.value_and_grad(bernoulli_logits_loglik)(W[0], data)
    np.testing.assert_allclose(ll1, ll_ref[0], rtol=1e-5)
    np.testing.assert_allclose(g1, g_ref[0], rtol=1e-3, atol=1e-3)


def test_split_mode_matches_bf16_design_model():
    """dtype="split" defines the model on the bf16-quantized design matrix
    exactly: the fallback/XLA path must match a direct f32 computation on
    that quantized matrix (the Pallas path differs only by ~1e-5-relative
    residual splitting, exercised on TPU by bench/verify runs)."""
    N, D, C = 5000, 7, 5
    kx, kw, ky = random.split(random.PRNGKey(0), 3)
    X = random.normal(kx, (N, D))
    W = random.normal(kw, (C, D)) * 0.3
    y = (random.uniform(ky, (N,)) < 0.5).astype(jnp.float32)
    data = prepare_glm_data(X, y, dtype="split")
    assert data.x_t.dtype == jnp.bfloat16

    Xq = X.astype(jnp.bfloat16).astype(jnp.float32)

    def ref_ll(w):
        logits = Xq @ w
        return -jnp.sum(jax.nn.softplus(logits) - y * logits)

    ll_ref = jax.vmap(ref_ll)(W)
    g_ref = jax.vmap(jax.grad(ref_ll))(W)
    f = jax.jit(
        jax.vmap(jax.value_and_grad(bernoulli_logits_loglik), in_axes=(0, None))
    )
    ll, g = f(W, data)
    np.testing.assert_allclose(ll, ll_ref, rtol=1e-5)
    np.testing.assert_allclose(g, g_ref, rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_fused_model_matches_plain_posterior():
    N, D, C = 2000, 6, 4
    kx, ky = random.split(random.PRNGKey(0), 2)
    X = random.normal(kx, (N, D))
    true_w = jnp.linspace(-1, 1, D)
    y = dist.Bernoulli(logits=X @ true_w).sample(ky).astype(jnp.float32)
    data = prepare_glm_data(X, y)

    def fused_model(data):
        w = numpyro_tpu.sample("w", dist.Normal(jnp.zeros(D), 1.0).to_event(1))
        numpyro_tpu.factor("lik", bernoulli_logits_loglik(w, data))

    def plain_model(X, y):
        w = numpyro_tpu.sample("w", dist.Normal(jnp.zeros(D), 1.0).to_event(1))
        with numpyro_tpu.plate("N", X.shape[0]):
            numpyro_tpu.sample("y", dist.Bernoulli(logits=X @ w), obs=y)

    m1 = MCMC(
        NUTS(fused_model),
        num_warmup=150,
        num_samples=200,
        num_chains=C,
        chain_method="vectorized",
        progress_bar=False,
    )
    m1.run(random.PRNGKey(1), data)
    m2 = MCMC(
        NUTS(plain_model),
        num_warmup=150,
        num_samples=200,
        num_chains=C,
        chain_method="vectorized",
        progress_bar=False,
    )
    m2.run(random.PRNGKey(1), X, y)
    np.testing.assert_allclose(
        m1.get_samples()["w"].mean(0), m2.get_samples()["w"].mean(0), atol=0.05
    )
    np.testing.assert_allclose(
        m1.get_samples()["w"].std(0), m2.get_samples()["w"].std(0), atol=0.03
    )


def test_split_hi_lo_survives_jit():
    """Regression: the f32->bf16->f32 cast round-trip form of the hi/lo
    split was elided by XLA under jit, zeroing the lo half (round-3 bench
    collapse).  The reduce_precision form must keep lo nonzero and
    hi+lo == w to ~2^-17 relative, identically eager and jitted."""
    from numpyro_tpu.ops.glm import split_hi_lo

    w = random.normal(random.PRNGKey(0), (8, 16)) * 0.5
    hi_e, lo_e = split_hi_lo(w)
    hi_j, lo_j = jax.jit(split_hi_lo)(w)
    np.testing.assert_array_equal(np.asarray(hi_e), np.asarray(hi_j))
    np.testing.assert_array_equal(np.asarray(lo_e), np.asarray(lo_j))
    assert float(jnp.abs(lo_j.astype(jnp.float32)).max()) > 0.0
    recon = hi_j.astype(jnp.float32) + lo_j.astype(jnp.float32)
    np.testing.assert_allclose(
        np.asarray(recon), np.asarray(w), rtol=2**-16, atol=1e-7
    )
