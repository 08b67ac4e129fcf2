"""JAX utility shims (pattern: reference test/test_util.py)."""

import numpy as np

import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu import handlers
from numpyro_tpu.util import fori_collect, format_shapes, soft_vmap


def test_fori_collect_thinning_and_lower():
    def body(x):
        return x + 1

    out = fori_collect(2, 10, body, jnp.asarray(0), progbar=False)
    np.testing.assert_array_equal(np.asarray(out), np.arange(3, 11))

    out = fori_collect(2, 10, body, jnp.asarray(0), thinning=2, progbar=False)
    np.testing.assert_array_equal(np.asarray(out), [4, 6, 8, 10])

    out, last = fori_collect(
        0, 5, body, jnp.asarray(0), return_last_val=True, progbar=False
    )
    assert int(last) == 5 and np.asarray(out).shape == (5,)


def test_soft_vmap_chunked_matches_vmap():
    xs = {"a": jnp.arange(10.0).reshape(10, 1), "b": jnp.arange(10.0)}

    def fn(x):
        return x["a"].sum() * x["b"]

    full = soft_vmap(fn, xs)
    chunked = soft_vmap(fn, xs, chunk_size=3)
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked))
    assert np.asarray(chunked).shape == (10,)


def test_soft_vmap_multi_batch_dims():
    xs = jnp.arange(12.0).reshape(3, 4)
    ys = soft_vmap(lambda x: x * 2, xs, batch_ndims=2)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(xs) * 2)


def test_format_shapes():
    def model(x):
        w = numpyro_tpu.sample("w", dist.Normal(jnp.zeros(3), 1.0).to_event(1))
        with numpyro_tpu.plate("N", x.shape[0]):
            numpyro_tpu.sample("obs", dist.Normal(x @ w, 1.0), obs=jnp.zeros(5))

    x = jnp.ones((5, 3))
    tr = handlers.trace(handlers.seed(model, random.PRNGKey(0))).get_trace(x)
    out = format_shapes(tr)
    assert "Trace Shapes:" in out and "w dist" in out and "obs dist" in out
    out_lp = format_shapes(tr, compute_log_prob=True)
    assert "log_prob" in out_lp
