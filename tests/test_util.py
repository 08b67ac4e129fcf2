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


def test_mcmc_phase_timers_and_profiler_trace(tmp_path):
    """SURVEY §5 aux subsystems: per-phase wall timers + jax.profiler hook."""
    import os

    from numpyro_tpu.infer import MCMC, NUTS
    from numpyro_tpu.util import profiler_trace

    def model(x):
        mu = numpyro_tpu.sample("mu", dist.Normal(0.0, 5.0))
        with numpyro_tpu.plate("N", x.shape[0]):
            numpyro_tpu.sample("x", dist.Normal(mu, 1.0), obs=x)

    x = jnp.ones(20)
    m = MCMC(NUTS(model), num_warmup=20, num_samples=20, progress_bar=False)
    m.warmup(random.PRNGKey(0), x)
    m.run(random.PRNGKey(1), x)
    assert m.last_run_stats["warmup_s"] > 0
    assert m.last_run_stats["sample_s"] > 0

    with profiler_trace(str(tmp_path)):
        m.run(random.PRNGKey(2), x)
    assert len(os.listdir(str(tmp_path))) > 0


def test_step_chunking_gated_to_tunneled_backends(monkeypatch):
    """Host-driven step chunking (a per-chunk device sync) must default ON
    only when the tunneled TPU runtime is detected; local backends run one
    program per phase (ADVICE r4: the sync is pure latency on GPUs /
    locally-attached TPUs)."""
    import jax

    import numpyro_tpu as npt
    import numpyro_tpu.infer.mcmc as mcmc_mod
    from numpyro_tpu.infer import MCMC, NUTS
    from numpyro_tpu.util import tunneled_tpu_backend

    # this environment ships the axon tunnel package on TPU PYTHONPATH
    # only; under the CPU test profile the detection must be stable and
    # the fori_collect chunk default must follow it
    detected = tunneled_tpu_backend()
    monkeypatch.delenv("NUMPYRO_TPU_STEP_CHUNK", raising=False)

    calls = {}
    orig = mcmc_mod.fori_collect

    def spy(*args, **kwargs):
        calls["chunk_size"] = kwargs.get("chunk_size")
        return orig(*args, **kwargs)

    monkeypatch.setattr(mcmc_mod, "fori_collect", spy)

    def model():
        npt.sample("x", dist.Normal(0.0, 1.0))

    m = MCMC(NUTS(model), num_warmup=10, num_samples=10, progress_bar=False)
    # force the generic (non-fused) path so the spy sees the call
    monkeypatch.setattr(m, "_can_fuse", lambda *a, **k: False)
    m.run(random.PRNGKey(0))
    if jax.default_backend() == "cpu":
        # chunking never applies on CPU regardless of detection
        assert calls["chunk_size"] is None
    elif detected:
        assert calls["chunk_size"] == 5
    else:
        assert calls["chunk_size"] is None

    # env var override forces chunking on any backend (except cpu)
    monkeypatch.setenv("NUMPYRO_TPU_STEP_CHUNK", "7")
    m2 = MCMC(NUTS(model), num_warmup=5, num_samples=5, progress_bar=False)
    monkeypatch.setattr(m2, "_can_fuse", lambda *a, **k: False)
    m2.run(random.PRNGKey(1))
    expect = None if jax.default_backend() == "cpu" else 7
    assert calls["chunk_size"] == expect
