"""Multi-host correctness (SURVEY §2.8 / §5): a real 2-process
``jax.distributed`` run on CPU, plus single-process invariance checks that
pin down the properties the distributed design relies on."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.infer import MCMC, NUTS
from numpyro_tpu.parallel.mesh import (
    chain_data_mesh,
    initialize_distributed,
    pooled_step_size,
    shard_chain_state,
    shard_data,
)

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed():
    """Spawn two coordinator-linked processes, each with 4 virtual devices,
    forming one (4, 2) chains×data mesh; chain-axis collectives must cross
    the process boundary and key derivation must agree bit-for-bit."""
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_distributed_worker.py")
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTHONPATH")
    }
    env["PYTHONPATH"] = REPO
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), f"127.0.0.1:{port}"],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        outs.append(out)
    for pid, out in enumerate(outs):
        assert "DISTOK" in out, f"worker {pid} failed:\n{out[-3000:]}"
    digests = [
        line.split()[1]
        for out in outs
        for line in out.splitlines()
        if line.startswith("KEYDIGEST")
    ]
    assert len(digests) == 2 and digests[0] == digests[1], digests


def test_initialize_distributed_single_host_noop():
    # no coordinator configured anywhere -> silently stays single-process
    initialize_distributed()
    assert jax.process_count() == 1


def test_chain_keys_are_layout_invariant():
    """Per-chain key derivation must depend only on (seed, chain_id) — not
    on mesh shape, device count, or process layout (SURVEY hard part (f))."""
    keys = random.split(random.PRNGKey(3), 16)
    mesh_a = chain_data_mesh(num_chain_shards=8, num_data_shards=1)
    mesh_b = chain_data_mesh(num_chain_shards=2, num_data_shards=4)
    sharded_a = shard_chain_state(keys, mesh_a)
    sharded_b = shard_chain_state(keys, mesh_b)
    np.testing.assert_array_equal(np.asarray(sharded_a), np.asarray(sharded_b))
    np.testing.assert_array_equal(np.asarray(sharded_a), np.asarray(keys))


def _toy_model(x, y=None):
    w = numpyro_tpu.sample("w", dist.Normal(0.0, 1.0))
    sigma = numpyro_tpu.sample("sigma", dist.HalfNormal(1.0))
    with numpyro_tpu.plate("N", x.shape[0]):
        numpyro_tpu.sample("y", dist.Normal(w * x, sigma), obs=y)


@pytest.fixture(scope="module")
def toy_data():
    x = jnp.linspace(-2, 2, 64)
    y = 1.5 * x + 0.3 * random.normal(random.PRNGKey(0), x.shape)
    return x, y


def _run_toy(x, y, method, seed=1):
    m = MCMC(
        NUTS(_toy_model),
        num_warmup=150,
        num_samples=200,
        num_chains=8,
        chain_method=method,
        progress_bar=False,
    )
    m.run(random.PRNGKey(seed), x, y)
    return np.asarray(m.get_samples()["w"])


@pytest.mark.slow
def test_sharded_vs_vectorized_same_posterior(toy_data):
    """chain_method='parallel' (GSPMD over 8 devices) must agree with the
    single-device vectorized run.  NUTS is chaotic, so different reduction
    partitionings diverge trajectory-by-trajectory — the contract is
    distributional agreement plus bitwise determinism per layout."""
    x, y = toy_data
    vec = _run_toy(x, y, "vectorized")
    par = _run_toy(x, y, "parallel")
    assert abs(vec.mean() - par.mean()) < 0.02
    assert abs(vec.std() - par.std()) < 0.02
    # same layout, same seed -> bitwise reproducible
    np.testing.assert_array_equal(par, _run_toy(x, y, "parallel"))


def test_mesh_shape_invariant_potential(toy_data):
    """The same sharded computation over (8,1), (4,2), (2,4) meshes must
    agree — layout is a performance choice, never a semantics choice."""
    x, y = toy_data
    state = random.normal(random.PRNGKey(2), (8, 16))

    def f(s, xx):
        return jnp.sum(s**2, axis=-1) + jnp.sum(xx**2)

    results = []
    for rows, cols in ((8, 1), (4, 2), (2, 4)):
        mesh = chain_data_mesh(num_chain_shards=rows, num_data_shards=cols)
        s = shard_chain_state(state, mesh)
        d = shard_data(x, mesh)
        results.append(np.asarray(jax.jit(f)(s, d)))
    np.testing.assert_allclose(results[0], results[1], rtol=1e-6)
    np.testing.assert_allclose(results[0], results[2], rtol=1e-6)


def test_pooled_step_size_helper():
    ss = jnp.array([0.1, 0.2, 0.4, 0.8])
    pooled = pooled_step_size(ss)
    np.testing.assert_allclose(
        float(pooled), 1.0 / np.mean(1.0 / np.asarray(ss)), rtol=1e-6
    )
