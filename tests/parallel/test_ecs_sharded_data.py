"""Sharded-data x HMCECS: the north-star combination (SURVEY §7 hard part
(c), §2.8 P6; reference pattern numpyro/infer/mcmc.py:239-265).

The observation matrix is sharded over the "data" mesh axis while the chain
axis is sharded over "chains".  Each chain's subsample gather runs against
the row-sharded matrix: the GSPMD partitioner lowers it to a LOCAL masked
gather + all-reduce of the block log-likelihood — it must NOT all-gather the
data (that would replicate X per device and defeat the sharding).

Asserts:
  1. the jitted HMCECS step compiles and executes with X/y sharded over
     "data" on a (chains=4, data=2) mesh of 8 virtual CPU devices;
  2. the sharded and replicated paths agree bitwise;
  3. the compiled program contains NO all-gather.
"""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import random
from jax.sharding import NamedSharding, PartitionSpec as P

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.infer import HMCECS, NUTS
from numpyro_tpu.parallel import chain_data_mesh

NUM_CHAINS, N, D, SUB = 8, 64, 4, 16


def _ecs_model(X, y):
    w = numpyro_tpu.sample("w", dist.Normal(jnp.zeros(D), 1.0).to_event(1))
    with numpyro_tpu.plate("N", X.shape[0], subsample_size=SUB):
        xb = numpyro_tpu.subsample(X, event_dim=1)
        yb = numpyro_tpu.subsample(y, event_dim=0)
        numpyro_tpu.sample("y", dist.Bernoulli(logits=xb @ w), obs=yb)


@pytest.fixture(scope="module")
def setup():
    if jax.local_device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = chain_data_mesh(num_chain_shards=4, num_data_shards=2)
    key = random.PRNGKey(0)
    X = random.normal(key, (N, D))
    true_w = jnp.linspace(-1.0, 1.0, D)
    y = dist.Bernoulli(logits=X @ true_w).sample(random.PRNGKey(1))
    y = y.astype(jnp.float32)

    chain_sharding = NamedSharding(mesh, P("chains"))
    replicated = NamedSharding(mesh, P())
    data_sharding = NamedSharding(mesh, P("data"))

    def shard_state_leaf(x):
        if jnp.ndim(x) >= 1 and jnp.shape(x)[0] == NUM_CHAINS:
            return jax.device_put(x, chain_sharding)
        return jax.device_put(x, replicated)

    ecs = HMCECS(NUTS(_ecs_model, max_tree_depth=4), num_blocks=4)
    keys = random.split(random.PRNGKey(5), NUM_CHAINS)
    X_rep = jax.device_put(X, replicated)
    y_rep = jax.device_put(y, replicated)
    state = ecs.init(keys, 2, None, model_args=(X_rep, y_rep), model_kwargs={})
    state = jax.tree.map(shard_state_leaf, state)
    X_sh = jax.device_put(X, data_sharding)
    y_sh = jax.device_put(y, data_sharding)
    return ecs, state, (X_rep, y_rep), (X_sh, y_sh)


def test_sharded_data_matches_replicated_bitwise(setup):
    ecs, state, (X_rep, y_rep), (X_sh, y_sh) = setup
    step = jax.jit(lambda s, X, y: ecs.sample(s, (X, y), {}))
    out_rep = jax.block_until_ready(step(state, X_rep, y_rep))
    out_sh = jax.block_until_ready(step(state, X_sh, y_sh))
    np.testing.assert_array_equal(
        np.asarray(out_rep.hmc_state.z["w"]), np.asarray(out_sh.hmc_state.z["w"])
    )
    np.testing.assert_array_equal(
        np.asarray(out_rep.hmc_state.potential_energy),
        np.asarray(out_sh.hmc_state.potential_energy),
    )
    # the padded gather must also keep the subsample index panels identical
    np.testing.assert_array_equal(
        np.asarray(out_rep.z["N"]), np.asarray(out_sh.z["N"])
    )


def test_sharded_gather_emits_no_all_gather(setup):
    ecs, state, _, (X_sh, y_sh) = setup
    lowered = jax.jit(lambda s, X, y: ecs.sample(s, (X, y), {})).lower(
        state, X_sh, y_sh
    )
    hlo = lowered.compile().as_text()
    assert len(re.findall(r"all-gather", hlo)) == 0, (
        "sharded-data HMCECS step must not all-gather the data matrix"
    )
    # the block log-lik reduction over the data axis must be a psum
    assert len(re.findall(r"all-reduce", hlo)) > 0
