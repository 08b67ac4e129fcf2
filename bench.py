"""Benchmark: effective samples / sec / chip, NUTS on covtype-scale logistic
regression (the reference's headline workload, examples/covtype.py).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The dataset is synthetic at the covtype shape (581,012 x 55 + intercept,
Bernoulli logistic regression) — zero-egress environment, and throughput
depends on shape, not values.  The timed section excludes compilation (a
throwaway run triggers it).

TPU-first design measured here (vs the round-1 first recording):
- the likelihood+gradient is ONE fused Pallas pass over X tiles
  (numpyro_tpu/ops/glm.py): X is read from HBM once per leapfrog for ALL
  chains, logits blocks live only in VMEM, true-f32 MXU accumulation.
- hundreds of vectorized NUTS chains amortize the MXU's 128-wide systolic
  array — the chain-massive layout from SURVEY.md §7.

vs_baseline is measured against ROUND1_BASELINE_ESS_PER_SEC, the value this
same benchmark produced with plain-XLA likelihood and 16 chains when first
recorded; the reference repo publishes no numbers (BASELINE.md), so
round-over-round improvement is tracked against our own round-1 measurement.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.diagnostics import effective_sample_size
from numpyro_tpu.infer import MCMC, NUTS
from numpyro_tpu.ops.glm import bernoulli_logits_loglik, prepare_glm_data

# round-1 first recording on this chip (plain XLA likelihood, 16 chains):
# 23.34 ESS/s/chip, sample phase 90.7s / 1600 draws at depth<=7.
ROUND1_BASELINE_ESS_PER_SEC = 23.34

N, D = 581_012, 55
# chain sweep on-chip: 512 -> 980 ESS/s, 768 -> 2239 (twice-confirmed), 1024+
# faults the device through the tunnel.  More chains = more ESS per wall
# second AND shorter depth-5 trajectories after warmup at this batch shape.
NUM_CHAINS = 768
NUM_WARMUP = 100
NUM_SAMPLES = 100
# depth swept on-chip: 7 -> 591 ESS/s, 5 -> 819, 4 -> 739 (coef err 0.0095 at
# all three) — the covtype posterior is well-conditioned after warmup, so
# trajectories longer than 2^5 leapfrog steps buy no extra ESS per unit work.
MAX_TREE_DEPTH = 5


def make_data():
    key = random.PRNGKey(0)
    kx, kw, ky = random.split(key, 3)
    X = random.normal(kx, (N, D - 1))
    X = jnp.concatenate([X, jnp.ones((N, 1))], axis=1)  # intercept column
    true_w = random.normal(kw, (D,)) * 0.5
    y = dist.Bernoulli(logits=X @ true_w).sample(ky)
    return X, y.astype(jnp.float32), true_w


def model(data):
    w = numpyro_tpu.sample("w", dist.Normal(jnp.zeros(D), 1.0).to_event(1))
    numpyro_tpu.factor("lik", bernoulli_logits_loglik(w, data))


def main():
    X, y, true_w = make_data()
    data = prepare_glm_data(X, y)
    jax.block_until_ready(data.x_t)

    kernel = NUTS(model, max_tree_depth=MAX_TREE_DEPTH)
    mcmc = MCMC(
        kernel,
        num_warmup=NUM_WARMUP,
        num_samples=NUM_SAMPLES,
        num_chains=NUM_CHAINS,
        chain_method="vectorized",
        progress_bar=False,
    )

    # warmup phase (also compiles the warmup program)
    t0 = time.time()
    mcmc.warmup(random.PRNGKey(1), data)
    jax.block_until_ready(mcmc.post_warmup_state.z["w"])
    warmup_s = time.time() - t0

    # sampling phase: first run compiles, second run is the timed one
    mcmc.run(random.PRNGKey(2), data)
    jax.block_until_ready(mcmc.get_samples()["w"])
    t0 = time.time()
    mcmc.run(random.PRNGKey(3), data)
    samples = mcmc.get_samples(group_by_chain=True)["w"]
    jax.block_until_ready(samples)
    sample_s = time.time() - t0

    # ESS across all chains, per coefficient; report the median coefficient
    ess = np.asarray(jax.device_get(effective_sample_size(samples)))
    ess_median = float(np.median(ess))
    ess_per_sec = ess_median / sample_s

    # correctness guard: posterior means must recover the generating coefs
    w_err = float(jnp.abs(samples.mean((0, 1)) - true_w).max())

    n_chips = jax.device_count()
    value = ess_per_sec / n_chips

    result = {
        "metric": "effective samples/sec/chip (NUTS, covtype-shape logistic "
        f"regression, {NUM_CHAINS} vectorized chains, fused Pallas likelihood)",
        "value": round(value, 2),
        "unit": "ESS/s/chip",
        "vs_baseline": round(value / ROUND1_BASELINE_ESS_PER_SEC, 3),
        "detail": {
            "warmup_s": round(warmup_s, 2),
            "sample_s": round(sample_s, 2),
            "ess_median": round(ess_median, 1),
            "max_coef_abs_err": round(w_err, 4),
            "num_chains": NUM_CHAINS,
            "num_samples_per_chain": NUM_SAMPLES,
            "data_shape": [N, D],
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
