"""UCB admissions: binomial GLMM with department varying intercepts and a
posterior-predictive check (reference: examples/ucbadmit.py)."""

import argparse

import numpy as np

import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.infer import MCMC, NUTS, Predictive

# the classic 12-row table: dept, male, applications, admits
DATA = np.array([
    [0, 1, 825, 512], [0, 0, 108, 89], [1, 1, 560, 353], [1, 0, 25, 17],
    [2, 1, 325, 120], [2, 0, 593, 202], [3, 1, 417, 138], [3, 0, 375, 131],
    [4, 1, 191, 53], [4, 0, 393, 94], [5, 1, 373, 22], [5, 0, 341, 24],
])


def model(dept, male, applications, admit=None):
    sigma = numpyro_tpu.sample("sigma", dist.HalfNormal(1.0))
    with numpyro_tpu.plate("dept", 6):
        a_dept = numpyro_tpu.sample("a_dept", dist.Normal(0.0, sigma))
    a = numpyro_tpu.sample("a", dist.Normal(0.0, 2.0))
    bm = numpyro_tpu.sample("bm", dist.Normal(0.0, 1.0))
    logits = a + a_dept[dept] + bm * male
    with numpyro_tpu.plate("obs", dept.shape[0]):
        numpyro_tpu.sample(
            "admit", dist.Binomial(applications, logits=logits), obs=admit
        )


def main(args):
    dept = jnp.asarray(DATA[:, 0].astype(np.int32))
    male = jnp.asarray(DATA[:, 1].astype(np.float32))
    apps = jnp.asarray(DATA[:, 2].astype(np.float32))
    admit = jnp.asarray(DATA[:, 3].astype(np.float32))
    mcmc = MCMC(
        NUTS(model),
        num_warmup=args.num_warmup,
        num_samples=args.num_samples,
        progress_bar=False,
    )
    mcmc.run(random.PRNGKey(0), dept, male, apps, admit)
    pred = Predictive(model, mcmc.get_samples())(
        random.PRNGKey(1), dept, male, apps
    )["admit"]
    rate_pred = np.asarray(pred).mean(0) / np.asarray(apps)
    rate_obs = np.asarray(admit) / np.asarray(apps)
    print("mean |predicted - observed admit rate|:",
          round(float(np.abs(rate_pred - rate_obs).mean()), 3))
    print("gender effect bm:",
          round(float(np.asarray(mcmc.get_samples()['bm']).mean()), 3))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--num-warmup", type=int, default=500)
    p.add_argument("--num-samples", type=int, default=500)
    main(p.parse_args())
