"""Cormack-Jolly-Seber capture-recapture: the latent alive/dead state is
carried through the effectful scan and enumerated out — the scan_enum path
with a per-individual plate (batched chains over individuals)
(reference: examples/capture_recapture.py model_1)."""

import argparse

import numpy as np

import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.contrib.control_flow import scan
from numpyro_tpu.infer import MCMC, NUTS


def cjs(capture_history, first_capture):
    """capture_history: (T, N) 0/1; first_capture: (N,) first-seen time."""
    T, N = capture_history.shape
    phi = numpyro_tpu.sample("phi", dist.Uniform(0.0, 1.0))  # survival
    rho = numpyro_tpu.sample("rho", dist.Uniform(0.0, 1.0))  # detection

    def transition(carry, xs):
        z_prev, t = carry
        y_t, first = xs[0], xs[1]
        with numpyro_tpu.plate("animals", N):
            # an animal stays certainly-alive until first capture
            mask = t <= first
            phi_t = jnp.where(mask, 1.0, phi)
            # clip the certainly-dead branch away from exactly 0 so the
            # eliminated -inf factor cannot poison gradients
            p_alive = jnp.clip(phi_t * z_prev, 1e-6, 1.0 - 1e-6)
            z = numpyro_tpu.sample(
                "z",
                dist.Bernoulli(p_alive),
                infer={"enumerate": "parallel"},
            )
            p_detect = jnp.clip(rho * z, 1e-6, 1.0 - 1e-6)
            with numpyro_tpu.handlers.mask(mask=(t > first)):
                numpyro_tpu.sample("y", dist.Bernoulli(p_detect), obs=y_t)
        return (z, t + 1), None

    z0 = jnp.ones(N, jnp.int32)
    scan(transition, (z0, 0), (capture_history, jnp.broadcast_to(first_capture, (T, N))))


def main(args):
    rng = np.random.RandomState(0)
    T, N = args.num_steps, args.num_animals
    phi_true, rho_true = 0.8, 0.6
    z = np.ones((T, N), int)
    y = np.zeros((T, N), int)
    first = rng.randint(0, T // 2, size=N)
    for t in range(1, T):
        z[t] = rng.binomial(1, phi_true * z[t - 1])
        seen = rng.binomial(1, rho_true * z[t])
        y[t] = np.where(t > first, seen, 0)
    y[first, np.arange(N)] = 1  # first capture
    mcmc = MCMC(
        NUTS(cjs),
        num_warmup=args.num_warmup,
        num_samples=args.num_samples,
        progress_bar=False,
    )
    mcmc.run(random.PRNGKey(0), jnp.asarray(y), jnp.asarray(first))
    s = mcmc.get_samples()
    print(
        f"phi={float(s['phi'].mean()):.2f} (true {phi_true}), "
        f"rho={float(s['rho'].mean()):.2f} (true {rho_true})"
    )


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--num-steps", type=int, default=10)
    p.add_argument("--num-animals", type=int, default=40)
    p.add_argument("--num-warmup", type=int, default=400)
    p.add_argument("--num-samples", type=int, default=400)
    main(p.parse_args())
