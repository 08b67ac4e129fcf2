"""Lotka-Volterra predator-prey: NUTS through an ODE solver
(reference: examples/ode.py, using jax.experimental.ode.odeint so the
adjoint ride-along is pure XLA)."""

import argparse

import numpy as np

import jax.numpy as jnp
from jax import random
from jax.experimental.ode import odeint

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.infer import MCMC, NUTS


def dz_dt(z, t, theta):
    u, v = z
    alpha, beta, gamma, delta = theta
    du = (alpha - beta * v) * u
    dv = (-gamma + delta * u) * v
    return jnp.stack([du, dv])


def model(ts, y_init, y=None):
    theta = numpyro_tpu.sample(
        "theta",
        dist.TruncatedNormal(
            low=0.0,
            loc=jnp.array([1.0, 0.05, 1.0, 0.05]),
            scale=jnp.array([0.5, 0.05, 0.5, 0.05]),
        ).to_event(1),
    )
    z = odeint(dz_dt, y_init, ts, theta, rtol=1e-6, atol=1e-5, mxstep=1000)
    sigma = numpyro_tpu.sample("sigma", dist.LogNormal(-1, 1).expand([2]).to_event(1))
    numpyro_tpu.sample("y", dist.LogNormal(jnp.log(z), sigma).to_event(2), obs=y)


def main(args):
    ts = jnp.linspace(0.0, args.t_max, args.num_obs)
    true_theta = jnp.array([1.0, 0.08, 1.2, 0.07])
    z = odeint(dz_dt, jnp.array([10.0, 5.0]), ts, true_theta)
    y = z * jnp.exp(0.1 * random.normal(random.PRNGKey(0), z.shape))
    mcmc = MCMC(
        NUTS(model, dense_mass=True),
        num_warmup=args.num_warmup,
        num_samples=args.num_samples,
        progress_bar=False,
    )
    mcmc.run(random.PRNGKey(1), ts, jnp.array([10.0, 5.0]), y)
    theta_hat = np.asarray(mcmc.get_samples()["theta"]).mean(0)
    print("theta_hat:", np.round(theta_hat, 3), " truth:", np.asarray(true_theta))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--t-max", type=float, default=20.0)
    p.add_argument("--num-obs", type=int, default=40)
    p.add_argument("--num-warmup", type=int, default=300)
    p.add_argument("--num-samples", type=int, default=300)
    main(p.parse_args())
