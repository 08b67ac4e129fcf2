"""Sparse regression with pairwise interactions via the SKIM kernel trick
(Agrawal, Trippe, Huggins, Broderick, "The Kernel Interaction Trick", 2019;
role parity: reference examples/sparse_regression.py — a BASELINE.md
correctness workload).

A quadratic regressor with a sparsity-inducing hierarchical prior is
marginalized analytically into a GP with a structured quadratic kernel, so
NUTS only samples the O(P) kernel hyperparameters.  Active dimensions are
then identified from the posterior of the singleton effects theta_i, each
recovered as a GP conditional at probe points +/- e_i (theorem 5.1 of the
paper).

TPU-first differences from the reference implementation:
- the probe analysis is computed for ALL P dimensions in one batched GP
  conditional per posterior draw (a (2P, N) cross-kernel and one Cholesky
  solve) instead of a per-dimension Python loop;
- solves use Cholesky factorization, never an explicit matrix inverse —
  fewer FLOPs, better conditioning, and triangular solves map onto the MXU.
"""

import argparse

import numpy as np

import jax
import jax.numpy as jnp
from jax import random
from jax.scipy.linalg import cho_factor, cho_solve

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.infer import MCMC, NUTS


def quad_kernel(X, Z, eta1, eta2, c, jitter=1e-4):
    """Kernel of the quadratic-interaction regressor (SKIM eq. 10)."""
    xz = X @ Z.T
    k = 0.5 * eta2**2 * (1.0 + xz) ** 2
    k -= 0.5 * eta2**2 * (X**2) @ (Z**2).T
    k += (eta1**2 - eta2**2) * xz
    k += c**2 - 0.5 * eta2**2
    if X.shape[0] == Z.shape[0] and X is Z:
        k += jitter * jnp.eye(X.shape[0])
    return k


def model(X, Y, hypers):
    S, P, N = hypers["expected_sparsity"], X.shape[1], X.shape[0]

    sigma = numpyro_tpu.sample("sigma", dist.HalfNormal(hypers["alpha3"]))
    phi = sigma * (S / jnp.sqrt(N)) / (P - S)
    eta1 = numpyro_tpu.sample("eta1", dist.HalfCauchy(phi))
    msq = numpyro_tpu.sample(
        "msq", dist.InverseGamma(hypers["alpha1"], hypers["beta1"])
    )
    xisq = numpyro_tpu.sample(
        "xisq", dist.InverseGamma(hypers["alpha2"], hypers["beta2"])
    )
    lam = numpyro_tpu.sample(
        "lambda", dist.HalfCauchy(1.0).expand([P]).to_event(1)
    )

    eta2 = eta1**2 * jnp.sqrt(xisq) / msq
    kappa = jnp.sqrt(msq) * lam / jnp.sqrt(msq + (eta1 * lam) ** 2)

    kX = kappa * X
    k = quad_kernel(kX, kX, eta1, eta2, hypers["c"]) + sigma**2 * jnp.eye(N)
    numpyro_tpu.sample(
        "Y",
        dist.MultivariateNormal(jnp.zeros(N), covariance_matrix=k),
        obs=Y,
    )


def singleton_stats(X, Y, c, sample):
    """Posterior mean/variance of every singleton effect theta_i for ONE
    draw of the hyperparameters — all P dimensions in one GP conditional."""
    P, N = X.shape[1], X.shape[0]
    eta1, msq, xisq = sample["eta1"], sample["msq"], sample["xisq"]
    lam, sigma = sample["lambda"], sample["sigma"]

    eta2 = eta1**2 * jnp.sqrt(xisq) / msq
    kappa = jnp.sqrt(msq) * lam / jnp.sqrt(msq + (eta1 * lam) ** 2)

    # probes +/- e_i for every dimension, stacked: (2P, P)
    eye = jnp.eye(P)
    probes = jnp.concatenate([eye, -eye], axis=0)

    kX = kappa * X
    kprobe = kappa * probes
    k_xx = quad_kernel(kX, kX, eta1, eta2, c) + sigma**2 * jnp.eye(N)
    chol = cho_factor(k_xx, lower=True)
    k_px = quad_kernel(kprobe, kX, eta1, eta2, c)  # (2P, N)

    mean_at_probes = k_px @ cho_solve(chol, Y)  # (2P,)
    mu = 0.5 * (mean_at_probes[:P] - mean_at_probes[P:])

    # theta_i variance: v^T Sigma_i v for the per-dim 2x2 posterior block
    k_pp = quad_kernel(kprobe, kprobe, eta1, eta2, c)
    cov = k_pp - k_px @ cho_solve(chol, k_px.T)  # (2P, 2P)
    var = 0.25 * (
        jnp.diagonal(cov)[:P]
        + jnp.diagonal(cov)[P:]
        - 2.0 * jnp.diagonal(cov[:P, P:])
    )
    return mu, var


def get_data(N, P, S, sigma_obs=0.05, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.randn(N, P)
    W = 0.5 + 2.5 * rng.rand(S)  # active singleton weights
    Y = X[:, :S] @ W + W[0] * X[:, 0] * X[:, 1] + sigma_obs * rng.randn(N)
    Y -= Y.mean()
    return jnp.asarray(X), jnp.asarray(Y / Y.std()), W / Y.std()


def main(args):
    X, Y, expected = get_data(args.num_data, args.num_dims, args.active_dims)
    hypers = {
        "expected_sparsity": max(1.0, args.num_dims / 10),
        "alpha1": 3.0, "beta1": 1.0,
        "alpha2": 3.0, "beta2": 1.0,
        "alpha3": 1.0, "c": 1.0,
    }
    mcmc = MCMC(
        NUTS(model, max_tree_depth=args.max_tree_depth),
        num_warmup=args.num_warmup,
        num_samples=args.num_samples,
        num_chains=args.num_chains,
        progress_bar=False,
    )
    mcmc.run(random.PRNGKey(args.seed), X, Y, hypers)
    mcmc.print_summary(exclude_deterministic=True)
    samples = mcmc.get_samples()

    # posterior of each singleton effect, averaged over hyperparameter draws
    # (mixture-of-Gaussians moments), batched over draws with vmap
    mus, variances = jax.vmap(
        lambda s: singleton_stats(X, Y, hypers["c"], s)
    )(samples)
    mean = jnp.mean(mus, 0)
    std = jnp.sqrt(jnp.mean(variances + mus**2, 0) - mean**2)
    active = np.where(np.abs(np.asarray(mean)) > 3 * np.asarray(std))[0]
    print("identified active dimensions:", active.tolist())
    for i in active:
        print(
            f"  theta[{i}] = {float(mean[i]):+.3f} +/- {float(std[i]):.3f}"
        )
    return active


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="SKIM sparse regression")
    parser.add_argument("--num-data", type=int, default=100)
    parser.add_argument("--num-dims", type=int, default=20)
    parser.add_argument("--active-dims", type=int, default=3)
    parser.add_argument("--num-warmup", type=int, default=500)
    parser.add_argument("--num-samples", type=int, default=500)
    parser.add_argument("--num-chains", type=int, default=1)
    parser.add_argument("--max-tree-depth", type=int, default=7)
    parser.add_argument("--seed", type=int, default=0)
    main(parser.parse_args())
