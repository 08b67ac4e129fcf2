"""Nested sampling on the classic two-Gaussian-shells likelihood
(role parity: reference examples/gaussian_shells.py, which drives jaxns; this
drives the native batched NestedSampler in numpyro_tpu.contrib).

The target is a uniform prior on [-6, 6]^2 with a likelihood concentrated on
two thin rings — heavily multimodal, the standard stress test where nested
sampling shines over HMC.  The sampler returns both the evidence logZ and
equal-weight posterior draws covering BOTH shells.
"""

import argparse

import numpy as np

import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.contrib.nested_sampling import NestedSampler


def shell_logpdf(x, loc, radius, width):
    """Ring of radius `radius` and thickness `width` centered at `loc`."""
    r = jnp.linalg.norm(x - loc, axis=-1)
    return -0.5 * ((r - radius) / width) ** 2 - jnp.log(
        jnp.sqrt(2 * jnp.pi) * width
    )


def model(center1, center2, radius, width):
    x = numpyro_tpu.sample(
        "x", dist.Uniform(-6.0, 6.0).expand([2]).to_event(1)
    )
    lik = jnp.logaddexp(
        shell_logpdf(x, center1, radius, width),
        shell_logpdf(x, center2, radius, width),
    )
    numpyro_tpu.factor("shells", lik)


def main(args):
    center1 = jnp.array([-3.5, 0.0])
    center2 = jnp.array([3.5, 0.0])
    radius, width = 2.0, 0.1

    ns = NestedSampler(
        model,
        constructor_kwargs={
            "num_live_points": args.num_live,
            "max_samples": args.max_samples,
        },
    )
    ns.run(random.PRNGKey(args.seed), center1, center2, radius, width)
    ns.print_summary()

    res = ns.diagnostics()
    samples = ns.get_samples(random.PRNGKey(1), args.num_draws)["x"]
    samples = np.asarray(samples)
    # both shells must be populated roughly evenly
    left = (samples[:, 0] < 0).mean()
    print(f"draws in left shell: {left:.2%} (expect ~50%)")
    dist_to_ring = np.minimum(
        np.abs(np.linalg.norm(samples - np.asarray(center1), axis=-1) - radius),
        np.abs(np.linalg.norm(samples - np.asarray(center2), axis=-1) - radius),
    )
    print(f"median |distance to nearest ring|: {np.median(dist_to_ring):.3f}")
    assert 0.2 < left < 0.8, "nested sampler lost one of the modes"
    assert np.median(dist_to_ring) < 3 * width
    return float(res.log_Z)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Gaussian shells (nested sampling)")
    parser.add_argument("--num-live", type=int, default=500)
    parser.add_argument("--max-samples", type=int, default=20000)
    parser.add_argument("--num-draws", type=int, default=2000)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    main(args)
