"""Goodness-of-fit tests checking agreement between a distribution's
``sample`` and ``log_prob`` (reference surface:
numpyro/distributions/gof.py:1-367, itself a port of the public
``goftests`` library).  The returned p-value is Uniform(0,1) for good
sampler/density pairs; test suites assert ``gof > TEST_FAILURE_RATE``.

Host-side NumPy/scipy — these run in the test harness, not on device.
"""

from __future__ import annotations

import math
import warnings

import numpy as np

import jax

__all__ = [
    "InvalidTest",
    "auto_goodness_of_fit",
    "density_goodness_of_fit",
    "exp_goodness_of_fit",
    "multinomial_goodness_of_fit",
    "unif01_goodness_of_fit",
    "vector_density_goodness_of_fit",
]

HISTOGRAM_WIDTH = 60


class InvalidTest(ValueError):
    pass


def print_histogram(probs, counts):
    max_count = max(counts)
    print("{: >8} {: >8}".format("Prob", "Count"))
    for prob, count in sorted(zip(probs, counts), reverse=True):
        width = int(round(HISTOGRAM_WIDTH * count / max_count))
        print("{: >8.3f} {: >8d} {}".format(prob, count, "-" * width))


def _chi2sf(chi_squared, dof):
    from scipy.stats import chi2

    return float(chi2.sf(chi_squared, dof))


def multinomial_goodness_of_fit(probs, counts, *, total_count=None, plot=False):
    """Pearson chi^2 on possibly-truncated multinomial data; returns the
    survival probability (p-value)."""
    probs = np.asarray(jax.lax.stop_gradient(probs))
    counts = np.asarray(counts)
    assert probs.ndim == 1 and probs.shape == counts.shape
    if total_count is None:
        truncated = False
        total_count = int(counts.sum())
    else:
        truncated = True
        assert total_count >= counts.sum()
    if plot:
        print_histogram(probs, counts)
    chi_squared = 0.0
    dof = 0
    for p, c in zip(probs.tolist(), counts.tolist()):
        if abs(p - 1) < 1e-8:
            return 1.0 if c == total_count else 0.0
        assert p < 1, f"bad probability: {p:g}"
        if p > 0:
            mean = total_count * p
            variance = total_count * p * (1 - p)
            if not (variance > 1):
                raise InvalidTest("Goodness of fit is inaccurate; use more samples")
            chi_squared += (c - mean) ** 2 / variance
            dof += 1
        else:
            warnings.warn("Zero probability in goodness-of-fit test", stacklevel=2)
            if c > 0:
                return math.inf
    if not truncated:
        dof -= 1
    return _chi2sf(chi_squared, dof)


def unif01_goodness_of_fit(samples, *, plot=False):
    """Bin Uniform(0,1) samples, Pearson chi^2 on the bins."""
    samples = np.asarray(jax.lax.stop_gradient(samples))
    assert samples.min() >= 0
    assert samples.max() <= 1
    bin_count = int(round(len(samples) ** 0.333))
    if bin_count < 7:
        raise InvalidTest("imprecise test, use more samples")
    probs = np.ones(bin_count) / bin_count
    binned = np.clip((samples * bin_count).astype(int), 0, bin_count - 1)
    counts = np.bincount(binned, minlength=bin_count)
    return multinomial_goodness_of_fit(probs, counts, plot=plot)


def exp_goodness_of_fit(samples, plot=False):
    """Exponential(1) samples -> Uniform(0,1) via the cdf complement."""
    samples = np.asarray(jax.lax.stop_gradient(samples))
    return unif01_goodness_of_fit(np.exp(-samples), plot=plot)


def density_goodness_of_fit(samples, probs, plot=False):
    """1D continuous samples + their densities -> gap statistics that are
    Exponential(1) under the null."""
    samples = np.asarray(jax.lax.stop_gradient(samples))
    probs = np.asarray(jax.lax.stop_gradient(probs))
    assert samples.shape == probs.shape
    if len(samples) <= 100:
        raise InvalidTest("imprecision; use more samples")
    index = np.argsort(samples, 0, kind="stable")
    samples = samples[index]
    probs = probs[index]
    gaps = samples[1:] - samples[:-1]
    sparsity = 1 / probs
    sparsity = 0.5 * (sparsity[1:] + sparsity[:-1])
    density = len(samples) / sparsity
    return exp_goodness_of_fit(density * gaps, plot=plot)


def volume_of_sphere(dim, radius):
    return radius**dim * math.pi ** (0.5 * dim) / math.gamma(0.5 * dim + 1)


def get_nearest_neighbor_distances(samples):
    try:
        from scipy.spatial import cKDTree

        distances, _ = cKDTree(samples).query(samples, k=2)
        return distances[:, 1]
    except ImportError:  # pragma: no cover
        x = samples
        x2 = (x * x).sum(-1)
        d2 = x2[:, None] + x2 - 2 * x @ x.T
        min_d2 = np.partition(d2, 1)[:, 1]
        return np.sqrt(np.clip(min_d2, 0, None))


def vector_density_goodness_of_fit(samples, probs, *, dim=None, plot=False):
    """Multivariate samples -> nearest-neighbor-ball statistics that are
    Exponential(1) under the null (Bickel & Breiman 1983)."""
    samples = np.asarray(jax.lax.stop_gradient(samples))
    probs = np.asarray(jax.lax.stop_gradient(probs))
    assert samples.shape and len(samples)
    assert probs.shape == samples.shape[:1]
    if dim is None:
        dim = samples.shape[-1]
    assert dim
    if len(samples) <= 1000 * dim:
        raise InvalidTest("imprecision; use more samples")
    radii = get_nearest_neighbor_distances(samples)
    density = len(samples) * probs
    volume = volume_of_sphere(dim, radii)
    return exp_goodness_of_fit(density * volume, plot=plot)


def auto_goodness_of_fit(samples, probs, *, dim=None, plot=False):
    """Dispatch to the 1D or multivariate density GoF test."""
    samples = np.asarray(jax.lax.stop_gradient(samples))
    probs = np.asarray(jax.lax.stop_gradient(probs))
    assert samples.shape and samples.shape[0]
    assert probs.shape == samples.shape[:1]
    samples = samples.reshape(samples.shape[0], -1)
    ambient_dim = samples[:1].size
    if dim is None:
        dim = ambient_dim
    if ambient_dim == 0:
        return 1.0
    if ambient_dim == 1:
        return density_goodness_of_fit(samples.reshape(-1), probs, plot=plot)
    return vector_density_goodness_of_fit(samples, probs, dim=dim, plot=plot)
