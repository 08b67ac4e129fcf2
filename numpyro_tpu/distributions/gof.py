"""Goodness-of-fit checks for sampler/density agreement.

Role parity: numpyro/distributions/gof.py (after the public ``goftests``
library; Bickel & Breiman 1983 for the multivariate statistic).  The
returned value is a p-value, Uniform(0,1) when ``sample`` and ``log_prob``
agree — test suites assert ``gof > TEST_FAILURE_RATE``.

Host-side NumPy/scipy (these run in the test harness, not on device); the
chi-squared accumulations are vectorized instead of per-cell loops.
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


class InvalidTest(ValueError):
    """The sample size is too small for the statistic to be trustworthy."""


def _host(x):
    return np.asarray(jax.lax.stop_gradient(x))


def _bar_chart(probs, counts, width=60):
    peak = max(counts.max(), 1)
    lines = ["{: >8} {: >8}".format("Prob", "Count")]
    order = np.argsort(probs)[::-1]
    for p, c in zip(probs[order], counts[order]):
        lines.append(f"{p: >8.3f} {int(c): >8d} " + "-" * int(round(width * c / peak)))
    print("\n".join(lines))


def multinomial_goodness_of_fit(probs, counts, *, total_count=None, plot=False):
    """Pearson chi-squared test of counts against cell probabilities
    (optionally truncated: counts need not exhaust ``total_count``)."""
    probs, counts = _host(probs), np.asarray(counts)
    assert probs.ndim == 1 and probs.shape == counts.shape
    truncated = total_count is not None
    if not truncated:
        total_count = int(counts.sum())
    else:
        assert total_count >= counts.sum()
    if plot:
        _bar_chart(probs, counts)
    if np.any(np.abs(probs - 1) < 1e-8):
        sure_cell = np.abs(probs - 1) < 1e-8
        return 1.0 if counts[sure_cell].sum() == total_count else 0.0
    assert np.all(probs < 1), "bad probability"
    zero_cells = probs <= 0
    if zero_cells.any():
        warnings.warn("Zero probability in goodness-of-fit test", stacklevel=2)
        if counts[zero_cells].sum() > 0:
            return math.inf
    live = ~zero_cells
    mean = total_count * probs[live]
    variance = mean * (1 - probs[live])
    if not np.all(variance > 1):
        raise InvalidTest("Goodness of fit is inaccurate; use more samples")
    chi_squared = float((((counts[live] - mean) ** 2) / variance).sum())
    dof = int(live.sum()) - (0 if truncated else 1)
    from scipy.stats import chi2

    return float(chi2.sf(chi_squared, dof))


def unif01_goodness_of_fit(samples, *, plot=False):
    """Histogram Uniform(0,1) samples into ~n^(1/3) cells, then chi^2."""
    samples = _host(samples)
    assert samples.min() >= 0 and samples.max() <= 1
    cells = int(round(len(samples) ** 0.333))
    if cells < 7:
        raise InvalidTest("imprecise test, use more samples")
    binned = np.minimum((samples * cells).astype(int), cells - 1)
    counts = np.bincount(binned, minlength=cells)
    return multinomial_goodness_of_fit(np.full(cells, 1 / cells), counts, plot=plot)


def exp_goodness_of_fit(samples, plot=False):
    """Exponential(1) null -> Uniform(0,1) via the survival transform."""
    return unif01_goodness_of_fit(np.exp(-_host(samples)), plot=plot)


def density_goodness_of_fit(samples, probs, plot=False):
    """1D continuous test: order-statistic gaps scaled by local density are
    Exponential(1) under the null."""
    samples, probs = _host(samples), _host(probs)
    assert samples.shape == probs.shape
    if len(samples) <= 100:
        raise InvalidTest("imprecision; use more samples")
    order = np.argsort(samples, kind="stable")
    xs, ps = samples[order], probs[order]
    gaps = np.diff(xs)
    # trapezoid local density between neighbors
    inv_density = 0.5 * (1 / ps[1:] + 1 / ps[:-1])
    return exp_goodness_of_fit(len(xs) * gaps / inv_density, plot=plot)


def volume_of_sphere(dim, radius):
    return radius**dim * math.pi ** (0.5 * dim) / math.gamma(0.5 * dim + 1)


def get_nearest_neighbor_distances(samples):
    try:
        from scipy.spatial import cKDTree

        return cKDTree(samples).query(samples, k=2)[0][:, 1]
    except ImportError:  # pragma: no cover
        sq = (samples**2).sum(-1)
        pairwise = sq[:, None] + sq[None, :] - 2 * samples @ samples.T
        return np.sqrt(np.clip(np.partition(pairwise, 1)[:, 1], 0, None))


def vector_density_goodness_of_fit(samples, probs, *, dim=None, plot=False):
    """Multivariate test: nearest-neighbor-ball masses are Exponential(1)
    under the null (Bickel & Breiman 1983)."""
    samples, probs = _host(samples), _host(probs)
    assert samples.shape and len(samples)
    assert probs.shape == samples.shape[:1]
    dim = samples.shape[-1] if dim is None else dim
    assert dim
    if len(samples) <= 1000 * dim:
        raise InvalidTest("imprecision; use more samples")
    radii = get_nearest_neighbor_distances(samples)
    ball_mass = len(samples) * probs * volume_of_sphere(dim, radii)
    return exp_goodness_of_fit(ball_mass, plot=plot)


def auto_goodness_of_fit(samples, probs, *, dim=None, plot=False):
    """Dispatch on event dimensionality to the 1D or multivariate test."""
    samples, probs = _host(samples), _host(probs)
    assert samples.shape and samples.shape[0]
    assert probs.shape == samples.shape[:1]
    flat = samples.reshape(samples.shape[0], -1)
    ambient = flat.shape[-1]
    if ambient == 0:
        return 1.0
    if ambient == 1:
        return density_goodness_of_fit(flat.reshape(-1), probs, plot=plot)
    return vector_density_goodness_of_fit(
        flat, probs, dim=dim if dim is not None else ambient, plot=plot
    )
