"""Warmup-adaptation internals (pattern: reference test/infer/test_hmc_util.py
+ test_mcmc.py subposterior tests)."""

import numpy as np

import jax.numpy as jnp
from jax import random

from numpyro_tpu.infer.hmc_util import (
    build_adaptation_schedule,
    consensus,
    dual_averaging,
    parametric,
    parametric_draws,
    welford_covariance,
)


def test_dual_averaging_converges():
    # minimize f(x) = (x - 1)^2 via its gradient fed as the DA signal
    init_fn, update_fn = dual_averaging(gamma=0.5)
    state = init_fn(0.0)
    for _ in range(150):
        x = state.x_t
        state = update_fn(2 * (x - 1.0), state)
    assert abs(float(state.x_avg) - 1.0) < 0.1


def test_welford_diagonal_and_dense():
    rng = np.random.RandomState(0)
    cov = np.array([[1.5, 0.6], [0.6, 0.9]])
    samples = rng.multivariate_normal(np.zeros(2), cov, size=4000)

    for diagonal in (True, False):
        init_fn, update_fn, final_fn = welford_covariance(diagonal=diagonal)
        state = init_fn(2)
        for s in samples:
            state = update_fn(jnp.asarray(s), state)
        estimate, _, _ = final_fn(state, regularize=False)
        expected = np.diag(cov) if diagonal else cov
        np.testing.assert_allclose(np.asarray(estimate), expected, rtol=0.1)


def test_adaptation_schedule_structure():
    # long run: 75 start buffer, doubling middle windows, 50 end buffer
    sched = build_adaptation_schedule(1000)
    assert sched[0].start == 0 and sched[0].end == 74
    assert sched[-1].end == 999 and sched[-1].start == 1000 - 50
    widths = [w.end - w.start + 1 for w in sched[1:-1]]
    for a, b in zip(widths, widths[1:-1]):
        assert b == 2 * a  # doubling middle windows
    # short run: single window
    sched_small = build_adaptation_schedule(10)
    assert len(sched_small) == 1
    assert sched_small[0].start == 0 and sched_small[0].end == 9


def _make_subposteriors(key, n_sub=4, n_draw=3000):
    # each subposterior is a Gaussian around a slightly different mean
    keys = random.split(key, n_sub)
    subs = []
    for i, k in enumerate(keys):
        mean = jnp.array([1.0 + 0.01 * i, -0.5 - 0.01 * i])
        subs.append({"w": mean + 0.3 * random.normal(k, (n_draw, 2))})
    return subs


def test_consensus_merging():
    subs = _make_subposteriors(random.PRNGKey(0))
    merged = consensus(subs, num_draws=2000, rng_key=random.PRNGKey(1))
    w = np.asarray(merged["w"])
    assert w.shape == (2000, 2)
    assert np.allclose(w.mean(0), [1.015, -0.515], atol=0.05)


def test_parametric_merging():
    subs = _make_subposteriors(random.PRNGKey(2))
    mean, cov = parametric(subs, diagonal=False)
    assert np.allclose(np.asarray(mean), [1.015, -0.515], atol=0.05)
    # product of 4 Gaussians with var 0.09 -> var 0.09/4
    assert np.allclose(np.diag(np.asarray(cov)), 0.0225, rtol=0.2)
    draws = parametric_draws(subs, 1500, rng_key=random.PRNGKey(3))
    w = np.asarray(draws["w"])
    assert w.shape == (1500, 2)
    assert np.allclose(w.std(0), np.sqrt(0.0225), rtol=0.2)
