"""Warmup adaptation quality of the chain-batched HMC/NUTS engine: dense and
structured mass matrices on correlated targets, step-size targeting, and
pooled cross-chain adaptation."""

import numpy as np
import pytest

import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.infer import MCMC, NUTS


def _correlated_target(rho=0.95, dim=2):
    cov = np.full((dim, dim), rho) + (1 - rho) * np.eye(dim)
    prec = np.linalg.inv(cov)

    def pot(z):
        return 0.5 * z @ jnp.asarray(prec) @ z

    return pot, cov


@pytest.mark.parametrize(
    "dense_mass", [True, pytest.param(False, marks=pytest.mark.slow)]
)
def test_dense_mass_recovers_correlated_gaussian(dense_mass):
    pot, cov = _correlated_target()
    m = MCMC(
        NUTS(potential_fn=pot, dense_mass=dense_mass),
        num_warmup=600,
        num_samples=1200,
        num_chains=4,
        progress_bar=False,
    )
    m.run(random.PRNGKey(0), init_params=jnp.zeros((4, 2)))
    z = np.asarray(m.get_samples())
    emp = np.cov(z.T)
    assert np.allclose(emp, cov, atol=0.25), emp
    if dense_mass:
        # adapted inverse mass should resemble the covariance
        imm = np.asarray(m.last_state.adapt_state.inverse_mass_matrix)
        imm = imm[0] if imm.ndim == 3 else imm
        assert abs(imm[0, 1] / np.sqrt(imm[0, 0] * imm[1, 1]) - 0.95) < 0.15


def test_structured_dense_mass_blocks():
    # correlated pair (a) gets a dense block; b stays diagonal
    def model():
        a = numpyro_tpu.sample(
            "a",
            dist.MultivariateNormal(
                jnp.zeros(2),
                covariance_matrix=jnp.array([[1.0, 0.9], [0.9, 1.0]]),
            ),
        )
        numpyro_tpu.sample("b", dist.Normal(0.0, 3.0))
        return a

    m = MCMC(
        NUTS(model, dense_mass=[("a",)]),
        num_warmup=500,
        num_samples=800,
        progress_bar=False,
    )
    m.run(random.PRNGKey(1))
    s = m.get_samples()
    corr = np.corrcoef(np.asarray(s["a"]).T)[0, 1]
    assert abs(corr - 0.9) < 0.1
    assert abs(float(s["b"].std()) - 3.0) < 0.5


@pytest.mark.slow
def test_step_size_responds_to_target_accept():
    # NUTS realized acceptance sits above the dual-averaging target in the
    # smooth regime; the adaptation guarantee we assert is (a) high targets
    # are met closely and (b) raising the target shrinks the step size.
    def model():
        numpyro_tpu.sample("x", dist.Normal(jnp.zeros(5), 1.0).to_event(1))

    results = {}
    for target in (0.6, 0.9):
        m = MCMC(
            NUTS(model, target_accept_prob=target),
            num_warmup=700,
            num_samples=500,
            progress_bar=False,
        )
        m.run(random.PRNGKey(2), extra_fields=("accept_prob",))
        acc = float(np.mean(np.asarray(m.get_extra_fields()["accept_prob"])))
        ss = float(np.ravel(np.asarray(m.last_state.adapt_state.step_size))[0])
        results[target] = (acc, ss)
    assert abs(results[0.9][0] - 0.9) < 0.08
    assert results[0.6][0] >= 0.55
    assert results[0.9][1] < results[0.6][1]


@pytest.mark.slow
def test_pooled_adaptation_shares_step_size():
    def model():
        numpyro_tpu.sample("x", dist.Normal(0.0, 1.0))

    m = MCMC(
        NUTS(model, pooled_adaptation=True),
        num_warmup=400,
        num_samples=200,
        num_chains=8,
        progress_bar=False,
    )
    m.run(random.PRNGKey(3))
    ss = np.asarray(m.last_state.adapt_state.step_size)
    assert ss.shape[-1] == 8 or ss.ndim == 0
    # pooled adaptation drives every chain to the same step size
    assert np.allclose(ss, ss.reshape(-1)[0])


def test_warmup_only_then_resume():
    def model():
        numpyro_tpu.sample("x", dist.Normal(2.0, 0.5))

    m = MCMC(NUTS(model), num_warmup=400, num_samples=400, progress_bar=False)
    m.warmup(random.PRNGKey(4))
    assert m.post_warmup_state is not None
    m.run(random.PRNGKey(5))
    s = m.get_samples()
    assert abs(float(s["x"].mean()) - 2.0) < 0.1
    assert abs(float(s["x"].std()) - 0.5) < 0.1
