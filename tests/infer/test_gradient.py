"""ELBO gradient-estimator correctness against analytic gradients
(pattern: reference test/infer/test_gradient.py + test_enum_elbo.py).

Models are tiny discrete/continuous graphs where the ELBO and its
gradients have closed forms; the estimators must match them (exactly for
enumeration, within MC error for score-function estimators).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.handlers import seed, substitute, trace
from numpyro_tpu.infer import (
    SVI,
    Trace_ELBO,
    TraceEnum_ELBO,
    TraceGraph_ELBO,
    TraceMeanField_ELBO,
)
from numpyro_tpu.optim import Adam


def _elbo_grad(elbo, params, model, guide, n=1, seed_val=0):
    def loss(p):
        return elbo.loss(random.PRNGKey(seed_val), {}, model, guide, **p)

    return jax.grad(loss)(params)


def test_traceenum_elbo_matches_analytic_bernoulli():
    # model: z ~ Bern(0.3); x | z ~ N(mu_z, 1) observed
    # guide: z ~ Bern(q) — ELBO(q) has a closed form; enumeration is exact
    data = 0.5
    mus = jnp.array([-1.0, 1.0])

    def model(q):
        z = numpyro_tpu.sample(
            "z", dist.Bernoulli(0.3), infer={"enumerate": "parallel"}
        )
        numpyro_tpu.sample("x", dist.Normal(mus[z], 1.0), obs=data)

    def guide(q):
        pass

    def exact_log_evidence(q):
        # with enumeration the "ELBO" is exactly log p(x)
        del q
        p = 0.3
        comp = jnp.stack(
            [
                jnp.log1p(-p) + dist.Normal(mus[0], 1.0).log_prob(data),
                jnp.log(p) + dist.Normal(mus[1], 1.0).log_prob(data),
            ]
        )
        return jax.scipy.special.logsumexp(comp)

    elbo = TraceEnum_ELBO()
    loss = elbo.loss(random.PRNGKey(0), {}, model, guide, 0.4)
    np.testing.assert_allclose(
        float(loss), -float(exact_log_evidence(0.4)), rtol=1e-5
    )


def test_tracegraph_elbo_gradient_nonreparam():
    # guide: z ~ Bern(sigmoid(phi)); model: z ~ Bern(p0), x|z observed.
    # d/dphi ELBO has a closed form; the score-function estimator with
    # Rao-Blackwellized downstream costs must match within MC error.
    p0, data = 0.3, 1.0
    mus = jnp.array([-1.0, 1.0])

    def model():
        z = numpyro_tpu.sample("z", dist.Bernoulli(p0))
        numpyro_tpu.sample("x", dist.Normal(mus[z], 1.0), obs=data)

    def guide(phi=0.0):
        numpyro_tpu.sample("z", dist.Bernoulli(logits=phi))

    def exact_elbo(phi):
        q = jax.nn.sigmoid(phi)
        def term(z):
            zi = jnp.asarray(z)
            lp = (
                dist.Bernoulli(p0).log_prob(zi)
                + dist.Normal(mus[z], 1.0).log_prob(data)
                - dist.Bernoulli(logits=phi).log_prob(zi)
            )
            return lp
        return (1 - q) * term(0) + q * term(1)

    phi = 0.2
    expected = float(jax.grad(lambda p: -exact_elbo(p))(phi))

    elbo = TraceGraph_ELBO(num_particles=20000)

    def loss(phi):
        return elbo.loss(
            random.PRNGKey(0), {}, model, lambda: guide(phi)
        )

    got = float(jax.grad(loss)(phi))
    assert abs(got - expected) < 0.05, (got, expected)


@pytest.mark.parametrize(
    "elbo_cls", [Trace_ELBO, TraceMeanField_ELBO, TraceGraph_ELBO]
)
def test_reparam_gradient_matches_analytic(elbo_cls):
    # conjugate normal-normal: model x ~ N(mu, 1), obs y; guide N(loc, 1)
    # ELBO(loc) = E_q[log p(x, y) - log q(x)] has closed-form gradient
    y = 1.5

    def model():
        x = numpyro_tpu.sample("x", dist.Normal(0.0, 1.0))
        numpyro_tpu.sample("y", dist.Normal(x, 1.0), obs=y)

    def guide(loc):
        numpyro_tpu.sample("x", dist.Normal(loc, 1.0))

    # d/dloc ELBO = -(2 loc - y)  (q fixed unit scale)
    loc0 = 0.3
    expected = -(2 * loc0 - y)

    elbo = elbo_cls(num_particles=30000)
    got = float(
        jax.grad(
            lambda l: -elbo.loss(random.PRNGKey(1), {}, model, lambda: guide(l))
        )(loc0)
    )
    assert abs(got - expected) < 0.06, (got, expected)


def test_svi_converges_to_analytic_posterior():
    # normal-normal with known posterior: check SVI lands on it
    y = 2.0

    def model():
        x = numpyro_tpu.sample("x", dist.Normal(0.0, 1.0))
        numpyro_tpu.sample("y", dist.Normal(x, 1.0), obs=y)

    def guide():
        loc = numpyro_tpu.param("loc", 0.0)
        scale = numpyro_tpu.param(
            "scale", 1.0, constraint=dist.constraints.positive
        )
        numpyro_tpu.sample("x", dist.Normal(loc, scale))

    svi = SVI(model, guide, Adam(0.05), Trace_ELBO(num_particles=32))
    res = svi.run(random.PRNGKey(2), 2000, progress_bar=False)
    assert abs(float(res.params["loc"]) - 1.0) < 0.1
    assert abs(float(res.params["scale"]) - np.sqrt(0.5)) < 0.1


def test_traceenum_gradient_through_continuous():
    # mixture with enumerated discrete + continuous latent: enumeration
    # gradient wrt the mixture weight logit matches the analytic marginal
    data = 0.7

    def model(logit):
        z = numpyro_tpu.sample(
            "z", dist.Bernoulli(logits=logit), infer={"enumerate": "parallel"}
        )
        numpyro_tpu.sample(
            "x", dist.Normal(jnp.where(z, 1.0, -1.0), 1.0), obs=data
        )

    def guide(logit):
        pass

    def exact_neg_log_ev(logit):
        q = jax.nn.sigmoid(logit)
        ev = (1 - q) * jnp.exp(dist.Normal(-1.0, 1.0).log_prob(data)) + q * jnp.exp(
            dist.Normal(1.0, 1.0).log_prob(data)
        )
        return -jnp.log(ev)

    elbo = TraceEnum_ELBO()
    got = float(
        jax.grad(lambda l: elbo.loss(random.PRNGKey(3), {}, model, guide, l))(0.25)
    )
    expected = float(jax.grad(exact_neg_log_ev)(0.25))
    np.testing.assert_allclose(got, expected, rtol=1e-4)
