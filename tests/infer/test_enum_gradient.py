"""TraceEnum_ELBO / TraceGraph_ELBO gradient grids vs analytic values
(pattern: reference test/contrib/test_enum_elbo.py:1-2509 and
test/infer/test_gradient.py:1-627 — plate/markov permutations, each case
asserting both the ELBO value and its gradient against a closed form).

Every enum case uses an empty (or Delta) guide so the enumerated "ELBO" is
exactly the log evidence ``log p(x)`` with the discretes summed out; the
analytic side computes the same sum explicitly with differentiable jnp ops
and the gradients must agree to numerical precision.  TraceGraph cases are
score-function estimators checked in expectation (many particles, fixed
seed).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.infer import TraceEnum_ELBO, TraceGraph_ELBO

MUS = jnp.array([-1.2, 0.4, 1.7])
OBS1 = jnp.array(0.3)
OBS3 = jnp.array([-0.5, 0.2, 1.1])
OBS23 = jnp.array([[-0.5, 0.2, 1.1], [0.7, -1.3, 0.0]])


def _bern_p(a):
    return jax.nn.sigmoid(a)


def _enum_elbo(model, params, max_plate_nesting=None):
    """-TraceEnum_ELBO loss == enumerated log evidence, as fn of params."""

    def f(p):
        elbo = TraceEnum_ELBO(
            **(
                {"max_plate_nesting": max_plate_nesting}
                if max_plate_nesting is not None
                else {}
            )
        )
        return -elbo.loss(
            random.PRNGKey(0), {}, lambda: model(**p), lambda: None
        )

    return f


# --- case library: (name, model(**params), exact(params), params, mpn) ----

def _case_bern_scalar():
    def model(a):
        z = numpyro_tpu.sample(
            "z", dist.Bernoulli(logits=a), infer={"enumerate": "parallel"}
        )
        numpyro_tpu.sample("x", dist.Normal(MUS[z], 1.0), obs=OBS1)

    def exact(p):
        a = p["a"]
        lp = jnp.stack(
            [
                jnp.log1p(-_bern_p(a)) + dist.Normal(MUS[0], 1.0).log_prob(OBS1),
                jnp.log(_bern_p(a)) + dist.Normal(MUS[1], 1.0).log_prob(OBS1),
            ]
        )
        return jax.scipy.special.logsumexp(lp)

    return model, exact, {"a": jnp.array(0.37)}, None


def _case_bern_plate():
    def model(a):
        with numpyro_tpu.plate("N", 3):
            z = numpyro_tpu.sample(
                "z", dist.Bernoulli(logits=a), infer={"enumerate": "parallel"}
            )
            numpyro_tpu.sample("x", dist.Normal(MUS[z], 1.0), obs=OBS3)

    def exact(p):
        a = p["a"]
        lp0 = jnp.log1p(-_bern_p(a)) + dist.Normal(MUS[0], 1.0).log_prob(OBS3)
        lp1 = jnp.log(_bern_p(a)) + dist.Normal(MUS[1], 1.0).log_prob(OBS3)
        return jnp.sum(jnp.logaddexp(lp0, lp1))

    return model, exact, {"a": jnp.array(-0.4)}, 1


def _case_cat_scalar():
    def model(logits):
        z = numpyro_tpu.sample(
            "z", dist.Categorical(logits=logits), infer={"enumerate": "parallel"}
        )
        numpyro_tpu.sample("x", dist.Normal(MUS[z], 0.8), obs=OBS1)

    def exact(p):
        logp = jax.nn.log_softmax(p["logits"])
        comp = dist.Normal(MUS, 0.8).log_prob(OBS1)
        return jax.scipy.special.logsumexp(logp + comp)

    return model, exact, {"logits": jnp.array([0.1, -0.3, 0.5])}, None


def _case_cat_plate():
    def model(logits):
        with numpyro_tpu.plate("N", 3):
            z = numpyro_tpu.sample(
                "z", dist.Categorical(logits=logits),
                infer={"enumerate": "parallel"},
            )
            numpyro_tpu.sample("x", dist.Normal(MUS[z], 0.8), obs=OBS3)

    def exact(p):
        logp = jax.nn.log_softmax(p["logits"])  # (3,)
        comp = dist.Normal(MUS[None, :], 0.8).log_prob(OBS3[:, None])  # (N, 3)
        return jnp.sum(jax.scipy.special.logsumexp(logp + comp, axis=-1))

    return model, exact, {"logits": jnp.array([0.3, 0.0, -0.6])}, 1


def _case_two_indep():
    def model(a, b):
        z1 = numpyro_tpu.sample(
            "z1", dist.Bernoulli(logits=a), infer={"enumerate": "parallel"}
        )
        z2 = numpyro_tpu.sample(
            "z2", dist.Bernoulli(logits=b), infer={"enumerate": "parallel"}
        )
        numpyro_tpu.sample(
            "x", dist.Normal(MUS[z1 + z2], 1.0), obs=OBS1
        )

    def exact(p):
        pa, pb = _bern_p(p["a"]), _bern_p(p["b"])
        terms = []
        for i, lpi in [(0, jnp.log1p(-pa)), (1, jnp.log(pa))]:
            for j, lpj in [(0, jnp.log1p(-pb)), (1, jnp.log(pb))]:
                terms.append(
                    lpi + lpj + dist.Normal(MUS[i + j], 1.0).log_prob(OBS1)
                )
        return jax.scipy.special.logsumexp(jnp.stack(terms))

    return model, exact, {"a": jnp.array(0.2), "b": jnp.array(-0.7)}, None


def _case_nested_plates():
    def model(a):
        with numpyro_tpu.plate("I", 2, dim=-2):
            with numpyro_tpu.plate("J", 3, dim=-1):
                z = numpyro_tpu.sample(
                    "z", dist.Bernoulli(logits=a),
                    infer={"enumerate": "parallel"},
                )
                numpyro_tpu.sample("x", dist.Normal(MUS[z], 1.0), obs=OBS23)

    def exact(p):
        a = p["a"]
        lp0 = jnp.log1p(-_bern_p(a)) + dist.Normal(MUS[0], 1.0).log_prob(OBS23)
        lp1 = jnp.log(_bern_p(a)) + dist.Normal(MUS[1], 1.0).log_prob(OBS23)
        return jnp.sum(jnp.logaddexp(lp0, lp1))

    return model, exact, {"a": jnp.array(0.9)}, 2


def _case_hierarchical_discrete():
    # z1 ~ Bern selects the logits of z2 ~ Cat(3); obs depends on z2
    L = jnp.array([[0.2, -0.1, 0.4], [-0.5, 0.8, 0.0]])

    def model(a):
        z1 = numpyro_tpu.sample(
            "z1", dist.Bernoulli(logits=a), infer={"enumerate": "parallel"}
        )
        z2 = numpyro_tpu.sample(
            "z2", dist.Categorical(logits=L[z1]),
            infer={"enumerate": "parallel"},
        )
        numpyro_tpu.sample("x", dist.Normal(MUS[z2], 1.0), obs=OBS1)

    def exact(p):
        pa = _bern_p(p["a"])
        comp = dist.Normal(MUS, 1.0).log_prob(OBS1)  # (3,)
        lz1 = jnp.stack([jnp.log1p(-pa), jnp.log(pa)])  # (2,)
        lz2 = jax.nn.log_softmax(L, axis=-1)  # (2, 3)
        return jax.scipy.special.logsumexp(
            lz1[:, None] + lz2 + comp[None, :]
        )

    return model, exact, {"a": jnp.array(-0.1)}, None


def _case_scaled_obs():
    def model(a):
        z = numpyro_tpu.sample(
            "z", dist.Bernoulli(logits=a), infer={"enumerate": "parallel"}
        )
        with numpyro_tpu.handlers.scale(scale=2.5):
            numpyro_tpu.sample("x", dist.Normal(MUS[z], 1.0), obs=OBS1)

    def exact(p):
        a = p["a"]
        lp = jnp.stack(
            [
                jnp.log1p(-_bern_p(a))
                + 2.5 * dist.Normal(MUS[0], 1.0).log_prob(OBS1),
                jnp.log(_bern_p(a))
                + 2.5 * dist.Normal(MUS[1], 1.0).log_prob(OBS1),
            ]
        )
        return jax.scipy.special.logsumexp(lp)

    return model, exact, {"a": jnp.array(0.6)}, None


def _case_masked_obs():
    mask = jnp.array([True, False, True])

    def model(a):
        with numpyro_tpu.plate("N", 3):
            z = numpyro_tpu.sample(
                "z", dist.Bernoulli(logits=a), infer={"enumerate": "parallel"}
            )
            with numpyro_tpu.handlers.mask(mask=mask):
                numpyro_tpu.sample("x", dist.Normal(MUS[z], 1.0), obs=OBS3)

    def exact(p):
        a = p["a"]
        lx0 = dist.Normal(MUS[0], 1.0).log_prob(OBS3) * mask
        lx1 = dist.Normal(MUS[1], 1.0).log_prob(OBS3) * mask
        lp0 = jnp.log1p(-_bern_p(a)) + lx0
        lp1 = jnp.log(_bern_p(a)) + lx1
        return jnp.sum(jnp.logaddexp(lp0, lp1))

    return model, exact, {"a": jnp.array(0.15)}, 1


def _markov_case(T):
    # HMM: z_0 ~ Bern(p0); z_t | z_{t-1} via transition logits; Gaussian
    # emissions.  Exact evidence by forward algorithm (differentiable).
    TRANS = jnp.array([[0.8, -0.3], [0.1, 0.9]])  # logits rows
    obs = jnp.linspace(-1.0, 1.0, T)

    def model(a):
        z = numpyro_tpu.sample(
            "z_0", dist.Bernoulli(logits=a), infer={"enumerate": "parallel"}
        )
        numpyro_tpu.sample("x_0", dist.Normal(MUS[z], 1.0), obs=obs[0])
        for t in range(1, T):
            z = numpyro_tpu.sample(
                f"z_{t}", dist.Bernoulli(logits=TRANS[z, 0] - TRANS[z, 1]),
                infer={"enumerate": "parallel"},
            )
            numpyro_tpu.sample(f"x_{t}", dist.Normal(MUS[z], 1.0), obs=obs[t])

    def exact(p):
        a = p["a"]
        emit = jnp.stack(
            [dist.Normal(MUS[0], 1.0).log_prob(obs),
             dist.Normal(MUS[1], 1.0).log_prob(obs)],
            axis=-1,
        )  # (T, 2)
        alpha = (
            jnp.stack([jnp.log1p(-_bern_p(a)), jnp.log(_bern_p(a))])
            + emit[0]
        )
        trans_logit = TRANS[:, 0] - TRANS[:, 1]  # (2,) logits of z_t=1 | prev
        ltrans = jnp.stack(
            [jnp.log1p(-_bern_p(trans_logit)), jnp.log(_bern_p(trans_logit))],
            axis=-1,
        )  # (prev, next)
        for t in range(1, T):
            alpha = (
                jax.scipy.special.logsumexp(
                    alpha[:, None] + ltrans, axis=0
                )
                + emit[t]
            )
        return jax.scipy.special.logsumexp(alpha)

    return model, exact, {"a": jnp.array(0.25)}, None


def _case_delta_guide():
    # continuous latent w with a Delta guide + enumerated z: ELBO is exactly
    # log p(x, w0) with z summed out (reference: Delta-guide enum cases)
    w0 = jnp.array(0.41)

    def model(a):
        w = numpyro_tpu.sample("w", dist.Normal(0.0, 1.0))
        z = numpyro_tpu.sample(
            "z", dist.Bernoulli(logits=a), infer={"enumerate": "parallel"}
        )
        numpyro_tpu.sample("x", dist.Normal(MUS[z] + w, 1.0), obs=OBS1)

    def guide(a):
        numpyro_tpu.sample("w", dist.Delta(w0))

    def exact(p):
        a = p["a"]
        lw = dist.Normal(0.0, 1.0).log_prob(w0)
        lp = jnp.stack(
            [
                jnp.log1p(-_bern_p(a))
                + dist.Normal(MUS[0] + w0, 1.0).log_prob(OBS1),
                jnp.log(_bern_p(a))
                + dist.Normal(MUS[1] + w0, 1.0).log_prob(OBS1),
            ]
        )
        return lw + jax.scipy.special.logsumexp(lp)

    return model, exact, {"a": jnp.array(-0.33)}, None, guide


ENUM_CASES = {
    "bern_scalar": _case_bern_scalar,
    "bern_plate": _case_bern_plate,
    "cat_scalar": _case_cat_scalar,
    "cat_plate": _case_cat_plate,
    "two_indep": _case_two_indep,
    "nested_plates": _case_nested_plates,
    "hierarchical": _case_hierarchical_discrete,
    "scaled_obs": _case_scaled_obs,
    "masked_obs": _case_masked_obs,
    "markov_T2": lambda: _markov_case(2),
    "markov_T3": lambda: _markov_case(3),
    "markov_T5": lambda: _markov_case(5),
}


@pytest.mark.parametrize("name", list(ENUM_CASES), ids=list(ENUM_CASES))
def test_traceenum_value_matches_analytic(name):
    case = ENUM_CASES[name]()
    model, exact, params, mpn = case[:4]
    got = _enum_elbo(model, params, max_plate_nesting=mpn)(params)
    want = exact(params)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("name", list(ENUM_CASES), ids=list(ENUM_CASES))
def test_traceenum_gradient_matches_analytic(name):
    case = ENUM_CASES[name]()
    model, exact, params, mpn = case[:4]
    g_got = jax.grad(_enum_elbo(model, params, max_plate_nesting=mpn))(params)
    g_want = jax.grad(exact)(params)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(g_got[k]), np.asarray(g_want[k]),
            rtol=1e-4, atol=1e-5, err_msg=f"grad wrt {k}",
        )


def test_traceenum_delta_guide_value_and_gradient():
    model, exact, params, mpn, guide = _case_delta_guide()

    def f(p):
        return -TraceEnum_ELBO().loss(
            random.PRNGKey(0), {}, lambda: model(**p), lambda: guide(**p)
        )

    np.testing.assert_allclose(
        np.asarray(f(params)), np.asarray(exact(params)), rtol=1e-5, atol=1e-5
    )
    g_got = jax.grad(f)(params)
    g_want = jax.grad(exact)(params)
    np.testing.assert_allclose(
        np.asarray(g_got["a"]), np.asarray(g_want["a"]), rtol=1e-4, atol=1e-5
    )


# --- TraceGraph_ELBO: Rao-Blackwellized score-function estimators ---------
# Exact ELBO for a Bernoulli latent has a closed form; the estimator's
# expectation (many particles, fixed seed) must match its gradient.

def _tracegraph_case_scalar():
    mus = jnp.array([-0.8, 0.9])
    ob = jnp.array(0.25)

    def model(ql):
        z = numpyro_tpu.sample("z", dist.Bernoulli(0.3))
        numpyro_tpu.sample("x", dist.Normal(mus[z], 1.0), obs=ob)

    def guide(ql):
        numpyro_tpu.sample("z", dist.Bernoulli(logits=ql))

    def exact_elbo(p):
        q = _bern_p(p["ql"])
        e0 = (
            jnp.log(0.7) + dist.Normal(mus[0], 1.0).log_prob(ob) - jnp.log1p(-q)
        )
        e1 = jnp.log(0.3) + dist.Normal(mus[1], 1.0).log_prob(ob) - jnp.log(q)
        return (1 - q) * e0 + q * e1

    return model, guide, exact_elbo, {"ql": jnp.array(0.2)}


def _tracegraph_case_plate():
    mus = jnp.array([-0.8, 0.9])
    obs = jnp.array([0.25, -0.4])

    def model(ql):
        with numpyro_tpu.plate("N", 2):
            z = numpyro_tpu.sample("z", dist.Bernoulli(0.3))
            numpyro_tpu.sample("x", dist.Normal(mus[z], 1.0), obs=obs)

    def guide(ql):
        with numpyro_tpu.plate("N", 2):
            numpyro_tpu.sample("z", dist.Bernoulli(logits=ql))

    def exact_elbo(p):
        q = _bern_p(p["ql"])
        total = 0.0
        for i in range(2):
            e0 = (
                jnp.log(0.7)
                + dist.Normal(mus[0], 1.0).log_prob(obs[i])
                - jnp.log1p(-q)
            )
            e1 = (
                jnp.log(0.3)
                + dist.Normal(mus[1], 1.0).log_prob(obs[i])
                - jnp.log(q)
            )
            total = total + (1 - q) * e0 + q * e1
        return total

    return model, guide, exact_elbo, {"ql": jnp.array(-0.3)}


def _tracegraph_case_downstream():
    # downstream continuous site: the Rao-Blackwellized estimator must
    # include x's log-prob in z's downstream cost
    mus = jnp.array([-0.8, 0.9])
    ob = jnp.array(0.1)

    def model(ql):
        z = numpyro_tpu.sample("z", dist.Bernoulli(0.4))
        w = numpyro_tpu.sample("w", dist.Normal(mus[z], 1.0))
        numpyro_tpu.sample("x", dist.Normal(w, 0.5), obs=ob)

    def guide(ql):
        z = numpyro_tpu.sample("z", dist.Bernoulli(logits=ql))
        numpyro_tpu.sample("w", dist.Normal(mus[z], 1.0))

    def exact_elbo(p):
        # q(w|z) = p(w|z) so the w-terms cancel inside each z branch;
        # E_q[log p(x|w)] has closed form: x | z ~ N(mu_z, 0.5^2 + 1)
        q = _bern_p(p["ql"])
        var = 0.25 + 1.0

        def piece(z, lpz, lqz):
            e_lx = (
                -0.5 * jnp.log(2 * jnp.pi * 0.25)
                - (0.25 + (ob - mus[z]) ** 2 + 1.0 - 0.25) / (2 * 0.25)
            )
            # E[(x - w)^2] = var_w + (x - mu_z)^2 = 1 + (x - mu_z)^2
            e_lx = -0.5 * jnp.log(2 * jnp.pi * 0.25) - (
                1.0 + (ob - mus[z]) ** 2
            ) / (2 * 0.25)
            return lpz - lqz + e_lx

        del var
        e0 = piece(0, jnp.log(0.6), jnp.log1p(-q))
        e1 = piece(1, jnp.log(0.4), jnp.log(q))
        return (1 - q) * e0 + q * e1

    return model, guide, exact_elbo, {"ql": jnp.array(0.1)}


def _tracegraph_case_two_indep():
    # two independent non-reparam sites feeding one collider observation:
    # each site's downstream cost includes the obs term but NOT the other
    # site's prior — a wrong sum_to/dependency computation biases the
    # gradient (reference: test/infer/test_compute_downstream_costs.py)
    mus = jnp.array([-0.8, 0.3, 0.9])
    ob = jnp.array(0.2)

    def model(ql1, ql2):
        z1 = numpyro_tpu.sample("z1", dist.Bernoulli(0.35))
        z2 = numpyro_tpu.sample("z2", dist.Bernoulli(0.6))
        numpyro_tpu.sample("x", dist.Normal(mus[z1 + z2], 1.0), obs=ob)

    def guide(ql1, ql2):
        numpyro_tpu.sample("z1", dist.Bernoulli(logits=ql1))
        numpyro_tpu.sample("z2", dist.Bernoulli(logits=ql2))

    def exact_elbo(p):
        q1, q2 = _bern_p(p["ql1"]), _bern_p(p["ql2"])
        lp1 = jnp.stack([jnp.log(0.65), jnp.log(0.35)])
        lp2 = jnp.stack([jnp.log(0.4), jnp.log(0.6)])
        lq1 = jnp.stack([jnp.log1p(-q1), jnp.log(q1)])
        lq2 = jnp.stack([jnp.log1p(-q2), jnp.log(q2)])
        total = 0.0
        for a in range(2):
            for b in range(2):
                w = jnp.exp(lq1[a] + lq2[b])
                term = (
                    lp1[a]
                    + lp2[b]
                    + dist.Normal(mus[a + b], 1.0).log_prob(ob)
                    - lq1[a]
                    - lq2[b]
                )
                total = total + w * term
        return total

    return model, guide, exact_elbo, {
        "ql1": jnp.array(0.25), "ql2": jnp.array(-0.4)
    }


def _tracegraph_case_chain():
    # z1 -> z2 -> obs with a mean-field guide: z1's downstream cost spans
    # p(z2|z1) AND p(x|z2); z2's spans only its own terms
    mus = jnp.array([-1.0, 1.2])
    trans = jnp.array([0.8, -0.5])  # logits of z2=1 given z1
    ob = jnp.array(0.4)

    def model(ql1, ql2):
        z1 = numpyro_tpu.sample("z1", dist.Bernoulli(0.45))
        z2 = numpyro_tpu.sample("z2", dist.Bernoulli(logits=trans[z1]))
        numpyro_tpu.sample("x", dist.Normal(mus[z2], 0.8), obs=ob)

    def guide(ql1, ql2):
        numpyro_tpu.sample("z1", dist.Bernoulli(logits=ql1))
        numpyro_tpu.sample("z2", dist.Bernoulli(logits=ql2))

    def exact_elbo(p):
        q1, q2 = _bern_p(p["ql1"]), _bern_p(p["ql2"])
        lq1 = jnp.stack([jnp.log1p(-q1), jnp.log(q1)])
        lq2 = jnp.stack([jnp.log1p(-q2), jnp.log(q2)])
        lp1 = jnp.stack([jnp.log(0.55), jnp.log(0.45)])
        total = 0.0
        for a in range(2):
            lp2 = jnp.stack(
                [-jax.nn.softplus(trans[a]), -jax.nn.softplus(-trans[a])]
            )
            for b in range(2):
                w = jnp.exp(lq1[a] + lq2[b])
                term = (
                    lp1[a]
                    + lp2[b]
                    + dist.Normal(mus[b], 0.8).log_prob(ob)
                    - lq1[a]
                    - lq2[b]
                )
                total = total + w * term
        return total

    return model, guide, exact_elbo, {
        "ql1": jnp.array(-0.2), "ql2": jnp.array(0.3)
    }


def _tracegraph_case_plate_collider():
    # per-element z_j in a plate plus a GLOBAL collider obs on the sum:
    # each z_j's downstream cost mixes an in-plate term (its own obs) with
    # a cross-plate term (the shared collider) — the MultiFrameTensor
    # sum_to reduction is what this exercises
    mus = jnp.array([-0.6, 0.7])
    obs_local = jnp.array([0.1, -0.3])
    ob_glob = jnp.array(1.0)

    def model(ql):
        with numpyro_tpu.plate("N", 2):
            z = numpyro_tpu.sample("z", dist.Bernoulli(0.4))
            numpyro_tpu.sample(
                "x", dist.Normal(mus[z], 1.0), obs=obs_local
            )
        numpyro_tpu.sample(
            "g", dist.Normal(jnp.sum(z).astype(jnp.float32), 1.0), obs=ob_glob
        )

    def guide(ql):
        with numpyro_tpu.plate("N", 2):
            numpyro_tpu.sample("z", dist.Bernoulli(logits=ql))

    def exact_elbo(p):
        q = _bern_p(p["ql"])
        lq = jnp.stack([jnp.log1p(-q), jnp.log(q)])
        lp = jnp.stack([jnp.log(0.6), jnp.log(0.4)])
        total = 0.0
        for a in range(2):
            for b in range(2):
                w = jnp.exp(lq[a] + lq[b])
                term = (
                    lp[a]
                    + lp[b]
                    + dist.Normal(mus[a], 1.0).log_prob(obs_local[0])
                    + dist.Normal(mus[b], 1.0).log_prob(obs_local[1])
                    + dist.Normal(float(a + b), 1.0).log_prob(ob_glob)
                    - lq[a]
                    - lq[b]
                )
                total = total + w * term
        return total

    return model, guide, exact_elbo, {"ql": jnp.array(0.15)}


TG_CASES = {
    "scalar": _tracegraph_case_scalar,
    "plate": _tracegraph_case_plate,
    "downstream": _tracegraph_case_downstream,
    "two_indep": _tracegraph_case_two_indep,
    "chain": _tracegraph_case_chain,
    "plate_collider": _tracegraph_case_plate_collider,
}


@pytest.mark.parametrize("name", list(TG_CASES), ids=list(TG_CASES))
def test_tracegraph_gradient_matches_analytic(name):
    model, guide, exact_elbo, params = TG_CASES[name]()
    n_particles = 20_000

    def loss(p):
        elbo = TraceGraph_ELBO(num_particles=n_particles)
        return elbo.loss(
            random.PRNGKey(7), {}, lambda: model(**p), lambda: guide(**p)
        )

    g_est = jax.grad(loss)(params)
    g_true = jax.grad(lambda p: -exact_elbo(p))(params)
    # score-function estimator: matches in expectation; Rao-Blackwellization
    # keeps the variance small enough for a 5-8% band at 20k particles
    for k in params:
        assert np.abs(
            np.asarray(g_est[k]) - np.asarray(g_true[k])
        ) < 0.08 * max(1.0, abs(float(g_true[k]))), (k, g_est[k], g_true[k])


@pytest.mark.parametrize("name", list(TG_CASES), ids=list(TG_CASES))
def test_tracegraph_value_matches_analytic(name):
    model, guide, exact_elbo, params = TG_CASES[name]()

    def loss(p):
        elbo = TraceGraph_ELBO(num_particles=20_000)
        return elbo.loss(
            random.PRNGKey(3), {}, lambda: model(**p), lambda: guide(**p)
        )

    got = -loss(params)
    want = exact_elbo(params)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=0.05, atol=0.02
    )
