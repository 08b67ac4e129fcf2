"""Enumeration engine tests: marginal log-density vs manual sums, NUTS over
enumerated models, infer_discrete MAP/sampling, TraceEnum_ELBO
(pattern: reference test/contrib/test_enum_elbo.py + test_infer_discrete)."""

import pytest
import numpy as np
import scipy.stats as st

import jax
import jax.numpy as jnp
from jax import random
from jax.scipy.special import logsumexp

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu import handlers
from numpyro_tpu.contrib.enum import config_enumerate, enum, infer_discrete, log_density, markov
from numpyro_tpu.contrib.enum import log_density as enum_log_density
from numpyro_tpu.infer import MCMC, NUTS, SVI, TraceEnum_ELBO
from numpyro_tpu.infer.autoguide import AutoNormal
from numpyro_tpu.optim import Adam


def mixture_model(x):
    w = numpyro_tpu.sample("w", dist.Beta(2.0, 2.0))
    with numpyro_tpu.plate("N", x.shape[0]):
        c = numpyro_tpu.sample(
            "c", dist.Bernoulli(w), infer={"enumerate": "parallel"}
        )
        locs = jnp.array([-1.0, 2.0])
        numpyro_tpu.sample("x", dist.Normal(locs[c], 1.0), obs=x)


def test_enum_log_density_mixture():
    x = jnp.array([-1.2, 2.3, 0.1, 1.8])
    wrapped = enum(config_enumerate(mixture_model), first_available_dim=-2)
    sub = handlers.substitute(wrapped, data={"w": jnp.array(0.3)})
    ld, _ = log_density(sub, (x,), {}, {})
    w = 0.3
    manual = st.beta(2, 2).logpdf(w) + np.log(
        (1 - w) * st.norm(-1, 1).pdf(np.asarray(x))
        + w * st.norm(2, 1).pdf(np.asarray(x))
    ).sum()
    np.testing.assert_allclose(float(ld), manual, rtol=1e-5)


def test_enum_log_density_chain():
    def chain_model(y):
        p0 = jnp.array([0.6, 0.4])
        T = jnp.array([[0.8, 0.2], [0.3, 0.7]])
        locs = jnp.array([-1.0, 1.0])
        z1 = numpyro_tpu.sample(
            "z1", dist.Categorical(p0), infer={"enumerate": "parallel"}
        )
        z2 = numpyro_tpu.sample(
            "z2", dist.Categorical(T[z1]), infer={"enumerate": "parallel"}
        )
        numpyro_tpu.sample("y", dist.Normal(locs[z2], 1.0), obs=y)

    wrapped = enum(config_enumerate(chain_model), first_available_dim=-1)
    ld, _ = log_density(wrapped, (jnp.array(0.5),), {}, {})
    p0 = np.array([0.6, 0.4])
    T = np.array([[0.8, 0.2], [0.3, 0.7]])
    locs = np.array([-1.0, 1.0])
    pz2 = p0 @ T
    manual = np.log(sum(pz2[k] * st.norm(locs[k], 1).pdf(0.5) for k in range(2)))
    np.testing.assert_allclose(float(ld), manual, rtol=1e-5)


def test_nuts_marginalizes_discrete():
    data = jnp.concatenate(
        [
            -1.0 + random.normal(random.PRNGKey(1), (300,)),
            2.0 + random.normal(random.PRNGKey(2), (700,)),
        ]
    )
    m = MCMC(NUTS(mixture_model), num_warmup=500, num_samples=500, progress_bar=False)
    m.run(random.PRNGKey(0), data)
    w = m.get_samples()["w"]
    assert abs(float(w.mean()) - 0.7) < 0.06


def test_infer_discrete_map():
    def model(x):
        with numpyro_tpu.plate("N", x.shape[0]):
            c = numpyro_tpu.sample(
                "c", dist.Bernoulli(0.5), infer={"enumerate": "parallel"}
            )
            locs = jnp.array([-2.0, 2.0])
            numpyro_tpu.sample("x", dist.Normal(locs[c], 1.0), obs=x)

    x = jnp.array([-2.5, 2.5, -1.9, 2.2])
    f = infer_discrete(
        model, first_available_dim=-2, temperature=0, rng_key=random.PRNGKey(0)
    )
    tr = handlers.trace(handlers.seed(f, 1)).get_trace(x)
    np.testing.assert_array_equal(np.asarray(tr["c"]["value"]), [0, 1, 0, 1])


def test_infer_discrete_sampling_frequency():
    def model(x):
        c = numpyro_tpu.sample(
            "c", dist.Bernoulli(0.3), infer={"enumerate": "parallel"}
        )
        locs = jnp.array([-1.0, 1.0])
        numpyro_tpu.sample("x", dist.Normal(locs[c], 1.0), obs=x)

    xval = 0.3
    p1 = 0.3 * st.norm(1, 1).pdf(xval)
    p0 = 0.7 * st.norm(-1, 1).pdf(xval)
    ptrue = p1 / (p0 + p1)
    cs = []
    for i in range(300):
        f = infer_discrete(
            model, first_available_dim=-1, temperature=1, rng_key=random.PRNGKey(i)
        )
        tr = handlers.trace(handlers.seed(f, i)).get_trace(jnp.array(xval))
        cs.append(int(tr["c"]["value"]))
    assert abs(np.mean(cs) - ptrue) < 0.09


def test_trace_enum_elbo_mixture():
    data = jnp.concatenate(
        [
            -1.0 + random.normal(random.PRNGKey(1), (300,)),
            2.0 + random.normal(random.PRNGKey(2), (700,)),
        ]
    )
    guide = AutoNormal(mixture_model)
    svi = SVI(mixture_model, guide, Adam(0.05), TraceEnum_ELBO())
    res = svi.run(random.PRNGKey(0), 600, data, progress_bar=False)
    w_est = guide.median(res.params)["w"]
    assert abs(float(w_est) - 0.7) < 0.05
    assert np.isfinite(np.asarray(res.losses)).all()


def test_markov_chain_matches_forward_algorithm():
    import numpy as onp

    from numpyro_tpu.contrib.enum import markov

    T, K = 60, 3
    p0 = jnp.array([0.5, 0.3, 0.2])
    Tr = jnp.array([[0.8, 0.1, 0.1], [0.2, 0.6, 0.2], [0.1, 0.3, 0.6]])
    locs = jnp.array([-2.0, 0.0, 2.0])
    rng = onp.random.RandomState(0)
    zs = [rng.choice(3, p=onp.asarray(p0))]
    for _ in range(1, T):
        zs.append(rng.choice(3, p=onp.asarray(Tr)[zs[-1]]))
    ys = jnp.asarray(onp.asarray(locs)[zs] + 0.3 * rng.randn(T))

    def hmm(ys):
        z = numpyro_tpu.sample(
            "z_0", dist.Categorical(p0), infer={"enumerate": "parallel"}
        )
        numpyro_tpu.sample("y_0", dist.Normal(locs[z], 0.5), obs=ys[0])
        for t in markov(range(1, T), history=1):
            z = numpyro_tpu.sample(
                f"z_{t}", dist.Categorical(Tr[z]), infer={"enumerate": "parallel"}
            )
            numpyro_tpu.sample(f"y_{t}", dist.Normal(locs[z], 0.5), obs=ys[t])

    wrapped = enum(config_enumerate(hmm), first_available_dim=-1)
    ld, _ = log_density(wrapped, (ys,), {}, {})

    ysn = onp.asarray(ys)
    alpha = onp.asarray(p0) * st.norm(onp.asarray(locs), 0.5).pdf(ysn[0])
    logz = 0.0
    for t in range(1, T):
        s = alpha.sum()
        logz += onp.log(s)
        alpha = alpha / s
        alpha = (alpha @ onp.asarray(Tr)) * st.norm(onp.asarray(locs), 0.5).pdf(
            ysn[t]
        )
    logz += onp.log(alpha.sum())
    np.testing.assert_allclose(float(ld), logz, rtol=1e-5)


@pytest.mark.slow
def test_nuts_over_markov_hmm():
    import numpy as onp

    from numpyro_tpu.contrib.enum import markov

    T = 40
    p0 = jnp.array([0.5, 0.5])
    Tr = jnp.array([[0.9, 0.1], [0.2, 0.8]])
    locs = jnp.array([-1.5, 1.5])
    rng = onp.random.RandomState(1)
    zs = [rng.choice(2, p=onp.asarray(p0))]
    for _ in range(1, T):
        zs.append(rng.choice(2, p=onp.asarray(Tr)[zs[-1]]))
    ys = jnp.asarray(onp.asarray(locs)[zs] + 0.3 * rng.randn(T))

    def model(ys):
        sigma = numpyro_tpu.sample("sigma", dist.HalfNormal(1.0))
        z = numpyro_tpu.sample(
            "z_0", dist.Categorical(p0), infer={"enumerate": "parallel"}
        )
        numpyro_tpu.sample("y_0", dist.Normal(locs[z], sigma), obs=ys[0])
        for t in markov(range(1, T), history=1):
            z = numpyro_tpu.sample(
                f"z_{t}", dist.Categorical(Tr[z]), infer={"enumerate": "parallel"}
            )
            numpyro_tpu.sample(f"y_{t}", dist.Normal(locs[z], sigma), obs=ys[t])

    m = MCMC(NUTS(model), num_warmup=300, num_samples=300, progress_bar=False)
    m.run(random.PRNGKey(1), ys)
    sig = float(m.get_samples()["sigma"].mean())
    assert abs(sig - 0.3) < 0.12


@pytest.mark.slow
def test_predictive_infer_discrete():
    """Predictive(infer_discrete=True) recovers per-datum mixture assignments.

    Parity: reference numpyro/infer/util.py Predictive(infer_discrete=...).
    """
    from numpyro_tpu.infer import MCMC, NUTS, Predictive

    def model(x):
        w = numpyro_tpu.sample("w", dist.Beta(2.0, 2.0))
        with numpyro_tpu.plate("N", x.shape[0]):
            c = numpyro_tpu.sample(
                "c", dist.Bernoulli(w), infer={"enumerate": "parallel"}
            )
            locs = jnp.array([-2.0, 2.0])
            numpyro_tpu.sample("x", dist.Normal(locs[c], 0.7), obs=x)

    x = jnp.concatenate(
        [
            -2.0 + 0.5 * random.normal(random.PRNGKey(1), (30,)),
            2.0 + 0.5 * random.normal(random.PRNGKey(2), (40,)),
        ]
    )
    m = MCMC(NUTS(model), num_warmup=150, num_samples=80, progress_bar=False)
    m.run(random.PRNGKey(0), x)
    pred = Predictive(model, m.get_samples(), infer_discrete=True)
    out = pred(random.PRNGKey(3), x)
    assert out["c"].shape == (80, 70)
    acc = ((np.asarray(out["c"]).mean(0) > 0.5) == (np.asarray(x) > 0)).mean()
    assert acc > 0.9


# ---------------------------------------------------------------------------
# enumeration inside effectful scan (reference scan_enum,
# numpyro/contrib/control_flow/scan.py:122) — funsor-free parallel chain
# ---------------------------------------------------------------------------


def _forward_algorithm(log_init_trans, log_trans, emissions):
    """Reference forward algorithm: emissions (T, K)."""
    alpha = log_init_trans + emissions[0]
    for t in range(1, emissions.shape[0]):
        alpha = logsumexp(alpha[:, None] + log_trans + emissions[t], axis=0)
    return logsumexp(alpha)


def test_scan_enum_hmm_exact():
    from numpyro_tpu.contrib.control_flow import scan

    T, K = 12, 3
    probs_x = jax.nn.softmax(random.normal(random.PRNGKey(0), (K, K)), -1)
    locs = jnp.array([-2.0, 0.0, 2.0])
    ys = random.normal(random.PRNGKey(1), (T,))

    def model(ys):
        def transition(x_prev, y):
            x = numpyro_tpu.sample(
                "x", dist.Categorical(probs_x[x_prev]),
                infer={"enumerate": "parallel"},
            )
            numpyro_tpu.sample("y", dist.Normal(locs[x], 1.0), obs=y)
            return x, None

        scan(transition, 0, ys)

    lj, _ = enum_log_density(
        enum(config_enumerate(model), first_available_dim=-1), (ys,), {}, {}
    )
    em = dist.Normal(locs, 1.0).log_prob(ys[:, None])
    expected = _forward_algorithm(jnp.log(probs_x[0]), jnp.log(probs_x), em)
    assert jnp.allclose(lj, expected, rtol=1e-5)


def test_scan_enum_mixture_of_hmms():
    """Global enumerated discrete outside the scan selects the transition
    matrix — its dim must survive the time collapse and be eliminated
    globally."""
    from numpyro_tpu.contrib.control_flow import scan
    from numpyro_tpu.ops.indexing import Vindex

    T = 8
    trans = jnp.stack(
        [jnp.array([[0.9, 0.1], [0.1, 0.9]]),
         jnp.array([[0.5, 0.5], [0.5, 0.5]])]
    )
    locs = jnp.array([-1.0, 1.0])
    ys = random.normal(random.PRNGKey(3), (T,))

    def model(ys):
        m = numpyro_tpu.sample(
            "m", dist.Bernoulli(0.3), infer={"enumerate": "parallel"}
        )
        P = trans[m]

        def transition(x_prev, y):
            x = numpyro_tpu.sample(
                "x", dist.Categorical(Vindex(P)[..., x_prev, :]),
                infer={"enumerate": "parallel"},
            )
            numpyro_tpu.sample("y", dist.Normal(locs[x], 1.0), obs=y)
            return x, None

        scan(transition, 0, ys)

    lj, _ = enum_log_density(
        enum(config_enumerate(model), first_available_dim=-1), (ys,), {}, {}
    )
    em = dist.Normal(locs, 1.0).log_prob(ys[:, None])
    f0 = _forward_algorithm(jnp.log(trans[0][0]), jnp.log(trans[0]), em)
    f1 = _forward_algorithm(jnp.log(trans[1][0]), jnp.log(trans[1]), em)
    expected = logsumexp(jnp.array([f0 + jnp.log(0.7), f1 + jnp.log(0.3)]))
    assert jnp.allclose(lj, expected, rtol=1e-5)


def test_scan_enum_plate_inside():
    """iid emissions in a plate inside the step: foreign plate axes are
    summed per step before the chain reduction."""
    from numpyro_tpu.contrib.control_flow import scan

    T, N = 8, 5
    P = jnp.array([[0.8, 0.2], [0.3, 0.7]])
    locs = jnp.array([-1.0, 1.0])
    ys = random.normal(random.PRNGKey(4), (T, N))

    def model(ys):
        def transition(x_prev, y):
            x = numpyro_tpu.sample(
                "x", dist.Categorical(P[x_prev]),
                infer={"enumerate": "parallel"},
            )
            with numpyro_tpu.plate("N", N):
                numpyro_tpu.sample("y", dist.Normal(locs[x], 1.0), obs=y)
            return x, None

        scan(transition, 0, ys)

    lj, _ = enum_log_density(
        enum(config_enumerate(model), first_available_dim=-2), (ys,), {}, {}
    )
    em = dist.Normal(locs, 1.0).log_prob(ys[:, :, None]).sum(1)
    expected = _forward_algorithm(jnp.log(P[0]), jnp.log(P), em)
    assert jnp.allclose(lj, expected, rtol=1e-5)


def test_scan_enum_batched_chains():
    """Per-sequence chains: the carried discrete lives inside a plate, so
    the chain reduction runs batched over the plate axis."""
    from numpyro_tpu.contrib.control_flow import scan
    from numpyro_tpu.ops.indexing import Vindex

    T, N = 6, 3
    P = jnp.array([[0.8, 0.2], [0.3, 0.7]])
    locs = jnp.array([-1.0, 1.0])
    ys = random.normal(random.PRNGKey(0), (T, N))

    def model(ys):
        def transition(x_prev, y):
            with numpyro_tpu.plate("N", N):
                x = numpyro_tpu.sample(
                    "x", dist.Categorical(Vindex(P)[x_prev, :]),
                    infer={"enumerate": "parallel"},
                )
                numpyro_tpu.sample("y", dist.Normal(locs[x], 1.0), obs=y)
            return x, None

        scan(transition, jnp.zeros(N, jnp.int32), ys)

    lj, _ = enum_log_density(
        enum(config_enumerate(model), first_available_dim=-2), (ys,), {}, {}
    )
    em = dist.Normal(locs, 1.0).log_prob(ys[..., None])  # (T, N, K)
    expected = sum(
        _forward_algorithm(jnp.log(P[0]), jnp.log(P), em[:, n]) for n in range(N)
    )
    assert jnp.allclose(lj, expected, rtol=1e-5)


def test_scan_enum_history_zero_and_length_one():
    from numpyro_tpu.contrib.control_flow import scan

    T = 6
    locs = jnp.array([-1.0, 1.0])
    ys = random.normal(random.PRNGKey(1), (T,))
    P = jnp.array([[0.8, 0.2], [0.3, 0.7]])

    def indep_model(ys):
        def transition(carry, y):
            c = numpyro_tpu.sample(
                "c", dist.Bernoulli(0.4), infer={"enumerate": "parallel"}
            )
            numpyro_tpu.sample("y", dist.Normal(locs[c], 1.0), obs=y)
            return carry, None

        scan(transition, 0.0, ys, history=0)

    lj0, _ = enum_log_density(
        enum(config_enumerate(indep_model), first_available_dim=-1),
        (ys,), {}, {},
    )
    em = dist.Normal(locs, 1.0).log_prob(ys[:, None])
    expected0 = logsumexp(em + jnp.log(jnp.array([0.6, 0.4])), axis=-1).sum()
    assert jnp.allclose(lj0, expected0, rtol=1e-5)

    def hmm(ys):
        def transition(x_prev, y):
            x = numpyro_tpu.sample(
                "x", dist.Categorical(P[x_prev]),
                infer={"enumerate": "parallel"},
            )
            numpyro_tpu.sample("y", dist.Normal(locs[x], 1.0), obs=y)
            return x, None

        scan(transition, 0, ys)

    lj1, _ = enum_log_density(
        enum(config_enumerate(hmm), first_available_dim=-1), (ys[:1],), {}, {}
    )
    expected1 = logsumexp(jnp.log(P[0]) + em[0])
    assert jnp.allclose(lj1, expected1, rtol=1e-5)


@pytest.mark.slow
def test_scan_enum_nuts_recovers_emissions():
    """NUTS over HMM emission means with the discrete state enumerated
    inside scan — the full pipeline (initialize_model -> enum potential)."""
    from numpyro_tpu.contrib.control_flow import scan
    from numpyro_tpu.infer import MCMC, NUTS

    true_locs = jnp.array([-2.0, 2.0])
    Ptrue = jnp.array([[0.9, 0.1], [0.2, 0.8]])
    ks = random.split(random.PRNGKey(7), 120)
    x, out = 0, []
    for t in range(60):
        x = int(dist.Categorical(Ptrue[x]).sample(ks[2 * t]))
        out.append(float(true_locs[x] + 0.5 * random.normal(ks[2 * t + 1])))
    data = jnp.array(out)

    def hmm(ys):
        mu = numpyro_tpu.sample("mu", dist.Normal(jnp.zeros(2), 3.0).to_event(1))
        mu_ord = jnp.sort(mu)

        def transition(x_prev, y):
            x = numpyro_tpu.sample(
                "x", dist.Categorical(Ptrue[x_prev]),
                infer={"enumerate": "parallel"},
            )
            numpyro_tpu.sample("y", dist.Normal(mu_ord[x], 0.5), obs=y)
            return x, None

        scan(transition, 0, ys)

    m = MCMC(NUTS(hmm), num_warmup=300, num_samples=200, progress_bar=False)
    m.run(random.PRNGKey(8), data)
    mu_hat = np.sort(np.asarray(m.get_samples()["mu"]), axis=-1).mean(0)
    assert abs(mu_hat[0] + 2.0) < 0.4 and abs(mu_hat[1] - 2.0) < 0.4


@pytest.mark.slow
def test_infer_discrete_markov_chain():
    """Markov-recycled dims: infer_discrete matches brute-force posterior
    marginals and the exact Viterbi path on a small HMM."""
    import itertools

    from numpyro_tpu.contrib.enum import markov

    T, K = 5, 2
    P = jnp.array([[0.8, 0.2], [0.3, 0.7]])
    locs = jnp.array([-1.0, 1.0])
    ys = jnp.array([-0.9, 1.2, 0.8, -1.1, 0.2])

    def hmm():
        x = 0
        for t in markov(range(T), history=1):
            x = numpyro_tpu.sample(
                f"x_{t}", dist.Categorical(P[x]),
                infer={"enumerate": "parallel"},
            )
            numpyro_tpu.sample(f"y_{t}", dist.Normal(locs[x], 1.0), obs=ys[t])

    em = np.asarray(dist.Normal(locs, 1.0).log_prob(ys[:, None]))
    logP = np.log(np.asarray(P))
    paths = []
    for path in itertools.product(range(K), repeat=T):
        lp = logP[0, path[0]] + em[0, path[0]]
        for t in range(1, T):
            lp += logP[path[t - 1], path[t]] + em[t, path[t]]
        paths.append((path, lp))
    logZ = logsumexp(jnp.array([lp for _, lp in paths]))
    post = np.zeros((T, K))
    for path, lp in paths:
        w = np.exp(lp - logZ)
        for t in range(T):
            post[t, path[t]] += w

    S = 2000
    keys = random.split(random.PRNGKey(0), S)

    def draw(key):
        sampled = infer_discrete(
            hmm, first_available_dim=-1, temperature=1, rng_key=key
        )
        with handlers.block(), handlers.trace() as tr, handlers.seed(rng_seed=0):
            sampled()
        return jnp.stack([tr[f"x_{t}"]["value"] for t in range(T)])

    draws = jax.vmap(draw)(keys)
    emp = np.asarray((draws == 1).mean(0))
    assert np.allclose(emp, post[:, 1], atol=0.05)

    mapped = infer_discrete(
        hmm, first_available_dim=-1, temperature=0, rng_key=random.PRNGKey(5)
    )
    with handlers.block(), handlers.trace() as tr, handlers.seed(rng_seed=0):
        mapped()
    map_path = tuple(int(tr[f"x_{t}"]["value"]) for t in range(T))
    assert map_path == max(paths, key=lambda pl: pl[1])[0]


def test_markov_history_two_exact():
    """Second-order chain: markov(history=2) recycles a 3-dim pool and the
    site-ordered elimination reproduces the exact marginal."""
    import itertools

    T, K = 6, 2
    # transition depends on the two previous states
    logits = random.normal(random.PRNGKey(0), (K, K, K))
    P = jax.nn.softmax(logits, -1)
    locs = jnp.array([-1.0, 1.0])
    ys = random.normal(random.PRNGKey(1), (T,))

    def model():
        x_prev, x_prev2 = 0, 0
        for t in markov(range(T), history=2):
            probs = P[x_prev2, x_prev]
            x = numpyro_tpu.sample(
                f"x_{t}", dist.Categorical(probs),
                infer={"enumerate": "parallel"},
            )
            numpyro_tpu.sample(f"y_{t}", dist.Normal(locs[x], 1.0), obs=ys[t])
            x_prev2, x_prev = x_prev, x

    lj, _ = enum_log_density(
        enum(config_enumerate(model), first_available_dim=-1), (), {}, {}
    )

    em = np.asarray(dist.Normal(locs, 1.0).log_prob(ys[:, None]))
    logP = np.log(np.asarray(P))
    total = []
    for path in itertools.product(range(K), repeat=T):
        lp, p2, p1 = 0.0, 0, 0
        for t in range(T):
            lp += logP[p2, p1, path[t]] + em[t, path[t]]
            p2, p1 = p1, path[t]
        total.append(lp)
    expected = logsumexp(jnp.array(total))
    assert jnp.allclose(lj, expected, rtol=1e-5), (lj, expected)
