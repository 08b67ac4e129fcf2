"""Posterior-moment parity against the *actual reference implementation*
(BASELINE.md correctness bar: moments within Monte-Carlo error of reference
NumPyro).  Skipped unless /root/reference is present; the reference is
imported in-process (module name `numpyro` does not collide with ours) via
small jax-version shims.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp
from jax import random

REF = "/root/reference"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(os.path.join(REF, "numpyro")),
        reason="reference checkout not available",
    ),
]


@pytest.fixture(scope="module")
def ref():
    """Import reference numpyro with compat shims (older-jax symbols)."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # multipledispatch shim (not installed in this env)
    if "multipledispatch" not in sys.modules:
        md = types.ModuleType("multipledispatch")

        class Dispatcher:
            def __init__(self, name):
                self.name, self.funcs = name, {}

            def register(self, *ts):
                def deco(fn):
                    self.funcs[ts] = fn
                    return fn

                return deco

            def __call__(self, *args, **kwargs):
                types_ = tuple(type(a) for a in args)
                best, score = None, None
                for sig, fn in self.funcs.items():
                    if len(sig) != len(types_):
                        continue
                    try:
                        s = tuple(t.__mro__.index(w) for t, w in zip(types_, sig))
                    except ValueError:
                        continue
                    if score is None or s < score:
                        best, score = fn, s
                if best is None:
                    raise NotImplementedError(self.name)
                return best(*args, **kwargs)

        _ns = {}

        def dispatch(*ts):
            def deco(fn):
                d = _ns.setdefault(fn.__name__, Dispatcher(fn.__name__))
                d.register(*ts)(fn)
                return d

            return deco

        md.dispatch, md.Dispatcher = dispatch, Dispatcher
        sys.modules["multipledispatch"] = md
    import jax.experimental.pjit as _pjit

    if not hasattr(_pjit, "pjit_p"):
        from jax._src.pjit import jit_p

        _pjit.pjit_p = jit_p
    if "jax.util" not in sys.modules:
        shim = types.ModuleType("jax.util")
        from jax._src import util as _u

        for n in dir(_u):
            if not n.startswith("_"):
                setattr(shim, n, getattr(_u, n))
        sys.modules["jax.util"] = shim
    import numpyro as ref_numpyro

    return ref_numpyro


def _moments(samples):
    """Robust location/scale (median, IQR): heavy-tailed posteriors (e.g.
    horseshoe half-Cauchy scales) have unstable or infinite moments, so
    sample mean/sd comparisons would be noise-dominated."""
    out = {}
    for k, v in samples.items():
        v = np.asarray(v)
        q25, q50, q75 = np.percentile(v, [25, 50, 75], axis=0)
        out[k] = (q50, q75 - q25)
    return out


def _assert_close(ours, refs, rtol_scale=0.35, sites=None):
    """Medians must agree within a fraction of the posterior IQR (MC error);
    IQRs must agree to 35%.  ``sites`` restricts the comparison to the
    *identified* quantities — e.g. horseshoe tau/lam are only identified
    through their product, so their marginals are pure MC noise."""
    for name in refs:
        if sites is not None and name not in sites:
            continue
        m_ref, s_ref = refs[name]
        m_ours, s_ours = ours[name]
        tol = rtol_scale * (np.abs(s_ref) + 1e-3)
        assert np.all(np.abs(m_ours - m_ref) < tol + 0.05 * np.abs(m_ref)), (
            name, m_ours, m_ref, s_ref
        )
        assert np.all(
            np.abs(s_ours - s_ref) < 0.35 * np.abs(s_ref) + 1e-2
        ), (name, s_ours, s_ref)


def _ab_nuts(
    ref, our_model, ref_model, *args, warmup=600, samples=1200, sites=None, **nuts_kw
):
    import numpyro_tpu
    from numpyro_tpu.infer import MCMC as OurMCMC, NUTS as OurNUTS

    ours = OurMCMC(
        OurNUTS(our_model, **nuts_kw),
        num_warmup=warmup,
        num_samples=samples,
        num_chains=2,
        progress_bar=False,
    )
    ours.run(random.PRNGKey(0), *args)

    from numpyro.infer import MCMC as RefMCMC, NUTS as RefNUTS

    theirs = RefMCMC(
        RefNUTS(ref_model, **nuts_kw),
        num_warmup=warmup,
        num_samples=samples,
        num_chains=2,
        progress_bar=False,
        chain_method="sequential",
    )
    theirs.run(random.PRNGKey(0), *args)
    _assert_close(
        _moments(ours.get_samples()), _moments(theirs.get_samples()), sites=sites
    )


def test_eight_schools_parity(ref):
    y = jnp.array([28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0])
    sigma = jnp.array([15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0])

    def make(mod, dist_mod):
        def model(y, sigma):
            mu = mod.sample("mu", dist_mod.Normal(0.0, 5.0))
            tau = mod.sample("tau", dist_mod.HalfCauchy(5.0))
            with mod.plate("J", 8):
                theta = mod.sample("theta", dist_mod.Normal(mu, tau))
                mod.sample("obs", dist_mod.Normal(theta, sigma), obs=y)

        return model

    import numpyro_tpu
    import numpyro_tpu.distributions as our_dist
    import numpyro.distributions as ref_dist

    _ab_nuts(
        ref,
        make(numpyro_tpu, our_dist),
        make(ref, ref_dist),
        y,
        sigma,
    )


def test_sparse_regression_horseshoe_parity(ref):
    # horseshoe logistic regression with dense mass (BASELINE correctness row)
    rng = np.random.RandomState(0)
    X = jnp.asarray(rng.randn(80, 6))
    w_true = np.array([2.0, -1.5, 0.0, 0.0, 0.0, 0.0])
    y = jnp.asarray((rng.rand(80) < 1 / (1 + np.exp(-X @ w_true))).astype(float))

    def make(mod, dist_mod):
        def model(X, y):
            lam = mod.sample(
                "lam", dist_mod.HalfCauchy(jnp.ones(6)).to_event(1)
            )
            tau = mod.sample("tau", dist_mod.HalfCauchy(1.0))
            w = mod.sample("w", dist_mod.Normal(0.0, tau * lam).to_event(1))
            logits = X @ w
            with mod.plate("N", X.shape[0]):
                mod.sample("y", dist_mod.Bernoulli(logits=logits), obs=y)

        return model

    import numpyro_tpu
    import numpyro_tpu.distributions as our_dist
    import numpyro.distributions as ref_dist

    _ab_nuts(
        ref,
        make(numpyro_tpu, our_dist),
        make(ref, ref_dist),
        X,
        y,
        warmup=800,
        samples=1500,
        sites={"w"},
        target_accept_prob=0.9,
    )


def test_stochastic_volatility_parity(ref):
    # deep-tree GaussianRandomWalk latent (BASELINE correctness row)
    rng = np.random.RandomState(1)
    T = 60
    vol = np.exp(np.cumsum(0.1 * rng.randn(T)) - 1.5)
    returns = jnp.asarray(vol * rng.randn(T))

    def make(mod, dist_mod):
        def model(returns):
            sigma = mod.sample("sigma", dist_mod.Exponential(50.0))
            nu = mod.sample("nu", dist_mod.Exponential(0.1))
            h = mod.sample(
                "h", dist_mod.GaussianRandomWalk(sigma, num_steps=T)
            )
            mod.sample(
                "r",
                dist_mod.StudentT(nu, 0.0, jnp.exp(h)).to_event(1),
                obs=returns,
            )

        return model

    import numpyro_tpu
    import numpyro_tpu.distributions as our_dist
    import numpyro.distributions as ref_dist

    _ab_nuts(
        ref,
        make(numpyro_tpu, our_dist),
        make(ref, ref_dist),
        returns,
        warmup=800,
        samples=1200,
    )


def test_advi_autoguide_parity(ref):
    y = jnp.asarray(np.random.RandomState(2).normal(1.2, 0.8, 60))

    def make(mod, dist_mod):
        def model(y):
            mu = mod.sample("mu", dist_mod.Normal(0.0, 10.0))
            sd = mod.sample("sd", dist_mod.HalfNormal(3.0))
            with mod.plate("N", y.shape[0]):
                mod.sample("y", dist_mod.Normal(mu, sd), obs=y)

        return model

    import numpyro_tpu
    import numpyro_tpu.distributions as our_dist
    from numpyro_tpu.infer import SVI as OurSVI, Trace_ELBO as OurELBO
    from numpyro_tpu.infer.autoguide import AutoNormal as OurAutoNormal

    our_model = make(numpyro_tpu, our_dist)
    g1 = OurAutoNormal(our_model)
    res1 = OurSVI(our_model, g1, numpyro_tpu.optim.Adam(5e-2), OurELBO()).run(
        random.PRNGKey(0), 2000, y, progress_bar=False
    )
    our_median = g1.median(res1.params)

    import numpyro.distributions as ref_dist
    from numpyro.infer import SVI as RefSVI, Trace_ELBO as RefELBO
    from numpyro.infer.autoguide import AutoNormal as RefAutoNormal
    from numpyro.optim import Adam as RefAdam

    ref_model = make(ref, ref_dist)
    g2 = RefAutoNormal(ref_model)
    res2 = RefSVI(ref_model, g2, RefAdam(5e-2), RefELBO()).run(
        random.PRNGKey(0), 2000, y, progress_bar=False
    )
    ref_median = g2.median(res2.params)

    for k in ref_median:
        assert abs(float(our_median[k]) - float(ref_median[k])) < 0.1, (
            k, our_median[k], ref_median[k]
        )


def test_hmm_enumeration_parity(ref):
    # discrete HMM: our funsor-free elimination vs reference funsor-free
    # exact path is not available there without funsor; compare against the
    # closed-form forward algorithm instead for both engines' log densities
    probs_init = jnp.array([0.6, 0.4])
    probs_trans = jnp.array([[0.8, 0.2], [0.3, 0.7]])
    locs = jnp.array([-1.0, 2.0])
    rng = np.random.RandomState(3)
    obs = jnp.asarray(rng.randn(12) + np.where(rng.rand(12) < 0.5, -1.0, 2.0))

    def forward_log_prob():
        import scipy.stats as st

        alpha = np.asarray(probs_init) * st.norm(np.asarray(locs), 1.0).pdf(
            float(obs[0])
        )
        for t in range(1, 12):
            alpha = (alpha @ np.asarray(probs_trans)) * st.norm(
                np.asarray(locs), 1.0
            ).pdf(float(obs[t]))
        return np.log(alpha.sum())

    import numpyro_tpu
    import numpyro_tpu.distributions as our_dist
    from numpyro_tpu.contrib.enum import config_enumerate, enum
    from numpyro_tpu.contrib.enum import log_density as enum_log_density

    def model():
        z = 0
        for t in range(12):
            z = numpyro_tpu.sample(
                f"z_{t}",
                our_dist.Categorical(
                    probs=probs_init if t == 0 else probs_trans[z]
                ),
                infer={"enumerate": "parallel"},
            )
            numpyro_tpu.sample(
                f"x_{t}", our_dist.Normal(locs[z], 1.0), obs=obs[t]
            )

    enum_model = enum(config_enumerate(model), first_available_dim=-1)
    ld, _ = enum_log_density(enum_model, (), {}, {})
    assert abs(float(ld) - forward_log_prob()) < 1e-3


def test_sa_barker_kernel_parity(ref):
    # gradient-free SA and Barker proposal on a conjugate target: both
    # engines are checked against the analytic Gamma posterior, and against
    # each other when the reference kernel mixes (reference SA can stall on
    # this target with default settings - that is not our bug to match)
    import scipy.stats as st

    y = np.random.RandomState(4).gamma(3.0, 1.0, 40)
    post = st.gamma(2.0 + len(y), scale=1.0 / (1.0 + y.sum()))
    y = jnp.asarray(y)

    def make(mod, dist_mod):
        def model(y):
            rate = mod.sample("rate", dist_mod.Gamma(2.0, 1.0))
            with mod.plate("N", y.shape[0]):
                mod.sample("y", dist_mod.Exponential(rate), obs=y)

        return model

    import numpyro_tpu
    import numpyro_tpu.distributions as our_dist
    from numpyro_tpu.infer import MCMC as OM, SA as OurSA, BarkerMH as OurBarker

    import numpyro.distributions as ref_dist
    from numpyro.infer import MCMC as RM, SA as RefSA, BarkerMH as RefBarker

    our_model = make(numpyro_tpu, our_dist)
    ref_model = make(ref, ref_dist)
    for OurK, RefK in [(OurSA, RefSA), (OurBarker, RefBarker)]:
        m1 = OM(
            OurK(our_model),
            num_warmup=2000,
            num_samples=4000,
            progress_bar=False,
        )
        m1.run(random.PRNGKey(0), y)
        draws = np.asarray(m1.get_samples()["rate"])
        assert abs(np.median(draws) - post.median()) < 4 * post.std(), OurK
        assert abs(draws.std() - post.std()) < 0.5 * post.std(), OurK

        m2 = RM(
            RefK(ref_model),
            num_warmup=2000,
            num_samples=4000,
            progress_bar=False,
        )
        m2.run(random.PRNGKey(0), y)
        ref_draws = np.asarray(m2.get_samples()["rate"])
        if ref_draws.std() > 1e-6:  # reference actually mixed
            assert abs(np.median(draws) - np.median(ref_draws)) < 4 * post.std()


def test_discrete_hmc_gibbs_parity(ref):
    # mixed discrete+continuous model through DiscreteHMCGibbs
    rng = np.random.RandomState(5)
    y = jnp.asarray(
        np.concatenate([rng.normal(-2, 1, 30), rng.normal(2, 1, 30)])
    )

    def make(mod, dist_mod):
        def model(y):
            w = mod.sample("w", dist_mod.Beta(2.0, 2.0))
            mu = mod.sample(
                "mu", dist_mod.Normal(jnp.zeros(2), 5.0).to_event(1)
            )
            with mod.plate("N", y.shape[0]):
                z = mod.sample("z", dist_mod.Bernoulli(w))
                mod.sample("y", dist_mod.Normal(mu[z], 1.0), obs=y)

        return model

    import numpyro_tpu
    import numpyro_tpu.distributions as our_dist
    from numpyro_tpu.infer import (
        MCMC as OM,
        NUTS as ON,
        DiscreteHMCGibbs as OurGibbs,
    )

    import numpyro.distributions as ref_dist
    from numpyro.infer import (
        MCMC as RM,
        NUTS as RN,
        DiscreteHMCGibbs as RefGibbs,
    )

    m1 = OM(
        OurGibbs(ON(make(numpyro_tpu, our_dist))),
        num_warmup=600,
        num_samples=1500,
        progress_bar=False,
    )
    m1.run(random.PRNGKey(0), y)
    m2 = RM(
        RefGibbs(RN(make(ref, ref_dist))),
        num_warmup=600,
        num_samples=1500,
        progress_bar=False,
    )
    m2.run(random.PRNGKey(0), y)
    s1, s2 = m1.get_samples(), m2.get_samples()
    # label switching: compare sorted component means and the weight's
    # distance from 1/2
    mu1 = np.sort(np.median(np.asarray(s1["mu"]), axis=0))
    mu2 = np.sort(np.median(np.asarray(s2["mu"]), axis=0))
    assert np.allclose(mu1, mu2, atol=0.4), (mu1, mu2)
    w1 = abs(float(np.median(np.asarray(s1["w"]))) - 0.5)
    w2 = abs(float(np.median(np.asarray(s2["w"]))) - 0.5)
    assert abs(w1 - w2) < 0.15


def test_hmcecs_parity(ref):
    # covtype-shaped (small) logistic regression through HMCECS with the
    # Taylor proxy on both engines (BASELINE correctness row)
    rng = np.random.RandomState(6)
    N, D = 3000, 4
    X = jnp.asarray(rng.randn(N, D))
    w_true = np.array([1.0, -0.5, 0.25, 0.0])
    y = jnp.asarray((rng.rand(N) < 1 / (1 + np.exp(-X @ w_true))).astype(float))

    def make(mod, dist_mod):
        def model(X, y):
            w = mod.sample("w", dist_mod.Normal(jnp.zeros(D), 1.0).to_event(1))
            with mod.plate("N", N, subsample_size=300):
                xb = mod.subsample(X, event_dim=1)
                yb = mod.subsample(y, event_dim=0)
                mod.sample("y", dist_mod.Bernoulli(logits=xb @ w), obs=yb)

        return model

    import numpyro_tpu
    import numpyro_tpu.distributions as our_dist
    from numpyro_tpu.infer import MCMC as OM, NUTS as ON, HMCECS as OurECS

    our_model = make(numpyro_tpu, our_dist)
    our_ref_params = {"w": jnp.zeros(D)}
    our_proxy = OurECS.taylor_proxy(our_ref_params)
    m1 = OM(
        OurECS(ON(our_model), num_blocks=10, proxy=our_proxy),
        num_warmup=500,
        num_samples=1500,
        progress_bar=False,
    )
    m1.run(random.PRNGKey(0), X, y)

    import numpyro.distributions as ref_dist
    from numpyro.infer import MCMC as RM, NUTS as RN, HMCECS as RefECS

    ref_model = make(ref, ref_dist)
    ref_proxy = RefECS.taylor_proxy({"w": jnp.zeros(D)})
    m2 = RM(
        RefECS(RN(ref_model), num_blocks=10, proxy=ref_proxy),
        num_warmup=500,
        num_samples=1500,
        progress_bar=False,
    )
    m2.run(random.PRNGKey(0), X, y)

    # pseudo-marginal subsampling noise adds MC error beyond the chain's own
    # IQR, so the tolerance carries an absolute floor
    ours = _moments(m1.get_samples())["w"]
    refs = _moments(m2.get_samples())["w"]
    assert np.all(np.abs(ours[0] - refs[0]) < 0.6 * refs[1] + 0.05), (ours, refs)
    assert np.all(np.abs(ours[1] - refs[1]) < 0.6 * refs[1] + 0.02), (ours, refs)


def test_ensemble_kernel_parity(ref):
    # AIES and ESS ensemble samplers vs reference, on a correlated Gaussian
    rng = np.random.RandomState(7)
    cov = np.array([[1.0, 0.8], [0.8, 2.0]])
    y = jnp.asarray(rng.multivariate_normal([1.0, -1.0], cov, 50))

    def make(mod, dist_mod):
        def model(y):
            mu = mod.sample(
                "mu", dist_mod.Normal(jnp.zeros(2), 5.0).to_event(1)
            )
            with mod.plate("N", y.shape[0]):
                mod.sample(
                    "y",
                    dist_mod.MultivariateNormal(
                        mu, covariance_matrix=jnp.asarray(cov)
                    ),
                    obs=y,
                )

        return model

    import numpyro_tpu
    import numpyro_tpu.distributions as our_dist
    from numpyro_tpu.infer import AIES as OurAIES, ESS as OurESS, MCMC as OM

    import numpyro.distributions as ref_dist
    from numpyro.infer import AIES as RefAIES, ESS as RefESS, MCMC as RM

    our_model = make(numpyro_tpu, our_dist)
    ref_model = make(ref, ref_dist)
    for OurK, RefK in [(OurAIES, RefAIES), (OurESS, RefESS)]:
        m1 = OM(
            OurK(our_model),
            num_warmup=1000,
            num_samples=2000,
            num_chains=16,
            chain_method="vectorized",
            progress_bar=False,
        )
        m1.run(random.PRNGKey(0), y)
        m2 = RM(
            RefK(ref_model),
            num_warmup=1000,
            num_samples=2000,
            num_chains=16,
            chain_method="vectorized",
            progress_bar=False,
        )
        m2.run(random.PRNGKey(0), y)
        _assert_close(_moments(m1.get_samples()), _moments(m2.get_samples()))


def test_scan_time_series_parity(ref):
    # effectful-scan AR(1) model through NUTS on both engines
    rng = np.random.RandomState(8)
    T = 25
    xs = [0.0]
    for _ in range(T - 1):
        xs.append(0.7 * xs[-1] + 0.3 * rng.randn())
    obs = jnp.asarray(np.asarray(xs) + 0.1 * rng.randn(T))

    def make(mod, dist_mod, scan_fn):
        def model(obs):
            phi = mod.sample("phi", dist_mod.Uniform(-1.0, 1.0))
            q = mod.sample("q", dist_mod.HalfNormal(1.0))

            def transition(carry, y_t):
                x_prev = carry
                x_t = mod.sample("x", dist_mod.Normal(phi * x_prev, q))
                mod.sample("y", dist_mod.Normal(x_t, 0.1), obs=y_t)
                return x_t, x_t

            scan_fn("ts", transition, 0.0, obs)

        return model

    import numpyro_tpu
    import numpyro_tpu.distributions as our_dist
    from numpyro_tpu.contrib.control_flow import scan as our_scan

    import numpyro.distributions as ref_dist
    from numpyro.contrib.control_flow import scan as ref_scan

    def our_scan_fn(name, f, init, xs):
        return our_scan(f, init, xs)

    def ref_scan_fn(name, f, init, xs):
        return ref_scan(f, init, xs)

    _ab_nuts(
        ref,
        make(numpyro_tpu, our_dist, our_scan_fn),
        make(ref, ref_dist, ref_scan_fn),
        obs,
        warmup=600,
        samples=1200,
        sites={"phi", "q"},
    )


def test_mixed_hmc_parity(ref):
    # MixedHMC on a discrete+continuous posterior vs the reference
    rng = np.random.RandomState(9)
    y = jnp.asarray(np.concatenate([rng.normal(-2, 1, 25), rng.normal(2, 1, 25)]))

    def make(mod, dist_mod):
        def model(y):
            w = mod.sample("w", dist_mod.Beta(2.0, 2.0))
            mu = mod.sample("mu", dist_mod.Normal(jnp.zeros(2), 5.0).to_event(1))
            with mod.plate("N", y.shape[0]):
                z = mod.sample("z", dist_mod.Bernoulli(w))
                mod.sample("y", dist_mod.Normal(mu[z], 1.0), obs=y)

        return model

    import numpyro_tpu
    import numpyro_tpu.distributions as our_dist
    from numpyro_tpu.infer import HMC as OHMC, MCMC as OM, MixedHMC as OurMixed

    import numpyro.distributions as ref_dist
    from numpyro.infer import HMC as RHMC, MCMC as RM, MixedHMC as RefMixed

    m1 = OM(
        OurMixed(OHMC(make(numpyro_tpu, our_dist), trajectory_length=1.2)),
        num_warmup=600,
        num_samples=1500,
        progress_bar=False,
    )
    m1.run(random.PRNGKey(0), y)
    m2 = RM(
        RefMixed(RHMC(make(ref, ref_dist), trajectory_length=1.2)),
        num_warmup=600,
        num_samples=1500,
        progress_bar=False,
    )
    m2.run(random.PRNGKey(0), y)
    s1, s2 = m1.get_samples(), m2.get_samples()
    mu1 = np.sort(np.median(np.asarray(s1["mu"]), axis=0))
    mu2 = np.sort(np.median(np.asarray(s2["mu"]), axis=0))
    assert np.allclose(mu1, mu2, atol=0.4), (mu1, mu2)


def test_hmc_gibbs_user_fn_parity(ref):
    # user-supplied gibbs_fn updating a conjugate site, HMC on the rest
    rng = np.random.RandomState(10)
    y = jnp.asarray(rng.normal(1.0, 2.0, 60))

    def make(mod, dist_mod):
        def model(y):
            mu = mod.sample("mu", dist_mod.Normal(0.0, 10.0))
            prec = mod.sample("prec", dist_mod.Gamma(2.0, 2.0))
            with mod.plate("N", y.shape[0]):
                mod.sample(
                    "y", dist_mod.Normal(mu, 1.0 / jnp.sqrt(prec)), obs=y
                )

        def gibbs_fn(rng_key, gibbs_sites, hmc_sites):
            # exact conjugate update of prec | mu, y
            mu = hmc_sites["mu"]
            a = 2.0 + 0.5 * y.shape[0]
            b = 2.0 + 0.5 * jnp.sum((y - mu) ** 2)
            prec = dist_mod.Gamma(a, b).sample(rng_key)
            return {"prec": prec}

        return model, gibbs_fn

    import numpyro_tpu
    import numpyro_tpu.distributions as our_dist
    from numpyro_tpu.infer import HMCGibbs as OurGibbs, MCMC as OM, NUTS as ON

    import numpyro.distributions as ref_dist
    from numpyro.infer import HMCGibbs as RefGibbs, MCMC as RM, NUTS as RN

    our_model, our_gibbs = make(numpyro_tpu, our_dist)
    ref_model, ref_gibbs = make(ref, ref_dist)
    m1 = OM(
        OurGibbs(ON(our_model), gibbs_fn=our_gibbs, gibbs_sites=["prec"]),
        num_warmup=600,
        num_samples=1500,
        progress_bar=False,
    )
    m1.run(random.PRNGKey(0), y)
    m2 = RM(
        RefGibbs(RN(ref_model), gibbs_fn=ref_gibbs, gibbs_sites=["prec"]),
        num_warmup=600,
        num_samples=1500,
        progress_bar=False,
    )
    m2.run(random.PRNGKey(0), y)
    _assert_close(_moments(m1.get_samples()), _moments(m2.get_samples()))
