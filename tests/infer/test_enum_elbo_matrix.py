"""Systematic TraceEnum_ELBO value+gradient matrix vs brute-force analytics.

Expands the hand-written grid in test_enum_gradient.py toward the coverage
of the reference's analytic suite (test/contrib/test_enum_elbo.py, 2509 LoC
of plate x markov x scale x mask permutations): every case here is built
from a (structure, distribution, scale, mask) tuple, the exact evidence is
computed by explicit enumeration with differentiable jnp ops, and both the
ELBO value and its parameter gradient must match.

Structures
  local    : z inside a depth-1 plate (elementwise independent)
  local2d  : z inside nested (-2, -1) plates
  global   : one z outside the plate, observations inside
  mixed    : global z1 + plate-local z2 both feeding the likelihood
  chain    : explicit python-loop markov chain, T in {2, 3, 4}
  scan     : the same HMM through contrib.control_flow.scan (parallel-scan
             enumeration path), including its gradient
  collider : independent z1, z2(, z3) summed into one emission
  hier     : z1 selecting the logits of z2 (two-layer discrete hierarchy)

Modifiers (applied via handlers, mirroring reference cases)
  scale on the observation site, scale on the latent site, partial mask on
  the observation site, partial mask on the latent site.
"""

import contextlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.contrib.control_flow import scan
from numpyro_tpu.infer import TraceEnum_ELBO

MUS = jnp.array([-1.2, 0.4, 1.7])
OBS3 = jnp.array([-0.5, 0.2, 1.1])
OBS23 = jnp.array([[-0.5, 0.2, 1.1], [0.7, -1.3, 0.0]])
XMASK3 = jnp.array([True, False, True])
ZMASK3 = jnp.array([False, True, True])
XMASK23 = jnp.array([[True, False, True], [False, True, True]])
SC = 2.3


def _bern_lp(logits):
    """(2,) enumeration log-probs of Bernoulli(logits)."""
    return jnp.stack(
        [-jax.nn.softplus(logits), -jax.nn.softplus(-logits)]
    )


def _cat_lp(logits):
    return jax.nn.log_softmax(logits)


def _z_lp(kind, params):
    """(K,) latent log-prob table and support size for the case family."""
    if kind == "bern":
        return _bern_lp(params["a"]), 2
    return _cat_lp(params["logits"]), 3


def _z_site(kind, params, name="z"):
    if kind == "bern":
        d = dist.Bernoulli(logits=params["a"])
    else:
        d = dist.Categorical(logits=params["logits"])
    return numpyro_tpu.sample(name, d, infer={"enumerate": "parallel"})


def _z_params(kind, seed=0.37):
    if kind == "bern":
        return {"a": jnp.array(seed)}
    return {"logits": jnp.array([0.1, -0.3, 0.5]) + seed}


def _maybe(handler_ctx):
    return handler_ctx if handler_ctx is not None else contextlib.nullcontext()


def _mods(z_scale, x_scale, z_mask, x_mask):
    zctx = []
    if z_scale is not None:
        zctx.append(numpyro_tpu.handlers.scale(scale=z_scale))
    if z_mask is not None:
        zctx.append(numpyro_tpu.handlers.mask(mask=z_mask))
    xctx = []
    if x_scale is not None:
        xctx.append(numpyro_tpu.handlers.scale(scale=x_scale))
    if x_mask is not None:
        xctx.append(numpyro_tpu.handlers.mask(mask=x_mask))
    return zctx, xctx


def _stacked(ctxs):
    es = contextlib.ExitStack()
    for c in ctxs:
        es.enter_context(c)
    return es


# --------------------------------------------------------------------------
# structure builders: each returns (model(params), exact(params), params, mpn)

def _build_local(kind, z_scale, x_scale, z_mask, x_mask):
    params = _z_params(kind)

    def model(**p):
        with numpyro_tpu.plate("N", 3):
            zc, xc = _mods(z_scale, x_scale, z_mask, x_mask)
            with _stacked(zc):
                z = _z_site(kind, p)
            with _stacked(xc):
                numpyro_tpu.sample(
                    "x", dist.Normal(MUS[z], 1.0), obs=OBS3
                )

    def exact(p):
        lp, K = _z_lp(kind, p)  # (K,)
        lz = lp[None, :] * (1.0 if z_scale is None else z_scale)
        if z_mask is not None:
            lz = jnp.where(z_mask[:, None], lz, 0.0)
        lx = dist.Normal(MUS[None, :K], 1.0).log_prob(OBS3[:, None])
        lx = lx * (1.0 if x_scale is None else x_scale)
        if x_mask is not None:
            lx = jnp.where(x_mask[:, None], lx, 0.0)
        return jnp.sum(jax.scipy.special.logsumexp(lz + lx, axis=-1))

    return model, exact, params, 1


def _build_local2d(kind, z_scale, x_scale, x_mask):
    params = _z_params(kind, seed=-0.2)

    def model(**p):
        with numpyro_tpu.plate("I", 2, dim=-2), numpyro_tpu.plate(
            "J", 3, dim=-1
        ):
            zc, xc = _mods(z_scale, x_scale, None, x_mask)
            with _stacked(zc):
                z = _z_site(kind, p)
            with _stacked(xc):
                numpyro_tpu.sample("x", dist.Normal(MUS[z], 1.0), obs=OBS23)

    def exact(p):
        lp, K = _z_lp(kind, p)
        lz = lp[None, None, :] * (1.0 if z_scale is None else z_scale)
        lx = dist.Normal(MUS[None, None, :K], 1.0).log_prob(OBS23[..., None])
        lx = lx * (1.0 if x_scale is None else x_scale)
        if x_mask is not None:
            lx = jnp.where(x_mask[..., None], lx, 0.0)
        return jnp.sum(jax.scipy.special.logsumexp(lz + lx, axis=-1))

    return model, exact, params, 2


def _build_global(kind, z_scale, x_scale, x_mask):
    params = _z_params(kind, seed=0.11)

    def model(**p):
        zc, xc = _mods(z_scale, x_scale, None, x_mask)
        with _stacked(zc):
            z = _z_site(kind, p)
        with numpyro_tpu.plate("N", 3), _stacked(xc):
            numpyro_tpu.sample("x", dist.Normal(MUS[z], 1.0), obs=OBS3)

    def exact(p):
        lp, K = _z_lp(kind, p)
        lz = lp * (1.0 if z_scale is None else z_scale)  # (K,)
        lx = dist.Normal(MUS[None, :K], 1.0).log_prob(OBS3[:, None])
        lx = lx * (1.0 if x_scale is None else x_scale)
        if x_mask is not None:
            lx = jnp.where(x_mask[:, None], lx, 0.0)
        return jax.scipy.special.logsumexp(lz + lx.sum(0))

    return model, exact, params, 1


def _build_mixed(kind, x_scale):
    # global z1 (Bernoulli) shifts the mean; plate-local z2 picks it
    params = {"a1": jnp.array(0.3), **_z_params(kind, seed=-0.4)}

    def model(**p):
        z1 = numpyro_tpu.sample(
            "z1", dist.Bernoulli(logits=p["a1"]),
            infer={"enumerate": "parallel"},
        )
        with numpyro_tpu.plate("N", 3):
            z2 = _z_site(kind, p, name="z2")
            _, xc = _mods(None, x_scale, None, None)
            with _stacked(xc):
                numpyro_tpu.sample(
                    "x",
                    dist.Normal(MUS[z2] + 0.5 * z1, 1.0),
                    obs=OBS3,
                )

    def exact(p):
        l1 = _bern_lp(p["a1"])  # (2,)
        lp2, K = _z_lp(kind, p)  # (K,)
        sc = 1.0 if x_scale is None else x_scale
        # (z1, j, z2)
        means = MUS[None, None, :K] + 0.5 * jnp.arange(2.0)[:, None, None]
        lx = dist.Normal(means, 1.0).log_prob(OBS3[None, :, None]) * sc
        inner = jax.scipy.special.logsumexp(
            lp2[None, None, :] + lx, axis=-1
        ).sum(-1)  # (z1,)
        return jax.scipy.special.logsumexp(l1 + inner)

    return model, exact, params, 1


def _build_chain(kind, T, x_scale):
    # markov chain over K states with Gaussian emissions (python loop)
    K = 2 if kind == "bern" else 3
    TRANS = jnp.linspace(-0.8, 0.9, 2 * K * K)[: K * K].reshape(K, K)
    obs = jnp.linspace(-1.0, 1.0, T)
    params = {"a": jnp.array(0.25), "trans": TRANS}

    def model(**p):
        if kind == "bern":
            z = numpyro_tpu.sample(
                "z_0", dist.Bernoulli(logits=p["a"]),
                infer={"enumerate": "parallel"},
            )
        else:
            z = numpyro_tpu.sample(
                "z_0",
                dist.Categorical(logits=jnp.broadcast_to(p["a"], (K,))),
                infer={"enumerate": "parallel"},
            )
        _, xc = _mods(None, x_scale, None, None)
        with _stacked(xc):
            numpyro_tpu.sample("x_0", dist.Normal(MUS[z], 1.0), obs=obs[0])
        for t in range(1, T):
            z = numpyro_tpu.sample(
                f"z_{t}", dist.Categorical(logits=p["trans"][z]),
                infer={"enumerate": "parallel"},
            )
            with _stacked(xc):
                numpyro_tpu.sample(
                    f"x_{t}", dist.Normal(MUS[z], 1.0), obs=obs[t]
                )

    def exact(p):
        sc = 1.0 if x_scale is None else x_scale
        if kind == "bern":
            init = _bern_lp(p["a"])
        else:
            init = _cat_lp(jnp.broadcast_to(p["a"], (K,)))
        emit = dist.Normal(MUS[None, :K], 1.0).log_prob(obs[:, None]) * sc
        ltrans = jax.nn.log_softmax(p["trans"], axis=-1)  # (prev, next)
        alpha = init + emit[0]
        for t in range(1, T):
            alpha = (
                jax.scipy.special.logsumexp(
                    alpha[:, None] + ltrans, axis=0
                )
                + emit[t]
            )
        return jax.scipy.special.logsumexp(alpha)

    return model, exact, params, 0


def _build_scan(kind, T):
    # the same HMM driven through contrib.control_flow.scan: exercises the
    # parallel-scan (logmatmulexp) elimination path INCLUDING its gradient
    K = 2 if kind == "bern" else 3
    TRANS = jnp.linspace(-0.8, 0.9, K * K).reshape(K, K)
    obs = jnp.linspace(-1.0, 1.0, T)
    params = {"init": jnp.linspace(-0.3, 0.4, K), "trans": TRANS}

    def model(**p):
        def transition(z_prev, x_t):
            logits = jnp.where(
                z_prev[..., None] < 0,
                p["init"],
                p["trans"][jnp.maximum(z_prev, 0)],
            )
            z = numpyro_tpu.sample(
                "z", dist.Categorical(logits=logits),
                infer={"enumerate": "parallel"},
            )
            numpyro_tpu.sample("x", dist.Normal(MUS[z], 1.0), obs=x_t)
            return z, None

        scan(transition, jnp.asarray(-1), obs, history=1)

    def exact(p):
        emit = dist.Normal(MUS[None, :K], 1.0).log_prob(obs[:, None])
        ltrans = jax.nn.log_softmax(p["trans"], axis=-1)
        alpha = jax.nn.log_softmax(p["init"]) + emit[0]
        for t in range(1, T):
            alpha = (
                jax.scipy.special.logsumexp(alpha[:, None] + ltrans, axis=0)
                + emit[t]
            )
        return jax.scipy.special.logsumexp(alpha)

    return model, exact, params, 0


def _build_collider(n_z, x_scale):
    params = {"a": jnp.array([0.2, -0.7, 0.4])[:n_z]}
    mus = jnp.linspace(-1.5, 1.5, n_z + 1)
    ob = jnp.array(0.3)

    def model(**p):
        total = 0
        for i in range(n_z):
            total = total + numpyro_tpu.sample(
                f"z{i}", dist.Bernoulli(logits=p["a"][i]),
                infer={"enumerate": "parallel"},
            )
        _, xc = _mods(None, x_scale, None, None)
        with _stacked(xc):
            numpyro_tpu.sample("x", dist.Normal(mus[total], 1.0), obs=ob)

    def exact(p):
        sc = 1.0 if x_scale is None else x_scale
        lps = [_bern_lp(p["a"][i]) for i in range(n_z)]
        # brute-force over the 2^n_z assignment grid
        total = None
        for bits in range(2**n_z):
            vals = [(bits >> i) & 1 for i in range(n_z)]
            lp = sum(lps[i][vals[i]] for i in range(n_z))
            lp = lp + sc * dist.Normal(mus[sum(vals)], 1.0).log_prob(ob)
            total = lp if total is None else jnp.logaddexp(total, lp)
        return total

    return model, exact, params, 0


def _build_hier3():
    # three-layer hierarchy: bern -> cat3 -> cat3 -> obs
    L1 = jnp.array([[0.2, -0.1, 0.4], [-0.5, 0.8, 0.0]])
    L2 = jnp.array(
        [[0.3, 0.0, -0.2], [-0.1, 0.5, 0.2], [0.6, -0.4, 0.1]]
    )
    ob = jnp.array(0.3)
    params = {"a": jnp.array(-0.1)}

    def model(**p):
        z1 = numpyro_tpu.sample(
            "z1", dist.Bernoulli(logits=p["a"]),
            infer={"enumerate": "parallel"},
        )
        z2 = numpyro_tpu.sample(
            "z2", dist.Categorical(logits=L1[z1]),
            infer={"enumerate": "parallel"},
        )
        z3 = numpyro_tpu.sample(
            "z3", dist.Categorical(logits=L2[z2]),
            infer={"enumerate": "parallel"},
        )
        numpyro_tpu.sample("x", dist.Normal(MUS[z3], 1.0), obs=ob)

    def exact(p):
        l1 = _bern_lp(p["a"])  # (2,)
        l2 = jax.nn.log_softmax(L1, -1)  # (2, 3)
        l3 = jax.nn.log_softmax(L2, -1)  # (3, 3)
        lx = dist.Normal(MUS, 1.0).log_prob(ob)  # (3,)
        return jax.scipy.special.logsumexp(
            l1[:, None, None] + l2[:, :, None] + l3[None, :, :] + lx
        )

    return model, exact, params, 0


def _build_hier_in_plate():
    # the two-layer hierarchy replicated independently inside a plate
    L1 = jnp.array([[0.2, -0.1, 0.4], [-0.5, 0.8, 0.0]])
    params = {"a": jnp.array(0.2)}

    def model(**p):
        with numpyro_tpu.plate("N", 3):
            z1 = numpyro_tpu.sample(
                "z1", dist.Bernoulli(logits=p["a"]),
                infer={"enumerate": "parallel"},
            )
            z2 = numpyro_tpu.sample(
                "z2", dist.Categorical(logits=L1[z1]),
                infer={"enumerate": "parallel"},
            )
            numpyro_tpu.sample("x", dist.Normal(MUS[z2], 1.0), obs=OBS3)

    def exact(p):
        l1 = _bern_lp(p["a"])  # (2,)
        l2 = jax.nn.log_softmax(L1, -1)  # (2, 3)
        lx = dist.Normal(MUS[None, None, :], 1.0).log_prob(
            OBS3[:, None, None]
        )  # (N, 1, 3) against (2, 3)
        per = jax.scipy.special.logsumexp(
            l1[None, :, None] + l2[None, :, :] + lx, axis=(-2, -1)
        )
        return per.sum()

    return model, exact, params, 1


# --------------------------------------------------------------------------
# assemble the matrix

def _register(cases, name, builder, *args):
    cases[name] = (builder, args)


CASES = {}
for kind in ("bern", "cat"):
    for zs, xs, zm, xm, tag in [
        (None, None, None, None, "plain"),
        (None, SC, None, None, "xscale"),
        (SC, None, None, None, "zscale"),
        (None, None, None, XMASK3, "xmask"),
        (None, None, ZMASK3, None, "zmask"),
        (SC, SC, None, XMASK3, "zscale_xscale_xmask"),
    ]:
        _register(
            CASES, f"local_{kind}_{tag}", _build_local, kind, zs, xs, zm, xm
        )
    for zs, xs, xm, tag in [
        (None, None, None, "plain"),
        (None, SC, None, "xscale"),
        (None, None, XMASK23, "xmask"),
        (SC, SC, XMASK23, "all"),
    ]:
        _register(
            CASES, f"local2d_{kind}_{tag}", _build_local2d, kind, zs, xs, xm
        )
    for zs, xs, xm, tag in [
        (None, None, None, "plain"),
        (None, SC, None, "xscale"),
        (SC, None, None, "zscale"),
        (None, None, XMASK3, "xmask"),
    ]:
        _register(
            CASES, f"global_{kind}_{tag}", _build_global, kind, zs, xs, xm
        )
    for xs, tag in [(None, "plain"), (SC, "xscale")]:
        _register(CASES, f"mixed_{kind}_{tag}", _build_mixed, kind, xs)
    for T in (2, 3, 4):
        for xs, tag in [(None, "plain"), (SC, "xscale")]:
            _register(
                CASES, f"chain_{kind}_T{T}_{tag}", _build_chain, kind, T, xs
            )
    for T in (3, 8):
        _register(CASES, f"scan_{kind}_T{T}", _build_scan, kind, T)
for n_z in (2, 3):
    for xs, tag in [(None, "plain"), (SC, "xscale")]:
        _register(CASES, f"collider_{n_z}_{tag}", _build_collider, n_z, xs)
_register(CASES, "hier3", _build_hier3)
_register(CASES, "hier_in_plate", _build_hier_in_plate)


def _loss_fn(model, mpn):
    def f(p):
        elbo = TraceEnum_ELBO(max_plate_nesting=mpn)
        return -elbo.loss(
            random.PRNGKey(0), {}, lambda: model(**p), lambda: None
        )

    return f


@pytest.mark.parametrize("name", list(CASES), ids=list(CASES))
def test_enum_matrix_value(name):
    builder, args = CASES[name]
    model, exact, params, mpn = builder(*args)
    got = _loss_fn(model, mpn)(params)
    want = exact(params)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("name", list(CASES), ids=list(CASES))
def test_enum_matrix_gradient(name):
    builder, args = CASES[name]
    model, exact, params, mpn = builder(*args)
    g_got = jax.grad(_loss_fn(model, mpn))(params)
    g_want = jax.grad(exact)(params)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(g_got[k]),
            np.asarray(g_want[k]),
            rtol=1e-4,
            atol=1e-5,
            err_msg=f"{name}: grad wrt {k}",
        )


# --------------------------------------------------------------------------
# guide-side enumeration: exact expectations over guide discretes
# (reference surface: numpyro/infer/elbo.py:1073 TraceEnum_ELBO guide
# enumeration).  Each case compares the ELBO value AND gradient against a
# fully-enumerated analytic expectation.

def _ge_loss(model, guide, mpn=None):
    def f(p):
        elbo = TraceEnum_ELBO(
            **({"max_plate_nesting": mpn} if mpn is not None else {})
        )
        return -elbo.loss(
            random.PRNGKey(0), {}, lambda: model(**p), lambda: guide(**p)
        )

    return f


def _ge_case_mixture():
    ob = jnp.array(0.3)

    def model(ql):
        z = numpyro_tpu.sample("z", dist.Bernoulli(0.4))
        numpyro_tpu.sample("x", dist.Normal(MUS[z], 1.0), obs=ob)

    def guide(ql):
        numpyro_tpu.sample(
            "z", dist.Bernoulli(logits=ql), infer={"enumerate": "parallel"}
        )

    def exact(p):
        lq = _bern_lp(p["ql"])
        lp = jnp.stack([jnp.log(0.6), jnp.log(0.4)])
        lx = dist.Normal(MUS[:2], 1.0).log_prob(ob)
        return jnp.sum(jnp.exp(lq) * (lp + lx - lq))

    return model, guide, exact, {"ql": jnp.array(0.2)}, None


def _ge_case_plate():
    def model(ql):
        with numpyro_tpu.plate("N", 3):
            z = numpyro_tpu.sample("z", dist.Bernoulli(0.4))
            numpyro_tpu.sample("x", dist.Normal(MUS[z], 1.0), obs=OBS3)

    def guide(ql):
        with numpyro_tpu.plate("N", 3):
            numpyro_tpu.sample(
                "z",
                dist.Bernoulli(logits=ql * jnp.ones(3)),
                infer={"enumerate": "parallel"},
            )

    def exact(p):
        lq = _bern_lp(p["ql"])  # (2,)
        lp = jnp.stack([jnp.log(0.6), jnp.log(0.4)])
        lx = dist.Normal(MUS[None, :2], 1.0).log_prob(OBS3[:, None])  # (N,2)
        per = jnp.sum(
            jnp.exp(lq)[None, :] * (lp[None, :] + lx - lq[None, :]), axis=-1
        )
        return per.sum()

    return model, guide, exact, {"ql": jnp.array(-0.3)}, 1


def _ge_case_guide_chain():
    # conditional guide q(z1) q(z2 | z1): contraction must integrate the
    # child out before the parent
    L = jnp.array([0.6, -0.8])  # guide logits of z2=1 given z1
    ob = jnp.array(0.4)

    def model(ql):
        z1 = numpyro_tpu.sample("z1", dist.Bernoulli(0.45))
        z2 = numpyro_tpu.sample("z2", dist.Bernoulli(0.3 + 0.4 * z1))
        numpyro_tpu.sample("x", dist.Normal(MUS[z1 + z2], 0.9), obs=ob)

    def guide(ql):
        z1 = numpyro_tpu.sample(
            "z1", dist.Bernoulli(logits=ql), infer={"enumerate": "parallel"}
        )
        numpyro_tpu.sample(
            "z2",
            dist.Bernoulli(logits=L[z1]),
            infer={"enumerate": "parallel"},
        )

    def exact(p):
        lq1 = _bern_lp(p["ql"])
        total = 0.0
        for a in range(2):
            lq2 = _bern_lp(L[a])
            p2 = 0.3 + 0.4 * a
            lp2 = jnp.stack([jnp.log1p(-p2), jnp.log(p2)])
            for b in range(2):
                w = jnp.exp(lq1[a] + lq2[b])
                lp1 = jnp.log(jnp.where(a, 0.45, 0.55))
                term = (
                    lp1
                    + lp2[b]
                    + dist.Normal(MUS[a + b], 0.9).log_prob(ob)
                    - lq1[a]
                    - lq2[b]
                )
                total = total + w * term
        return total

    return model, guide, exact, {"ql": jnp.array(0.1)}, None


def _ge_case_mixed_model_enum():
    # guide enumerates z_g; the model ALSO has its own enumerable discrete
    # z_m (absent from the guide) that must be logsumexp-eliminated inside
    # log p before the expectation
    ob = jnp.array(0.2)

    def model(ql):
        zg = numpyro_tpu.sample("zg", dist.Bernoulli(0.4))
        zm = numpyro_tpu.sample(
            "zm", dist.Bernoulli(0.3), infer={"enumerate": "parallel"}
        )
        numpyro_tpu.sample("x", dist.Normal(MUS[zg + zm], 1.0), obs=ob)

    def guide(ql):
        numpyro_tpu.sample(
            "zg", dist.Bernoulli(logits=ql), infer={"enumerate": "parallel"}
        )

    def exact(p):
        lq = _bern_lp(p["ql"])
        lpg = jnp.stack([jnp.log(0.6), jnp.log(0.4)])
        lpm = jnp.stack([jnp.log(0.7), jnp.log(0.3)])
        total = 0.0
        for g in range(2):
            # log p(x, zg) with zm summed out
            inner = jax.scipy.special.logsumexp(
                lpm + dist.Normal(MUS[g + jnp.arange(2)], 1.0).log_prob(ob)
            )
            total = total + jnp.exp(lq[g]) * (lpg[g] + inner - lq[g])
        return total

    return model, guide, exact, {"ql": jnp.array(-0.15)}, None


def _ge_case_with_continuous():
    # enumerated discrete + reparameterized continuous site in the guide:
    # Delta guide on w makes the continuous part deterministic, so the
    # whole ELBO still has a closed form
    w0 = jnp.array(0.37)
    ob = jnp.array(0.1)

    def model(ql):
        w = numpyro_tpu.sample("w", dist.Normal(0.0, 1.0))
        z = numpyro_tpu.sample("z", dist.Bernoulli(0.35))
        numpyro_tpu.sample("x", dist.Normal(MUS[z] + w, 1.0), obs=ob)

    def guide(ql):
        numpyro_tpu.sample("w", dist.Delta(w0))
        numpyro_tpu.sample(
            "z", dist.Bernoulli(logits=ql), infer={"enumerate": "parallel"}
        )

    def exact(p):
        lq = _bern_lp(p["ql"])
        lp = jnp.stack([jnp.log(0.65), jnp.log(0.35)])
        lw = dist.Normal(0.0, 1.0).log_prob(w0)
        lx = dist.Normal(MUS[:2] + w0, 1.0).log_prob(ob)
        return lw + jnp.sum(jnp.exp(lq) * (lp + lx - lq))

    return model, guide, exact, {"ql": jnp.array(0.45)}, None


GUIDE_ENUM_CASES = {
    "mixture": _ge_case_mixture,
    "plate": _ge_case_plate,
    "guide_chain": _ge_case_guide_chain,
    "mixed_model_enum": _ge_case_mixed_model_enum,
    "with_continuous": _ge_case_with_continuous,
}


@pytest.mark.parametrize(
    "name", list(GUIDE_ENUM_CASES), ids=list(GUIDE_ENUM_CASES)
)
def test_guide_enum_value(name):
    model, guide, exact, params, mpn = GUIDE_ENUM_CASES[name]()
    got = _ge_loss(model, guide, mpn)(params)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(exact(params)), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize(
    "name", list(GUIDE_ENUM_CASES), ids=list(GUIDE_ENUM_CASES)
)
def test_guide_enum_gradient(name):
    model, guide, exact, params, mpn = GUIDE_ENUM_CASES[name]()
    g_got = jax.grad(_ge_loss(model, guide, mpn))(params)
    g_want = jax.grad(exact)(params)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(g_got[k]), np.asarray(g_want[k]),
            rtol=1e-4, atol=1e-5, err_msg=f"{name}: grad wrt {k}",
        )
