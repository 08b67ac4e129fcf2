"""Behavioral suite for the 14 effect handlers (reference strategy:
test/test_handlers.py — each handler is exercised through the public model
surface, asserting on traces and densities rather than internals)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu import handlers
from numpyro_tpu.infer import SVI, Trace_ELBO
from numpyro_tpu.infer.reparam import LocScaleReparam, TransformReparam
from numpyro_tpu.infer.util import log_density
from numpyro_tpu.optim import Adam


def simple_model(data=None):
    mu = numpyro_tpu.sample("mu", dist.Normal(0.0, 1.0))
    with numpyro_tpu.plate("N", 5):
        numpyro_tpu.sample("x", dist.Normal(mu, 1.0), obs=data)
    numpyro_tpu.deterministic("mu2", mu * 2)
    return mu


# ---------------------------------------------------------------- trace


def test_trace_records_sites():
    tr = handlers.trace(handlers.seed(simple_model, 0)).get_trace()
    assert {"mu", "x", "mu2"} <= set(tr)
    assert tr["mu"]["type"] == "sample" and not tr["mu"]["is_observed"]
    assert tr["x"]["value"].shape == (5,)
    assert tr["mu2"]["type"] == "deterministic"
    np.testing.assert_allclose(tr["mu2"]["value"], tr["mu"]["value"] * 2)


def test_trace_observed_flag():
    data = jnp.ones(5)
    tr = handlers.trace(handlers.seed(simple_model, 0)).get_trace(data)
    assert tr["x"]["is_observed"]
    np.testing.assert_array_equal(tr["x"]["value"], data)


# ---------------------------------------------------------------- replay


def test_replay_reproduces_values():
    tr = handlers.trace(handlers.seed(simple_model, 0)).get_trace()
    replayed = handlers.trace(
        handlers.replay(handlers.seed(simple_model, 1), tr)
    ).get_trace()
    np.testing.assert_array_equal(replayed["mu"]["value"], tr["mu"]["value"])


def test_replay_only_matching_sites():
    def model2():
        numpyro_tpu.sample("mu", dist.Normal(0, 1))
        numpyro_tpu.sample("extra", dist.Normal(0, 1))

    tr = handlers.trace(handlers.seed(simple_model, 0)).get_trace()
    out = handlers.trace(handlers.replay(handlers.seed(model2, 7), tr)).get_trace()
    np.testing.assert_array_equal(out["mu"]["value"], tr["mu"]["value"])
    assert "extra" in out


# ---------------------------------------------------------------- block


@pytest.mark.parametrize(
    "kwargs, hidden, visible",
    [
        (dict(hide=["mu"]), ["mu"], ["x", "mu2"]),
        (dict(expose=["mu"]), ["x", "mu2"], ["mu"]),
        (dict(expose_types=["sample"]), ["mu2"], ["mu", "x"]),
        (dict(hide_fn=lambda m: m["name"] == "x"), ["x"], ["mu", "mu2"]),
        (dict(), ["mu", "x", "mu2"], []),
    ],
)
def test_block_selectors(kwargs, hidden, visible):
    tr = handlers.trace(
        handlers.block(handlers.seed(simple_model, 0), **kwargs)
    ).get_trace()
    for name in hidden:
        assert name not in tr
    for name in visible:
        assert name in tr


def test_block_still_draws_keys():
    # a blocked latent still gets a PRNG key from the outer seed
    def model():
        x = numpyro_tpu.sample("x", dist.Normal(0, 1))
        y = numpyro_tpu.sample("y", dist.Normal(x, 1))
        return x, y

    x, y = handlers.seed(handlers.block(model, hide=["x"]), 0)()
    assert np.isfinite(x) and np.isfinite(y)


# ------------------------------------------------ condition / substitute


def test_condition_marks_observed():
    tr = handlers.trace(
        handlers.condition(handlers.seed(simple_model, 0), data={"mu": 0.3})
    ).get_trace()
    assert tr["mu"]["is_observed"]
    np.testing.assert_allclose(tr["mu"]["value"], 0.3)


def test_substitute_not_observed():
    tr = handlers.trace(
        handlers.substitute(handlers.seed(simple_model, 0), data={"mu": 0.3})
    ).get_trace()
    assert not tr["mu"]["is_observed"]
    np.testing.assert_allclose(tr["mu"]["value"], 0.3)


def test_substitute_fn():
    tr = handlers.trace(
        handlers.substitute(
            handlers.seed(simple_model, 0),
            substitute_fn=lambda site: (
                jnp.asarray(1.5) if site["type"] == "sample" else None
            ),
        )
    ).get_trace()
    np.testing.assert_allclose(tr["mu"]["value"], 1.5)


def test_condition_affects_downstream():
    def model():
        a = numpyro_tpu.sample("a", dist.Normal(0, 1))
        return numpyro_tpu.sample("b", dist.Delta(a * 10))

    b = handlers.seed(handlers.condition(model, data={"a": 2.0}), 0)()
    np.testing.assert_allclose(b, 20.0)


# ---------------------------------------------------------- infer_config


def test_infer_config():
    cfg = handlers.infer_config(
        handlers.seed(simple_model, 0),
        config_fn=lambda msg: {"tagged": msg["name"] == "mu"},
    )
    tr = handlers.trace(cfg).get_trace()
    assert tr["mu"]["infer"]["tagged"] is True
    assert tr["x"]["infer"]["tagged"] is False


# ------------------------------------------------------------------ lift


def param_model():
    w = numpyro_tpu.param("w", jnp.zeros(3))
    b = numpyro_tpu.param("b", 0.0)
    return w, b


@pytest.mark.parametrize(
    "prior",
    [
        dist.Normal(0.0, 1.0),
        {"w": dist.Normal(0.0, 1.0), "b": dist.Cauchy(0.0, 1.0)},
        {"w": dist.Normal(0.0, 1.0)},
    ],
)
def test_lift_param_to_sample(prior):
    tr = handlers.trace(handlers.seed(handlers.lift(param_model, prior=prior), 0)).get_trace()
    lifted = set(prior) if isinstance(prior, dict) else {"w", "b"}
    for name in ("w", "b"):
        assert tr[name]["type"] == ("sample" if name in lifted else "param")
    # lifted sites draw from the prior as-is (reference semantics: the prior's
    # shape replaces the init shape)
    assert tr["w"]["value"].shape == dist.Normal(0.0, 1.0).shape()


def test_lift_samples_cached_within_run():
    def model():
        a = numpyro_tpu.param("w", jnp.zeros(2))
        b = numpyro_tpu.param("w", jnp.zeros(2))
        return a, b

    a, b = handlers.seed(handlers.lift(model, prior=dist.Normal(0, 1)), 0)()
    np.testing.assert_array_equal(a, b)


# ------------------------------------------------------------------ mask


def test_mask_zeroes_log_density():
    def model(m):
        with handlers.mask(mask=m):
            numpyro_tpu.sample("x", dist.Normal(0, 1), obs=jnp.array(2.0))

    ld_on, _ = log_density(model, (True,), {}, {})
    ld_off, _ = log_density(model, (False,), {}, {})
    np.testing.assert_allclose(ld_on, dist.Normal(0, 1).log_prob(2.0))
    np.testing.assert_allclose(ld_off, 0.0)


def test_mask_elementwise_and_nested():
    obs = jnp.arange(4.0)
    m1 = jnp.array([True, False, True, True])
    m2 = jnp.array([True, True, False, True])

    def model():
        with handlers.mask(mask=m1), handlers.mask(mask=m2):
            with numpyro_tpu.plate("N", 4):
                numpyro_tpu.sample("x", dist.Normal(0, 1), obs=obs)

    ld, _ = log_density(model, (), {}, {})
    expected = jnp.sum(dist.Normal(0, 1).log_prob(obs) * (m1 & m2))
    np.testing.assert_allclose(ld, expected, rtol=1e-6)


def test_get_mask_inside_model():
    seen = {}

    def model():
        seen["mask"] = numpyro_tpu.get_mask()

    with handlers.mask(mask=False):
        model()
    assert seen["mask"] is False


# --------------------------------------------------------------- reparam


def test_reparam_loc_scale_decenters():
    def model():
        mu = numpyro_tpu.sample("mu", dist.Normal(0, 1))
        with handlers.reparam(config={"theta": LocScaleReparam(0.0)}):
            numpyro_tpu.sample("theta", dist.Normal(mu, 2.0))

    tr = handlers.trace(handlers.seed(model, 0)).get_trace()
    assert "theta_decentered" in tr
    assert tr["theta"]["type"] == "deterministic"


def test_reparam_transform_matches_density():
    def model():
        with handlers.reparam(config={"x": TransformReparam()}):
            numpyro_tpu.sample(
                "x",
                dist.TransformedDistribution(
                    dist.Normal(0.0, 1.0),
                    dist.transforms.AffineTransform(3.0, 2.0),
                ),
            )

    tr = handlers.trace(handlers.seed(model, 0)).get_trace()
    np.testing.assert_allclose(
        tr["x"]["value"], 3.0 + 2.0 * tr["x_base"]["value"], rtol=1e-6
    )


# ----------------------------------------------------------------- scale


def test_scale_multiplies_log_density():
    def model(s):
        with handlers.scale(scale=s):
            numpyro_tpu.sample("x", dist.Normal(0, 1), obs=jnp.array(1.0))

    base = dist.Normal(0, 1).log_prob(1.0)
    for s in (0.5, 2.0, 10.0):
        ld, _ = log_density(model, (s,), {}, {})
        np.testing.assert_allclose(ld, s * base, rtol=1e-6)


def test_scale_nested_compounds():
    def model():
        with handlers.scale(scale=2.0), handlers.scale(scale=3.0):
            numpyro_tpu.sample("x", dist.Normal(0, 1), obs=jnp.array(1.0))

    ld, _ = log_density(model, (), {}, {})
    np.testing.assert_allclose(ld, 6.0 * dist.Normal(0, 1).log_prob(1.0), rtol=1e-6)


def test_scale_rejects_nonpositive():
    with pytest.raises(ValueError):
        handlers.scale(scale=-1.0)


# ----------------------------------------------------------------- scope


def test_scope_prefixes_names():
    tr = handlers.trace(
        handlers.scope(handlers.seed(simple_model, 0), prefix="outer")
    ).get_trace()
    assert {"outer/mu", "outer/x", "outer/mu2"} <= set(tr)
    assert not any(k in tr for k in ("mu", "x", "mu2"))


def test_scope_nested_and_divider():
    def model():
        numpyro_tpu.sample("x", dist.Normal(0, 1))

    tr = handlers.trace(
        handlers.scope(
            handlers.scope(handlers.seed(model, 0), prefix="in"),
            prefix="out",
            divider=".",
        )
    ).get_trace()
    assert list(tr) == ["out.in/x"]


def test_scope_renames_plate_frames():
    def model():
        with numpyro_tpu.plate("N", 3):
            numpyro_tpu.sample("x", dist.Normal(0, 1))

    tr = handlers.trace(handlers.scope(handlers.seed(model, 0), prefix="s")).get_trace()
    frames = tr["s/x"]["cond_indep_stack"]
    assert frames[0].name == "s/N"


# ------------------------------------------------------------------ seed


def test_seed_reproducible():
    v1 = handlers.seed(simple_model, 11)()
    v2 = handlers.seed(simple_model, 11)()
    v3 = handlers.seed(simple_model, 12)()
    np.testing.assert_array_equal(v1, v2)
    assert not np.allclose(v1, v3)


def test_seed_accepts_key_and_rejects_junk():
    handlers.seed(simple_model, random.PRNGKey(0))()
    with pytest.raises(TypeError):
        handlers.seed(simple_model, "zero")
    with pytest.raises(TypeError):
        handlers.seed(simple_model, jnp.zeros(3))


def test_prng_key_inside_seed():
    def model():
        return numpyro_tpu.prng_key()

    k = handlers.seed(model, 0)()
    assert k is not None
    assert handlers.seed(model, 0)() is not None


# -------------------------------------------------------------------- do


def test_do_intervention_value_flows_downstream():
    def model():
        a = numpyro_tpu.sample("a", dist.Normal(0, 1))
        b = numpyro_tpu.sample("b", dist.Delta(a * 10))
        return a, b

    with handlers.trace() as tr, handlers.seed(rng_seed=0), handlers.do(
        data={"a": 2.0}
    ):
        a, b = model()
    # downstream sees the intervened value ...
    np.testing.assert_allclose(b, 20.0)
    # ... but the recorded site keeps the *un-intervened* draw
    assert not np.allclose(tr["a"]["value"], 2.0)


def test_do_double_intervention_warns():
    def model():
        numpyro_tpu.sample("a", dist.Normal(0, 1))

    with pytest.warns(RuntimeWarning):
        with handlers.seed(rng_seed=0), handlers.do(data={"a": 1.0}), handlers.do(
            data={"a": 2.0}
        ):
            model()


# ------------------------------------------------- primitives round out


def test_factor_adds_log_density():
    def model(c):
        numpyro_tpu.factor("f", c)

    ld, _ = log_density(model, (jnp.asarray(-3.7),), {}, {})
    np.testing.assert_allclose(ld, -3.7)


def test_mutable_state_roundtrip():
    def model():
        s = numpyro_tpu.mutable("state", {"count": jnp.asarray(0.0)})
        s["count"] = s["count"] + 1

    tr = handlers.trace(model).get_trace()
    np.testing.assert_allclose(tr["state"]["value"]["count"], 1.0)


def test_obs_mask_splits_site():
    data = jnp.array([1.0, 2.0, 3.0])
    m = jnp.array([True, False, True])

    def model():
        with numpyro_tpu.plate("N", 3):
            numpyro_tpu.sample("x", dist.Normal(0, 1), obs=data, obs_mask=m)

    tr = handlers.trace(handlers.seed(model, 0)).get_trace()
    assert "x_observed" in tr and "x_unobserved" in tr
    # merged deterministic value uses data where observed
    np.testing.assert_array_equal(tr["x"]["value"][m], data[m])


def test_plate_scale_under_subsample():
    data = jnp.arange(10.0)

    def model():
        with numpyro_tpu.plate("N", 10, subsample_size=5):
            batch = numpyro_tpu.subsample(data, event_dim=0)
            numpyro_tpu.sample("x", dist.Normal(0, 1), obs=batch)

    tr = handlers.trace(handlers.seed(model, 0)).get_trace()
    assert tr["x"]["value"].shape == (5,)
    assert tr["x"]["scale"] == 2.0  # size / subsample_size


# -------------------------------------------- handlers compose with SVI


def test_handlers_compose_with_svi_step():
    def model(data):
        mu = numpyro_tpu.sample("mu", dist.Normal(0, 10))
        with numpyro_tpu.plate("N", data.shape[0]):
            numpyro_tpu.sample("obs", dist.Normal(mu, 1), obs=data)

    def guide(data):
        loc = numpyro_tpu.param("loc", 0.0)
        numpyro_tpu.sample("mu", dist.Delta(loc))

    data = jnp.ones(8)
    scaled_model = handlers.scale(model, scale=0.5)
    scaled_guide = handlers.scale(guide, scale=0.5)
    svi = SVI(scaled_model, scaled_guide, Adam(0.1), Trace_ELBO())
    state = svi.init(random.PRNGKey(0), data)
    state, loss = jax.jit(svi.update)(state, data)
    assert np.isfinite(loss)


def test_trace_jit_composability():
    # handlers must be traceable under jit (no Python-side leaks)
    def fn(key):
        tr = handlers.trace(handlers.seed(simple_model, key)).get_trace()
        return tr["mu"]["value"]

    v = jax.jit(fn)(random.PRNGKey(3))
    assert np.isfinite(v)
