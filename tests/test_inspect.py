"""Model-inspection tests (reference examples: infer/inspect.py docstrings)."""

import jax.numpy as jnp

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.infer.inspect import (
    generate_graph_specification,
    get_dependencies,
    get_model_relations,
)


def test_get_dependencies_simple():
    def model_1():
        a = numpyro_tpu.sample("a", dist.Normal(0, 1))
        numpyro_tpu.sample("b", dist.Normal(a, 1), obs=0.0)

    deps = get_dependencies(model_1)
    assert deps == {
        "prior_dependencies": {"a": {"a": set()}, "b": {"a": set(), "b": set()}},
        "posterior_dependencies": {"a": {"a": set(), "b": set()}},
    }


def test_get_dependencies_collider_moralization():
    def model_2():
        a = numpyro_tpu.sample("a", dist.Normal(0, 1))
        b = numpyro_tpu.sample("b", dist.LogNormal(0, 1))
        c = numpyro_tpu.sample("c", dist.Normal(a, b))
        numpyro_tpu.sample("d", dist.Normal(c, 1), obs=0.0)

    deps = get_dependencies(model_2)
    assert deps["posterior_dependencies"] == {
        "a": {"a": set(), "b": set(), "c": set()},
        "b": {"b": set(), "c": set()},
        "c": {"c": set(), "d": set()},
    }


def test_get_dependencies_plate_coupling():
    def model_3():
        with numpyro_tpu.plate("p", 5):
            a = numpyro_tpu.sample("a", dist.Normal(0, 1))
        numpyro_tpu.sample("b", dist.Normal(a.sum(), 1), obs=0.0)

    deps = get_dependencies(model_3)
    assert deps["posterior_dependencies"] == {"a": {"a": {"p"}, "b": set()}}


def test_get_model_relations_and_graph_spec():
    def model(data):
        m = numpyro_tpu.sample("m", dist.Normal(0, 1))
        sd = numpyro_tpu.sample("sd", dist.LogNormal(m, 1))
        with numpyro_tpu.plate("N", len(data)):
            numpyro_tpu.sample("obs", dist.Normal(m, sd), obs=data)

    rel = get_model_relations(model, (jnp.ones(3),))
    assert rel["sample_sample"] == {"m": [], "sd": ["m"], "obs": ["m", "sd"]}
    assert rel["plate_sample"] == {"N": ["obs"]}
    assert rel["observed"] == ["obs"]
    spec = generate_graph_specification(rel)
    assert ("m", "sd") in spec.edges
    assert spec.nodes["obs"].observed


def test_render_model_if_graphviz():
    try:
        import graphviz  # noqa: F401
    except ImportError:
        return

    def model(data):
        m = numpyro_tpu.sample("m", dist.Normal(0, 1))
        with numpyro_tpu.plate("N", len(data)):
            numpyro_tpu.sample("obs", dist.Normal(m, 1), obs=data)

    g = numpyro_tpu.render_model(model, (jnp.ones(3),))
    assert "obs" in g.source


def test_get_dependencies_factor_sites():
    def model():
        a = numpyro_tpu.sample("a", dist.Normal(0, 1))
        numpyro_tpu.factor("b", jnp.asarray(0.0))
        numpyro_tpu.factor("c", a)

    deps = get_dependencies(model)
    assert deps["prior_dependencies"] == {
        "a": {"a": set()},
        "b": {"b": set()},
        "c": {"c": set(), "a": set()},
    }
    assert deps["posterior_dependencies"] == {"a": {"a": set(), "c": set()}}


def test_get_dependencies_discrete_chain():
    def model():
        a = numpyro_tpu.sample("a", dist.Dirichlet(jnp.ones(3)))
        b = numpyro_tpu.sample("b", dist.Categorical(a))
        c = numpyro_tpu.sample("c", dist.Normal(jnp.zeros(3), 1).to_event(1))
        d = numpyro_tpu.sample("d", dist.Poisson(jnp.exp(c[b])))
        numpyro_tpu.sample("e", dist.Normal(d, 1), obs=jnp.ones(()))

    deps = get_dependencies(model)
    assert deps["prior_dependencies"] == {
        "a": {"a": set()},
        "b": {"a": set(), "b": set()},
        "c": {"c": set()},
        "d": {"b": set(), "c": set(), "d": set()},
        "e": {"d": set(), "e": set()},
    }
    assert deps["posterior_dependencies"] == {
        "a": {"a": set(), "b": set()},
        "b": {"b": set(), "c": set(), "d": set()},
        "c": {"c": set(), "d": set()},
        "d": {"d": set(), "e": set()},
    }


def test_get_dependencies_plate_collider():
    def model(data):
        i_plate = numpyro_tpu.plate("i", data.shape[0], dim=-2)
        j_plate = numpyro_tpu.plate("j", data.shape[1], dim=-1)
        with i_plate:
            x = numpyro_tpu.sample("x", dist.Normal(0, 1))
        with j_plate:
            y = numpyro_tpu.sample("y", dist.Normal(0, 1))
        with i_plate, j_plate:
            numpyro_tpu.sample("z", dist.Normal(x, jnp.exp(y)), obs=data)

    deps = get_dependencies(model, (jnp.ones((3, 2)),))
    _ = set()
    assert deps["posterior_dependencies"] == {
        "x": {"x": _, "y": _, "z": _},
        "y": {"y": _, "z": _},
    }


def test_get_dependencies_plate_dependency():
    # latents inside one plate stay plate-local in the posterior
    def model(data):
        w = numpyro_tpu.sample("w", dist.Normal(0, 1))
        with numpyro_tpu.plate("p", len(data)):
            x = numpyro_tpu.sample("x", dist.Normal(0, 1))
            y = numpyro_tpu.sample("y", dist.Normal(0, 1))
            numpyro_tpu.sample("z", dist.Normal(w + x + y, 1), obs=data)

    deps = get_dependencies(model, (jnp.ones(2),))
    _ = set()
    assert deps["posterior_dependencies"] == {
        "w": {"w": _, "x": _, "y": _, "z": _},
        "x": {"x": _, "y": _, "z": _},
        "y": {"y": _, "z": _},
    }


def test_get_dependencies_nested_plate_collider():
    def model():
        plate_i = numpyro_tpu.plate("i", 2, dim=-1)
        plate_j = numpyro_tpu.plate("j", 3, dim=-2)
        plate_k = numpyro_tpu.plate("k", 3, dim=-2)
        with plate_i:
            with plate_j:
                a = numpyro_tpu.sample("a", dist.Normal(0, 1))
            with plate_k:
                b = numpyro_tpu.sample("b", dist.Normal(0, 1))
            c = numpyro_tpu.sample("c", dist.Normal(a.sum(0) + b.sum([0, 1]), 1))
        numpyro_tpu.sample("d", dist.Normal(c.sum(), 1), obs=jnp.zeros(()))

    deps = get_dependencies(model)
    _ = set()
    assert deps["posterior_dependencies"] == {
        "a": {"a": {"j"}, "b": _, "c": _},
        "b": {"b": {"k"}, "c": _},
        "c": {"c": {"i"}, "d": _},
    }


def test_get_model_relations_deterministic_and_param():
    def model():
        w = numpyro_tpu.param("w", jnp.asarray(1.0))
        a = numpyro_tpu.sample("a", dist.Normal(w, 1))
        numpyro_tpu.deterministic("a2", a * 2)
        numpyro_tpu.sample("y", dist.Normal(a, 1), obs=jnp.asarray(0.0))

    rel = get_model_relations(model)
    assert "a2" in rel["sample_dist"] or "a2" in rel.get("deterministic", ())
    assert rel["sample_sample"]["y"] == ["a"]


def test_get_model_relations_scan_model():
    from numpyro_tpu.contrib.control_flow import scan

    def model(T):
        def transition(carry, _):
            z = numpyro_tpu.sample("z", dist.Normal(carry, 1.0))
            numpyro_tpu.sample("x", dist.Normal(z, 1.0), obs=jnp.asarray(0.0))
            return z, z

        scan(transition, jnp.asarray(0.0), None, length=T)

    rel = get_model_relations(model, (3,))
    assert "z" in rel["sample_sample"] and "x" in rel["sample_sample"]
    assert rel["observed"] == ["x"]
