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
