"""Model inspection: dependency graphs, relation summaries, graphviz render.

Reference surface: numpyro/infer/inspect.py:74-652.  Dependencies are
discovered by provenance tracking (ops/provenance.py) over the per-site
log-prob computation — abstract interpretation only, no array math runs.
"""

from __future__ import annotations

import itertools
from functools import partial
from pathlib import Path

import jax

import numpyro_tpu.distributions as dist
from numpyro_tpu import handlers
from numpyro_tpu.infer.initialization import init_to_sample
from numpyro_tpu.ops.provenance import eval_provenance
from numpyro_tpu.ops.pytree import PytreeTrace

__all__ = ["get_dependencies", "get_model_relations", "render_model"]


def _dist_name(fn):
    while isinstance(
        fn, (dist.Independent, dist.ExpandedDistribution, dist.MaskedDistribution)
    ):
        fn = fn.base_dist
    return type(fn).__name__


def _is_sample_site(msg):
    return msg["type"] == "sample" and msg["fn_name"] != "Delta"


def _abstract_trace(model, model_args, model_kwargs):
    """Trace the model under jax.eval_shape — shapes only, zero flops."""

    def get_trace():
        subs_model = handlers.substitute(
            handlers.seed(model, 0), substitute_fn=init_to_sample()
        )
        tr = handlers.trace(subs_model).get_trace(*model_args, **model_kwargs)
        for site in tr.values():
            if site["type"] == "sample":
                site["fn_name"] = _dist_name(site.pop("fn"))
            elif site["type"] == "deterministic":
                site["fn_name"] = "Deterministic"
        return PytreeTrace(tr)

    return jax.eval_shape(get_trace).trace


def _site_log_probs(model, model_args, model_kwargs, **sample):
    with (
        handlers.trace() as tr,
        handlers.seed(rng_seed=0),
        handlers.substitute(data=sample),
    ):
        model(*model_args, **model_kwargs)
    return {
        name: site["fn"].log_prob(site["value"])
        for name, site in tr.items()
        if site["type"] == "sample"
    }


def get_dependencies(model, model_args=None, model_kwargs=None):
    """Infer prior and posterior dependency structure of a conditioned model
    (reference: infer/inspect.py:74; Webb et al. 2018 for moralization).

    Returns ``{"prior_dependencies": ..., "posterior_dependencies": ...}``
    where each maps downstream site -> {upstream site -> set of plates
    inducing full cross-element dependence}.
    """
    model_args = model_args or ()
    model_kwargs = model_kwargs or {}

    trace = _abstract_trace(model, model_args, model_kwargs)
    sample_sites = [msg for msg in trace.values() if _is_sample_site(msg)]
    observed = {msg["name"] for msg in sample_sites if msg["is_observed"]}
    plates = {
        msg["name"]: {f.name for f in msg["cond_indep_stack"]}
        for msg in sample_sites
    }

    samples = {
        name: site["value"]
        for name, site in trace.items()
        if site["type"] == "sample" and not site["is_observed"]
    }
    sample_deps = eval_provenance(
        partial(_site_log_probs, model, model_args, model_kwargs), **samples
    )

    prior_dependencies = {n: {n: set()} for n in plates}
    for i, downstream in enumerate(sample_sites):
        upstreams = [
            u
            for u in sample_sites[:i]
            if not u["is_observed"] and u["fn_name"] != "Unit"
        ]
        if not upstreams:
            continue
        provenance = sample_deps[downstream["name"]]
        for upstream in upstreams:
            if upstream["name"] in provenance:
                prior_dependencies[downstream["name"]][upstream["name"]] = set()

    # reverse for the posterior, keeping only latent downstream nodes
    posterior_dependencies = {n: {} for n in plates if n not in observed}
    for d, upstreams in prior_dependencies.items():
        for u, p in upstreams.items():
            if u not in observed:
                posterior_dependencies[u][d] = p.copy()

    # moralize: connect co-parents within each Markov blanket
    order = {msg["name"]: i for i, msg in enumerate(reversed(sample_sites))}
    for d, upstreams in prior_dependencies.items():
        upstreams = {u: p for u, p in upstreams.items() if u not in observed}
        for u1, p1 in upstreams.items():
            for u2, p2 in upstreams.items():
                if order[u1] <= order[u2]:
                    p12 = posterior_dependencies[u2].setdefault(u1, set())
                    p12 |= plates[u1] & plates[u2] - plates[d]
                    p12 |= plates[u2] & p1
                    p12 |= plates[u1] & p2

    return {
        "prior_dependencies": prior_dependencies,
        "posterior_dependencies": posterior_dependencies,
    }


def get_model_relations(model, model_args=None, model_kwargs=None):
    """Summarize sample/param/plate relations of a model
    (reference: infer/inspect.py:258).  Returns a dict with keys
    ``sample_sample, sample_param, sample_dist, param_constraint,
    plate_sample, observed``."""
    model_args = model_args or ()
    model_kwargs = model_kwargs or {}

    trace = _abstract_trace(model, model_args, model_kwargs)
    obs_sites = [
        name
        for name, site in trace.items()
        if site["type"] == "sample" and site["is_observed"]
    ]
    sample_dist = {
        name: site["fn_name"]
        for name, site in trace.items()
        if site["type"] in ("sample", "deterministic")
    }
    sample_plates = {
        name: [frame.name for frame in site["cond_indep_stack"]]
        for name, site in trace.items()
        if site["type"] in ("sample", "deterministic")
    }
    plate_samples = {
        k: {name for name, ps in sample_plates.items() if k in ps}
        for k, site in trace.items()
        if site["type"] == "plate"
    }

    def _split_interleaved(plate_samples):
        # plates that partially overlap get a __CLONE marker (display only)
        for p, pv in plate_samples.items():
            for q, qv in plate_samples.items():
                if pv & qv and pv - qv and qv - pv:
                    out = plate_samples.copy()
                    out[q] = pv & qv
                    out[q + "__CLONE"] = qv - pv
                    return _split_interleaved(out)
        return plate_samples

    plate_samples = _split_interleaved(plate_samples)
    plate_samples = {
        k: [name for name in trace if name in v] for k, v in plate_samples.items()
    }

    def get_log_probs(**sample):
        class substitute_deterministic(handlers.substitute):
            def process_message(self, msg):
                if msg["type"] == "deterministic":
                    msg["args"] = (msg["value"],)
                    msg["kwargs"] = {}
                    msg["value"] = self.data.get(msg["name"])
                    msg["fn"] = lambda x: x

        with handlers.trace() as tr, handlers.seed(rng_seed=0):
            with (
                handlers.substitute(data=sample),
                substitute_deterministic(data=sample),
            ):
                model(*model_args, **model_kwargs)
        out = {}
        for name, site in tr.items():
            if site["type"] == "sample":
                out[name] = site["fn"].log_prob(site["value"])
            elif site["type"] == "deterministic":
                out[name] = site["args"][0]
        return out

    samples = {
        name: site["value"]
        for name, site in trace.items()
        if site["type"] in ("sample", "deterministic")
    }
    params = {
        name: site["value"] for name, site in trace.items() if site["type"] == "param"
    }
    deps = eval_provenance(get_log_probs, **samples, **params)

    sample_sample = {
        name: [v for v in sample_dist if v in deps[name] and v != name]
        for name in sample_dist
    }
    sample_param = {
        name: [v for v in deps[name] if v in params] for name in sample_dist
    }
    param_constraint = {}
    for param in params:
        if "constraint" in trace[param]["kwargs"]:
            param_constraint[param] = str(trace[param]["kwargs"]["constraint"])
        else:
            param_constraint[param] = ""

    return {
        "sample_sample": sample_sample,
        "sample_param": sample_param,
        "sample_dist": sample_dist,
        "param_constraint": param_constraint,
        "plate_sample": plate_samples,
        "observed": obs_sites,
    }


def generate_graph_specification(model_relations, render_params=False):
    """Convert model relations into plate/node/edge structures for rendering
    (reference: infer/inspect.py:428)."""
    plate_groups = dict(model_relations["plate_sample"])
    plate_rvs = {rv for rvs in plate_groups.values() for rv in rvs}
    plate_groups[None] = [
        rv for rv in model_relations["sample_sample"] if rv not in plate_rvs
    ]

    params = set()
    if render_params:
        for params_list in model_relations["sample_param"].values():
            params.update(params_list)
        plate_groups[None].extend(params)

    node_data = {}
    for rv in model_relations["sample_sample"]:
        node_data[rv] = {
            "is_observed": rv in model_relations["observed"],
            "distribution": model_relations["sample_dist"][rv],
        }
    if render_params:
        for param, constraint in model_relations["param_constraint"].items():
            node_data[param] = {
                "is_observed": False,
                "constraint": constraint,
                "distribution": None,
            }

    plate_data = {}
    for plate1, plate2 in itertools.combinations(plate_groups, 2):
        if plate1 is None or plate2 is None:
            continue
        if set(plate_groups[plate1]) < set(plate_groups[plate2]):
            plate_data[plate1] = {"parent": plate2}
        elif set(plate_groups[plate1]) >= set(plate_groups[plate2]):
            plate_data[plate2] = {"parent": plate1}
    for plate in plate_groups:
        if plate is not None and plate not in plate_data:
            plate_data[plate] = {"parent": None}

    edge_list = []
    for target, source_list in model_relations["sample_sample"].items():
        edge_list.extend((source, target) for source in source_list)
    if render_params:
        for target, source_list in model_relations["sample_param"].items():
            edge_list.extend((source, target) for source in source_list)

    return {
        "plate_groups": plate_groups,
        "plate_data": plate_data,
        "node_data": node_data,
        "edge_list": edge_list,
    }


def render_graph(graph_specification, render_distributions=False):
    """Build a graphviz.Digraph from a graph specification."""
    try:
        import graphviz
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "render_model requires the graphviz python package "
            "(`pip install graphviz`)."
        ) from e

    plate_groups = graph_specification["plate_groups"]
    plate_data = graph_specification["plate_data"]
    node_data = graph_specification["node_data"]
    edge_list = graph_specification["edge_list"]

    graph = graphviz.Digraph()
    plate_graphs = {
        plate: graphviz.Digraph(name=f"cluster_{plate}")
        for plate in plate_groups
        if plate is not None
    }
    for plate, g in plate_graphs.items():
        g.attr(label=plate.split("__CLONE")[0], labeljust="r", labelloc="b")

    def _add_nodes(g, plate):
        for rv in plate_groups[plate]:
            color = "grey" if node_data[rv]["is_observed"] else "white"
            if node_data[rv]["distribution"]:
                shape = "ellipse"
            else:
                shape = "box"
            g.node(rv, label=rv, shape=shape, style="filled", fillcolor=color)

    _add_nodes(graph, None)
    for plate, g in plate_graphs.items():
        _add_nodes(g, plate)

    # nest plate subgraphs according to parent relations
    roots = [p for p, d in plate_data.items() if d["parent"] is None]
    children = {
        p: [q for q, d in plate_data.items() if d["parent"] == p]
        for p in plate_data
    }

    def _attach(parent_graph, plate):
        g = plate_graphs[plate]
        for child in children.get(plate, []):
            _attach(g, child)
        parent_graph.subgraph(g)

    for plate in roots:
        _attach(graph, plate)

    for source, target in edge_list:
        graph.edge(source, target)

    if render_distributions:
        legend = r"\l".join(
            f"{rv} ~ {d['distribution']}"
            for rv, d in node_data.items()
            if d["distribution"]
        )
        graph.node("distribution_description_node", label=legend + r"\l", shape="plaintext")

    return graph


def render_model(
    model,
    model_args=None,
    model_kwargs=None,
    filename=None,
    render_distributions=False,
    render_params=False,
):
    """Render a model's plate/dependency diagram via graphviz
    (reference: infer/inspect.py:603)."""
    relations = get_model_relations(model, model_args=model_args, model_kwargs=model_kwargs)
    graph_spec = generate_graph_specification(relations, render_params=render_params)
    graph = render_graph(graph_spec, render_distributions=render_distributions)
    if filename is not None:
        filename = Path(filename)
        graph.render(
            filename.with_suffix(""),
            view=False,
            cleanup=True,
            format=filename.suffix[1:],
        )
    return graph
