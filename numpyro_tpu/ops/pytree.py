"""PytreeTrace — carry an effect-handler trace through jax control flow.

A recorded trace is a dict of site dicts; to move it across a ``lax.scan`` /
``lax.cond`` boundary it must be a pytree.  Traced-array entries (values,
distribution parameters, intermediates) become pytree leaves; everything
else (names, kwargs, infer metadata) rides as static aux data
(reference: numpyro/ops/pytree.py:8).
"""

from jax.tree_util import register_pytree_node_class


@register_pytree_node_class
class PytreeTrace:
    def __init__(self, trace):
        self.trace = trace

    def tree_flatten(self):
        trace, aux_trace = {}, {}
        for name, site in self.trace.items():
            if site["type"] in ["sample", "deterministic", "plate", "param"]:
                trace[name], aux_trace[name] = {}, {"_control_flow_done": True}
                for key in site:
                    if key == "fn":
                        if site["type"] == "sample":
                            trace[name][key] = site[key]
                        elif site["type"] == "plate":
                            aux_trace[name][key] = site[key]
                    elif key in ["args", "value", "intermediates"]:
                        trace[name][key] = site[key]
                    # scanned sites carry a stop field (traced under block)
                    elif key != "stop":
                        if key == "kwargs":
                            kwargs = site["kwargs"].copy()
                            if "rng_key" in kwargs:
                                # never trace rng keys through the scan carry
                                kwargs["rng_key"] = None
                            aux_trace[name][key] = kwargs
                        elif key == "infer":
                            infer = site["infer"].copy()
                            if "_scan_current_index" in infer:
                                infer["_scan_current_index"] = None
                            aux_trace[name][key] = infer
                        else:
                            aux_trace[name][key] = site[key]
        # dict flatten/unflatten does not preserve insertion order; keep it
        site_names = list(trace.keys())
        return (trace,), (aux_trace, site_names)

    @classmethod
    def tree_unflatten(cls, aux_data, children):
        aux_trace, site_names = aux_data
        (trace,) = children
        trace_with_aux = {}
        for name in site_names:
            trace[name].update(aux_trace[name])
            trace_with_aux[name] = trace[name]
        return cls(trace_with_aux)
