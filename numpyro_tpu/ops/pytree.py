"""PytreeTrace — carry an effect-handler trace across jax control flow.

Role parity: numpyro/ops/pytree.py.  A recorded trace (dict of site dicts)
must cross ``lax.scan`` / ``lax.cond`` boundaries as a pytree; this class
splits every site into its traced payload and its static description with
an explicit per-field routing table instead of ad-hoc key checks.
"""

from jax.tree_util import register_pytree_node_class

# site entries that hold (possibly traced) arrays and must ride as leaves
_DYNAMIC_KEYS = frozenset({"value", "intermediates", "args"})
# entries that are dropped entirely at the boundary (host-only bookkeeping)
_SKIPPED_KEYS = frozenset({"stop"})
# site types that survive a control-flow boundary at all
_CARRIED_TYPES = frozenset({"sample", "deterministic", "plate", "param"})


def _scrub_static(key, entry):
    """Strip entries that must not be treated as loop-invariant aux data."""
    if key == "kwargs" and "rng_key" in entry:
        entry = dict(entry, rng_key=None)
    elif key == "infer" and "_scan_current_index" in entry:
        entry = dict(entry, _scan_current_index=None)
    return entry


@register_pytree_node_class
class PytreeTrace:
    def __init__(self, trace):
        self.trace = trace

    def tree_flatten(self):
        order, dynamic, static = [], [], []
        for name, site in self.trace.items():
            if site["type"] not in _CARRIED_TYPES:
                continue
            order.append(name)
            dyn, aux = {}, {"_control_flow_done": True}
            for key, entry in site.items():
                if key in _SKIPPED_KEYS:
                    continue
                if key in _DYNAMIC_KEYS:
                    dyn[key] = entry
                elif key == "fn":
                    # sample fns are pytrees (traced params); plate fns are
                    # static callables
                    (dyn if site["type"] == "sample" else aux)[key] = entry
                else:
                    aux[key] = _scrub_static(key, entry)
            dynamic.append(dyn)
            static.append(aux)
        return (dynamic,), (tuple(order), tuple(static))

    @classmethod
    def tree_unflatten(cls, aux_data, children):
        order, static = aux_data
        (dynamic,) = children
        return cls(
            {
                name: {**dyn, **aux}
                for name, dyn, aux in zip(order, dynamic, static)
            }
        )
