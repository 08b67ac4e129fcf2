"""Provenance tracking by abstract interpretation of jaxprs.

``eval_provenance(fn, **kwargs)`` answers "which named inputs can influence
each output?" without running any array computation: the function is traced
to a jaxpr, and input names are propagated through the equation graph as
frozensets (Wingate et al. 2011, "Nonstandard Interpretations of
Probabilistic Programs").  Used by model inspection and by TraceGraph_ELBO's
Rao-Blackwellization (reference: numpyro/ops/provenance.py:33).
"""

from __future__ import annotations

import jax
from jax.api_util import flatten_fun, shaped_abstractify
from jax._src import util as jax_util

try:
    from jax.experimental.pjit import pjit_p
except ImportError:  # jax >= 0.7 renamed the primitive
    from jax._src.pjit import jit_p as pjit_p

try:
    import jax.extend.linear_util as lu
except ImportError:  # pragma: no cover - older jax
    import jax.linear_util as lu

try:
    from jax.extend.core import Literal
except ImportError:  # pragma: no cover
    from jax.core import Literal

try:
    from jax.extend.core.primitives import call_p, closed_call_p
except ImportError:  # pragma: no cover
    from jax.core import call_p, closed_call_p

try:
    from jax.api_util import debug_info as _debug_info
except ImportError:  # pragma: no cover
    _debug_info = None

from jax.interpreters.partial_eval import trace_to_jaxpr_dynamic

# pmap's primitive moved around across JAX versions and is deprecated from
# jax.interpreters.pxla since 0.8.2; it only sharpens provenance inside a
# traced pmap (rare in model functions), so fall back to the conservative
# union rule when the symbol is gone rather than pinning a deprecated path.
try:  # pragma: no cover - version dependent
    import warnings as _warnings

    with _warnings.catch_warnings():
        _warnings.simplefilter("ignore", DeprecationWarning)
        from jax.interpreters.pxla import xla_pmap_p
except Exception:  # pragma: no cover
    xla_pmap_p = None


def eval_provenance(fn, **kwargs):
    """Return a pytree (matching fn's output) of frozensets naming the
    keyword arguments each output depends on.  Purely abstract — no flops."""
    args, in_tree = jax.tree.flatten(((), kwargs))
    info = {}
    if _debug_info is not None:
        info["debug_info"] = _debug_info("provenance fn", fn, (), kwargs)
    flat_fn, out_tree = flatten_fun(lu.wrap_init(fn, **info), in_tree)
    avals = jax_util.safe_map(shaped_abstractify, args)
    winfo = {}
    if _debug_info is not None:
        winfo["debug_info"] = _debug_info(
            "provenance wrapped", flat_fn.call_wrapped, args, {}
        )
    jaxpr, _, _ = trace_to_jaxpr_dynamic(
        lu.wrap_init(flat_fn.call_wrapped, {}, **winfo), avals
    )

    tagged_kwargs = {
        name: jax.tree.map(lambda _: frozenset({name}), value)
        for name, value in kwargs.items()
    }
    tagged_inputs, _ = jax.tree.flatten(((), tagged_kwargs))
    tagged_outputs = _propagate(jaxpr, tagged_inputs)
    return jax.tree.unflatten(out_tree(), tagged_outputs)


def _propagate(jaxpr, tagged_inputs):
    """Walk the equation list, unioning input tags into each output var."""
    env = {}

    def read(v):
        if isinstance(v, Literal):
            return frozenset()
        return env.get(v, frozenset())

    def write(v, tag):
        if isinstance(v, Literal):
            return
        env[v] = read(v) | tag

    jax_util.safe_map(write, jaxpr.invars, tagged_inputs)
    for eqn in jaxpr.eqns:
        in_tags = jax_util.safe_map(read, eqn.invars)
        rule = _RULES.get(eqn.primitive, _union_rule)
        out_tags = rule(eqn, in_tags)
        jax_util.safe_map(write, eqn.outvars, out_tags)
    return jax_util.safe_map(read, jaxpr.outvars)


def _union_rule(eqn, in_tags):
    # conservative default (also used for scan/cond/while/remat): every
    # output may depend on every input
    combined = frozenset().union(*in_tags) if in_tags else frozenset()
    return [combined] * len(eqn.outvars)


def _call_rule(eqn, in_tags):
    return _propagate(eqn.params["call_jaxpr"], in_tags)


def _closed_call_rule(eqn, in_tags):
    return _propagate(eqn.params["call_jaxpr"].jaxpr, in_tags)


def _pjit_rule(eqn, in_tags):
    return _propagate(eqn.params["jaxpr"].jaxpr, in_tags)


_RULES = {
    call_p: _call_rule,
    closed_call_p: _closed_call_rule,
    pjit_p: _pjit_rule,
}
if xla_pmap_p is not None:
    _RULES[xla_pmap_p] = _call_rule
