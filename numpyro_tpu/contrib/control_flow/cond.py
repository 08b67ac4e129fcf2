"""Effectful ``cond`` — handler-aware branch selection under ``lax.cond``.

Role parity: numpyro/contrib/control_flow/cond.py.  Each branch runs
blocked from the outer stack with outer substitution/conditioning applied
through the ``substitute_stack`` protocol; the executed branch's trace
crosses the boundary as a :class:`PytreeTrace` and is replayed into the
outer handlers.  XLA compiles both branches but executes one.
"""

from jax import lax

from numpyro_tpu import handlers
from numpyro_tpu.ops.pytree import PytreeTrace
from numpyro_tpu.primitives import _PYRO_STACK, apply_stack


def _resolve(subs_map, site):
    """Look up a site's replacement value in a dict or callable map."""
    if callable(subs_map) and not isinstance(subs_map, dict):
        if site["type"] == "deterministic":
            return subs_map(site)
        rng_key = site["kwargs"].get("rng_key")
        fn = subs_map if rng_key is None else handlers.seed(subs_map, rng_key)
        return fn(site)
    return subs_map.get(site["name"]) if isinstance(subs_map, dict) else None


def _branch(fn, substitute_stack):
    """Wrap one branch: blocked, seeded, with outer substitutions applied;
    returns (branch value, recorded trace)."""

    def run(packed):
        rng_key, operand = packed
        body = fn if rng_key is None else handlers.seed(fn, rng_key)
        for kind, subs_map in substitute_stack:
            wrap = (
                handlers.condition
                if kind == "condition"
                else handlers.substitute
            )
            kwarg = (
                "condition_fn" if kind == "condition" else "substitute_fn"
            )
            body = wrap(body, **{kwarg: lambda site, m=subs_map: _resolve(m, site)})
        with handlers.block(), handlers.trace() as tr:
            value = body(operand)
        return value, PytreeTrace(tr)

    return run


def cond_wrapper(
    pred,
    true_fun,
    false_fun,
    operand,
    rng_key=None,
    substitute_stack=None,
    enum=False,
    first_available_dim=None,
):
    if enum:
        raise RuntimeError("The cond primitive does not support enumeration")
    substitute_stack = substitute_stack or []
    return lax.cond(
        pred,
        _branch(true_fun, substitute_stack),
        _branch(false_fun, substitute_stack),
        (rng_key, operand),
    )


def cond(pred, true_fun, false_fun, operand):
    """Handler-aware conditional.  Both branches must declare the same
    sites with the same distribution classes (identical output pytrees)."""
    if not _PYRO_STACK:
        value, _ = cond_wrapper(pred, true_fun, false_fun, operand)
        return value

    msg = apply_stack(
        {
            "type": "control_flow",
            "fn": cond_wrapper,
            "args": (pred, true_fun, false_fun, operand),
            "kwargs": {"rng_key": None, "substitute_stack": []},
            "value": None,
        }
    )
    value, carried = msg["value"]
    # replay recorded sites into the surrounding handlers
    for site in carried.trace.values():
        if site["type"] != "plate":
            apply_stack(site)
    return value
