"""Effectful ``cond`` — handler-aware branch selection under ``lax.cond``
(reference: numpyro/contrib/control_flow/cond.py:76).  Both branches are
traced under ``block`` and their traces carried out as PytreeTraces — XLA
compiles both branches; only one executes per step."""

from functools import partial

from jax import lax

from numpyro_tpu import handlers
from numpyro_tpu.ops.pytree import PytreeTrace
from numpyro_tpu.primitives import _PYRO_STACK, apply_stack


def _subs_wrapper(subs_map, site):
    if isinstance(subs_map, dict) and site["name"] in subs_map:
        return subs_map[site["name"]]
    elif callable(subs_map):
        if site["type"] == "deterministic":
            return subs_map(site)
        rng_key = site["kwargs"].get("rng_key")
        subs_map = (
            handlers.seed(subs_map, rng_seed=rng_key)
            if rng_key is not None
            else subs_map
        )
        return subs_map(site)
    return None


def _wrap_fn(fn, substitute_stack):
    def wrapper(wrapped_operand):
        rng_key, operand = wrapped_operand
        with handlers.block():
            seeded_fn = handlers.seed(fn, rng_key) if rng_key is not None else fn
            for subs_type, subs_map in substitute_stack:
                subs_fn = partial(_subs_wrapper, subs_map)
                if subs_type == "condition":
                    seeded_fn = handlers.condition(seeded_fn, condition_fn=subs_fn)
                elif subs_type == "substitute":
                    seeded_fn = handlers.substitute(
                        seeded_fn, substitute_fn=subs_fn
                    )
            with handlers.trace() as trace:
                value = seeded_fn(operand)
        return value, PytreeTrace(trace)

    return wrapper


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
    if substitute_stack is None:
        substitute_stack = []
    wrapped_true = _wrap_fn(true_fun, substitute_stack)
    wrapped_false = _wrap_fn(false_fun, substitute_stack)
    return lax.cond(pred, wrapped_true, wrapped_false, (rng_key, operand))


def cond(pred, true_fun, false_fun, operand):
    """Conditionally apply ``true_fun`` or ``false_fun`` with handler-aware
    bodies.  Both branches must declare the same sites with the same
    distribution classes (XLA requires identical output pytrees)."""
    if not _PYRO_STACK:
        value, _ = cond_wrapper(pred, true_fun, false_fun, operand)
        return value

    initial_msg = {
        "type": "control_flow",
        "fn": cond_wrapper,
        "args": (pred, true_fun, false_fun, operand),
        "kwargs": {"rng_key": None, "substitute_stack": []},
        "value": None,
    }
    msg = apply_stack(initial_msg)
    value, pytree_trace = msg["value"]

    for site in pytree_trace.trace.values():
        if site["type"] == "plate":
            continue
        apply_stack(site)

    return value
