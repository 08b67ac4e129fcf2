"""Effectful ``scan`` — run handler-aware model code under ``lax.scan``.

Design (reference: numpyro/contrib/control_flow/scan.py:282-502): the scan
body is traced once per step under a ``block`` so inner sites don't hit the
outer stack directly; the recorded per-step trace is carried out of the loop
as a :class:`~numpyro_tpu.ops.pytree.PytreeTrace` (stacked along time by
``lax.scan`` itself), then each stacked site is replayed into the outer
handlers via ``apply_stack``.  Substitution/conditioning/replay from outer
handlers ride in through the ``substitute_stack`` protocol on the
``control_flow`` message.

Time stays the only sequential axis; everything inside one step is one fused
XLA block, so on TPU a scanned model is a single compiled loop with no
per-step dispatch.

Enumeration over discrete latents inside ``scan`` (the reference's
``scan_enum`` parallel-scan path) is wired through
``numpyro_tpu.contrib.funsor``-free machinery once the enumeration engine
lands; until then ``enum=True`` raises.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax, random

from numpyro_tpu import handlers
from numpyro_tpu.distributions.batch_util import promote_batch_shape
from numpyro_tpu.ops.pytree import PytreeTrace
from numpyro_tpu.primitives import _PYRO_STACK, apply_stack


def _replay_wrapper(replay_trace, trace, i, length):
    """Slice the i-th step's values out of an outer (stacked) trace."""

    def get_ith_value(site):
        value_shape = jnp.shape(site["value"])
        site_len = value_shape[0] if value_shape else 0
        if (
            site["name"] not in trace
            or site_len != length
            or site["type"] not in ("sample", "deterministic")
        ):
            return site
        site = site.copy()
        site["value"] = site["value"][i]
        return site

    return {k: get_ith_value(v) for k, v in replay_trace.items()}


def _subs_wrapper(subs_map, i, length, site):
    """Adapt an outer substitute/condition map to per-step values."""
    if site["type"] != "sample":
        return None
    value = None
    if isinstance(subs_map, dict) and site["name"] in subs_map:
        value = subs_map[site["name"]]
    elif callable(subs_map):
        rng_key = site["kwargs"].get("rng_key")
        subs_map = (
            handlers.seed(subs_map, rng_seed=rng_key)
            if rng_key is not None
            else subs_map
        )
        value = subs_map(site)
    if value is None:
        return None

    value_ndim = jnp.ndim(value)
    sample_shape = site["kwargs"]["sample_shape"]
    fn_ndim = len(sample_shape + site["fn"].shape())
    if value_ndim == fn_ndim:
        # per-step substitution (e.g. an init strategy applied each step)
        return value
    elif value_ndim == fn_ndim + 1:
        # a whole series was substituted: pick this step's slice
        shape = jnp.shape(value)
        value = jnp.asarray(value)
        if shape[0] == length:
            return value[i]
        elif shape[0] < length:
            rng_key = site["kwargs"]["rng_key"]
            assert rng_key is not None
            return lax.cond(
                i < shape[0],
                (value, i),
                lambda val: val[0][val[1]],
                rng_key,
                lambda val: site["fn"](rng_key=val, sample_shape=sample_shape),
            )
        raise RuntimeError(
            f"Substituted value for site {site['name']} requires length <= "
            f"{length}, got {shape[0]}."
        )
    raise RuntimeError(
        f"Expected ndim {fn_ndim} or {fn_ndim + 1} for site {site['name']}, "
        f"got {value_ndim}.  Nested scan is not supported."
    )


def _promote_scanned_value_shapes(value, fn):
    # fn.batch_shape = (T, 2, 3), value.shape = (T, 3) + event -> value
    # becomes (T, 1, 3) + event so it broadcasts against the stacked fn
    value_batch_ndims = jnp.ndim(value) - fn.event_dim
    fn_batch_ndim = len(fn.batch_shape)
    if fn_batch_ndim > value_batch_ndims:
        prepend = (1,) * (fn_batch_ndim - value_batch_ndims)
        return jnp.reshape(
            value, jnp.shape(value)[:1] + prepend + jnp.shape(value)[1:]
        )
    return value


def scan_wrapper(
    f,
    init,
    xs,
    length,
    reverse,
    rng_key=None,
    substitute_stack=None,
    enum=False,
    history=1,
    first_available_dim=None,
):
    if length is None:
        length = jnp.shape(jax.tree.flatten(xs)[0][0])[0]
    if substitute_stack is None:
        substitute_stack = []
    if enum and history > 0:
        raise NotImplementedError(
            "enumeration inside scan is not implemented yet in numpyro_tpu"
        )

    def body_fn(wrapped_carry, x):
        i, rng_key, carry = wrapped_carry
        rng_key, subkey = (
            random.split(rng_key) if rng_key is not None else (None, None)
        )

        with handlers.block():
            # tell the unconstraining substitution which step is running
            fn = handlers.infer_config(
                f, config_fn=lambda msg: {"_scan_current_index": i}
            )
            seeded_fn = handlers.seed(fn, subkey) if subkey is not None else fn
            for subs_type, subs_map in substitute_stack:
                subs_fn = partial(_subs_wrapper, subs_map, i, length)
                if subs_type == "condition":
                    seeded_fn = handlers.condition(seeded_fn, condition_fn=subs_fn)
                elif subs_type == "substitute":
                    seeded_fn = handlers.substitute(
                        seeded_fn, substitute_fn=subs_fn
                    )
                elif subs_type == "replay":
                    trace = handlers.trace(seeded_fn).get_trace(carry, x)
                    replay_trace_i = _replay_wrapper(subs_map, trace, i, length)
                    seeded_fn = handlers.replay(seeded_fn, trace=replay_trace_i)

            with handlers.trace() as trace:
                carry, y = seeded_fn(carry, x)

        return (i + 1, rng_key, carry), (PytreeTrace(trace), y)

    wrapped_carry = (jnp.asarray(0), rng_key, init)
    last_carry, (pytree_trace, ys) = lax.scan(
        body_fn, wrapped_carry, xs, length=length, reverse=reverse
    )
    for name, site in pytree_trace.trace.items():
        if site["type"] != "sample":
            continue
        # re-derive batch shapes now that lax.scan stacked the leaves
        site["fn"] = promote_batch_shape(site["fn"])
        site["value"] = _promote_scanned_value_shapes(site["value"], site["fn"])
    return last_carry, (pytree_trace, ys)


def scan(f, init, xs, length=None, reverse=False, history=1):
    """Scan ``f`` over the leading axis of ``xs`` while carrying state,
    recording inner ``sample``/``deterministic`` sites into the enclosing
    handlers (reference: numpyro/contrib/control_flow/scan.py:349).

    :param f: ``(carry, x) -> (carry, y)`` which may call primitives.
    :param init: initial carry.
    :param xs: pytree scanned along the leading axis (or None with length).
    :param length: required when xs is None.
    :param reverse: scan backwards.
    :param history: Markov history for enumeration (enum path pending).
    :return: ``(last_carry, ys)`` as in :func:`jax.lax.scan`.
    """
    if not _PYRO_STACK:
        (length, rng_key, carry), (pytree_trace, ys) = scan_wrapper(
            f, init, xs, length=length, reverse=reverse
        )
        return carry, ys

    initial_msg = {
        "type": "control_flow",
        "fn": scan_wrapper,
        "args": (f, init, xs, length, reverse),
        "kwargs": {"rng_key": None, "substitute_stack": [], "history": history},
        "value": None,
    }
    msg = apply_stack(initial_msg)
    (length, rng_key, carry), (pytree_trace, ys) = msg["value"]

    # replay the stacked sites into the outer handler stack so they are
    # traced/conditioned/scaled exactly like ordinary sites
    for site in pytree_trace.trace.values():
        if site["type"] == "plate":
            continue
        apply_stack(site)

    return carry, ys
