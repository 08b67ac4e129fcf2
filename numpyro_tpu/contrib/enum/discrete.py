"""Posterior sampling / MAP of enumerated discrete sites (``infer_discrete``).

Replaces the reference's funsor-based implementation
(numpyro/contrib/funsor/discrete.py:110) with explicit variable elimination:
a forward pass eliminates each enumerated variable (markov-recycled dims
retire their previous occupant exactly as in the density engine), saving the
variable's combined factor; a backward pass then draws each variable from
its conditional (``temperature=1``) or argmax (``temperature=0``) with all
later-eliminated variables already substituted — the classic
forward-filter / backward-sample algorithm, generalized to arbitrary
elimination orders.  All reductions are keepdims so dim coordinates stay
fixed; everything is plain ``jnp`` and fuses under jit.
"""

from __future__ import annotations

from functools import reduce

import jax.numpy as jnp
from jax import random
from jax.scipy.special import logsumexp

from numpyro_tpu import handlers
from numpyro_tpu.contrib.enum.enum_messenger import (
    ENUM_DIM_KEY,
    ENUM_SERIAL_KEY,
    config_enumerate,
    enum,
)
from numpyro_tpu.contrib.enum.infer_util import (
    _factor_enum_dims,
    _max_plate_nesting,
)
from numpyro_tpu.distributions.util import scale_and_mask


def infer_discrete(fn=None, first_available_dim=None, temperature=1, rng_key=None):
    """Return a model-like callable that runs ``fn`` with its enumerated
    discrete sites replaced by posterior draws (``temperature=1``) or MAP
    values (``temperature=0``) (reference: contrib/funsor/discrete.py:110)."""
    if fn is None:
        return lambda f: infer_discrete(
            f,
            first_available_dim=first_available_dim,
            temperature=temperature,
            rng_key=rng_key,
        )
    assert first_available_dim is not None and first_available_dim < 0
    assert rng_key is not None, "infer_discrete requires an rng_key"

    def wrapped_fn(*args, **kwargs):
        values = _discrete_posterior_values(
            fn, first_available_dim, temperature, rng_key, args, kwargs
        )
        return handlers.substitute(fn, data=values)(*args, **kwargs)

    return wrapped_fn


def _select_keepdims(f, axis, idx):
    """Select ``idx`` along negative ``axis`` of ``f``, keeping the axis as
    size 1 so every other dim coordinate is unchanged.  ``idx`` must already
    carry a size-1 slot at that axis."""
    pos = f.ndim + axis
    if pos < 0:  # f doesn't reach this axis: nothing to select
        return f
    idx = jnp.reshape(idx, (1,) * (f.ndim - jnp.ndim(idx)) + jnp.shape(idx))
    target = f.shape[:pos] + (1,) + f.shape[pos + 1 :]
    idx = jnp.broadcast_to(idx, target)
    return jnp.take_along_axis(f, idx, axis=pos)


def _sum_foreign_plates(lp, plate_axes, owner_axes):
    for ax in sorted(plate_axes - owner_axes):
        if lp.ndim >= -ax and lp.shape[lp.ndim + ax] > 1:
            lp = lp.sum(axis=lp.ndim + ax, keepdims=True)
    return lp


class _Var:
    """One enumerated variable: its dim, support, and plate axes."""

    __slots__ = ("name", "dim", "support", "plate_axes")

    def __init__(self, name, dim, support, plate_axes):
        self.name = name
        self.dim = dim
        self.support = support
        self.plate_axes = plate_axes


def _discrete_posterior_values(
    model, first_available_dim, temperature, rng_key, args, kwargs
):
    """Compute {site_name: value} draws for enumerated discrete sites."""
    wrapped = enum(config_enumerate(model), first_available_dim=first_available_dim)
    key_trace, key_sample = random.split(rng_key)
    # block: this internal trace must not leak sites into enclosing handlers
    with handlers.block():
        tr = handlers.trace(handlers.seed(wrapped, key_trace)).get_trace(
            *args, **kwargs
        )
    plate_ndim = _max_plate_nesting(tr)

    # forward pass: site-ordered factor collection with markov-recycling
    # eliminations, mirroring infer_util.log_density
    pending = []  # (lp, {dim: var})
    current = {}  # dim -> _Var occupying it
    serials = {}  # dim -> serial of the occupant
    saved = []  # (var, combined_lp, {dim: var} of the combined factor)

    def eliminate(var):
        nonlocal pending
        touching = [(f, vm) for f, vm in pending if var in vm.values()]
        rest = [(f, vm) for f, vm in pending if var not in vm.values()]
        if not touching:
            return
        summed, var_map = [], {}
        for f, vm in touching:
            plate_axes = {
                ax - f.ndim
                for ax in range(max(0, f.ndim - plate_ndim), f.ndim)
                if f.shape[ax] > 1
            }
            summed.append(_sum_foreign_plates(f, plate_axes, var.plate_axes))
            var_map.update(vm)
        combined = reduce(lambda a, b: a + b, summed)
        saved.append((var, combined, dict(var_map)))
        # sum-product for sampling; max-product (Viterbi) for MAP so the
        # backward argmax recovers the exact joint mode
        if temperature == 0:
            reduced = jnp.max(combined, axis=combined.ndim + var.dim, keepdims=True)
        else:
            reduced = logsumexp(
                combined, axis=combined.ndim + var.dim, keepdims=True
            )
        del var_map[var.dim]
        pending = rest + [(reduced, var_map)]

    for name, site in tr.items():
        if site["type"] != "sample":
            continue
        infer = site.get("infer", {})
        d = infer.get(ENUM_DIM_KEY)
        serial = infer.get(ENUM_SERIAL_KEY)
        lp = site["fn"].log_prob(site["value"])
        lp = scale_and_mask(lp, site.get("scale"))
        plate_axes = {
            fr.dim for fr in site["cond_indep_stack"] if fr.dim is not None
        }
        if d is not None and d in current and serials.get(d) != serial:
            eliminate(current.pop(d))
        if d is not None:
            current[d] = _Var(
                name, d, site["fn"].enumerate_support(expand=False), plate_axes
            )
            serials[d] = serial
        # this factor references the current occupant of each enum dim
        var_map = {
            dd: current[dd]
            for dd in _factor_enum_dims(lp, plate_ndim)
            if dd in current
        }
        pending.append((lp, var_map))

    for d in sorted(current):  # retire leftovers, deepest dim first
        eliminate(current[d])

    # backward pass: reverse elimination order, substituting later draws
    assignments = {}  # var -> idx array with a size-1 slot at var.dim
    keys = random.split(key_sample, max(len(saved), 1))
    for (var, combined, var_map), key in zip(reversed(saved), keys):
        f = combined
        for dd, other in var_map.items():
            if other is not var:
                f = _select_keepdims(f, dd, assignments[other])
        logits = jnp.moveaxis(f, f.ndim + var.dim, -1)
        if temperature == 0:
            idx = jnp.argmax(logits, -1)
        else:
            idx = random.categorical(
                key, logits if temperature == 1 else logits / temperature
            )
        assignments[var] = jnp.expand_dims(idx, jnp.ndim(idx) + 1 + var.dim)

    values = {}
    for var, idx in assignments.items():
        # squeeze the (all-singleton by now) enum-region axes so the value
        # has the site's natural plate-region shape
        shape = jnp.shape(idx)
        keep = shape[max(0, len(shape) - plate_ndim) :]
        idx = jnp.reshape(idx, keep)
        flat_support = var.support.reshape(var.support.shape[0])
        values[var.name] = flat_support[idx]
    return values
