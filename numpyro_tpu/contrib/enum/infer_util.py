"""Enumerated log-density: sum-product contraction over enum dims.

Replaces the reference's funsor ``log_density``
(numpyro/contrib/funsor/infer_util.py:301) with direct variable elimination
on arrays.  Factors are collected in trace order; an enumerated variable is
retired (logsumexp) either when its dim is recycled by a markov frame — so
chain length never grows array rank — or at the end.  When retiring a dim,
each contributing factor is first summed over the plate axes the owning
site does *not* live in (a global discrete must see the plate-summed
likelihood; a plate-local discrete is eliminated per element).  The whole
contraction is pure jnp — XLA fuses it into the potential-energy program.
"""

from __future__ import annotations

from functools import reduce

import jax.numpy as jnp
from jax.scipy.special import logsumexp

from numpyro_tpu import handlers
from numpyro_tpu.contrib.enum.enum_messenger import ENUM_DIM_KEY, ENUM_SERIAL_KEY
from numpyro_tpu.distributions.util import scale_and_mask


def _max_plate_nesting(model_trace):
    dims = [
        frame.dim
        for site in model_trace.values()
        if site["type"] == "sample"
        for frame in site["cond_indep_stack"]
        if frame.dim is not None
    ]
    return -min(dims) if dims else 0


def _factor_enum_dims(log_prob, plate_ndim):
    """Enum dims present in a factor: axes left of the plate region with
    size > 1 (size-1 axes there are broadcast placeholders)."""
    ndim = jnp.ndim(log_prob)
    dims = []
    for axis in range(ndim - plate_ndim):
        d = axis - ndim  # negative dim
        if log_prob.shape[axis] > 1:
            dims.append(d)
    return dims


class _Factor:
    __slots__ = ("lp", "enum_dims", "plate_axes")

    def __init__(self, lp, enum_dims, plate_axes):
        self.lp = lp
        self.enum_dims = set(enum_dims)
        self.plate_axes = set(plate_axes)


def _sum_plate_axes(lp, axes_to_sum):
    """Sum (linear space of log-factors: plain add) over given negative
    plate axes, keepdims so global dim coordinates stay put."""
    for ax in axes_to_sum:
        if lp.ndim >= -ax and lp.shape[lp.ndim + ax] > 1:
            lp = lp.sum(axis=lp.ndim + ax, keepdims=True)
    return lp


def _eliminate(pending, d, owner_plate_axes):
    """Retire enum dim d from the pending factor list."""
    touching = [f for f in pending if d in f.enum_dims]
    rest = [f for f in pending if d not in f.enum_dims]
    if not touching:
        return pending
    summed = []
    plate_axes = set()
    for f in touching:
        foreign = f.plate_axes - owner_plate_axes
        summed.append(_sum_plate_axes(f.lp, sorted(foreign)))
        plate_axes |= f.plate_axes & owner_plate_axes
    combined = reduce(lambda a, b: a + b, summed)
    reduced = logsumexp(combined, axis=combined.ndim + d, keepdims=True)
    enum_dims = set().union(*(f.enum_dims for f in touching)) - {d}
    rest.append(_Factor(reduced, enum_dims, plate_axes))
    return rest


def log_density(model, model_args, model_kwargs, params):
    """Marginal log-density with enumerated discretes summed out
    (reference behavior: contrib/funsor/infer_util.py:228-330).

    The model must already be wrapped in
    ``enum(config_enumerate(model), first_available_dim)``.
    Returns ``(log_joint, model_trace)``.
    """
    model = handlers.substitute(model, data=params) if params else model
    with handlers.trace() as model_trace:
        model(*model_args, **model_kwargs)
    plate_ndim = _max_plate_nesting(model_trace)

    pending = []
    active_serial = {}  # dim -> serial currently living on it
    dim_owner_axes = {}  # dim -> plate axes of the owning enumerated site

    for site in model_trace.values():
        if site["type"] != "sample":
            continue
        value = site["value"]
        intermediates = site.get("intermediates")
        scale = site.get("scale")
        if intermediates:
            log_prob = site["fn"].log_prob(value, intermediates)
        else:
            log_prob = site["fn"].log_prob(value)
        log_prob = scale_and_mask(log_prob, scale)
        enum_dims = _factor_enum_dims(log_prob, plate_ndim)
        # plate axes: declared frames plus any broadcast (size > 1) axis in
        # the plate region — synthetic factors (e.g. an enumerated scan's
        # collapsed chain) carry real plate axes without frame records
        plate_axes = {
            frame.dim
            for frame in site["cond_indep_stack"]
            if frame.dim is not None
        }
        nd = jnp.ndim(log_prob)
        for ax in range(max(0, nd - plate_ndim), nd):
            if log_prob.shape[ax] > 1:
                plate_axes.add(ax - nd)

        infer = site.get("infer", {})
        d = infer.get(ENUM_DIM_KEY)
        serial = infer.get(ENUM_SERIAL_KEY)
        if d is not None and d in active_serial and active_serial[d] != serial:
            # markov recycling: retire the previous variable on this dim
            pending = _eliminate(pending, d, dim_owner_axes.get(d, set()))
            del active_serial[d]
        if d is not None:
            active_serial[d] = serial
            dim_owner_axes[d] = plate_axes

        pending.append(_Factor(log_prob, enum_dims, plate_axes))

    # retire remaining enum dims, most-negative (deepest) first
    remaining = sorted({d for f in pending for d in f.enum_dims})
    for d in remaining:
        pending = _eliminate(pending, d, dim_owner_axes.get(d, set()))

    total = 0.0
    for f in pending:
        total = total + jnp.sum(f.lp)
    return total, model_trace
