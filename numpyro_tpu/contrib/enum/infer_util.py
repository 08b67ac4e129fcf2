"""Enumerated log-density: sum-product contraction over enum dims.

Replaces the reference's funsor ``log_density``
(numpyro/contrib/funsor/infer_util.py:301) with direct variable elimination
on arrays: every sample-site log-prob is a factor whose axes left of the
plate region are enum dims; dims are eliminated innermost-first with
logsumexp after broadcast-summing the factors that mention them.  The whole
contraction is pure jnp — XLA fuses it into the potential-energy program.
"""

from __future__ import annotations

from functools import reduce

import jax.numpy as jnp
from jax.scipy.special import logsumexp

from numpyro_tpu import handlers
from numpyro_tpu.contrib.enum.enum_messenger import ENUM_DIM_KEY
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


def _eliminate(log_factors, factor_dims, plate_ndim, sum_plates=True):
    """Variable elimination over enum dims; returns the scalar (or
    plate-shaped) marginal log density contribution.

    :param log_factors: list of arrays.
    :param factor_dims: list of lists of (negative) enum dims per factor.
    """
    # eliminate innermost-allocated (most negative) dims first: those belong
    # to the deepest sites, which keeps intermediate factors small on chains
    all_dims = sorted({d for dims in factor_dims for d in dims})
    factors = list(zip(log_factors, factor_dims))
    for d in all_dims:
        touching = [(f, dims) for f, dims in factors if d in dims]
        rest = [(f, dims) for f, dims in factors if d not in dims]
        if not touching:
            continue
        combined = reduce(lambda a, b: a + b, [f for f, _ in touching])
        reduced = logsumexp(combined, axis=combined.ndim + d)
        new_dims = sorted({dd for _, dims in touching for dd in dims if dd != d})
        # removing axis d shifts every dim left of it right by one
        shifted = [dd + 1 if dd < d else dd for dd in new_dims]
        factors = rest + [(reduced, shifted)]
    total = 0.0
    for f, _ in factors:
        total = total + (jnp.sum(f) if sum_plates else f)
    return total


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

    log_factors = []
    factor_dims = []
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
        log_factors.append(log_prob)
        factor_dims.append(_factor_enum_dims(log_prob, plate_ndim))

    log_joint = _eliminate(log_factors, factor_dims, plate_ndim)
    return log_joint, model_trace
