"""Posterior sampling / MAP of enumerated discrete sites (``infer_discrete``).

Replaces the reference's funsor-based implementation
(numpyro/contrib/funsor/discrete.py:110) with explicit variable elimination:
a forward logsumexp pass over enum dims records each site's combined factor;
a backward pass draws each site from its conditional (``temperature=1``) or
takes the argmax (``temperature=0``), substituting draws into the factors of
earlier-eliminated sites.
"""

from __future__ import annotations

from functools import reduce

import jax.numpy as jnp
from jax import random
from jax.scipy.special import logsumexp

from numpyro_tpu import handlers
from numpyro_tpu.contrib.enum.enum_messenger import (
    ENUM_DIM_KEY,
    config_enumerate,
    enum,
)
from numpyro_tpu.contrib.enum.infer_util import (
    _factor_enum_dims,
    _max_plate_nesting,
)
from numpyro_tpu.distributions.util import scale_and_mask


def _index_axis(f, axis, idx):
    """Select idx along `axis` (negative) of f; idx broadcasts against the
    remaining axes.  Returns an array with that axis removed."""
    pos = f.ndim + axis
    idx = jnp.broadcast_to(idx, f.shape[:pos] + f.shape[pos + 1 :])
    idx = jnp.expand_dims(idx, pos)
    out = jnp.take_along_axis(f, idx, axis=pos)
    return jnp.squeeze(out, pos)


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


def _discrete_posterior_values(model, first_available_dim, temperature, rng_key, args, kwargs):
    """Compute {site_name: value} draws for enumerated discrete sites."""
    wrapped = enum(config_enumerate(model), first_available_dim=first_available_dim)
    key_trace, key_sample = random.split(rng_key)
    # block: this internal trace must not leak sites into enclosing handlers
    with handlers.block():
        tr = handlers.trace(handlers.seed(wrapped, key_trace)).get_trace(
            *args, **kwargs
        )
    plate_ndim = _max_plate_nesting(tr)

    log_factors, factor_dims = [], []
    dim_to_site = {}
    dim_to_support = {}
    for name, site in tr.items():
        if site["type"] != "sample":
            continue
        d = site["infer"].get(ENUM_DIM_KEY) if "infer" in site else None
        if d is not None:
            dim_to_site[d] = name
            dim_to_support[d] = site["fn"].enumerate_support(expand=False)
        lp = site["fn"].log_prob(site["value"])
        lp = scale_and_mask(lp, site.get("scale"))
        log_factors.append(lp)
        factor_dims.append(_factor_enum_dims(lp, plate_ndim))

    all_dims = sorted({d for dims in factor_dims for d in dims})
    factors = list(zip(log_factors, factor_dims))
    saved = []
    for d in all_dims:
        touching = [(f, dims) for f, dims in factors if d in dims]
        rest = [(f, dims) for f, dims in factors if d not in dims]
        if not touching:
            continue
        combined = reduce(lambda a, b: a + b, [f for f, _ in touching])
        combined_dims = sorted({dd for _, dims in touching for dd in dims})
        saved.append((d, combined, combined_dims))
        reduced = logsumexp(combined, axis=combined.ndim + d)
        shifted = [dd + 1 if dd < d else dd for dd in combined_dims if dd != d]
        factors = rest + [(reduced, shifted)]

    # backward pass
    assignments = {}  # original dim -> idx array
    keys = random.split(key_sample, max(len(saved), 1))
    for (d, combined, combined_dims), key in zip(reversed(saved), keys):
        f = combined
        d_cur = d
        # index out other dims, rightmost (least negative) first so remaining
        # negative positions stay valid
        for dd in sorted((x for x in combined_dims if x != d), reverse=True):
            f = _index_axis(f, dd, assignments[dd])
            if d_cur < dd:
                d_cur += 1
        axis = f.ndim + d_cur
        logits = jnp.moveaxis(f, axis, -1)
        if temperature == 0:
            idx = jnp.argmax(logits, -1)
        elif temperature == 1:
            idx = random.categorical(key, logits)
        else:
            idx = random.categorical(key, logits / temperature)
        assignments[d] = idx

    values = {}
    for d, idx in assignments.items():
        support = dim_to_support[d]  # (K,) + (1,)*...
        flat_support = support.reshape(support.shape[0])
        values[dim_to_site[d]] = flat_support[idx]
    return values
