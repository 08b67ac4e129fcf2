"""Broadcasting-aware advanced indexing for enumeration.

``Vindex(x)[..., i, :, j]`` generalizes ``x[i, :, j]`` to batched/enumerated
index tensors: index args broadcast against each other (and against the
tensor's batch dims when a leading ``...`` is given) while ``:`` keeps its
axis as an event dim on the right (reference: numpyro/ops/indexing.py:11-147,
NEP-21 vindex semantics).
"""

import jax.numpy as jnp


def vindex(tensor, args):
    """Nonstandard interpretation of ``tensor[args]`` with broadcasting
    semantics; see module docstring.  Each arg is ``Ellipsis`` (leading
    only), ``slice(None)``, an integer, or a batched integer array."""
    if not isinstance(args, tuple):
        return tensor[args]
    if not args:
        return tensor

    assert jnp.ndim(tensor) > 0
    if args[0] is Ellipsis:
        # leading ... marks the tensor's (unknown-rank) batch prefix
        args = args[1:]
        if not args:
            return tensor
        event_dim = len(args)
        args = (slice(None),) * (jnp.ndim(tensor) - event_dim) + args
    else:
        args = args + (slice(None),) * (jnp.ndim(tensor) - len(args))
        event_dim = len(args)
    assert len(args) == jnp.ndim(tensor)
    if any(a is Ellipsis for a in args):
        raise NotImplementedError("Non-leading Ellipsis is not supported")

    def is_batched(a):
        return jnp.ndim(a) > 0

    # plain advanced indexing already broadcasts correctly when the tensor
    # has no extra batch dims in front and only the head arg is batched
    standard = not (
        (jnp.ndim(tensor) > event_dim and is_batched(args[0]))
        or any(is_batched(a) for a in args[1:])
    )
    if standard:
        return tensor[args]

    # rewrite: slices become aranges broadcast to fresh rightmost dims;
    # batched index tensors get those dims appended as singleton axes
    kept_dims = sum(isinstance(a, slice) for a in args[-event_dim:])
    fresh = 0
    rewritten = list(args)
    for i in reversed(range(len(rewritten))):
        a = rewritten[i]
        if isinstance(a, slice):
            if a != slice(None):
                raise NotImplementedError("Nontrivial slices are not supported")
            a = jnp.arange(tensor.shape[i], dtype=jnp.int32)
            a = a.reshape((-1,) + (1,) * fresh)
            fresh += 1
        elif is_batched(a):
            a = a.reshape(a.shape + (1,) * kept_dims)
        rewritten[i] = a
    return tensor[tuple(rewritten)]


class Vindex:
    """Convenience wrapper: ``Vindex(x)[..., i, j, :]`` ==
    ``vindex(x, (Ellipsis, i, j, slice(None)))``."""

    def __init__(self, tensor):
        self._tensor = tensor

    def __getitem__(self, args):
        return vindex(self._tensor, args)
