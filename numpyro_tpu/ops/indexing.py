"""Broadcasting-aware advanced indexing for enumeration.

``Vindex(x)[..., i, :, j]`` generalizes ``x[i, :, j]`` to batched/enumerated
index tensors: index args broadcast against each other (and against the
tensor's batch dims when a leading ``...`` is given) while ``:`` keeps its
axis as an event dim on the right (reference: numpyro/ops/indexing.py:11-147,
NEP-21 vindex semantics).
"""

import jax.numpy as jnp


def vindex(arr, keys):
    """Nonstandard interpretation of ``arr[keys]`` with broadcasting
    semantics; see module docstring.  Each key is ``Ellipsis`` (leading
    only), ``slice(None)``, an integer, or a batched integer array."""
    if not isinstance(keys, tuple):
        return arr[keys]
    if keys == ():
        return arr

    rank = jnp.ndim(arr)
    assert rank > 0
    if keys[0] is Ellipsis:
        # leading ... marks the array's (unknown-rank) batch prefix
        keys = keys[1:]
        if keys == ():
            return arr
        event_dim = len(keys)
        keys = (slice(None),) * (rank - event_dim) + keys
    else:
        keys = keys + (slice(None),) * (rank - len(keys))
        event_dim = len(keys)
    assert len(keys) == rank
    if Ellipsis in keys:
        raise NotImplementedError("only a leading Ellipsis is understood")

    batched = [
        not isinstance(k, slice) and jnp.ndim(k) > 0 for k in keys
    ]

    # plain advanced indexing already broadcasts correctly when the array
    # has no extra batch dims in front and only the head key is batched
    head_conflict = rank > event_dim and batched[0]
    if not head_conflict and not any(batched[1:]):
        return arr[keys]

    # rewrite: slices become aranges broadcast to fresh rightmost dims;
    # batched index arrays get those dims appended as singleton axes
    kept_dims = sum(isinstance(k, slice) for k in keys[-event_dim:])
    rewritten, fresh = [], 0
    for pos in reversed(range(rank)):
        key = keys[pos]
        if isinstance(key, slice):
            if key != slice(None):
                raise NotImplementedError("nontrivial slices are unsupported")
            key = jnp.arange(arr.shape[pos], dtype=jnp.int32).reshape(
                (-1,) + (1,) * fresh
            )
            fresh += 1
        elif batched[pos]:
            key = jnp.reshape(key, jnp.shape(key) + (1,) * kept_dims)
        rewritten.append(key)
    return arr[tuple(reversed(rewritten))]


class Vindex:
    """Convenience wrapper: ``Vindex(x)[..., i, j, :]`` ==
    ``vindex(x, (Ellipsis, i, j, slice(None)))``."""

    __slots__ = ("_arr",)

    def __init__(self, arr):
        self._arr = arr

    def __getitem__(self, keys):
        return vindex(self._arr, keys)
