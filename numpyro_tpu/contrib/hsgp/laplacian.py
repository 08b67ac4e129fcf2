"""Dirichlet-Laplacian eigenpairs on a box — the basis of the HSGP low-rank
approximation (Solin & Särkkä 2020; reference: contrib/hsgp/laplacian.py)."""

from __future__ import annotations


import jax.numpy as jnp

__all__ = ["eigenfunctions", "eigenfunctions_periodic", "eigenindices", "sqrt_eigenvalues"]


def _convert_ell(ell, dim):
    if isinstance(ell, (float, int)):
        ell = jnp.array([ell] * dim)[..., None]
    if isinstance(ell, list):
        if len(ell) != dim:
            raise ValueError(
                "The length of ell must be equal to the dimension of the space."
            )
        ell = jnp.array(ell)[..., None]
    ell = jnp.asarray(ell)
    if jnp.shape(ell) != (dim, 1):
        raise ValueError("ell must be a scalar or a list of length `dim`.")
    return ell


def eigenindices(m, dim):
    """Indices of the first prod(m) D-dimensional Laplacian eigenvalues
    (Riutort-Mayol et al. 2023, Eq. 10)."""
    if isinstance(m, int):
        m = [m] * dim
    elif len(m) != dim:
        raise ValueError("The length of m must be equal to the dimension of the space.")
    return (
        jnp.stack(
            jnp.meshgrid(*[jnp.arange(1, m_ + 1) for m_ in m], indexing="ij"),
            axis=-1,
        )
        .reshape(-1, dim)
        .T
    )


def sqrt_eigenvalues(ell, m, dim):
    """sqrt eigenvalues of -Δ on [-L, L]^D (Solin & Särkkä Eq. 56)."""
    ell_ = _convert_ell(ell, dim)
    S = eigenindices(m, dim)
    return S * jnp.pi / 2 / ell_  # (dim, prod(m))


def eigenfunctions(x, ell, m):
    """Eigenfunctions evaluated at x; 1D inputs treated as (n, 1)."""
    x_ = jnp.expand_dims(x, -1) if jnp.ndim(x) == 1 else jnp.asarray(x)
    dim = x_.shape[-1]
    n_batch_dims = x_.ndim - 1
    ell_ = _convert_ell(ell, dim)
    a = jnp.expand_dims(ell_, tuple(range(n_batch_dims)))
    b = jnp.expand_dims(
        sqrt_eigenvalues(ell_, m, dim), tuple(range(n_batch_dims))
    )
    return jnp.prod(
        jnp.sqrt(1 / a) * jnp.sin(b * (jnp.expand_dims(x_, axis=-1) + a)),
        axis=-2,
    )


def eigenfunctions_periodic(x, w0, m):
    """Cos/sin basis for the periodic-kernel approximation (1D only)."""
    if jnp.ndim(x) > 1:
        raise ValueError(
            "Multidimensional inputs are not supported by the periodic kernel."
        )
    m1 = jnp.tile(w0 * jnp.expand_dims(x, axis=-1), m)
    m2 = jnp.diag(jnp.arange(m, dtype=jnp.float32))
    mw0x = m1 @ m2
    return jnp.cos(mw0x), jnp.sin(mw0x)
