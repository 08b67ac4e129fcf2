"""Kernel spectral densities for HSGP
(reference: contrib/hsgp/spectral_densities.py)."""

from __future__ import annotations

import jax.numpy as jnp
from jax import vmap
from jax.scipy import special

from numpyro_tpu.contrib.hsgp.laplacian import sqrt_eigenvalues

__all__ = [
    "diag_spectral_density_matern",
    "diag_spectral_density_periodic",
    "diag_spectral_density_squared_exponential",
    "modified_bessel_first_kind",
    "spectral_density_matern",
    "spectral_density_squared_exponential",
]


def align_param(dim, param):
    return jnp.broadcast_to(param, jnp.broadcast_shapes(jnp.shape(param), (dim,)))


def spectral_density_squared_exponential(dim, w, alpha, length):
    """S(w) of the RBF kernel (Rasmussen & Williams §4.2)."""
    length = align_param(dim, length)
    c = alpha * jnp.prod(jnp.sqrt(2 * jnp.pi) * length, axis=-1)
    e = jnp.exp(-0.5 * jnp.sum(w**2 * length**2, axis=-1))
    return c * e


def spectral_density_matern(dim, nu, w, alpha, length):
    """S(w) of the Matérn kernel (Rasmussen & Williams Eq. 4.15)."""
    length = align_param(dim, length)
    c1 = (
        alpha
        * (2**dim)
        * (jnp.pi ** (dim / 2))
        * ((2 * nu) ** nu)
        * special.gamma(nu + dim / 2)
    )
    s = jnp.sum(length**2 * w**2, axis=-1)
    c2 = jnp.prod(length, axis=-1) * (2 * nu + s) ** (-nu - dim / 2)
    return c1 * c2 / special.gamma(nu)


def diag_spectral_density_squared_exponential(alpha, length, ell, m, dim):
    sqrt_eig = sqrt_eigenvalues(ell=ell, m=m, dim=dim)
    return vmap(
        lambda w: spectral_density_squared_exponential(
            dim=dim, w=w, alpha=alpha, length=length
        ),
        in_axes=-1,
    )(sqrt_eig)


def diag_spectral_density_matern(nu, alpha, length, ell, m, dim):
    sqrt_eig = sqrt_eigenvalues(ell=ell, m=m, dim=dim)
    return vmap(
        lambda w: spectral_density_matern(
            dim=dim, nu=nu, w=w, alpha=alpha, length=length
        ),
        in_axes=-1,
    )(sqrt_eig)


def modified_bessel_first_kind(v, z):
    """I_v(z) for integer orders 0..max(v) via the quadrature-matmul Bessel
    block from the directional module (no tensorflow_probability
    dependency).  ``v`` must be statically shaped; its max order is a
    static int."""
    import numpy as np

    from numpyro_tpu.distributions.directional import log_bessel_i_orders

    v = np.asarray(v)
    z = jnp.asarray(z, dtype=float)
    max_order = int(np.max(v))
    # (nz, orders+1) -> orders leading so we can gather per requested order
    all_orders = jnp.exp(log_bessel_i_orders(max_order, z.reshape(-1))).T
    out = all_orders[v.reshape(-1), ...]
    return out.reshape(jnp.broadcast_shapes(jnp.shape(v), jnp.shape(z)))


def diag_spectral_density_periodic(alpha, length, m):
    """First m coefficients of the periodic-kernel low-rank expansion
    (Riutort-Mayol et al., Appendix B)."""
    import numpy as np

    a = length ** (-2)
    j = np.arange(0, m)
    c = jnp.where(j > 0, 2, 1)
    return (c * alpha**2 / jnp.exp(a)) * modified_bessel_first_kind(j, a)
