"""Directional distributions (VonMises, ProjectedNormal).

Reference surface: numpyro/distributions/directional.py:80-544.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import lax, random
from jax.scipy.special import erf, i0e, i1e

from . import constraints
from .distribution import Distribution
from .util import promote_shapes, safe_normalize, validate_sample, von_mises_centered

__all__ = ["ProjectedNormal", "VonMises"]


class VonMises(Distribution):
    arg_constraints = {
        "loc": constraints.real,
        "concentration": constraints.positive,
    }
    reparametrized_params = ["loc"]
    support = constraints.circular

    def __init__(self, loc, concentration, *, validate_args=None):
        self.loc, self.concentration = promote_shapes(loc, concentration)
        batch_shape = lax.broadcast_shapes(jnp.shape(concentration), jnp.shape(loc))
        super().__init__(batch_shape=batch_shape, validate_args=validate_args)

    def sample(self, key, sample_shape=()):
        """Best-Fisher rejection sampler, fully batched inside one program."""
        samples = von_mises_centered(
            key,
            self.concentration,
            sample_shape + self.shape(),
            dtype=jnp.result_type(float),
        )
        samples = samples + self.loc  # VM(0, kappa) -> VM(loc, kappa)
        samples = (samples + jnp.pi) % (2.0 * jnp.pi) - jnp.pi
        return samples

    @validate_sample
    def log_prob(self, value):
        return -(
            jnp.log(2 * jnp.pi)
            + jnp.log(i0e(self.concentration))
        ) + self.concentration * (jnp.cos((value - self.loc) % (2 * jnp.pi)) - 1)

    @property
    def mean(self):
        """Circular mean."""
        return jnp.broadcast_to(self.loc, self.batch_shape)

    @property
    def variance(self):
        """Circular variance."""
        return jnp.broadcast_to(
            1.0 - i1e(self.concentration) / i0e(self.concentration),
            self.batch_shape,
        )


class ProjectedNormal(Distribution):
    """Radially-projected isotropic normal on the sphere S^{d-1}; closed-form
    densities for d in {2, 3}."""

    arg_constraints = {"concentration": constraints.real_vector}
    reparametrized_params = ["concentration"]
    support = constraints.sphere

    def __init__(self, concentration, *, validate_args=None):
        assert jnp.ndim(concentration) >= 1
        self.concentration = concentration
        batch_shape = concentration.shape[:-1]
        event_shape = concentration.shape[-1:]
        super().__init__(batch_shape, event_shape, validate_args=validate_args)

    @property
    def mean(self):
        """Mean in the sense of a decision point (not the barycenter)."""
        return safe_normalize(self.concentration)

    @property
    def mode(self):
        return safe_normalize(self.concentration)

    def sample(self, key, sample_shape=()):
        shape = sample_shape + self.batch_shape + self.event_shape
        eps = random.normal(key, shape=shape, dtype=self.concentration.dtype)
        return safe_normalize(self.concentration + eps)

    @validate_sample
    def log_prob(self, value):
        if self._validate_args:
            event_shape = value.shape[-1:]
            if event_shape != self.event_shape:
                raise ValueError(f"Expected event shape {self.event_shape}")
        dim = int(self.concentration.shape[-1])
        if dim == 2:
            return _projected_normal_log_prob_2(self.concentration, value)
        if dim == 3:
            return _projected_normal_log_prob_3(self.concentration, value)
        raise NotImplementedError(
            f"ProjectedNormal.log_prob is implemented only for dim 2 and 3, got {dim}"
        )


def _dot(x, y):
    return (x[..., None, :] @ y[..., None])[..., 0, 0]


def _projected_normal_log_prob_2(concentration, value):
    def _dot(x, y):
        return (x[..., None, :] @ y[..., None])[..., 0, 0]

    # We integrate along a ray, r = x + t u, where x is the concentration and u
    # is the unit value vector
    t = _dot(concentration, value)
    t2 = t * t
    r2 = _dot(concentration, concentration)
    perp_part = r2 - t2

    # This is the log of a definite integral, computed by mathematica:
    # Integrate[x/(E^((x-t)^2/2) Sqrt[2 Pi]), {x, 0, Infinity}]
    # = (t + Sqrt[2/Pi]/E^(t^2/2) + t Erf[t/Sqrt[2]]) / 2
    para_part = jnp.log(
        (jnp.exp(-t2 / 2) * ((2 / math.pi) ** 0.5) + t * (1 + erf(t * 0.5**0.5)))
        / 2
    )
    return para_part - 0.5 * perp_part - jnp.log(2 * math.pi)


def _projected_normal_log_prob_3(concentration, value):
    def _dot(x, y):
        return (x[..., None, :] @ y[..., None])[..., 0, 0]

    t = _dot(concentration, value)
    t2 = t * t
    r2 = _dot(concentration, concentration)
    perp_part = r2 - t2

    # Integrate[x^2/(E^((x-t)^2/2) Sqrt[2 Pi]), {x, 0, Infinity}]
    # = t/E^(t^2/2)/Sqrt[2 Pi] + ((1 + t^2) (1 + Erf[t/Sqrt[2]])) / 2
    para_part = jnp.log(
        t * jnp.exp(-t2 / 2) / (2 * math.pi) ** 0.5
        + (1 + t2) * (1 + erf(t * 0.5**0.5)) / 2
    )
    return para_part - 0.5 * perp_part - 1.5 * jnp.log(2 * math.pi)


def _numel(shape):
    out = 1
    for s in shape:
        out *= s
    return out


def log_I1(orders: int, value, terms=250):
    """log of modified Bessel functions of the first kind I_0..I_orders,
    via the truncated power series in log space (stable for large values).
    Returns shape ``(orders + 1,) + value.shape``.
    (reference: numpyro/distributions/directional.py:33)."""
    from jax.scipy.special import gammaln, logsumexp

    orders = orders + 1
    vshape = jnp.shape(value) if jnp.ndim(value) > 0 else (1,)
    value = jnp.reshape(value, (-1, 1))
    flat_vshape = _numel(vshape)

    k = jnp.arange(terms)
    lgammas_all = gammaln(jnp.arange(1.0, terms + orders + 1))
    lvalues = jnp.log(value / 2) * k.reshape(1, -1)
    lfactorials = lgammas_all[:terms]
    lgammas = jnp.tile(lgammas_all, orders).reshape((orders, -1))
    indices = k[:orders].reshape(-1, 1) + k.reshape(1, -1)
    seqs = logsumexp(
        2 * lvalues[None, :, :]
        - lfactorials[None, None, :]
        - jnp.take_along_axis(lgammas, indices, axis=1)[:, None, :],
        -1,
    )
    i1s = lvalues[..., :orders].T + seqs
    return i1s.reshape(-1, *vshape)


class SineSkewed(Distribution):
    """Sine-skewing of a symmetric torus distribution (Ameijeiras-Alonso &
    Ley 2019).  ``skewness`` must lie in the L1 ball
    (reference: numpyro/distributions/directional.py:156)."""

    arg_constraints = {"skewness": constraints.l1_ball}
    pytree_data_fields = ("base_dist", "skewness")
    support = constraints.independent(constraints.circular, 1)

    def __init__(self, base_dist, skewness, *, validate_args=None):
        assert base_dist.event_shape == skewness.shape[-1:], (
            "SineSkewed requires one skewness weight per event dim of base_dist."
        )
        batch_shape = jnp.broadcast_shapes(
            base_dist.batch_shape, skewness.shape[:-1]
        )
        event_shape = skewness.shape[-1:]
        self.skewness = jnp.broadcast_to(skewness, batch_shape + event_shape)
        self.base_dist = base_dist.expand(batch_shape)
        super().__init__(batch_shape, event_shape, validate_args=validate_args)

    def sample(self, key, sample_shape=()):
        base_key, skew_key = random.split(key)
        bd = self.base_dist
        ys = bd.sample(base_key, sample_shape)
        u = random.uniform(skew_key, sample_shape + self.batch_shape)
        # accept-or-reflect step of the sine-skew construction
        mask = u <= 0.5 + 0.5 * (
            self.skewness * jnp.sin((ys - bd.mean) % (2 * jnp.pi))
        ).sum(-1)
        mask = mask[..., None]
        return (jnp.where(mask, ys, -ys + 2 * bd.mean) + jnp.pi) % (
            2 * jnp.pi
        ) - jnp.pi

    def log_prob(self, value):
        if self._validate_args:
            self._validate_sample(value)
        skew_prob = jnp.log1p(
            (
                self.skewness
                * jnp.sin((value - self.base_dist.mean) % (2 * jnp.pi))
            ).sum(-1)
        )
        return self.base_dist.log_prob(value) + skew_prob

    @property
    def mean(self):
        return self.base_dist.mean


class SineBivariateVonMises(Distribution):
    """Unimodal distribution of two dependent angles on the 2-torus (Singh,
    Hnizdo & Demchuck 2002); sampling follows Kent, Ganeiber & Mardia (2018)
    (reference: numpyro/distributions/directional.py:288)."""

    arg_constraints = {
        "phi_loc": constraints.circular,
        "psi_loc": constraints.circular,
        "phi_concentration": constraints.positive,
        "psi_concentration": constraints.positive,
        "correlation": constraints.real,
    }
    support = constraints.independent(constraints.circular, 1)
    max_sample_iter = 1000

    def __init__(
        self,
        phi_loc,
        psi_loc,
        phi_concentration,
        psi_concentration,
        correlation=None,
        weighted_correlation=None,
        validate_args=None,
    ):
        from .util import assert_one_of

        assert_one_of(
            correlation=correlation, weighted_correlation=weighted_correlation
        )
        if weighted_correlation is not None:
            correlation = weighted_correlation * jnp.sqrt(
                phi_concentration * psi_concentration
            )
        batch_shape = lax.broadcast_shapes(
            jnp.shape(phi_loc),
            jnp.shape(psi_loc),
            jnp.shape(phi_concentration),
            jnp.shape(psi_concentration),
            jnp.shape(correlation),
        )
        (
            self.phi_loc,
            self.psi_loc,
            self.phi_concentration,
            self.psi_concentration,
            self.correlation,
        ) = (
            jnp.broadcast_to(p, batch_shape)
            for p in (
                phi_loc,
                psi_loc,
                phi_concentration,
                psi_concentration,
                correlation,
            )
        )
        super().__init__(batch_shape, (2,), validate_args=validate_args)

    @property
    def norm_const(self):
        from jax.scipy.special import gammaln, logsumexp

        corr = jnp.reshape(self.correlation, (1, -1))
        conc = jnp.stack(
            (self.phi_concentration, self.psi_concentration), axis=-1
        ).reshape(-1, 2)
        m = jnp.arange(50).reshape(-1, 1)
        lbinoms = gammaln(2 * m + 1.0) - 2 * gammaln(m + 1.0)
        fs = lbinoms.reshape(-1, 1) + m * (
            jnp.log(jnp.clip(corr**2, jnp.finfo(jnp.result_type(float)).tiny))
            - jnp.log(4 * jnp.prod(conc, axis=-1))
        )
        fs += log_I1(49, conc, terms=10_001).sum(-1)
        norm_const = 2 * jnp.log(jnp.array(2 * jnp.pi)) + logsumexp(fs, 0)
        return norm_const.reshape(jnp.shape(self.phi_loc))

    @validate_sample
    def log_prob(self, value):
        indv = self.phi_concentration * jnp.cos(
            value[..., 0] - self.phi_loc
        ) + self.psi_concentration * jnp.cos(value[..., 1] - self.psi_loc)
        corr = (
            self.correlation
            * jnp.sin(value[..., 0] - self.phi_loc)
            * jnp.sin(value[..., 1] - self.psi_loc)
        )
        return indv + corr - self.norm_const

    def sample(self, key, sample_shape=()):
        phi_key, psi_key = random.split(key)
        corr = self.correlation
        conc = jnp.stack((self.phi_concentration, self.psi_concentration))

        eig = 0.5 * (conc[0] - corr**2 / conc[1])
        eig = jnp.stack((jnp.zeros_like(eig), eig))
        eigmin = jnp.where(
            eig[1] < 0, eig[1], jnp.zeros_like(eig[1], dtype=eig.dtype)
        )
        eig = eig - eigmin
        b0 = self._bfind(eig)

        total = _numel(sample_shape)
        phi_den = log_I1(0, conc[1]).squeeze(0)
        batch_size = _numel(self.batch_shape)
        phi_shape = (total, 2, batch_size)
        phi = self._phi_marginal(
            phi_shape,
            phi_key,
            jnp.reshape(conc, (2, batch_size)),
            jnp.reshape(corr, (batch_size,)),
            jnp.reshape(eig, (2, batch_size)),
            jnp.reshape(b0, (batch_size,)),
            jnp.reshape(eigmin, (batch_size,)),
            jnp.reshape(phi_den, (batch_size,)),
        )
        phi = jnp.arctan2(phi[:, 1], phi[:, 0])

        alpha = jnp.sqrt(
            conc[1].reshape(-1) ** 2 + (corr.reshape(-1) * jnp.sin(phi)) ** 2
        )
        beta = jnp.arctan(corr.reshape(-1) / conc[1].reshape(-1) * jnp.sin(phi))
        psi = VonMises(beta, alpha).sample(psi_key)

        phi_psi = jnp.stack(
            (
                (phi + jnp.reshape(self.phi_loc, -1) + jnp.pi) % (2 * jnp.pi)
                - jnp.pi,
                (psi + jnp.reshape(self.psi_loc, -1) + jnp.pi) % (2 * jnp.pi)
                - jnp.pi,
            ),
            axis=-1,
        )
        return phi_psi.reshape(
            tuple(sample_shape) + self.batch_shape + self.event_shape
        )

    def _phi_marginal(
        self, shape, rng_key, conc, corr, eig, b0, eigmin, phi_den
    ):
        """Rejection sampler for the phi marginal via an angular central
        Gaussian envelope, run as one batched lax.while_loop."""

        def cond_fn(curr):
            i, done, phi, key = curr
            return (i < self.max_sample_iter) & ~jnp.all(done)

        def body_fn(curr):
            i, done, phi, key = curr
            phi_key, key = random.split(key)
            accept_key, acg_key, phi_key = random.split(phi_key, 3)

            x = lax.rsqrt(1 + 2 * eig / b0) * random.normal(acg_key, shape)
            x /= jnp.linalg.norm(x, axis=1, keepdims=True)

            lf = (
                conc[0] * (x[:, 0] - 1)
                + eigmin
                + log_I1(
                    0, jnp.sqrt(conc[1] ** 2 + (corr * x[:, 1]) ** 2)
                ).squeeze(0)
                - phi_den
            )
            lg_inv = 1.0 - b0 / 2 + jnp.log(b0 / 2 + (eig * x**2).sum(1))
            accepted = random.uniform(accept_key, lf.shape) < jnp.exp(lf + lg_inv)
            accepted = accepted[:, None]
            phi = jnp.where(accepted & ~done, x, phi)
            return i + 1, done | accepted, phi, key

        init = (
            jnp.array(0),
            jnp.zeros(shape, dtype=bool),
            jnp.zeros(shape, dtype=jnp.result_type(float)),
            rng_key,
        )
        _, _, phi, _ = lax.while_loop(cond_fn, body_fn, init)
        return phi

    @property
    def mean(self):
        mean = (jnp.stack((self.phi_loc, self.psi_loc), axis=-1) + jnp.pi) % (
            2.0 * jnp.pi
        ) - jnp.pi
        return jnp.broadcast_to(mean, (*self.batch_shape, 2))

    def _bfind(self, eig):
        b = eig.shape[0] / 2 * jnp.ones(self.batch_shape, dtype=eig.dtype)
        g1 = jnp.sum(1 / (b + 2 * eig) ** 2, axis=0)
        g2 = jnp.sum(-2 / (b + 2 * eig) ** 3, axis=0)
        return jnp.where(jnp.linalg.norm(eig, axis=0) != 0, b - g1 / g2, b)
