"""Analytic KL divergences (used by TraceMeanField_ELBO).

Dispatch is a simple (type, type) registry walked over the MRO — no external
multipledispatch dependency.  Reference surface: numpyro/distributions/kl.py.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import betaln, digamma, gammaln

from .continuous import (
    Beta,
    CirculantNormal,
    Dirichlet,
    Gamma,
    Kumaraswamy,
    MultivariateNormal,
    Normal,
    Weibull,
)
from .discrete import CategoricalLogits, CategoricalProbs
from .distribution import (
    Delta,
    Distribution,
    ExpandedDistribution,
    Independent,
    MaskedDistribution,
)
from .util import sum_rightmost

_KL_REGISTRY = {}


def register_kl(type_p, type_q):
    def decorator(fn):
        _KL_REGISTRY[(type_p, type_q)] = fn
        return fn

    return decorator


def _dispatch_kl(type_p, type_q):
    matches = [
        (p, q)
        for (p, q) in _KL_REGISTRY
        if issubclass(type_p, p) and issubclass(type_q, q)
    ]
    if not matches:
        return None
    # most specific match: minimize MRO distance
    def _key(pair):
        return (type_p.__mro__.index(pair[0]), type_q.__mro__.index(pair[1]))

    return _KL_REGISTRY[min(matches, key=_key)]


def kl_divergence(p, q):
    fn = _dispatch_kl(type(p), type(q))
    if fn is None:
        raise NotImplementedError(
            f"No KL(p || q) registered for p={type(p).__name__}, q={type(q).__name__}"
        )
    return fn(p, q)


@register_kl(Distribution, ExpandedDistribution)
def _kl_dist_expanded(p, q):
    kl = kl_divergence(p, q.base_dist)
    shape = jnp.broadcast_shapes(p.batch_shape, q.batch_shape)
    return jnp.broadcast_to(kl, shape)


@register_kl(ExpandedDistribution, Distribution)
def _kl_expanded(p, q):
    kl = kl_divergence(p.base_dist, q)
    shape = jnp.broadcast_shapes(p.batch_shape, q.batch_shape)
    return jnp.broadcast_to(kl, shape)


@register_kl(ExpandedDistribution, ExpandedDistribution)
def _kl_expanded_expanded(p, q):
    kl = kl_divergence(p.base_dist, q.base_dist)
    shape = jnp.broadcast_shapes(p.batch_shape, q.batch_shape)
    return jnp.broadcast_to(kl, shape)


@register_kl(Delta, Distribution)
def _kl_delta(p, q):
    return -q.log_prob(p.v)


@register_kl(Independent, Independent)
def _kl_independent_independent(p, q):
    shared_ndims = min(p.reinterpreted_batch_ndims, q.reinterpreted_batch_ndims)
    p_ndims = p.reinterpreted_batch_ndims - shared_ndims
    q_ndims = q.reinterpreted_batch_ndims - shared_ndims
    p_ = Independent(p.base_dist, p_ndims) if p_ndims else p.base_dist
    q_ = Independent(q.base_dist, q_ndims) if q_ndims else q.base_dist
    kl = kl_divergence(p_, q_)
    if shared_ndims:
        kl = sum_rightmost(kl, shared_ndims)
    return kl


@register_kl(MaskedDistribution, MaskedDistribution)
def _kl_masked_masked(p, q):
    if p._mask_is_bool and q._mask_is_bool:
        mask = p._mask_static and q._mask_static
    else:
        mask = jnp.logical_and(
            p._mask if not p._mask_is_bool else jnp.asarray(p._mask_static),
            q._mask if not q._mask_is_bool else jnp.asarray(q._mask_static),
        )
    if isinstance(mask, bool):
        if mask:
            return kl_divergence(p.base_dist, q.base_dist)
        return jnp.zeros(jnp.broadcast_shapes(p.batch_shape, q.batch_shape))
    kl = kl_divergence(p.base_dist, q.base_dist)
    return jnp.where(mask, kl, 0.0)


@register_kl(Normal, Normal)
def _kl_normal_normal(p, q):
    var_ratio = jnp.square(p.scale / q.scale)
    t1 = jnp.square((p.loc - q.loc) / q.scale)
    return 0.5 * (var_ratio + t1 - 1 - jnp.log(var_ratio))


@register_kl(MultivariateNormal, MultivariateNormal)
def _kl_mvn_mvn(p, q):
    D = p.event_shape[-1]
    p_half_logdet = jnp.log(
        jnp.diagonal(p.scale_tril, axis1=-2, axis2=-1)
    ).sum(-1)
    q_half_logdet = jnp.log(
        jnp.diagonal(q.scale_tril, axis1=-2, axis2=-1)
    ).sum(-1)
    from jax.scipy.linalg import solve_triangular

    Lq_inv_Lp = solve_triangular(
        jnp.broadcast_to(
            q.scale_tril,
            jnp.broadcast_shapes(p.scale_tril.shape, q.scale_tril.shape),
        ),
        jnp.broadcast_to(
            p.scale_tril,
            jnp.broadcast_shapes(p.scale_tril.shape, q.scale_tril.shape),
        ),
        lower=True,
    )
    tr = jnp.sum(Lq_inv_Lp**2, axis=(-2, -1))
    diff = q.loc - p.loc
    Lq_inv_diff = solve_triangular(
        jnp.broadcast_to(
            q.scale_tril, jnp.broadcast_shapes(q.scale_tril.shape, diff.shape + (D,))
        ),
        jnp.broadcast_to(diff, jnp.broadcast_shapes(diff.shape, q.loc.shape))[..., None],
        lower=True,
    )
    mahalanobis = jnp.sum(Lq_inv_diff[..., 0] ** 2, axis=-1)
    return 0.5 * (tr + mahalanobis - D) + q_half_logdet - p_half_logdet


@register_kl(Beta, Beta)
def _kl_beta_beta(p, q):
    a1, b1 = p.concentration1, p.concentration0
    a2, b2 = q.concentration1, q.concentration0
    t1 = betaln(a2, b2) - betaln(a1, b1)
    t2 = (a1 - a2) * digamma(a1) + (b1 - b2) * digamma(b1)
    t3 = (a2 - a1 + b2 - b1) * digamma(a1 + b1)
    return t1 + t2 + t3


@register_kl(Gamma, Gamma)
def _kl_gamma_gamma(p, q):
    a1, b1 = p.concentration, p.rate
    a2, b2 = q.concentration, q.rate
    t1 = a2 * jnp.log(b1 / b2) + gammaln(a2) - gammaln(a1)
    t2 = (a1 - a2) * digamma(a1)
    t3 = a1 * (b2 / b1 - 1)
    return t1 + t2 + t3


@register_kl(Dirichlet, Dirichlet)
def _kl_dirichlet_dirichlet(p, q):
    a, b = p.concentration, q.concentration
    a0 = a.sum(-1)
    return (
        gammaln(a0)
        - gammaln(a).sum(-1)
        - gammaln(b.sum(-1))
        + gammaln(b).sum(-1)
        + ((a - b) * (digamma(a) - digamma(a0)[..., None])).sum(-1)
    )


@register_kl(CategoricalProbs, CategoricalProbs)
def _kl_cat_cat(p, q):
    return (p.probs * (jnp.log(p.probs) - jnp.log(q.probs))).sum(-1)


@register_kl(CategoricalLogits, CategoricalLogits)
def _kl_catlogits_catlogits(p, q):
    from jax.scipy.special import logsumexp

    p_logp = p.logits - logsumexp(p.logits, axis=-1, keepdims=True)
    q_logp = q.logits - logsumexp(q.logits, axis=-1, keepdims=True)
    return (jnp.exp(p_logp) * (p_logp - q_logp)).sum(-1)


@register_kl(Weibull, Gamma)
def _kl_weibull_gamma(p, q):
    a = p.concentration
    b = p.scale
    euler = jnp.euler_gamma
    t1 = -q.concentration * jnp.log(q.rate) + gammaln(q.concentration)
    # E_p[log p] = log(a/b) - γ(1 - 1/a) - 1  (negative Weibull entropy)
    t2 = jnp.log(a / b) - euler * (1 - 1 / a) - 1
    t3 = q.rate * b * jnp.exp(gammaln(1 + 1 / a))
    t4 = -(q.concentration - 1) * (jnp.log(b) - euler / a)
    return t1 + t2 + t3 + t4


@register_kl(Delta, ExpandedDistribution)
def _kl_delta_expanded(p, q):
    return -q.log_prob(p.v) + p.log_density


@register_kl(Independent, CirculantNormal)
def _kl_indnormal_circulant(p, q):
    """KL(N(mu, diag) || CirculantNormal) in O(n log n) via rFFT
    (reference: distributions/kl.py:187)."""
    if not isinstance(p.base_dist, Normal) or p.reinterpreted_batch_ndims != 1:
        raise NotImplementedError
    residual = q.mean - p.mean
    n = residual.shape[-1]
    log_cov_rfft = jnp.log(q.covariance_rfft)
    quad = jnp.sum(
        residual
        * jnp.fft.irfft(jnp.fft.rfft(residual) / q.covariance_rfft, n),
        axis=-1,
    )
    return (
        quad
        + jnp.fft.irfft(1 / q.covariance_rfft, n)[..., 0]
        * jnp.sum(p.variance, axis=-1)
        + log_cov_rfft.sum(axis=-1)
        + log_cov_rfft[..., 1 : (n + 1) // 2].sum(axis=-1)
        - jnp.log(p.variance).sum(axis=-1)
        - n
    ) / 2


@register_kl(Kumaraswamy, Beta)
def _kl_kumaraswamy_beta(p, q):
    """Kumaraswamy -> Beta KL via the truncated Taylor series of
    arXiv:1605.06197 Eq. (12)."""
    from jax.scipy.special import betaln, digamma

    taylor_order = getattr(p, "KL_KUMARASWAMY_BETA_TAYLOR_ORDER", 10)
    a, b = p.concentration1, p.concentration0
    alpha, beta = q.concentration1, q.concentration0
    b_reciprocal = jnp.reciprocal(b)
    a_b = a * b
    t1 = (alpha / a - 1) * (jnp.euler_gamma + digamma(b) + b_reciprocal)
    t2 = jnp.log(a_b) + betaln(alpha, beta) + (b_reciprocal - 1)
    a_ = jnp.expand_dims(a, -1)
    b_ = jnp.expand_dims(b, -1)
    a_b_ = jnp.expand_dims(a_b, -1)
    m = jnp.arange(1, taylor_order + 1)
    t3 = (beta - 1) * b * (jnp.exp(betaln(m / a_, b_)) / (m + a_b_)).sum(-1)
    return t1 + t2 + t3
