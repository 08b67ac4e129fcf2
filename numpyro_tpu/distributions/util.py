"""Shared numeric helpers for the distributions layer.

Fresh TPU-first implementations of the utility surface of
numpyro/distributions/util.py — shape promotion, masked scaling, stable
special-function kernels.  Everything is jit/vmap-safe jnp code.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax, random, vmap
from jax.scipy.linalg import solve_triangular

# matrix/vector helpers ------------------------------------------------------


def promote_shapes(*args, shape=()):
    """Left-pad arg shapes so they broadcast against each other and ``shape``."""
    if len(args) < 2 and not shape:
        return args
    shapes = [jnp.shape(arg) for arg in args]
    num_dims = len(lax.broadcast_shapes(shape, *shapes))
    return [
        jnp.reshape(arg, (1,) * (num_dims - len(s)) + s) if len(s) < num_dims else arg
        for arg, s in zip(args, shapes)
    ]


def sum_rightmost(x, dim):
    if dim == 0:
        return x
    return jnp.sum(x, axis=tuple(range(-dim, 0)))


def scale_and_mask(x, scale=None, mask=None):
    """Scale a log-prob tensor, respecting a boolean mask (0 where masked)."""
    if mask is None:
        if scale is None:
            return x
        return x * scale
    if scale is None:
        return jnp.where(mask, x, 0.0)
    return jnp.where(mask, x * scale, 0.0)


def matrix_to_tril_vec(x, diagonal=0):
    idxs = jnp.tril_indices(x.shape[-1], diagonal)
    return x[..., idxs[0], idxs[1]]


def vec_to_tril_matrix(t, diagonal=0):
    from .transforms import vec_to_tril_matrix as _impl

    return _impl(t, diagonal)


def cholesky_of_inverse(matrix):
    """Cholesky of matrix inverse via triangular solve (stable, batched)."""
    tril_inv = jnp.swapaxes(
        jnp.linalg.cholesky(matrix[..., ::-1, ::-1])[..., ::-1, ::-1], -2, -1
    )
    identity = jnp.broadcast_to(jnp.identity(matrix.shape[-1]), tril_inv.shape)
    return solve_triangular(tril_inv, identity, lower=True)


def add_diag(matrix, diag):
    """matrix + diag(diag) for batched square matrices."""
    idx = jnp.arange(matrix.shape[-1])
    return matrix.at[..., idx, idx].add(diag[..., None] if jnp.ndim(diag) == 0 else diag)


# lazy_property ---------------------------------------------------------------


class lazy_property:
    """Cache an expensive derived quantity (e.g. a Cholesky factor) on first
    access; the cached value participates in pytree flattening when listed in
    ``pytree_data_fields``."""

    def __init__(self, wrapped):
        self.wrapped = wrapped
        functools.update_wrapper(self, wrapped)

    def __get__(self, instance, obj_type=None):
        if instance is None:
            return self
        value = self.wrapped(instance)
        setattr(instance, self.wrapped.__name__, value)
        return value


def validate_sample(log_prob_fn):
    @functools.wraps(log_prob_fn)
    def wrapper(self, *args, **kwargs):
        log_prob = log_prob_fn(self, *args, **kwargs)
        if self._validate_args:
            value = kwargs["value"] if "value" in kwargs else args[0]
            mask = self._validate_sample(value)
            log_prob = jnp.where(mask, log_prob, -jnp.inf)
        return log_prob

    return wrapper


def is_prng_key(key) -> bool:
    try:
        if jax.dtypes.issubdtype(key.dtype, jax.dtypes.prng_key):
            return key.shape == ()
        return key.shape == (2,) and key.dtype == np.uint32
    except AttributeError:
        return False


def assert_one_of(**kwargs):
    specified = [k for k, v in kwargs.items() if v is not None]
    if len(specified) != 1:
        raise ValueError(
            f"Exactly one of {list(kwargs)} must be specified; got {specified}"
        )


# special-function kernels ----------------------------------------------------


def binary_cross_entropy_with_logits(x, y):
    # -y * log sigmoid(x) - (1 - y) * log sigmoid(-x), stably
    return jnp.clip(x, 0) + jnp.log1p(jnp.exp(-jnp.abs(x))) - x * y


def clamp_probs(probs):
    finfo = jnp.finfo(jnp.result_type(probs, float))
    return jnp.clip(probs, finfo.tiny, 1.0 - finfo.eps)


def logits_to_probs(logits, is_binary=False):
    if is_binary:
        return jax.nn.sigmoid(logits)
    return jax.nn.softmax(logits, axis=-1)


def probs_to_logits(probs, is_binary=False):
    ps_clamped = clamp_probs(probs)
    if is_binary:
        return jnp.log(ps_clamped) - jnp.log1p(-ps_clamped)
    return jnp.log(ps_clamped)


def multigammaln(a, d):
    constant = 0.25 * d * (d - 1) * jnp.log(jnp.pi)
    res = jnp.sum(
        jax.scipy.special.gammaln(
            jnp.expand_dims(a, axis=-1) - 0.5 * jnp.arange(d)
        ),
        axis=-1,
    )
    return res + constant


def betainc(a, b, x):
    return jax.scipy.special.betainc(a, b, x)


def betaincinv(a, b, y):
    # Newton iterations on a bracketed bisection start; jax has no betaincinv.
    # Initialize with the mean then run fixed-count bisection (jit-friendly).
    def cond_fn(val):
        return val[4] < 60

    def body_fn(val):
        lo, hi, a_, b_, it = val
        mid = 0.5 * (lo + hi)
        f = betainc(a_, b_, mid) - y
        lo = jnp.where(f < 0, mid, lo)
        hi = jnp.where(f < 0, hi, mid)
        return lo, hi, a_, b_, it + 1

    a, b, y = jnp.broadcast_arrays(a, b, y)
    lo = jnp.zeros_like(y)
    hi = jnp.ones_like(y)
    lo, hi, _, _, _ = lax.while_loop(cond_fn, body_fn, (lo, hi, a, b, 0))
    return 0.5 * (lo + hi)


def gammaincinv(a, y):
    def cond_fn(val):
        return val[3] < 120

    def body_fn(val):
        lo, hi, a_, it = val
        mid = 0.5 * (lo + hi)
        f = jax.scipy.special.gammainc(a_, mid) - y
        lo = jnp.where(f < 0, mid, lo)
        hi = jnp.where(f < 0, hi, mid)
        return lo, hi, a_, it + 1

    a, y = jnp.broadcast_arrays(a, y)
    lo = jnp.zeros_like(y)
    hi = jnp.full_like(y, 1e6)
    lo, hi, _, _ = lax.while_loop(cond_fn, body_fn, (lo, hi, a, 0))
    return 0.5 * (lo + hi)


def stirling_approx_tail(k):
    precomputed = jnp.array(
        [
            0.08106146679532726,
            0.04134069595540929,
            0.02767792568499834,
            0.02079067210376509,
            0.01664469118982119,
            0.01387612882307075,
            0.01189670994589177,
            0.01041126526197209,
            0.009255462182712733,
            0.008330563433362871,
        ]
    )
    kp1 = k + 1
    kp1sq = (k + 1) ** 2
    tail_general = (1.0 / 12 - (1.0 / 360 - 1.0 / 1260 / kp1sq) / kp1sq) / kp1
    return jnp.where(k < 10, precomputed[jnp.clip(k, 0, 9).astype(int)], tail_general)


def _binomial_btrs(key, p, n):
    """Transformed-rejection binomial sampler (Hormann 1993) for n*p >= 10.

    Written as a single bounded while_loop so it fuses into the surrounding
    sampling program.
    """

    def _btrs_body(val):
        _, key, _, _ = val
        key, key_u, key_v = random.split(key, 3)
        u = random.uniform(key_u)
        v = random.uniform(key_v)
        u = u - 0.5
        k = jnp.floor(
            (2 * tr_params.a / (0.5 - jnp.abs(u)) + tr_params.b) * u + tr_params.c
        ).astype(n.dtype)
        return k, key, u, v

    def _btrs_cond(val):
        k, key, u, v = val
        early_accept = (jnp.abs(u) <= tr_params.u_r) & (v <= tr_params.v_r)
        out_of_range = (k < 0) | (k > n)

        def accept_fn(k, u, v):
            log_v = jnp.log(v)
            m = jnp.floor((n + 1) * p).astype(n.dtype)
            log_accept = (
                (m + 0.5) * (jnp.log((m + 1) / (n - m + 1)) + tr_params.log_p)
                + (n + 1) * jnp.log((n - m + 1) / (n - k + 1))
                + (k + 0.5) * (jnp.log((n - k + 1) / (k + 1)) + tr_params.log_p)
                + stirling_approx_tail(k)
                + stirling_approx_tail(n - k)
                - stirling_approx_tail(m)
                - stirling_approx_tail(n - m)
            )
            return log_v <= log_accept

        accept = ~out_of_range & (early_accept | accept_fn(k, u, v))
        return ~accept

    from collections import namedtuple

    TRParams = namedtuple(
        "TRParams", ["a", "b", "c", "u_r", "v_r", "log_p", "log1_p"]
    )
    q = 1.0 - p
    stddev = jnp.sqrt(n * p * q)
    b = 1.15 + 2.53 * stddev
    a = -0.0873 + 0.0248 * b + 0.01 * p
    c = n * p + 0.5
    v_r = 0.92 - 4.2 / b
    u_r = 0.43
    log_p = jnp.log(p)
    log1_p = jnp.log1p(-p)
    tr_params = TRParams(a, b, c, u_r, v_r, log_p, log1_p)

    ret = lax.while_loop(
        _btrs_cond,
        _btrs_body,
        (-1 * jnp.ones_like(n), key, jnp.zeros_like(p), jnp.zeros_like(p)),
    )
    return ret[0]


def _binomial_inversion(key, p, n):
    """Geometric-jump inversion sampler for small n*p."""

    def _binom_inv_body_fn(val):
        i, key, geom_acc = val
        key, key_u = random.split(key)
        u = random.uniform(key_u)
        geom = jnp.ceil(jnp.log(u) / log1_p)
        geom_acc = geom_acc + geom
        return i + 1, key, geom_acc

    def _binom_inv_cond_fn(val):
        i, _, geom_acc = val
        return geom_acc <= n

    log1_p = jnp.log1p(-p)
    ret = lax.while_loop(
        _binom_inv_cond_fn,
        _binom_inv_body_fn,
        (jnp.asarray(-1.0), key, jnp.asarray(0.0)),
    )
    return jnp.clip(ret[0], 0.0, n)


def _binomial_dispatch(key, p, n):
    def dispatch(key, p, n):
        is_le_mid = p <= 0.5
        pq = jnp.where(is_le_mid, p, 1 - p)
        mu = n * pq
        k = lax.cond(
            mu < 10,
            lambda args: _binomial_inversion(*args),
            lambda args: _binomial_btrs(*args).astype(jnp.result_type(float)),
            (key, pq, n),
        )
        return jnp.where(is_le_mid, k, n - k)

    # handle degenerate cases without branching inside the sampler
    n = jnp.asarray(n, dtype=jnp.result_type(float))
    p_ok = (p > 0) & (p < 1) & (n > 0)
    safe_p = jnp.where(p_ok, p, 0.5)
    safe_n = jnp.where(n > 0, n, 1.0)
    k = dispatch(key, safe_p, safe_n)
    k = jnp.where(p_ok, k, jnp.where(p >= 1, n, 0.0))
    return k


@functools.partial(jax.jit, static_argnums=(3,))
def _binomial(key, p, n, shape):
    shape = shape or lax.broadcast_shapes(jnp.shape(p), jnp.shape(n))
    p = jnp.reshape(jnp.broadcast_to(p, shape), -1)
    n = jnp.reshape(jnp.broadcast_to(n, shape), -1)
    key = random.split(key, jnp.size(p))
    ret = vmap(_binomial_dispatch)(key, p, n)
    return jnp.reshape(ret, shape)


def binomial(key, p, n=1, shape=()):
    return _binomial(key, p, n, shape)


@functools.partial(jax.jit, static_argnums=(2,))
def _categorical(key, p, shape):
    # invert the CDF on uniform draws; fully batched, no host control flow
    shape = shape or p.shape[:-1]
    s = jnp.cumsum(p, axis=-1)
    r = random.uniform(key, shape=shape + (1,)) * s[..., -1:]
    return jnp.sum(s < r, axis=-1).astype(jnp.result_type(int))


def categorical(key, p, shape=()):
    return _categorical(key, p, shape)


def multinomial(key, p, n, shape=(), total_count_max=None):
    if total_count_max is None:
        if isinstance(n, jax.core.Tracer):
            raise ValueError(
                "Please specify total_count_max when total_count is a traced value"
            )
        n_max = int(np.max(jax.device_get(n)))
    else:
        n_max = total_count_max
    shape = shape or lax.broadcast_shapes(jnp.shape(p)[:-1], jnp.shape(n))
    if n_max == 0:
        return jnp.zeros(shape + jnp.shape(p)[-1:], dtype=jnp.result_type(int))
    # one-hot accumulate n_max categorical draws, masking beyond each count
    excess = jnp.concatenate(
        [
            jnp.expand_dims(n_max - n.astype(p.dtype), -1),
            jnp.zeros(jnp.shape(n) + (jnp.shape(p)[-1] - 1,)),
        ],
        -1,
    )
    samples = categorical(key, p, (n_max,) + shape)
    mask = jnp.arange(n_max).reshape((n_max,) + (1,) * len(shape)) < jnp.broadcast_to(
        n, shape
    )
    samples_one_hot = jax.nn.one_hot(samples, jnp.shape(p)[-1], dtype=p.dtype)
    counts = jnp.sum(
        samples_one_hot * jnp.expand_dims(mask.astype(p.dtype), -1), axis=0
    )
    return counts.astype(jnp.result_type(int))


def von_mises_centered(key, concentration, shape=(), dtype=jnp.float64):
    """Best-Fisher (1979) wrapped-Cauchy rejection sampler, centered at 0."""
    shape = shape or jnp.shape(concentration)
    dtype = jnp.result_type(dtype)
    concentration = lax.convert_element_type(concentration, dtype)
    concentration = jnp.broadcast_to(concentration, shape)

    s_cutoff_map = {
        jnp.dtype(jnp.float16): 1.8e-1,
        jnp.dtype(jnp.float32): 2e-2,
        jnp.dtype(jnp.float64): 1.2e-4,
    }
    s_cutoff = s_cutoff_map.get(jnp.dtype(dtype), 2e-2)

    r = 1.0 + jnp.sqrt(1.0 + 4.0 * concentration**2)
    rho = (r - jnp.sqrt(2.0 * r)) / (2.0 * concentration)
    s_exact = (1.0 + rho**2) / (2.0 * rho)
    s_approximate = 1.0 / jnp.clip(concentration, jnp.finfo(dtype).tiny)
    s = jnp.where(concentration > s_cutoff, s_exact, s_approximate)

    def cond_fn(val):
        _, _, done, _ = val
        return jnp.any(~done)

    def body_fn(val):
        u_key, w, done, key = val
        key, key_u, key_v, key_sgn = random.split(key, 4)
        u = random.uniform(key_u, shape, dtype=dtype, minval=-1.0, maxval=1.0)
        z = jnp.cos(jnp.pi * u)
        w_prop = jnp.where(done, w, (1.0 + s * z) / (s + z))
        y = concentration * (s - w_prop)
        v = random.uniform(key_v, shape, dtype=dtype)
        accept = (y * (2.0 - y) >= v) | (jnp.log(jnp.clip(y / v, 1e-37)) + 1.0 >= y)
        sgn = jnp.where(
            random.bernoulli(key_sgn, shape=shape), 1.0, -1.0
        )
        u_key = jnp.where(done, u_key, sgn)
        return u_key, w_prop, done | accept, key

    init_done = jnp.zeros(shape, dtype=bool)
    sgn, w, _, _ = lax.while_loop(
        cond_fn,
        body_fn,
        (jnp.ones(shape, dtype=dtype), jnp.zeros(shape, dtype=dtype), init_done, key),
    )
    return sgn * jnp.arccos(jnp.clip(w, -1.0, 1.0))


def safe_normalize(x, *, p=2):
    """Normalize a vector to unit p-norm, safely at 0."""
    norm = jnp.linalg.norm(x, p, axis=-1, keepdims=True)
    x = x / jnp.clip(norm, jnp.finfo(x).tiny)
    # at zero, return a uniform direction
    mask = (norm == 0)
    dim = x.shape[-1]
    return jnp.where(mask, jnp.full_like(x, dim ** (-1 / p)), x)


def cholesky_update(L, x, coef=1):
    """Cholesky factor of ``L @ L.T + coef * outer(x, x)`` via the classic
    rank-one LDL update (Gill–Golub–Murray–Saunders), scanned over columns —
    O(n^2) with the column loop as the only sequential axis
    (reference behavior: numpyro/distributions/util.py:365)."""
    batch_shape = lax.broadcast_shapes(L.shape[:-2], x.shape[:-1])
    L = jnp.broadcast_to(L, batch_shape + L.shape[-2:])
    x = jnp.broadcast_to(x, batch_shape + x.shape[-1:])
    n = x.shape[-1]
    diag = jnp.diagonal(L, axis1=-2, axis2=-1)
    Lu = L / diag[..., None, :]  # unit-diagonal lower triangular
    D = jnp.square(diag)

    # scan inputs: per-column (d_j, column of Lu, one-hot row selector)
    D_cols = jnp.moveaxis(D, -1, 0)  # (n,) + batch
    Lu_cols = jnp.moveaxis(Lu, -1, 0)  # (n,) + batch + (n,)
    eye = jnp.eye(n, dtype=L.dtype)  # (n, n)

    def body(carry, inputs):
        a, w = carry  # a: batch, w: batch + (n,)
        d_j, L_col, e = inputs
        p = (w * e).sum(-1)  # w[j]
        gamma = d_j + a * jnp.square(p)
        beta = p * a / gamma
        a_new = a * d_j / gamma
        w_new = w - p[..., None] * L_col
        below = (jnp.cumsum(e) > 0) & (e == 0)  # rows strictly below j
        L_col_new = L_col + beta[..., None] * w_new * below
        return (a_new, w_new), (gamma, L_col_new)

    a0 = jnp.full(batch_shape, coef, dtype=x.dtype)
    (_, _), (D_new, Lu_new_cols) = lax.scan(body, (a0, x), (D_cols, Lu_cols, eye))
    D_new = jnp.moveaxis(D_new, 0, -1)
    Lu_new = jnp.moveaxis(Lu_new_cols, 0, -1)
    return Lu_new * jnp.sqrt(D_new)[..., None, :]


def logmatmulexp(x, y):
    """Numerically-stable log(exp(x) @ exp(y)) — a matmul in log space
    (used by BNAF's blockwise Jacobian accumulation and the parallel-scan
    HMM machinery)."""
    x_shift = lax.stop_gradient(jnp.amax(x, -1, keepdims=True))
    y_shift = lax.stop_gradient(jnp.amax(y, -2, keepdims=True))
    xy = jnp.log(jnp.matmul(jnp.exp(x - x_shift), jnp.exp(y - y_shift)))
    return xy + x_shift + y_shift
