"""Bijective transforms + the ``biject_to`` constraint registry.

TPU-native re-design of the transform layer of NumPyro
(reference: numpyro/distributions/transforms.py:64-1780).  A ``Transform``
maps a constrained domain to a codomain bijectively and reports
``log_abs_det_jacobian``; ``biject_to(constraint)`` returns a transform whose
codomain is that constraint — HMC/SVI run in the unconstrained preimage.

Everything here is shape-polymorphic pure jnp so a single transform instance
vectorizes over an arbitrary chain/batch prefix — the chain-massive engine
applies these to ``(num_chains, ...)`` arrays inside one XLA program.
"""

from __future__ import annotations

import math
import weakref

import jax
import jax.numpy as jnp
from jax import lax
from jax.nn import log_sigmoid, softplus

from . import constraints

__all__ = [
    "biject_to",
    "AbsTransform",
    "AffineTransform",
    "CholeskyTransform",
    "ComplexTransform",
    "ComposeTransform",
    "CorrCholeskyTransform",
    "CorrMatrixCholeskyTransform",
    "ExpTransform",
    "IdentityTransform",
    "IndependentTransform",
    "L1BallTransform",
    "LowerCholeskyTransform",
    "LowerCholeskyAffine",
    "OrderedTransform",
    "PackRealFastFourierCoefficientsTransform",
    "PermuteTransform",
    "PowerTransform",
    "RealFastFourierTransform",
    "RecursiveLinearTransform",
    "ReshapeTransform",
    "ScaledUnitLowerCholeskyTransform",
    "SigmoidTransform",
    "SimplexToOrderedTransform",
    "SoftplusLowerCholeskyTransform",
    "SoftplusTransform",
    "StickBreakingTransform",
    "Transform",
    "ZeroSumTransform",
]


def _clipped_expit(x):
    finfo = jnp.finfo(jnp.result_type(x, float))
    return jnp.clip(jax.nn.sigmoid(x), finfo.tiny, 1.0 - finfo.eps)


def sum_rightmost(x, dim):
    """Sum the rightmost ``dim`` dimensions of ``x``."""
    if dim == 0:
        return x
    return x.sum(tuple(range(-dim, 0)))


class Transform:
    """Base transform.  Every subclass is auto-registered as a JAX pytree so
    transforms (and distributions containing them) can cross jit/vmap/scan
    boundaries: declare traced attributes in ``pytree_data_fields`` and
    static attributes in ``pytree_aux_fields`` (mirrors the Distribution
    flatten protocol; reference registers transforms as pytrees too,
    numpyro/distributions/transforms.py:64)."""

    domain = constraints.real
    codomain = constraints.real
    _inv = None
    pytree_data_fields: tuple = ()
    pytree_aux_fields: tuple = ()

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        jax.tree_util.register_pytree_node(
            cls, cls._pytree_flatten, cls._pytree_unflatten
        )

    @classmethod
    def _gather_fields(cls, attr):
        fields = []
        for base in cls.__mro__:
            for f in base.__dict__.get(attr, ()):
                if f not in fields:
                    fields.append(f)
        return tuple(fields)

    def _pytree_flatten(self):
        data_fields = type(self)._gather_fields("pytree_data_fields")
        aux_fields = type(self)._gather_fields("pytree_aux_fields")
        data = tuple(getattr(self, f, None) for f in data_fields)
        aux = tuple(getattr(self, f, None) for f in aux_fields)
        return data, (data_fields, aux_fields, aux)

    @classmethod
    def _pytree_unflatten(cls, aux_data, params):
        data_fields, aux_fields, aux = aux_data
        self = cls.__new__(cls)
        for f, v in zip(data_fields, params):
            setattr(self, f, v)
        for f, v in zip(aux_fields, aux):
            setattr(self, f, v)
        return self

    @property
    def inv(self):
        inv = None
        if self._inv is not None:
            inv = self._inv()
        if inv is None:
            inv = _InverseTransform(self)
            self._inv = weakref.ref(inv)
        return inv

    def __call__(self, x):
        raise NotImplementedError

    def _inverse(self, y):
        raise NotImplementedError

    def log_abs_det_jacobian(self, x, y, intermediates=None):
        raise NotImplementedError

    def call_with_intermediates(self, x):
        return self(x), None

    def forward_shape(self, shape):
        """Output event+batch shape given input shape."""
        return shape

    def inverse_shape(self, shape):
        return shape

    def __eq__(self, other):
        return type(self) is type(other)

    def __hash__(self):
        return hash(type(self))


class _InverseTransform(Transform):
    pytree_data_fields = ("_transform",)
    def __init__(self, transform):
        super().__init__()
        self._transform = transform

    @property
    def domain(self):
        return self._transform.codomain

    @property
    def codomain(self):
        return self._transform.domain

    @property
    def inv(self):
        return self._transform

    def __call__(self, x):
        return self._transform._inverse(x)

    def _inverse(self, y):
        return self._transform(y)

    def log_abs_det_jacobian(self, x, y, intermediates=None):
        return -self._transform.log_abs_det_jacobian(y, x, None)

    def forward_shape(self, shape):
        return self._transform.inverse_shape(shape)

    def inverse_shape(self, shape):
        return self._transform.forward_shape(shape)

    def __eq__(self, other):
        return type(self) is type(other) and self._transform == other._transform


class IdentityTransform(Transform):
    def __call__(self, x):
        return x

    def _inverse(self, y):
        return y

    def log_abs_det_jacobian(self, x, y, intermediates=None):
        return jnp.zeros_like(x)


class AbsTransform(Transform):
    domain = constraints.real
    codomain = constraints.positive

    def __call__(self, x):
        return jnp.abs(x)

    def _inverse(self, y):
        return y


class AffineTransform(Transform):
    """y = loc + scale * x"""

    pytree_data_fields = ("loc", "scale")
    pytree_aux_fields = ("domain",)
    def __init__(self, loc, scale, domain=constraints.real):
        self.loc = loc
        self.scale = scale
        self.domain = domain

    @property
    def codomain(self):
        if self.domain is constraints.real:
            return constraints.real
        elif isinstance(self.domain, constraints.independent):
            return constraints.independent(
                AffineTransform(self.loc, self.scale, self.domain.base_constraint).codomain,
                self.domain.reinterpreted_batch_ndims,
            )
        elif self.domain is constraints.positive:
            # assume scale > 0 for constraint propagation
            return constraints.greater_than(self(0.0))
        elif isinstance(self.domain, constraints.greater_than):
            return constraints.greater_than(self(self.domain.lower_bound))
        elif isinstance(self.domain, constraints.less_than):
            return constraints.less_than(self(self.domain.upper_bound))
        elif isinstance(self.domain, constraints.interval):
            return constraints.interval(
                self(self.domain.lower_bound), self(self.domain.upper_bound)
            )
        else:
            raise NotImplementedError

    def __call__(self, x):
        return self.loc + self.scale * x

    def _inverse(self, y):
        return (y - self.loc) / self.scale

    def log_abs_det_jacobian(self, x, y, intermediates=None):
        return jnp.broadcast_to(jnp.log(jnp.abs(self.scale)), jnp.shape(x))

    def forward_shape(self, shape):
        return lax.broadcast_shapes(shape, jnp.shape(self.loc), jnp.shape(self.scale))

    inverse_shape = forward_shape

    def __eq__(self, other):
        if type(other) is not AffineTransform:
            return False
        import numpy as np

        return np.array_equal(self.loc, other.loc) and np.array_equal(
            self.scale, other.scale
        )


class ExpTransform(Transform):
    pytree_aux_fields = ("domain",)
    domain = constraints.real
    codomain = constraints.positive

    def __init__(self, domain=constraints.real):
        self.domain = domain

    @property
    def codomain(self):
        if self.domain is constraints.real:
            return constraints.positive
        elif isinstance(self.domain, constraints.greater_than):
            return constraints.greater_than(jnp.exp(self.domain.lower_bound))
        elif isinstance(self.domain, constraints.interval):
            return constraints.interval(
                jnp.exp(self.domain.lower_bound), jnp.exp(self.domain.upper_bound)
            )
        raise NotImplementedError

    def __call__(self, x):
        return jnp.exp(x)

    def _inverse(self, y):
        return jnp.log(y)

    def log_abs_det_jacobian(self, x, y, intermediates=None):
        return x


class SigmoidTransform(Transform):
    codomain = constraints.unit_interval

    def __call__(self, x):
        return _clipped_expit(x)

    def _inverse(self, y):
        return jax.scipy.special.logit(y)

    def log_abs_det_jacobian(self, x, y, intermediates=None):
        return -softplus(x) - softplus(-x)


class SoftplusTransform(Transform):
    """y = log(1 + exp(x)); smooth map onto the positive reals with better
    behavior than exp far from 0 (no overflow, unit slope asymptotically)."""

    domain = constraints.real
    codomain = constraints.softplus_positive

    def __call__(self, x):
        return softplus(x)

    def _inverse(self, y):
        # log(exp(y) - 1) computed stably
        return y + jnp.log(-jnp.expm1(-y))

    def log_abs_det_jacobian(self, x, y, intermediates=None):
        return -softplus(-x)


class PowerTransform(Transform):
    pytree_data_fields = ("exponent",)
    domain = constraints.positive
    codomain = constraints.positive

    def __init__(self, exponent):
        self.exponent = exponent

    def __call__(self, x):
        return jnp.power(x, self.exponent)

    def _inverse(self, y):
        return jnp.power(y, 1.0 / self.exponent)

    def log_abs_det_jacobian(self, x, y, intermediates=None):
        return jnp.log(jnp.abs(self.exponent * y / x))

    def forward_shape(self, shape):
        return lax.broadcast_shapes(shape, jnp.shape(self.exponent))

    inverse_shape = forward_shape

    def __eq__(self, other):
        if type(other) is not PowerTransform:
            return False
        import numpy as np

        return np.array_equal(self.exponent, other.exponent)


class ComposeTransform(Transform):
    pytree_data_fields = ("parts",)
    def __init__(self, parts):
        self.parts = list(parts)

    @property
    def domain(self):
        input_event_dim = self.parts[-1].domain.event_dim
        for part in reversed(self.parts[:-1]):
            input_event_dim = part.domain.event_dim + max(
                input_event_dim - part.codomain.event_dim, 0
            )
        domain = self.parts[0].domain
        if domain.event_dim < input_event_dim:
            return constraints.independent(domain, input_event_dim - domain.event_dim)
        return domain

    @property
    def codomain(self):
        output_event_dim = self.parts[0].codomain.event_dim
        for part in self.parts[1:]:
            output_event_dim = part.codomain.event_dim + max(
                output_event_dim - part.domain.event_dim, 0
            )
        codomain = self.parts[-1].codomain
        if codomain.event_dim < output_event_dim:
            return constraints.independent(
                codomain, output_event_dim - codomain.event_dim
            )
        return codomain

    def __call__(self, x):
        for part in self.parts:
            x = part(x)
        return x

    def _inverse(self, y):
        for part in reversed(self.parts):
            y = part.inv(y)
        return y

    def call_with_intermediates(self, x):
        intermediates = []
        for part in self.parts[:-1]:
            x_tmp, inter = part.call_with_intermediates(x)
            intermediates.append([x, inter])
            x = x_tmp
        x_tmp, inter = self.parts[-1].call_with_intermediates(x)
        intermediates.append([x, inter])
        return x_tmp, intermediates

    def log_abs_det_jacobian(self, x, y, intermediates=None):
        if intermediates is not None and len(intermediates) != len(self.parts):
            raise ValueError("intermediates length mismatch")

        result = 0.0
        input_event_dim = self.domain.event_dim
        for i, part in enumerate(self.parts[:-1]):
            x_tmp = intermediates[i][0] if intermediates is not None else x
            inter = intermediates[i][1] if intermediates is not None else None
            y_tmp = part(x_tmp) if intermediates is None else (
                intermediates[i + 1][0] if i + 1 < len(intermediates) else y
            )
            logdet = part.log_abs_det_jacobian(x_tmp, y_tmp, intermediates=inter)
            batch_ndim = input_event_dim - part.domain.event_dim
            result = result + sum_rightmost(logdet, batch_ndim)
            input_event_dim = part.codomain.event_dim + batch_ndim
            if intermediates is None:
                x = y_tmp
        part = self.parts[-1]
        x_tmp = intermediates[-1][0] if intermediates is not None else x
        inter = intermediates[-1][1] if intermediates is not None else None
        logdet = part.log_abs_det_jacobian(x_tmp, y, intermediates=inter)
        batch_ndim = input_event_dim - part.domain.event_dim
        result = result + sum_rightmost(logdet, batch_ndim)
        return result

    def forward_shape(self, shape):
        for part in self.parts:
            shape = part.forward_shape(shape)
        return shape

    def inverse_shape(self, shape):
        for part in reversed(self.parts):
            shape = part.inverse_shape(shape)
        return shape

    def __eq__(self, other):
        return type(self) is type(other) and self.parts == other.parts


class IndependentTransform(Transform):
    pytree_data_fields = ("base_transform",)
    pytree_aux_fields = ("reinterpreted_batch_ndims",)
    """Reinterpret rightmost batch dims of a transform as event dims."""

    def __init__(self, base_transform, reinterpreted_batch_ndims):
        self.base_transform = base_transform
        self.reinterpreted_batch_ndims = reinterpreted_batch_ndims

    @property
    def domain(self):
        return constraints.independent(
            self.base_transform.domain, self.reinterpreted_batch_ndims
        )

    @property
    def codomain(self):
        return constraints.independent(
            self.base_transform.codomain, self.reinterpreted_batch_ndims
        )

    def __call__(self, x):
        return self.base_transform(x)

    def _inverse(self, y):
        return self.base_transform._inverse(y)

    def call_with_intermediates(self, x):
        return self.base_transform.call_with_intermediates(x)

    def log_abs_det_jacobian(self, x, y, intermediates=None):
        result = self.base_transform.log_abs_det_jacobian(x, y, intermediates)
        return sum_rightmost(result, self.reinterpreted_batch_ndims)

    def forward_shape(self, shape):
        return self.base_transform.forward_shape(shape)

    def inverse_shape(self, shape):
        return self.base_transform.inverse_shape(shape)

    def __eq__(self, other):
        return (
            type(self) is type(other)
            and self.base_transform == other.base_transform
            and self.reinterpreted_batch_ndims == other.reinterpreted_batch_ndims
        )


class StickBreakingTransform(Transform):
    """R^{K-1} -> K-simplex via stick breaking (logistic sticks)."""

    domain = constraints.real_vector
    codomain = constraints.simplex

    def __call__(self, x):
        # shift by log(K - k) so that zero maps to the uniform simplex point
        K = x.shape[-1] + 1
        offset = jnp.log(jnp.arange(K - 1, 0, -1, dtype=jnp.result_type(x, float)))
        z = _clipped_expit(x - offset)
        z1m_cumprod = jnp.cumprod(1 - z, axis=-1)
        pad_width = [(0, 0)] * (x.ndim - 1) + [(0, 1)]
        z_padded = jnp.pad(z, pad_width, mode="constant", constant_values=1.0)
        z1m_cumprod_shifted = jnp.pad(
            z1m_cumprod, pad_width, mode="constant", constant_values=1.0
        )
        return z_padded * jnp.roll(z1m_cumprod_shifted, shift=1, axis=-1)

    def _inverse(self, y):
        K = y.shape[-1]
        y_crop = y[..., :-1]
        z1m_cumprod = jnp.clip(
            1 - jnp.cumsum(y_crop, axis=-1), jnp.finfo(y.dtype).tiny
        )
        offset = jnp.log(jnp.arange(K - 1, 0, -1, dtype=y.dtype))
        x = jnp.log(y_crop) - jnp.log(
            jnp.concatenate(
                [jnp.ones_like(y_crop[..., :1]), z1m_cumprod[..., :-1]], -1
            )
            - y_crop
        )
        # x = logit(z) + offset
        return x + offset

    def log_abs_det_jacobian(self, x, y, intermediates=None):
        K = x.shape[-1] + 1
        offset = jnp.log(jnp.arange(K - 1, 0, -1, dtype=jnp.result_type(x, float)))
        x_offset = x - offset
        z1m_cumprod = 1 - jnp.cumsum(y[..., :-1], axis=-1)
        # |dy_k / dx_k| = z_k (1 - z_k) prod_{j<k}(1 - z_j)
        detJ = (
            -softplus(x_offset)
            - softplus(-x_offset)
            + jnp.log(
                jnp.concatenate(
                    [jnp.ones_like(x[..., :1]), jnp.clip(z1m_cumprod[..., :-1], jnp.finfo(x.dtype).tiny)],
                    -1,
                )
            )
        ).sum(-1)
        return detJ

    def forward_shape(self, shape):
        if len(shape) < 1:
            raise ValueError("Too few dimensions on input")
        return shape[:-1] + (shape[-1] + 1,)

    def inverse_shape(self, shape):
        if len(shape) < 1:
            raise ValueError("Too few dimensions on input")
        return shape[:-1] + (shape[-1] - 1,)


class OrderedTransform(Transform):
    """R^K -> ordered vectors: y_1 = x_1, y_k = y_{k-1} + exp(x_k)."""

    domain = constraints.real_vector
    codomain = constraints.ordered_vector

    def __call__(self, x):
        z = jnp.concatenate([x[..., :1], jnp.exp(x[..., 1:])], axis=-1)
        return jnp.cumsum(z, axis=-1)

    def _inverse(self, y):
        x = jnp.log(y[..., 1:] - y[..., :-1])
        return jnp.concatenate([y[..., :1], x], axis=-1)

    def log_abs_det_jacobian(self, x, y, intermediates=None):
        return x[..., 1:].sum(-1)


class SimplexToOrderedTransform(Transform):
    pytree_data_fields = ("anchor_point",)
    """Simplex -> ordered cutpoints via logit of the CDF (anchor point)."""

    domain = constraints.simplex
    codomain = constraints.ordered_vector

    def __init__(self, anchor_point=0.0):
        self.anchor_point = anchor_point

    def __call__(self, x):
        s = jnp.cumsum(x[..., :-1], axis=-1)
        y = jax.scipy.special.logit(s) + jnp.expand_dims(self.anchor_point, -1)
        return y

    def _inverse(self, y):
        y = y - jnp.expand_dims(self.anchor_point, -1)
        s = jax.nn.sigmoid(y)
        s_padded_high = jnp.pad(s, [(0, 0)] * (s.ndim - 1) + [(0, 1)], constant_values=1.0)
        s_padded_low = jnp.pad(s, [(0, 0)] * (s.ndim - 1) + [(1, 0)], constant_values=0.0)
        return s_padded_high - s_padded_low

    def log_abs_det_jacobian(self, x, y, intermediates=None):
        # |dy/ds| for logit, s = cumsum(x[:-1])
        s = jnp.cumsum(x[..., :-1], axis=-1)
        return -(jnp.log(s) + jnp.log1p(-s)).sum(-1)

    def forward_shape(self, shape):
        return shape[:-1] + (shape[-1] - 1,)

    def inverse_shape(self, shape):
        return shape[:-1] + (shape[-1] + 1,)

    def __eq__(self, other):
        if type(other) is not SimplexToOrderedTransform:
            return False
        import numpy as np

        return np.array_equal(self.anchor_point, other.anchor_point)


def _matrix_forward_shape(shape, offset=0):
    # (..., N) -> (..., D, D) where N = D*(D+1)/2 + offset*D
    if len(shape) < 1:
        raise ValueError("Too few dimensions on input")
    N = shape[-1]
    D = round((0.25 + 2 * N) ** 0.5 - 0.5)
    if D * (D + 1) // 2 != N:
        raise ValueError("Input is not a flattened lower-diagonal number")
    D = D - offset
    return shape[:-1] + (D, D)


def _matrix_inverse_shape(shape, offset=0):
    if len(shape) < 2:
        raise ValueError("Too few dimensions on input")
    if shape[-2] != shape[-1]:
        raise ValueError("Input is not square")
    D = shape[-1]
    N = (D + offset) * (D + offset + 1) // 2
    return shape[:-2] + (N,)


def vec_to_tril_matrix(x, diagonal=0):
    """Unpack a (..., N) vector into a (..., D, D) lower-triangular matrix."""
    N = x.shape[-1]
    D = round((0.25 + 2 * N) ** 0.5 - 0.5) - diagonal
    shape = x.shape[:-1] + (D, D)
    idx = jnp.tril_indices(D, diagonal)
    out = jnp.zeros(shape, dtype=x.dtype)
    return out.at[..., idx[0], idx[1]].set(x)


def matrix_to_tril_vec(x, diagonal=0):
    idx = jnp.tril_indices(x.shape[-1], diagonal)
    return x[..., idx[0], idx[1]]


class CorrCholeskyTransform(Transform):
    r"""R^{D(D-1)/2} -> Cholesky factors of correlation matrices.

    Signed-stick-breaking construction (tanh rows, unit-norm rows), the
    standard unconstrained parameterization for LKJCholesky-distributed
    latents.
    """

    domain = constraints.real_vector
    codomain = constraints.corr_cholesky

    def __call__(self, x):
        # 1. vector to lower-triangular (strictly below diagonal)
        z = jnp.tanh(x)
        t = vec_to_tril_matrix(z, diagonal=-1)
        # 2. row-wise stick breaking onto the sphere:
        # r_ij = t_ij * sqrt(prod_{k<j} (1 - t_ik^2))
        t_sq = t**2
        remainder = jnp.cumprod(1 - t_sq, axis=-1)
        shifted = jnp.pad(
            remainder[..., :-1],
            [(0, 0)] * (t.ndim - 1) + [(1, 0)],
            constant_values=1.0,
        )
        scale = jnp.sqrt(jnp.clip(shifted, 0.0))
        r = t * scale
        # diagonal: sqrt(1 - sum of squares of the row)
        diag = jnp.sqrt(jnp.clip(1 - jnp.sum(r**2, axis=-1), 0.0))
        r = r + jnp.vectorize(jnp.diag, signature="(n)->(n,n)")(diag)
        return r

    def _inverse(self, y):
        # z_ij = y_ij / sqrt(1 - sum_{k<j} y_ik^2)
        y_sq = y**2
        cumsum = jnp.cumsum(y_sq, axis=-1) - y_sq
        denom = jnp.sqrt(jnp.clip(1 - cumsum, jnp.finfo(y.dtype).tiny))
        z = y / denom
        z_tril = matrix_to_tril_vec(z, diagonal=-1)
        return jnp.arctanh(z_tril)

    def log_abs_det_jacobian(self, x, y, intermediates=None):
        # tanh part: sum log(1 - z^2) = sum 2*(log2 - x - softplus(-2x))
        tanh_logdet = -2 * jnp.sum(x + softplus(-2 * x) - math.log(2.0), axis=-1)
        # stick-breaking part: for row i, sum_j (i - j) * ... — equivalently
        # each column j contributes (D - 1 - j)?? Use: log|dr/dz| =
        # sum over strictly-lower entries of log(scale) where the row-sphere
        # factors accumulate; compute directly from y:
        # |det J| rows: prod_i prod_{j<i} (1 - sum_{k<j} y_ik^2)^{1/2}
        y_sq = y**2
        cumsum = jnp.cumsum(y_sq, axis=-1) - y_sq
        one_minus = jnp.clip(1 - cumsum, jnp.finfo(y.dtype).tiny)
        # only strictly-lower-triangular entries count
        D = y.shape[-1]
        mask = jnp.tril(jnp.ones((D, D), dtype=bool), k=-1)
        stick_logdet = 0.5 * jnp.sum(
            jnp.where(mask, jnp.log(one_minus), 0.0), axis=(-2, -1)
        )
        return stick_logdet + tanh_logdet

    def forward_shape(self, shape):
        return _matrix_forward_shape(shape, offset=-1)

    def inverse_shape(self, shape):
        return _matrix_inverse_shape(shape, offset=-1)


class CholeskyTransform(Transform):
    """positive-definite matrix -> its lower Cholesky factor."""

    domain = constraints.positive_definite
    codomain = constraints.lower_cholesky

    def __call__(self, x):
        return jnp.linalg.cholesky(x)

    def _inverse(self, y):
        return jnp.matmul(y, jnp.swapaxes(y, -2, -1))

    def log_abs_det_jacobian(self, x, y, intermediates=None):
        # log det of dL/dX for X = L L^T
        D = x.shape[-1]
        diag = jnp.diagonal(y, axis1=-2, axis2=-1)
        order = -jnp.arange(D, 0, -1, dtype=x.dtype)
        return -D * math.log(2.0) + (order * jnp.log(diag)).sum(-1)


class CorrMatrixCholeskyTransform(CholeskyTransform):
    domain = constraints.corr_matrix
    codomain = constraints.corr_cholesky

    def log_abs_det_jacobian(self, x, y, intermediates=None):
        D = x.shape[-1]
        diag = jnp.diagonal(y, axis1=-2, axis2=-1)
        order = -jnp.arange(D - 1, -1, -1, dtype=x.dtype)
        return (order * jnp.log(diag)).sum(-1)


class LowerCholeskyTransform(Transform):
    """R^{D(D+1)/2} -> lower-Cholesky matrices (exp on the diagonal)."""

    domain = constraints.real_vector
    codomain = constraints.lower_cholesky

    def _diag_transform(self, x):
        return jnp.exp(x)

    def _diag_inverse(self, y):
        return jnp.log(y)

    def __call__(self, x):
        n = round((math.sqrt(1 + 8 * x.shape[-1]) - 1) / 2)
        z = vec_to_tril_matrix(x[..., :-n], diagonal=-1)
        diag = self._diag_transform(x[..., -n:])
        return z + jnp.vectorize(jnp.diag, signature="(n)->(n,n)")(diag)

    def _inverse(self, y):
        z = matrix_to_tril_vec(y, diagonal=-1)
        diag = self._diag_inverse(jnp.diagonal(y, axis1=-2, axis2=-1))
        return jnp.concatenate([z, diag], axis=-1)

    def log_abs_det_jacobian(self, x, y, intermediates=None):
        n = round((math.sqrt(1 + 8 * x.shape[-1]) - 1) / 2)
        return x[..., -n:].sum(-1)

    def forward_shape(self, shape):
        return _matrix_forward_shape(shape)

    def inverse_shape(self, shape):
        return _matrix_inverse_shape(shape)


class SoftplusLowerCholeskyTransform(LowerCholeskyTransform):
    codomain = constraints.softplus_lower_cholesky

    def _diag_transform(self, x):
        return softplus(x)

    def _diag_inverse(self, y):
        return y + jnp.log(-jnp.expm1(-y))

    def log_abs_det_jacobian(self, x, y, intermediates=None):
        n = round((math.sqrt(1 + 8 * x.shape[-1]) - 1) / 2)
        return -softplus(-x[..., -n:]).sum(-1)


class ScaledUnitLowerCholeskyTransform(LowerCholeskyTransform):
    r"""LKJCholesky-friendly parameterization: L = diag(s) @ L_unit where
    L_unit has unit row norms; better-conditioned than plain exp-diagonal for
    covariance Cholesky factors."""

    codomain = constraints.scaled_unit_lower_cholesky

    def __call__(self, x):
        n = round((math.sqrt(1 + 8 * x.shape[-1]) - 1) / 2)
        z = vec_to_tril_matrix(x[..., :-n], diagonal=-1)
        diag = jnp.exp(x[..., -n:])
        # unit-row-norm lower cholesky from unconstrained strictly-lower part
        unit = z + jnp.broadcast_to(jnp.eye(n, dtype=x.dtype), z.shape)
        norm = jnp.linalg.norm(unit, axis=-1, keepdims=True)
        unit = unit / norm
        return unit * diag[..., None]

    def _inverse(self, y):
        diag = jnp.linalg.norm(y, axis=-1)
        unit = y / diag[..., None]
        z = unit / jnp.diagonal(unit, axis1=-2, axis2=-1)[..., None]
        return jnp.concatenate(
            [matrix_to_tril_vec(z, diagonal=-1), jnp.log(diag)], axis=-1
        )

    def log_abs_det_jacobian(self, x, y, intermediates=None):
        # computed numerically via jacfwd fallback for correctness; this
        # transform is used for guide params (no HMC hot path), so a
        # per-event jacobian determinant is acceptable.
        flat_fn = lambda v: self(v).reshape(v.shape[:-1] + (-1,))
        def _single(v):
            n = round((math.sqrt(1 + 8 * v.shape[-1]) - 1) / 2)
            jac = jax.jacfwd(lambda u: matrix_to_tril_vec(self(u)))(v)
            return jnp.linalg.slogdet(jac)[1]

        batch_shape = x.shape[:-1]
        if batch_shape:
            fn = _single
            for _ in range(len(batch_shape)):
                fn = jax.vmap(fn)
            return fn(x)
        return _single(x)


class L1BallTransform(Transform):
    """R^K -> the open unit L1 ball."""

    domain = constraints.real_vector
    codomain = constraints.l1_ball

    def __call__(self, x):
        # map to (-1, 1)^K via tanh of cumulative logistic sticks
        # stick-breaking on the absolute values, signs carried by x
        finfo = jnp.finfo(x.dtype)
        s = jax.nn.sigmoid(jnp.abs(x))  # in (1/2, 1)
        t = 2 * s - 1  # in (0, 1)
        remainder = jnp.cumprod(1 - t, axis=-1) / jnp.clip(1 - t, finfo.tiny)
        y = jnp.sign(x) * t * remainder
        return y

    def _inverse(self, y):
        finfo = jnp.finfo(y.dtype)
        abs_y = jnp.abs(y)
        remainder = 1 - jnp.cumsum(abs_y, axis=-1) + abs_y
        t = abs_y / jnp.clip(remainder, finfo.tiny)
        s = (t + 1) / 2
        return jnp.sign(y) * jax.scipy.special.logit(jnp.clip(s, finfo.tiny, 1 - finfo.eps))

    def log_abs_det_jacobian(self, x, y, intermediates=None):
        def _single(v):
            jac = jax.jacfwd(self)(v)
            return jnp.linalg.slogdet(jac)[1]

        batch_shape = x.shape[:-1]
        fn = _single
        for _ in range(len(batch_shape)):
            fn = jax.vmap(fn)
        return fn(x)


class PermuteTransform(Transform):
    pytree_data_fields = ("permutation",)
    domain = constraints.real_vector
    codomain = constraints.real_vector

    def __init__(self, permutation):
        self.permutation = permutation

    def __call__(self, x):
        return x[..., self.permutation]

    def _inverse(self, y):
        size = self.permutation.size
        permutation_inv = (
            jnp.zeros(size, dtype=jnp.result_type(int))
            .at[self.permutation]
            .set(jnp.arange(size))
        )
        return y[..., permutation_inv]

    def log_abs_det_jacobian(self, x, y, intermediates=None):
        return jnp.zeros(jnp.shape(x)[:-1], dtype=x.dtype)

    def __eq__(self, other):
        if type(other) is not PermuteTransform:
            return False
        import numpy as np

        return np.array_equal(self.permutation, other.permutation)


class ReshapeTransform(Transform):
    pytree_aux_fields = ("_forward_shape", "_inverse_shape")
    def __init__(self, forward_shape, inverse_shape):
        forward_size = math.prod(forward_shape)
        inverse_size = math.prod(inverse_shape)
        if forward_size != inverse_size:
            raise ValueError("shape sizes must match")
        self._forward_shape = tuple(forward_shape)
        self._inverse_shape = tuple(inverse_shape)

    @property
    def domain(self):
        return constraints.independent(constraints.real, len(self._inverse_shape))

    @property
    def codomain(self):
        return constraints.independent(constraints.real, len(self._forward_shape))

    def forward_shape(self, shape):
        batch_ndim = len(shape) - len(self._inverse_shape)
        if batch_ndim < 0 or shape[batch_ndim:] != self._inverse_shape:
            raise ValueError(f"cannot reshape {shape}")
        return shape[:batch_ndim] + self._forward_shape

    def inverse_shape(self, shape):
        batch_ndim = len(shape) - len(self._forward_shape)
        if batch_ndim < 0 or shape[batch_ndim:] != self._forward_shape:
            raise ValueError(f"cannot reshape {shape}")
        return shape[:batch_ndim] + self._inverse_shape

    def __call__(self, x):
        return jnp.reshape(x, self.forward_shape(jnp.shape(x)))

    def _inverse(self, y):
        return jnp.reshape(y, self.inverse_shape(jnp.shape(y)))

    def log_abs_det_jacobian(self, x, y, intermediates=None):
        batch_ndim = jnp.ndim(x) - len(self._inverse_shape)
        return jnp.zeros(jnp.shape(x)[:batch_ndim], dtype=x.dtype)

    def __eq__(self, other):
        return (
            type(self) is type(other)
            and self._forward_shape == other._forward_shape
            and self._inverse_shape == other._inverse_shape
        )


class LowerCholeskyAffine(Transform):
    pytree_data_fields = ("loc", "scale_tril")
    """y = loc + L @ x with L lower-triangular (MVN whitening transform)."""

    domain = constraints.real_vector
    codomain = constraints.real_vector

    def __init__(self, loc, scale_tril):
        if jnp.ndim(scale_tril) != 2:
            raise ValueError("scale_tril must be a 2D matrix")
        self.loc = loc
        self.scale_tril = scale_tril

    def __call__(self, x):
        return self.loc + jnp.squeeze(
            jnp.matmul(self.scale_tril, x[..., jnp.newaxis]), axis=-1
        )

    def _inverse(self, y):
        y = y - self.loc
        original_shape = jnp.shape(y)
        yt = jnp.reshape(y, (-1, original_shape[-1])).T
        xt = jax.scipy.linalg.solve_triangular(self.scale_tril, yt, lower=True)
        return jnp.reshape(xt.T, original_shape)

    def log_abs_det_jacobian(self, x, y, intermediates=None):
        return jnp.broadcast_to(
            jnp.log(jnp.diagonal(self.scale_tril, axis1=-2, axis2=-1)).sum(-1),
            jnp.shape(x)[:-1],
        )

    def forward_shape(self, shape):
        if len(shape) < 1:
            raise ValueError("Too few dimensions on input")
        return lax.broadcast_shapes(
            shape, jnp.shape(self.loc), jnp.shape(self.scale_tril)[:-1]
        )

    inverse_shape = forward_shape

    def __eq__(self, other):
        if type(other) is not LowerCholeskyAffine:
            return False
        import numpy as np

        return np.array_equal(self.loc, other.loc) and np.array_equal(
            self.scale_tril, other.scale_tril
        )


class ZeroSumTransform(Transform):
    pytree_aux_fields = ("transform_ndims",)
    """R^{n-1} per axis -> zero-sum vectors via the Householder-style map
    used for ZeroSumNormal."""

    def __init__(self, transform_ndims=1):
        self.transform_ndims = transform_ndims

    @property
    def domain(self):
        return constraints.independent(constraints.real, self.transform_ndims)

    @property
    def codomain(self):
        return constraints.zero_sum(self.transform_ndims)

    def _extend_axis(self, x, axis):
        n = x.shape[axis] + 1
        sum_vals = x.sum(axis, keepdims=True)
        norm = sum_vals / (math.sqrt(n) + n)
        fill_val = norm - sum_vals / math.sqrt(n)
        return jnp.concatenate([x, fill_val], axis=axis) - norm

    def _extend_axis_rev(self, x, axis):
        n = x.shape[axis]
        last = jnp.take(x, jnp.array([n - 1]), axis=axis)
        sum_vals = -last * math.sqrt(n)
        norm = sum_vals / (math.sqrt(n) + n)
        slice_before = jnp.take(x, jnp.arange(n - 1), axis=axis)
        return slice_before + norm

    def __call__(self, x):
        for axis in range(-self.transform_ndims, 0):
            x = self._extend_axis(x, axis)
        return x

    def _inverse(self, y):
        for axis in range(-self.transform_ndims, 0):
            y = self._extend_axis_rev(y, axis)
        return y

    def log_abs_det_jacobian(self, x, y, intermediates=None):
        return jnp.zeros(x.shape[: x.ndim - self.transform_ndims], dtype=x.dtype)

    def forward_shape(self, shape):
        return shape[: -self.transform_ndims] + tuple(
            s + 1 for s in shape[-self.transform_ndims :]
        )

    def inverse_shape(self, shape):
        return shape[: -self.transform_ndims] + tuple(
            s - 1 for s in shape[-self.transform_ndims :]
        )

    def __eq__(self, other):
        return (
            type(self) is type(other) and self.transform_ndims == other.transform_ndims
        )


# ---------------------------------------------------------------------------
# biject_to registry: constraint -> transform onto that constraint
# ---------------------------------------------------------------------------


class ConstraintRegistry:
    def __init__(self):
        self._registry = {}

    def register(self, constraint, factory=None):
        if factory is None:
            return lambda factory: self.register(constraint, factory)
        if isinstance(constraint, constraints.Constraint):
            constraint = type(constraint)
        self._registry[constraint] = factory
        return factory

    def __call__(self, constraint):
        try:
            factory = self._registry[type(constraint)]
        except KeyError as e:
            raise NotImplementedError(
                f"Cannot transform {type(constraint).__name__} constraint"
            ) from e
        return factory(constraint)


biject_to = ConstraintRegistry()


@biject_to.register(constraints.real)
def _transform_to_real(constraint):
    return IdentityTransform()


@biject_to.register(constraints.independent)
def _transform_to_independent(constraint):
    return IndependentTransform(
        biject_to(constraint.base_constraint), constraint.reinterpreted_batch_ndims
    )


@biject_to.register(constraints.positive)
@biject_to.register(constraints.nonnegative)
def _transform_to_positive(constraint):
    return ExpTransform()


@biject_to.register(constraints.softplus_positive)
def _transform_to_softplus_positive(constraint):
    return SoftplusTransform()


@biject_to.register(constraints.greater_than)
@biject_to.register(constraints.greater_than_eq)
def _transform_to_greater_than(constraint):
    return ComposeTransform(
        [ExpTransform(), AffineTransform(constraint.lower_bound, 1.0, domain=constraints.positive)]
    )


@biject_to.register(constraints.less_than)
@biject_to.register(constraints.less_than_eq)
def _transform_to_less_than(constraint):
    return ComposeTransform(
        [ExpTransform(), AffineTransform(constraint.upper_bound, -1.0, domain=constraints.positive)]
    )


@biject_to.register(constraints.unit_interval)
def _transform_to_unit_interval(constraint):
    return SigmoidTransform()


@biject_to.register(constraints.interval)
@biject_to.register(constraints.open_interval)
def _transform_to_interval(constraint):
    scale = constraint.upper_bound - constraint.lower_bound
    return ComposeTransform(
        [
            SigmoidTransform(),
            AffineTransform(
                constraint.lower_bound, scale, domain=constraints.unit_interval
            ),
        ]
    )


@biject_to.register(constraints.circular)
def _transform_to_circular(constraint):
    return ComposeTransform(
        [
            SigmoidTransform(),
            AffineTransform(-math.pi, 2 * math.pi, domain=constraints.unit_interval),
        ]
    )


@biject_to.register(constraints.simplex)
def _transform_to_simplex(constraint):
    return StickBreakingTransform()


@biject_to.register(constraints.ordered_vector)
def _transform_to_ordered(constraint):
    return OrderedTransform()


@biject_to.register(constraints.positive_ordered_vector)
def _transform_to_positive_ordered(constraint):
    return ComposeTransform([OrderedTransform(), ExpTransform()])


@biject_to.register(constraints.corr_cholesky)
def _transform_to_corr_cholesky(constraint):
    return CorrCholeskyTransform()


@biject_to.register(constraints.corr_matrix)
def _transform_to_corr_matrix(constraint):
    return ComposeTransform(
        [CorrCholeskyTransform(), CorrMatrixCholeskyTransform().inv]
    )


@biject_to.register(constraints.lower_cholesky)
def _transform_to_lower_cholesky(constraint):
    return LowerCholeskyTransform()


@biject_to.register(constraints.scaled_unit_lower_cholesky)
def _transform_to_scaled_unit_lower_cholesky(constraint):
    return ScaledUnitLowerCholeskyTransform()


@biject_to.register(constraints.softplus_lower_cholesky)
def _transform_to_softplus_lower_cholesky(constraint):
    return SoftplusLowerCholeskyTransform()


@biject_to.register(constraints.positive_definite)
@biject_to.register(constraints.positive_semidefinite)
def _transform_to_positive_definite(constraint):
    return ComposeTransform([LowerCholeskyTransform(), CholeskyTransform().inv])


@biject_to.register(constraints.l1_ball)
def _transform_to_l1_ball(constraint):
    return L1BallTransform()


@biject_to.register(constraints.zero_sum)
def _transform_to_zero_sum(constraint):
    return ZeroSumTransform(constraint.event_dim)


class ComplexTransform(Transform):
    """Pair of reals <-> complex number
    (reference: numpyro/distributions/transforms.py:1594)."""

    domain = constraints.real_vector
    codomain = constraints.complex

    def __call__(self, x):
        assert x.shape[-1] == 2, "Input must have a trailing dimension of size 2."
        return jax.lax.complex(x[..., 0], x[..., 1])

    def _inverse(self, y):
        return jnp.stack([y.real, y.imag], axis=-1)

    def log_abs_det_jacobian(self, x, y, intermediates=None):
        return jnp.zeros_like(y, dtype=jnp.result_type(float))

    def forward_shape(self, shape):
        assert shape[-1] == 2, "Input must have a trailing dimension of size 2."
        return shape[:-1]

    def inverse_shape(self, shape):
        return shape + (2,)


def _normalize_rfft_shape(shape, transform_shape):
    if transform_shape is None:
        return shape
    return shape[: len(shape) - len(transform_shape)] + tuple(transform_shape)


class RealFastFourierTransform(Transform):
    pytree_aux_fields = ("transform_shape", "transform_ndims")
    """N-dimensional real FFT over the trailing ``transform_ndims`` axes
    (reference: numpyro/distributions/transforms.py:1269)."""

    def __init__(self, transform_shape=None, transform_ndims=1):
        if isinstance(transform_shape, int):
            transform_shape = (transform_shape,)
        if transform_shape is not None and len(transform_shape) != transform_ndims:
            raise ValueError(
                f"Length of transform shape ({transform_shape}) does not match "
                f"number of dimensions to transform ({transform_ndims})."
            )
        self.transform_shape = transform_shape
        self.transform_ndims = transform_ndims

    def __call__(self, x):
        axes = tuple(range(-self.transform_ndims, 0))
        return jnp.fft.rfftn(x, self.transform_shape, axes)

    def _inverse(self, y):
        axes = tuple(range(-self.transform_ndims, 0))
        return jnp.fft.irfftn(y, self.transform_shape, axes)

    def forward_shape(self, shape):
        shape = _normalize_rfft_shape(shape, self.transform_shape)
        return shape[:-1] + (shape[-1] // 2 + 1,)

    def inverse_shape(self, shape):
        if self.transform_shape:
            return _normalize_rfft_shape(shape, self.transform_shape)
        size = 2 * (shape[-1] - 1)
        return shape[:-1] + (size,)

    def log_abs_det_jacobian(self, x, y, intermediates=None):
        batch_shape = jnp.broadcast_shapes(
            x.shape[: x.ndim - self.transform_ndims],
            y.shape[: y.ndim - self.transform_ndims],
        )
        event_shape = x.shape[x.ndim - self.transform_ndims :]
        size = math.prod(event_shape)
        q = math.prod(2 - s % 2 for s in event_shape)
        return jnp.broadcast_to(
            (size * jnp.log(size) - jnp.log(2) * (size - q)) / 2, batch_shape
        )

    @property
    def domain(self):
        return constraints.independent(constraints.real, self.transform_ndims)

    @property
    def codomain(self):
        return constraints.independent(constraints.complex, self.transform_ndims)

    def __eq__(self, other):
        return (
            isinstance(other, RealFastFourierTransform)
            and self.transform_ndims == other.transform_ndims
            and self.transform_shape == other.transform_shape
        )


class PackRealFastFourierCoefficientsTransform(Transform):
    pytree_aux_fields = ("shape",)
    """Real vector <-> packed complex rFFT coefficient vector
    (reference: numpyro/distributions/transforms.py:1348)."""

    domain = constraints.real_vector
    codomain = constraints.independent(constraints.complex, 1)

    def __init__(self, transform_shape=None):
        assert transform_shape is None or len(transform_shape) == 1, (
            "Packing Fourier coefficients is only implemented for vectors."
        )
        self.shape = transform_shape

    def forward_shape(self, shape):
        *batch_shape, n = shape
        n_rfft = n // 2 + 1
        return (*batch_shape, n_rfft)

    def inverse_shape(self, shape):
        *batch_shape, n_rfft = shape
        assert self.shape is not None, (
            "Shape must be specified in `__init__` for inverse transform."
        )
        (n,) = self.shape
        assert n_rfft == n // 2 + 1
        return (*batch_shape, n)

    def log_abs_det_jacobian(self, x, y, intermediates=None):
        shape = jnp.broadcast_shapes(x.shape[:-1], y.shape[:-1])
        return jnp.zeros(shape, dtype=jnp.result_type(float))

    def __call__(self, x):
        assert self.shape is None or self.shape == x.shape[-1:]
        n = x.shape[-1]
        n_real = n // 2 + 1
        n_imag = n - n_real
        complex_dtype = jnp.result_type(x.dtype, jnp.complex64)
        return (
            x[..., :n_real]
            .astype(complex_dtype)
            .at[..., 1 : 1 + n_imag]
            .add(1j * x[..., n_real:])
        )

    def _inverse(self, y):
        (n,) = self.shape
        n_real = n // 2 + 1
        n_imag = n - n_real
        return jnp.concatenate([y.real, y.imag[..., 1 : n_imag + 1]], axis=-1)

    def __eq__(self, other):
        return (
            isinstance(other, PackRealFastFourierCoefficientsTransform)
            and self.shape == other.shape
        )


class RecursiveLinearTransform(Transform):
    pytree_data_fields = ("transition_matrix",)
    """y_t = A y_{t-1} + x_t over the second-to-last axis (volume preserving;
    the scan is the only sequential axis — reference:
    numpyro/distributions/transforms.py:1416)."""

    domain = constraints.real_matrix
    codomain = constraints.real_matrix

    def __init__(self, transition_matrix):
        self.transition_matrix = transition_matrix

    def __call__(self, x):
        x = jnp.moveaxis(x, -2, 0)

        def f(y, x_t):
            y = jnp.einsum("...ij,...j->...i", self.transition_matrix, y) + x_t
            return y, y

        _, y = jax.lax.scan(f, jnp.zeros_like(x, shape=x.shape[1:]), x)
        return jnp.moveaxis(y, 0, -2)

    def _inverse(self, y):
        y = jnp.moveaxis(y, -2, 0)

        def f(y_t, prev):
            x = y_t - jnp.einsum("...ij,...j->...i", self.transition_matrix, prev)
            return prev, x

        _, x = jax.lax.scan(
            f, y[-1], jnp.roll(y, 1, axis=0).at[0].set(0), reverse=True
        )
        return jnp.moveaxis(x, 0, -2)

    def log_abs_det_jacobian(self, x, y, intermediates=None):
        return jnp.zeros(x.shape[:-2], dtype=jnp.result_type(float))

    def __eq__(self, other):
        return isinstance(other, RecursiveLinearTransform) and jnp.array_equal(
            self.transition_matrix, other.transition_matrix
        )
