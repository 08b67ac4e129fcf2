"""Normalizing-flow transforms: IAF and BNAF
(reference: numpyro/distributions/flows.py).  Both wrap stax-style nets; the
forward pass is fused dense math on the MXU, and intermediates carry the
log-Jacobian so log_prob avoids re-running the network."""

from jax import lax
import jax.numpy as jnp

from numpyro_tpu.distributions.constraints import real_vector
from numpyro_tpu.distributions.transforms import Transform
from numpyro_tpu.util import fori_loop

__all__ = ["InverseAutoregressiveTransform", "BlockNeuralAutoregressiveTransform"]


def _clamp_preserve_gradients(x, min, max):
    return x + lax.stop_gradient(jnp.clip(x, min, max) - x)


class InverseAutoregressiveTransform(Transform):
    """Inverse Autoregressive Flow (Kingma et al., arXiv:1606.04934, Eq 10):
    ``y = mu(x) + sigma(x) * x`` with a MADE conditioner."""

    domain = real_vector
    codomain = real_vector
    pytree_aux_fields = ("arn", "log_scale_min_clip", "log_scale_max_clip")

    def __init__(self, autoregressive_nn, log_scale_min_clip=-5.0, log_scale_max_clip=3.0):
        self.arn = autoregressive_nn
        self.log_scale_min_clip = log_scale_min_clip
        self.log_scale_max_clip = log_scale_max_clip

    def __call__(self, x):
        return self.call_with_intermediates(x)[0]

    def call_with_intermediates(self, x):
        mean, log_scale = self.arn(x)
        log_scale = _clamp_preserve_gradients(
            log_scale, self.log_scale_min_clip, self.log_scale_max_clip
        )
        return jnp.exp(log_scale) * x + mean, log_scale

    def _inverse(self, y):
        # the inverse is sequential by construction: one pass per coordinate
        def _update_x(i, x):
            mean, log_scale = self.arn(x)
            inverse_scale = jnp.exp(
                -_clamp_preserve_gradients(
                    log_scale,
                    min=self.log_scale_min_clip,
                    max=self.log_scale_max_clip,
                )
            )
            return (y - mean) * inverse_scale

        return fori_loop(0, y.shape[-1], _update_x, jnp.zeros(y.shape))

    def log_abs_det_jacobian(self, x, y, intermediates=None):
        if intermediates is None:
            log_scale = self.arn(x)[1]
            log_scale = _clamp_preserve_gradients(
                log_scale, self.log_scale_min_clip, self.log_scale_max_clip
            )
            return log_scale.sum(-1)
        return intermediates.sum(-1)

    def __eq__(self, other):
        return (
            isinstance(other, InverseAutoregressiveTransform)
            and self.arn is other.arn
            and self.log_scale_min_clip == other.log_scale_min_clip
            and self.log_scale_max_clip == other.log_scale_max_clip
        )


class BlockNeuralAutoregressiveTransform(Transform):
    """Block Neural Autoregressive Flow (De Cao, Titov & Aziz).  No analytic
    inverse — use for guides, not likelihoods."""

    domain = real_vector
    codomain = real_vector
    pytree_aux_fields = ("bn_arn",)

    def __init__(self, bn_arn):
        self.bn_arn = bn_arn

    def __call__(self, x):
        return self.call_with_intermediates(x)[0]

    def call_with_intermediates(self, x):
        y, logdet = self.bn_arn(x)
        return y, logdet

    def _inverse(self, y):
        raise NotImplementedError(
            "BlockNeuralAutoregressiveTransform has no analytic inverse."
        )

    def log_abs_det_jacobian(self, x, y, intermediates=None):
        if intermediates is None:
            return self.bn_arn(x)[1].sum(-1)
        return intermediates.sum(-1)

    def __eq__(self, other):
        return (
            isinstance(other, BlockNeuralAutoregressiveTransform)
            and self.bn_arn is other.bn_arn
        )
