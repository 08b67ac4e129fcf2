"""Barker-proposal MH kernel, panel-batched (role parity:
numpyro/infer/barker.py, after Livingstone & Zanella, "The Barker proposal:
combining robustness and efficiency in gradient-based MCMC").

Redesign notes:

- **Shared chain-batched warmup.**  Step-size dual averaging and Welford
  mass adaptation come from :mod:`numpyro_tpu.infer.hmc_core` — the same
  ``(C,)``-panel machinery the NUTS engine uses, including structured mass
  blocks and optional cross-chain pooling, instead of a per-chain adapter
  under ``vmap``.
- **One batched gradient per step.**  Positions live in a ``(C, D)`` panel
  and the potential is evaluated once per transition for all chains; the
  coordinatewise skew, the flip draws, and the accept test are plain panel
  arithmetic.
- **Whitened skew.**  The preconditioner is the engine's ``sqrt_inv``
  factor (``T^T T = Σ̂``): gradients are whitened with ``T`` and the jump
  is colored back with ``T^T``, so adaptation plugs in with no extra
  factorization work.
"""

from __future__ import annotations

from collections import namedtuple

import jax
import jax.numpy as jnp
from jax import lax, random, vmap
from jax.nn import softplus
from jax.scipy.special import expit

from numpyro_tpu.infer import hmc_core as core
from numpyro_tpu.infer.initialization import init_to_uniform
from numpyro_tpu.infer.mcmc import MCMCKernel
from numpyro_tpu.infer.util import initialize_model
from numpyro_tpu.util import identity, is_prng_key

BarkerMHState = namedtuple(
    "BarkerMHState",
    [
        "i",
        "z",
        "potential_energy",
        "z_grad",
        "accept_prob",
        "mean_accept_prob",
        "adapt_state",
        "rng_key",
    ],
)


def _whiten(blocks, sqrt_inv, v, transpose=False):
    """Apply the block preconditioner ``T`` (or ``T^T``) to a (C, D) panel."""
    parts = core._as_parts(blocks, sqrt_inv)
    if blocks.full:
        m = parts[0]
        if m.ndim == 2:  # diagonal block: T is symmetric
            return m * v
        m = jnp.swapaxes(m, -2, -1) if transpose else m
        return jnp.einsum("cij,cj->ci", m, v)
    out = jnp.zeros_like(v)
    for idx, m in zip(blocks.indices, parts):
        vb = jnp.take(v, idx, axis=-1)
        if m.ndim == 2:
            wb = m * vb
        else:
            mm = jnp.swapaxes(m, -2, -1) if transpose else m
            wb = jnp.einsum("cij,cj->ci", mm, vb)
        out = out.at[:, idx].set(wb)
    return out


def barker_panel_transition(state, pe_grad, blocks, wa_update, num_warmup):
    """Advance every chain by one Barker step.  ``state.z`` is a (C, D)
    panel; ``pe_grad`` maps panels to ``(pe, grad)``."""
    x, pe_x, grad_x = state.z, state.potential_energy, state.z_grad
    num_chains, d = x.shape
    adapt = state.adapt_state
    keys = core.split_keys(state.rng_key, 4)
    key_next, key_mag, key_flip, key_mh = keys

    T = adapt.mass_matrix_sqrt_inv
    gx_w = _whiten(blocks, T, grad_x)

    # magnitude ~ N(0, eps^2) per coordinate; sign skewed toward -grad
    mag = adapt.step_size[:, None] * vmap(
        lambda k: random.normal(k, (d,), x.dtype)
    )(key_mag)
    skew = expit(-mag * gx_w)
    flip = vmap(lambda k: random.uniform(k, (d,)))(key_flip) < skew
    jump = jnp.where(flip, mag, -mag)
    y = x + _whiten(blocks, T, jump, transpose=True)

    pe_y, grad_y = pe_grad(y)
    gy_w = _whiten(blocks, T, grad_y)

    # skew-detailed-balance correction (Livingstone & Zanella eq. 12)
    log_ratio = (
        pe_x
        - pe_y
        + jnp.sum(softplus(jump * gx_w) - softplus(-jump * gy_w), axis=-1)
    )
    # divergence guard: a proposal with non-finite energy/ratio (huge step
    # size during adaptation can overflow the model density) must count as
    # a plain rejection, not poison the dual-averaging state with NaN
    accept_prob = jnp.minimum(jnp.exp(jnp.minimum(log_ratio, 0.0)), 1.0)
    accept_prob = jnp.where(jnp.isfinite(log_ratio), accept_prob, 0.0)
    accept = core.batch_uniform(key_mh) < accept_prob

    take = lambda new, old: jnp.where(
        accept.reshape((-1,) + (1,) * (new.ndim - 1)), new, old
    )
    x_new, pe_new, grad_new = take(y, x), take(pe_y, pe_x), take(grad_y, grad_x)

    adapt = lax.cond(
        state.i < num_warmup,
        lambda a: wa_update(state.i, a, accept_prob, x_new, pe_new, grad_new),
        lambda a: a,
        adapt,
    )

    i_new = state.i + 1
    denom = jnp.where(state.i < num_warmup, i_new, i_new - num_warmup)
    mean_accept = state.mean_accept_prob + (
        accept_prob - state.mean_accept_prob
    ) / denom
    return BarkerMHState(
        i_new, x_new, pe_new, grad_new, accept_prob, mean_accept, adapt, key_next
    )


class BarkerMH(MCMCKernel):
    """Metropolis-Hastings with the skew-symmetric Barker proposal: jumps
    are skewed coordinatewise toward the gradient, giving HMC-like gradient
    exploitation with random-walk robustness to step-size misspecification.

    :param model: model callable (or pass ``potential_fn``).
    :param potential_fn: flat potential; requires explicit ``init_params``.
    :param step_size: initial proposal scale.
    :param adapt_step_size: dual-average the scale toward the accept target.
    :param adapt_mass_matrix: learn a Welford preconditioner during warmup.
    :param dense_mass: full covariance preconditioner (or a list of site
        groups for structured dense blocks).
    :param target_accept_prob: accept-rate target (0.4 is the Barker
        optimum, vs 0.8 for HMC).
    :param init_strategy: site initializer for the model path.
    """

    def __init__(
        self,
        model=None,
        potential_fn=None,
        step_size=1.0,
        adapt_step_size=True,
        adapt_mass_matrix=True,
        dense_mass=False,
        target_accept_prob=0.4,
        init_strategy=init_to_uniform,
    ):
        if not (model is None) ^ (potential_fn is None):
            raise ValueError("Only one of `model` or `potential_fn` must be specified.")
        self._model = model
        self._potential_fn = potential_fn
        self._step_size = step_size
        self._adapt_step_size = adapt_step_size
        self._adapt_mass_matrix = adapt_mass_matrix
        self._dense_mass = dense_mass
        self._target_accept_prob = target_accept_prob
        self._init_strategy = init_strategy
        self._postprocess_fn = None
        self._potential_fn_gen = None
        self._num_warmup = None
        self._layout = None
        self._blocks = None
        self._wa_update = None
        self._batched = None

    @property
    def model(self):
        return self._model

    @property
    def sample_field(self):
        return "z"

    def get_diagnostics_str(self, state):
        return "step size {:.2e}. acc. prob={:.2f}".format(
            state.adapt_state.step_size, state.mean_accept_prob
        )

    def _resolve_model(self, rng_key, model_args, model_kwargs, init_params):
        if self._model is not None:
            info, pf_gen, self._postprocess_fn, _ = initialize_model(
                rng_key,
                self._model,
                dynamic_args=True,
                init_strategy=self._init_strategy,
                model_args=model_args,
                model_kwargs=model_kwargs,
            )
            if init_params is None:
                init_params = info[0]
            self._potential_fn_gen = pf_gen
            self._potential_fn = pf_gen(*model_args, **(model_kwargs or {}))
        elif init_params is None:
            raise ValueError(
                "Valid value of `init_params` must be provided with `potential_fn`."
            )
        return init_params

    def _pe_grad(self, model_args, model_kwargs):
        pe_fn = self._potential_fn
        if self._potential_fn_gen:
            pe_fn = self._potential_fn_gen(*model_args, **(model_kwargs or {}))
        return core.batched_potential(pe_fn, self._layout)

    def init(
        self, rng_key, num_warmup, init_params=None, model_args=(), model_kwargs={}
    ):
        self._num_warmup = num_warmup
        self._batched = not is_prng_key(rng_key)
        if self._batched:
            keys = vmap(random.split)(rng_key)
            # the full per-chain key batch: initialize_model is itself
            # chain-batched and disperses each chain's starting point
            key_model, rng_key = keys[:, 0], keys[:, 1]
        else:
            key_model, rng_key = random.split(rng_key)
            rng_key = rng_key[None]
        init_params = self._resolve_model(
            key_model, model_args, model_kwargs, init_params
        )

        z0 = init_params if self._batched else jax.tree.map(
            lambda x: jnp.asarray(x)[None], init_params
        )
        proto = jax.tree.map(lambda x: x[0], z0)
        self._layout = core.FlatLayout(proto)
        self._blocks = core.build_mass_blocks(self._layout, self._dense_mass)

        pe_grad = self._pe_grad(model_args, model_kwargs)
        panel = self._layout.ravel_batch(z0)
        pe, grad = pe_grad(panel)

        keys_wa = core.split_keys(rng_key, 2)
        wa_init, self._wa_update = core.build_warmup(
            pe_grad,
            self._blocks,
            num_warmup,
            adapt_step_size=self._adapt_step_size,
            adapt_mass_matrix=self._adapt_mass_matrix,
            target_accept_prob=self._target_accept_prob,
            find_step_size=False,
        )
        adapt = wa_init(keys_wa[1], panel, pe, grad, self._step_size)

        num_chains = panel.shape[0]
        state = BarkerMHState(
            jnp.asarray(0),
            self._layout.unravel_batch(panel),
            pe,
            self._layout.unravel_batch(grad),
            jnp.zeros((num_chains,)),
            jnp.zeros((num_chains,)),
            adapt,
            keys_wa[0],
        )
        if not self._batched:
            i = state.i
            state = jax.tree.map(lambda x: x[0] if jnp.ndim(x) else x, state)
            state = state._replace(i=i)
        return state

    def postprocess_fn(self, args, kwargs):
        if self._postprocess_fn is None:
            return identity
        return self._postprocess_fn(*args, **kwargs)

    def sample(self, state, model_args, model_kwargs):
        if not self._batched:
            i = state.i
            state = jax.tree.map(lambda x: jnp.asarray(x)[None], state)
            state = state._replace(i=i)
        state = state._replace(
            z=self._layout.ravel_batch(state.z),
            z_grad=self._layout.ravel_batch(state.z_grad),
        )
        new = barker_panel_transition(
            state,
            self._pe_grad(model_args, model_kwargs),
            self._blocks,
            self._wa_update,
            self._num_warmup,
        )
        new = new._replace(
            z=self._layout.unravel_batch(new.z),
            z_grad=self._layout.unravel_batch(new.z_grad),
        )
        if not self._batched:
            new = jax.tree.map(lambda x: x[0] if jnp.ndim(x) else x, new)
        return new

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_wa_update"] = None
        state["_potential_fn_gen"] = None
        return state
