"""Sample-Adaptive MCMC — gradient-free kernel with an adaptive Gaussian
proposal fit to a pool of live points.

Reference surface: numpyro/infer/sa.py:252-405 (Zhu, "Sample Adaptive MCMC").
The per-step work is a rank-one Cholesky update batch over the pool — dense
linear algebra that maps straight onto the MXU; vectorized chains vmap the
whole kernel (pool becomes ``(chains, N, D)``).
"""

from __future__ import annotations

from collections import namedtuple

import jax.numpy as jnp
from jax import lax, random, vmap
from jax.flatten_util import ravel_pytree
from jax.scipy.special import logsumexp

import numpyro_tpu.distributions as dist
from numpyro_tpu.distributions.util import cholesky_update
from numpyro_tpu.infer.initialization import init_to_uniform
from numpyro_tpu.infer.mcmc import MCMCKernel
from numpyro_tpu.infer.util import initialize_model
from numpyro_tpu.util import identity, is_prng_key

SAAdaptState = namedtuple("SAAdaptState", ["zs", "pes", "loc", "inv_mass_matrix_sqrt"])
SAState = namedtuple(
    "SAState",
    [
        "i",
        "z",
        "potential_energy",
        "accept_prob",
        "mean_accept_prob",
        "diverging",
        "adapt_state",
        "rng_key",
    ],
)


def _leave_one_out_proposals(samples, loc, scale, new_sample):
    """loc/scale of the proposal with each pool point swapped for the new
    sample (Algorithm 1 line 5; numerically via rank-one Cholesky updates)."""
    weight = 1 / samples.shape[0]
    if scale.ndim > loc.ndim:  # dense
        new_scale = cholesky_update(scale, new_sample - loc, weight)
        proposal_scale = cholesky_update(new_scale, samples - loc, -weight)
        proposal_scale = cholesky_update(
            proposal_scale, new_sample - samples, -(weight**2)
        )
    else:
        var = jnp.square(scale) + weight * jnp.square(new_sample - loc)
        proposal_var = var - weight * jnp.square(samples - loc)
        proposal_var = proposal_var - weight**2 * jnp.square(new_sample - samples)
        proposal_scale = jnp.sqrt(proposal_var)
    proposal_loc = loc + weight * (new_sample - samples)
    return proposal_loc, proposal_scale


def _sample_proposal(inv_mass_matrix_sqrt, rng_key, batch_shape=()):
    eps = random.normal(rng_key, batch_shape + jnp.shape(inv_mass_matrix_sqrt)[:1])
    if inv_mass_matrix_sqrt.ndim == 1:
        return inv_mass_matrix_sqrt * eps
    elif inv_mass_matrix_sqrt.ndim == 2:
        return jnp.matmul(inv_mass_matrix_sqrt, eps[..., None])[..., 0]
    raise ValueError("Mass matrix has incorrect number of dims.")


def _delete_index(x, idx):
    """x with row ``idx`` removed (shape-static; select via mask)."""
    mask = jnp.arange(x.shape[0] - 1) < idx
    return jnp.where(mask.reshape((-1,) + (1,) * (x.ndim - 1)), x[:-1], x[1:])


class SA(MCMCKernel):
    """Sample Adaptive MCMC: keeps ``adapt_state_size`` live points, proposes
    from a Gaussian fit to them, and swaps one point per step with a
    Rao-Blackwellized rejection rule.  Gradient-free — the choice when the
    potential is non-differentiable or gradients are expensive."""

    def __init__(
        self,
        model=None,
        potential_fn=None,
        adapt_state_size=None,
        dense_mass=True,
        init_strategy=init_to_uniform,
    ):
        if not (model is None) ^ (potential_fn is None):
            raise ValueError("Only one of `model` or `potential_fn` must be specified.")
        self._model = model
        self._potential_fn = potential_fn
        self._adapt_state_size = adapt_state_size
        self._dense_mass = dense_mass
        self._init_strategy = init_strategy
        self._postprocess_fn = None
        self._potential_fn_gen = None
        self._num_warmup = None
        self._max_delta_energy = 1000.0

    @property
    def model(self):
        return self._model

    @property
    def sample_field(self):
        return "z"

    @property
    def default_fields(self):
        return ("z", "diverging")

    def get_diagnostics_str(self, state):
        return "acc. prob={:.2f}".format(state.mean_accept_prob)

    def _init_state(self, rng_key, model_args, model_kwargs, init_params):
        if self._model is not None:
            (
                params_info,
                potential_fn_gen,
                self._postprocess_fn,
                _,
            ) = initialize_model(
                rng_key,
                self._model,
                dynamic_args=True,
                init_strategy=self._init_strategy,
                model_args=model_args,
                model_kwargs=model_kwargs,
            )
            if init_params is None:
                init_params = params_info[0]
            self._potential_fn_gen = potential_fn_gen
            model_kwargs = {} if model_kwargs is None else model_kwargs
            self._potential_fn = potential_fn_gen(*model_args, **model_kwargs)
        return init_params

    def _single_init(self, init_params, rng_key):
        pe_fn = self._potential_fn
        rng_key_sa, rng_key_zs, rng_key_z = random.split(rng_key, 3)
        z_flat, unravel_fn = ravel_pytree(init_params)
        self._unravel_fn = unravel_fn
        dim = z_flat.shape[-1]
        inverse_mass_matrix = (
            jnp.identity(dim) if self._dense_mass else jnp.ones(dim)
        )
        inv_mass_matrix_sqrt = (
            jnp.linalg.cholesky(inverse_mass_matrix)
            if self._dense_mass
            else jnp.sqrt(inverse_mass_matrix)
        )
        adapt_state_size = self._adapt_state_size
        if adapt_state_size is None:
            adapt_state_size = 2 * dim
        assert adapt_state_size > 1, "adapt_state_size should be greater than 1."

        zs = z_flat + _sample_proposal(
            inv_mass_matrix_sqrt, rng_key_zs, (adapt_state_size,)
        )
        pes = lax.map(lambda z: pe_fn(unravel_fn(z)), zs)
        if self._dense_mass:
            cov = jnp.cov(zs, rowvar=False, bias=True)
            if cov.shape == ():
                cov = cov.reshape((1, 1))
            cholesky = jnp.linalg.cholesky(cov)
            inv_mass_matrix_sqrt = jnp.where(
                jnp.any(jnp.isnan(cholesky)), inv_mass_matrix_sqrt, cholesky
            )
        else:
            inv_mass_matrix_sqrt = jnp.std(zs, 0)
        adapt_state = SAAdaptState(zs, pes, jnp.mean(zs, 0), inv_mass_matrix_sqrt)
        k = random.categorical(rng_key_z, jnp.zeros(zs.shape[0]))
        return SAState(
            jnp.array(0),
            unravel_fn(zs[k]),
            pes[k],
            jnp.zeros(()),
            jnp.zeros(()),
            jnp.array(False),
            adapt_state,
            rng_key_sa,
        )

    def init(self, rng_key, num_warmup, init_params=None, model_args=(), model_kwargs={}):
        self._num_warmup = num_warmup
        vectorized = not is_prng_key(rng_key)
        if vectorized:
            rng_key, rng_key_init_model = jnp.swapaxes(
                vmap(random.split)(rng_key), 0, 1
            )
        else:
            rng_key, rng_key_init_model = random.split(rng_key)
        init_params = self._init_state(
            rng_key_init_model, model_args, model_kwargs, init_params
        )
        if self._potential_fn and init_params is None:
            raise ValueError(
                "Valid value of `init_params` must be provided with `potential_fn`."
            )
        self._sample_fn = self._sample_one
        if vectorized:
            init_state = vmap(self._single_init)(init_params, rng_key)
            self._sample_fn = vmap(self._sample_one, in_axes=(0, None, None))
        else:
            init_state = self._single_init(init_params, rng_key)
        return init_state

    def postprocess_fn(self, args, kwargs):
        if self._postprocess_fn is None:
            return identity
        return self._postprocess_fn(*args, **kwargs)

    def _sample_one(self, sa_state, model_args, model_kwargs):
        pe_fn = self._potential_fn
        if self._potential_fn_gen:
            pe_fn = self._potential_fn_gen(*model_args, **model_kwargs)
        zs, pes, loc, scale = sa_state.adapt_state
        # recompute loc/scale each step to avoid accumulated precision loss
        loc = jnp.mean(zs, 0)
        if scale.ndim == 2:
            cov = jnp.cov(zs, rowvar=False, bias=True)
            if cov.shape == ():
                cov = cov.reshape((1, 1))
            cholesky = jnp.linalg.cholesky(cov)
            scale = jnp.where(jnp.any(jnp.isnan(cholesky)), scale, cholesky)
        else:
            scale = jnp.std(zs, 0)

        rng_key, rng_key_z, rng_key_reject, rng_key_accept = random.split(
            sa_state.rng_key, 4
        )
        _, unravel_fn = ravel_pytree(sa_state.z)

        z = loc + _sample_proposal(scale, rng_key_z)
        pe = pe_fn(unravel_fn(z))
        pe = jnp.where(jnp.isnan(pe), jnp.inf, pe)
        diverging = (pe - sa_state.potential_energy) > self._max_delta_energy

        locs, scales = _leave_one_out_proposals(zs, loc, scale, z)
        zs_ = jnp.concatenate([zs, z[None, :]])
        pes_ = jnp.concatenate([pes, pe[None]])
        locs_ = jnp.concatenate([locs, loc[None, :]])
        scales_ = jnp.concatenate([scales, scale[None, ...]])
        if scale.ndim == 2:
            log_weights_ = (
                dist.MultivariateNormal(locs_, scale_tril=scales_).log_prob(zs_)
                + pes_
            )
        else:
            log_weights_ = dist.Normal(locs_, scales_).log_prob(zs_).sum(-1) + pes_
        log_weights_ = jnp.where(jnp.isfinite(log_weights_), log_weights_, -jnp.inf)
        j = random.categorical(rng_key_reject, log_weights_)
        zs = _delete_index(zs_, j)
        pes = _delete_index(pes_, j)
        adapt_state = SAAdaptState(zs, pes, locs_[j], scales_[j])

        accept_prob = 1 - jnp.exp(log_weights_[-1] - logsumexp(log_weights_))
        itr = sa_state.i + 1
        n = jnp.where(sa_state.i < self._num_warmup, itr, itr - self._num_warmup)
        mean_accept_prob = (
            sa_state.mean_accept_prob
            + (accept_prob - sa_state.mean_accept_prob) / n
        )
        k = random.categorical(rng_key_accept, jnp.zeros(zs.shape[0]))
        return SAState(
            itr,
            unravel_fn(zs[k]),
            pes[k],
            accept_prob,
            mean_accept_prob,
            diverging,
            adapt_state,
            rng_key,
        )

    def sample(self, state, model_args, model_kwargs):
        return self._sample_fn(state, model_args, model_kwargs)

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_sample_fn"] = None
        state["_potential_fn_gen"] = None
        return state
