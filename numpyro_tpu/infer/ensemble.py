"""Ensemble samplers: AIES (affine-invariant, emcee-style) and ESS
(ensemble slice sampling, zeus-style).

Reference surface: numpyro/infer/ensemble.py.  Both kernels update half the
ensemble conditioned on the other half per sub-iteration; the whole ensemble
lives as one ``(num_chains, dim)`` array inside a single XLA program — the
cross-chain information flow is ordinary batched arithmetic, no collectives.
Requires ``chain_method="vectorized"`` and an even ``num_chains``.
"""

from __future__ import annotations

import warnings
from abc import ABC, abstractmethod
from collections import namedtuple

import jax
import jax.numpy as jnp
from jax import random, vmap
from jax.scipy.stats import gaussian_kde

import numpyro_tpu.distributions as dist
from numpyro_tpu.infer.ensemble_util import batch_ravel_pytree, get_nondiagonal_indices
from numpyro_tpu.infer.initialization import init_to_uniform
from numpyro_tpu.infer.mcmc import MCMCKernel
from numpyro_tpu.infer.util import initialize_model
from numpyro_tpu.util import identity, is_prng_key

EnsembleSamplerState = namedtuple(
    "EnsembleSamplerState", ["z", "inner_state", "rng_key"]
)
AIESState = namedtuple("AIESState", ["i", "accept_prob", "mean_accept_prob", "rng_key"])
ESSState = namedtuple(
    "ESSState", ["i", "n_expansions", "n_contractions", "mu", "rng_key"]
)


class EnsembleSampler(MCMCKernel, ABC):
    """Base: each MCMC step = two half-ensemble sub-updates."""

    def __init__(self, model=None, potential_fn=None, *, randomize_split, init_strategy):
        if not (model is None) ^ (potential_fn is None):
            raise ValueError("Only one of `model` or `potential_fn` must be specified.")
        self._model = model
        self._potential_fn = potential_fn
        self._batch_log_density = None
        self._num_chains = None
        self._randomize_split = randomize_split
        self._init_strategy = init_strategy
        self._postprocess_fn = None

    @property
    def model(self):
        return self._model

    @property
    def sample_field(self):
        return "z"

    @property
    def is_ensemble_kernel(self):
        return True

    @abstractmethod
    def init_inner_state(self, rng_key):
        raise NotImplementedError

    @abstractmethod
    def update_active_chains(self, active, inactive, inner_state):
        raise NotImplementedError

    def _init_state(self, rng_key, model_args, model_kwargs, init_params):
        if self._model is not None:
            (
                new_params_info,
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
                validate_grad=False,
            )
            self._potential_fn = potential_fn_gen(
                *model_args, **(model_kwargs or {})
            )
            if init_params is None:
                init_params = new_params_info[0]
        flat_params, unravel_fn = batch_ravel_pytree(init_params)
        self._batch_log_density = lambda z: -vmap(self._potential_fn)(
            unravel_fn(z)
        )
        if self._num_chains < 2 * flat_params.shape[1]:
            warnings.warn(
                "Setting num_chains to at least 2*n_params is strongly "
                f"recommended: num_chains={self._num_chains}, "
                f"n_params={flat_params.shape[1]}",
                stacklevel=2,
            )
        return init_params

    def init(self, rng_key, num_warmup, init_params=None, model_args=(), model_kwargs={}):
        assert not is_prng_key(rng_key), (
            "EnsembleSampler only supports chain_method='vectorized' with "
            "num_chains > 1."
        )
        assert rng_key.shape[0] % 2 == 0, "Number of chains must be even."
        self._num_chains = rng_key.shape[0]
        if init_params is not None:
            assert all(
                param.shape[0] == self._num_chains
                for param in jax.tree.leaves(init_params)
            ), "The batch dimension of each param must match num_chains"

        rng_key, rng_key_inner_state, rng_key_init_model = random.split(
            rng_key[0], 3
        )
        rng_key_init_model = random.split(rng_key_init_model, self._num_chains)
        init_params = self._init_state(
            rng_key_init_model, model_args, model_kwargs, init_params
        )
        if self._potential_fn and init_params is None:
            raise ValueError(
                "Valid value of `init_params` must be provided with `potential_fn`."
            )
        self._num_warmup = num_warmup
        return EnsembleSamplerState(
            init_params, self.init_inner_state(rng_key_inner_state), rng_key
        )

    def postprocess_fn(self, args, kwargs):
        if self._postprocess_fn is None:
            return identity
        return self._postprocess_fn(*args, **kwargs)

    def sample(self, state, model_args, model_kwargs):
        z, inner_state, rng_key = state
        rng_key, _ = random.split(rng_key)
        z_flat, unravel_fn = batch_ravel_pytree(z)
        if self._randomize_split:
            z_flat = random.permutation(rng_key, z_flat, axis=0)
        split_ind = self._num_chains // 2

        def body_fn(i, carry):
            z_flat, inner_state = carry
            active, inactive = jax.lax.cond(
                i == 0,
                lambda x: (x[:split_ind], x[split_ind:]),
                lambda x: (x[split_ind:], x[:split_ind]),
                z_flat,
            )
            z_updates, inner_state = self.update_active_chains(
                active, inactive, inner_state
            )
            z_flat = jax.lax.cond(
                i == 0,
                lambda x: x.at[:split_ind].set(z_updates),
                lambda x: x.at[split_ind:].set(z_updates),
                z_flat,
            )
            return (z_flat, inner_state)

        z_flat, inner_state = jax.lax.fori_loop(0, 2, body_fn, (z_flat, inner_state))
        return EnsembleSamplerState(unravel_fn(z_flat), inner_state, rng_key)

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_batch_log_density"] = None
        return state


class AIES(EnsembleSampler):
    """Affine-invariant ensemble sampler (Goodman & Weare stretch moves and
    differential-evolution moves; emcee's algorithm)."""

    def __init__(
        self,
        model=None,
        potential_fn=None,
        randomize_split=False,
        moves=None,
        init_strategy=init_to_uniform,
    ):
        if not moves:
            self._moves = [AIES.DEMove()]
            self._weights = jnp.array([1.0])
        else:
            self._moves = list(moves.keys())
            self._weights = jnp.array(list(moves.values())) / len(moves)
            assert all(callable(move) for move in self._moves)
            assert jnp.all(self._weights >= 0)
        super().__init__(
            model,
            potential_fn,
            randomize_split=randomize_split,
            init_strategy=init_strategy,
        )

    def get_diagnostics_str(self, state):
        return "acc. prob={:.2f}".format(state.inner_state.mean_accept_prob)

    def init_inner_state(self, rng_key):
        self._moves = [
            move(self._num_chains) if move.__name__ == "make_de_move" else move
            for move in self._moves
        ]
        return AIESState(jnp.array(0.0), jnp.array(0.0), jnp.array(0.0), rng_key)

    def update_active_chains(self, active, inactive, inner_state):
        i, _, mean_accept_prob, rng_key = inner_state
        rng_key, move_key, proposal_key, accept_key = random.split(rng_key, 4)
        move_i = random.choice(move_key, len(self._moves), p=self._weights)
        proposal, factors = jax.lax.switch(
            move_i, self._moves, proposal_key, active, inactive
        )
        log_accept_prob = (
            factors
            + self._batch_log_density(proposal)
            - self._batch_log_density(active)
        )
        accepted = random.uniform(accept_key, (active.shape[0],)) < jnp.exp(
            log_accept_prob
        )
        updated = jnp.where(accepted[:, None], proposal, active)
        accept_prob = jnp.count_nonzero(accepted) / accepted.shape[0]
        itr = i + 0.5
        n = jnp.where(i < self._num_warmup, itr, itr - self._num_warmup)
        mean_accept_prob = mean_accept_prob + (accept_prob - mean_accept_prob) / n
        return updated, AIESState(itr, accept_prob, mean_accept_prob, rng_key)

    @staticmethod
    def DEMove(sigma=1.0e-5, g0=None):
        """Differential-evolution proposal (Nelson et al. 2013)."""

        def make_de_move(n_chains):
            PAIRS = get_nondiagonal_indices(n_chains // 2)

            def de_move(rng_key, active, inactive):
                pairs_key, gamma_key = random.split(rng_key)
                n_active_chains, n_params = inactive.shape
                g = 2.38 / jnp.sqrt(2.0 * n_params) if not g0 else g0
                selected_pairs = random.choice(
                    pairs_key, PAIRS, shape=(n_active_chains,)
                )
                diffs = jnp.diff(inactive[selected_pairs], axis=1).squeeze(axis=1)
                gamma = dist.Normal(g, g * sigma).sample(
                    gamma_key, sample_shape=(n_active_chains, 1)
                )
                proposal = active + gamma * diffs
                return proposal, jnp.zeros(n_active_chains)

            return de_move

        return make_de_move

    @staticmethod
    def StretchMove(a=2.0):
        """Goodman & Weare (2010) stretch move."""

        def stretch_move(rng_key, active, inactive):
            n_active_chains, n_params = active.shape
            unif_key, idx_key = random.split(rng_key)
            zz = (
                (a - 1.0) * random.uniform(unif_key, shape=(n_active_chains,)) + 1
            ) ** 2.0 / a
            factors = (n_params - 1.0) * jnp.log(zz)
            r_idxs = random.randint(
                idx_key, shape=(n_active_chains,), minval=0, maxval=n_active_chains
            )
            proposal = (
                inactive[r_idxs] - (inactive[r_idxs] - active) * zz[:, None]
            )
            return proposal, factors

        return stretch_move


class ESS(EnsembleSampler):
    """Ensemble slice sampling (Karamanis & Beutler; zeus's algorithm)."""

    def __init__(
        self,
        model=None,
        potential_fn=None,
        randomize_split=True,
        moves=None,
        max_steps=10_000,
        max_iter=10_000,
        init_mu=1.0,
        tune_mu=True,
        init_strategy=init_to_uniform,
    ):
        if not moves:
            self._moves = [ESS.DifferentialMove()]
            self._weights = jnp.array([1.0])
        else:
            self._moves = list(moves.keys())
            self._weights = jnp.array(list(moves.values())) / len(moves)
            assert all(callable(move) for move in self._moves)
            assert jnp.all(self._weights >= 0)
            assert init_mu > 0
        self._max_steps = max_steps
        self._max_iter = max_iter
        self._init_mu = init_mu
        self._tune_mu = tune_mu
        super().__init__(
            model,
            potential_fn,
            randomize_split=randomize_split,
            init_strategy=init_strategy,
        )

    def init_inner_state(self, rng_key):
        self.batch_log_density = lambda x: self._batch_log_density(x)[:, None]
        self._moves = [
            move(self._num_chains)
            if move.__name__ == "make_differential_move"
            else move
            for move in self._moves
        ]
        return ESSState(
            jnp.array(0.0), jnp.array(0), jnp.array(0), self._init_mu, rng_key
        )

    def update_active_chains(self, active, inactive, inner_state):
        i, n_expansions, n_contractions, mu, rng_key = inner_state
        (
            rng_key,
            move_key,
            dir_key,
            height_key,
            step_out_key,
            shrink_key,
        ) = random.split(rng_key, 6)
        n_active_chains, n_params = active.shape
        move_i = random.choice(move_key, len(self._moves), p=self._weights)
        directions = jax.lax.switch(move_i, self._moves, dir_key, inactive, mu)

        log_slice_height = self.batch_log_density(active) - dist.Exponential().sample(
            height_key, sample_shape=(n_active_chains, 1)
        )
        curr_n_expansions, L, R = self._step_out(
            step_out_key, log_slice_height, active, directions
        )
        proposal, curr_n_contractions = self._shrink(
            shrink_key, log_slice_height, L, R, active, directions
        )
        n_expansions += curr_n_expansions
        n_contractions += curr_n_contractions
        itr = i + 0.5
        if self._tune_mu:
            safe_n_expansions = jnp.max(jnp.array([1, n_expansions]))
            mu, n_expansions, n_contractions = jax.lax.cond(
                jnp.all(itr % 1 == 0),
                lambda n_exp, n_con: (
                    2.0 * n_exp / (n_exp + n_con),
                    jnp.array(0),
                    jnp.array(0),
                ),
                lambda _, __: (mu, n_expansions, n_contractions),
                safe_n_expansions,
                n_contractions,
            )
        return proposal, ESSState(itr, n_expansions, n_contractions, mu, rng_key)

    @staticmethod
    def RandomMove():
        """Vanilla slice-sampling directions (no chain interaction)."""

        def random_move(rng_key, inactive, mu):
            directions = dist.Normal(0.0, 1.0).sample(
                rng_key, sample_shape=inactive.shape
            )
            directions /= jnp.linalg.norm(directions, axis=0)
            return 2.0 * mu * directions

        return random_move

    @staticmethod
    def KDEMove(bw_method=None):
        """Directions from a KDE of the complementary ensemble."""

        def kde_move(rng_key, inactive, mu):
            n_active_chains, n_params = inactive.shape
            kde = gaussian_kde(inactive.T, bw_method=bw_method)
            vectors = kde.resample(rng_key, (2 * n_active_chains,)).T
            directions = vectors[:n_active_chains] - vectors[n_active_chains:]
            return 2.0 * mu * directions

        return kde_move

    @staticmethod
    def GaussianMove():
        """Directions from a Gaussian fit to the complementary ensemble."""

        def gaussian_move(rng_key, inactive, mu):
            n_active_chains, n_params = inactive.shape
            cov = jnp.cov(inactive, rowvar=False)
            return (
                2.0
                * mu
                * dist.MultivariateNormal(0, cov).sample(
                    rng_key, sample_shape=(n_active_chains,)
                )
            )

        return gaussian_move

    @staticmethod
    def DifferentialMove():
        """Directions from random walker pairs (default; robust)."""

        def make_differential_move(n_chains):
            PAIRS = get_nondiagonal_indices(n_chains // 2)

            def differential_move(rng_key, inactive, mu):
                n_active_chains, n_params = inactive.shape
                selected_pairs = random.choice(
                    rng_key, PAIRS, shape=(n_active_chains,)
                )
                diffs = jnp.diff(inactive[selected_pairs], axis=1).squeeze(axis=1)
                return 2.0 * mu * diffs

            return differential_move

        return make_differential_move

    def _step_out(self, rng_key, log_slice_height, active, directions):
        """Expand the slice bracket [L, R] until both ends fall below the
        slice height — one batched while_loop over all active walkers."""
        init_L_key, init_J_key = random.split(rng_key)
        n_active_chains, n_params = active.shape
        L = -dist.Uniform().sample(init_L_key, sample_shape=(n_active_chains, 1))
        R = L + 1.0
        J = jnp.floor(
            dist.Uniform(low=0, high=self._max_steps).sample(
                init_J_key, sample_shape=(n_active_chains, 1)
            )
        )
        K = (self._max_steps - 1) - J
        mask_J = jnp.full((n_active_chains, 1), True)
        mask_K = jnp.full((n_active_chains, 1), True)
        init_values = (0, L, R, J, K, mask_J, mask_K, 0)

        def cond_fn(args):
            n_expansions, L, R, J, K, mask_J, mask_K, iteration = args
            return (jnp.count_nonzero(mask_J) + jnp.count_nonzero(mask_K) > 0) & (
                iteration < self._max_iter
            )

        def body_fn(args):
            n_expansions, L, R, J, K, mask_J, mask_K, iteration = args
            log_prob_L = self.batch_log_density(directions * L + active)
            log_prob_R = self.batch_log_density(directions * R + active)
            can_expand_L = mask_J & (log_prob_L > log_slice_height)
            L = jnp.where(can_expand_L, L - 1, L)
            J = jnp.where(can_expand_L, J - 1, J)
            mask_J = jnp.where(can_expand_L, mask_J, False)
            can_expand_R = mask_K & (log_prob_R > log_slice_height)
            R = jnp.where(can_expand_R, R + 1, R)
            K = jnp.where(can_expand_R, K - 1, K)
            mask_K = jnp.where(can_expand_R, mask_K, False)
            iteration += 1
            n_expansions += jnp.count_nonzero(can_expand_L) + jnp.count_nonzero(
                can_expand_R
            )
            return (n_expansions, L, R, J, K, mask_J, mask_K, iteration)

        n_expansions, L, R, *_ = jax.lax.while_loop(cond_fn, body_fn, init_values)
        return n_expansions, L, R

    def _shrink(self, rng_key, log_slice_height, L, R, active, directions):
        """Sample within [L, R], shrinking the bracket on rejections."""
        n_active_chains, n_params = active.shape
        widths = jnp.zeros((n_active_chains, 1))
        proposed = jnp.zeros((n_active_chains, n_params))
        can_shrink = jnp.full((n_active_chains, 1), True)
        init_values = (rng_key, proposed, 0, L, R, widths, can_shrink, 0)

        def cond_fn(args):
            rng_key, proposed, n_contractions, L, R, widths, can_shrink, iteration = args
            return (jnp.count_nonzero(can_shrink) > 0) & (
                iteration < self._max_iter
            )

        def body_fn(args):
            rng_key, proposed, n_contractions, L, R, widths, can_shrink, iteration = args
            rng_key, _ = random.split(rng_key)
            widths = jnp.where(
                can_shrink, dist.Uniform(low=L, high=R).sample(rng_key), widths
            )
            proposed = jnp.where(can_shrink, directions * widths + active, proposed)
            proposed_log_prob = self.batch_log_density(proposed)
            can_shrink = proposed_log_prob < log_slice_height
            L_cond = can_shrink & (widths < 0.0)
            L = jnp.where(L_cond, widths, L)
            R_cond = can_shrink & (widths > 0.0)
            R = jnp.where(R_cond, widths, R)
            iteration += 1
            n_contractions += jnp.count_nonzero(L_cond) + jnp.count_nonzero(R_cond)
            return (rng_key, proposed, n_contractions, L, R, widths, can_shrink, iteration)

        _, proposed, n_contractions, *_ = jax.lax.while_loop(
            cond_fn, body_fn, init_values
        )
        return proposed, n_contractions
