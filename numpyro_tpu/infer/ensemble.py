"""Ensemble samplers: AIES (affine-invariant, emcee-family) and ESS
(ensemble slice sampling, zeus-family).

Role parity: numpyro/infer/ensemble.py.  The implementation here is
organized around the chain-massive layout: the whole ensemble is one
``(num_chains, dim)`` panel inside a single XLA program, updated in two
statically-sliced color blocks per step (no lax.cond half-selection), with
walker interactions expressed as batched gathers.  Distinct walker pairs
are drawn with a modular offset trick instead of a precomputed
non-diagonal index table, and the ESS bracket expansion/shrink loops are
masked batched while-loops.

Requires ``chain_method="vectorized"`` and an even ``num_chains``.
"""

from __future__ import annotations

import warnings
from abc import ABC, abstractmethod
from collections import namedtuple

import jax
import jax.numpy as jnp
from jax import lax, random, vmap
from jax.scipy.stats import gaussian_kde

import numpyro_tpu.distributions as dist
from numpyro_tpu.infer.ensemble_util import batch_ravel_pytree
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


def _distinct_pair(rng_key, n, shape):
    """Uniform ordered pairs (i, j), i != j, via a modular offset — no
    index-table materialization."""
    ki, kd = random.split(rng_key)
    i = random.randint(ki, shape, 0, n)
    delta = random.randint(kd, shape, 1, n)
    return i, (i + delta) % n


class EnsembleSampler(MCMCKernel, ABC):
    """Shared machinery: one MCMC step = update color block 0 given block 1,
    then block 1 given the refreshed block 0."""

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

    def _setup_density(self, rng_key, model_args, model_kwargs, init_params):
        if self._model is not None:
            info = initialize_model(
                rng_key,
                self._model,
                dynamic_args=True,
                init_strategy=self._init_strategy,
                model_args=model_args,
                model_kwargs=model_kwargs,
                validate_grad=False,
            )
            self._potential_fn = info[1](*model_args, **(model_kwargs or {}))
            self._postprocess_fn = info[2]
            if init_params is None:
                init_params = info[0][0]
        flat, unravel = batch_ravel_pytree(init_params)
        self._batch_log_density = lambda panel: -vmap(self._potential_fn)(
            unravel(panel)
        )
        dim = flat.shape[1]
        if self._num_chains < 2 * dim:
            warnings.warn(
                "ensemble samplers want num_chains >= 2 * n_params "
                f"(got num_chains={self._num_chains}, n_params={dim})",
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
            batch_ok = all(
                jnp.shape(p)[0] == self._num_chains
                for p in jax.tree.leaves(init_params)
            )
            assert batch_ok, "The batch dimension of each param must match num_chains"
        key, key_inner, key_model = random.split(rng_key[0], 3)
        init_params = self._setup_density(
            random.split(key_model, self._num_chains),
            model_args,
            model_kwargs,
            init_params,
        )
        if self._potential_fn and init_params is None:
            raise ValueError(
                "Valid value of `init_params` must be provided with `potential_fn`."
            )
        self._num_warmup = num_warmup
        return EnsembleSamplerState(
            init_params, self.init_inner_state(key_inner), key
        )

    def postprocess_fn(self, args, kwargs):
        if self._postprocess_fn is None:
            return identity
        return self._postprocess_fn(*args, **kwargs)

    def sample(self, state, model_args, model_kwargs):
        z, inner_state, rng_key = state
        rng_key, shuffle_key = random.split(rng_key)
        panel, unravel = batch_ravel_pytree(z)
        if self._randomize_split:
            panel = random.permutation(shuffle_key, panel, axis=0)
        half = self._num_chains // 2
        lo, hi = slice(0, half), slice(half, None)
        # two statically-sliced sub-updates, unrolled (no cond dispatch)
        for mine, other in ((lo, hi), (hi, lo)):
            refreshed, inner_state = self.update_active_chains(
                panel[mine], panel[other], inner_state
            )
            panel = panel.at[mine].set(refreshed)
        return EnsembleSamplerState(unravel(panel), inner_state, rng_key)

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_batch_log_density"] = None
        return state


class AIES(EnsembleSampler):
    """Affine-invariant ensemble sampler (Goodman & Weare 2010 stretch
    move; Nelson et al. 2013 differential-evolution move).  Parity target:
    numpyro/infer/ensemble.py AIES."""

    def __init__(
        self,
        model=None,
        potential_fn=None,
        randomize_split=False,
        moves=None,
        init_strategy=init_to_uniform,
    ):
        if moves:
            self._moves = list(moves.keys())
            self._weights = jnp.asarray(list(moves.values())) / len(moves)
            assert all(callable(m) for m in self._moves)
            assert jnp.all(self._weights >= 0)
        else:
            self._moves = [AIES.DEMove()]
            self._weights = jnp.ones(1)
        super().__init__(
            model,
            potential_fn,
            randomize_split=randomize_split,
            init_strategy=init_strategy,
        )

    def get_diagnostics_str(self, state):
        return "acc. prob={:.2f}".format(state.inner_state.mean_accept_prob)

    def init_inner_state(self, rng_key):
        zero = jnp.zeros(())
        return AIESState(zero, zero, zero, rng_key)

    def update_active_chains(self, active, inactive, inner_state):
        i, _, mean_accept, rng_key = inner_state
        rng_key, k_move, k_prop, k_mh = random.split(rng_key, 4)
        which = random.choice(k_move, len(self._moves), p=self._weights)
        proposal, hastings = lax.switch(
            which, self._moves, k_prop, active, inactive
        )
        log_ratio = (
            hastings
            + self._batch_log_density(proposal)
            - self._batch_log_density(active)
        )
        take = jnp.log(random.uniform(k_mh, log_ratio.shape)) < log_ratio
        refreshed = jnp.where(take[:, None], proposal, active)
        accept_rate = jnp.mean(take)
        half_step = i + 0.5
        denom = jnp.where(
            i < self._num_warmup, half_step, half_step - self._num_warmup
        )
        mean_accept = mean_accept + (accept_rate - mean_accept) / denom
        return refreshed, AIESState(half_step, accept_rate, mean_accept, rng_key)

    @staticmethod
    def DEMove(sigma=1.0e-5, g0=None):
        """Differential-evolution proposal: step along the difference of a
        random distinct pair of complementary walkers."""

        def de_move(rng_key, active, inactive):
            k_pair, k_gamma = random.split(rng_key)
            m, dim = active.shape
            n_inactive = inactive.shape[0]
            scale = g0 if g0 else 2.38 / jnp.sqrt(2.0 * dim)
            i, j = _distinct_pair(k_pair, n_inactive, (m,))
            step = inactive[j] - inactive[i]
            gamma = scale * (
                1.0 + sigma * random.normal(k_gamma, (m, 1))
            )
            return active + gamma * step, jnp.zeros(m)

        return de_move

    @staticmethod
    def StretchMove(a=2.0):
        """Stretch move: contract/expand toward a random complementary
        walker with the affine-invariant z ~ g(z) ∝ 1/sqrt(z) density."""

        def stretch_move(rng_key, active, inactive):
            m, dim = active.shape
            k_z, k_pick = random.split(rng_key)
            u = random.uniform(k_z, (m,))
            zz = (1.0 + (a - 1.0) * u) ** 2 / a
            anchor = inactive[
                random.randint(k_pick, (m,), 0, inactive.shape[0])
            ]
            proposal = anchor + zz[:, None] * (active - anchor)
            return proposal, (dim - 1.0) * jnp.log(zz)

        return stretch_move


class ESS(EnsembleSampler):
    """Ensemble slice sampling (Karamanis & Beutler 2020).  Parity target:
    numpyro/infer/ensemble.py ESS."""

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
        if moves:
            self._moves = list(moves.keys())
            self._weights = jnp.asarray(list(moves.values())) / len(moves)
            assert all(callable(m) for m in self._moves)
            assert jnp.all(self._weights >= 0)
        else:
            self._moves = [ESS.DifferentialMove()]
            self._weights = jnp.ones(1)
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
        return ESSState(
            jnp.zeros(()), jnp.zeros((), int), jnp.zeros((), int),
            jnp.asarray(self._init_mu), rng_key,
        )

    def _logdens_col(self, panel):
        return self._batch_log_density(panel)[:, None]

    def update_active_chains(self, active, inactive, inner_state):
        i, n_exp, n_con, mu, rng_key = inner_state
        rng_key, k_move, k_dir, k_h, k_out, k_in = random.split(rng_key, 6)
        which = random.choice(k_move, len(self._moves), p=self._weights)
        directions = lax.switch(which, self._moves, k_dir, inactive, mu)

        # slice height under the current point
        height = self._logdens_col(active) + jnp.log(
            random.uniform(k_h, (active.shape[0], 1))
        )
        n_out, left, right = self._expand_bracket(
            k_out, height, active, directions
        )
        proposal, n_in = self._sample_bracket(
            k_in, height, left, right, active, directions
        )
        n_exp = n_exp + n_out
        n_con = n_con + n_in
        half_step = i + 0.5
        if self._tune_mu:
            # retune mu once per full step (i.e. on the second half-update)
            at_full = half_step % 1.0 == 0
            exp_safe = jnp.maximum(n_exp, 1)
            mu = jnp.where(at_full, 2.0 * exp_safe / (exp_safe + n_con), mu)
            n_exp = jnp.where(at_full, 0, n_exp)
            n_con = jnp.where(at_full, 0, n_con)
        return proposal, ESSState(half_step, n_exp, n_con, mu, rng_key)

    # --- direction generators ------------------------------------------

    @staticmethod
    def RandomMove():
        """Isotropic random directions (no ensemble interaction)."""

        def random_move(rng_key, inactive, mu):
            raw = random.normal(rng_key, inactive.shape)
            return 2.0 * mu * raw / jnp.linalg.norm(raw, axis=0)

        return random_move

    @staticmethod
    def KDEMove(bw_method=None):
        """Directions from a Gaussian KDE of the complementary block."""

        def kde_move(rng_key, inactive, mu):
            m = inactive.shape[0]
            kde = gaussian_kde(inactive.T, bw_method=bw_method)
            draws = kde.resample(rng_key, (2 * m,)).T
            return 2.0 * mu * (draws[:m] - draws[m:])

        return kde_move

    @staticmethod
    def GaussianMove():
        """Directions from a moment-matched Gaussian of the block."""

        def gaussian_move(rng_key, inactive, mu):
            m = inactive.shape[0]
            cov = jnp.cov(inactive, rowvar=False)
            return 2.0 * mu * dist.MultivariateNormal(0, cov).sample(
                rng_key, sample_shape=(m,)
            )

        return gaussian_move

    @staticmethod
    def DifferentialMove():
        """Directions along random distinct walker-pair differences (the
        robust default)."""

        def differential_move(rng_key, inactive, mu):
            m = inactive.shape[0]
            i, j = _distinct_pair(rng_key, m, (m,))
            return 2.0 * mu * (inactive[j] - inactive[i])

        return differential_move

    # --- slice machinery -----------------------------------------------

    def _expand_bracket(self, rng_key, height, active, directions):
        """Grow [left, right] until both ends are outside the slice, with a
        per-walker stepping budget split at random (Neal 2003 step-out,
        batched over all walkers via masks)."""
        k_pos, k_split = random.split(rng_key)
        m = active.shape[0]
        left = -random.uniform(k_pos, (m, 1))
        right = left + 1.0
        budget_l = jnp.floor(
            random.uniform(k_split, (m, 1)) * self._max_steps
        )
        budget_r = (self._max_steps - 1) - budget_l
        grow_l = jnp.ones((m, 1), bool)
        grow_r = jnp.ones((m, 1), bool)

        def cond_fn(s):
            it, grow_l, grow_r = s[0], s[5], s[6]
            return ((grow_l | grow_r).any()) & (it < self._max_iter)

        def body_fn(s):
            it, count, left, right, budgets, grow_l, grow_r = s
            budget_l, budget_r = budgets
            inside_l = self._logdens_col(active + left * directions) > height
            inside_r = self._logdens_col(active + right * directions) > height
            step_l = grow_l & inside_l
            step_r = grow_r & inside_r
            left = jnp.where(step_l, left - 1.0, left)
            right = jnp.where(step_r, right + 1.0, right)
            budget_l = jnp.where(step_l, budget_l - 1.0, budget_l)
            budget_r = jnp.where(step_r, budget_r - 1.0, budget_r)
            # a walker keeps growing a side only while it is still inside
            grow_l = step_l & (budget_l > 0)
            grow_r = step_r & (budget_r > 0)
            count = count + step_l.sum() + step_r.sum()
            return (
                it + 1, count, left, right, (budget_l, budget_r), grow_l, grow_r
            )

        state = (0, 0, left, right, (budget_l, budget_r), grow_l, grow_r)
        _, count, left, right, _, _, _ = lax.while_loop(cond_fn, body_fn, state)
        return count, left, right

    def _sample_bracket(self, rng_key, height, left, right, active, directions):
        """Draw within [left, right], shrinking toward the current point on
        each rejection (batched)."""
        m, dim = active.shape
        proposal = active
        pending = jnp.ones((m, 1), bool)

        def cond_fn(s):
            it, pending = s[0], s[6]
            return pending.any() & (it < self._max_iter)

        def body_fn(s):
            it, count, key, left, right, proposal, pending = s
            key, k_u = random.split(key)
            offset = left + (right - left) * random.uniform(k_u, (m, 1))
            candidate = active + offset * directions
            proposal = jnp.where(pending, candidate, proposal)
            rejected = pending & (self._logdens_col(proposal) < height)
            shrink_l = rejected & (offset < 0)
            shrink_r = rejected & (offset > 0)
            left = jnp.where(shrink_l, offset, left)
            right = jnp.where(shrink_r, offset, right)
            count = count + shrink_l.sum() + shrink_r.sum()
            return it + 1, count, key, left, right, proposal, rejected

        state = (0, 0, rng_key, left, right, proposal, pending)
        _, count, _, _, _, proposal, _ = lax.while_loop(cond_fn, body_fn, state)
        return proposal, count
