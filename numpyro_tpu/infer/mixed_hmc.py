"""MixedHMC — HMC over continuous sites with clock-driven Metropolis
updates of discrete sites inside the trajectory (Zhou 2020, "Mixed
Hamiltonian Monte Carlo for Mixed Discrete and Continuous Variables").

Role parity: numpyro/infer/mixed_hmc.py:19-312.  Unlike the reference
(which replays a single-chain HMC kernel segment by segment), this kernel
is built directly on the chain-batched engine: every chain carries its own
event clock, discrete kinetic budgets and segment lengths, and the whole
composite trajectory — leapfrog segments via
:func:`hmc_core.integrate_segment` with *persistent* momentum, interleaved
with vmapped discrete flips — runs for all chains in one program.
"""

from __future__ import annotations

from collections import namedtuple

import jax
import jax.numpy as jnp
from jax import lax, random, vmap
from jax.flatten_util import ravel_pytree

from numpyro_tpu.infer import hmc_core as core
from numpyro_tpu.infer.hmc_gibbs import (
    DiscreteHMCGibbs,
    _batched,
    _element_proposal,
    _site_element_layout,
    _split_keys,
    _unbatched,
)

MixedHMCState = namedtuple("MixedHMCState", "z, hmc_state, rng_key, accept_prob")


class MixedHMC(DiscreteHMCGibbs):
    """Requires an ``HMC`` inner kernel with a fixed trajectory length (the
    event-clock scheme is incompatible with NUTS termination)."""

    def __init__(
        self,
        inner_kernel,
        *,
        num_discrete_updates=None,
        random_walk=False,
        modified=False,
    ):
        super().__init__(inner_kernel, random_walk=random_walk, modified=modified)
        if inner_kernel._algo == "NUTS":
            raise ValueError(
                "The algorithm only works with HMC and does not support NUTS."
            )
        self._num_discrete_updates = num_discrete_updates
        self._wa_update = None
        self._layout = None

    def init(self, rng_key, num_warmup, init_params=None, model_args=(), model_kwargs={}):
        state = super().init(
            rng_key, num_warmup, init_params, model_args, model_kwargs
        )
        _, sizes = _site_element_layout(self._support_sizes)
        if self._num_discrete_updates is None:
            self._num_discrete_updates = int(sizes.shape[0])
        self._num_warmup = num_warmup
        # composite-step adaptation is owned here (never a window-end
        # step-size search: the composite accept statistic drives dual
        # averaging directly, matching the reference's find_reasonable=None)
        _, self._wa_update = core.build_warmup(
            None,
            self._ensure_layout(state.hmc_state.z, self._chain_mode),
            num_warmup,
            adapt_step_size=self.inner_kernel._adapt_step_size,
            adapt_mass_matrix=self.inner_kernel._adapt_mass_matrix,
            target_accept_prob=self.inner_kernel._target_accept_prob,
            find_step_size=False,
        )
        zero = jnp.zeros_like(state.hmc_state.accept_prob)
        return MixedHMCState(state.z, state.hmc_state, state.rng_key, zero)

    def _ensure_layout(self, z_hmc_tree, batched):
        if self._layout is None:
            proto = (
                jax.tree.map(lambda x: x[0], z_hmc_tree) if batched else z_hmc_tree
            )
            self._layout = core.FlatLayout(proto)
            self._block_struct = core.build_mass_blocks(
                self._layout, self.inner_kernel._dense_mass
            )
        return self._block_struct

    def sample(self, state, model_args, model_kwargs):
        model_kwargs = {} if model_kwargs is None else model_kwargs
        if not self._chain_mode:
            hs = _batched(
                MixedHMCState(state.z, state.hmc_state, state.rng_key, state.accept_prob)
            )
            state = hs
        state = self._sample_batched(state, model_args, model_kwargs)
        if not self._chain_mode:
            state = _unbatched(state)
        return state

    def _sample_batched(self, state, model_args, model_kwargs):
        inner = self.inner_kernel
        blocks = self._ensure_layout(state.hmc_state.z, True)
        layout = self._layout
        adapt = state.hmc_state.adapt_state
        nd_names, sizes_np = _site_element_layout(self._support_sizes)
        nd = sizes_np.shape[0]
        smax = int(sizes_np.max())
        sizes = jnp.asarray(sizes_np)
        num_updates = self._num_discrete_updates
        traj_len = inner._trajectory_length

        z_disc_tree = {
            k: v for k, v in state.z.items() if k not in state.hmc_state.z
        }
        c = state.hmc_state.diverging.shape[0]
        rows = jnp.arange(c)
        disc_proto = jax.tree.map(lambda x: x[0], z_disc_tree)
        _, disc_unravel = ravel_pytree(disc_proto)
        disc_flat = vmap(lambda t: ravel_pytree(t)[0])(z_disc_tree)

        chain_pe = self._chain_potential(model_args, model_kwargs)

        def pe_at_chain(z_hmc_flat_c):
            def pe_at(disc_flat_c):
                return chain_pe(
                    disc_unravel(disc_flat_c), layout.unravel_one(z_hmc_flat_c)
                )

            return pe_at

        def pe_grad_given(disc_flat_panel):
            def one(z_flat_c, disc_c):
                def f(zf):
                    return chain_pe(disc_unravel(disc_c), layout.unravel_one(zf))

                return jax.value_and_grad(f)(z_flat_c)

            return lambda panel: vmap(one)(panel, disc_flat_panel)

        keys = state.rng_key
        keys, k_ke, k_time, k_mom, k_mh = _split_keys(keys, 5)
        ke_disc = vmap(lambda k: random.exponential(k, (nd,)))(k_ke)
        arrival = vmap(lambda k: random.uniform(k, (nd,)))(k_time)
        # total event-clock time spanned by num_updates arrivals
        whole_rounds = (num_updates - 1) // nd
        frac_idx = (num_updates - 1) % nd
        total_time = whole_rounds + jnp.sort(arrival, axis=1)[:, frac_idx]
        time_unit = traj_len / total_time  # (C,)

        z_flat = layout.ravel_batch(state.hmc_state.z)
        pe0 = state.hmc_state.potential_energy
        grad0 = layout.ravel_batch(state.hmc_state.z_grad)
        d = z_flat.shape[1]
        r = core.draw_momentum(
            blocks, adapt.mass_matrix_sqrt, core.batch_normal(k_mom, d)
        )
        energy_old = pe0 + core.kinetic(blocks, adapt.inverse_mass_matrix, r)

        def event(_, carry):
            keys, z, r, pe, grad, disc, ke, dpe, arrival, n_leap = carry
            keys, k_prop = _split_keys(keys, 2)
            idx = jnp.argmin(arrival, axis=1)  # (C,)
            wait = arrival[rows, idx]
            seg_len = wait * time_unit
            arrival = arrival - wait[:, None]
            arrival = arrival.at[rows, idx].set(1.0)
            steps = jnp.ceil(seg_len / adapt.step_size).astype(jnp.int32)
            pe_grad = pe_grad_given(disc)
            z, r, pe, grad = core.integrate_segment(
                pe_grad, blocks, adapt.inverse_mass_matrix, adapt.step_size,
                steps, z, r, pe, grad,
            )
            n_leap = n_leap + steps

            # one discrete flip per chain, paid from its kinetic budget
            def one(kc, dc, zc, pec, idxc):
                return _element_proposal(
                    pe_at_chain(zc), kc, dc, pec, idxc, sizes[idxc], smax,
                    self._mode,
                )

            disc_prop, pe_prop, log_ratio = vmap(one)(
                k_prop, disc, z, pe, idx
            )
            budget = ke[rows, idx] + log_ratio
            take = budget > 0
            disc_new = jnp.where(take[:, None], disc_prop, disc)
            ke = ke.at[rows, idx].set(jnp.where(take, budget, ke[rows, idx]))
            pe_new, grad_new = pe_grad_given(disc_new)(z)
            dpe = dpe + pe_new - pe
            return keys, z, r, pe_new, grad_new, disc_new, ke, dpe, arrival, n_leap

        carry = (
            keys, z_flat, r, pe0, grad0, disc_flat, ke_disc,
            jnp.zeros((c,)), arrival, jnp.zeros((c,), jnp.int32),
        )
        keys, z_new, r_new, pe_new, grad_new, disc_new, _, dpe, _, n_leap = (
            lax.fori_loop(0, num_updates, event, carry)
        )

        energy_new = pe_new + core.kinetic(
            blocks, adapt.inverse_mass_matrix, r_new
        )
        delta = energy_new - energy_old - dpe
        delta = jnp.where(jnp.isnan(delta), jnp.inf, delta)
        accept_prob = jnp.exp(jnp.minimum(0.0, -delta))
        take = jnp.log(vmap(random.uniform)(k_mh)) < -delta

        def sel(new, old):
            return jnp.where(take.reshape(take.shape + (1,) * (new.ndim - 1)), new, old)

        z_flat = sel(z_new, z_flat)
        pe = jnp.where(take, pe_new, pe0)
        grad = sel(grad_new, grad0)
        disc_flat = sel(disc_new, disc_flat)

        i = state.hmc_state.i
        if self._num_warmup > 0:
            keys, adapt_keys = _split_keys(keys, 2)
            adapt = adapt._replace(rng_key=adapt_keys)
            adapt = lax.cond(
                i < self._num_warmup,
                lambda a: self._wa_update(i, a, accept_prob, z_flat, pe, grad),
                lambda a: a,
                adapt,
            )
            adapt = adapt._replace(rng_key=None)
        i_new = i + 1
        n = jnp.where(i < self._num_warmup, i_new, i_new - self._num_warmup)
        mean_accept = state.hmc_state.mean_accept_prob + (
            accept_prob - state.hmc_state.mean_accept_prob
        ) / n

        hmc_state = state.hmc_state._replace(
            i=i_new,
            z=layout.unravel_batch(z_flat),
            z_grad=layout.unravel_batch(grad),
            potential_energy=pe,
            energy=jnp.where(take, energy_new, energy_old),
            num_steps=n_leap,
            accept_prob=accept_prob,
            mean_accept_prob=mean_accept,
            adapt_state=adapt,
        )
        z_disc_tree = vmap(disc_unravel)(disc_flat)
        z = {**z_disc_tree, **hmc_state.z}
        return MixedHMCState(z, hmc_state, keys, accept_prob)

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_wa_update"] = None
        state["_prototype_trace"] = None
        state["_layout"] = None
        return state
