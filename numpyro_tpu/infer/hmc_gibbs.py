"""HMC-within-Gibbs kernels: HMCGibbs, DiscreteHMCGibbs, HMCECS.

Reference surface: numpyro/infer/hmc_gibbs.py:38-769.
- ``HMCGibbs``: user-supplied Gibbs conditional over some sites, HMC/NUTS
  over the rest; model wrapped with condition+substitute of Gibbs values.
- ``DiscreteHMCGibbs``: auto-detected finite-support sites updated by
  (modified-)Gibbs or random-walk MH proposals inside a fori_loop.
- ``HMCECS``: energy-conserving subsampling — subsample plate indices become
  Gibbs sites updated blockwise with a pseudo-marginal MH correction; an
  ``estimate_likelihood`` messenger swaps the subsample likelihood for a
  bias-corrected control-variate estimator (see contrib/ecs_proxies.py).
"""

from __future__ import annotations

import copy
from collections import namedtuple
from functools import partial

import numpy as np

from jax import grad, jacfwd, random, value_and_grad
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree
from jax.scipy.special import expit

import numpyro_tpu
from numpyro_tpu.contrib.ecs_proxies import block_update, perturbed_method, taylor_proxy
from numpyro_tpu.handlers import condition, seed, substitute, trace
from numpyro_tpu.infer.hmc import HMC
from numpyro_tpu.infer.initialization import init_to_sample
from numpyro_tpu.infer.mcmc import MCMCKernel
from numpyro_tpu.infer.util import _unconstrain_reparam
from numpyro_tpu.util import cond, fori_loop, identity

HMCGibbsState = namedtuple("HMCGibbsState", "z, hmc_state, rng_key")
HMCECSState = namedtuple("HMCECSState", "z, hmc_state, rng_key, gibbs_state, accept_prob")


def _wrap_model(model, *args, **kwargs):
    gibbs_values = kwargs.pop("_gibbs_sites", {})
    with condition(data=gibbs_values), substitute(data=gibbs_values):
        return model(*args, **kwargs)


class HMCGibbs(MCMCKernel):
    """HMC/NUTS over continuous sites + a user Gibbs conditional over
    ``gibbs_sites`` (reference: hmc_gibbs.py:38-191)."""

    sample_field = "z"

    def __init__(self, inner_kernel, gibbs_fn, gibbs_sites):
        if not isinstance(inner_kernel, HMC):
            raise ValueError("inner_kernel must be a HMC or NUTS sampler.")
        if not callable(gibbs_fn):
            raise ValueError("gibbs_fn must be a callable")
        assert inner_kernel.model is not None, (
            "HMCGibbs does not support models specified via a potential function."
        )
        self.inner_kernel = copy.copy(inner_kernel)
        self.inner_kernel._model = partial(_wrap_model, inner_kernel.model)
        self._gibbs_sites = gibbs_sites
        self._gibbs_fn = gibbs_fn
        self._prototype_trace = None

    @property
    def model(self):
        return self.inner_kernel._model

    def get_diagnostics_str(self, state):
        state = state.hmc_state
        return "{} steps of size {:.2e}. acc. prob={:.2f}".format(
            state.num_steps, state.adapt_state.step_size, state.mean_accept_prob
        )

    def postprocess_fn(self, args, kwargs):
        def fn(z):
            model_kwargs = {} if kwargs is None else kwargs.copy()
            hmc_sites = {k: v for k, v in z.items() if k not in self._gibbs_sites}
            gibbs_sites = {k: v for k, v in z.items() if k in self._gibbs_sites}
            model_kwargs["_gibbs_sites"] = gibbs_sites
            hmc_sites = self.inner_kernel.postprocess_fn(args, model_kwargs)(hmc_sites)
            return {**gibbs_sites, **hmc_sites}

        return fn

    def init(self, rng_key, num_warmup, init_params=None, model_args=(), model_kwargs={}):
        model_kwargs = {} if model_kwargs is None else model_kwargs.copy()
        if self._prototype_trace is None:
            rng_key, key_u = random.split(rng_key)
            self._prototype_trace = trace(
                substitute(seed(self.model, key_u), substitute_fn=init_to_sample())
            ).get_trace(*model_args, **model_kwargs)
        rng_key, key_z = random.split(rng_key)
        gibbs_sites = {}
        for name, site in self._prototype_trace.items():
            if init_params and (name in init_params) and (name in self._gibbs_sites):
                gibbs_sites[name] = init_params.pop(name)
            elif name in self._gibbs_sites:
                gibbs_sites[name] = site["value"]
        model_kwargs["_gibbs_sites"] = gibbs_sites
        hmc_state = self.inner_kernel.init(
            key_z, num_warmup, init_params, model_args, model_kwargs
        )
        z = {**gibbs_sites, **hmc_state.z}
        return HMCGibbsState(z, hmc_state, rng_key)

    def sample(self, state, model_args, model_kwargs):
        model_kwargs = {} if model_kwargs is None else model_kwargs
        rng_key, rng_gibbs = random.split(state.rng_key)

        def potential_fn(z_gibbs, z_hmc):
            return self.inner_kernel._potential_fn_gen(
                *model_args, _gibbs_sites=z_gibbs, **model_kwargs
            )(z_hmc)

        z_gibbs = {k: v for k, v in state.z.items() if k not in state.hmc_state.z}
        z_hmc = {k: v for k, v in state.z.items() if k in state.hmc_state.z}
        model_kwargs_ = model_kwargs.copy()
        model_kwargs_["_gibbs_sites"] = z_gibbs
        z_hmc = self.inner_kernel.postprocess_fn(model_args, model_kwargs_)(z_hmc)

        z_gibbs = self._gibbs_fn(rng_key=rng_gibbs, gibbs_sites=z_gibbs, hmc_sites=z_hmc)

        if self.inner_kernel._forward_mode_differentiation:
            pe = potential_fn(z_gibbs, state.hmc_state.z)
            z_grad = jacfwd(partial(potential_fn, z_gibbs))(state.hmc_state.z)
        else:
            pe, z_grad = value_and_grad(partial(potential_fn, z_gibbs))(
                state.hmc_state.z
            )
        hmc_state = state.hmc_state._replace(z_grad=z_grad, potential_energy=pe)
        model_kwargs_["_gibbs_sites"] = z_gibbs
        hmc_state = self.inner_kernel.sample(hmc_state, model_args, model_kwargs_)
        z = {**z_gibbs, **hmc_state.z}
        return HMCGibbsState(z, hmc_state, rng_key)

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_prototype_trace"] = None
        return state


# --- discrete-site proposal machinery (reference: hmc_gibbs.py:150-330) ---


def _discrete_gibbs_proposal_body_fn(
    z_init_flat, unravel_fn, pe_init, potential_fn, idx, i, val
):
    rng_key, z, pe, log_weight_sum = val
    rng_key, rng_transition = random.split(rng_key)
    proposal = jnp.where(i >= z_init_flat[idx], i + 1, i)
    z_new_flat = z_init_flat.at[idx].set(proposal)
    z_new = unravel_fn(z_new_flat)
    pe_new = potential_fn(z_new)
    log_weight_new = pe_init - pe_new
    log_weight_new = jnp.where(jnp.isfinite(log_weight_new), log_weight_new, -jnp.inf)
    # stick-breaking / Gumbel-free reservoir selection across candidates
    transition_prob = expit(log_weight_new - log_weight_sum)
    z, pe = cond(
        random.bernoulli(rng_transition, transition_prob),
        (z_new, pe_new),
        identity,
        (z, pe),
        identity,
    )
    log_weight_sum = jnp.logaddexp(log_weight_new, log_weight_sum)
    return rng_key, z, pe, log_weight_sum


def _discrete_gibbs_proposal(rng_key, z_discrete, pe, potential_fn, idx, support_size):
    z_discrete_flat, unravel_fn = ravel_pytree(z_discrete)
    body_fn = partial(
        _discrete_gibbs_proposal_body_fn,
        z_discrete_flat,
        unravel_fn,
        pe,
        potential_fn,
        idx,
    )
    init_val = (rng_key, z_discrete, pe, jnp.array(0.0))
    rng_key, z_new, pe_new, _ = fori_loop(0, support_size - 1, body_fn, init_val)
    return rng_key, z_new, pe_new, jnp.array(0.0)


def _discrete_modified_gibbs_proposal(
    rng_key, z_discrete, pe, potential_fn, idx, support_size, stay_prob=0.0
):
    assert isinstance(stay_prob, float) and stay_prob >= 0.0 and stay_prob < 1
    z_discrete_flat, unravel_fn = ravel_pytree(z_discrete)
    body_fn = partial(
        _discrete_gibbs_proposal_body_fn,
        z_discrete_flat,
        unravel_fn,
        pe,
        potential_fn,
        idx,
    )
    init_val = (rng_key, z_discrete, pe, jnp.array(-jnp.inf))
    rng_key, z_new, pe_new, log_weight_sum = fori_loop(
        0, support_size - 1, body_fn, init_val
    )
    rng_key, rng_stay = random.split(rng_key)
    z_new, pe_new = cond(
        random.bernoulli(rng_stay, stay_prob),
        (z_discrete, pe),
        identity,
        (z_new, pe_new),
        identity,
    )
    log_accept_ratio = log_weight_sum - jnp.log(
        jnp.exp(log_weight_sum) - jnp.expm1(pe - pe_new)
    )
    return rng_key, z_new, pe_new, log_accept_ratio


def _discrete_rw_proposal(rng_key, z_discrete, pe, potential_fn, idx, support_size):
    rng_key, rng_proposal = random.split(rng_key, 2)
    z_discrete_flat, unravel_fn = ravel_pytree(z_discrete)
    proposal = random.randint(rng_proposal, (), minval=0, maxval=support_size)
    z_new = unravel_fn(z_discrete_flat.at[idx].set(proposal))
    pe_new = potential_fn(z_new)
    return rng_key, z_new, pe_new, pe - pe_new


def _discrete_modified_rw_proposal(
    rng_key, z_discrete, pe, potential_fn, idx, support_size, stay_prob=0.0
):
    assert isinstance(stay_prob, float) and stay_prob >= 0.0 and stay_prob < 1
    rng_key, rng_proposal, rng_stay = random.split(rng_key, 3)
    z_discrete_flat, unravel_fn = ravel_pytree(z_discrete)
    i = random.randint(rng_proposal, (), minval=0, maxval=support_size - 1)
    proposal = jnp.where(i >= z_discrete_flat[idx], i + 1, i)
    proposal = jnp.where(random.bernoulli(rng_stay, stay_prob), idx, proposal)
    z_new = unravel_fn(z_discrete_flat.at[idx].set(proposal))
    pe_new = potential_fn(z_new)
    return rng_key, z_new, pe_new, pe - pe_new


def _discrete_gibbs_fn(potential_fn, support_sizes, proposal_fn):
    def gibbs_fn(rng_key, gibbs_sites, hmc_sites, pe):
        support_sizes_flat, _ = ravel_pytree(
            {k: support_sizes[k] for k in gibbs_sites}
        )
        num_discretes = support_sizes_flat.shape[0]
        rng_key, rng_permute = random.split(rng_key)
        idxs = random.permutation(rng_permute, jnp.arange(num_discretes))

        def body_fn(i, val):
            idx = idxs[i]
            support_size = support_sizes_flat[idx]
            rng_key, z, pe = val
            rng_key, z_new, pe_new, log_accept_ratio = proposal_fn(
                rng_key,
                z,
                pe,
                potential_fn=partial(potential_fn, z_hmc=hmc_sites),
                idx=idx,
                support_size=support_size,
            )
            rng_key, rng_accept = random.split(rng_key)
            z, pe = cond(
                random.exponential(rng_accept) > -log_accept_ratio,
                (z_new, pe_new),
                identity,
                (z, pe),
                identity,
            )
            return rng_key, z, pe

        init_val = (rng_key, gibbs_sites, pe)
        _, gibbs_sites, pe = fori_loop(0, num_discretes, body_fn, init_val)
        return gibbs_sites, pe

    return gibbs_fn


class DiscreteHMCGibbs(HMCGibbs):
    """Metropolis(-within-Gibbs) updates for auto-detected discrete latent
    sites; HMC/NUTS over the rest (reference: hmc_gibbs.py:272-487)."""

    def __init__(self, inner_kernel, *, random_walk=False, modified=False):
        super().__init__(inner_kernel, identity, None)
        self._random_walk = random_walk
        self._modified = modified
        if random_walk:
            if modified:
                self._discrete_proposal_fn = partial(
                    _discrete_modified_rw_proposal, stay_prob=0.0
                )
            else:
                self._discrete_proposal_fn = _discrete_rw_proposal
        else:
            if modified:
                self._discrete_proposal_fn = partial(
                    _discrete_modified_gibbs_proposal, stay_prob=0.0
                )
            else:
                self._discrete_proposal_fn = _discrete_gibbs_proposal

    def init(self, rng_key, num_warmup, init_params=None, model_args=(), model_kwargs={}):
        model_kwargs = {} if model_kwargs is None else model_kwargs.copy()
        rng_key, key_u = random.split(rng_key)
        self._prototype_trace = trace(
            substitute(seed(self.model, key_u), substitute_fn=init_to_sample())
        ).get_trace(*model_args, **model_kwargs)
        self._support_sizes = {
            name: np.broadcast_to(
                site["fn"].enumerate_support(False).shape[0], jnp.shape(site["value"])
            )
            for name, site in self._prototype_trace.items()
            if site["type"] == "sample"
            and site["fn"].has_enumerate_support
            and not site["is_observed"]
        }
        self._gibbs_sites = [
            name
            for name, site in self._prototype_trace.items()
            if site["type"] == "sample"
            and site["fn"].has_enumerate_support
            and not site["is_observed"]
            and site["infer"].get("enumerate", "") != "parallel"
        ]
        assert self._gibbs_sites, "Cannot detect any discrete latent variables."
        return super().init(rng_key, num_warmup, init_params, model_args, model_kwargs)

    def sample(self, state, model_args, model_kwargs):
        model_kwargs = {} if model_kwargs is None else model_kwargs
        rng_key, rng_gibbs = random.split(state.rng_key)

        def potential_fn(z_gibbs, z_hmc):
            return self.inner_kernel._potential_fn_gen(
                *model_args, _gibbs_sites=z_gibbs, **model_kwargs
            )(z_hmc)

        z_gibbs = {k: v for k, v in state.z.items() if k not in state.hmc_state.z}
        z_hmc = {k: v for k, v in state.z.items() if k in state.hmc_state.z}
        model_kwargs_ = model_kwargs.copy()
        model_kwargs_["_gibbs_sites"] = z_gibbs

        gibbs_fn = _discrete_gibbs_fn(
            potential_fn, self._support_sizes, self._discrete_proposal_fn
        )
        z_gibbs, pe = gibbs_fn(
            rng_key=rng_gibbs,
            gibbs_sites=z_gibbs,
            hmc_sites=z_hmc,
            pe=state.hmc_state.potential_energy,
        )

        if self.inner_kernel._forward_mode_differentiation:
            z_grad = jacfwd(partial(potential_fn, z_gibbs))(state.hmc_state.z)
        else:
            z_grad = grad(partial(potential_fn, z_gibbs))(state.hmc_state.z)
        hmc_state = state.hmc_state._replace(z_grad=z_grad, potential_energy=pe)
        model_kwargs_["_gibbs_sites"] = z_gibbs
        hmc_state = self.inner_kernel.sample(hmc_state, model_args, model_kwargs_)
        z = {**z_gibbs, **hmc_state.z}
        return HMCGibbsState(z, hmc_state, rng_key)


def _wrap_gibbs_state(model, *args, **kwargs):
    msg = {"type": "_gibbs_state", "value": kwargs.pop("_gibbs_state", ())}
    numpyro_tpu.primitives.apply_stack(msg)
    return model(*args, **kwargs)


class HMCECS(HMCGibbs):
    """HMC with Energy-Conserving Subsampling (Dang et al. 2019; block
    pseudo-marginal of Tran et al. 2017; Taylor control variates of Quiroz
    et al. 2018) — the covtype north-star kernel
    (reference: hmc_gibbs.py:502-687)."""

    def __init__(self, inner_kernel, *, num_blocks=1, proxy=None):
        super().__init__(inner_kernel, identity, None)
        self.inner_kernel._model = partial(_wrap_gibbs_state, self.inner_kernel._model)
        self._num_blocks = num_blocks
        self._proxy = proxy

    def postprocess_fn(self, args, kwargs):
        def fn(z):
            model_kwargs = {} if kwargs is None else kwargs.copy()
            hmc_sites = {k: v for k, v in z.items() if k not in self._gibbs_sites}
            gibbs_sites = {k: v for k, v in z.items() if k in self._gibbs_sites}
            model_kwargs["_gibbs_sites"] = gibbs_sites
            return self.inner_kernel.postprocess_fn(args, model_kwargs)(hmc_sites)

        return fn

    def init(self, rng_key, num_warmup, init_params=None, model_args=(), model_kwargs={}):
        model_kwargs = {} if model_kwargs is None else model_kwargs.copy()
        rng_key, key_u = random.split(rng_key)
        self._prototype_trace = trace(
            substitute(seed(self.model, key_u), substitute_fn=init_to_sample())
        ).get_trace(*model_args, **model_kwargs)
        self._subsample_plate_sizes = {
            name: site["args"]
            for name, site in self._prototype_trace.items()
            if site["type"] == "plate"
            and (site["args"][1] is not None)
            and site["args"][0] > site["args"][1]
        }
        self._gibbs_sites = list(self._subsample_plate_sizes.keys())
        assert self._gibbs_sites, "Cannot detect any subsample statements in the model."
        if self._proxy is not None:
            if any(
                site["type"] == "sample"
                and (not site["is_observed"])
                and site["fn"].support.is_discrete
                for site in self._prototype_trace.values()
            ):
                raise RuntimeError(
                    "Currently, the proxy does not support models with "
                    "discrete latent sites."
                )
            proxy_fn, gibbs_init, self._gibbs_update = self._proxy(
                self._prototype_trace,
                self._subsample_plate_sizes,
                self.model,
                model_args,
                model_kwargs.copy(),
                num_blocks=self._num_blocks,
            )
            method = perturbed_method(self._subsample_plate_sizes, proxy_fn)
            self.inner_kernel._model = estimate_likelihood(
                self.inner_kernel._model, method
            )
            z_gibbs = {
                name: site["value"]
                for name, site in self._prototype_trace.items()
                if name in self._gibbs_sites
            }
            rng_key, rng_state = random.split(rng_key)
            gibbs_state = gibbs_init(rng_state, z_gibbs)
        else:
            self._gibbs_update = partial(
                block_update, self._subsample_plate_sizes, self._num_blocks
            )
            gibbs_state = ()

        model_kwargs["_gibbs_state"] = gibbs_state
        state = super().init(rng_key, num_warmup, init_params, model_args, model_kwargs)
        return HMCECSState(
            state.z, state.hmc_state, state.rng_key, gibbs_state, jnp.zeros(())
        )

    def sample(self, state, model_args, model_kwargs):
        model_kwargs = {} if model_kwargs is None else model_kwargs.copy()
        rng_key, rng_gibbs = random.split(state.rng_key)

        def potential_fn(z_gibbs, gibbs_state, z_hmc):
            return self.inner_kernel._potential_fn_gen(
                *model_args,
                _gibbs_sites=z_gibbs,
                _gibbs_state=gibbs_state,
                **model_kwargs,
            )(z_hmc)

        z_gibbs = {k: v for k, v in state.z.items() if k not in state.hmc_state.z}
        z_gibbs_new, gibbs_state_new = self._gibbs_update(
            rng_key, z_gibbs, state.gibbs_state
        )

        # pseudo-marginal MH on the likelihood-estimator difference
        pe = state.hmc_state.potential_energy
        pe_new = potential_fn(z_gibbs_new, gibbs_state_new, state.hmc_state.z)
        accept_prob = jnp.clip(jnp.exp(pe - pe_new), None, 1.0)
        transition = random.bernoulli(rng_key, accept_prob)
        grad_ = jacfwd if self.inner_kernel._forward_mode_differentiation else grad
        z_gibbs, gibbs_state, pe, z_grad = cond(
            transition,
            (z_gibbs_new, gibbs_state_new, pe_new),
            lambda vals: vals
            + (grad_(partial(potential_fn, vals[0], vals[1]))(state.hmc_state.z),),
            (z_gibbs, state.gibbs_state, pe, state.hmc_state.z_grad),
            identity,
        )

        hmc_state = state.hmc_state._replace(z_grad=z_grad, potential_energy=pe)
        model_kwargs["_gibbs_sites"] = z_gibbs
        model_kwargs["_gibbs_state"] = gibbs_state
        hmc_state = self.inner_kernel.sample(hmc_state, model_args, model_kwargs)
        z = {**z_gibbs, **hmc_state.z}
        return HMCECSState(z, hmc_state, rng_key, gibbs_state, accept_prob)

    @staticmethod
    def taylor_proxy(reference_params, degree=2):
        return taylor_proxy(reference_params, degree)


class estimate_likelihood(numpyro_tpu.primitives.Messenger):
    """Intercepts observed sites inside subsample plates: masks their exact
    likelihood and, on exit, injects a bias-corrected estimator factor
    (reference: hmc_gibbs.py:690-769)."""

    def __init__(self, fn=None, method=None):
        assert method is not None
        super().__init__(fn)
        self.method = method
        self.params = None
        self.likelihoods = {}
        self.subsample_plates = {}
        self.gibbs_state = None

    def __enter__(self):
        # only active when the potential-energy unconstraining substitution
        # is on the stack (i.e. during potential_fn evaluation)
        for handler in numpyro_tpu.primitives._PYRO_STACK[::-1]:
            if (
                isinstance(handler, substitute)
                and isinstance(handler.substitute_fn, partial)
                and handler.substitute_fn.func is _unconstrain_reparam
            ):
                self.params = handler.substitute_fn.args[0]
                break
        return super().__enter__()

    def __exit__(self, exc_type, exc_value, traceback):
        super().__exit__(exc_type, exc_value, traceback)
        if exc_type is not None:
            return
        if self.params is None:
            return
        if numpyro_tpu.get_mask() is not False:
            numpyro_tpu.factor(
                "_biased_corrected_log_likelihood",
                self.method(self.likelihoods, self.params, self.gibbs_state),
            )
        self.params = None
        self.likelihoods = {}
        self.subsample_plates = {}
        self.gibbs_state = None

    def process_message(self, msg):
        if self.params is None:
            return
        if msg["type"] == "_gibbs_state":
            self.gibbs_state = msg["value"]
            return
        if msg["type"] == "sample" and msg["is_observed"]:
            assert msg["name"] not in self.params
            for frame in msg["cond_indep_stack"]:
                if frame.name in self.subsample_plates:
                    if msg["name"] in self.likelihoods:
                        raise RuntimeError(
                            f"Multiple subsample plates at site {msg['name']} "
                            "are not allowed. Please reshape your data."
                        )
                    self.likelihoods[msg["name"]] = (
                        msg["fn"],
                        msg["value"],
                        frame.name,
                        frame.dim,
                    )
                    msg["fn"] = msg["fn"].mask(False)
        elif (
            msg["type"] == "plate"
            and (msg["args"][1] is not None)
            and msg["args"][0] > msg["args"][1]
        ):
            self.subsample_plates[msg["name"]] = msg["value"]
