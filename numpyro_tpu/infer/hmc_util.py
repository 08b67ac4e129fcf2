"""Scalar (per-chain) HMC utilities and subposterior combination.

The chain-batched NUTS/HMC engine lives in :mod:`numpyro_tpu.infer.hmc_core`;
this module keeps the *single-chain* adaptation building blocks that other
kernels (BarkerMH, MixedHMC) compose and vmap themselves, plus the
embarrassingly-parallel subposterior merging helpers.  Functional parity
targets in the reference are cited per function; the implementations here
are organized around precomputed window masks and flat-vector state rather
than the reference's window-index registers.
"""

from __future__ import annotations

from collections import namedtuple

import jax
import jax.numpy as jnp
from jax import random
from jax.flatten_util import ravel_pytree

from numpyro_tpu.infer.hmc_core import stan_windows
from numpyro_tpu.util import identity, while_loop

AdaptWindow = namedtuple("AdaptWindow", ["start", "end"])

HMCAdaptState = namedtuple(
    "HMCAdaptState",
    [
        "step_size",
        "inverse_mass_matrix",
        "mass_matrix_sqrt",
        "mass_matrix_sqrt_inv",
        "ss_state",
        "mm_state",
        "window_idx",
        "rng_key",
    ],
)

IntegratorState = namedtuple(
    "IntegratorState", ["z", "r", "potential_energy", "z_grad"]
)
IntegratorState.__new__.__defaults__ = (None,) * len(IntegratorState._fields)

DualAveragingState = namedtuple(
    "DualAveragingState", ["x_t", "x_avg", "g_avg", "t", "prox_center"]
)
WelfordCovarianceState = namedtuple("WelfordCovarianceState", ["mean", "m2", "n"])


# ---------------------------------------------------------------------------
# Step-size adaptation


def dual_averaging(t0=10, kappa=0.75, gamma=0.05):
    """Nesterov primal-dual averaging for stochastic root finding; drives
    log-step-size toward the target acceptance statistic (parity:
    numpyro/infer/hmc_util.py:60-130)."""

    def reset(prox_center=0.0):
        zero = jnp.zeros_like(jnp.asarray(prox_center, jnp.result_type(float)))
        return DualAveragingState(
            zero, zero, zero, jnp.zeros((), jnp.result_type(int)), prox_center
        )

    def step(gradient, state):
        n = state.t + 1
        # running average of the noisy gradients, heavier discount early on
        g_avg = state.g_avg + (gradient - state.g_avg) / (n + t0)
        x_t = state.prox_center - jnp.sqrt(n.astype(g_avg.dtype)) / gamma * g_avg
        mix = n ** (-kappa)
        x_avg = mix * x_t + (1 - mix) * state.x_avg
        return DualAveragingState(x_t, x_avg, g_avg, n, state.prox_center)

    return reset, step


# ---------------------------------------------------------------------------
# Online covariance (mass-matrix estimation)


def welford_covariance(diagonal=True):
    """Single-pass Welford moment accumulator; ``final_fn`` emits the
    (regularized) covariance plus the whitening factors the samplers need
    (parity: numpyro/infer/hmc_util.py:133-239).  Dict-valued states carry
    one accumulator per mass-matrix block."""

    def init_fn(size):
        if isinstance(size, dict):
            return {k: init_fn(v) for k, v in size.items()}
        if isinstance(size, int):
            shape = (size,) if diagonal else (size, size)
        else:
            shape = size
        return WelfordCovarianceState(
            jnp.zeros(shape[-1]), jnp.zeros(shape), jnp.zeros(())
        )

    def _flat_block(sample, names):
        parts = [jnp.ravel(sample[k]) for k in names]
        return jnp.concatenate(parts) if parts else jnp.zeros((0,))

    def update_fn(sample, state):
        if isinstance(state, dict):
            return {
                names: update_fn(_flat_block(sample, names), block)
                for names, block in state.items()
            }
        n = state.n + 1
        before = sample - state.mean
        mean = state.mean + before / n
        after = sample - mean
        if state.m2.ndim == 1:
            m2 = state.m2 + before * after
        else:
            m2 = state.m2 + jnp.outer(after, before)
        return WelfordCovarianceState(mean, m2, n)

    def final_fn(state, regularize=False):
        if isinstance(state, dict):
            outs = {k: final_fn(v, regularize=regularize) for k, v in state.items()}
            return tuple(
                {k: v[j] for k, v in outs.items()} for j in range(3)
            )
        n = state.n
        cov = state.m2 / jnp.maximum(n - 1, 1)
        if regularize:
            # Stan-style shrinkage toward (a small multiple of) the identity
            weight = n / (n + 5.0)
            ridge = 1e-3 * (1 - weight)
            cov = weight * cov
            if cov.ndim == 1:
                cov = cov + ridge
            else:
                cov = cov + ridge * jnp.eye(cov.shape[-1])
        if cov.ndim == 1:
            root = jnp.sqrt(cov)
            return cov, 1.0 / root, root
        # chol(cov^{-1}) without forming the inverse (flip-reorder trick);
        # the third value is its exact inverse
        rev = jnp.linalg.cholesky(cov[::-1, ::-1])[::-1, ::-1]
        sqrt_inv = rev.T
        sqrt = jax.scipy.linalg.solve_triangular(
            sqrt_inv, jnp.eye(cov.shape[-1]), lower=True
        )
        return cov, sqrt, sqrt_inv

    return init_fn, update_fn, final_fn


# ---------------------------------------------------------------------------
# Euclidean kinetic energy on pytree momenta (scalar-per-chain form)


def _mass_inv_apply(inverse_mass_matrix, r):
    if isinstance(inverse_mass_matrix, dict):
        out = {}
        for names, mm in inverse_mass_matrix.items():
            flat, unravel = ravel_pytree({k: r[k] for k in names})
            out.update(unravel(mm * flat if mm.ndim == 1 else mm @ flat))
        return out
    flat, unravel = ravel_pytree(r)
    return unravel(
        inverse_mass_matrix * flat
        if inverse_mass_matrix.ndim == 1
        else inverse_mass_matrix @ flat
    )


def euclidean_kinetic_energy(inverse_mass_matrix, r):
    """K(r) = <r, M^{-1} r> / 2 over pytree momenta."""
    v = _mass_inv_apply(inverse_mass_matrix, r)
    leaves_r = jax.tree.leaves(r)
    leaves_v = jax.tree.leaves(v)
    return 0.5 * sum(
        jnp.vdot(a, b) for a, b in zip(leaves_v, leaves_r)
    )


euclidean_kinetic_energy._kinetic_grad = _mass_inv_apply


def velocity_verlet(potential_fn, kinetic_fn, forward_mode_differentiation=False):
    """Leapfrog (init_fn, update_fn) on pytree states (parity:
    numpyro/infer/hmc_util.py:242-311)."""
    if forward_mode_differentiation:

        def value_grad(z):
            return potential_fn(z), jax.jacfwd(potential_fn)(z)

    else:
        value_grad = jax.value_and_grad(potential_fn)

    momentum_grad = getattr(
        kinetic_fn, "_kinetic_grad", None
    ) or (lambda mm, r: jax.grad(kinetic_fn, argnums=1)(mm, r))

    def init_fn(z, r, potential_energy=None, z_grad=None):
        if potential_energy is None or z_grad is None:
            potential_energy, z_grad = value_grad(z)
        return IntegratorState(z, r, potential_energy, z_grad)

    def update_fn(step_size, inverse_mass_matrix, state):
        z, r, _, z_grad = state
        r = jax.tree.map(lambda a, g: a - 0.5 * step_size * g, r, z_grad)
        v = momentum_grad(inverse_mass_matrix, r)
        z = jax.tree.map(lambda a, b: a + step_size * b, z, v)
        potential_energy, z_grad = value_grad(z)
        r = jax.tree.map(lambda a, g: a - 0.5 * step_size * g, r, z_grad)
        return IntegratorState(z, r, potential_energy, z_grad)

    return init_fn, update_fn


def find_reasonable_step_size(
    potential_fn,
    kinetic_fn,
    momentum_generator,
    init_step_size,
    inverse_mass_matrix,
    z_info,
    rng_key,
):
    """Double/halve the step size until one-leapfrog acceptance crosses 0.8
    (parity: numpyro/infer/hmc_util.py:314-384)."""
    z, _, pe, z_grad = z_info
    _, leapfrog = velocity_verlet(potential_fn, kinetic_fn)
    log_target = jnp.log(0.8)
    bounds = jnp.finfo(jnp.result_type(float))

    def probe(args):
        step_size, prev_sign, _, key = args
        key, key_r = random.split(key)
        r = momentum_generator(z, inverse_mass_matrix, key_r)
        next_state = leapfrog(
            step_size, inverse_mass_matrix, IntegratorState(z, r, pe, z_grad)
        )
        h0 = pe + kinetic_fn(inverse_mass_matrix, r)
        h1 = next_state.potential_energy + kinetic_fn(
            inverse_mass_matrix, next_state.r
        )
        sign = jnp.where(log_target < h0 - h1, 1, -1)
        return step_size * 2.0 ** sign, sign, prev_sign, key

    def keep_going(args):
        step_size, sign, prev_sign, _ = args
        in_range = (step_size > bounds.tiny) & (step_size < bounds.max)
        return in_range & ((prev_sign == 0) | (sign == prev_sign))

    # the loop scales first and probes after, so undo the final scaling
    step_size, sign, _, _ = while_loop(
        keep_going, probe, (jnp.asarray(init_step_size), 0, 0, rng_key)
    )
    return step_size / 2.0 ** sign


# ---------------------------------------------------------------------------
# Warmup schedule + scalar warmup adapter


def build_adaptation_schedule(num_steps):
    """Stan warmup windows as AdaptWindow pairs (parity:
    numpyro/infer/hmc_util.py:387-436); the window math itself lives in
    hmc_core.stan_windows."""
    return [AdaptWindow(*w) for w in stan_windows(num_steps)]


def _identity_mass(z, inverse_mass_matrix, dense_mass):
    """Initial mass structure; dict-of-blocks when dense_mass is a list
    (parity: numpyro/infer/hmc_util.py:439-515)."""
    if isinstance(dense_mass, list):
        sites = dict(z) if isinstance(z, dict) else {}
        given = inverse_mass_matrix if isinstance(inverse_mass_matrix, dict) else {}
        if inverse_mass_matrix is not None and not isinstance(
            inverse_mass_matrix, dict
        ):
            given = {tuple(sorted(sites)): inverse_mass_matrix}
        inv, msqrt, msqrt_inv = {}, {}, {}
        groups = list(dense_mass)
        leftover = tuple(
            sorted(set(sites) - {k for g in dense_mass for k in g})
        )
        if leftover:
            groups.append(leftover)
        for names in groups:
            is_dense = names in dense_mass
            block = {k: sites[k] for k in names}
            i, s, si = _identity_mass(block, given.get(tuple(names)), is_dense)
            inv[tuple(names)] = i
            msqrt[tuple(names)] = s
            msqrt_inv[tuple(names)] = si
        return inv, msqrt, msqrt_inv

    size = ravel_pytree(z)[0].size
    if inverse_mass_matrix is None:
        eye = jnp.eye(size) if dense_mass else jnp.ones(size)
        return eye, eye, eye
    mm = inverse_mass_matrix
    if dense_mass:
        if mm.ndim == 1:
            mm = jnp.diag(mm)
        rev = jnp.linalg.cholesky(mm[::-1, ::-1])[::-1, ::-1]
        sqrt_inv = rev.T
        sqrt = jax.scipy.linalg.solve_triangular(
            sqrt_inv, jnp.eye(size), lower=True
        )
    else:
        sqrt_inv = jnp.sqrt(mm)
        sqrt = 1.0 / sqrt_inv
    return mm, sqrt, sqrt_inv


def warmup_adapter(
    num_adapt_steps,
    find_reasonable_step_size=None,
    adapt_step_size=True,
    adapt_mass_matrix=True,
    dense_mass=False,
    target_accept_prob=0.8,
):
    """Scalar warmup adapter (init_fn, update_fn) used by non-HMC kernels
    (parity: numpyro/infer/hmc_util.py:518-707).  Window position is looked
    up in precomputed per-step masks instead of a window-index register."""
    refine = find_reasonable_step_size or identity
    da_reset, da_step = dual_averaging()
    wf_init, wf_step, wf_final = welford_covariance(diagonal=not dense_mass)

    import numpy as np

    # host numpy masks: converting eagerly would bake slow-to-compile
    # device constants into every program that closes over this adapter
    windows = stan_windows(num_adapt_steps) if num_adapt_steps > 0 else []
    n = max(num_adapt_steps, 1)
    middle = np.zeros(n, bool)
    window_end = np.zeros(n, bool)
    for j, (lo, hi) in enumerate(windows):
        if 0 < j < len(windows) - 1:
            middle[lo : hi + 1] = True
            window_end[hi] = True

    def _mm_sizes(inv):
        if isinstance(inv, dict):
            return {k: v.shape for k, v in inv.items()}
        return inv.shape

    def init_fn(
        z_info, rng_key, step_size=1.0, inverse_mass_matrix=None, mass_matrix_size=None
    ):
        rng_key, key_ss = random.split(rng_key)
        proto = (
            z_info[0]
            if isinstance(dense_mass, list) or mass_matrix_size is None
            else jnp.zeros(mass_matrix_size)
        )
        inv, msqrt, msqrt_inv = _identity_mass(
            proto, inverse_mass_matrix, dense_mass
        )
        if adapt_step_size:
            step_size = refine(step_size, inv, z_info, key_ss)
        return HMCAdaptState(
            step_size,
            inv,
            msqrt,
            msqrt_inv,
            da_reset(jnp.log(10 * step_size)),
            wf_init(_mm_sizes(inv)),
            jnp.zeros((), jnp.result_type(int)),
            rng_key,
        )

    def _close_window(z_info, key_ss, state):
        inv, msqrt, msqrt_inv = (
            state.inverse_mass_matrix,
            state.mass_matrix_sqrt,
            state.mass_matrix_sqrt_inv,
        )
        mm_state = state.mm_state
        if adapt_mass_matrix:
            inv, msqrt, msqrt_inv = wf_final(mm_state, regularize=True)
            mm_state = wf_init(_mm_sizes(inv))
        step_size, ss_state = state.step_size, state.ss_state
        if adapt_step_size:
            step_size = refine(step_size, inv, z_info, key_ss)
            ss_state = da_reset(jnp.log(10 * step_size))
        return state._replace(
            step_size=step_size,
            inverse_mass_matrix=inv,
            mass_matrix_sqrt=msqrt,
            mass_matrix_sqrt_inv=msqrt_inv,
            ss_state=ss_state,
            mm_state=mm_state,
        )

    def update_fn(t, accept_prob, z_info, state):
        key_ss = None
        if state.rng_key is not None:
            new_key, key_ss = random.split(state.rng_key)
            state = state._replace(rng_key=new_key)

        if adapt_step_size:
            ss_state = da_step(target_accept_prob - accept_prob, state.ss_state)
            log_ss = jnp.where(
                t == num_adapt_steps - 1, ss_state.x_avg, ss_state.x_t
            )
            fin = jnp.finfo(jnp.result_type(float))
            state = state._replace(
                step_size=jnp.clip(jnp.exp(log_ss), fin.tiny, fin.max),
                ss_state=ss_state,
            )

        idx = jnp.minimum(t, num_adapt_steps - 1) if num_adapt_steps else 0
        if adapt_mass_matrix and num_adapt_steps > 0:
            z = z_info[0]
            obs = z if isinstance(state.mm_state, dict) else ravel_pytree(z)[0]
            state = state._replace(
                mm_state=jax.lax.cond(
                    jnp.asarray(middle)[idx],
                    lambda s: wf_step(obs, s),
                    lambda s: s,
                    state.mm_state,
                )
            )
        if num_adapt_steps > 0:
            at_end = jnp.asarray(window_end)[idx]
            state = state._replace(window_idx=state.window_idx + at_end)
            state = jax.lax.cond(
                at_end,
                lambda s: _close_window(z_info, key_ss, s),
                lambda s: s,
                state,
            )
        return state

    return init_fn, update_fn


# ---------------------------------------------------------------------------
# Subposterior combination (embarrassingly-parallel MCMC)


def _stack_subposteriors(subposteriors):
    """list of {site: (N, ...)} dicts -> ((K, N, D) flat draws, unravel)."""
    one = jax.tree.map(lambda x: x[0], subposteriors[0])
    _, unravel = ravel_pytree(one)
    flat = jnp.stack(
        [jax.vmap(lambda s: ravel_pytree(s)[0])(sub) for sub in subposteriors]
    )
    return flat, unravel


def consensus(subposteriors, num_draws=None, diagonal=False, rng_key=None):
    """Weighted-average consensus merging (Scott et al.; parity:
    numpyro/infer/hmc_util.py:1226-1283)."""
    flat, unravel = _stack_subposteriors(subposteriors)
    if diagonal:
        weights = 1.0 / jnp.var(flat, axis=1, ddof=1)  # (K, D)
        normalized = weights / weights.sum(0)
        merged = jnp.einsum("knd,kd->nd", flat, normalized)
    else:
        covs = jax.vmap(lambda x: jnp.cov(x.T, bias=False))(flat)
        covs = covs.reshape(flat.shape[0], flat.shape[-1], flat.shape[-1])
        precisions = jnp.linalg.inv(covs)
        total = jnp.linalg.inv(precisions.sum(0))
        merged = jnp.einsum(
            "de,kef,knf->nd", total, precisions, flat
        )
    if num_draws is not None:
        if rng_key is None:
            rng_key = random.PRNGKey(0)
        pick = random.randint(rng_key, (num_draws,), 0, merged.shape[0])
        merged = merged[pick]
    return jax.vmap(unravel)(merged)


def parametric(subposteriors, diagonal=False):
    """Product-of-Gaussians merge: returns (mean, var-or-cov) (parity:
    numpyro/infer/hmc_util.py:1286-1321)."""
    flat, _ = _stack_subposteriors(subposteriors)
    means = flat.mean(1)  # (K, D)
    if diagonal:
        precisions = 1.0 / jnp.var(flat, axis=1, ddof=1)
        var = 1.0 / precisions.sum(0)
        mean = var * (precisions * means).sum(0)
        return mean, var
    covs = jax.vmap(lambda x: jnp.cov(x.T, bias=False))(flat)
    covs = covs.reshape(flat.shape[0], flat.shape[-1], flat.shape[-1])
    precisions = jnp.linalg.inv(covs)
    cov = jnp.linalg.inv(precisions.sum(0))
    mean = cov @ jnp.einsum("kde,ke->d", precisions, means)
    return mean, cov


def parametric_draws(subposteriors, num_draws, diagonal=False, rng_key=None):
    """Sample from the parametric() Gaussian merge (parity:
    numpyro/infer/hmc_util.py:1324-1349)."""
    if rng_key is None:
        rng_key = random.PRNGKey(0)
    one = jax.tree.map(lambda x: x[0], subposteriors[0])
    _, unravel = ravel_pytree(one)
    mean, scale = parametric(subposteriors, diagonal=diagonal)
    if diagonal:
        draws = mean + jnp.sqrt(scale) * random.normal(
            rng_key, (num_draws,) + mean.shape
        )
    else:
        draws = random.multivariate_normal(rng_key, mean, scale, (num_draws,))
    return jax.vmap(unravel)(draws)
