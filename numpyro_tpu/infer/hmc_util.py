"""HMC/NUTS numerical core: integrator, warmup adaptation, iterative tree
building, subposterior merging.

Fresh implementation of the algorithms behind numpyro/infer/hmc_util.py:
- Nesterov dual averaging for step-size adaptation
- Welford online (co)variance for mass-matrix adaptation (supports
  block-structured dicts of sites)
- Stan warmup window schedule (75 / 25·2^k / 50)
- velocity-Verlet leapfrog
- **iterative NUTS** tree doubling as bounded `lax.while_loop`s with
  O(max_tree_depth) momentum checkpoint arrays and bit-trick U-turn checks
  (the XLA-compilable design of arXiv:1912.11554) — every array op here is
  shape-static so the whole sampler vmaps over a (num_chains,) axis into one
  fused TPU program.

All public entry points mirror the reference signatures so the test suite
can assert parity (cited per function).
"""

from __future__ import annotations

from collections import namedtuple

import jax
import jax.numpy as jnp
from jax import grad, random, value_and_grad, vmap
from jax.flatten_util import ravel_pytree
from jax.scipy.special import expit

from numpyro_tpu.distributions.util import cholesky_of_inverse
from numpyro_tpu.util import cond, fori_loop, identity, while_loop

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

TreeState = namedtuple(
    "TreeState",
    [
        "z_left",
        "r_left",
        "z_left_grad",
        "z_right",
        "r_right",
        "z_right_grad",
        "z_proposal",
        "z_proposal_pe",
        "z_proposal_grad",
        "z_proposal_energy",
        "depth",
        "weight",
        "r_sum",
        "turning",
        "diverging",
        "sum_accept_probs",
        "num_proposals",
    ],
)

DualAveragingState = namedtuple(
    "DualAveragingState", ["x_t", "x_avg", "g_avg", "t", "prox_center"]
)
WelfordCovarianceState = namedtuple(
    "WelfordCovarianceState", ["mean", "m2", "n"]
)


def dual_averaging(t0=10, kappa=0.75, gamma=0.05):
    """Nesterov (2009) dual averaging, used for log-step-size adaptation
    (reference: hmc_util.py:60-130).  Returns (init_fn, update_fn); all state
    arithmetic is scalar-per-chain so it vmaps freely.
    """

    def init_fn(prox_center=0.0):
        x_t = jnp.zeros(jnp.shape(prox_center))
        x_avg = jnp.zeros(jnp.shape(prox_center))
        g_avg = jnp.zeros(jnp.shape(prox_center))
        t = jnp.array(0, dtype=jnp.result_type(int))
        return DualAveragingState(x_t, x_avg, g_avg, t, prox_center)

    def update_fn(g, state):
        x_t, x_avg, g_avg, t, prox_center = state
        t = t + 1
        g_avg = (1 - 1 / (t + t0)) * g_avg + g / (t + t0)
        x_t = prox_center - (t**0.5) / gamma * g_avg
        weight_t = t ** (-kappa)
        x_avg = (1 - weight_t) * x_avg + weight_t * x_t
        return DualAveragingState(x_t, x_avg, g_avg, t, prox_center)

    return init_fn, update_fn


def welford_covariance(diagonal=True):
    """Welford's online (co)variance over leapfrog positions (reference:
    hmc_util.py:133-239).  Handles flat vectors and dicts of flat vectors
    (block-structured mass matrices)."""

    def init_fn(size):
        if isinstance(size, dict):
            state = {}
            for site_names, size_block in size.items():
                state[site_names] = init_fn(size_block)
            return state

        if isinstance(size, int):
            shape = (size,) if diagonal else (size, size)
        else:
            shape = size

        mean = jnp.zeros(shape[-1])
        m2 = jnp.zeros(shape)
        n = jnp.zeros(())
        return WelfordCovarianceState(mean, m2, n)

    def update_fn(sample, state):
        if isinstance(state, dict):
            assert isinstance(sample, dict)
            new_state = {}
            for site_names, state_block in state.items():
                sample_block = tuple(sample[k] for k in site_names)
                sample_flat = jnp.concatenate(
                    [s.reshape(-1) for s in sample_block]
                )
                new_state[site_names] = update_fn(sample_flat, state_block)
            return new_state

        mean, m2, n = state
        n = n + 1
        delta_pre = sample - mean
        mean = mean + delta_pre / n
        delta_post = sample - mean
        if jnp.ndim(m2) == 1:
            m2 = m2 + delta_pre * delta_post
        else:
            m2 = m2 + jnp.outer(delta_post, delta_pre)
        return WelfordCovarianceState(mean, m2, n)

    def final_fn(state, regularize=False):
        if isinstance(state, dict):
            cov, cov_inv_sqrt, tril_inv = {}, {}, {}
            for site_names, state_block in state.items():
                cov_block, cov_inv_sqrt_block, tril_inv_block = final_fn(
                    state_block, regularize=regularize
                )
                cov[site_names] = cov_block
                cov_inv_sqrt[site_names] = cov_inv_sqrt_block
                tril_inv[site_names] = tril_inv_block
            return cov, cov_inv_sqrt, tril_inv

        mean, m2, n = state
        cov = m2 / jnp.clip(n - 1, 1)
        if regularize:
            # Stan regularization: shrink towards identity
            scaled_cov = (n / (n + 5)) * cov
            shrinkage = 1e-3 * (5 / (n + 5))
            if jnp.ndim(scaled_cov) == 1:
                cov = scaled_cov + shrinkage
            else:
                cov = scaled_cov + shrinkage * jnp.identity(mean.shape[0])
        if jnp.ndim(cov) == 2:
            # inv(L) of the Cholesky L of cov: whitening matrix
            cov_inv_sqrt = cholesky_of_inverse(cov)
            identity_mat = jnp.identity(cov.shape[-1])
            tril_inv = jax.scipy.linalg.solve_triangular(
                jnp.linalg.cholesky(cov), identity_mat, lower=True
            )
        else:
            tril_inv = jnp.sqrt(1 / cov)
            cov_inv_sqrt = tril_inv
        return cov, cov_inv_sqrt, tril_inv

    return init_fn, update_fn, final_fn


def _kinetic_grad(inverse_mass_matrix, r):
    """∂K/∂r = M^{-1} r, supporting diag / dense / dict-blocked M^{-1}."""
    if isinstance(inverse_mass_matrix, dict):
        grads = {}
        for site_names, mm in inverse_mass_matrix.items():
            r_block = {k: r[k] for k in site_names}
            r_flat, unravel = ravel_pytree(r_block)
            if jnp.ndim(mm) == 1:
                g_flat = mm * r_flat
            else:
                g_flat = jnp.matmul(mm, r_flat)
            grads.update(unravel(g_flat))
        return grads

    r_flat, unravel = ravel_pytree(r)
    if jnp.ndim(inverse_mass_matrix) == 1:
        g_flat = inverse_mass_matrix * r_flat
    else:
        g_flat = jnp.matmul(inverse_mass_matrix, r_flat)
    return unravel(g_flat)


def euclidean_kinetic_energy(inverse_mass_matrix, r):
    """K(r) = r^T M^{-1} r / 2."""
    if isinstance(inverse_mass_matrix, dict):
        ke = jnp.zeros(())
        for site_names, mm in inverse_mass_matrix.items():
            r_block = {k: r[k] for k in site_names}
            r_flat, _ = ravel_pytree(r_block)
            if jnp.ndim(mm) == 1:
                v = mm * r_flat
            else:
                v = jnp.matmul(mm, r_flat)
            ke = ke + 0.5 * jnp.dot(v, r_flat)
        return ke

    r_flat, _ = ravel_pytree(r)
    if jnp.ndim(inverse_mass_matrix) == 1:
        v = inverse_mass_matrix * r_flat
    else:
        v = jnp.matmul(inverse_mass_matrix, r_flat)
    return 0.5 * jnp.dot(v, r_flat)


euclidean_kinetic_energy._kinetic_grad = _kinetic_grad


def velocity_verlet(potential_fn, kinetic_fn, forward_mode_differentiation=False):
    r"""Leapfrog integrator: r½ → z → r (reference: hmc_util.py:242-311).

    The innermost hot path of the engine — each call is one model
    log-density + gradient, fully fused by XLA; a depth-10 NUTS step runs up
    to 1023 of these inside one while_loop program.
    """
    compute_value_grad = (
        _value_and_jacfwd if forward_mode_differentiation else value_and_grad
    )

    def init_fn(z, r, potential_energy=None, z_grad=None):
        if potential_energy is None or z_grad is None:
            potential_energy, z_grad = compute_value_grad(potential_fn)(z)
        return IntegratorState(z, r, potential_energy, z_grad)

    def update_fn(step_size, inverse_mass_matrix, state):
        z, r, _, z_grad = state
        r = jax.tree.map(
            lambda r_i, g_i: r_i - 0.5 * step_size * g_i, r, z_grad
        )  # r(n+1/2)
        kinetic_grad = getattr(kinetic_fn, "_kinetic_grad", None)
        if kinetic_grad is not None:
            r_grad = kinetic_grad(inverse_mass_matrix, r)
        else:
            r_grad = grad(kinetic_fn, argnums=1)(inverse_mass_matrix, r)
        z = jax.tree.map(lambda z_i, rg_i: z_i + step_size * rg_i, z, r_grad)
        potential_energy, z_grad = compute_value_grad(potential_fn)(z)
        r = jax.tree.map(
            lambda r_i, g_i: r_i - 0.5 * step_size * g_i, r, z_grad
        )  # r(n+1)
        return IntegratorState(z, r, potential_energy, z_grad)

    return init_fn, update_fn


def _value_and_jacfwd(fn):
    def wrapped(x):
        value = fn(x)
        jac = jax.jacfwd(fn)(x)
        return value, jac

    return wrapped


def find_reasonable_step_size(
    potential_fn,
    kinetic_fn,
    momentum_generator,
    init_step_size,
    inverse_mass_matrix,
    z_info,
    rng_key,
):
    """Doubling/halving search for a step size with accept prob ≈ 0.8
    (reference: hmc_util.py:314-384).  Implemented as a bounded while_loop so
    it stays inside the compiled warmup program."""
    target_accept_prob = jnp.log(0.8)

    _, vv_update = velocity_verlet(potential_fn, kinetic_fn)
    z, _, potential_energy, z_grad = z_info
    finfo = jnp.finfo(jnp.result_type(init_step_size))

    def _body_fn(state):
        step_size, _, direction, rng_key = state
        rng_key, rng_key_momentum = random.split(rng_key)
        # scale step size by 2 (direction=1) or 0.5 (direction=-1)
        step_size = (2.0**direction) * step_size
        r = momentum_generator(z, inverse_mass_matrix, rng_key_momentum)
        _, r_new, potential_energy_new, _ = vv_update(
            step_size, inverse_mass_matrix, (z, r, potential_energy, z_grad)
        )
        energy_current = kinetic_fn(inverse_mass_matrix, r) + potential_energy
        energy_new = (
            kinetic_fn(inverse_mass_matrix, r_new) + potential_energy_new
        )
        delta_energy = energy_new - energy_current
        direction_new = jnp.where(target_accept_prob < -delta_energy, 1, -1)
        return step_size, direction, direction_new, rng_key

    def _cond_fn(state):
        step_size, last_direction, direction, _ = state
        # condition to run only if step_size is not too small or we are
        # still moving in the same direction
        not_extreme = (step_size < finfo.max) & (step_size > finfo.tiny)
        return not_extreme & (
            (last_direction == 0) | (direction == last_direction)
        )

    step_size, _, _, _ = while_loop(
        _cond_fn, _body_fn, (init_step_size, 0, 0, rng_key)
    )
    return step_size


def build_adaptation_schedule(num_steps):
    """Stan-style warmup windows: 75 start / 25·2^k doubling / 50 end
    (reference: hmc_util.py:387-436)."""
    adaptation_schedule = []
    # from Stan, for small num_steps
    if num_steps < 20:
        adaptation_schedule.append(AdaptWindow(0, num_steps - 1))
        return adaptation_schedule

    # We separate num_steps into windows:
    #   start_buffer + window 1 + window 2 + window 3 + ... + end_buffer
    start_buffer_size = 75
    end_buffer_size = 50
    init_window_size = 25
    if (start_buffer_size + end_buffer_size + init_window_size) > num_steps:
        start_buffer_size = int(0.15 * num_steps)
        end_buffer_size = int(0.1 * num_steps)
        init_window_size = num_steps - start_buffer_size - end_buffer_size

    adaptation_schedule.append(AdaptWindow(start=0, end=start_buffer_size - 1))
    end_window_start = num_steps - end_buffer_size

    next_window_size = init_window_size
    next_window_start = start_buffer_size
    while next_window_start < end_window_start:
        cur_window_start, cur_window_size = next_window_start, next_window_size
        # Ensure that slow adaptation windows are monotonically increasing
        if 3 * cur_window_size <= end_window_start - cur_window_start:
            next_window_size = 2 * cur_window_size
        else:
            cur_window_size = end_window_start - cur_window_start
        next_window_start = cur_window_start + cur_window_size
        adaptation_schedule.append(
            AdaptWindow(cur_window_start, next_window_start - 1)
        )
    adaptation_schedule.append(AdaptWindow(end_window_start, num_steps - 1))
    return adaptation_schedule


def _initialize_mass_matrix(z, inverse_mass_matrix, dense_mass):
    """Initial M^{-1} / sqrt decompositions; supports dict-blocked structure
    (reference: hmc_util.py:439-515)."""
    if isinstance(dense_mass, list):
        if inverse_mass_matrix is None:
            inverse_mass_matrix = {}
        # if user specifies an ndarray mass matrix, then we convert it to a dict
        elif not isinstance(inverse_mass_matrix, dict):
            inverse_mass_matrix = {tuple(sorted(z)): inverse_mass_matrix}
        mass_matrix_sqrt = {}
        mass_matrix_sqrt_inv = {}
        for site_names in dense_mass:
            inverse_mm = inverse_mass_matrix.get(site_names)
            z_block = tuple(z[k] for k in site_names)
            inverse_mm, mm_sqrt, mm_sqrt_inv = _initialize_mass_matrix(
                z_block, inverse_mm, True
            )
            inverse_mass_matrix[site_names] = inverse_mm
            mass_matrix_sqrt[site_names] = mm_sqrt
            mass_matrix_sqrt_inv[site_names] = mm_sqrt_inv
        # other sites get diagonal mass
        remaining_sites = tuple(sorted(set(z) - set().union(*dense_mass))) if dense_mass else tuple(sorted(z))
        if len(remaining_sites) > 0:
            z_block = tuple(z[k] for k in remaining_sites)
            inverse_mm = inverse_mass_matrix.get(remaining_sites)
            inverse_mm, mm_sqrt, mm_sqrt_inv = _initialize_mass_matrix(
                z_block, inverse_mm, False
            )
            inverse_mass_matrix[remaining_sites] = inverse_mm
            mass_matrix_sqrt[remaining_sites] = mm_sqrt
            mass_matrix_sqrt_inv[remaining_sites] = mm_sqrt_inv
        expected_site_names = sorted(z)
        actual_site_names = sorted(
            [k for site_names in inverse_mass_matrix for k in site_names]
        )
        assert actual_site_names == expected_site_names, (
            "There seems to be a conflict of sites names specified in the initial"
            " `inverse_mass_matrix` and in `dense_mass` argument."
        )
        return inverse_mass_matrix, mass_matrix_sqrt, mass_matrix_sqrt_inv

    mass_matrix_size = jnp.size(ravel_pytree(z)[0])
    if inverse_mass_matrix is None:
        if dense_mass:
            inverse_mass_matrix = jnp.identity(mass_matrix_size)
        else:
            inverse_mass_matrix = jnp.ones(mass_matrix_size)
        mass_matrix_sqrt = mass_matrix_sqrt_inv = inverse_mass_matrix
    else:
        if dense_mass:
            if jnp.ndim(inverse_mass_matrix) == 1:
                inverse_mass_matrix = jnp.diag(inverse_mass_matrix)
            mass_matrix_sqrt_inv = jnp.swapaxes(
                jnp.linalg.cholesky(inverse_mass_matrix[..., ::-1, ::-1])[
                    ..., ::-1, ::-1
                ],
                -2,
                -1,
            )
            identity_mat = jnp.identity(inverse_mass_matrix.shape[-1])
            mass_matrix_sqrt = jax.scipy.linalg.solve_triangular(
                mass_matrix_sqrt_inv, identity_mat, lower=True
            )
        else:
            assert jnp.ndim(inverse_mass_matrix) == 1
            mass_matrix_sqrt_inv = jnp.sqrt(inverse_mass_matrix)
            mass_matrix_sqrt = 1.0 / mass_matrix_sqrt_inv
    return inverse_mass_matrix, mass_matrix_sqrt, mass_matrix_sqrt_inv


def warmup_adapter(
    num_adapt_steps,
    find_reasonable_step_size=None,
    adapt_step_size=True,
    adapt_mass_matrix=True,
    dense_mass=False,
    target_accept_prob=0.8,
):
    """Stan-style warmup: dual averaging within every step, Welford mass
    accumulation within slow windows, mass finalization + step-size re-find
    at window ends (reference: hmc_util.py:518-707)."""
    if find_reasonable_step_size is None:
        find_reasonable_step_size = identity
    ss_init, ss_update = dual_averaging()
    mm_init, mm_update, mm_final = welford_covariance(diagonal=not dense_mass)
    adaptation_schedule = jnp.array(build_adaptation_schedule(num_adapt_steps))
    num_windows = len(adaptation_schedule)

    def init_fn(
        z_info,
        rng_key,
        step_size=1.0,
        inverse_mass_matrix=None,
        mass_matrix_size=None,
    ):
        rng_key, rng_key_ss = random.split(rng_key)
        if isinstance(dense_mass, list) or mass_matrix_size is None:
            z_proto = z_info[0]
        else:
            z_proto = jnp.zeros(mass_matrix_size)
        (
            inverse_mass_matrix,
            mass_matrix_sqrt,
            mass_matrix_sqrt_inv,
        ) = _initialize_mass_matrix(z_proto, inverse_mass_matrix, dense_mass)

        if adapt_step_size:
            step_size = find_reasonable_step_size(
                step_size, inverse_mass_matrix, z_info, rng_key_ss
            )
        ss_state = ss_init(jnp.log(10 * step_size))

        if isinstance(inverse_mass_matrix, dict):
            size = {k: v.shape for k, v in inverse_mass_matrix.items()}
        else:
            size = inverse_mass_matrix.shape

        mm_state = mm_init(size)

        window_idx = jnp.array(0, dtype=jnp.result_type(int))
        return HMCAdaptState(
            step_size,
            inverse_mass_matrix,
            mass_matrix_sqrt,
            mass_matrix_sqrt_inv,
            ss_state,
            mm_state,
            window_idx,
            rng_key,
        )

    def _update_at_window_end(z_info, rng_key_ss, state):
        (
            step_size,
            inverse_mass_matrix,
            mass_matrix_sqrt,
            mass_matrix_sqrt_inv,
            ss_state,
            mm_state,
            window_idx,
            rng_key,
        ) = state

        if adapt_mass_matrix:
            inverse_mass_matrix, mass_matrix_sqrt, mass_matrix_sqrt_inv = mm_final(
                mm_state, regularize=True
            )
            if isinstance(inverse_mass_matrix, dict):
                size = {k: v.shape for k, v in inverse_mass_matrix.items()}
            else:
                size = inverse_mass_matrix.shape
            mm_state = mm_init(size)

        if adapt_step_size:
            step_size = find_reasonable_step_size(
                step_size, inverse_mass_matrix, z_info, rng_key_ss
            )
            ss_state = ss_init(jnp.log(10 * step_size))

        return HMCAdaptState(
            step_size,
            inverse_mass_matrix,
            mass_matrix_sqrt,
            mass_matrix_sqrt_inv,
            ss_state,
            mm_state,
            window_idx,
            rng_key,
        )

    def update_fn(t, accept_prob, z_info, state):
        (
            step_size,
            inverse_mass_matrix,
            mass_matrix_sqrt,
            mass_matrix_sqrt_inv,
            ss_state,
            mm_state,
            window_idx,
            rng_key,
        ) = state
        if rng_key is not None:
            rng_key, rng_key_ss = random.split(rng_key)
        else:
            rng_key_ss = None

        # update step size state
        if adapt_step_size:
            ss_state = ss_update(target_accept_prob - accept_prob, ss_state)
            # note: at the end of warmup phase, use average of log step_size
            log_step_size, log_step_size_avg, *_ = ss_state
            step_size = jnp.where(
                t == (num_adapt_steps - 1),
                jnp.exp(log_step_size_avg),
                jnp.exp(log_step_size),
            )
            # account the the case log_step_size is an extreme number
            finfo = jnp.finfo(jnp.result_type(step_size))
            step_size = jnp.clip(step_size, finfo.tiny, finfo.max)

        # update mass matrix state
        is_middle_window = (0 < window_idx) & (window_idx < (num_windows - 1))
        if adapt_mass_matrix:
            z = z_info[0]
            z_sample = z if isinstance(mm_state, dict) else ravel_pytree(z)[0]
            mm_state = jax.lax.cond(
                is_middle_window,
                lambda args: mm_update(*args),
                lambda args: args[1],
                (z_sample, mm_state),
            )

        t_at_window_end = t == adaptation_schedule[window_idx, 1]
        window_idx = jnp.where(t_at_window_end, window_idx + 1, window_idx)
        state = HMCAdaptState(
            step_size,
            inverse_mass_matrix,
            mass_matrix_sqrt,
            mass_matrix_sqrt_inv,
            ss_state,
            mm_state,
            window_idx,
            rng_key,
        )
        state = jax.lax.cond(
            t_at_window_end & is_middle_window,
            lambda args: _update_at_window_end(*args),
            lambda args: args[2],
            (z_info, rng_key_ss, state),
        )
        return state

    return init_fn, update_fn


def _is_turning(inverse_mass_matrix, r_left, r_right, r_sum):
    """Generalized U-turn criterion on the momentum sum (Betancourt)."""
    r_left_flat, _ = ravel_pytree(r_left)
    r_right_flat, _ = ravel_pytree(r_right)
    r_sum_flat, _ = ravel_pytree(r_sum)

    if isinstance(inverse_mass_matrix, dict):
        v_left = ravel_pytree(_kinetic_grad(inverse_mass_matrix, r_left))[0]
        v_right = ravel_pytree(_kinetic_grad(inverse_mass_matrix, r_right))[0]
    elif jnp.ndim(inverse_mass_matrix) == 2:
        v_left = jnp.matmul(inverse_mass_matrix, r_left_flat)
        v_right = jnp.matmul(inverse_mass_matrix, r_right_flat)
    else:
        v_left = inverse_mass_matrix * r_left_flat
        v_right = inverse_mass_matrix * r_right_flat

    # This implements dynamic termination criterion (ref [2], section A.4.2).
    r_sum_flat = r_sum_flat - (r_left_flat + r_right_flat) / 2
    turning_at_left = jnp.dot(v_left, r_sum_flat) <= 0
    turning_at_right = jnp.dot(v_right, r_sum_flat) <= 0
    return turning_at_left | turning_at_right


def _uniform_transition_kernel(current_tree, new_tree):
    # multinomial progressive sampling: P(new) = W_new / (W_cur + W_new)
    return expit(new_tree.weight - current_tree.weight)


def _biased_transition_kernel(current_tree, new_tree):
    # biased progressive sampling (Betancourt 2017, A.3.2)
    transition_prob = jnp.exp(new_tree.weight - current_tree.weight)
    transition_prob = jnp.where(
        new_tree.turning | new_tree.diverging, 0.0, jnp.clip(transition_prob, None, 1.0)
    )
    return transition_prob


def _combine_tree(
    current_tree, new_tree, inverse_mass_matrix, going_right, rng_key, biased_transition
):
    # Now we combine the current tree and the new tree. Note that outside
    # leaves of the combined tree are determined by the direction.
    z_left, r_left, z_left_grad, z_right, r_right, z_right_grad = jax.lax.cond(
        going_right,
        lambda trees: (
            trees[0].z_left,
            trees[0].r_left,
            trees[0].z_left_grad,
            trees[1].z_right,
            trees[1].r_right,
            trees[1].z_right_grad,
        ),
        lambda trees: (
            trees[1].z_left,
            trees[1].r_left,
            trees[1].z_left_grad,
            trees[0].z_right,
            trees[0].r_right,
            trees[0].z_right_grad,
        ),
        (current_tree, new_tree),
    )
    r_sum = jax.tree.map(jnp.add, current_tree.r_sum, new_tree.r_sum)

    if biased_transition:
        transition_prob = _biased_transition_kernel(current_tree, new_tree)
        turning = new_tree.turning | _is_turning(
            inverse_mass_matrix, r_left, r_right, r_sum
        )
    else:
        transition_prob = _uniform_transition_kernel(current_tree, new_tree)
        turning = new_tree.turning

    transition = random.bernoulli(rng_key, transition_prob)
    z_proposal, z_proposal_pe, z_proposal_grad, z_proposal_energy = jax.lax.cond(
        transition,
        lambda trees: (
            trees[1].z_proposal,
            trees[1].z_proposal_pe,
            trees[1].z_proposal_grad,
            trees[1].z_proposal_energy,
        ),
        lambda trees: (
            trees[0].z_proposal,
            trees[0].z_proposal_pe,
            trees[0].z_proposal_grad,
            trees[0].z_proposal_energy,
        ),
        (current_tree, new_tree),
    )

    tree_depth = current_tree.depth + 1
    tree_weight = jnp.logaddexp(current_tree.weight, new_tree.weight)
    diverging = new_tree.diverging

    sum_accept_probs = current_tree.sum_accept_probs + new_tree.sum_accept_probs
    num_proposals = current_tree.num_proposals + new_tree.num_proposals

    return TreeState(
        z_left,
        r_left,
        z_left_grad,
        z_right,
        r_right,
        z_right_grad,
        z_proposal,
        z_proposal_pe,
        z_proposal_grad,
        z_proposal_energy,
        tree_depth,
        tree_weight,
        r_sum,
        turning,
        diverging,
        sum_accept_probs,
        num_proposals,
    )


def _build_basetree(
    vv_update,
    kinetic_fn,
    z,
    r,
    z_grad,
    inverse_mass_matrix,
    step_size,
    going_right,
    energy_current,
    max_delta_energy,
):
    step_size = jnp.where(going_right, step_size, -step_size)
    z_new, r_new, potential_energy_new, z_new_grad = vv_update(
        step_size, inverse_mass_matrix, (z, r, energy_current, z_grad)
    )

    energy_new = potential_energy_new + kinetic_fn(inverse_mass_matrix, r_new)
    delta_energy = energy_new - energy_current
    # Handles the NaN case.
    delta_energy = jnp.where(jnp.isnan(delta_energy), jnp.inf, delta_energy)
    tree_weight = -delta_energy

    diverging = delta_energy > max_delta_energy
    accept_prob = jnp.clip(jnp.exp(-delta_energy), None, 1.0)
    return TreeState(
        z_new,
        r_new,
        z_new_grad,
        z_new,
        r_new,
        z_new_grad,
        z_new,
        potential_energy_new,
        z_new_grad,
        energy_new,
        jnp.array(0, dtype=jnp.result_type(int)),
        tree_weight,
        r_new,
        jnp.array(False),
        diverging,
        accept_prob,
        jnp.array(1, dtype=jnp.result_type(int)),
    )


def _get_leaf(tree, going_right):
    return jax.lax.cond(
        going_right,
        lambda t: (t.z_right, t.r_right, t.z_right_grad),
        lambda t: (t.z_left, t.r_left, t.z_left_grad),
        tree,
    )


def _leaf_idx_to_ckpt_idxs(n):
    """Bit-trick indices of the checkpoint slots for leaf ``n`` (reference:
    hmc_util.py:941-958, arXiv:1912.11554)."""
    # computes the number of non-zero bits except the last bit
    # e.g. 6 -> 2, 7 -> 2, 13 -> 2
    _, idx_max = while_loop(
        lambda nc: nc[0] > 0,
        lambda nc: (nc[0] >> 1, nc[1] + (nc[0] & 1)),
        (n >> 1, 0),
    )
    # computes the number of contiguous last non-zero bits
    # e.g. 6 -> 0, 7 -> 3, 13 -> 1
    _, num_subtrees = while_loop(
        lambda nc: (nc[0] & 1) != 0,
        lambda nc: (nc[0] >> 1, nc[1] + 1),
        (n, 0),
    )
    idx_min = idx_max - num_subtrees + 1
    return idx_min, idx_max


def _is_iterative_turning(
    inverse_mass_matrix, r, r_sum, r_ckpts, r_sum_ckpts, idx_min, idx_max, unravel_fn
):
    """Check U-turns against all O(log n) checkpointed subtree boundaries."""

    def _body_fn(state):
        i, _ = state
        # momentum sum over the subtree spanned from checkpoint i's leaf to
        # the current leaf: cumulative sums differ by everything before the
        # checkpoint's leaf, which itself must stay included
        subtree_r_sum = r_sum_flat - r_sum_ckpts[i] + r_ckpts[i]
        return i - 1, _is_turning(
            inverse_mass_matrix,
            unravel_fn(r_ckpts[i]),
            unravel_fn(r_flat),
            unravel_fn(subtree_r_sum),
        )

    r_flat, _ = ravel_pytree(r)
    r_sum_flat, _ = ravel_pytree(r_sum)
    _, turning = while_loop(
        lambda it: (it[0] >= idx_min) & ~it[1],
        _body_fn,
        (idx_max, False),
    )
    return turning


def _double_tree(
    current_tree,
    vv_update,
    kinetic_fn,
    inverse_mass_matrix,
    step_size,
    going_right,
    rng_key,
    energy_current,
    max_delta_energy,
    r_ckpts,
    r_sum_ckpts,
):
    key, transition_key = random.split(rng_key)

    new_tree = _iterative_build_subtree(
        current_tree,
        vv_update,
        kinetic_fn,
        inverse_mass_matrix,
        step_size,
        going_right,
        key,
        energy_current,
        max_delta_energy,
        r_ckpts,
        r_sum_ckpts,
    )

    return _combine_tree(
        current_tree, new_tree, inverse_mass_matrix, going_right, transition_key, True
    )


def _iterative_build_subtree(
    prototype_tree,
    vv_update,
    kinetic_fn,
    inverse_mass_matrix,
    step_size,
    going_right,
    rng_key,
    energy_current,
    max_delta_energy,
    r_ckpts,
    r_sum_ckpts,
):
    max_num_proposals = 2**prototype_tree.depth

    def _cond_fn(state):
        tree, turning, _, _, _ = state
        return (tree.num_proposals < max_num_proposals) & ~turning & ~tree.diverging

    def _body_fn(state):
        current_tree, _, r_ckpts, r_sum_ckpts, rng_key = state
        rng_key, transition_rng_key = random.split(rng_key)
        # If we are going to the right, start from the right leaf of the
        # current tree.
        z, r, z_grad = _get_leaf(current_tree, going_right)
        new_leaf = _build_basetree(
            vv_update,
            kinetic_fn,
            z,
            r,
            z_grad,
            inverse_mass_matrix,
            step_size,
            going_right,
            energy_current,
            max_delta_energy,
        )
        new_tree = jax.lax.cond(
            current_tree.num_proposals == 0,
            lambda x: x[1],
            lambda x: _combine_tree(
                x[0], x[1], inverse_mass_matrix, going_right, transition_rng_key, False
            ),
            (current_tree, new_leaf),
        )

        leaf_idx = current_tree.num_proposals
        # NB: in the special case leaf_idx=0, ckpt_idx_min=1 > ckpt_idx_max=0,
        # the turning check is skipped and we store the checkpoint instead
        ckpt_idx_min, ckpt_idx_max = _leaf_idx_to_ckpt_idxs(leaf_idx)
        r, unravel_fn = ravel_pytree(new_leaf.r_right)
        r_sum, _ = ravel_pytree(new_tree.r_sum)
        # we update checkpoints when leaf_idx is even
        r_ckpts, r_sum_ckpts = jax.lax.cond(
            leaf_idx % 2 == 0,
            lambda x: (
                x[0].at[ckpt_idx_max].set(r),
                x[1].at[ckpt_idx_max].set(r_sum),
            ),
            lambda x: x,
            (r_ckpts, r_sum_ckpts),
        )

        turning = _is_iterative_turning(
            inverse_mass_matrix,
            new_leaf.r_right,
            new_tree.r_sum,
            r_ckpts,
            r_sum_ckpts,
            ckpt_idx_min,
            ckpt_idx_max,
            unravel_fn,
        )
        return new_tree, turning, r_ckpts, r_sum_ckpts, rng_key

    basetree = prototype_tree._replace(
        num_proposals=jnp.array(0, dtype=jnp.result_type(int)),
        sum_accept_probs=jnp.zeros(()),
        diverging=jnp.array(False),
        weight=-jnp.inf,
    )

    tree, turning, _, _, _ = while_loop(
        _cond_fn,
        _body_fn,
        (basetree, jnp.array(False), r_ckpts, r_sum_ckpts, rng_key),
    )
    # update depth and turning condition
    return TreeState(
        tree.z_left,
        tree.r_left,
        tree.z_left_grad,
        tree.z_right,
        tree.r_right,
        tree.z_right_grad,
        tree.z_proposal,
        tree.z_proposal_pe,
        tree.z_proposal_grad,
        tree.z_proposal_energy,
        prototype_tree.depth,
        tree.weight,
        tree.r_sum,
        turning,
        tree.diverging,
        tree.sum_accept_probs,
        tree.num_proposals,
    )


def build_tree(
    verlet_update,
    kinetic_fn,
    verlet_state,
    inverse_mass_matrix,
    step_size,
    rng_key,
    max_delta_energy=1000.0,
    max_tree_depth=10,
):
    """Iterative NUTS doubling (reference: hmc_util.py:1088-1180).

    Shape-static: checkpoint arrays are (max_tree_depth, D); the doubling
    loop is a bounded while_loop.  vmapping this over chains yields one fused
    program where every chain runs until all chains' trees terminate — the
    chain-massive batching strategy.
    """
    if isinstance(max_tree_depth, tuple):
        max_tree_depth_current, max_tree_depth = max_tree_depth
    else:
        max_tree_depth_current = max_tree_depth
    z, r, potential_energy, z_grad = verlet_state
    energy_current = potential_energy + kinetic_fn(inverse_mass_matrix, r)
    latent_size = jnp.size(ravel_pytree(r)[0])
    r_ckpts = jnp.zeros((max_tree_depth, latent_size))
    r_sum_ckpts = jnp.zeros((max_tree_depth, latent_size))

    tree = TreeState(
        z,
        r,
        z_grad,
        z,
        r,
        z_grad,
        z,
        potential_energy,
        z_grad,
        energy_current,
        jnp.array(0, dtype=jnp.result_type(int)),
        jnp.zeros(()),
        r,
        jnp.array(False),
        jnp.array(False),
        jnp.zeros(()),
        jnp.array(0, dtype=jnp.result_type(int)),
    )

    def _cond_fn(state):
        tree, _ = state
        return (
            (tree.depth < max_tree_depth_current) & ~tree.turning & ~tree.diverging
        )

    def _body_fn(state):
        tree, key = state
        key, direction_key, doubling_key = random.split(key, 3)
        going_right = random.bernoulli(direction_key)
        tree = _double_tree(
            tree,
            verlet_update,
            kinetic_fn,
            inverse_mass_matrix,
            step_size,
            going_right,
            doubling_key,
            energy_current,
            max_delta_energy,
            r_ckpts,
            r_sum_ckpts,
        )
        return tree, key

    state = (tree, rng_key)
    tree, _ = while_loop(_cond_fn, _body_fn, state)
    return tree


# ---------------------------------------------------------------------------
# Subposterior merging (embarrassingly-parallel MCMC)
# ---------------------------------------------------------------------------


def consensus(subposteriors, num_draws=None, diagonal=False, rng_key=None):
    """Weighted-average merging of subposteriors (reference:
    hmc_util.py:1226-1283)."""
    # stack subposteriors
    joined_subposteriors = jax.tree.map(
        lambda *args: jnp.stack(args), *subposteriors
    )
    # shape of joined_subposteriors: n_subs x n_samples x sample_shape
    joined_subposteriors = vmap(vmap(lambda sample: ravel_pytree(sample)[0]))(
        joined_subposteriors
    )

    if num_draws is not None:
        rng_key = random.PRNGKey(0) if rng_key is None else rng_key
        # randomly gets num_draws from subposteriors
        n_subs = len(subposteriors)
        n_samples = jax.tree.flatten(subposteriors[0])[0][0].shape[0]
        # shape of draw_idxs: n_subs x num_draws x sample_shape
        draw_idxs = random.randint(
            rng_key, shape=(n_subs, num_draws), minval=0, maxval=n_samples
        )
        joined_subposteriors = vmap(lambda x, idx: x[idx])(
            joined_subposteriors, draw_idxs
        )

    if diagonal:
        # compute weights for each subposterior (ref: weighted average of
        # subposterior means, weights = precision)
        weights = vmap(lambda x: 1.0 / jnp.var(x, ddof=1, axis=0))(
            joined_subposteriors
        )
        normalized_weights = weights / jnp.sum(weights, axis=0)
        # get weighted samples
        samples_flat = jnp.einsum(
            "ij,ikj->kj", normalized_weights, joined_subposteriors
        )
    else:
        weights = vmap(lambda x: jnp.linalg.inv(jnp.cov(x.T)))(joined_subposteriors)
        normalized_weights = jnp.matmul(
            jnp.linalg.inv(jnp.sum(weights, axis=0)), weights
        )
        samples_flat = jnp.einsum(
            "ijk,ilk->lj", normalized_weights, joined_subposteriors
        )

    # unravel_fn acts on 1 sample of a subposterior
    _, unravel_fn = ravel_pytree(jax.tree.map(lambda x: x[0], subposteriors[0]))
    return vmap(unravel_fn)(samples_flat)


def parametric(subposteriors, diagonal=False):
    """Gaussian-product merging: returns (mean, cov or var) (reference:
    hmc_util.py:1286-1321)."""
    joined_subposteriors = jax.tree.map(
        lambda *args: jnp.stack(args), *subposteriors
    )
    joined_subposteriors = vmap(vmap(lambda sample: ravel_pytree(sample)[0]))(
        joined_subposteriors
    )

    submeans = jnp.mean(joined_subposteriors, axis=1)
    if diagonal:
        weights = vmap(lambda x: 1.0 / jnp.var(x, ddof=1, axis=0))(
            joined_subposteriors
        )
        var = 1.0 / jnp.sum(weights, axis=0)
        normalized_weights = weights / jnp.sum(weights, axis=0)
        mean = jnp.einsum("ij,ij->j", normalized_weights, submeans)
        return mean, var
    else:
        weights = vmap(lambda x: jnp.linalg.inv(jnp.cov(x.T)))(joined_subposteriors)
        cov = jnp.linalg.inv(jnp.sum(weights, axis=0))
        normalized_weights = jnp.matmul(cov, weights)
        mean = jnp.einsum("ijk,ik->j", normalized_weights, submeans)
        return mean, cov


def parametric_draws(subposteriors, num_draws, diagonal=False, rng_key=None):
    """Draw from the parametric merged Gaussian (reference:
    hmc_util.py:1324-1349)."""
    rng_key = random.PRNGKey(0) if rng_key is None else rng_key
    if diagonal:
        mean, var = parametric(subposteriors, diagonal=True)
        samples_flat = mean + jnp.sqrt(var) * random.normal(
            rng_key, (num_draws,) + jnp.shape(mean)
        )
    else:
        mean, cov = parametric(subposteriors, diagonal=False)
        samples_flat = random.multivariate_normal(rng_key, mean, cov, (num_draws,))

    _, unravel_fn = ravel_pytree(jax.tree.map(lambda x: x[0], subposteriors[0]))
    return vmap(unravel_fn)(samples_flat)
