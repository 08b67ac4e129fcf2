"""Fused Bernoulli-logits GLM log-likelihood + gradient — the hot op of the
covtype-class workloads (large-N logistic regression under NUTS/HMCECS).

Why this exists: XLA evaluates ``value_and_grad`` of a logistic-regression
potential as separate forward (X @ w) and backward (rᵀ @ X) passes plus
several (C, N) elementwise intermediates — ~16x the HBM-roofline cost of
reading X once.  This op computes the log-likelihood **and** its gradient in
a single Pallas pass over X tiles: each (D, TILE) block of Xᵀ is read once
from HBM, the (C, TILE) logits block lives only in VMEM, and both the nll
reduction and the grad accumulation (r @ X_tileᵀ, an MXU contraction) happen
before the next tile streams in.

Integration: ``bernoulli_logits_loglik(w, data)`` is a plain differentiable
scalar function of ``w`` usable inside any model via ``numpyro_tpu.factor``;
it composes with the chain-massive driver because vmap over chains hits a
``custom_vmap`` rule that batches chains into the kernel's sublane dim
instead of replaying the data pass per chain.

Precision modes (``prepare_glm_data(..., dtype=...)``):

- ``jnp.float32`` (default): exact-f32 model; every MXU contraction runs at
  HIGHEST precision (multi-pass bf16 emulation of f32 — ~3x the MXU work of
  a native bf16 pass on v5e).
- ``"split"``: the design matrix is stored once in bf16 — that quantized
  matrix IS the model's design matrix, exactly — while ``w`` (which moves
  every leapfrog step) is carried as an f32-accurate bf16 hi+lo pair packed
  along the contraction dim, so the forward logits are ONE native-bf16 MXU
  pass with ~2^-16-relative accuracy *in w*.  The potential stays smooth in
  ``w`` (energy-conserving trajectories; naive all-bf16 storage breaks this
  because quantizing w makes the potential piecewise-constant at posterior
  scale) and the MH accept uses an f32-accurate density, so NUTS samples the
  bf16-design posterior exactly.  The gradient pass splits the f32 residual
  the same way (two bf16 passes).  Measured 1.5-1.7x the f32 mode at
  256-1024 chains on v5e and unlocks 4096-chain panels.
- ``jnp.bfloat16``: everything bf16, including ``w`` — fastest but the
  potential's stair-stepping in ``w`` stalls NUTS at high data concentration
  (kept for diffuse posteriors and experimentation only).
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
from jax.custom_batching import custom_vmap

__all__ = ["BernoulliLogitsGLMData", "bernoulli_logits_loglik", "prepare_glm_data"]

_TILE = 4096
_LANE = 128
# data layout pads N to multiples of 32768 so the kernels can pick any
# power-of-two tile up to that (grid-step count, not bandwidth, bounds the
# kernel's serial latency); cap the per-grid-step X block at ~4 MB
# (double-buffered by the pipeline)
_N_PAD = 32768
_TILE_BYTES_CAP = 4 * 1024 * 1024

# MXU precision for f32-stored X: HIGHEST (6-pass, exact f32) by default.
# HIGH (3-pass bf16) costs half the MXU passes at ~7e-4 relative gradient
# error — measured insufficiently different on this HBM-bound kernel to
# justify the accuracy loss, but kept settable for experimentation.
_F32_PRECISION = jax.lax.Precision.HIGHEST


class BernoulliLogitsGLMData:
    """Pre-laid-out design matrix for the fused kernel: Xᵀ padded to
    (D_pad, N_pad) with the observation row padded to match.  Build once via
    :func:`prepare_glm_data`; reused across every leapfrog step."""

    def __init__(self, x_t, y_row, n, d, dtype):
        self.x_t = x_t  # (D_pad, N_pad)
        self.y_row = y_row  # (1, N_pad) float
        self.n = n
        self.d = d
        self.dtype = dtype

    def tree_flatten(self):
        return (self.x_t, self.y_row), (self.n, self.d, self.dtype)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


jax.tree_util.register_pytree_node(
    BernoulliLogitsGLMData,
    BernoulliLogitsGLMData.tree_flatten,
    BernoulliLogitsGLMData.tree_unflatten,
)


def prepare_glm_data(X, y, dtype=jnp.float32):
    """Lay out (N, D) design matrix + (N,) binary obs for the fused kernel.

    :param dtype: storage/precision mode for X — ``jnp.float32`` (exact-f32
        model), ``"split"`` (bf16-stored design matrix with f32-accurate
        split-precision ``w``; the recommended high-throughput mode — see
        module docstring), or ``jnp.bfloat16`` (all-bf16; stalls NUTS at
        high data concentration, experimentation only).
    """
    N, D = X.shape
    d_pad = max(8 * ((D + 7) // 8), 8)
    n_pad = _N_PAD * ((N + _N_PAD - 1) // _N_PAD)
    store = jnp.bfloat16 if dtype == "split" else dtype
    x_t = jnp.zeros((d_pad, n_pad), dtype=store)
    x_t = x_t.at[:D, :N].set(X.T.astype(store))
    y_row = jnp.zeros((1, n_pad), dtype=jnp.float32)
    y_row = y_row.at[0, :N].set(y.astype(jnp.float32))
    return BernoulliLogitsGLMData(x_t, y_row, N, D, dtype)


def split_hi_lo(w):
    """Split f32 ``w`` into bf16 ``(hi, lo)`` with ``hi + lo == w`` to
    ~2^-17 relative.

    REGRESSION TRAP: writing this as ``lo = w - bf16(w).astype(f32)`` gets
    ELIDED by XLA's convert simplifier under jit (the f32->bf16->f32
    round-trip is treated as identity), silently zeroing ``lo`` — the split
    potential then stair-steps at bf16-w resolution and NUTS adaptation
    collapses (round-3 bench regression: step size 1e-4, every tree at the
    depth cap, 25x wall-time).  ``lax.reduce_precision`` is the dedicated,
    non-elidable rounding op.
    """
    w_hi_f = jax.lax.reduce_precision(w, exponent_bits=8, mantissa_bits=7)
    return w_hi_f.astype(jnp.bfloat16), (w - w_hi_f).astype(jnp.bfloat16)


def _xla_fused(w_pad, data):
    """Reference/fallback implementation (CPU, or interpret mode)."""
    x_t = data.x_t.astype(jnp.float32)
    logits = w_pad @ x_t  # (B, N_pad)
    y = data.y_row
    # padded columns produce logits 0 -> constant softplus(0); corrected below
    nll = jnp.sum(jax.nn.softplus(logits) - y * logits, axis=-1)
    n_pad = x_t.shape[1]
    nll = nll - (n_pad - data.n) * jnp.log(2.0)
    r = jax.nn.sigmoid(logits) - y
    # padded columns of x_t are zero -> no gradient contribution
    grad = r @ x_t.T
    return -nll, -grad


def _pallas_split(w_pad, data):
    """Split-precision pass: bf16-stored X, f32-accurate hi+lo-packed w.

    Forward: ``[w_hi | w_lo] @ [x ; x]`` — a single full-contraction-width
    native-bf16 MXU pass equal to ``(w_hi + w_lo) @ x`` with f32
    accumulation.  Transcendentals are shared (one exp + one log1p serve
    both the nll and the residual — the VPU is ~40% of this kernel at 4096
    chains).  Gradient: the f32 residual is split hi+lo the same way (two
    bf16 passes).  The density is f32-accurate for the bf16-quantized
    design matrix, i.e. NUTS samples that model exactly.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b_pad, d_pad = w_pad.shape
    n_pad = data.x_t.shape[1]
    # measured VMEM envelope on v5e for this kernel's temps: keep the
    # (B, inner) f32 logits block at <= 4 MB (8 MB blocks fail to compile)
    inner = _TILE
    while b_pad * inner * 4 > 4 * 1024 * 1024 and inner > 128:
        inner //= 2
    # grid-step overhead dominates the kernel's SERIAL latency inside the
    # leapfrog while_loop (~9us per grid step measured: a 142-step grid is
    # 1.28 ms/call while the X pass itself is ~80us).  Each grid step
    # therefore processes several VMEM-sized sub-blocks with a static
    # inner loop — fewer grid steps, same VMEM residency per sub-block.
    import os as _os

    # measured on v5e at 256 chains: subs=2 is the sweet spot (5503 vs
    # 5153 ESS/s/chip at subs=1-legacy; 4491 at subs=4, 4166 at subs=8 —
    # larger blocks trade grid-step overhead for coarser DMA/compute
    # overlap)
    subs_cap = int(_os.environ.get("NUMPYRO_TPU_GLM_SUBS", "2"))
    subs = 1
    while (
        subs < subs_cap
        and inner * subs * 2 < _TILE_BYTES_CAP // max(d_pad * 2, 1)
        and n_pad % (inner * subs * 2) == 0
    ):
        subs *= 2
    tile = inner * subs
    num_tiles = n_pad // tile

    def kernel(w_ref, x_ref, y_ref, pe_ref, g_ref, pe_slots, acc_g):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            pe_slots[:, :] = jnp.zeros_like(pe_slots)
            acc_g[:, :] = jnp.zeros_like(acc_g)

        g_total = None
        for s in range(subs):
            x = x_ref[:, s * inner : (s + 1) * inner]  # (D, inner) bf16
            x2 = jnp.concatenate([x, x], axis=0)  # (2D, inner): [x ; x]
            # pin DEFAULT precision: operands are already bf16 (native
            # single MXU pass); the driver's ambient
            # default_matmul_precision("highest") must not leak in —
            # Mosaic rejects fp32 contract precision on bf16
            logits = jnp.dot(
                w_ref[:, :],
                x2,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )  # (B, inner) f32
            y = y_ref[0, s * inner : (s + 1) * inner][None, :]
            e = jnp.exp(-jnp.abs(logits))
            nll = jnp.maximum(logits, 0.0) + jnp.log1p(e) - y * logits
            # PE accumulation precision: the full nll sum at covtype scale
            # reaches ~2e5 while each term is ~0.3, and an in-kernel f32
            # reduction of that magnitude costs ~±1.3 absolute PE error —
            # the MH accept then sees exp(-|dE_err|) ≈ 0.25 and dual
            # averaging collapses the step size (measured: step 1e-4,
            # every tree at the depth cap).  So NO high-magnitude sum ever
            # happens in-kernel: everything folds into a (B, 128)
            # lane-partial accumulator (every in-kernel add stays at
            # <= total/128 magnitude) and the single 128->1 reduction runs
            # OUTSIDE in XLA on the kernel output.
            for k in range(inner // _LANE):
                pe_slots[:, :] += nll[:, k * _LANE : (k + 1) * _LANE]
            sig = jnp.where(logits >= 0, 1.0, e) / (1.0 + e)
            r = sig - y  # (B, inner) f32
            # hi/lo residual split.  A plain f32->bf16->f32 round-trip is
            # ELIDED by the compiler's convert simplifier (silently
            # zeroing the lo half — observed under jit), and
            # reduce_precision has no Pallas lowering, so
            # round-to-nearest-even to bf16 is done on the raw bits (r is
            # finite and |r|<=1: no NaN/overflow edge cases).
            bits = jax.lax.bitcast_convert_type(r, jnp.uint32)
            rne = bits + jnp.uint32(0x7FFF) + ((bits >> 16) & jnp.uint32(1))
            r_hi_f = jax.lax.bitcast_convert_type(
                rne & jnp.uint32(0xFFFF0000), jnp.float32
            )
            r_hi = r_hi_f.astype(jnp.bfloat16)
            r_lo = (r - r_hi_f).astype(jnp.bfloat16)
            g = jax.lax.dot_general(
                r_hi,
                x,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            g += jax.lax.dot_general(
                r_lo,
                x,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            g_total = g if g_total is None else g_total + g
        acc_g[:, :] += g_total

        @pl.when(i == num_tiles - 1)
        def _():
            pe_ref[:, :] = pe_slots[:, :]
            g_ref[:, :] = acc_g[:, :]

    w_hi, w_lo = split_hi_lo(w_pad)
    wpk = jnp.concatenate([w_hi, w_lo], axis=1)  # (B, 2D) bf16

    pe_pad, grad_pad = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(
                (b_pad, 2 * d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((d_pad, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b_pad, _LANE), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, d_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b_pad, _LANE), jnp.float32),
            pltpu.VMEM((b_pad, d_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b_pad * d_pad * n_pad,
            bytes_accessed=d_pad * n_pad * 2,
            transcendentals=2 * b_pad * n_pad,
        ),
    )(wpk, data.x_t, data.y_row)

    # final lane reduction in XLA (hierarchical, low error — in contrast to
    # the in-kernel serial alternative, see kernel comment)
    nll = jnp.sum(pe_pad, axis=-1) - (n_pad - data.n) * jnp.log(2.0)
    return -nll, -grad_pad


def _pallas_fused(w_pad, data):
    """One pass over Xᵀ tiles computing (loglik, dloglik/dw) for all chains."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b_pad, d_pad = w_pad.shape
    n_pad = data.x_t.shape[1]
    # adaptive tile: keep the (B, T) logits block within a VMEM budget as
    # the chain count grows
    # measured envelope on TPU v5: (512, 4096) f32 logits blocks are the
    # sweet spot; beyond 512 chains shrink tiles hard to stay inside VMEM
    budget = 8 * 1024 * 1024 if b_pad <= 512 else 2 * 1024 * 1024
    if data.x_t.dtype != jnp.float32:
        # mixed-precision staging temps (bf16 block + f32 casts) eat into
        # scoped VMEM: leave headroom by shrinking the logits block
        budget = min(budget, 6 * 1024 * 1024)
    tile = _TILE
    while b_pad * tile * 4 > budget and tile > 128:
        tile //= 2
    num_tiles = n_pad // tile
    x_dtype = data.x_t.dtype

    def kernel(w_ref, x_ref, y_ref, pe_ref, g_ref, pe_slots, acc_g):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            pe_slots[:, :] = jnp.zeros_like(pe_slots)
            acc_g[:, :] = jnp.zeros_like(acc_g)

        w = w_ref[:, :]
        if x_dtype != jnp.float32:
            w = w.astype(x_dtype)
        # f32 storage: HIGHEST keeps true-f32 logits (default precision
        # silently truncates f32 operands to one bf16 pass, and those
        # gradients stall NUTS adaptation at covtype concentration).
        # bf16 storage: operands are already bf16 — take the native
        # single-pass MXU path with f32 accumulation.
        mxu_precision = (
            _F32_PRECISION
            if x_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )
        logits = jnp.dot(
            w,
            x_ref[:, :],
            preferred_element_type=jnp.float32,
            precision=mxu_precision,
        )
        y = y_ref[0, :][None, :]  # (1, T)
        nll = jax.nn.softplus(logits) - y * logits  # (B, T)
        # low-magnitude lane-partial PE accumulation (see _pallas_split)
        for k in range(tile // _LANE):
            pe_slots[:, :] += nll[:, k * _LANE : (k + 1) * _LANE]
        r = jax.nn.sigmoid(logits) - y  # (B, T)
        if x_dtype != jnp.float32:
            r = r.astype(x_dtype)
        # (B, T) x (D, T) contracting T -> (B, D), f32 accumulation
        acc_g[:, :] += jax.lax.dot_general(
            r,
            x_ref[:, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=mxu_precision,
        )

        @pl.when(i == num_tiles - 1)
        def _():
            pe_ref[:, :] = pe_slots[:, :]
            g_ref[:, :] = acc_g[:, :]

    pe_pad, grad_pad = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((b_pad, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_pad, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b_pad, _LANE), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, d_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b_pad, _LANE), jnp.float32),
            pltpu.VMEM((b_pad, d_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b_pad * d_pad * n_pad,
            bytes_accessed=d_pad * n_pad * data.x_t.dtype.itemsize,
            transcendentals=2 * b_pad * n_pad,
        ),
    )(w_pad, data.x_t, data.y_row)

    nll = jnp.sum(pe_pad, axis=-1) - (n_pad - data.n) * jnp.log(2.0)
    return -nll, -grad_pad


def _fused_batched(w, data):
    """(B, D) chains -> (loglik (B,), grad (B, D)); pads to kernel layout."""
    b, d = w.shape
    d_pad = data.x_t.shape[0]
    # bf16 MXU operands tile at (16, 128) sublanes x lanes: the split mode's
    # packed-w lhs is bf16, so its chain padding must be a multiple of 16
    b_mult = 16 if data.dtype == "split" else 8
    b_pad = max(b_mult * ((b + b_mult - 1) // b_mult), b_mult)
    w_pad = jnp.zeros((b_pad, d_pad), dtype=jnp.float32)
    w_pad = w_pad.at[:b, :d].set(w)
    # branch on the LOWERING platform (not the default backend): a
    # CPU-targeted jit on a TPU host must take the XLA path, and only the
    # selected branch is lowered per platform
    ll, g = jax.lax.platform_dependent(
        w_pad,
        data,
        tpu=_pallas_split if data.dtype == "split" else _pallas_fused,
        default=_xla_fused,
    )
    return ll[:b], g[:b, :d]


@custom_vmap
def _fused_single(w, data):
    ll, g = _fused_batched(w[None, :], data)
    return ll[0], g[0]


@_fused_single.def_vmap
def _fused_vmap_rule(axis_size, in_batched, w, data):
    # chains batch into the kernel's sublane dim: one data pass for ALL chains
    assert in_batched[0]
    ll, g = _fused_batched(w, data)
    return (ll, g), (True, True)


@jax.custom_vjp
def bernoulli_logits_loglik(w, data):
    """Σ_n log Bernoulli(y_n | logits = x_n · w), fused with its gradient.

    Differentiable in ``w`` only; ``data`` must come from
    :func:`prepare_glm_data`.  Use inside a model as
    ``numpyro_tpu.factor("lik", bernoulli_logits_loglik(w, data))``.
    """
    return _fused_single(w, data)[0]


def _ll_fwd(w, data):
    ll, g = _fused_single(w, data)
    return ll, g


def _ll_bwd(g, ct):
    return (ct[..., None] * g if jnp.ndim(ct) else ct * g, None)


bernoulli_logits_loglik.defvjp(_ll_fwd, _ll_bwd)
