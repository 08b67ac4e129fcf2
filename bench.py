"""Benchmark: effective samples / sec / chip, NUTS on covtype-scale logistic
regression (the reference's headline workload, examples/covtype.py).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The dataset is synthetic at the covtype shape (581,012 x 55 + intercept,
Bernoulli logistic regression) — zero-egress environment, and throughput
depends on shape, not values.

What is measured (honest-bench rules from round-1 review):
- **1000 draws/chain** so the ESS estimate has a trustworthy
  autocorrelation window.
- **Full `max_tree_depth=10` for the sampling phase** (the reference
  default).  The round-1 bench capped depth at 5 everywhere to dodge the
  vmap max-depth tax; the chain-batched engine's asynchronous harvest loop
  (hmc_core.build_fused_run) removes that tax, so the draws ESS is
  harvested from are uncapped.  Warmup (which contributes no samples) runs
  at depth<=6 — pre-adaptation trees otherwise bottom out at 1023
  leapfrogs each.
- The headline `value` is **warmup-amortized** ESS/s/chip:
  ess_median / (warmup_s + sample_s), both phases timed after a separate
  compile pass.  The sampling-phase-only rate is in `detail`.
- Correctness is **asserted**, not just reported: the run fails unless the
  posterior mean recovers the generating coefficients to 0.05.

vs_baseline compares against ROUND1_BASELINE, this same workload's first
recording (16 vectorized chains, plain-XLA likelihood, depth<=7, 100-draw
chains, sample-phase-only ESS/s of 23.34).  The reference repo publishes no
numbers (BASELINE.md), so round-over-round progress is tracked against our
own first measurement; note the config delta when quoting the multiplier.
"""

import json
import os
import time

import numpy as np

# Persistent compilation cache, set BEFORE jax initializes: compile RPCs on
# the tunneled TPU backend are high-variance (a trivial op compile can
# stall minutes), so cached executables both stabilize and shrink bench
# wall time.  Repo-local dir, gitignored.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax
import jax.numpy as jnp
from jax import random

import numpyro_tpu
import numpyro_tpu.distributions as dist
from numpyro_tpu.diagnostics import effective_sample_size
from numpyro_tpu.infer import MCMC, NUTS
from numpyro_tpu.ops.glm import bernoulli_logits_loglik, prepare_glm_data

# round-1 first recording on this chip (plain XLA likelihood, 16 chains,
# depth<=7, sample-phase-only): 23.34 ESS/s/chip
ROUND1_BASELINE = 23.34

N, D = int(os.environ.get("BENCH_N", 581_012)), 55
# BENCH_MODE=nuts (default): full-data NUTS via the fused Pallas likelihood.
# BENCH_MODE=ecs: the BASELINE.md north-star shape — HMCECS with a
# subsampled likelihood (subsample 1000, 100 blocks, Taylor proxy) at
# chain-massive scale (default 4096 chains).
MODE = os.environ.get("BENCH_MODE", "nuts")
# Default chain counts are sized so the DEFAULT `python bench.py` always
# completes well inside the driver budget on one v5e chip (round-2 measured
# 353s wall incl. compile at 256 chains; round 3's 1024-chain default timed
# out and shipped no number — never again).  Scale up via BENCH_CHAINS.
NUM_CHAINS = int(
    os.environ.get("BENCH_CHAINS", 4096 if MODE == "ecs" else 256)
)
# GLM kernel precision: "split" = bf16-stored design matrix with
# f32-accurate split-precision w (see ops/glm.py module docstring) — the
# model sampled is the bf16-quantized design matrix's posterior, exactly;
# 1.5-1.7x the f32 mode on v5e.  Set BENCH_GLM_DTYPE=f32 for the exact-f32
# design matrix.
GLM_DTYPE = os.environ.get("BENCH_GLM_DTYPE", "split")
# Cross-chain pooled warmup adaptation (one shared step size + mass matrix
# from all chains' pooled Welford moments): with hundreds-thousands of
# chains estimating the SAME mass matrix, pooling needs far fewer warmup
# steps per chain for equal quality — BENCH_POOLED=1 enables it and
# BENCH_WARMUP should then be lowered (the A/B in round 5 measured the
# default below).
POOLED = os.environ.get("BENCH_POOLED", "0") == "1"
NUM_WARMUP = int(os.environ.get("BENCH_WARMUP", 300))
NUM_SAMPLES = int(
    os.environ.get("BENCH_SAMPLES", 500 if MODE == "ecs" else 1000)
)
SUBSAMPLE = int(os.environ.get("BENCH_SUBSAMPLE", 1000))
NUM_BLOCKS = int(os.environ.get("BENCH_BLOCKS", 100))
# warmup trees run deep before adaptation settles, so the warmup phase is
# capped at depth 6 (a reference-supported option: max_tree_depth may be a
# (warmup, post-warmup) tuple); POST-WARMUP sampling runs the full default
# depth 10 — the number ESS is harvested from is uncapped.
_depth = os.environ.get("BENCH_DEPTH", "6,10")
MAX_TREE_DEPTH = (
    tuple(int(x) for x in _depth.split(",")) if "," in _depth else int(_depth)
)


def make_data():
    # X is generated host-side and shipped once (H2D); true_w stays a HOST
    # numpy array — it feeds taylor_proxy's reference params, and host
    # params keep the proxy's construct free of device round-trips (a
    # device-resident reference vector wedged the 4096-chain init behind
    # the tunnel's transfer queue; see ecs_proxies.py)
    rng = np.random.default_rng(0)
    X_host = rng.standard_normal((N, D - 1), dtype=np.float32)
    true_w = (0.5 * rng.standard_normal(D)).astype(np.float32)
    X = jnp.concatenate(
        [jnp.asarray(X_host), jnp.ones((N, 1))], axis=1
    )  # intercept column
    y = dist.Bernoulli(logits=X @ jnp.asarray(true_w)).sample(
        random.PRNGKey(2)
    )
    return X, y.astype(jnp.float32), true_w


def model(data):
    w = numpyro_tpu.sample("w", dist.Normal(jnp.zeros(D), 1.0).to_event(1))
    numpyro_tpu.factor("lik", bernoulli_logits_loglik(w, data))


def model_ecs(X, y):
    w = numpyro_tpu.sample("w", dist.Normal(jnp.zeros(D), 1.0).to_event(1))
    with numpyro_tpu.plate("N", X.shape[0], subsample_size=SUBSAMPLE):
        xb = numpyro_tpu.subsample(X, event_dim=1)
        yb = numpyro_tpu.subsample(y, event_dim=0)
        numpyro_tpu.sample("obs", dist.Bernoulli(logits=xb @ w), obs=yb)


def build_mcmc(X, y, true_w):
    from numpyro_tpu.infer import HMCECS

    if MODE == "ecs":
        # Taylor proxy anchored at the generating coefficients (the
        # reference's covtype recipe anchors at an SVI MAP; on synthetic
        # data the generator IS the MAP up to sampling noise).  proxy and
        # panel modes default to "auto": at 4096 chains on a 16 GB chip
        # they resolve to recompute-stats + bf16 panels (no per-chain
        # (m, P) statistics panels; data panels at half width) — the
        # memory-lean configuration that fits the north-star scale.
        proxy = HMCECS.taylor_proxy(
            {"w": true_w}, mode=os.environ.get("BENCH_ECS_PROXY_MODE", "auto")
        )
        kernel = HMCECS(
            NUTS(model_ecs, max_tree_depth=MAX_TREE_DEPTH),
            num_blocks=NUM_BLOCKS,
            proxy=proxy,
            panel_mode=os.environ.get("BENCH_ECS_PANEL_MODE", "auto"),
        )
        args = (X, y)
    else:
        import jax.numpy as _jnp

        data = prepare_glm_data(
            X, y, dtype="split" if GLM_DTYPE == "split" else _jnp.float32
        )
        jax.block_until_ready(data.x_t)
        kernel = NUTS(
            model,
            max_tree_depth=MAX_TREE_DEPTH,
            pooled_adaptation=POOLED,
        )
        args = (data,)
    return (
        MCMC(
            kernel,
            num_warmup=NUM_WARMUP,
            num_samples=NUM_SAMPLES,
            num_chains=NUM_CHAINS,
            chain_method="vectorized",
            progress_bar=False,
        ),
        args,
    )


def _progress(msg):
    # phase timestamps on stderr so a stalled run is diagnosable (the JSON
    # result line on stdout stays the only stdout output)
    import sys

    print(f"[bench +{time.time() - _T_START:.0f}s] {msg}", file=sys.stderr, flush=True)


_T_START = time.time()


def main():
    _progress(f"start: mode={MODE} chains={NUM_CHAINS} glm_dtype={GLM_DTYPE}")
    X, y, true_w = make_data()
    jax.block_until_ready(X)
    _progress("data materialized on device")
    mcmc, args = build_mcmc(X, y, true_w)
    _progress("kernel built; entering run (first compile ~1-5 min)")

    # single run; the chunked fused driver reports per-chunk wall times, so
    # steady-state rates come from the post-compile chunks (chunk 0 of each
    # program carries its compile)
    t0 = time.time()
    # num_steps feeds the roofline detail; HMCECS state nests it under the
    # inner hmc_state and the fused collector doesn't expose it there
    extra = () if MODE == "ecs" else ("num_steps",)
    # the tunneled backend intermittently kills an execution with an opaque
    # "TPU backend error (InvalidArgument)" (observed after worker crashes/
    # OOMs; the device recovers); one retry salvages the measurement
    try:
        mcmc.run(random.PRNGKey(1), *args, extra_fields=extra)
    except Exception as e:  # jax.errors.JaxRuntimeError and friends
        if "TPU backend error" not in str(e):
            raise
        _progress(f"run failed with transient backend error ({e}); retrying once in 60s")
        time.sleep(60)
        t0 = time.time()
        mcmc.run(random.PRNGKey(1), *args, extra_fields=extra)
    samples = mcmc.get_samples(group_by_chain=True)["w"]
    jax.block_until_ready(samples)
    total_wall_s = time.time() - t0
    _progress(f"run complete in {total_wall_s:.0f}s; computing diagnostics")
    stats = mcmc.last_run_stats
    wt = stats.get("warm_chunk_times", [])
    st = stats.get("sample_chunk_times", [])

    def steady(chunk_times):
        if len(chunk_times) <= 2:
            return sum(chunk_times)
        body = sorted(chunk_times[1:])  # drop the compile-bearing first chunk
        med = body[len(body) // 2]
        return med * len(chunk_times)

    warmup_s = steady(wt)
    sample_s = steady(st)
    if sample_s == 0.0 and os.environ.get("BENCH_STEADY_RERUN", "1") == "0":
        # budget mode (the embedded ECS leg): accept compile-inclusive wall
        # time as the denominator instead of paying a second full run
        warmup_s = 0.0
        sample_s = total_wall_s
    elif sample_s == 0.0:
        # non-fused kernels (e.g. HMCECS) don't report chunk times and their
        # first-run timers include the compile.  Re-run both phases from the
        # now-compiled programs for steady-state rates.
        t1 = time.time()
        mcmc.warmup(random.PRNGKey(2), *args)
        jax.block_until_ready(mcmc.post_warmup_state.rng_key)
        warmup_s = time.time() - t1
        t1 = time.time()
        mcmc.run(mcmc.post_warmup_state.rng_key, *args)
        jax.block_until_ready(
            mcmc.get_samples(group_by_chain=True)["w"]
        )
        sample_s = time.time() - t1
    total_s = warmup_s + sample_s

    # ESS across all chains, per coefficient; report the median coefficient
    ess = np.asarray(jax.device_get(effective_sample_size(samples)))
    ess_median = float(np.median(ess))

    # correctness gate: fail loudly rather than publish a bogus number
    # (the subsampled-likelihood mode carries extra pseudo-marginal noise,
    # so its gate is proportionally wider)
    w_tol = 0.1 if MODE == "ecs" else 0.05
    w_err = float(jnp.abs(samples.mean((0, 1)) - true_w).max())
    assert w_err < w_tol, (
        f"posterior means off by {w_err:.4f} (>{w_tol}): bench invalid"
    )

    n_chips = jax.device_count()
    amortized = ess_median / total_s / n_chips
    sample_only = ess_median / sample_s / n_chips

    # --- roofline / MFU accounting (sample phase, counted work only) ----
    # Each leapfrog is ONE fused value_and_grad pass over the design matrix:
    # the Pallas kernel streams X^T tiles once from HBM and does the forward
    # logits contraction plus the two-pass (hi/lo) gradient contraction.
    # The async harvest loop may run extra (uncounted) leapfrogs for chains
    # past their target, so these are LOWER bounds on achieved traffic.
    roofline = {}
    if MODE != "ecs":
        extras = mcmc.get_extra_fields(group_by_chain=True)
        nsteps = np.asarray(jax.device_get(extras.get("num_steps")))
        leapfrogs = float(nsteps.sum())
        # the async harvest advances EVERY chain one leapfrog per
        # iteration with ONE batched kernel call (one X pass serves all
        # chains), so data passes ~= per-chain mean leapfrog count
        passes = leapfrogs / NUM_CHAINS
        d_pad = max(8 * ((D + 7) // 8), 8)
        n_pad = 4096 * ((N + 4095) // 4096)
        itemsize = 2 if GLM_DTYPE in ("split", "bf16") else 4
        bytes_per_pass = d_pad * n_pad * itemsize
        # forward (C,2Dp)x(2Dp,Np) + two grad passes (C,Np)x(Np,Dp)
        flops_per_pass = 8.0 * NUM_CHAINS * d_pad * n_pad
        peak_hbm_gbps = float(os.environ.get("BENCH_PEAK_HBM_GBPS", 819))
        peak_tflops = float(os.environ.get("BENCH_PEAK_TFLOPS", 197))
        hbm_gbps = passes * bytes_per_pass / sample_s / 1e9
        tflops = passes * flops_per_pass / sample_s / 1e12
        # kernel-level utilization: achieved traffic per unit of KERNEL
        # time (passes x measured per-pass latency), vs per unit WALL time.
        # The gap between the two is harvest-loop bookkeeping overhead.
        # pointwise VPU work — the measured bound: every leapfrog evaluates
        # ~2 transcendentals (exp, log1p) + ~10 elementwise ALU ops per
        # (chain, data point); this scales linearly with chains while
        # ESS/draw stays constant, which is why MFU cannot be pushed toward
        # the MXU roof by adding chains (see chain_scaling_sweep_r5)
        pointwise_ops = 12.0 * NUM_CHAINS * n_pad
        vpu_gops = passes * pointwise_ops / sample_s / 1e9
        roofline = {
            "sample_phase_leapfrogs_per_chain_total": int(leapfrogs),
            "data_passes": int(passes),
            "hbm_gbps": round(hbm_gbps, 1),
            "hbm_roofline_frac": round(hbm_gbps / peak_hbm_gbps, 3),
            "mxu_tflops": round(tflops, 1),
            "mfu": round(tflops / peak_tflops, 3),
            "vpu_pointwise_gops": round(vpu_gops, 1),
            "bound": "vpu-pointwise (likelihood transcendentals/ALU), not "
            "MXU or HBM",
            "peak_assumed": {
                "hbm_gbps": peak_hbm_gbps, "bf16_tflops": peak_tflops,
            },
        }
        chain_sweep = {
            "note": "round-5 sweep measured 2026-08-21 on this chip "
            "(600 draws/chain, depth (6,10), split GLM): sample-phase "
            "ESS/s/chip DECLINES with chain count because the harvest "
            "loop's per-iteration cost is dominated by per-(chain, point) "
            "VPU pointwise work in the likelihood (linear in chains) while "
            "ESS/draw stays constant (~1.38/chain/draw); 256 chains is the "
            "ESS/s-optimal configuration and is the default",
            "points": [
                {"chains": 256, "glm_subs": 2,
                 "sample_only_ess_per_s": 10566.7},
                {"chains": 512, "glm_subs": 4,
                 "sample_only_ess_per_s": 8414.3},
                {"chains": 1024, "glm_subs": 4,
                 "sample_only_ess_per_s": 5946.2},
            ],
            "physical_bound": "per-leapfrog wall ~= chains * N_pad * ~12 "
            "VPU ops / ~1.9e12 ops/s (17-27 us per chain measured across "
            "256/512/1024); the shared bf16 X pass (HBM, ~80 us total) and "
            "the logits/grad MXU contractions sit 10-60x below their "
            "roofs, so higher MFU via more chains cannot raise ESS/s",
        }

    if MODE == "ecs":
        # --- ECS roofline: panel traffic per leapfrog -------------------
        # the per-chain subsample panels (bf16 X rows + y) are the hot
        # data: each potential eval reads them once for the exact sub
        # log-lik and ~3 more times inside the nested-JVP proxy recompute
        # (value/first/second directional terms).  MXU flops are
        # negligible (m*P matvecs), so the leg is HBM-bound on panels.
        panel_bytes = NUM_CHAINS * SUBSAMPLE * D * 2  # bf16 X panels
        passes_per_eval = 4.0
        kern = getattr(mcmc.sampler, "_panel_mode_resolved", "?")
        # leapfrogs are not collected for the nested kernel; bound them
        # from the total transitions x the post-adaptation tree size
        # measured on the full-data leg (~7 leapfrogs/draw at depth 10)
        est_leapfrogs = (NUM_WARMUP + NUM_SAMPLES) * 7.0
        ecs_gbps = (
            est_leapfrogs * passes_per_eval * panel_bytes / max(total_s, 1e-9) / 1e9
        )
        peak_hbm_gbps = float(os.environ.get("BENCH_PEAK_HBM_GBPS", 819))
        roofline = {
            "panel_mode": str(kern),
            "panel_bytes_per_pass": panel_bytes,
            "est_passes_per_leapfrog": passes_per_eval,
            "hbm_gbps_panel_traffic_est": round(ecs_gbps, 1),
            "hbm_roofline_frac": round(ecs_gbps / peak_hbm_gbps, 3),
            "note": "estimate: leapfrog count of the nested kernel is not "
            "collected; assumes ~7 leapfrogs/transition as measured on the "
            "full-data leg",
        }
        crossover_note = (
            "At covtype scale the full-data fused kernel reads ONE shared "
            f"{'bf16' if GLM_DTYPE != 'f32' else 'f32'} X pass "
            f"(~{N * D * 2 / 1e6:.0f} MB) per leapfrog for ALL chains, "
            f"while ECS reads per-chain panels "
            f"(~{panel_bytes / 1e6:.0f} MB x ~{passes_per_eval:.0f} passes) "
            "— subsampling therefore LOSES on HBM traffic whenever "
            "N < ~4*C*m (here N=%d vs C*m=%d).  ECS pays off at "
            "N >> 4*C*m, for expensive per-row likelihoods, or when the "
            "full dataset cannot live in HBM." % (N, NUM_CHAINS * SUBSAMPLE)
        )
        workload = (
            f"HMCECS subsample={SUBSAMPLE} blocks={NUM_BLOCKS} Taylor proxy,"
            f" covtype-shape logistic regression, {NUM_CHAINS} chains"
        )
    else:
        workload = (
            f"covtype-shape logistic regression, {NUM_CHAINS} async"
            f" vectorized chains, fused Pallas likelihood ({GLM_DTYPE})"
        )
    result = {
        "metric": "warmup-amortized effective samples/sec/chip "
        f"(NUTS depth {MAX_TREE_DEPTH}, {workload})",
        "value": round(amortized, 2),
        "unit": "ESS/s/chip",
        "vs_baseline": round(amortized / ROUND1_BASELINE, 3),
        "detail": {
            "sample_phase_ess_per_sec_per_chip": round(sample_only, 2),
            "warmup_s": round(warmup_s, 2),
            "sample_s": round(sample_s, 2),
            "total_s": round(total_s, 2),
            "total_wall_incl_compile_s": round(total_wall_s, 2),
            "ess_median": round(ess_median, 1),
            "ess_min": round(float(ess.min()), 1),
            "max_coef_abs_err": round(w_err, 4),
            "num_chains": NUM_CHAINS,
            "num_warmup": NUM_WARMUP,
            "num_samples_per_chain": NUM_SAMPLES,
            "max_tree_depth": str(MAX_TREE_DEPTH),
            "glm_dtype": GLM_DTYPE,
            "pooled_adaptation": POOLED,
            "data_shape": [N, D],
            "device": str(jax.devices()[0]),
            "baseline_config_delta": "round-1 baseline was 16 chains, depth<=7,"
            " 100 draws/chain, sample-phase-only ESS/s",
            **({"roofline": roofline} if roofline else {}),
            **(
                {"chain_scaling_sweep_r5": chain_sweep}
                if MODE != "ecs"
                else {}
            ),
            **(
                {"crossover_note": crossover_note} if MODE == "ecs" else {}
            ),
        },
    }

    # --- embedded north-star measurement: HMCECS at chain-massive scale ---
    # (BASELINE.md's primary config shape: subsample 1000, 100 blocks,
    # Taylor proxy).  Runs as a subprocess with its own budget so the
    # headline JSON always lands even if the ECS leg times out.  4096
    # chains exceed one 16 GB chip's HBM with this estimator (measured);
    # 1024/chip is the single-chip point — the 4096-chain target is the
    # multi-chip configuration exercised by dryrun_multichip's sharded
    # HMCECS step.
    if MODE == "nuts" and os.environ.get("BENCH_EMBED_ECS", "1") != "0":
        import subprocess
        import sys

        # safety line: if the driver's budget kills the process during the
        # ECS leg, the headline is already on stdout (the final combined
        # line below supersedes it when the leg completes)
        print(json.dumps(result), flush=True)
        _progress("headline done; starting embedded HMCECS measurement")
        env = dict(os.environ)
        env.update(
            BENCH_MODE="ecs",
            BENCH_CHAINS=os.environ.get("BENCH_ECS_CHAINS", "1024"),
            BENCH_WARMUP=os.environ.get("BENCH_ECS_WARMUP", "100"),
            BENCH_SAMPLES=os.environ.get("BENCH_ECS_SAMPLES", "100"),
            BENCH_STEADY_RERUN="0",
            BENCH_EMBED_ECS="0",
        )
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                timeout=float(os.environ.get("BENCH_ECS_TIMEOUT_S", "700")),
            )
            line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
            ecs = json.loads(line) if line.startswith("{") else None
            if ecs is not None and out.returncode == 0:
                result["detail"]["ecs"] = {
                    "ess_per_sec_per_chip_wall_amortized": ecs["value"],
                    "metric": ecs["metric"],
                    **{
                        k: ecs["detail"][k]
                        for k in (
                            "ess_median",
                            "max_coef_abs_err",
                            "num_chains",
                            "total_wall_incl_compile_s",
                            "roofline",
                            "crossover_note",
                        )
                        if k in ecs["detail"]
                    },
                }
            else:
                result["detail"]["ecs"] = {
                    "status": f"failed rc={out.returncode}",
                    "tail": (out.stderr or "")[-300:],
                }
        except subprocess.TimeoutExpired:
            result["detail"]["ecs"] = {"status": "timeout"}
        except Exception as e:  # pragma: no cover
            result["detail"]["ecs"] = {"status": f"error: {e}"}

    print(json.dumps(result))


if __name__ == "__main__":
    main()
