"""Round-5 headline sweep driver: chains x GLM sub-block count x pooled
warmup, all in ONE process so the tunnel's first-touch penalty and the
compile cache are paid once.  Results land as one JSON line per config on
stdout (bench.py's own output format).  Not part of the library."""

import importlib
import json
import os
import sys
import time

os.environ.setdefault("BENCH_EMBED_ECS", "0")

CONFIGS = [
    # (label, env overrides)
    ("c512_s4", {"BENCH_CHAINS": "512", "NUMPYRO_TPU_GLM_SUBS": "4"}),
    ("c1024_s4", {"BENCH_CHAINS": "1024", "NUMPYRO_TPU_GLM_SUBS": "4"}),
    ("c1024_s8", {"BENCH_CHAINS": "1024", "NUMPYRO_TPU_GLM_SUBS": "8"}),
    ("c2048_s8", {"BENCH_CHAINS": "2048", "NUMPYRO_TPU_GLM_SUBS": "8"}),
    ("c2048_s16", {"BENCH_CHAINS": "2048", "NUMPYRO_TPU_GLM_SUBS": "16"}),
    (
        "c1024_s8_pooled_w100",
        {
            "BENCH_CHAINS": "1024",
            "NUMPYRO_TPU_GLM_SUBS": "8",
            "BENCH_POOLED": "1",
            "BENCH_WARMUP": "100",
        },
    ),
]

SWEEP_SAMPLES = os.environ.get("SWEEP_SAMPLES", "400")
ONLY = [s for s in os.environ.get("SWEEP_ONLY", "").split(",") if s]


def main():
    base = dict(os.environ)
    for label, overrides in CONFIGS:
        if ONLY and label not in ONLY:
            continue
        os.environ.clear()
        os.environ.update(base)
        os.environ.update(
            BENCH_SAMPLES=SWEEP_SAMPLES, BENCH_EMBED_ECS="0", **overrides
        )
        t0 = time.time()
        print(f"[sweep] {label} starting", file=sys.stderr, flush=True)
        try:
            if "bench" in sys.modules:
                bench = importlib.reload(sys.modules["bench"])
            else:
                import bench  # noqa: F401

                bench = sys.modules["bench"]
            bench.main()
        except BaseException as e:  # keep sweeping past one bad config
            print(
                json.dumps(
                    {"sweep_label": label, "error": f"{type(e).__name__}: {e}"}
                ),
                flush=True,
            )
            if isinstance(e, KeyboardInterrupt):
                raise
        print(
            f"[sweep] {label} done in {time.time() - t0:.0f}s",
            file=sys.stderr,
            flush=True,
        )


if __name__ == "__main__":
    main()
