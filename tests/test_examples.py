"""Run example scripts with tiny step counts (pattern: reference
test/test_examples.py check_call harness)."""

import os
import subprocess
import sys

import pytest

EXAMPLES_DIR = os.path.join(os.path.dirname(__file__), "..", "examples")

CASES = [
    "eight_schools.py --num-warmup 50 --num-samples 50 --num-chains 2",
    "stochastic_volatility.py --num-warmup 50 --num-samples 50 --num-steps 30",
    "hmm_enum.py --num-warmup 30 --num-samples 30 --num-steps 15",
    "hmm_semisupervised.py --num-warmup 40 --num-samples 40 "
    "--num-supervised 40 --num-unsupervised 40",
    "gaussian_mixture.py --num-warmup 30 --num-samples 30",
    "covtype.py --num-warmup 10 --num-samples 10 --num-chains 2 "
    "--max-tree-depth 4 --num-data 2000",
    "hmcecs_covtype.py --num-warmup 20 --num-samples 20 --subsample-size 200 "
    "--num-blocks 4 --max-tree-depth 4 --num-data 5000",
    "horseshoe_regression.py --num-warmup 50 --num-samples 50 --num-data 40 "
    "--num-dims 8 --active-dims 2",
    "funnel.py --num-warmup 100 --num-samples 150 --dim 5",
    "baseball.py --num-warmup 60 --num-samples 60",
    "bnn.py --num-warmup 50 --num-samples 50 --num-data 40",
    "gp.py --num-warmup 50 --num-samples 50 --num-data 25",
    "ar2.py --num-warmup 50 --num-samples 50 --num-steps 60",
    "ode.py --num-warmup 30 --num-samples 30 --num-obs 15 --t-max 8",
    "zero_inflated_poisson.py --num-warmup 50 --num-samples 50 --num-data 100",
    "annotation.py --num-warmup 30 --num-samples 30 --num-items 20",
    "neutra.py --num-iters 300 --num-warmup 50 --num-samples 80",
    "hmm_enum.py --num-warmup 30 --num-samples 30 --num-steps 15 --use-scan",
    "stein_bnn.py --num-iters 100 --num-data 30 --num-particles 4",
    "dais_demo.py --num-iters 300 --num-data 50",
    "holt_winters.py --num-warmup 50 --num-samples 50 --num-steps 40",
    "capture_recapture.py --num-warmup 50 --num-samples 50 --num-steps 6 "
    "--num-animals 20",
    "toy_mixture_model_discrete_enumeration.py --num-iters 300 --num-data 200",
    "proportion_test.py --num-warmup 50 --num-samples 60 --num-data 400",
    "ucbadmit.py --num-warmup 60 --num-samples 60",
    "var2.py --num-warmup 50 --num-samples 50 --num-steps 60",
    "vae.py --num-iters 50 --batch-size 32",
    "hsgp_example.py --num-warmup 40 --num-samples 40 --num-data 40",
    "minipyro.py --num-iters 150",
    "mortality.py --num-warmup 50 --num-samples 50 --num-ages 6 --num-times 4",
    "ssbvm_mixture.py --num-warmup 40 --num-samples 40 --num-data 80",
    "thompson_sampling.py --num-rounds 2",
    "sparse_regression.py --num-data 50 --num-dims 8 --num-warmup 80 "
    "--num-samples 80",
    "cvae.py --num-iters 40 --batch-size 32",
    "prodlda.py --num-docs 120 --vocab 40 --num-topics 3 --doc-len 40 "
    "--hidden 32 --num-iters 150",
    "stein_dmm.py --num-iters 20 --num-seqs 12 --seq-len 10 --num-particles 3",
    "gaussian_shells.py --num-live 100 --max-samples 2000 --num-draws 400",
]


# a representative cross-section stays in the fast suite; the rest are
# integration coverage behind --runslow (each example costs ~30s of compile
# on this 1-core box)
FAST_CASES = {c for c in CASES if c.startswith("minipyro.py")}


@pytest.mark.parametrize(
    "case",
    [
        c if c in FAST_CASES else pytest.param(c, marks=pytest.mark.slow)
        for c in CASES
    ],
)
def test_example(case):
    parts = case.split()
    path = os.path.join(EXAMPLES_DIR, parts[0])
    env = dict(os.environ)
    # subprocess sys.path[0] is examples/, so put the repo root on
    # PYTHONPATH; replacing (not appending) also drops the axon sitecustomize
    # so JAX_PLATFORMS=cpu is honored
    env["PYTHONPATH"] = os.path.abspath(os.path.join(EXAMPLES_DIR, ".."))
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONWARNINGS"] = "ignore"
    subprocess.check_call([sys.executable, path] + parts[1:], env=env)
