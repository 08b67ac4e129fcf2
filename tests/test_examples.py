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
    "gaussian_mixture.py --num-warmup 30 --num-samples 30",
    "covtype.py --num-warmup 10 --num-samples 10 --num-chains 2 "
    "--max-tree-depth 4 --num-data 2000",
    "hmcecs_covtype.py --num-warmup 20 --num-samples 20 --subsample-size 200 "
    "--num-blocks 4 --max-tree-depth 4 --num-data 5000",
]


@pytest.mark.parametrize("case", CASES)
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
