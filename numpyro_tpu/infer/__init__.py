"""numpyro_tpu.infer — inference kernels, drivers, and objectives (L4/L5).

API parity target: numpyro/infer/__init__.py:33-62.
"""

from numpyro_tpu.infer import initialization, inspect
from numpyro_tpu.infer.inspect import get_dependencies, get_model_relations, render_model
from numpyro_tpu.infer.initialization import (
    init_to_feasible,
    init_to_mean,
    init_to_median,
    init_to_sample,
    init_to_uniform,
    init_to_value,
)
from numpyro_tpu.infer import autoguide, reparam
from numpyro_tpu.infer.elbo import (
    ELBO,
    RenyiELBO,
    Trace_ELBO,
    TraceEnum_ELBO,
    TraceGraph_ELBO,
    TraceMeanField_ELBO,
)
from numpyro_tpu.infer.barker import BarkerMH
from numpyro_tpu.infer.chees import CheesHMC
from numpyro_tpu.infer.ensemble import AIES, ESS, EnsembleSampler
from numpyro_tpu.infer.hmc import HMC, NUTS
from numpyro_tpu.infer.hmc_gibbs import (
    DiscreteHMCGibbs,
    HMCECS,
    HMCGibbs,
)
from numpyro_tpu.infer.mcmc import MCMC, MCMCKernel
from numpyro_tpu.infer.mixed_hmc import MixedHMC
from numpyro_tpu.infer.sa import SA
from numpyro_tpu.infer.smc import SMC, SMCResult
from numpyro_tpu.infer.svi import SVI, SVIRunResult, SVIState
from numpyro_tpu.infer.util import (
    Predictive,
    constrain_fn,
    find_valid_initial_params,
    get_transforms,
    initialize_model,
    log_density,
    log_likelihood,
    potential_energy,
    transform_fn,
    unconstrain_fn,
)

__all__ = [
    "AIES",
    "autoguide",
    "BarkerMH",
    "CheesHMC",
    "ELBO",
    "EnsembleSampler",
    "ESS",
    "SA",
    "SMC",
    "SMCResult",
    "DiscreteHMCGibbs",
    "HMC",
    "HMCECS",
    "HMCGibbs",
    "MCMC",
    "MCMCKernel",
    "MixedHMC",
    "NUTS",
    "RenyiELBO",
    "reparam",
    "SVI",
    "SVIRunResult",
    "SVIState",
    "Trace_ELBO",
    "TraceEnum_ELBO",
    "TraceGraph_ELBO",
    "TraceMeanField_ELBO",
    "Predictive",
    "constrain_fn",
    "find_valid_initial_params",
    "get_transforms",
    "init_to_feasible",
    "init_to_mean",
    "init_to_median",
    "init_to_sample",
    "init_to_uniform",
    "init_to_value",
    "initialization",
    "inspect",
    "get_dependencies",
    "get_model_relations",
    "render_model",
    "initialize_model",
    "log_density",
    "log_likelihood",
    "potential_energy",
    "transform_fn",
    "unconstrain_fn",
]
