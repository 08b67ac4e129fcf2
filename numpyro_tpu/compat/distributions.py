"""pyro-api distributions namespace (reference: numpyro/compat/distributions.py)."""

from numpyro_tpu.distributions import *  # noqa: F401, F403
from numpyro_tpu.distributions import constraints, transforms  # noqa: F401
