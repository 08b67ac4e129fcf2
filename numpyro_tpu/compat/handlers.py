"""pyro-api handlers namespace (reference: numpyro/compat/handlers.py)."""

from numpyro_tpu.handlers import *  # noqa: F401, F403
