"""pyro-api generic-interface compatibility layer
(reference: numpyro/compat/*).  Registers the backend with pyro-api when it
is installed."""

from numpyro_tpu.compat import distributions, handlers, infer, ops, optim, pyro

try:  # pragma: no cover
    from pyroapi import register_backend

    register_backend(
        "numpyro_tpu",
        {
            "distributions": "numpyro_tpu.compat.distributions",
            "handlers": "numpyro_tpu.compat.handlers",
            "infer": "numpyro_tpu.compat.infer",
            "ops": "numpyro_tpu.compat.ops",
            "optim": "numpyro_tpu.compat.optim",
            "pyro": "numpyro_tpu.compat.pyro",
        },
    )
except ImportError:
    pass

__all__ = ["distributions", "handlers", "infer", "ops", "optim", "pyro"]
