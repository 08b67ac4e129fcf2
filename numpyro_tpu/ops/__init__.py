from numpyro_tpu.ops.indexing import Vindex, vindex
from numpyro_tpu.ops.pytree import PytreeTrace

__all__ = ["PytreeTrace", "Vindex", "vindex"]
