"""Parallel enumeration of discrete latent sites — funsor-free.

Design (replaces the reference's funsor layer,
numpyro/contrib/funsor/enum_messenger.py:563-654, with direct array dims):
each enumerable sample site is substituted with its full support expanded
along a fresh *negative* array dim allocated to the LEFT of every plate dim
(``first_available_dim``).  Downstream log-probs then broadcast against these
enum dims, and the density engine (infer_util.log_density) eliminates them
with a logsumexp sum-product contraction.  On TPU the whole enumerated
density is one batched elementwise/reduction program — no host-side graph
machinery survives tracing.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax.numpy as jnp

from numpyro_tpu.handlers import infer_config
from numpyro_tpu.primitives import Messenger

# marker key recording the allocated enum dim in a site's infer dict
ENUM_DIM_KEY = "_enum_dim"
# total enum-dim budget (reference caps at 25, enum_messenger.py:84)
MAX_ENUM_DIMS = 25


class enum(Messenger):
    """Substitute each enumerable latent site with its expanded support.

    :param first_available_dim: most-positive dim available for enumeration,
        a negative integer left of all plate dims (e.g. ``-1 - max_plate_nesting``).
    """

    def __init__(self, fn=None, first_available_dim=None):
        assert first_available_dim is not None and first_available_dim < 0
        self.first_available_dim = first_available_dim
        super().__init__(fn)

    def __enter__(self):
        self._next_dim = self.first_available_dim
        return super().__enter__()

    def process_message(self, msg):
        if msg["type"] != "sample":
            return
        if msg["is_observed"] or msg["value"] is not None:
            return
        fn = msg["fn"]
        if not getattr(fn, "has_enumerate_support", False):
            return
        if msg["infer"].get("enumerate") != "parallel":
            return
        if ENUM_DIM_KEY in msg["infer"]:
            return

        dim = self._next_dim
        self._next_dim -= 1
        if self.first_available_dim - dim >= MAX_ENUM_DIMS:
            raise RuntimeError(
                f"Exceeded the enumeration dim budget of {MAX_ENUM_DIMS}."
            )
        support = fn.enumerate_support(expand=False)
        # support: (K,) + (1,)*len(batch_shape); place K at batch dim `dim`
        size = support.shape[0]
        batch_ndim = max(len(fn.batch_shape), -dim)
        shape = (size,) + (1,) * (batch_ndim - 1)
        value = support.reshape(shape + fn.event_shape)
        msg["value"] = value
        msg["infer"][ENUM_DIM_KEY] = dim
        msg["infer"]["_enum_size"] = size
        # the site is enumerated, not sampled: no rng needed
        msg["kwargs"]["rng_key"] = None

    def postprocess_message(self, msg):
        # nested plates broadcast fine; nothing to undo
        pass


def config_enumerate(fn=None, default="parallel"):
    """Mark every finite-support latent site with
    ``infer={"enumerate": default}`` unless already configured
    (reference: contrib/funsor/infer_util.py:56)."""

    def config_fn(msg):
        if (
            msg["type"] == "sample"
            and not msg.get("is_observed", False)
            and getattr(msg["fn"], "has_enumerate_support", False)
            and msg["infer"].get("enumerate") is None
        ):
            return {"enumerate": default}
        return {}

    if fn is None:  # used as decorator factory
        return lambda f: config_enumerate(f, default=default)
    return infer_config(fn, config_fn=config_fn)


@contextmanager
def markov(history=1):
    """History-limited dependency context.  The direct-dim engine reuses no
    dims across markov steps yet (scan-based HMMs handle time via the
    parallel-scan path); this context is currently a no-op marker kept for
    API parity (reference: contrib/funsor/enum_messenger.py:630)."""
    yield
